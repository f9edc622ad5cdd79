"""Regression tests for the local oracle comparator's DRIVER FIDELITY.

The r6 driver red (r_compaction_bin_packing) passed locally because
_normalize cast both sides to int64, erasing the DuckDB-HUGEINT→float64
rendering that the driver's raw-value hash sees. compare_query must now
fail on any float-vs-int dtype disagreement BEFORE normalizing, so an
uncast integer SUM in an oracle is caught at sf0.001 locally instead of
by the round driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from orderly_spark.oracle import compare_query, duckdb_connect
from orderly_spark.registry import Query
from orderly_spark.tables import load

SF = "/root/testdata/sf0.001"


def _uncast_query():
    """A deliberately-broken oracle: raw SUM(n) widens to HUGEINT in
    DuckDB and fetchdf() renders it float64, while the Spark side emits
    BIGINT — numerically equal, hash-divergent at the driver."""

    def fn(spark, sf_dir):
        n = load(spark, sf_dir, "nation")
        return n.groupBy("n_regionkey").agg(F.sum("n_nationkey").alias("s"))

    return Query(
        name="_harness_uncast_sum",
        fn=fn,
        oracle="SELECT n_regionkey, SUM(n_nationkey) AS s FROM nation GROUP BY 1",
    )


def _cast_query():
    """Same query with the mandated CAST — must pass."""

    def fn(spark, sf_dir):
        n = load(spark, sf_dir, "nation")
        return n.groupBy("n_regionkey").agg(F.sum("n_nationkey").alias("s"))

    return Query(
        name="_harness_cast_sum",
        fn=fn,
        oracle="SELECT n_regionkey, CAST(SUM(n_nationkey) AS BIGINT) AS s "
        "FROM nation GROUP BY 1",
    )


def test_uncast_integer_sum_fails_locally(spark):
    con = duckdb_connect(SF)
    res = compare_query(spark, con, _uncast_query(), SF)
    assert not res.ok, "uncast SUM oracle must fail the local comparator"
    assert "float-vs-int" in res.detail, res.detail


def test_cast_integer_sum_passes(spark):
    con = duckdb_connect(SF)
    res = compare_query(spark, con, _cast_query(), SF)
    assert res.ok, res.detail


def test_compare_rejects_signed_zero_disagreement(spark):
    """-0.0 vs 0.0: pandas == says equal, the driver hashes '-0.0' vs
    '0.0' — must fail locally (review finding, r8)."""

    def fn(sp, sf):
        # double('-0.0') preserves the sign; a bare -0.0 literal
        # constant-folds to +0.0 in Spark
        return sp.sql("SELECT double('-0.0') AS v")

    q = Query(name="__neg_zero", fn=fn, oracle="SELECT CAST(0.0 AS DOUBLE) AS v")
    r = compare_query(spark, duckdb_connect(SF), q, SF)
    assert not r.ok
    # and equal same-signed zeros still pass
    q2 = Query(name="__zero_ok", fn=lambda sp, sf: sp.sql("SELECT CAST(0.0 AS DOUBLE) AS v"), oracle="SELECT CAST(0.0 AS DOUBLE) AS v")
    assert compare_query(spark, duckdb_connect(SF), q2, SF).ok


def test_compare_rejects_bool_vs_int_dtype(spark):
    """bool vs int: pandas 1 == True, the driver hashes 'True' vs '1'
    — must fail locally (review finding, r8)."""

    def fn(sp, sf):
        return sp.sql("SELECT true AS v")

    q = Query(name="__bool_int", fn=fn, oracle="SELECT 1 AS v")
    r = compare_query(spark, duckdb_connect(SF), q, SF)
    assert not r.ok
    # bool-vs-bool still passes
    q2 = Query(name="__bool_ok", fn=fn, oracle="SELECT true AS v")
    assert compare_query(spark, duckdb_connect(SF), q2, SF).ok
