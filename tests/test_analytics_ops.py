"""Unit + plan tests for the round-7 analytics battery (tests the
OPERATOR semantics on hand-built frames the DuckDB oracle can't reach,
and pins the plan shapes the 100 TB claims depend on)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import orderly_spark.queries  # noqa: F401
from orderly_spark.plans.audit import audit
from orderly_spark.registry import REGISTRY


def plan(spark, sf_smoke, name):
    return audit(REGISTRY[name].fn(spark, sf_smoke))


# ---------------------------------------------------------------------------
# time-weighted average
# ---------------------------------------------------------------------------


def test_twa_weights_by_holding_time(spark):
    """v=10 held 3h then v=40 held 1h → TWA 17.5 (plain AVG says 25);
    the last reading carries zero weight."""
    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", 10.0),
            (1, 2, "2024-01-01 03:00:00", 40.0),
            (1, 3, "2024-01-01 04:00:00", 99.0),  # terminal: weight 0
        ],
        "user_id long, event_id long, ts string, value double",
    ).select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="twa_test_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = REGISTRY["e_time_weighted_avg"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 3
    assert r["den_h"] == pytest.approx(4.0)
    assert r["twa_value"] == pytest.approx((10 * 3 + 40 * 1) / 4.0)


# ---------------------------------------------------------------------------
# gapfill + LOCF
# ---------------------------------------------------------------------------


def test_gapfill_locf_fills_interior_gaps(spark):
    """Events in hours 0 and 3 → grid rows for hours 1-2 synthesized,
    carrying hour 0's value; is_gap marks exactly the synthesized rows."""
    import tempfile

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:30:00", 5.0),
            (1, "2024-01-01 03:10:00", 7.0),
        ],
        "user_id long, ts string, value double",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    d = tempfile.mkdtemp(prefix="gapfill_test_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    rows = {
        r["hour"] - 473352: (r["filled"], r["is_gap"])  # hours since epoch for 2024-01-01
        for r in REGISTRY["e_gapfill_locf"].fn(spark, d).collect()
    }
    assert rows == {0: (5.0, 0), 1: (5.0, 1), 2: (5.0, 1), 3: (7.0, 0)}


# ---------------------------------------------------------------------------
# grouped mode
# ---------------------------------------------------------------------------


def test_grouped_mode_tie_breaks_lexicographically(spark):
    import tempfile

    df = spark.createDataFrame(
        [(1, "b"), (1, "b"), (1, "a"), (1, "a"), (2, "z")],
        "user_id long, event_type string",
    ).select(
        "user_id",
        "event_type",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(0.0).alias("value"),
        F.monotonically_increasing_id().alias("event_id"),
        F.lit("{}").alias("props"),
    )
    d = tempfile.mkdtemp(prefix="mode_test_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r["user_id"]: (r["mode_event_type"], r["n_mode"])
        for r in REGISTRY["a_grouped_mode"].fn(spark, d).collect()
    }
    assert got == {1: ("a", 2), 2: ("z", 1)}  # 2-2 tie → 'a'


def test_grouped_mode_plan_has_window_group_limit(spark, sf_smoke):
    """The rank<=1 filter must compile to WindowGroupLimit (partial
    per-partition top-1 BEFORE the exchange), not a full sort+filter."""
    a = plan(spark, sf_smoke, "a_grouped_mode")
    assert "WindowGroupLimit" in a.text, a.text


def test_weighted_sample_plan_has_window_group_limit(spark, sf_smoke):
    a = plan(spark, sf_smoke, "t_weighted_key_sample")
    assert "WindowGroupLimit" in a.text, a.text


# ---------------------------------------------------------------------------
# pareto skyline: sorted sweep == brute-force dominance
# ---------------------------------------------------------------------------


def test_skyline_sweep_matches_bruteforce(spark, sf_smoke):
    """The engine's O(n log n) sweep must equal the O(n²) dominance
    definition on the real supplier aggregate (including equal-revenue
    and equal-qty tie groups)."""
    got = {
        (r["l_suppkey"])
        for r in REGISTRY["j_pareto_skyline"].fn(spark, sf_smoke).collect()
    }
    from orderly_spark.registry import dsum
    from orderly_spark.tables import load

    s = (
        load(spark, sf_smoke, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            dsum("l_quantity").alias("qty"),
        )
        .collect()
    )
    pts = [(r["l_suppkey"], r["revenue"], r["qty"]) for r in s]
    expect = {
        k
        for k, rev, qty in pts
        if not any(
            (rev2 >= rev and qty2 <= qty and (rev2 > rev or qty2 < qty))
            for _, rev2, qty2 in pts
        )
    }
    assert got == expect and got


def test_skyline_handles_duplicate_points(spark):
    """Identical (revenue, qty) points don't dominate each other —
    both stay on the frontier."""
    from orderly_spark.queries.analytics_battery import j_pareto_skyline  # noqa: F401

    # run the sweep logic on a hand frame via a temp dir
    import tempfile

    df = spark.createDataFrame(
        [
            # suppkey, price, discount, qty — two identical aggregate
            # points (1, 2) and a dominated one (3)
            (1, 100.0, 0.0, 10.0),
            (2, 100.0, 0.0, 10.0),
            (3, 50.0, 0.0, 20.0),
            (4, 200.0, 0.0, 30.0),
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, l_quantity double",
    )
    d = tempfile.mkdtemp(prefix="skyline_test_")
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    got = {r["l_suppkey"] for r in REGISTRY["j_pareto_skyline"].fn(spark, d).collect()}
    # 3 is dominated by 1/2 (less revenue, more qty); 4 has more
    # revenue but also more qty → incomparable, on the frontier
    assert got == {1, 2, 4}


# ---------------------------------------------------------------------------
# containment: directed, asymmetric
# ---------------------------------------------------------------------------


def test_containment_is_directed(spark):
    """A 5-token doc fully inside a 50-token doc: containment fires
    inner→outer only; Jaccard at the same threshold fires neither."""
    from orderly_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs

    inner = "alpha beta gamma delta epsilon"
    outer = inner + " " + " ".join(f"tok{i}" for i in range(45))
    df = spark.createDataFrame([(1, inner), (2, outer)], "doc_id long, text string")
    got = [
        (r["id_inner"], r["id_outer"])
        for r in containment_pairs(df, "doc_id", "text", c_num=9, c_den=10).collect()
    ]
    assert got == [(1, 2)]
    assert not ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.9).collect()


def test_containment_never_cross_joins(spark, sf_smoke):
    """The directed gates must ride the equi-join pipeline — no
    nested-loop/cartesian operator may appear (the scale contract:
    cost is Σ df², never |docs|²)."""
    a = plan(spark, sf_smoke, "d_containment_pairs")
    assert "CartesianProduct" not in a.text
    assert "BroadcastNestedLoopJoin" not in a.text
    assert a.n_sortmerge_joins + a.n_broadcast_joins >= 1, a.text


def test_twa_single_exchange_plan(spark, sf_smoke):
    """The headline scale claim, pinned mechanically: the lead-segment
    window and the per-user aggregate share ONE key-hash exchange."""
    a = plan(spark, sf_smoke, "e_time_weighted_avg")
    assert a.n_exchanges == 1, a.text


def test_gapfill_two_exchange_plan(spark, sf_smoke):
    """(user, hour) rollup + one shared user-partitioning — exactly
    two exchanges; the grid side broadcasts into the join."""
    a = plan(spark, sf_smoke, "e_gapfill_locf")
    assert a.n_exchanges == 2, a.text
    assert a.n_broadcast_joins >= 1, a.text
