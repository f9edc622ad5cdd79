"""Twin-parity tests: every (Spark Column, DuckDB SQL) expression pair
in operators/text.py is evaluated on the SAME rows in both engines and
compared value-for-value — the direct guard behind the twins' reason
to exist (hand-synced copies drifting is how the r6 driver-vs-local
divergence started).

Covers the digitless-source edge the r6 TRY_CAST review item was
about: a source with no digits must yield 0 in BOTH engines, not
Spark-NULL vs DuckDB cast error.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from orderly_spark.operators import text as T

ROWS = [
    # (doc_id, source, n_tokens) — includes the digitless and empty
    # sources the TRY_CAST guard exists for, and n = 0/1 chunk edges
    (0, "src0", 1),
    (1, "src1", 48),
    (2, "src2", 49),
    (3, "src17", 64),
    (4, "nodigits", 65),
    (5, "", 200),
    (6, "src3", 0),
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, source VARCHAR, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", ROWS)
    return con


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(ROWS, "doc_id long, source string, n long")


def test_source_num_twins(spark, duck, sdf):
    got = {
        r["doc_id"]: r["v"]
        for r in sdf.select("doc_id", T.source_num().alias("v")).collect()
    }
    want = dict(duck.execute(f"SELECT doc_id, {T.SOURCE_NUM_SQL} FROM t").fetchall())
    assert got == want
    assert got[4] == 0 and got[5] == 0  # digitless → 0, both engines


def test_sample_threshold_and_keep_twins(spark, duck, sdf):
    got = {
        r["doc_id"]: (r["thr"], r["keep"])
        for r in sdf.select(
            "doc_id",
            T.sample_threshold().alias("thr"),
            T.sample_keep("doc_id").alias("keep"),
        ).collect()
    }
    want = {
        d: (t, k)
        for d, t, k in duck.execute(
            f"SELECT doc_id, {T.SAMPLE_THRESHOLD_SQL()}, {T.SAMPLE_KEEP_SQL('doc_id')} FROM t"
        ).fetchall()
    }
    assert got == want


def test_chunk_twins_including_empty(spark, duck, sdf):
    got = sorted(
        (r["doc_id"], r["start"], r["ct"])
        for r in sdf.select(
            "doc_id", T.chunk_starts(F.col("n")).alias("start")
        )
        .join(sdf, "doc_id")
        .select(
            "doc_id", "start", T.chunk_tokens(F.col("n"), F.col("start")).alias("ct")
        )
        .collect()
    )
    want = sorted(
        duck.execute(
            f"""SELECT doc_id, start, {T.CHUNK_TOKENS_SQL('n')} AS ct
                FROM (SELECT doc_id, n, {T.CHUNK_STARTS_SQL('n')} FROM t)"""
        ).fetchall()
    )
    assert got == want
    # n = 0 emits nothing on either side (the chunk_starts guard)
    assert not any(d == 6 for d, _, _ in got)


def test_dup_ratio_twins(spark, duck):
    rows = [(0, ["a", "b", "a"]), (1, ["x"]), (2, [])]
    sdf = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    got = {
        r["doc_id"]: r["v"]
        for r in sdf.select(
            "doc_id",
            T.dup_ratio(F.col("toks"), F.size("toks")).alias("v"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, toks VARCHAR[])")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            f"SELECT doc_id, {T.DUP_RATIO_SQL('toks', 'len(toks)')} FROM d"
        ).fetchall()
    )
    assert got == pytest.approx(want)
    assert got[0] == pytest.approx(1 / 3) and got[2] == 0.0
