"""Unit + plan coverage for the round-8 lakehouse battery: literal
fixtures with hand-computed answers, plan pins for the Arrow UDAF and
the grid join, and the Z-order skipping claim asserted quantitatively.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from orderly_spark.plans.audit import audit
from orderly_spark.queries import REGISTRY
from orderly_spark.tables import load


def plan(spark, sf_smoke, name):
    return audit(REGISTRY[name].fn(spark, sf_smoke))


# ---------------------------------------------------------------------------
# Weighted-median Arrow UDAF
# ---------------------------------------------------------------------------


def test_weighted_median_literal(spark):
    """Nation 7: balances 10/20/30 with weights 1/2/1 → running weight
    crosses half-total (2 of 4) at balance 20. Nation 8: one customer."""
    cust = spark.createDataFrame(
        [
            (7, 1, 10.0),
            (7, 2, 20.0),
            (7, 3, 30.0),
            (8, 4, 55.0),
        ],
        "c_nationkey int, c_custkey long, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [(1, 1), (2, 2), (2, 3), (3, 4), (4, 5)],
        "o_custkey long, o_orderkey long",
    )
    d = tempfile.mkdtemp(prefix="wmed_")
    cust.write.mode("overwrite").parquet(f"{d}/customer.parquet")
    orders.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = {r["c_nationkey"]: r for r in REGISTRY["a_weighted_median_pandas"].fn(spark, d).collect()}
    assert out[7]["wmedian_bal"] == 20.0
    assert out[7]["total_wt"] == 4 and out[7]["n_weighted"] == 3
    assert out[8]["wmedian_bal"] == 55.0 and out[8]["total_wt"] == 1


def test_weighted_median_plan_is_pandas_udaf(spark, sf_smoke):
    """The graded artifact must be the Arrow UDAF, not its built-in
    rewrite: FlatMapGroupsInPandas in the plan (r7 verdict #2)."""
    a = plan(spark, sf_smoke, "a_weighted_median_pandas")
    assert "FlatMapGroupsInPandas" in a.text, a.text
    assert a.has_python_udf


# ---------------------------------------------------------------------------
# Grouped EWMA fold
# ---------------------------------------------------------------------------


def test_ewma_fold_literal(spark):
    """[1, 3, 5] folds to ((1+3)/2 + 5)/2 = 3.5; a single event is its
    own EWMA; order comes from (ts, event_id), not input order."""
    df = spark.createDataFrame(
        [
            (1, 3, "2024-01-01 02:00:00", 5.0),  # deliberately out of order
            (1, 1, "2024-01-01 00:00:00", 1.0),
            (1, 2, "2024-01-01 01:00:00", 3.0),
            (2, 4, "2024-01-01 00:00:00", 9.25),
        ],
        "user_id long, event_id long, ts string, value double",
    ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    d = tempfile.mkdtemp(prefix="ewma_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["user_id"]: r for r in REGISTRY["e_grouped_ewma"].fn(spark, d).collect()}
    assert out[1]["ewma_value"] == 3.5 and out[1]["n_events"] == 3
    assert out[2]["ewma_value"] == 9.25 and out[2]["n_events"] == 1


# ---------------------------------------------------------------------------
# Batch MERGE
# ---------------------------------------------------------------------------


def test_merge_hits_all_five_paths(spark):
    """keep (old day), update (overlap day, errors cleansed), delete
    (overlap day all-errors), insert (new day), no-op (new day
    all-errors — absent entirely)."""
    from orderly_spark.queries.lakehouse_battery import _MERGE_D0, _MERGE_D1

    day_us = 86_400_000_000

    def ts(day, hour):
        import datetime

        return datetime.datetime.utcfromtimestamp((day * day_us) / 1e6) + datetime.timedelta(hours=hour)

    rows = [
        (1, 1, ts(_MERGE_D0 - 3, 1), "click", 1.0),     # keep
        (1, 2, ts(_MERGE_D0 + 1, 1), "click", 2.0),     # update (clean)
        (1, 3, ts(_MERGE_D0 + 1, 2), "error", 4.0),     # update (cleansed out)
        (1, 4, ts(_MERGE_D0 + 2, 1), "error", 8.0),     # delete (all errors)
        (1, 5, ts(_MERGE_D1 + 5, 1), "view", 16.0),     # insert
        (1, 6, ts(_MERGE_D1 + 6, 1), "error", 32.0),    # no-op tombstone
    ]
    df = spark.createDataFrame(
        [(u, e, t, et, v, "{}") for (u, e, t, et, v) in rows],
        "user_id long, event_id long, ts timestamp, event_type string, value double, props string",
    )
    d = tempfile.mkdtemp(prefix="merge_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {r["day"]: r for r in REGISTRY["r_merge_upsert_batch"].fn(spark, d).collect()}
    assert out[_MERGE_D0 - 3]["action"] == "keep"
    up = out[_MERGE_D0 + 1]
    assert up["action"] == "update" and up["n_events"] == 1 and up["sum_value"] == 2.0
    assert _MERGE_D0 + 2 not in out          # deleted
    ins = out[_MERGE_D1 + 5]
    assert ins["action"] == "insert" and ins["sum_value"] == 16.0
    assert _MERGE_D1 + 6 not in out          # tombstone for unseen key: no-op
    assert len(out) == 3


# ---------------------------------------------------------------------------
# BM25 rational ranking
# ---------------------------------------------------------------------------


def test_bm25_rarity_dominates(spark, sf_smoke):
    """'dup' is the rare query term (df 25 ≪ ~400): every top-5 doc
    must contain it — the df-rank rareness weight doing idf's job."""
    top = REGISTRY["t_bm25_rational_rank"].fn(spark, sf_smoke).collect()
    assert len(top) == 20
    assert [r["rank"] for r in top] == list(range(1, 21))
    top5 = [r["doc_id"] for r in sorted(top, key=lambda r: r["rank"])[:5]]
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_smoke, "documents")
        .filter(F.col("doc_id").isin(top5))
        .collect()
    }
    assert all(" dup" in t or t.startswith("dup") for t in texts.values())


def test_bm25_plan_stays_jvm_side(spark, sf_smoke):
    a = plan(spark, sf_smoke, "t_bm25_rational_rank")
    assert not a.has_python_udf
    assert "TakeOrderedAndProject" in a.text, a.text


# ---------------------------------------------------------------------------
# Theta sketch
# ---------------------------------------------------------------------------


def test_theta_sketch_estimate_brackets_truth(spark, sf_smoke):
    r = REGISTRY["j_theta_sketch_cardinality"].fn(spark, sf_smoke).collect()[0]
    assert r["k"] == 256 and r["theta"] > 0 and r["n_common"] > 0
    # KMV with k=256 on a ≥30-key intersection: generous 2× bracket —
    # the point is the estimate is in the right decade, deterministically
    assert r["true_intersection"] / 2 <= r["est_intersection"] <= r["true_intersection"] * 2


# ---------------------------------------------------------------------------
# Weighted sampling with replacement
# ---------------------------------------------------------------------------


def test_wsr_draws_pick_covering_segment(spark, sf_smoke):
    """Exactly 5 draws per source, each resolved to the unique doc
    whose cumulative-weight segment covers the draw's u — recomputed
    independently in pandas."""
    out = REGISTRY["t_weighted_sample_replacement"].fn(spark, sf_smoke).toPandas()
    docs = load(spark, sf_smoke, "documents").select("source", "doc_id", "n_chars").toPandas()
    n_sources = docs["source"].nunique()
    assert len(out) == 5 * n_sources
    assert out.groupby("source")["draw"].nunique().eq(5).all()

    import hashlib

    for src, grp in docs.sort_values("doc_id").groupby("source"):
        cw = grp["n_chars"].cumsum()
        tw = int(grp["n_chars"].sum())
        for j in range(1, 6):
            h = hashlib.md5(f"wsr:{src}:{j}".encode()).hexdigest()[:12]
            u = int(h, 16) % tw
            pick = grp["doc_id"].to_numpy()[(cw.to_numpy() > u).argmax()]
            got = out[(out["source"] == src) & (out["draw"] == j)]["doc_id"]
            assert len(got) == 1 and got.iloc[0] == pick, (src, j)


# ---------------------------------------------------------------------------
# Multi-metric top-k
# ---------------------------------------------------------------------------


def test_multi_metric_shares_one_window_exchange(spark, sf_smoke):
    """Both rankings ride the same c_nationkey partitioning: the plan
    may shuffle for the count aggregate, the join, and ONE window
    exchange — never one per metric."""
    import re

    a = plan(spark, sf_smoke, "a_multi_metric_topk")
    # both rank windows present — word boundary so WindowGroupLimit
    # detail headers can't satisfy the count (review r8 pass 1)
    assert len(re.findall(r"\(\d+\) Window\b", a.text)) >= 2, a.text
    assert a.n_exchanges <= 3, a.text


def test_multi_metric_values(spark, sf_smoke):
    rows = REGISTRY["a_multi_metric_topk"].fn(spark, sf_smoke).collect()
    by_nation_metric = {}
    for r in rows:
        by_nation_metric.setdefault((r["c_nationkey"], r["metric"]), []).append(r)
    for (_, _), grp in by_nation_metric.items():
        assert sorted(r["rank"] for r in grp) == list(range(1, len(grp) + 1))
        vals = [r["metric_value"] for r in sorted(grp, key=lambda r: r["rank"])]
        assert vals == sorted(vals, reverse=True) or len(set(vals)) < len(vals)


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_zorder_clusters_both_dimensions(spark, sf_smoke):
    """The whole point of Z-order vs a single-column sort: per-file
    min/max boxes are narrow in BOTH dimensions. Quantitative claim:
    every z-file's per-dim span is well under the full range, while a
    custkey-sorted layout leaves the DAY span at ~the full range in
    every file."""
    files = REGISTRY["r_zorder_layout"].fn(spark, sf_smoke).toPandas()
    assert files["n_rows"].sum() == load(spark, sf_smoke, "orders").count()
    full_cust = files["max_cust"].max() - files["min_cust"].min()
    full_day = files["max_day"].max() - files["min_day"].min()
    z_cust = (files["max_cust"] - files["min_cust"]).mean()
    z_day = (files["max_day"] - files["min_day"]).mean()
    # each dimension's average footer span shrinks to ≤ 60% of range
    assert z_cust <= 0.6 * full_cust, (z_cust, full_cust)
    assert z_day <= 0.6 * full_day, (z_day, full_day)

    # comparison layout: sort by custkey alone, 16 equal-count files
    import duckdb

    con = duckdb.connect()
    naive = con.execute(
        f"""
        WITH o AS (
          SELECT o_custkey AS ck, epoch_us(o_orderdate) // 86400000000 AS dy,
                 NTILE(16) OVER (ORDER BY o_custkey) AS f
          FROM '{sf_smoke}/orders.parquet'
        )
        SELECT AVG(mx - mn) FROM (
          SELECT f, MAX(dy) AS mx, MIN(dy) AS mn FROM o GROUP BY 1
        )
        """
    ).fetchone()[0]
    assert naive >= 0.9 * full_day  # single-dim sort: day skipping lost
    assert z_day < 0.7 * naive


# ---------------------------------------------------------------------------
# Interval-overlap grid join
# ---------------------------------------------------------------------------


def test_interval_overlap_grid_equals_bruteforce(spark, sf_smoke):
    """The grid equi-join must return EXACTLY the quadratic inequality
    join's pairs (candidate completeness: an overlapping pair always
    shares at least one covered epoch day)."""
    from orderly_spark.queries.lakehouse_battery import _sessions

    got = {
        (r["user_id"], r["click_sid"], r["view_sid"]): r["overlap_us"]
        for r in REGISTRY["j_interval_overlap_grid"].fn(spark, sf_smoke).collect()
    }
    c = _sessions(spark, sf_smoke, "click").toPandas()
    v = _sessions(spark, sf_smoke, "view").toPandas()
    brute = {}
    m = c.merge(v, on="user_id", suffixes=("_c", "_v"))
    hit = m[(m["st_c"] <= m["en_v"]) & (m["st_v"] <= m["en_c"])]
    for _, r in hit.iterrows():
        brute[(r["user_id"], r["sid_c"], r["sid_v"])] = min(r["en_c"], r["en_v"]) - max(
            r["st_c"], r["st_v"]
        )
    assert got == brute and len(got) > 0


def test_interval_overlap_plan_has_no_nested_loop(spark, sf_smoke):
    a = plan(spark, sf_smoke, "j_interval_overlap_grid")
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert "CartesianProduct" not in a.text, a.text
