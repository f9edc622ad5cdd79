"""Scale probes for the round-8 operators.

Probe A — j_interval_overlap_grid's claim: the epoch-day grid
equi-join returns EXACTLY the quadratic per-user inequality join's
pairs while scaling as candidates-per-cell instead of |sessions|². At
sf0.1 (≈11.7k sessions) both shapes are timed; equality is asserted
on the full result set. The brute shape joins on user_id alone and
filters the inequality afterwards — the plan Spark would run for the
oracle's SQL.

Probe B — a_multi_metric_topk's claim: N rankings on ONE shared
window partitioning cost one exchange total, vs running each metric
as its own windowed query (the naive dashboard fan-out). Identical
combined output asserted.

Usage: python tools/round8_scale_probe.py
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from orderly_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def timed(fn, runs=2):
    best, out = None, None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def probe_a(spark):
    from orderly_spark.queries.lakehouse_battery import _sessions
    from orderly_spark.registry import REGISTRY

    c = _sessions(spark, SF, "click").localCheckpoint()
    v = _sessions(spark, SF, "view").localCheckpoint()
    n_sessions = c.count() + v.count()

    def grid():
        return set(
            (r["user_id"], r["click_sid"], r["view_sid"], r["overlap_us"])
            for r in REGISTRY["j_interval_overlap_grid"].fn(spark, SF).collect()
        )

    def brute():
        a, b = c.alias("a"), v.alias("b")
        j = a.join(b, F.col("a.user_id") == F.col("b.user_id")).filter(
            (F.col("a.st") <= F.col("b.en")) & (F.col("b.st") <= F.col("a.en"))
        )
        return set(
            (r["uid"], r["csid"], r["vsid"], r["ov"])
            for r in j.select(
                F.col("a.user_id").alias("uid"),
                F.col("a.sid").alias("csid"),
                F.col("b.sid").alias("vsid"),
                (
                    F.least(F.col("a.en"), F.col("b.en"))
                    - F.greatest(F.col("a.st"), F.col("b.st"))
                ).alias("ov"),
            ).collect()
        )

    t_grid, g1 = timed(grid)
    t_brut, g2 = timed(brute)
    assert g1 == g2, "grid join pairs != brute-force pairs"
    print(
        json.dumps(
            {
                "probe": "interval_grid_vs_bruteforce",
                "n_sessions": n_sessions,
                "n_pairs": len(g1),
                "grid_sec": round(t_grid, 2),
                "bruteforce_sec": round(t_brut, 2),
                "ratio": round(t_brut / max(t_grid, 1e-9), 2),
            }
        )
    )


def probe_a2(spark):
    """The regime the grid EXISTS for: coarse keys (user_id % 8 — the
    celebrity-key / tenant-grain shape) and short sessions (2 h gap →
    interval length ≪ corpus span), where per-key candidate pairs are
    ~n² and the day grid cuts them by the spread factor. Both shapes
    run on the SAME session frames; equality asserted."""
    from orderly_spark.operators.relational import epoch_us

    day_us = 86_400_000_000
    gap_us = 2 * 3_600_000_000

    from orderly_spark.tables import load

    def sessions(etype: str):
        e = (
            load(spark, SF, "events")
            .filter(F.col("event_type") == etype)
            .select(
                (F.col("user_id") % 8).alias("key"),
                "user_id",
                epoch_us(F.col("ts")).alias("eus"),
                "event_id",
            )
        )
        w = Window.partitionBy("user_id").orderBy("eus", "event_id")
        brk = F.when(F.col("eus") - F.lag("eus").over(w) > gap_us, 1).otherwise(0)
        sid = e.withColumn("sid", F.sum(brk).over(w))
        return (
            sid.groupBy("key", "user_id", "sid")
            .agg(F.min("eus").alias("st"), F.max("eus").alias("en"))
            .select(
                "key",
                (F.col("user_id") * 1_000_000 + F.col("sid")).alias("usid"),
                "st",
                "en",
            )
            .localCheckpoint()
        )

    c, v = sessions("click"), sessions("view")
    nc, nv = c.count(), v.count()

    def grid():
        def cells(iv, tag):
            return iv.select(
                "key",
                F.col("usid").alias(f"{tag}_usid"),
                F.col("st").alias(f"{tag}_st"),
                F.col("en").alias(f"{tag}_en"),
                F.explode(
                    F.sequence(
                        (F.col("st") / day_us).cast("long"),
                        (F.col("en") / day_us).cast("long"),
                    )
                ).alias("day"),
            )

        cand = cells(c, "c").join(cells(v, "v"), ["key", "day"])
        hit = cand.filter(
            (F.col("c_st") <= F.col("v_en")) & (F.col("v_st") <= F.col("c_en"))
        )
        return hit.groupBy("key", "c_usid", "v_usid").count().count()

    def brute():
        a, b = c.alias("a"), v.alias("b")
        return (
            a.join(b, F.col("a.key") == F.col("b.key"))
            .filter((F.col("a.st") <= F.col("b.en")) & (F.col("b.st") <= F.col("a.en")))
            .count()
        )

    t_grid, n1 = timed(grid)
    t_brut, n2 = timed(brute)
    assert n1 == n2, f"grid pairs {n1} != brute pairs {n2}"
    print(
        json.dumps(
            {
                "probe": "interval_grid_vs_bruteforce_coarse_keys",
                "n_click_sessions": nc,
                "n_view_sessions": nv,
                "n_pairs": n1,
                "grid_sec": round(t_grid, 2),
                "bruteforce_sec": round(t_brut, 2),
                "ratio": round(t_brut / max(t_grid, 1e-9), 2),
            }
        )
    )


def probe_b(spark):
    from orderly_spark.registry import REGISTRY

    def one_pass():
        return set(
            tuple(r) for r in REGISTRY["a_multi_metric_topk"].fn(spark, SF).collect()
        )

    def two_jobs():
        cust = spark.read.parquet(f"{SF}/customer.parquet")
        cnt = (
            spark.read.parquet(f"{SF}/orders.parquet")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        out = set()
        for metric, order_col in (
            ("balance", F.desc("c_acctbal")),
            ("orders", F.desc("n_orders")),
        ):
            base = cust.join(cnt, cust.c_custkey == cnt.o_custkey, "left").select(
                "c_nationkey",
                "c_custkey",
                "c_acctbal",
                F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_orders"),
            )
            w = Window.partitionBy("c_nationkey").orderBy(order_col, "c_custkey")
            val = F.col("c_acctbal") if metric == "balance" else F.col("n_orders").cast("double")
            out |= set(
                tuple(r)
                for r in base.withColumn("rank", F.row_number().over(w).cast("long"))
                .filter(F.col("rank") <= 3)
                .select(
                    "c_nationkey",
                    F.lit(metric).alias("metric"),
                    "rank",
                    "c_custkey",
                    val.alias("metric_value"),
                )
                .collect()
            )
        return out

    t_one, s1 = timed(one_pass)
    t_two, s2 = timed(two_jobs)
    assert s1 == s2, "one-pass result != per-metric jobs result"
    print(
        json.dumps(
            {
                "probe": "multi_metric_one_pass_vs_per_metric_jobs",
                "rows": len(s1),
                "one_pass_sec": round(t_one, 2),
                "per_metric_sec": round(t_two, 2),
                "ratio": round(t_two / max(t_one, 1e-9), 2),
            }
        )
    )


def main():
    spark = get_spark("round8_scale_probe")
    probe_a(spark)
    probe_a2(spark)
    probe_b(spark)


if __name__ == "__main__":
    main()
