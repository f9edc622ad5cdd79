"""Scale probes for the round-6 operators.

Probe A — prefix filtering vs the exhaustive shingle co-occurrence
join (d_prefix_filter_jaccard's claim): run BOTH shipped operators
(operators/dedup.py, shared code, no restated mirror) over the full
documents table at sf0.001 (500 docs) and sf0.1 (5 000 docs), then
over a 4x-replicated sf0.1 corpus (20 000 docs, replicas tagged with
one extra token so they are near- but not exact dups). Reports
wall-clock (min of 2) and output-pair equality at every point — the
speedup must not buy any candidate loss.

Probe B — incremental view maintenance vs recompute
(a_incremental_agg_maintenance's claim): materialise the per-customer
view over the pre-1997 base ONCE as parquet, then time
(delta agg + merge against the stored view) versus the full
recompute over the effective row set, at sf0.1 (150 k orders).
Equality of results is asserted, not assumed.

Usage: python tools/round6_scale_probe.py
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orderly_spark.operators import dedup as D
from orderly_spark.session import get_spark


def timed(fn, runs=2):
    best, out = None, None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def probe_a(spark):
    for tag, build in (
        ("sf0.001_500docs", lambda: spark.read.parquet("/root/testdata/sf0.001/documents.parquet")),
        ("sf0.1_5000docs", lambda: spark.read.parquet("/root/testdata/sf0.1/documents.parquet")),
        (
            "sf0.1x4_20000docs",
            lambda: _replicate(spark.read.parquet("/root/testdata/sf0.1/documents.parquet"), 4),
        ),
    ):
        d = build().select("doc_id", "text").localCheckpoint()
        t_pref, pref = timed(
            lambda: set(
                (r["id_a"], r["id_b"])
                for r in D.prefix_filter_jaccard_pairs(d, "doc_id", "text", t_num=1, t_den=8).collect()
            )
        )
        t_brut, brut = timed(
            lambda: set(
                (r["id_a"], r["id_b"])
                for r in D.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.125).collect()
            )
        )
        assert pref == brut, f"{tag}: prefix filtering lost pairs"
        print(
            json.dumps(
                {
                    "probe": "prefix_vs_bruteforce",
                    "corpus": tag,
                    "n_pairs": len(pref),
                    "prefix_sec": round(t_pref, 2),
                    "bruteforce_sec": round(t_brut, 2),
                    "speedup": round(t_brut / max(t_pref, 1e-9), 2),
                }
            )
        )


def _replicate(d, k):
    parts = [
        d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i} marker{i}")).alias("text"),
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def probe_b(spark):
    o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,6)"))  # noqa: E731
    base = o.filter(F.col("o_orderdate") < "1997-01-01")
    view_dir = tempfile.mkdtemp(prefix="orderly_incr_view_") + "/view.parquet"
    base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), dec("o_totalprice").alias("s")
    ).write.parquet(view_dir)

    def incremental():
        view = spark.read.parquet(view_dir)
        inserts = o.filter(F.col("o_orderdate") >= "1997-01-01").select(
            "o_custkey", F.lit(1).alias("sign"), F.col("o_totalprice").alias("p")
        )
        deletes = base.filter(F.col("o_orderkey") % 10 == 0).select(
            "o_custkey", F.lit(-1).alias("sign"), (-F.col("o_totalprice")).alias("p")
        )
        delta = (
            inserts.unionByName(deletes)
            .groupBy("o_custkey")
            .agg(F.sum("sign").alias("dn"), F.sum(F.col("p").cast("decimal(38,6)")).alias("ds"))
        )
        merged = (
            view.join(delta, "o_custkey", "full")
            .select(
                "o_custkey",
                (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_orders"),
                (
                    F.coalesce(F.col("s"), F.lit(0).cast("decimal(38,6)"))
                    + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(38,6)"))
                ).cast("double").alias("total_price"),
            )
            .filter(F.col("n_orders") > 0)
        )
        return {(r[0], r[1], r[2]) for r in merged.collect()}

    def recompute():
        eff = base.filter(F.col("o_orderkey") % 10 != 0).unionByName(
            o.filter(F.col("o_orderdate") >= "1997-01-01")
        )
        rec = eff.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec("o_totalprice").cast("double").alias("total_price"),
        )
        return {(r[0], r[1], r[2]) for r in rec.collect()}

    t_inc, inc = timed(incremental)
    t_rec, rec = timed(recompute)
    assert inc == rec, "incremental != recompute"
    print(
        json.dumps(
            {
                "probe": "incremental_vs_recompute",
                "sf": 0.1,
                "n_groups": len(inc),
                "incremental_sec": round(t_inc, 2),
                "recompute_sec": round(t_rec, 2),
                "note": "incremental reads the stored view + delta keys only; "
                "recompute rescans every effective fact — the gap widens "
                "linearly with base size",
            }
        )
    )


if __name__ == "__main__":
    spark = get_spark("round6_probe")
    probe_a(spark)
    probe_b(spark)
