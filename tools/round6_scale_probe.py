"""Scale probes for the round-6 operators.

Probe A — prefix filtering vs the exhaustive shingle co-occurrence
join (d_prefix_filter_jaccard's claim): BOTH shipped operators
(operators/dedup.py, shared code, no restated mirror) over two
regimes of a 4x-replicated sf0.1 corpus (20 000 docs, replicas
tagged so they are near- not exact dups), asserting output-pair
equality at every point:

  UNIFORM df (the raw synthetic docs — tiny vocab, no shared
  boilerplate, max shingle df ~ replica count): the co-occurrence
  join's Σ df² is already small, so prefix filtering's extra stages
  (global df agg + rank window + set-verify join) only add cost —
  measured 35.3 s vs 15.5 s at t=1/8 (and this is AFTER the
  localCheckpoint fix; un-checkpointed, the 5-consumer shingle
  relation re-derived per consumer: 219 s). HONEST NEGATIVE: below
  the df-skew crossover, the plain exact join is the right plan.

  SKEWED df (every doc shares a 10-token boilerplate tail — the web
  corpus shape: headers/footers/licenses): the boilerplate shingles
  hit df = corpus size and the exhaustive join's Σ df² goes
  quadratic — 345.3 s at 20 k docs (vs 41.9 s at 5 k: ~8x for 4x
  docs), while prefix filtering EXCLUDES max-df shingles from every
  prefix and stays flat: 29.7 s at 20 k (26.3 s at 5 k) — an 11.6x
  win with identical output (256 / 34 096 pairs match exactly).

That crossover — not a universal speedup — is the operator's real
contract, and it is why AllPairs/PPJoin order prefixes by ASCENDING
global frequency.

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


_BOILER = " copyright notice all rights reserved terms of service apply here"


def probe_a(spark):
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for tag, boiler, t_num, t_den in (
        ("uniform_df_20000docs", "", 1, 8),
        ("skewed_df_5000docs_boilerplate", _BOILER, 1, 2),
        ("skewed_df_20000docs_boilerplate", _BOILER, 1, 2),
    ):
        k = 1 if "5000" in tag else 4
        d = _replicate(base, k, boiler).select("doc_id", "text").localCheckpoint()
        t_pref, pref = timed(
            lambda: set(
                (r["id_a"], r["id_b"])
                for r in D.prefix_filter_jaccard_pairs(
                    d, "doc_id", "text", t_num=t_num, t_den=t_den
                ).collect()
            )
        )
        t_brut, brut = timed(
            lambda: set(
                (r["id_a"], r["id_b"])
                for r in D.ngram_jaccard_pairs(
                    d, "doc_id", "text", threshold=t_num / t_den
                ).collect()
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


def _replicate(d, k, boiler=""):
    parts = [
        d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i} marker{i}{boiler}")).alias("text"),
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

    import shutil

    try:
        t_inc, inc = timed(incremental)
        t_rec, rec = timed(recompute)
        assert inc == rec, "incremental != recompute"
    finally:
        # unconditional: a failing probe must not strand the view in
        # /tmp (review r6)
        shutil.rmtree(os.path.dirname(view_dir), ignore_errors=True)
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


def probe_c(spark):
    """SemDeDup quadratic confinement: the within-cell pair volume is
    ~n²/k, so raising k at fixed n (or growing n at fixed k) must move
    wall-clock with the PAIR VOLUME, not the corpus size — the design
    point the operator docstring claims. Replicated embeddings (id
    offsets, identical vectors → replicas are genuine near-dups).

    Measured (local[32], min-of-1, sequential run of this script):
      8 000 vecs, k=8  → 75.0 s   (nominal pair volume 4.0 M)
      8 000 vecs, k=64 → 11.7 s   (0.5 M)  — 6.4x for the nominal 8x
      32 000 vecs, k=64 → 31.7 s  (true pair volume = 16x the 8k/k=64
                                   run since replication scales every
                                   cell count; 16x pairs → 2.7x time,
                                   far sublinear in pair volume)
    (A contended run measured 43.8/15.8/153 s — the ratios, not the
    absolute numbers, are the claim.) The residual gap to the nominal
    k-fold speedup is CELL SKEW: pseudo (hyperplane) centroids give
    uneven cells and Σ cᵢ² > n²/k. The documented remedy is
    k-means-trained centroids (operators/clustering.kmeans_fit →
    s_ivf_kmeans_topk path), which balance cells; the plan shape is
    identical."""
    from orderly_spark.operators.similarity import pseudo_centroids, semantic_dedup_stats

    base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    for n_rep, k in ((4, 8), (4, 64), (16, 64)):
        parts = [
            base.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"), "embedding"
            )
            for i in range(n_rep)
        ]
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d = d.localCheckpoint()
        n = d.count()
        t, rows = timed(
            lambda: semantic_dedup_stats(d, pseudo_centroids(64, k), tau=0.4).collect(),
            runs=1,
        )
        n_dropped = sum(r["n_dropped"] for r in rows)
        print(
            json.dumps(
                {
                    "probe": "semdedup_cell_confinement",
                    "n_vectors": n,
                    "n_cells": k,
                    "approx_pair_volume": n * n // (2 * k),
                    "sec": round(t, 2),
                    "n_dropped": n_dropped,
                }
            )
        )


if __name__ == "__main__":
    spark = get_spark("round6_probe")
    probe_a(spark)
    probe_b(spark)
    probe_c(spark)
