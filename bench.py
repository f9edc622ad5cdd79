"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Headline set: relational core, the reference's own workload (clean
# pipeline + leakage split, uncapped), and the LLM-pipeline operators
# — the mix the 100 TB target cares about.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q10_returned_customers",
    "q21_waiting_supplier",
    "c_clean_pipeline_fullscale",
    "c_split_fullscale",
    "d_minhash_lsh_pairs",
    "t_quality_scores",
    "s_cosine_topk",
    "s_ivf_cosine_topk",
    "j_band_quantity_tiers",
    "mm_media_meta_decode",
    "s_windowed_event_counts",
    # round-4 flagship operator classes (VERDICT r4 item 5): the
    # training-prep capstone, C4 span dedup, incremental LSH-index
    # dedup, and fixed-point PageRank — timed every round from r5 on
    # (min-of-2, same method as the rest).
    "t_training_prep_pipeline",
    "t_span_dedup_rebuild",
    "d_incremental_index_dedup",
    "g_pagerank_part_supplier",
    # round-6 flagship additions: prefix-filtered exact similarity
    # join (the Σdf² escape) and SemDeDup cell pruning — timed from
    # r6 on (totals are therefore not comparable to earlier rounds
    # without subtracting these two entries). r7: the prefix-filter
    # slot now benches the SKEW variant (full corpus + boilerplate
    # tail, 256 output pairs at sf0.1) — the r6 entry returned 0 rows
    # at sf0.1 and timed the uniform-df regime the operator is
    # documented to lose in (verdict r6 item 5); r7 totals therefore
    # compare to r6 minus the old d_prefix_filter_jaccard entry.
    "d_prefix_filter_jaccard_skew",
    "s_semantic_dedup_cells",
    # round-8 flagship additions: BM25-family retrieval ranking over
    # the full corpus and the one-shot batch MERGE table service —
    # timed from r8 on (r8 totals compare to r7 only after removing
    # these two entries; everything else is slot-for-slot identical).
    "t_bm25_rational_rank",
    "r_merge_upsert_batch",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY
    from orderly_spark.session import get_spark

    spark = get_spark("orderly_spark_bench")
    # JVM + parquet-footer warmup so per-query times measure the engine,
    # not first-touch classloading/page-cache: one count per input table
    # (footer read + OS cache), one trivial mapInPandas to warm the
    # Python/Arrow worker pool for the UDF-path queries.
    for t in (
        "lineitem", "orders", "customer", "supplier", "part",
        "nation", "region", "events", "documents", "embeddings",
    ):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # r13 (verdict item 3): deterministic CPU-bound CALIBRATION probes,
    # recorded in extras at suite start AND end. Host variance on
    # byte-identical code reached ~1.6× across the four r12 runs
    # (36.48–57.39 s), making round-over-round slot deltas unreadable;
    # these two fixed-work probes let a verdict NORMALIZE totals by the
    # host-speed ratio instead of adjudicating noise by archaeology:
    #   calib_py_hash_*  — 1.5M sha256 rounds on the driver (single
    #                      core; Python-interpreter + core-speed axis)
    #   calib_jvm_*      — spark.range(4e8) codegen sum across all
    #                      local[$CPUS] slots (JVM + scheduler +
    #                      parallel-throughput axis, the one suite
    #                      slots actually ride)
    # Usage: slot_normalized ≈ slot_raw × (calib_ref / calib_this_run),
    # per axis; pre/post spread inside one run measures drift DURING
    # the suite.
    import hashlib as _hl

    # same-shape tiny job first so calib_jvm_pre doesn't pay one-time
    # whole-stage-codegen compilation that calib_jvm_post won't
    spark.range(1000).selectExpr("sum(id * 2 + id % 7) AS s").collect()

    def _calibrate(tag: str) -> None:
        t0 = time.perf_counter()
        b = b"orderly-spark-calibration-block-64-bytes-long-0123456789abcdef!"
        for _ in range(1_500_000):
            b = _hl.sha256(b).digest() + b[32:]
        extras[f"calib_py_hash_{tag}"] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        spark.range(400_000_000).selectExpr(
            "sum(id * 2 + id % 7) AS s"
        ).collect()
        extras[f"calib_jvm_{tag}"] = round(time.perf_counter() - t0, 4)
        print(
            f"# calib[{tag}] py={extras[f'calib_py_hash_{tag}']:.3f}s "
            f"jvm={extras[f'calib_jvm_{tag}']:.3f}s",
            file=sys.stderr,
        )

    extras: dict[str, float] = {}
    _calibrate("pre")

    # Per-query time = MIN of 2 runs. The benchmark host is shared:
    # three r4 runs of IDENTICAL code measured totals 48.2 / 106.7 /
    # 30.7 s with per-query swings up to 16× (mm_media_meta_decode
    # 0.79 → 13.47 s), so a single sample measures host contention,
    # not the engine — min-of-N is the standard variance-resistant
    # estimator for deterministic workloads. This also explains the
    # round-3 "similarity-trio regression" on unchanged code.
    names = [n for n in HEADLINE if n in REGISTRY]
    timings: dict[str, float] = {}
    for name in names:
        best = None
        n = 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            n = df.count()  # full-plan action; result sizes are tiny (aggregates)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    # Extras: timed the same way (min-of-2) but recorded OUTSIDE the
    # headline total so round-over-round totals stay slot-comparable.
    # r10 (verdict item 6): d_prefix_filter_jaccard_skew's ~8 s slot
    # deliberately times the exhaustive Sigma-df^2 VERIFY stage the
    # oracle equality requires; this extra times the CANDIDATE
    # GENERATION stage alone (candidates_only=True, same derived skew
    # corpus), so a candidate-stage regression is visible separately
    # from verify-stage noise.
    def _time_extra(name: str, build) -> None:
        best = None
        n = 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = build().count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        extras[name] = round(best, 4)
        print(f"# extra {name}: {extras[name]:.3f}s ({n} rows)", file=sys.stderr)

    if "d_prefix_filter_jaccard_skew" in REGISTRY:
        from pyspark.sql import functions as F

        from orderly_spark.operators.dedup import prefix_filter_jaccard_pairs
        from orderly_spark.queries.dedup_battery import _BOILER
        from orderly_spark.tables import load as _load

        def _skew_candidates():
            d = _load(spark, sf_dir, "documents", fan_out=True).select(
                "doc_id", F.concat(F.col("text"), F.lit(_BOILER)).alias("text")
            )
            return prefix_filter_jaccard_pairs(
                d, "doc_id", "text", shingle_n=3, t_num=1, t_den=2, candidates_only=True
            )

        _time_extra("d_prefix_filter_skew_candidates", _skew_candidates)

    # r11 (verdict item 3/8): a LATE third rep of the in-suite noise
    # watch item, recorded outside the total — the r10 1.30→1.82 s
    # move was host noise (standalone min-of-3: 1.49 s, code
    # unchanged); this slot keeps a tail-of-suite number per round so
    # future "slower with unchanged code" reads have an in-file
    # comparison point.
    if "s_ivf_cosine_topk" in REGISTRY:
        _time_extra(
            "s_ivf_cosine_topk_retime",
            lambda: REGISTRY["s_ivf_cosine_topk"].fn(spark, sf_dir),
        )

    # r12 (verdict items 3/8): the r11 c_clean watch item resolved as a
    # host-level shift — standalone min-of-3 on the r12 host recovered
    # to 3.47 s (r11 bench: 6.13 s; cleaning.py byte-unchanged since
    # r10). Keep a tail-of-suite retime per round, same rationale as
    # the ivf slot above.
    if "c_clean_pipeline_fullscale" in REGISTRY:
        _time_extra(
            "c_clean_fullscale_retime",
            lambda: REGISTRY["c_clean_pipeline_fullscale"].fn(spark, sf_dir),
        )

    _calibrate("post")

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extras": extras,
                "sf": sf,
                "runs_per_query": 2,
            }
        )
    )


if __name__ == "__main__":
    main()
