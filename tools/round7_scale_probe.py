"""Scale probes for the round-7 operators.

Probe A — the new bench fixture's claim (d_prefix_filter_jaccard_skew):
on the EXACT corpus the bench now times (full sf0.1 documents + shared
boilerplate tail, t = 1/2), prefix filtering must beat the exhaustive
co-occurrence join with identical output. This validates that the r7
bench-slot swap points at a regime where the operator is the winning
plan (verdict r6 item 5), at the benched scale — not a smaller stand-in.

Probe B — containment_pairs' localCheckpoint (review r7): the shingle
relation has THREE consumers (sizes + both self-join sides); measure
the checkpointed operator against an uncheckpointed clone to quantify
the recomputation cost the fix removes, asserting identical output.

Probe C — skyline sweep vs the O(n²) dominance filter at a grain 20×
the supplier dim (per-partkey aggregate, ~20 000 points at sf0.1):
the sorted sweep must return the identical frontier and stay flat
where the quadratic NOT-EXISTS shape blows up.

Usage: python tools/round7_scale_probe.py
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

from orderly_spark.operators import dedup as D
from orderly_spark.operators.text import shingles, tokens
from orderly_spark.registry import dsum
from orderly_spark.session import get_spark

_BOILER = " copyright notice all rights reserved terms of service apply here"


def timed(fn, runs=2):
    best, out = None, None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def probe_a(spark):
    d = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", F.concat(F.col("text"), F.lit(_BOILER)).alias("text"))
        .localCheckpoint()
    )
    t_pref, pref = timed(
        lambda: set(
            (r["id_a"], r["id_b"])
            for r in D.prefix_filter_jaccard_pairs(d, "doc_id", "text", t_num=1, t_den=2).collect()
        )
    )
    t_brut, brut = timed(
        lambda: set(
            (r["id_a"], r["id_b"])
            for r in D.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.5).collect()
        )
    )
    assert pref == brut, "bench-fixture regime: prefix filtering lost pairs"
    print(
        json.dumps(
            {
                "probe": "bench_fixture_prefix_vs_bruteforce",
                "corpus": "sf0.1_5000docs_boilerplate_t0.5 (the benched fixture)",
                "n_pairs": len(pref),
                "prefix_sec": round(t_pref, 2),
                "bruteforce_sec": round(t_brut, 2),
                "speedup": round(t_brut / max(t_pref, 1e-9), 2),
            }
        )
    )


def _containment_nocheckpoint(df, id_col, text_col):
    """Uncheckpointed clone of containment_pairs (probe-only) — same
    plan minus the localCheckpoint, to measure the 3-consumer
    recomputation the shipped operator avoids."""
    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(tokens(F.col(text_col)), 3)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("n_shingles").alias("nb"))
    both = shared.join(sa, "id_a").join(sb, "id_b")
    fwd = both.filter(F.col("shared") * 10 >= 9 * F.col("na")).select(
        F.col("id_a").alias("id_inner"), F.col("id_b").alias("id_outer")
    )
    rev = both.filter(F.col("shared") * 10 >= 9 * F.col("nb")).select(
        F.col("id_b").alias("id_inner"), F.col("id_a").alias("id_outer")
    )
    return fwd.unionByName(rev)


def probe_b(spark):
    d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").localCheckpoint()
    t_ck, ck = timed(
        lambda: set(
            (r["id_inner"], r["id_outer"])
            for r in D.containment_pairs(d, "doc_id", "text").collect()
        )
    )
    t_raw, raw = timed(
        lambda: set(
            (r["id_inner"], r["id_outer"])
            for r in _containment_nocheckpoint(d, "doc_id", "text").collect()
        )
    )
    assert ck == raw, "checkpointed containment diverged from the plain plan"
    print(
        json.dumps(
            {
                "probe": "containment_checkpoint",
                "corpus": "sf0.1_5000docs",
                "n_pairs": len(ck),
                "checkpointed_sec": round(t_ck, 2),
                "uncheckpointed_sec": round(t_raw, 2),
                "speedup": round(t_raw / max(t_ck, 1e-9), 2),
            }
        )
    )


def probe_c(spark):
    pts = (
        spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .groupBy("l_partkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            dsum("l_quantity").alias("qty"),
        )
        .localCheckpoint()
    )
    n = pts.count()

    def sweep():
        grp = pts.groupBy("revenue").agg(F.min("qty").alias("grp_min_qty"))
        wg = Window.orderBy(F.desc("revenue"))
        grp = grp.withColumn(
            "running_min_qty",
            F.min("grp_min_qty").over(wg.rowsBetween(Window.unboundedPreceding, 0)),
        ).withColumn("prefix_min_qty", F.lag("running_min_qty").over(wg))
        return set(
            r["l_partkey"]
            for r in pts.join(grp, "revenue")
            .filter(
                (F.col("prefix_min_qty").isNull() | (F.col("prefix_min_qty") > F.col("qty")))
                & (F.col("grp_min_qty") >= F.col("qty"))
            )
            .collect()
        )

    def brute():
        a, b = pts.alias("a"), pts.alias("b")
        dominated = (
            a.join(
                b,
                (F.col("b.revenue") >= F.col("a.revenue"))
                & (F.col("b.qty") <= F.col("a.qty"))
                & ((F.col("b.revenue") > F.col("a.revenue")) | (F.col("b.qty") < F.col("a.qty"))),
                "left_semi",
            )
        ).select(F.col("a.l_partkey"))
        return set(
            r["l_partkey"]
            for r in pts.join(dominated, "l_partkey", "left_anti").collect()
        )

    t_sweep, s1 = timed(sweep)
    t_brut, s2 = timed(brute)
    assert s1 == s2, "sweep frontier != brute-force frontier"
    print(
        json.dumps(
            {
                "probe": "skyline_sweep_vs_quadratic",
                "n_points": n,
                "frontier": len(s1),
                "sweep_sec": round(t_sweep, 2),
                "bruteforce_sec": round(t_brut, 2),
                "speedup": round(t_brut / max(t_sweep, 1e-9), 2),
            }
        )
    )


def main():
    spark = get_spark("round7_scale_probe")
    probe_a(spark)
    probe_b(spark)
    probe_c(spark)


if __name__ == "__main__":
    main()
