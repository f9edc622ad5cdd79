"""Round-16 parallel-scaling probe (VERDICT r15 item 2).

The driver's 8-vs-32-core block at sf0.1 shows every headline slot at
a ratio <= ~1.0 — sf0.1 is fixed-overhead-bound (plan build, broadcast
latency, per-job driver rounds), so it cannot demonstrate parallel
scaling at all. This probe builds a DERIVED ~10x-sf0.1 corpus and
times the heavy slots at 8 and 32 cores so the 100 TB claims rest on a
measured compute-bound ratio, not plan shapes alone.

Corpus derivation (10 copies, each structurally identical to sf0.1,
mutually disjoint so work grows 10x through the SAME exchanges):
  lineitem   l_orderkey += i*10_000_000; l_partkey += i*2_600_000
             (offset divisible by 13 so the %13 bad-name structure and
             per-copy rare-molecule counts are preserved exactly);
             l_suppkey unchanged (supplier dimension joins stay valid;
             the pagerank graph grows 10x in part nodes and edges).
  orders     o_orderkey += i*10_000_000 (o_custkey unchanged so the
             customer join stays valid).
  part       p_partkey += i*2_600_000.
  documents  doc_id += i*1_000_000; text alphabet ROTATED per copy
             (a bijection on tokens: per-copy shingle-df distributions
             are identical to the original and cross-copy vocabularies
             are disjoint, so near-dup structure scales 10x instead of
             degenerating into one giant everyone-matches-everyone
             clique; the skew slot's boilerplate tail is appended by
             the query AFTER load, so its max-df shingles still span
             all 50k docs — the df-skew regime is preserved).
  embeddings vec_id += i*1_000_000 (vectors unchanged; the vec_id < 5
             query set stays 5 queries, candidates grow 10x).
  customer/supplier/nation/region/events: symlinked unchanged.

Excluded slot + why: t_training_prep_pipeline's decontamination uses
an ABSOLUTE doc_id >= 450 eval tail, so any id-remapped 10x corpus is
semantically degenerate (nearly everything becomes "eval"); its
compute kernels (tokenise, shingle, window dedup) are covered by the
d_prefix and bm25 slots.

Usage:
  python tools/round16_scale_probe.py --gen              # build /tmp/sf0.1x10
  SPARK_GRAFT_CPUS=32 python tools/round16_scale_probe.py
  SPARK_GRAFT_CPUS=8  python tools/round16_scale_probe.py
(The bench contract is untouched: bench.py still runs sf0.1 exactly as
before; this probe is a separate tool per the VERDICT instruction.)
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf0.1x10"
COPIES = 10

SLOTS = [
    "q5_nation_revenue",
    "c_clean_pipeline_fullscale",
    "c_split_fullscale",
    "g_pagerank_part_supplier",
    "d_prefix_filter_jaccard_skew",
    "s_ivf_cosine_topk",
    "t_bm25_rational_rank",
]

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()


def calib() -> float:
    t0 = time.perf_counter()
    b = b"orderly-spark-calibration-block-64-bytes-long-0123456789abcdef!"
    for _ in range(1_500_000):
        b = hashlib.sha256(b).digest() + b[32:]
    return round(time.perf_counter() - t0, 3)


def gen() -> None:
    from pyspark.sql import functions as F

    from orderly_spark.session import get_spark

    spark = get_spark("r16_scale_gen")
    os.makedirs(DST, exist_ok=True)

    def copies(df, build):
        out = None
        for i in range(COPIES):
            c = build(df, i)
            out = c if out is None else out.unionByName(c)
        return out

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    copies(
        li,
        lambda d, i: d.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 10_000_000))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * 2_600_000)),
    ).repartition(32).write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    o = spark.read.parquet(f"{SRC}/orders.parquet")
    copies(
        o, lambda d, i: d.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000))
    ).repartition(16).write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    p = spark.read.parquet(f"{SRC}/part.parquet")
    copies(
        p, lambda d, i: d.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * 2_600_000))
    ).repartition(8).write.mode("overwrite").parquet(f"{DST}/part.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")

    def rot_doc(d, i):
        rl = LOWER[i:] + LOWER[:i]
        ru = UPPER[i:] + UPPER[:i]
        return d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000)).withColumn(
            "text", F.translate(F.col("text"), LOWER + UPPER, rl + ru)
        )

    copies(docs, rot_doc).repartition(16).write.mode("overwrite").parquet(
        f"{DST}/documents.parquet"
    )

    em = spark.read.parquet(f"{SRC}/embeddings.parquet")
    copies(
        em, lambda d, i: d.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
    ).repartition(16).write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    for t in ("customer", "supplier", "nation", "region", "events"):
        dst = Path(f"{DST}/{t}.parquet")
        if not dst.exists():
            dst.symlink_to(f"{SRC}/{t}.parquet")
    print(f"generated {DST}")


def run(reps: int) -> None:
    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY
    from orderly_spark.session import get_spark

    spark = get_spark("r16_scale_probe")
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"):
        pth = f"{DST}/{t}.parquet"
        if os.path.exists(pth):
            spark.read.parquet(pth).count()
    spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long").count()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    print(f"cpus={cpus} calib_pre={calib()}")
    results = {}
    for name in SLOTS:
        best, n = None, 0
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"r16scale[{cpus}] {name}")
            t0 = time.perf_counter()
            n = REGISTRY[name].fn(spark, DST).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = best
        print(f"{name}: {best:.2f}s ({n} rows)")
    print(f"calib_post={calib()}")
    print("TOTAL", round(sum(results.values()), 2))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    if args.gen:
        gen()
    else:
        run(args.reps)
