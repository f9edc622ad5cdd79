"""Scale probe for the ANN operators: brute-force cosine top-k vs the
IVF coarse-cell path at synthetic multiples of sf0.1's embeddings
table (2 000 → 512 000 vectors), same 5-query workload.

Each copy shifts vec_id and deterministically perturbs one dimension
(dimension k mod 64 gets +k added) so copies land in different IVF
cells / LSH buckets rather than stacking into identical ones — the
probe scales the index structure, not just the row count.

What this measures: brute-force cost is Q×N dot products — linear in
the corpus AND in the query batch. IVF splits into a one-time corpus
cell assignment (n_cells dots/vector, amortised over every future
batch when persisted — `cell_col`) plus per-batch scoring of only the
probed n_probe/n_cells fraction.

Measured (local[32], sf0.1 base, 2026-08-14; 512k vectors, Q=50,
32×16k-row partitions): brute HOF fold 17.2 s; warm IVF 4.6 s
(assignment 0.9 s amortised); **Arrow matmul kernel 1.3 s — 13× over
the interpreted fold**. Two lessons the numbers teach:
1. Partition sizing dominates kernel choice: the same Arrow kernel
   over ~60-row partitions (the raw 256-way union) ran 55 s — worse
   than the fold — because per-batch Python/Arrow overhead swamped
   the matmul. Repartition before vectorized UDFs.
2. IVF's candidate reduction pays once the assignment is persisted
   and Q grows (brute is Q×N; IVF ~Q×N×probe_frac + const); at Q=5
   the paths tie — per-row fixed costs swamp the reduction.

Usage: python tools/ann_scale_probe.py [Q=<n>] [copies ...]
(defaults Q=5, copies 1 16 64 256). One JSON line per multiple:
{"copies", "vectors", "n_queries", "brute_sec", "ivf_cold_sec",
"assign_sec", "ivf_warm_sec", "ivf_rows"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orderly_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_arrow,
    ivf_cell,
    ivf_cosine_topk,
    pseudo_centroids,
)
from orderly_spark.session import DEFAULT_SF_DIR, get_spark
from orderly_spark.tables import load

OFFSET = 10_000_000


def scaled_embeddings(spark, sf_dir: str, copies: int) -> DataFrame:
    e = load(spark, sf_dir, "embeddings", fan_out=True).select("vec_id", "embedding")
    outs = []
    for k in range(copies):
        pert = F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == k % 64, x + F.lit(float(k))).otherwise(x),
        )
        outs.append(
            e.select(
                (F.col("vec_id") + F.lit(k * OFFSET)).alias("vec_id"),
                pert.alias("embedding"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    # the k-way union stacks k×32 partitions (~60 rows each at 256
    # copies) — per-partition overhead then dominates every kernel,
    # Arrow batches worst of all; restore normal parallelism
    return out.repartition(spark.sparkContext.defaultParallelism)


def main(argv: list[str]) -> int:
    # usage: probe.py [Q=<n>] [copies ...]
    n_queries = 5
    rest = []
    for a in argv:
        if a.startswith("Q="):
            n_queries = int(a[2:])
        else:
            rest.append(a)
    multiples = [int(a) for a in rest] or [1, 16, 64, 256]
    spark = get_spark("orderly_spark.ann_scale_probe")
    sf_dir = DEFAULT_SF_DIR
    for copies in multiples:
        e = scaled_embeddings(spark, sf_dir, copies).persist()
        vectors = e.count()
        q = e.filter(F.col("vec_id") < n_queries)  # original-copy query vectors

        t0 = time.time()
        cosine_topk(e, q, id_col="vec_id", vec_col="embedding", k=3).count()
        brute_sec = time.time() - t0

        # Arrow kernel: numpy matmul per corpus batch (the throughput
        # path; exact fold stays the value-gated baseline)
        t0 = time.time()
        cosine_topk_arrow(e, q, id_col="vec_id", vec_col="embedding", k=3).count()
        arrow_sec = time.time() - t0

        # cold IVF: cell assignment computed inline (8 dots/vector —
        # with only 5 queries this rivals brute force's 5 dots/vector,
        # which is exactly why deployments DON'T run it cold)
        t0 = time.time()
        ivf_rows = ivf_cosine_topk(
            e, q, dim=64, id_col="vec_id", vec_col="embedding", k=3, n_cells=8, n_probe=2
        ).count()
        ivf_cold_sec = time.time() - t0

        # warm IVF: the deployment shape — cell assigned once at
        # ingest (persisted column), every query batch reuses it and
        # scores only the probed n_probe/n_cells of the corpus
        assigned = e.withColumn(
            "cell", ivf_cell(F.col("embedding"), pseudo_centroids(64, 8))
        ).persist()
        t0 = time.time()
        assigned.count()  # materialise the assignment
        assign_sec = time.time() - t0
        t0 = time.time()
        ivf_cosine_topk(
            assigned, q, dim=64, id_col="vec_id", vec_col="embedding",
            k=3, n_cells=8, n_probe=2, cell_col="cell",
        ).count()
        ivf_warm_sec = time.time() - t0
        assigned.unpersist()
        e.unpersist()

        print(
            json.dumps(
                {
                    "copies": copies,
                    "vectors": vectors,
                    "n_queries": n_queries,
                    "brute_sec": round(brute_sec, 2),
                    "arrow_sec": round(arrow_sec, 2),
                    "ivf_cold_sec": round(ivf_cold_sec, 2),
                    "assign_sec": round(assign_sec, 2),
                    "ivf_warm_sec": round(ivf_warm_sec, 2),
                    "ivf_rows": ivf_rows,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
