"""Scale probe for the corpus-curation operators: the composed
quality→dedup→cluster pipeline and the raw MinHash-LSH candidate
stage at synthetic multiples of sf0.1's documents table (5 000 docs →
up to 320 000).

Each copy gets a DISTINCT token vocabulary (every token prefixed with
the copy id) and a shifted doc_id space, so shingle sets, duplicate
groups and LSH buckets keep their per-copy structure — the probe
scales the WORK. A naive union of identical copies would make every
doc an LSH near-dup of its clones: candidate pairs would grow
quadratically in copies and measure an artificial workload, not the
engine.

Usage: python tools/curation_scale_probe.py [copies ...] (default 1 4 16 64)
Prints one JSON line per multiple:
{"copies", "docs_in", "survivors", "lsh_pairs", "curation_sec", "lsh_sec"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orderly_spark.operators import dedup as D
from orderly_spark.operators import text as T
from orderly_spark.queries.text_battery import corpus_curation_stats
from orderly_spark.session import DEFAULT_SF_DIR, get_spark
from orderly_spark.tables import load

OFFSET = 10_000_000


def scaled_documents(spark, sf_dir: str, copies: int) -> DataFrame:
    d = load(spark, sf_dir, "documents", fan_out=True).select("doc_id", "source", "text")
    outs = []
    for k in range(copies):
        outs.append(
            d.select(
                (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
                "source",
                # prefix EVERY token with the copy id → copy-distinct
                # shingles/buckets (see module docstring)
                F.regexp_replace("text", r"(\S+)", f"c{k}_$1").alias("text"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def main(argv: list[str]) -> int:
    multiples = [int(a) for a in argv] or [1, 4, 16, 64]
    spark = get_spark("orderly_spark.curation_scale_probe")
    sf_dir = DEFAULT_SF_DIR
    for copies in multiples:
        # persist + count: materialise the scaffold (k-way union +
        # per-token regexp) so BOTH timed stages read cached rows and
        # the timings isolate the operators, not scaffold generation
        d = scaled_documents(spark, sf_dir, copies).persist()
        docs_in = d.count()

        t0 = time.time()
        stats = corpus_curation_stats(d).collect()
        curation_sec = time.time() - t0
        survivors = sum(r.n_docs for r in stats)

        t0 = time.time()
        lsh_pairs = D.lsh_candidate_pairs(
            d, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4
        ).count()
        lsh_sec = time.time() - t0

        # decontamination: last 1% of ids play the benchmark/eval set;
        # broadcast its shingle set, one scan over the rest
        t0 = time.time()
        sh5 = T.shingles(T.tokens("text"), 5)
        is_eval = (F.col("doc_id") % 97) == 0
        eval_sh = d.filter(is_eval).select(F.explode(sh5).alias("shingle")).distinct()
        n_contaminated = (
            d.filter(~is_eval)
            .select("doc_id", F.explode(sh5).alias("shingle"))
            .join(F.broadcast(eval_sh), "shingle", "left_semi")
            .select("doc_id")
            .distinct()
            .count()
        )
        decon_sec = time.time() - t0
        d.unpersist()

        print(
            json.dumps(
                {
                    "copies": copies,
                    "docs_in": docs_in,
                    "survivors": survivors,
                    "lsh_pairs": lsh_pairs,
                    "n_contaminated": n_contaminated,
                    "curation_sec": round(curation_sec, 2),
                    "lsh_sec": round(lsh_sec, 2),
                    "decon_sec": round(decon_sec, 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
