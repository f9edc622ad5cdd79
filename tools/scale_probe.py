"""Scale probe: the clean-pipeline headliner at synthetic multiples of
sf0.1, to measure how wall-clock scales with input size on one node.

Each copy gets a DISTINCT molecule vocabulary (prefix per copy) and a
shifted id space, so duplicate groups, frequency distributions and
rare-set ratios keep their per-copy structure — the probe scales the
WORK, not just the row count (a naive union would let the first dedup
collapse the copies and downstream stages see 1× data).

8 copies ≈ 1.18 M reactions — the reference's full-USPTO scale, where
its single-process clean takes ~19 min (orderly/clean/cleaner.py:885).

Usage: python tools/scale_probe.py [copies ...]   (default 1 2 4 8)
Prints one JSON line per multiple: {"copies", "rows_in", "rows_out",
"clean_sec", "split_sec"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

import orderly_spark.queries  # noqa: F401
from orderly_spark.operators import cleaning as C
from orderly_spark.queries import clean_battery as CB
from orderly_spark.session import DEFAULT_SF_DIR, get_spark

ROLES = ["reactants", "agents", "reagents", "solvents", "catalysts", "products"]
OFFSET = 10_000_000


def _prefixed(rx: DataFrame, k: int) -> DataFrame:
    def pfx(col: str) -> F.Column:
        return F.transform(F.col(col), lambda x: F.concat(F.lit(f"c{k}_"), x))

    out = rx
    for r in ROLES:
        out = out.withColumn(r, pfx(r))
    shift = F.lit(k * OFFSET)
    return out.withColumn("rid", F.col("rid") + shift).withColumn(
        "original_index", F.col("original_index") + shift
    )


def scaled_inputs(spark, sf_dir: str, copies: int) -> tuple[DataFrame, DataFrame]:
    rx = CB._reactions(spark, sf_dir, max_rid=None)
    bad = CB._bad_names(spark, sf_dir)
    rx_all = _prefixed(rx, 0)
    bad_all = bad.select(F.concat(F.lit("c0_"), F.col("name")).alias("name"))
    for k in range(1, copies):
        rx_all = rx_all.unionByName(_prefixed(rx, k))
        bad_all = bad_all.unionByName(
            bad.select(F.concat(F.lit(f"c{k}_"), F.col("name")).alias("name"))
        )
    return rx_all, bad_all


def main(argv: list[str]) -> int:
    multiples = [int(a) for a in argv] or [1, 2, 4, 8]
    spark = get_spark("orderly_spark.scale_probe")
    sf_dir = DEFAULT_SF_DIR
    cfg = CB.C.CleanConfig(
        num_reactant=5, num_product=5, num_solv=2, num_agent=3,
        min_frequency_of_occurrence=4,
        set_unresolved_names_to_none_if_mapped_rxn_str_exists_else_del_rxn=False,
        remove_rxn_with_unresolved_names=True,
    )
    for copies in multiples:
        rx, bad = scaled_inputs(spark, sf_dir, copies)
        rows_in = rx.count()  # materialise inputs so timings isolate the pipeline
        t0 = time.time()
        rows_out = C.clean_pipeline(rx, bad, cfg).count()
        clean_sec = time.time() - t0
        t0 = time.time()
        train, test = C.train_test_split(rx, CB.C.CleanConfig())
        n = train.count() + test.count()
        split_sec = time.time() - t0
        assert n == rows_in
        print(
            json.dumps(
                {
                    "copies": copies,
                    "rows_in": rows_in,
                    "rows_out": rows_out,
                    "clean_sec": round(clean_sec, 2),
                    "split_sec": round(split_sec, 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
