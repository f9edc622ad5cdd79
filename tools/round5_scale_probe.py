"""Scale probe for the round-5 benchmark-table pipeline
(m_condition_benchmark_table): the gated query runs on the capped
reactions scaffold (MAX_RID, for oracle-cost control), so the gate
never shows how the one-pass design scales — this probe runs the
SAME shipped pipeline (queries/metrics_battery.condition_benchmark_table,
shared code, no restated mirror) over the UNCAPPED scaffold at
sf0.001 / sf0.01 / sf0.1 (lineitem 6k -> 60k -> 600k rows,
reactions ~1.5k -> ~15k -> ~147k).

Expected shape: wall-clock grows sub-linearly in input — the explode
triples the (bool, grp, combo) row count map-side, the single
(grp, combo) count collapses with partial aggregation, and the rank
window runs over the combo DIMENSION (distinct tuples), which grows
much slower than rows.

Usage: python tools/round5_scale_probe.py [sf_dirs ...]
Prints one JSON line per scale with rows in/out and seconds (min of 2).

Measured (local[32], warm JVM, min-of-2):
  sf0.001   1.5k reactions   1.17 s
  sf0.01     15k reactions   0.94 s
  sf0.1     147k reactions   1.45 s
100x the reactions -> ~1.2x the wall-clock (the sf0.001 sample is
pure fixed cost): plan + 32-task scheduling dominates and the data
term is far sub-linear, as the dimension-shaped shuffle predicts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orderly_spark.queries.clean_battery import _reactions
from orderly_spark.queries.metrics_battery import condition_benchmark_table
from orderly_spark.session import get_spark


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("round5_scale_probe")
    for sf in sf_dirs:
        rx = _reactions(spark, sf, max_rid=None).localCheckpoint()
        n_in = rx.count()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            out = condition_benchmark_table(rx).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(
            json.dumps(
                {
                    "sf_dir": sf,
                    "reactions_in": n_in,
                    "rows_out": len(out),
                    "sec": round(best, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
