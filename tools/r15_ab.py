"""Calibration-bracketed slot timer for r15 A/B probes.

Times each named slot min-of-N in one session, printing a single-core
sha256 calibration before and after so readings taken on a noisy host
are identifiable (same probe as bench.py's calib_py_hash).

Usage: python tools/r15_ab.py <slot> [...] [--reps 4] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def calib() -> float:
    t0 = time.perf_counter()
    b = b"orderly-spark-calibration-block-64-bytes-long-0123456789abcdef!"
    for _ in range(1_500_000):
        b = hashlib.sha256(b).digest() + b[32:]
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("slots", nargs="+")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import os

    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY
    from orderly_spark.session import get_spark

    spark = get_spark("r15_ab")
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"):
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long").count()

    print(f"calib_pre={calib()}")
    for name in args.slots:
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, args.sf_dir).count()
            ts.append(round(time.perf_counter() - t0, 2))
        print(f"{name}: {ts} min={min(ts)}")
    print(f"calib_post={calib()}")


if __name__ == "__main__":
    main()
