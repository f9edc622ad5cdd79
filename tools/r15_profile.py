"""Round-15 per-stage profiler (guide §1.1/§7.1): runs one or more
registry slots in a UI-enabled session and dumps per-stage wall-clock,
task counts and shuffle bytes from the status API, so slot time can be
attributed to operators instead of guessed.

Usage: python tools/r15_profile.py <slot> [<slot> ...] [--sf-dir DIR] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("slots", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r15_profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY

    # warmup (bench parity)
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"):
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long").count()

    api = "http://localhost:4055/api/v1/applications"
    app_id = json.load(urllib.request.urlopen(api))[0]["id"]

    def stages_now() -> list[dict]:
        return json.load(urllib.request.urlopen(f"{api}/{app_id}/stages?status=complete"))

    for slot in args.slots:
        pre_ids = {s["stageId"] for s in stages_now()}
        best = None
        t_build = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"r15prof {slot}")
            t0 = time.perf_counter()
            df = REGISTRY[slot].fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df.count()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best, t_build = dt, t1 - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        new = [s for s in stages_now() if s["stageId"] not in pre_ids]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {slot}: best_total={best:.3f}s (plan-build {t_build:.3f}s; "
              f"{len(new)} stages over {args.reps} reps) ===")
        for s in new[:18]:
            dur = (s.get("executorRunTime") or 0) / 1000.0
            cpu = (s.get("executorCpuTime") or 0) / 1e9
            print(
                f"  stage {s['stageId']:4d} tasks={s['numCompleteTasks']:3d} "
                f"runTime={dur:7.2f}s cpu={cpu:7.2f}s "
                f"shR={s.get('shuffleReadBytes', 0)>>10:8d}K shW={s.get('shuffleWriteBytes', 0)>>10:8d}K "
                f"in={s.get('inputBytes', 0)>>10:8d}K  {s['name'].split(chr(10))[0][:70]}"
            )


if __name__ == "__main__":
    main()
