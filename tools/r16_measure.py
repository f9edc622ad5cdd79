"""Round-16 optimization measurement harness (guide §1).

Captures, per headline bench slot (or any --only subset of REGISTRY):
  - .explain("formatted") -> plans/r15/<name>_{before,after}.txt
  - plan-shape stats: #Exchange, join strategies, BatchEvalPython /
    ArrowEvalPython / MapInPandas nodes, PushedFilters presence
  - optional timing (min-of-N) with the bench's count() action and the
    noop sink (guide §1.4), labelled via setJobDescription (guide §1.5)

Usage:
  python tools/r16_measure.py --tag before --time 3          # all slots
  python tools/r16_measure.py --tag after --only q1_pricing_summary ...
  python tools/r16_measure.py --tag before --no-time         # plans only
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

PLANS = Path(_REPO) / "plans" / "r16"


def plan_stats(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", txt)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", txt)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt)),
        "py_batch": len(re.findall(r"\bBatchEvalPython\b", txt)),
        "py_arrow": len(re.findall(r"\bArrowEvalPython\b", txt)),
        "map_pandas": len(re.findall(r"\bMapInPandas|PythonMapInArrow\b", txt)),
        "sorts": len(re.findall(r"^\s*[+:]?-? ?\*?\(?\d*\)? ?Sort ", txt, re.M)),
        "scans": len(re.findall(r"Scan parquet", txt)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, choices=["before", "after"])
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--time", type=int, default=0, help="timing reps (0 = no timing)")
    ap.add_argument("--noop", action="store_true", help="also time with the noop sink")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import bench
    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY
    from orderly_spark.session import get_spark

    names = args.only or [n for n in bench.HEADLINE if n in REGISTRY]
    spark = get_spark("r16_measure")
    # same warmup as bench.py so first-touch costs don't pollute timings
    import os
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "events", "documents", "embeddings"):
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    spark.range(64).repartition(64).mapInPandas(lambda it: it, "id long").count()

    PLANS.mkdir(parents=True, exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        df = REGISTRY[name].fn(spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        (PLANS / f"{name}_{args.tag}.txt").write_text(txt)
        stats = plan_stats(txt)
        rec: dict = {"plan": stats}
        if args.time:
            best_c = None
            rows = 0
            for _ in range(args.time):
                spark.sparkContext.setJobDescription(f"r16[{args.tag}] {name} count")
                t0 = time.perf_counter()
                d2 = REGISTRY[name].fn(spark, args.sf_dir)
                rows = d2.count()
                dt = time.perf_counter() - t0
                best_c = dt if best_c is None else min(best_c, dt)
            rec["count_s"] = round(best_c, 4)
            rec["rows"] = rows
            if args.noop:
                best_n = None
                for _ in range(args.time):
                    spark.sparkContext.setJobDescription(f"r16[{args.tag}] {name} noop")
                    t0 = time.perf_counter()
                    d2 = REGISTRY[name].fn(spark, args.sf_dir)
                    d2.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    best_n = dt if best_n is None else min(best_n, dt)
                rec["noop_s"] = round(best_n, 4)
            spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(f"# {name}: {json.dumps(rec)}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
