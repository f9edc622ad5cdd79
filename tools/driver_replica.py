"""Driver-path replica: run the FIRST-50 grade window exactly the way
the round driver does — through ``__spark_entry__.queries()`` /
``oracle_sql()`` (the wrapped adapter callables, NOT the registry
fns) — on a deliberately NON-compliant SparkSession (America/New_York
timezone, Arrow off, no nanosAsLong), so the adapter's session-
contract pinning is exercised, at the driver's sf0.01 gate scale.

Usage: python tools/driver_replica.py [sf_dir]
Prints one line per query and a PASS/FAIL summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver_replica")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        # deliberately NON-compliant confs the adapter must pin:
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.execution.arrow.pyspark.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from orderly_spark.oracle import compare_query, duckdb_connect
    from orderly_spark.registry import Query

    qs = e.queries()
    oracles = e.oracle_sql()
    con = duckdb_connect(sf_dir)
    window = list(qs)[:50]
    fails = []
    for name in window:
        q = Query(name=name, fn=qs[name], oracle=oracles.get(name))
        try:
            res = compare_query(spark, con, q, sf_dir)
            ok, detail = res.ok, res.detail
        except Exception as ex:  # record and continue — a crash must not
            ok, detail = False, f"EXCEPTION {type(ex).__name__}: {ex}"
            # silently end validation of the remaining window (review r6)
        status = "ok" if ok else "FAIL"
        print(f"{status:4s} {name}  {detail}", flush=True)
        if not ok:
            fails.append(name)
    print(f"# window=50 fails={len(fails)} {fails or ''}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
