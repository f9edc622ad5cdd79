"""Testdata star-schema loaders (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under a scale-factor dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def load(spark: SparkSession, sf_dir: str, name: str, *, fan_out: bool = False) -> DataFrame:
    """Read one testdata table.

    ``fan_out=True`` round-robin-repartitions to the session's core
    count. The testdata parquets are single-file/single-row-group, so
    a scan can never split below ONE task locally — any CPU-heavy work
    fused into the scan stage (tokenise/shingle/hash, per-row array
    building) runs single-core without this. On a real cluster scans
    split by row group / maxPartitionBytes and the repartition
    coalesces into normal input parallelism; use it only where
    downstream CPU ≫ one pass over the input bytes (the repartition
    itself shuffles the full column set it carries).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark rejects
        # unless nanosAsLong is on. The conf is runtime-settable, and
        # sessions not built by orderly_spark.session (e.g. the
        # driver's) won't have it — set it here so any session works.
        if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") or "false").lower() != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as long via nanosAsLong —
        # convert back to a real (microsecond) timestamp.
        # integer division: ts/1000 in double space rounds off-by-1µs
        # for epoch-nanos magnitudes (> 2^53 after scaling).
        # DIV truncates toward zero where cleaning.py's extraction
        # path floors via pmod (review finding, r8) — the two differ
        # only on values NOT divisible by 1000, and the testdata's ts
        # is µs-aligned (pinned at both gate scales by
        # tests/test_properties.py::test_events_ts_nanos_microsecond_aligned),
        # so DIV == floor exactly here. Kept as DIV so every graded
        # events plan stays byte-identical; if sub-µs events ever
        # appear, switch to (ts - pmod(ts,1000)) DIV 1000.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if fan_out:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the frames."""
    out = {}
    for name in TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def materialize_then_clean(df: DataFrame, *paths: str) -> DataFrame:
    """Materialise a (small) query result, then delete the scratch
    directories its plan reads from — the leak-free contract for every
    sink-roundtrip gate query (review finding: each gate run used to
    leave its scratch export in /tmp). The localCheckpoint severs
    lineage from the deleted files; callers only pass results that are
    aggregate/dimension sized."""
    import shutil

    out = df.localCheckpoint()
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)
    return out
