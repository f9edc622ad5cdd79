"""SparkSession factory.

Local mode is the test harness (local[32], single JVM); the config
defaults are chosen so the same logical plans scale to a real cluster:
AQE for runtime re-planning (skew joins, partition coalescing),
Arrow for any pandas-UDF boundary, UTC session timezone so timestamp
semantics match the DuckDB oracle, and shuffle partitions sized to the
harness cores (on a cluster this is overridden by AQE's coalescing and
`spark.sql.adaptive.advisoryPartitionSizeInBytes`).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(app_name: str = "orderly_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the harness SparkSession.

    Config notes for cluster scale:
    - AQE enabled: coalesces small shuffle partitions and splits skewed
      ones at runtime, so the static ``shuffle.partitions`` value is a
      ceiling, not a tuning knob that must be re-derived per dataset.
    - ``files.maxPartitionBytes`` kept at the 128m default: at 100 TB a
      scan yields ~800k input splits, which is the intended granularity.
    - Arrow enabled for the pandas-UDF slow path (chem UDFs, protobuf
      decode) — Arrow batches, never row-at-a-time pickling.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.parquet stores TIMESTAMP(NANOS), which the
        # vectorized reader rejects; read as long and convert in the
        # loader (values are microsecond-aligned, so lossless).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
