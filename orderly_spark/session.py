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
        # r15 (optimization round, guide §2.2/§2.5): AQE's coalescing is
        # byte-targeted and blind to downstream per-row CPU. Several
        # pipelines run CPU-heavy operators (tokenise/shingle explode,
        # per-pair array_intersect verify, collect_set finalisation)
        # DOWNSTREAM of an exchange whose payload is only a few hundred
        # KB; the default 1M minPartitionSize floor then coalesces those
        # exchanges to 1-4 partitions and the CPU-bound tail runs on
        # 1-4 cores (measured: training-prep's dedup-window exchange,
        # 390 KB, coalesced to ONE task that burned 5.2 s of the 5.5 s
        # slot). A lower floor keeps parallelismFirst (the default)
        # effective for small-byte/high-CPU states; at cluster scale
        # post-shuffle partitions are hundreds of MB, so the floor is
        # never the binding constraint there — this is parameterised,
        # not a local[32] magic number.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "16k"),
        )
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
