"""merge_extracted's distributed original_index (SURVEY S6).

The contiguous global id must (a) exactly reproduce the
single-global-window formulation it replaced, and (b) never funnel
the full dataset through one task — the per-file position window is
partitioned; only the per-FILE counts (one row per file) see a
global window.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from orderly_spark.operators.cleaning import merge_extracted
from orderly_spark.plans.audit import formatted_plan
from orderly_spark.schema import wide_to_array

TMP = Path(__file__).parent / "tmp_merge_idx"


@pytest.fixture(scope="module")
def extracted_dir(spark):
    if TMP.exists():
        shutil.rmtree(TMP)
    rows = [
        (f"d{i % 5}.pb.gz", f"C{i}>N{i}>O{i}", f"C{i}", f"O{i}")
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "extracted_from_file string, rxn_str string, reactant_000 string, product_000 string"
    )
    df.write.mode("overwrite").partitionBy("extracted_from_file").parquet(str(TMP))
    yield str(TMP)
    shutil.rmtree(TMP, ignore_errors=True)


def test_index_matches_single_window_formulation(spark, extracted_dir):
    got = merge_extracted(spark, extracted_dir)
    n = got.count()
    assert n == 200
    # contiguous 0..n-1
    agg = got.agg(
        F.min("original_index").alias("lo"),
        F.max("original_index").alias("hi"),
        F.count_distinct("original_index").alias("d"),
    ).first()
    assert (agg.lo, agg.hi, agg.d) == (0, n - 1, n)
    # exact parity with the naive global window it replaced
    base = wide_to_array(spark.read.option("mergeSchema", "true").parquet(extracted_dir))
    w = Window.orderBy("extracted_from_file", F.md5(F.coalesce(F.col("rxn_str"), F.lit(""))))
    ref = base.withColumn("original_index", F.row_number().over(w) - 1)
    assert (
        got.select("rxn_str", "original_index")
        .exceptAll(ref.select("rxn_str", "original_index"))
        .count()
        == 0
    )


def test_tiebreak_is_session_timezone_independent(spark, tmp_path):
    """r9 (closing the r8 ledgered ceiling): the full-row fingerprint
    tiebreak renders timestamps as unix micros, so two sessions that
    differ only in spark.sql.session.timeZone assign identical
    original_index ordinals to full-row-duplicate-keyed rows. Before,
    to_json rendered timestamps in the session zone — a DST-straddling
    timestamp pair could swap survivor ordinals between conf setups."""
    import pandas as pd

    d = tmp_path / "extracted"
    # duplicate rxn_str within one file, differing ONLY by timestamp —
    # the tiebreak must order them by the timestamp fingerprint
    rows = pd.DataFrame(
        {
            "extracted_from_file": ["f0"] * 4,
            "rxn_str": ["C>N>O", "C>N>O", "C>N>O", "X>Y>Z"],
            "tag": ["a", "b", "c", "d"],
            "date_of_experiment": pd.to_datetime(
                # straddles a US DST transition (2023-03-12); renders
                # differently under America/New_York vs UTC
                ["2023-03-12 06:30:00", "2023-03-12 07:30:00",
                 "2023-11-05 05:30:00", "2023-01-01 00:00:00"]
            ),
        }
    )
    rows.to_parquet(d, partition_cols=["extracted_from_file"])

    def run():
        return sorted(
            (r["tag"], r["original_index"])
            for r in merge_extracted(spark, str(d)).collect()
        )

    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = run()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        nyc = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    assert utc == nyc
    assert len({ix for _, ix in utc}) == 4  # contiguous, all distinct


def test_tiebreak_handles_timestamp_ntz(spark, tmp_path):
    """r10 advice regression: the unix_micros fingerprint conversion
    must apply ONLY to zoned TIMESTAMP columns. A timestamp_ntz input
    (microsecond pandas/pyarrow parquet under inferTimestampNTZ=true)
    crashed with DATATYPE_MISMATCH when the dtype gate was
    startswith('timestamp'); NTZ needs no conversion because its
    to_json rendering carries no session zone."""
    d = tmp_path / "extracted_ntz"
    src = spark.createDataFrame(
        [
            ("f0", "C>N>O", "a", "2023-03-12 06:30:00"),
            ("f0", "C>N>O", "b", "2023-03-12 07:30:00"),
            ("f0", "X>Y>Z", "c", "2023-01-01 00:00:00"),
        ],
        "extracted_from_file string, rxn_str string, tag string, raw string",
    ).select(
        "extracted_from_file",
        "rxn_str",
        "tag",
        F.to_timestamp_ntz("raw").alias("date_of_experiment"),
    )
    src.write.partitionBy("extracted_from_file").parquet(str(d))
    read_back = spark.read.parquet(str(d))
    assert dict(read_back.dtypes)["date_of_experiment"] == "timestamp_ntz"

    def run():
        return sorted(
            (r["tag"], r["original_index"])
            for r in merge_extracted(spark, str(d)).collect()
        )

    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = run()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        nyc = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
    assert utc == nyc
    assert len({ix for _, ix in utc}) == 3


def test_no_full_data_single_partition_window(spark, extracted_dir):
    plan = formatted_plan(merge_extracted(spark, extracted_dir))
    # the fact-side window is partitioned by file
    assert "windowspecdefinition(extracted_from_file" in plan
    # at most one single-partition exchange, and it feeds the per-file
    # counts subtree (post-aggregate), never the raw scan
    import re

    singles = len(re.findall(r"Exchange SinglePartition", plan))
    assert singles <= 1, plan
