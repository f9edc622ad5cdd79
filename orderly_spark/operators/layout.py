"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

Reference: none (the reference repo writes unordered parquet); this is
an [abs] operator for the 100 TB north star. Sorting a table by ONE
column gives parquet min/max pruning on that column only; interleaving
the bits of several filter columns into one Morton code and
range-partitioning + sorting by it gives every file a small
HYPER-RECTANGLE of the key space, so a selective filter on ANY of the
interleaved dimensions (or a box on several) skips most files — the
mechanism behind Delta/Iceberg ``OPTIMIZE ZORDER BY``, expressed with
stock Spark: pure bit-arithmetic expression + repartitionByRange +
sortWithinPartitions. tests/test_storage_layout.py measures the
footer-stats pruning win over a single-column sort on real files.

Everything is exact integer bit manipulation — engine-identical, so
the z-value computation itself sits under the driver's value oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 10) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column
    (column j's bit b lands at position b·n_cols + j). Columns must be
    non-negative integers; values ≥ 2^bits wrap via mask (callers
    should normalise/bucket first — rank or quantile bucketing makes
    the code robust to skew). Pure codegen expressions, no UDF."""
    n = len(cols)
    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit(mask))
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + j))
    return z


def ZVALUE_SQL(exprs: list[str], bits: int = 10) -> str:
    """DuckDB mirror of :func:`zvalue` (same bit placement)."""
    n = len(exprs)
    mask = (1 << bits) - 1
    terms = []
    for j, e in enumerate(exprs):
        v = f"(CAST({e} AS BIGINT) & {mask})"
        for b in range(bits):
            terms.append(f"((({v} >> {b}) & 1) << {b * n + j})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = 10,
) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition by the
    Morton code (each output file owns a contiguous z-range = a small
    box of the key space), sort within partitions so row groups inside
    a file are tight too, then drop the helper column. At 100 TB this
    is the compaction job's layout step: one range shuffle, and every
    later query filtering any indexed dimension reads a fraction of
    the files via plain parquet min/max pruning — no index structure,
    no table format dependency.

    Note: range-boundary SAMPLING makes the exact file count (and
    which file owns a boundary z-value) run-dependent — fine for a
    production layout job where only the clustering property matters,
    but don't assert exact counts on its output
    (tests/test_storage_layout.py measures pruning on a deterministic
    partitionBy layout for that reason; the content itself is checked
    here by tests/test_storage_layout.py's write_zordered test)."""
    z = df.withColumn("__z", zvalue([F.col(c) for c in cols], bits))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
