"""As-of join — absent in stock Spark (SURVEY §2.3 '[abs]' row).

Implemented as the union + window trick rather than a broadcast
nested-loop inequality join: tag both sides, union on a common
schema, sort within each key partition by (ts, side), and carry the
most recent right-side row forward with ``last(..., ignorenulls)``.

Scale properties: exactly ONE shuffle on the join keys (same cost as
an equi-join), no O(n·m) comparisons, skew handled by AQE. This is
the plan a range-join hint would produce for the backward-as-of case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` keys.

    Equal timestamps match (inclusive), mirroring DuckDB/pandas
    ``merge_asof`` defaults — right rows sort before left rows at the
    same instant via the side marker.
    """
    on = list(on)
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in lcols],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Tie discipline (review finding): two RIGHT rows sharing (keys,
    # ts) had no defined order under (ts, side) alone, so the
    # carried-forward winner depended on partition-internal row order
    # — nondeterministic across retries/replans. The __r_* value
    # columns complete the order: ties resolve to the greatest right
    # row in value-column order (fully-duplicate rows are
    # indistinguishable, so any winner is the same row).
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts"),
            F.col("__side"),
            *[F.col(f"__r_{c}").asc_nulls_first() for c in right_value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        F.col("__ts"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
        F.last(F.col("__r_ts"), ignorenulls=True).over(w).alias(f"{right_ts}{suffix}"),
    )
    return carried.filter(F.col("__side") == 1).drop("__side", "__ts")
