"""As-of join — absent in stock Spark (SURVEY §2.3 '[abs]' row).

Implemented as the union + window trick rather than a broadcast
nested-loop inequality join: tag both sides, union on a common
schema, sort within each key partition by (ts, side), and carry the
most recent right-side row forward with ``last(..., ignorenulls)``.

Scale properties: exactly ONE shuffle on the join keys (same cost as
an equi-join), no O(n·m) comparisons, skew handled by AQE. This is
the plan a range-join hint would produce for the backward-as-of case.

Oracle caveat (advice r5/r6, all three directions): when the RIGHT
side has duplicate (key, ts) rows, this engine pins ties to the
greatest right row in value-column order, while DuckDB's ASOF JOIN
tie choice among duplicate right timestamps is unspecified — the
oracle equality therefore holds only while (key, right_ts) is unique
on the right side. tests/test_properties.py asserts that uniqueness
for the click side of the three asof_* queries at both graded scales,
so a testdata regeneration that introduces ties fails loudly instead
of flaking the driver hash.
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
    return _asof_join(
        left, right, on, left_ts, right_ts, right_value_cols, suffix, forward=False
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the LEAST
    ``right_ts`` >= ``left_ts`` within the same ``on`` keys
    (merge_asof direction='forward'; inclusive at equal timestamps).

    Same single-shuffle union+window plan as the backward join, with
    the timestamp order reversed; ties among equal-ts right rows
    resolve to the greatest right row in value-column order, matching
    the backward join's tie discipline."""
    return _asof_join(
        left, right, on, left_ts, right_ts, right_value_cols, suffix, forward=True
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach whichever right row is CLOSER in
    time — the greatest ``right_ts`` <= ``left_ts`` vs the least
    ``right_ts`` >= ``left_ts`` (merge_asof direction='nearest');
    exact-distance ties resolve to the BACKWARD match.

    Same single key-shuffle as the directional joins: ONE tagged
    union, TWO window passes over the same partitioning (an ascending
    and a descending sort — no second exchange), then a per-row
    pick-nearer on the two carried whole-row structs."""
    on = list(on)
    lcols = [c for c in left.columns]
    # NULL-timestamp discipline: same as _asof_join — null-ts right
    # rows are never candidates; null-ts left rows match nothing
    right = right.filter(F.col(right_ts).isNotNull())
    unioned = _tagged_union(left, right, on, left_ts, right_ts, right_value_cols)
    w_b = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side"), F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").desc(), F.col("__side"), F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cb = F.last(F.col("__r"), ignorenulls=True).over(w_b)
    cf = F.last(F.col("__r"), ignorenulls=True).over(w_f)
    both = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        F.col("__ts"),
        cb.alias("__b"),
        cf.alias("__f"),
    )
    d_b = F.col("__ts") - F.col("__b")["__rts"]
    d_f = F.col("__f")["__rts"] - F.col("__ts")
    winner = (
        F.when(F.col("__ts").isNull(), F.lit(None))  # null left ts: no match
        .when(F.col("__b").isNull(), F.col("__f"))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(d_f < d_b, F.col("__f"))
        .otherwise(F.col("__b"))  # ties -> backward
    )
    picked = both.withColumn("__w", winner)
    return (
        picked.filter(F.col("__side") == 1)
        .select(
            *[F.col(c) for c in lcols],
            *[F.col("__w")[c].alias(f"{c}{suffix}") for c in right_value_cols],
            F.col("__w")["__rts"].alias(f"{right_ts}{suffix}"),
        )
    )


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
) -> DataFrame:
    """Both sides on one schema: left columns (+NULL padding on the
    right side), a side marker, the event time as ``__ts``, and the
    whole right payload as ONE struct ``__r`` so a single
    last(ignorenulls) carries a WHOLE right row. Per-column last()
    (the pre-r6 shape) could stitch a combined row from two tied
    right rows — (a=NULL,b=1) + (a=2,b=NULL) → (a=2,b=1), a row
    existing on neither input (review finding)."""
    lcols = [c for c in left.columns]
    rstruct = F.struct(
        *[F.col(c).alias(c) for c in right_value_cols],
        F.col(right_ts).alias("__rts"),
    )
    rstruct_type = right.select(rstruct.alias("__r")).schema["__r"].dataType
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(rstruct_type).alias("__r"),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in lcols],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        rstruct.alias("__r"),
    )
    return tagged_left.unionByName(tagged_right)


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    suffix: str,
    *,
    forward: bool,
) -> DataFrame:
    on = list(on)
    lcols = [c for c in left.columns]
    # NULL-timestamp discipline (review finding, r8): a right row with
    # NULL right_ts is never a valid candidate (merge_asof / SQL ASOF
    # semantics: NULL comparisons are never true) — previously it
    # sorted FIRST under asc (Spark asc = nulls first) and became a
    # universal backward candidate. Filter it out. A left row with
    # NULL left_ts gets a NULL match (masked below) — previously the
    # forward/nearest desc sort placed it after all right rows and
    # fabricated a match to the earliest right row.
    right = right.filter(F.col(right_ts).isNotNull())
    unioned = _tagged_union(left, right, on, left_ts, right_ts, right_value_cols)
    # Tie discipline (review finding): two RIGHT rows sharing (keys,
    # ts) had no defined order under (ts, side) alone, so the
    # carried-forward winner depended on partition-internal row order
    # — nondeterministic across retries/replans. Ordering by the __r
    # struct (lexicographic over value cols then right ts, Spark
    # struct comparison = field-by-field with NULL fields first)
    # completes the order: ties resolve to the greatest right row
    # (fully-duplicate rows are indistinguishable, so any winner is
    # the same row).
    ts_order = F.col("__ts").desc() if forward else F.col("__ts").asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side"), F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    step = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        F.col("__ts"),
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__c"),
    )
    null_safe = F.when(F.col("__ts").isNotNull(), F.col("__c"))
    carried = step.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        *[null_safe[c].alias(f"{c}{suffix}") for c in right_value_cols],
        null_safe["__rts"].alias(f"{right_ts}{suffix}"),
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
