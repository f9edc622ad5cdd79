"""Query registry: every operator from SURVEY.md §2 (plus the
beyond-reference LLM-pipeline operators) is declared here as a named
query over the testdata tables, paired with the ANSI-SQL oracle the
driver runs through DuckDB.

Contract (from the driver):
- ``fn(spark, sf_dir) -> DataFrame``
- ``oracle`` is DuckDB-runnable SQL over pre-registered views
  (region nation customer supplier part orders lineitem events
  documents embeddings); ``None`` for non-SQL-expressible ops
  (rows-only check).
- Column names must match between the Spark result and the oracle —
  alias every computed column on both sides.

Float discipline: the driver hash-compares values, so floating-point
aggregates must be bit-identical between Spark (parallel, arbitrary
reduce order) and DuckDB (sequential). Sums therefore go through
exact DECIMAL(38,6) accumulation and are cast back to double at the
end — order-independent and identical in both engines. Helpers
``dsum`` / ``davg`` (Spark side) mirror ``DSUM`` / ``DAVG`` SQL text.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    category: str = ""
    survey: str = ""  # SURVEY §2 operator ids this query exercises
    doc: str = field(default="")


REGISTRY: dict[str, Query] = {}

# ---------------------------------------------------------------------------
# Grading-order curation. The round driver grades the FIRST 50 entries of
# __spark_entry__.queries() in iteration order. ROUND-7 WINDOW:
# (a) the 11 round-7 registrations (every one oracle-verified locally at
#     sf0.001 AND sf0.01 before round end);
# (b) the one r6 red: r_compaction_bin_packing (driver hash_match false
#     from the uncast-SUM HUGEINT float64 rendering; oracle CASTs fixed
#     and the local comparator now fails on float-vs-int dtype drift);
# (c) round-7 regrades -- queries whose code changed after their last
#     green. Planner-flagged (function spans): g_pagerank_part_supplier
#     (top-20 via orderBy+limit, no global window), t_repetition_signals /
#     t_doc_chunking / t_training_prep_pipeline / t_stratified_sample /
#     t_corpus_mixture (shared sampling/chunking/dup-ratio expression
#     twins + TRY_CAST source-number guard), a_histogram_quantiles
#     (single conditional aggregate + stack unpivot), t_token_drift_chi2
#     (comment-only), j_bucketed_colocated_join (reaper threshold,
#     value-neutral). Hand-ledgered CROSS-FILE deps (the planner's
#     documented blind spot): d_prefix_filter_jaccard (integer-div ceil
#     in operators/dedup.py, value-identical), s_stream_click_attribution
#     and s_stream_outer_attribution (pipeline.py attribution-join select
#     gained a full_outer branch; inner/left_outer paths emit the same
#     c_user key as before -- verified both scales);
# (d) evidence-refresh sentinels: 26 of the 35 remaining r2-era greens,
#     promise-first (the six displaced entries named in the r6 ledger:
#     a_unpivot_lineitem_measures, a_variance_by_segment,
#     e_hourly_event_rollups, e_json_props_sum, e_pivot_user_event_matrix,
#     m_set_equality_accuracy), then alphabetical. Deferred to r8: the
#     8 alphabetically-last r2 greens plus s_filtered_cosine_topk,
#     which yielded its refresh slot to the late t_temperature_mixture
#     registration (same pattern as r6's late additions)
#     (sql_fn_reaction_hash,
#     sql_fn_scalar_battery, u_nation_presence_setops, w_dense_rank_
#     parts_by_brand, w_ntile_balance_quartiles, w_running_account_value,
#     w_top3_spenders_per_nation, x_unit_conversions), all on unchanged
#     code. Still permanently rotated out: a_approx_sketches and
#     mm_embed_neardup (rows-only by design; their r4 rows are their
#     ceiling).
# ---------------------------------------------------------------------------

GRADE_PRIORITY: tuple[str, ...] = (
    # (a) new in round 7
    "d_prefix_filter_jaccard_skew",
    "d_containment_pairs",
    "e_time_weighted_avg",
    "e_gapfill_locf",
    "a_grouped_mode",
    "a_mad_outliers",
    "j_pareto_skyline",
    "t_weighted_key_sample",
    "j_bloom_pruned_join",
    "s_stream_full_outer_attribution",
    "t_temperature_mixture",  # late r7 addition (sqrt-temperature resampling)
    # (b) the r6 red
    "r_compaction_bin_packing",
    # (c) round-7 regrades
    "g_pagerank_part_supplier",
    "t_repetition_signals",
    "t_doc_chunking",
    "t_training_prep_pipeline",
    "t_stratified_sample",
    "t_corpus_mixture",
    "a_histogram_quantiles",
    "t_token_drift_chi2",
    "j_bucketed_colocated_join",
    "d_prefix_filter_jaccard",
    "s_stream_click_attribution",
    "s_stream_outer_attribution",
    # (d) evidence refresh: promised displaced entries first...
    "a_unpivot_lineitem_measures",
    "a_variance_by_segment",
    "e_hourly_event_rollups",
    "e_json_props_sum",
    "e_pivot_user_event_matrix",
    "m_set_equality_accuracy",
    # ...then the remaining r2-era greens, alphabetical
    "j_band_quantity_tiers",
    "o_price_sorted_lines",
    "q10_returned_customers",
    "q11_important_parts",
    "q12_late_lines_by_status",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q20_excess_suppliers",
    "q21_waiting_supplier",
    "q22_idle_rich_customers",
    "q2_min_unit_price_supplier",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "s_embedding_neardup_pairs",
)
# Rotated out this round: the whole r6 window (every entry holds a fresh
# r6 green; r_compaction_bin_packing stays -- red) plus nothing else. The
# r3/r4/r5-green battery tails stand on rows newer than everything block
# (d) refreshes; rotate any back in when its operator file next changes.
# Window-discipline invariant (tests/test_grading_order.py): every
# registered query must have a driver row in some CORRECTNESS_r*.json
# OR a slot in this window — a query can no longer be registered
# without a grading plan.


def ordered_registry() -> dict[str, Query]:
    """REGISTRY re-ordered so :data:`GRADE_PRIORITY` names come first
    (in that order), the rest in registration order."""
    front = [n for n in GRADE_PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(GRADE_PRIORITY)]
    return {n: REGISTRY[n] for n in [*front, *rest]}


def query(
    name: str,
    oracle: str | None = None,
    *,
    category: str = "",
    survey: str = "",
):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, category=category, survey=survey, doc=fn.__doc__ or ""
        )
        return fn

    return deco


# ---------------------------------------------------------------------------
# Exact-aggregation helpers (order-independent floats)
# ---------------------------------------------------------------------------

def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column (exact decimal accumulate).

    Ceiling: the final decimal→double cast is engine-identical only
    while |sum|·10⁶ < 2⁵³ (≈9·10⁹ sum magnitude) — beyond that the
    int→double conversion double-rounds and Spark/DuckDB can differ
    in the last ulp. Bench sums sit well under this; for larger
    magnitudes reduce the scale losslessly before the double cast
    (see a_variance_by_segment's second moment)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,6)")).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    # exact decimal sum → double, THEN an IEEE double division: both
    # steps are order-independent and bit-identical across engines
    # (decimal/decimal division scale rules differ between engines).
    return F.sum(c.cast("decimal(38,6)")).cast("double") / F.count(c)


def DSUM(expr: str) -> str:
    """SQL text mirroring :func:`dsum` for the DuckDB oracle."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def DAVG(expr: str) -> str:
    """SQL text mirroring :func:`davg`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"


def DROUND(expr: str, scale: int) -> str:
    """SQL text mirroring Spark's ``F.round(double, scale)``.

    Spark rounds HALF_UP on BigDecimal.valueOf(double) — i.e. on the
    double's SHORTEST decimal representation ('1.035' → 1.04) — while
    DuckDB's ROUND works on the raw binary double (1.03499… → 1.03).
    Routing through VARCHAR reproduces the shortest-repr + HALF_UP
    (away-from-zero) path exactly. Scale 20 > the 17 significant
    digits a double's shortest repr can carry, so the decimal cast is
    lossless (a narrower scale would itself round, e.g.
    0.19499999999999998 → 0.195 → wrong direction)."""
    return (
        f"CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,20)), {scale}) AS DOUBLE)"
    )
