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
# __spark_entry__.queries() in iteration order. ROUND-5 WINDOW — built to
# drain the round-4 proof backlog (VERDICT r4 items 1-2):
# (a) the 10 round-4 registrations that have NEVER carried a driver row;
# (b) the ~20-query regrade queue: operator/oracle code touched by r4
#     review passes 5-7 AFTER each query's last driver green (the full
#     list the r4 ledger promised to r5), every one re-verified on the
#     local DuckDB replica at sf0.001 AND sf0.01 before round end;
# (c) round-5 code changes: the new m_condition_benchmark_table
#     (run.py:172-269 parity table), the k-means queries (centroid
#     update moved from double '/' to integer 'div' — value-identical
#     below 2^53 but semantics changed), and the as-of join (window
#     tie-break added);
# (d) sentinels: flagship pipelines + one per battery, weighted toward
#     r1/r2-era greens on long-unchanged code so old evidence gets
#     refreshed, plus the four bench-tail flagships so their driver
#     rows stay current with their timings.
# Rotated OUT (VERDICT r4 nit 2): a_approx_sketches and
# mm_embed_neardup — permanently rows-only by design (HLL++/GK
# percentile internals and the md5-Gaussian embedding kernel are
# engine-specific); they already carry their maximum evidence (clean
# rows-only rows in CORRECTNESS_r04) and can never earn more.
# ---------------------------------------------------------------------------

GRADE_PRIORITY: tuple[str, ...] = (
    # (a) never driver-graded (registered late in r4)
    "e_json_extract_stats",
    "w_hopping_window_counts",
    "x_corrupt_csv_ingest",
    "a_histogram_quantiles",
    "m_kfold_assignments",
    "t_token_drift_chi2",
    "r_zorder_morton_codes",
    "j_salted_supplier_revenue",
    "a_countmin_estimates",
    "j_interval_overlap_join",
    # (b) regrade queue: r4 review passes 5-7 touched these after
    # their last driver green (see the r4 ledger); each re-verified
    # locally at both scales
    "s_session_windows",
    "m_frequency_baseline",
    "m_rare_threshold_sweep",
    "t_rare_threshold_sweep",
    "m_ohe_vocab_encode",
    "x_solvent_agent_split",
    "x_real_solvent_partition",
    "x_yield_extraction",
    "c_canonicalise_dimension_roundtrip",
    "x_tm_isotope_scan",
    "m_fingerprint_difference",
    "x_ord_scan_prune_decode",
    "x_config_json_roundtrip",
    "f_is_number_filter",
    "f_unit_conversion",
    "c_wide_export_pivot",
    "mm_media_meta_decode",
    "mm_binary_byte_ops",
    "mm_frame_sampling",
    # (c) round-5 changes
    "m_condition_benchmark_table",  # NEW: A8+F17-F19 composed (run.py:172-269)
    "s_kmeans_cells",               # clustering.py div fix (r5)
    "s_ivf_kmeans_topk",            # clustering.py div fix (r5)
    "asof_purchase_after_click",    # asof.py tie-break fix (r5)
    # (c') round-5 scratch-leak fixes (materialize_then_clean /
    # bounded-reuse bucketing): these queries' code changed, so their
    # earlier greens must be re-earned
    "x_name_list_csv_roundtrip",
    "x_multi_format_roundtrip",
    "c_merge_extracted_roundtrip",
    "c_split_sink_roundtrip",
    "m_fp_matrix_sink",
    "j_bucketed_colocated_join",
    # (c'') round-5 review pass 9: zero-token docs now survive rare
    # filtering (operator + oracle fixed in lockstep, value-identical
    # on current data — no empty-text docs at any SF — boundary pinned
    # by tests/test_text_ops.py); t_rare_threshold_sweep, equally
    # touched, is already in block (b)
    "t_docs_without_rare_tokens",
    # (d) sentinels: flagships (bench re-times the first four every
    # round), the r4 bench-tail additions, and r1/r2-era greens on
    # long-unchanged code
    "c_clean_pipeline_fullscale",
    "c_split_fullscale",
    "q9_product_profit",
    "s_cosine_topk",
    "t_corpus_curation_pipeline",
    "t_training_prep_pipeline",
    "t_span_dedup_rebuild",
    "d_incremental_index_dedup",
    "g_pagerank_part_supplier",
    "sql_shared_text_nation_year_revenue",
)
# Sentinels originally slotted for this window but displaced by the
# (c')/(c'') regrades — each has a valid green on code unchanged
# since that green, so nothing is owed: d_minhash_lsh_pairs (r4 VALUE
# green, dedup.py untouched in r5, bench times it every round),
# q1_pricing_summary (r2 green,
# tpch.py unreviewed-diff-free since; bench still times it every
# round), d_exact_dup_stats + d_ngram_jaccard_pairs (r1 greens,
# dedup.py paths untouched in r4/r5), t_token_counts (r3, text.py
# reviewed clean in r5 pass 8, no diff), e_sessionized_counts (r3,
# sessionize untouched), f_date_roundtrip (r2, functions battery
# untouched). First in line for r6 evidence-refresh slots.

# Round-5 rotation ledger (supersedes the r4 backlog notes — and
# corrects them: the r4 note claiming operators/cleaning.py and
# clean_battery.py had "ZERO r4 diff" was stale; both DID change in r4
# (reaction_key md5 member encoding, merge_extracted sentinel wiring +
# deterministic tiebreak, DEDUP_KEY oracle), which is exactly why
# block (f) of the r4 window re-graded c_merge_extracted_roundtrip,
# c_dedup_random_survivor, c_rare_to_other and
# c_clean_pipeline_fullscale — all four earned fresh r4 VALUE greens
# on the post-fix code. c_split_fullscale stands on its r3 green:
# train_test_split keys on reaction_hash, which the collision fix
# deliberately did not touch (it mirrors the reference's own '.'-join,
# cleaner.py:913-924), and operators/cleaning.py:551-577 is unchanged
# since; c_train_test_split re-earned its green in r4 on the same
# path.
#
# Rotated out THIS round, each with a valid green on code unchanged
# since that green:
#   a_approx_sketches, mm_embed_neardup — permanently rows-only by
#     design (see window comment); r4 rows are their ceiling.
#   All r4-window members not re-listed above (t_stratified_sample,
#     t_corpus_mixture, t_pii_scrub, t_token_budget_packing,
#     e_resample_forward_fill, mm_resize_images,
#     s_stream_running_totals, c_train_test_split,
#     c_merge_extracted_roundtrip, c_dedup_random_survivor,
#     c_rare_to_other, t_repetition_signals, t_doc_chunking,
#     t_salient_terms, e_latest_state_per_key,
#     t_benchmark_decontamination, d_corpus_snapshot_diff,
#     s_stream_click_attribution, s_quantized_cosine_topk,
#     s_stream_upsert_compaction, d_duplicate_clusters,
#     d_duplicate_clusters_star, x_multi_format_roundtrip,
#     j_bucketed_colocated_join, s_stream_dedup_ingest,
#     w_range_frame_trailing_hour, a_winsorized_group_stats,
#     e_scd2_state_intervals, t_token_df_scores, t_inverted_index,
#     a_table_checksum_rollup, j_fuzzy_name_match,
#     a_hll_distinct_estimates, s_stream_static_enrich,
#     d_dupgraph_triangle_stats, e_session_funnel, e_cohort_retention,
#     x_data_quality_report, s_ivf_cosine_topk) — all VALUE/rows-green
#     in CORRECTNESS_r04 on code that r5 does not change. EXCEPTIONS
#     kept in-window: s_kmeans_cells + s_ivf_kmeans_topk (r5 div fix),
#     t_corpus_curation_pipeline / t_training_prep_pipeline /
#     t_span_dedup_rebuild / d_incremental_index_dedup /
#     g_pagerank_part_supplier / d_minhash_lsh_pairs (bench-tail
#     flagships, kept as sentinels).
#   Earlier-round greens on unchanged code (not re-listed): the
#     full r2/r3 battery tail — tpch.py/tpch_full.py rows (reviewed
#     line-by-line in r5 pass 8, no diff), extract/clean battery rows
#     outside the regrade queue, streaming rows outside
#     s_session_windows, similarity rows outside the kmeans pair,
#     d_simhash_pairs, and the SQL-surface battery except its
#     sentinel. Rotate any back in when its operator file next
#     changes.
# Window-discipline invariant (tests/test_grading_order.py): every
# registered query must have a driver row in some CORRECTNESS_r0*.json
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
