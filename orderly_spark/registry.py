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
# __spark_entry__.queries() in iteration order. Round 3 window:
# (a) the 12 queries that have NEVER carried a driver row (text battery,
#     LSH ANN, both streaming twins, sketches);
# (b) the 8 queries added this round (P9/U4/A1/F8/F15/F4/F5 coverage +
#     streaming ingest);
# (c) re-grades of everything whose semantics changed after its green row:
#     the whole clean battery + 3 extract queries (round-2 semantic fixes,
#     round-3 membership-machinery + dedup-skip + oracle-key changes),
#     m_rare_threshold_sweep (round-3 join shape), and the epoch_us
#     consumers (round-3 zone-proof rewrite);
# (d) 2-3 sentinels from each earlier battery so green rows can't silently
#     outrun their evidence (VERDICT r2 item 8).
# Queries not listed keep registration order after the block.
# ---------------------------------------------------------------------------

GRADE_PRIORITY: tuple[str, ...] = (
    # (a) never graded
    "t_token_counts",
    "t_quality_scores",
    "t_language_id",
    "t_minhash_fingerprints",
    "t_token_value_counts",
    "t_rare_tokens_to_other",
    "t_docs_without_rare_tokens",
    "t_rare_threshold_sweep",
    "s_lsh_cosine_topk",
    "s_windowed_event_counts",
    "s_session_windows",
    "a_approx_sketches",
    # (b) new this round
    "c_sentinel_wide_roundtrip",
    "c_rare_offender_ids",
    "x_distinct_sorted_names",
    "x_yield_extraction",
    "x_tm_isotope_scan",
    "x_atom_map_detect",
    "m_fingerprint_difference",
    "s_stream_dedup_ingest",
    "x_real_solvent_partition",
    "x_ord_scan_prune_decode",
    "x_name_list_csv_roundtrip",
    "x_config_json_roundtrip",
    "c_merge_extracted_roundtrip",
    "m_fp_matrix_sink",
    # (c) stale green — clean battery (r2+r3 changes)
    "c_reactions_build",
    "c_unresolved_drop_rows",
    "c_unresolved_null_if_mapped",
    "c_filter_stack",
    "c_dedup_random_survivor",
    "c_rare_to_other",
    "c_rare_remove_rows",
    "c_scramble_deterministic",
    "c_full_clean_pipeline",
    # c_train_test_split's exact semantics re-grade rides its superset
    # twin (same oracle + the S9 disk round trip)
    "c_split_sink_roundtrip",
    "c_clean_pipeline_fullscale",
    "c_split_fullscale",
    "c_wide_export_pivot",
    "c_canonicalise_dimension_roundtrip",
    # (c) stale green — extract battery (r2 pooling/TM-first, r3 TM regex)
    "x_solvent_agent_split",
    "x_tm_first_and_pd_c",
    "x_yield_product_alignment",
    # (c) r3 implementation changes
    "m_rare_threshold_sweep",
    "e_sessionized_counts",
    "w_lag_event_spacing",
    "asof_purchase_after_click",
    # (d) sentinels: tpch / dedup / multimodal (frame sampling doubles
    # as NEW signal for the previously-ungated one-to-many mm path)
    "q1_pricing_summary",
    "d_minhash_lsh_pairs",
    "mm_frame_sampling",
)

# Round-4 rotation backlog (registered late in round 3, outside this
# window — grade next round alongside whatever round 4 changes):
#   mm_resize_images, mm_embed_neardup, s_stream_running_totals,
#   d_duplicate_clusters (iterative connected components),
#   t_corpus_curation_pipeline (composed quality->dedup->cluster pipeline),
#   t_stratified_sample, t_corpus_mixture (sampling / mixture weighting),
#   t_pii_scrub (regex PII redaction),
#   e_resample_forward_fill (1h-grid resample + forward fill),
#   t_token_budget_packing (sequential context-window packing),
#   c_train_test_split (its exact re-grade rode c_split_sink_roundtrip)


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
