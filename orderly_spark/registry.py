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
# __spark_entry__.queries() in iteration order. ROUND-12 WINDOW (planner:
# tools/window_planner.py against the r11 base 522bd4a — red=0, the only
# NEVER row is this round's x_canonical_smiles; the chem/ord operator
# edits are fn-span-invisible to the planner and their consumers are
# enumerated by hand below):
# (a) the 2 round-12 registrations:
#     - x_canonical_smiles: F3 flipped partial→yes — REAL canonical
#       SMILES (Morgan-relaxation ranking + exhaustive tie-break +
#       deterministic writer, functions/smiles.py canonical_smiles)
#       over respelled-twin template groups. Canon strings are a
#       replayed-kernel oracle (same epistemics as _fp_literal_rows);
#       the ``idem`` and ``n_canon_grp`` columns are ORACLE CONSTANTS
#       (TRUE / 1), so idempotence and spelling-collapse are graded as
#       independent properties, not replays.
#     - s_rq_adc_topk: residual-quantization ANN (the r11 verdict's
#       sanctioned new-op item 6) — stacked full-width codebooks over
#       exact BIGINT residuals, separated-ADC identity, replayed
#       two-level training oracle under the s_pq discipline.
# (b) round-12 regrades, hand-enumerated operator-module consumers:
#     - c_canonicalise_dimension_roundtrip: its kernel
#       (chem._canonicalise_one, no-RDKit path) flipped from identity
#       to the parser/writer. The scaffold's molecule strings (digit /
#       's%'/'v%'/'p%' keys) are all OUTSIDE the parser subset, so the
#       values are provably unchanged (verified exact at sf0.001 and
#       sf0.01 this round) — regraded anyway rather than exempted.
#     - x_ord_scan_prune_decode: ord_datasource.read() restored
#       row-streaming in the default on_error='raise' path and
#       decode_reactions gained the all-skipped-task guard (r12
#       advice items) — default-path values identical (pinned by the
#       roundtrip + corrupt-wire tests), regraded anyway.
#     - mm_media_meta_decode + mm_frame_sampling: the r12 hostile-
#       MEDIA sweep (eighth corpus, /tmp/sf_med) found two real twin
#       gaps, both VALUE-CHANGING and fixed on both sides: (1) the
#       corrupt-branch fixture was raw text, so a document whose text
#       IS a valid OSMM container decoded valid while the oracle
#       assumed invalid — the branch now prefixes a non-magic byte
#       (n_bytes +1 mirrored in the oracle); (2) frame counts
#       DECLARED beyond the payload spun the sampling kernel (2e9
#       iterations from one hostile blob) — both twins now cap
#       frames at the payload length. _parse_fake additionally
#       rejects out-of-int32/wrong-typed header fields (valid=false
#       instead of an Arrow-conversion task death).
#       mm_resize_images / mm_binary_byte_ops / mm_embed_neardup are
#       NOT regrades: their values are unchanged by construction
#       (resize never emits the corrupt branch or frame counts;
#       byte-ops reads raw text; embed is rows-only) — verified
#       exact at sf0.001 + sf0.01 + all eight corpora this round.
# (c) the r12 rotation ledger HONOURED IN FULL: the 5 displaced rows
#     first (the only rows older than r7 — q13/q4/q14 displaced by the
#     r11 zero-norm regrades; t_udtf_token_runs / t_domain_cap_sample
#     displaced by the r11 relational-sweep regrades), then the ENTIRE
#     remaining r7-era cohort (36 rows, in their r7 grade order).
#     After this window lands, no driver row is older than r8.
# (d) buffer: the window still has 5 slots after (a)-(c); they pull
#     the r8-era drain forward (first 5 rows of the r8 cohort in r8
#     grade order), continuing the oldest-first discipline early.
# Hand-ledgered EXEMPTIONS (same-module edits provably not affecting
# any graded plan): functions/smiles.py gained the canonical writer
# BELOW morgan_fingerprint — the parser/fingerprint spans are
# byte-identical (x_morgan_fp_parsed, x_tm_isotope_scan,
# m_fp_matrix_sink keep their r11 rows); operators/clustering.py
# gained IDOT_SQL/_cent_map/_idot/rq_adc_topk as NEW defs — kmeans_fit
# / pq / opq spans byte-identical (the r11-fresh s_kmeans/s_ivf/s_pq/
# s_opq rows stand); chem.py canonical_smiles_udf span unchanged, and
# the new parsed_canonical_smiles_udf / _parsed_canonicalise_one feed
# only (a)/(b) queries; tools/round11_scale_probe.py is probe tooling
# with no registered consumer.
# ---------------------------------------------------------------------------

GRADE_PRIORITY: tuple[str, ...] = (
    # (a) new in round 12
    "x_canonical_smiles",
    "s_rq_adc_topk",
    # (b) regrades (kernel-flip / advice-fix / media-sweep consumers)
    "c_canonicalise_dimension_roundtrip",
    "x_ord_scan_prune_decode",
    "mm_media_meta_decode",
    "mm_frame_sampling",
    # (c) the r12 rotation ledger — 5 displaced rows first
    "q13_customer_order_distribution",
    "q4_priority_with_late_lines",
    "q14_promo_revenue_share",
    "t_udtf_token_runs",
    "t_domain_cap_sample",
    # ... then the full r7-era cohort (36 rows, r7 grade order)
    "e_gapfill_locf",
    "a_grouped_mode",
    "a_mad_outliers",
    "j_pareto_skyline",
    "t_weighted_key_sample",
    "j_bloom_pruned_join",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "o_price_sorted_lines",
    "a_variance_by_segment",
    "e_hourly_event_rollups",
    "e_pivot_user_event_matrix",
    "j_band_quantity_tiers",
    "j_bucketed_colocated_join",
    "r_compaction_bin_packing",
    "t_temperature_mixture",
    "t_repetition_signals",
    "t_doc_chunking",
    "t_token_drift_chi2",
    "d_prefix_filter_jaccard",
    "d_prefix_filter_jaccard_skew",
    "m_set_equality_accuracy",
    "a_unpivot_lineitem_measures",
    "t_stratified_sample",
    "t_corpus_mixture",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "q10_returned_customers",
    "q7_volume_shipping",
    "q8_market_share",
    "q12_late_lines_by_status",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q20_excess_suppliers",
    "q21_waiting_supplier",
    # (d) buffer — r8-era drain pulled forward (first 3, r8 order; two
    # buffer slots were reclaimed by the media-sweep regrades in (b))
    "e_time_weighted_avg",
    "w_top3_spenders_per_nation",
    "w_running_account_value",
)
# Final arithmetic: 2 new + 4 regrades + 5 displaced + 36 r7-era +
# 3 r8-era buffer = exactly 50.
# The r13 rotation ledger: the remaining 35-row r8-era cohort
# (CORRECTNESS_r08 order, starting at w_dense_rank_parts_by_brand),
# oldest-first, unless operator changes dictate otherwise.
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
    """SQL text mirroring :func:`davg`.

    SELF-PARENTHESIZED (r9, closing the r8 q17 footgun for good): the
    expansion is ``(SUM/COUNT)``, so composing call sites like
    ``0.2 * {DAVG(x)}`` keep Spark's ``0.2 * avg`` association instead
    of silently re-associating to ``(0.2 * SUM) / COUNT`` — an
    off-by-one-ulp threshold divergence measured on 506/2000 part keys
    at sf0.01 before the q17 site was hand-parenthesized in r8. The
    three bare-alias users (q1, q17, q22) regraded with the new
    oracle text in the r9 window."""
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}))"


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


def DBROUND(expr: str, scale: int) -> str:
    """SQL text mirroring Spark's ``F.bround(double, scale)`` —
    HALF_EVEN (banker's) on the double's SHORTEST decimal repr, the
    same shortest-repr route as :func:`DROUND`.

    Built from FLOOR + parity rather than DuckDB's ``round_even``
    because round_even on DECIMAL is inconsistent at ties in duckdb
    1.0.0 (verified live: round_even(1.005, 2) = 1.01 but
    round_even(2.005, 2) = 2.0). The FLOOR construction is twin-exact
    with F.bround over a 20k adversarial grid at scales 2 and 6,
    negatives included (q FLOOR'd toward -inf keeps the tie fraction
    at exactly 0.5 for negative values; DuckDB's %-sign convention
    makes ``q % 2 = 0`` the right even test on both signs).

    WHY HALF_EVEN: the reference's conversions use Python ``round()``
    (extractor.py:404-474), which is HALF_EVEN — F.round's HALF_UP
    diverged at every exactly-representable .xx5 boundary (r8 ledgered
    ceiling). Residual ceiling, documented not hidden: Python rounds
    the TRUE binary value, so a non-dyadic double whose shortest repr
    prints ...5 (e.g. 2.675 = 2.67499…) still rounds 2.68 here vs 2.67
    in Python — no Spark builtin sees past the shortest repr. Dyadic
    ties (0.125, 0.375) now match Python exactly.

    Magnitude ceiling (same family as DROUND's): the ``d * 10^scale``
    decimal multiply must fit DECIMAL(38,20) — |value| beyond ~10^16
    at scale 2 errors LOUDLY in DuckDB rather than silently rounding;
    conversion magnitudes sit many orders below it."""
    p = 10**scale
    d = f"CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,20))"
    m = f"({d} * {p})"
    q = f"FLOOR({m})"
    res10 = (
        f"({q} + CASE WHEN {m} - {q} > 0.5 THEN 1 "
        f"WHEN {m} - {q} < 0.5 THEN 0 "
        f"WHEN {q} % 2 = 0 THEN 0 ELSE 1 END)"
    )
    return f"(CAST({res10} AS DOUBLE) / {p})"
