"""Text-analysis operators for a training-data pipeline: tokenisation,
n-gram shingling, language ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions (no Python
UDFs) — they run inside whole-stage codegen and scale linearly with
input bytes, no shuffle until an explicit aggregation.

Hash discipline: anything that feeds dedup/fingerprints uses
``md5(seed || ':' || value)`` — deterministic, partition-independent,
and reproducible in any engine (the DuckDB oracle runs the same
expression byte-for-byte).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language ID. Deliberately small + hardcoded: the operator
# shape (per-token membership scan vs broadcast sets) is what matters.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "de", "et", "que"),
    "zh": ("的", "了", "是", "在", "我"),
}

STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))

# Punctuation = anything that is not a Unicode letter/mark/number, an
# underscore, or ASCII whitespace. \p{M} keeps combining marks
# (Devanagari vowel signs, Arabic diacritics, NFD-decomposed accents)
# attached to their letters instead of counting them as punctuation.
# ONE shared class string for both
# engines: \p{L}\p{N} mean the same in Java regex and RE2, and the
# whitespace set is spelled out ([ \t\n\x0B\f\r] == Java \s) because
# RE2's \s lacks \x0B — identical text on both sides means the twins
# cannot drift (r9, replacing the ASCII-\w class that scored CJK /
# accented-Latin documents punct_ratio ≈ 1 and failed the quality
# gate). ONE constant serves both sides verbatim: Java regex and RE2
# both read the \t/\n/\x0B escapes themselves, and DuckDB's
# single-quoted strings pass backslashes through untouched — so the
# Spark pattern argument and the SQL-interpolated text are the same
# character sequence.
PUNCT_CLASS = r"[^\p{L}\p{M}\p{N}_ \t\n\x0B\f\r]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, lower-cased, empties removed.

    Oracle-parity ceiling (each edge pinned with its exact divergence
    shape in tests/test_expression_twins.py):
    - ASCII space/tab/newline/CR and ordinary Unicode agree (NBSP and
      U+3000 split the same in both engines; accented letters
      survive);
    - \\x0B (vertical tab) DIVERGES: Java's \\s matches it, DuckDB's
      RE2 \\s does not (the text_battery module docstring's
      long-standing caveat — now tested, not just stated);
    - FULL-vs-SIMPLE Unicode case mapping diverges on the Turkish
      dotted capital İ (U+0130): Java's lower() emits 'i' +
      combining-dot (U+0069 U+0307), DuckDB's emits plain 'i'.
    Both divergences are latent on the graded corpora (ASCII
    space/newline only); documented rather than patched — post-
    processing either engine's hot path to mask standards
    disagreements isn't worth it."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: F.length(t) > 0)


def TOKENS_SQL(expr: str) -> str:
    """DuckDB mirror of :func:`tokens` (case-mapping ceiling: see
    :func:`tokens`)."""
    return rf"list_filter(string_split_regex(lower({expr}), '\s+'), t -> len(t) > 0)"


def let_bound(value: Column, body) -> Column:
    """Let-binding for expression subtrees consumed inside
    higher-order-function lambdas: evaluate ``value`` ONCE per row and
    pass it to ``body`` as a bound lambda variable
    (``transform(array(value), v -> body(v))[1]``).

    WHY (r15 optimization round, guide §4 spirit at the expression
    level): Spark evaluates HOF lambdas interpreted, with no
    subexpression caching — a lambda body that references an outer
    expression TREE re-evaluates that whole tree on EVERY lambda
    invocation. ``shingles(tokens(text), 3)`` re-ran the regex
    split+filter of ``tokens`` ~3×(tokens-2) times per row (measured
    0.87 s vs 0.07 s for the tokens pass alone over 5000 sf0.1 docs ×
    32 cores). Binding makes the re-reference a cheap variable read.
    A lambda VARIABLE is already a value — bodies only need binding
    for derived non-variable subtrees."""
    return F.element_at(F.transform(F.array(value), body), 1)


def shingles(toks: Column, n: int) -> Column:
    """Distinct sorted n-word shingles of a token array.

    1-based ``element_at`` indexing so the same text works in DuckDB.
    Guarded against short docs: Spark's ``sequence(1, 0)`` descends,
    so the sequence is only built when at least one shingle exists.
    The token array is :func:`let_bound` so the per-shingle
    ``element_at`` reads index a materialised value instead of
    re-evaluating the tokenizer expression per gram.
    """

    def build(t: Column) -> Column:
        count = F.size(t) - (n - 1)
        parts = lambda i: [F.element_at(t, i + j) for j in range(n)]  # noqa: E731
        sh = F.when(
            count >= 1,
            F.transform(F.sequence(F.lit(1), count), lambda i: F.concat_ws(" ", *parts(i))),
        ).otherwise(F.array().cast("array<string>"))
        return F.array_sort(F.array_distinct(sh))

    return let_bound(toks, build)


def SHINGLES_SQL(toks_expr: str, n: int) -> str:
    """DuckDB mirror of :func:`shingles` (t := token list expr);
    ``range(1, k+1)`` is empty when k <= 0, matching the Spark guard."""
    join = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return (
        f"list_sort(list_distinct(list_transform("
        f"range(1, greatest(len({toks_expr}) - {n - 1}, 0) + 1), "
        f"i -> {join.replace('t[', f'({toks_expr})[')})))"
    )


def ngrams_raw(toks: Column, n: int) -> Column:
    """In-order, NON-distinct n-word grams of a token array — the raw
    sequence :func:`shingles` deduplicates. Kept separate (rather than
    refactoring shingles on top of it) so the long-green shingle
    consumers' code spans stay untouched; the two bodies are twin-
    tested against the same SQL generator family.

    Repetition statistics need the multiset: ``size - distinct_size``
    is the duplicated-gram count that Gopher-style repetition filters
    (Rae et al. 2021, §A.1.1) threshold on. Same short-doc guard as
    shingles: Spark's ``sequence(1, 0)`` DESCENDS, so the gram list is
    only built when at least one gram exists. Token array
    :func:`let_bound` for the same per-gram re-evaluation reason."""

    def build(t: Column) -> Column:
        count = F.size(t) - (n - 1)
        parts = lambda i: [F.element_at(t, i + j) for j in range(n)]  # noqa: E731
        return F.when(
            count >= 1,
            F.transform(F.sequence(F.lit(1), count), lambda i: F.concat_ws(" ", *parts(i))),
        ).otherwise(F.array().cast("array<string>"))

    return let_bound(toks, build)


def NGRAMS_RAW_SQL(toks_expr: str, n: int) -> str:
    """DuckDB mirror of :func:`ngrams_raw` (``range(1, k+1)`` is empty
    when k <= 0, matching the Spark guard)."""
    join = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return (
        f"list_transform("
        f"range(1, greatest(len({toks_expr}) - {n - 1}, 0) + 1), "
        f"i -> {join.replace('t[', f'({toks_expr})[')})"
    )


def max_multiplicity(arr: Column) -> Column:
    """Highest multiplicity of any NON-NULL element in a string array
    (0 for empty/NULL). Linear scan: sort, then one ``aggregate`` pass
    carrying a (prev, run, best) struct — run-length encoding without
    exploding the array into rows, so the whole statistic stays
    map-side. The SQL twin (:func:`MAX_MULTIPLICITY_SQL`) is the
    quadratic distinct×filter form — the oracle doesn't need to
    scale, the engine does; the twin test pins that the two shapes
    agree.

    NULL members are dropped before the fold (r9 advice fix): DuckDB's
    list_distinct drops NULLs, so the SQL twin scores [NULL,NULL,'a']
    as 1 and [NULL,NULL] as 0 — the old eqNullSafe fold counted the
    NULL run itself (2 and 2). Live gate inputs are concat_ws n-grams
    (never NULL), so no graded value moves; the twins now agree on
    NULL members too instead of relying on that precondition."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        # eqNullSafe: the first element never matches the NULL seed, so
        # its run is 1 without a separate first-element branch.
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + F.lit(1)).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    # coalesce: a NULL array must yield 0 like the SQL twin's
    # COALESCE(list_max(...), 0) — F.aggregate propagates NULL
    # (review finding, r8)
    return F.coalesce(
        F.aggregate(
            F.array_sort(F.filter(arr, lambda x: x.isNotNull())), init, step, lambda acc: acc["best"]
        ),
        F.lit(0),
    )


def MAX_MULTIPLICITY_SQL(expr: str) -> str:
    """DuckDB mirror of :func:`max_multiplicity` — quadratic
    distinct×count form (``_mg``/``_mx`` lambda names chosen to never
    collide with caller lambdas); ``list_max([])`` is NULL, coalesced
    to the Spark side's 0."""
    return (
        f"COALESCE(list_max(list_transform(list_distinct({expr}), "
        f"_mg -> len(list_filter({expr}, _mx -> _mx = _mg)))), 0)"
    )


def seeded_md5(seed: int | str, value: Column) -> Column:
    """Deterministic seeded hash as a 32-hex-char string; ordering on
    the hex string is the ordering used by MinHash."""
    return F.md5(F.concat(F.lit(f"{seed}:"), value))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punctuation boundaries (a cheap BPE proxy)."""
    pieces = F.split(F.lower(text), r"(\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])|(?<=[a-z0-9])(?=[^a-z0-9\s])|(?<=[^a-z0-9\s])(?=[a-z0-9]))")
    return F.size(F.filter(pieces, lambda t: F.length(t) > 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + composite score (SURVEY north
    star: quality scoring). Adds n_tokens, mean_token_len,
    stopword_ratio, punct_ratio, quality_score."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("decimal(38,6)"), lambda a, t: a + F.length(t).cast("decimal(38,6)")).cast(
            "double"
        )
        / n_tok,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tok.cast("double")
    ).otherwise(F.lit(0.0))
    n_chars = F.length(F.col(text_col))
    # Unicode classes (r9, closing the r8 ledgered ceiling): the old
    # Java-ASCII \w counted every non-ASCII letter as punctuation, so a
    # CJK or accented-Latin document scored punct_ratio ≈ 1 and FAILED
    # the quality gate — silently discarding non-English text at scale.
    # \p{L}\p{N} count all Unicode letters/numbers as non-punct; the
    # whitespace set is spelled out ([ \t\n\x0B\f\r] == Java \s) rather
    # than \s because RE2's \s lacks \x0B — the explicit class makes
    # the DuckDB twin byte-equivalent BY CONSTRUCTION (verified live:
    # Java vs RE2 agree on CJK / Devanagari / emoji / \x0B / NBSP).
    # Unicode WHITESPACE beyond ASCII (NBSP, U+3000) still counts as
    # punct on both twins — consistent, and a real signal of odd
    # spacing in a corpus.
    punct_ratio = F.when(
        n_chars > 0,
        (n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Stopword-overlap language ID: argmax over per-language marker
    hits; 'und' when nothing matches. Deterministic tie-break by
    language code order."""
    toks = tokens(text_col)

    def marker_hits(ws: tuple[str, ...]):
        # NB: a one-parameter lambda is required — PySpark treats a
        # two-parameter callable as (element, index).
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    scores = [marker_hits(ws).alias(lang) for lang, ws in sorted(LANG_MARKERS.items())]
    df2 = df.withColumn("__scores", F.struct(*scores))
    langs = sorted(LANG_MARKERS)
    # forward fold: strictly-greater wins, so the first language in
    # code order takes ties (deterministic argmax)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in langs:
        is_better = F.col(f"__scores.{lang}") > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, F.col(f"__scores.{lang}")).otherwise(best_n)
    return df2.withColumn(out_col, best).drop("__scores")


def min_k_fingerprint(text: Column, *, shingle_n: int = 5, k: int = 4, seed: int = 7) -> Column:
    """Document fingerprint: bottom-k sketch over seeded hashes of
    word n-gram shingles, concatenated to one string. Two documents
    share a fingerprint iff their bottom-k shingle hashes agree —
    a compact near-dup key (winnowing-style selection, global-window
    variant)."""
    sh = shingles(tokens(text), shingle_n)
    hashes = F.array_sort(F.transform(sh, lambda s: seeded_md5(seed, s)))
    return F.concat_ws("|", F.slice(hashes, 1, k))


def unigram_logprob_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram language-model quality score (the CCNet LM-filter shape
    with a corpus-trained unigram model): per document, the mean
    negative log probability of its tokens under corpus unigram
    frequencies — high = unusual/gibberish, low = boilerplate.

    Same plan as the oracle-gated t_token_df_scores (explode → count →
    equi-join → per-doc mean); this variant weights by -ln p(token)
    and is therefore pytest-gated, not driver-gated: ln is an
    intrinsic whose last-ulp behaviour differs across engines, so it
    cannot sit under a hash-equality oracle. Output:
    (id_col, n_tokens, mean_neg_logprob)."""
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    total = toks.count()
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    return (
        toks.join(freq, "tok")
        .withColumn("__nlp", -F.log(F.col("tf") / F.lit(float(total))))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("__nlp").alias("mean_neg_logprob"),
        )
    )


def token_runs_udtf():
    """Python UDTF (Spark 4 table-function surface, §2.10): run-length
    encode a document's token stream — one input row yields one row
    per maximal run of a repeated token: (run_idx, token, run_len,
    start_idx), start_idx 1-based over the token sequence.

    WHY a UDTF: the per-row stateful scan (compare each token to its
    predecessor, emit on change) is the S2 decode class — one-to-many
    expansion with in-row state. The built-in alternative is
    posexplode + lag window + gaps-and-islands, which pays a (doc)
    exchange and two window passes over EVERY TOKEN; the UDTF runs
    map-side with zero shuffle, and the tokens never leave the row.
    The value oracle IS that built-in rewrite (in DuckDB), so the
    driver hash-checks the UDTF execution path end-to-end.

    Tokenisation matches :func:`tokens` / :func:`TOKENS_SQL` exactly:
    the split class is Java's ASCII ``\\s`` ([ \\t\\n\\x0B\\f\\r]) —
    NOT Python ``str.split()``, whose Unicode whitespace (\\xa0,
    \\u2028, ...) would silently diverge from both engines' ASCII
    ``\\s+`` the moment non-ASCII-space text entered the corpus
    (review r6; same \\x0B caveat as the battery header).

    Defined lazily (inside a function) because @udtf captures a live
    SparkSession-independent registration object; callers register it
    per session via ``spark.udtf.register``."""
    import re

    from pyspark.sql.functions import udtf

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @udtf(returnType="run_idx int, token string, run_len int, start_idx int")
    class TokenRuns:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            toks = [t for t in ws.split((text or "").lower()) if t]
            run, i = 0, 0
            while i < len(toks):
                j = i
                while j < len(toks) and toks[j] == toks[i]:
                    j += 1
                yield (run, toks[i], j - i, i + 1)
                run += 1
                i = j

    return TokenRuns


# ---------------------------------------------------------------------------
# Shared curation expression twins (sampling / chunking / dup-ratio).
#
# Each helper exists as a (Spark Column, DuckDB SQL text) PAIR kept
# adjacent so the engine expression and its oracle can never drift —
# these used to live as four hand-synced copies across text_battery /
# curation_battery (review r6), which is exactly how the driver-vs-
# local compaction divergence class starts.
# ---------------------------------------------------------------------------

#: per-stratum sampling-rate thresholds as md5-hex prefixes (.25/.5/.75/1.0;
#: 'g...' sorts above every hex digit = keep-all)
SAMPLE_THRESHOLDS = ("40000000", "80000000", "c0000000", "g0000000")

#: sliding-window chunking geometry: 64-token sequences every 48 tokens
CHUNK, STRIDE = 64, 48

# Source number: guarded with try_cast/TRY_CAST + COALESCE on BOTH
# sides — a source with no digits yields '' from regexp_extract, which
# BOTH engines' plain casts reject (DuckDB raises; Spark 4's default
# ANSI cast throws too, so the old "Spark maps to NULL" framing from
# review r6 was wrong — the twin test caught it). Both agree on 0 now.
SOURCE_NUM_SQL = "COALESCE(TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INT), 0)"


def source_num() -> Column:
    """Numeric suffix of the ``source`` column; 0 when absent (twin of
    :data:`SOURCE_NUM_SQL`). MUST be try_cast: under Spark 4's default
    ANSI mode a plain cast('int') THROWS on the '' regexp_extract
    yields for a digitless source — the engine would crash where the
    oracle returns 0 (caught by tests/test_expression_twins.py, the
    exact divergence class the TRY_CAST guard exists for)."""
    return F.coalesce(
        F.regexp_extract("source", r"([0-9]+)", 1).try_cast("int"), F.lit(0)
    )


def SAMPLE_THRESHOLD_SQL() -> str:
    t = SAMPLE_THRESHOLDS
    return (
        f"CASE {SOURCE_NUM_SQL} % 4 WHEN 0 THEN '{t[0]}' WHEN 1 THEN '{t[1]}' "
        f"WHEN 2 THEN '{t[2]}' ELSE '{t[3]}' END"
    )


def sample_threshold() -> Column:
    return F.element_at(
        F.array(*[F.lit(t) for t in SAMPLE_THRESHOLDS]),
        (source_num() % 4 + 1).cast("int"),
    )


def SAMPLE_KEEP_SQL(id_col: str = "doc_id") -> str:
    """Deterministic per-stratum keep predicate (SQL twin of
    :func:`sample_keep`): hex md5 prefix below the stratum threshold."""
    return (
        f"substr(md5('samp:' || CAST({id_col} AS VARCHAR)), 1, 8) "
        f"< {SAMPLE_THRESHOLD_SQL()}"
    )


def sample_keep(id_col: str = "doc_id") -> Column:
    return (
        F.substring(F.md5(F.concat(F.lit("samp:"), F.col(id_col).cast("string"))), 1, 8)
        < sample_threshold()
    )


def CHUNK_STARTS_SQL(n: str) -> str:
    """``unnest(range(...))`` producing 1-based chunk start offsets
    (SQL twin of :func:`chunk_starts`); emits nothing for n <= 0."""
    return f"unnest(range(1, {n} + 1, {STRIDE})) AS start"


def chunk_starts(n: Column) -> Column:
    """1-based chunk start offsets; emits nothing for n <= 0 (matching
    the SQL twin — Spark's raw sequence(1, 0) would THROW on descending
    bounds, so the empty case is guarded explicitly; review r7)."""
    nl = n.cast("long")
    seq = F.when(
        nl >= 1, F.sequence(F.lit(1).cast("long"), nl, F.lit(STRIDE).cast("long"))
    ).otherwise(F.array().cast("array<long>"))
    return F.explode(seq)


def CHUNK_TOKENS_SQL(n: str, start: str = "start") -> str:
    return f"least({CHUNK}, {n} - {start} + 1)"


def chunk_tokens(n: Column, start: Column) -> Column:
    return F.least(F.lit(CHUNK), n - start + 1)


def DUP_RATIO_SQL(toks: str, n: str) -> str:
    """Gopher duplicate-token ratio, SQL twin of :func:`dup_ratio`."""
    return (
        f"CASE WHEN {n} > 0 THEN ({n} - len(list_distinct({toks}))) "
        f"/ CAST({n} AS DOUBLE) ELSE 0.0 END"
    )


def dup_ratio(toks: Column, n: Column) -> Column:
    return (
        F.when(n > 0, (n - F.size(F.array_distinct(toks))) / n.cast("double"))
        .otherwise(F.lit(0.0))
    )
