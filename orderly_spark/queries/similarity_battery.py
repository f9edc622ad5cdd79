"""Similarity-search battery over ``embeddings`` (array<float>):
brute-force cosine top-k with a value-level DuckDB oracle (dot
products as ORDER-FIXED sequential double folds — bit-identical
across engines because the fold order is pinned, NOT because the
arithmetic is decimal; see operators/similarity._dot_decimal), plus
the LSH-bucketed scale path (rows-only check — approximate by
design) and an embedding near-dup query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orderly_spark.operators.similarity import cosine_topk, lsh_cosine_topk
from orderly_spark.registry import query
from orderly_spark.tables import load


# the SQL twin lives beside its Spark half in operators/similarity
# (moved there in r8; generated oracle texts are byte-identical)
from orderly_spark.operators.similarity import _dot_sql  # noqa: E402
from orderly_spark.operators.similarity import USABLE_VEC_SQL  # noqa: E402

#: r11 zero-norm + null entry predicate (oracle spelling; the Spark
#: twin is operators/similarity._usable_vec, applied at every
#: cosine-scoring op's entry after the adversarial-embeddings sweep)
_USABLE = USABLE_VEC_SQL.format(c="embedding")


@query(
    "s_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < 5 AND {_USABLE}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE {_USABLE}),
    scored AS (
      SELECT query_id, neighbor_id,
             {_dot_sql('qv', 'cv')} / (sqrt({_dot_sql('qv', 'qv')}) * sqrt({_dot_sql('cv', 'cv')})) AS cosine
      FROM q, c WHERE query_id != neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    category="similarity",
    survey="ann-bruteforce[abs]",
)
def s_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 for 5 query vectors: broadcast queries, one
    corpus scan, per-query top-k. Dot products are order-FIXED
    sequential double folds (not decimal — review finding corrected
    the old claim here): the ranking is bit-identical to the oracle
    because both engines fold in the same index order, so the fold
    must never be parallelized or reordered."""
    e = load(spark, sf_dir, "embeddings", fan_out=True)
    q = e.filter(F.col("vec_id") < 5)
    out = cosine_topk(e, q, id_col="vec_id", vec_col="embedding", k=3)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _lsh_oracle() -> str:
    """Replay of lsh_cosine_topk (16 sign planes, 4 bands, seed 11):
    the md5-derived hyperplanes are embedded as literals (they are
    pure constants of (seed, plane, i)); the sketch threshold
    ``dot >= 0`` is bit-identical because both engines run the same
    fixed-order fold; band bits come off the sketch with integer
    div/mod, exactly Spark's shiftright+mask on a non-negative int.
    Same replayed-training discipline as _ivf_oracle / the PQ oracle
    (r10, closing the registry's last never-oracled query)."""
    from orderly_spark.operators.similarity import _hyperplane

    planes = [_hyperplane(64, 11, p) for p in range(16)]
    plane_cols = ", ".join(
        f"[{', '.join(repr(x) for x in pl)}]::DOUBLE[] AS p{p}" for p, pl in enumerate(planes)
    )
    sketch = " + ".join(
        f"(CASE WHEN {_dot_sql('embedding', f'p{p}')} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(16)
    )
    band_list = "[" + ", ".join(f"(sk // {16 ** b}) % 16" for b in range(4)) + "]"
    return f"""
    WITH planes AS (SELECT {plane_cols}),
    sk AS (
      SELECT vec_id, {sketch} AS sk
      FROM embeddings, planes
      WHERE {_USABLE}
    ),
    banded AS (
      SELECT vec_id, unnest(range(0, 4)) AS band_idx, unnest({band_list}) AS band_bits
      FROM sk
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM banded c JOIN banded q USING (band_idx, band_bits)
      WHERE q.vec_id < 5 AND q.vec_id != c.vec_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             {_dot_sql('qe.embedding', 'ce.embedding')}
               / (sqrt({_dot_sql('qe.embedding', 'qe.embedding')})
                  * sqrt({_dot_sql('ce.embedding', 'ce.embedding')})) AS cosine
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """


@query(
    "s_lsh_cosine_topk",
    oracle=_lsh_oracle(),
    category="similarity",
    survey="ann-lsh[abs]",
)
def s_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-3 (16 sign planes, 4 bands):
    candidates from band equality only, exact re-rank inside buckets.
    The 100 TB path — corpus sketch is map-side, join is equi.
    Approximate vs BRUTE FORCE, but deterministic in itself: the
    seeded buckets and fixed-order folds replay exactly in SQL, so
    the gate checks exact values (r10 — previously rows-only)."""
    e = load(spark, sf_dir, "embeddings", fan_out=True)
    q = e.filter(F.col("vec_id") < 5)
    out = lsh_cosine_topk(e, q, dim=64, id_col="vec_id", vec_col="embedding", k=3)
    return out.withColumn("rank", F.col("rank").cast("long"))


@query(
    "s_embedding_neardup_pairs",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding AS ev FROM embeddings
               WHERE vec_id < 120 AND {_USABLE})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label_a, b.label AS label_b,
           {_dot_sql('a.ev', 'b.ev')} / (sqrt({_dot_sql('a.ev', 'a.ev')}) * sqrt({_dot_sql('b.ev', 'b.ev')})) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_dot_sql('a.ev', 'b.ev')} / (sqrt({_dot_sql('a.ev', 'a.ev')}) * sqrt({_dot_sql('b.ev', 'b.ev')})) >= 0.90
    """,
    category="similarity",
    survey="embedding-neardup[abs]",
)
def s_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.90) on a
    bounded id range — the re-rank stage of embedding dedup. (The
    unbounded version goes through the LSH candidate generator.)"""
    from orderly_spark.operators.similarity import _usable_vec

    e = (
        load(spark, sf_dir, "embeddings", fan_out=True)
        .filter(F.col("vec_id") < 120)
        .filter(_usable_vec(F.col("embedding")))  # r11 zero-norm guard
    )
    from orderly_spark.operators.similarity import _dot_decimal, _norm

    # per-row norms beside the vectors (r15; see similarity.cosine_topk)
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("label_a"),
        F.col("embedding").alias("__va"), _norm(F.col("embedding")).alias("__na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"),
        F.col("embedding").alias("__vb"), _norm(F.col("embedding")).alias("__nb"),
    )
    joined = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _dot_decimal(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        joined.withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.90)
        .select("id_a", "id_b", "label_a", "label_b", "cosine")
    )


def _ivf_oracle() -> str:
    from orderly_spark.operators.similarity import pseudo_centroids

    cents = pseudo_centroids(64, 8)
    cent_cols = ", ".join(
        f"[{', '.join(repr(x) for x in c)}]::DOUBLE[] AS c{i}" for i, c in enumerate(cents)
    )
    # build the dot-product list against 'embedding' directly — an
    # earlier version templated on 'v' and did dots.replace('v', ...),
    # a single-char textual substitution that only worked while no
    # token in _dot_sql's output contained the letter v (review
    # finding)
    dots = "[" + ", ".join(_dot_sql("embedding", f"c{i}") for i in range(8)) + "]"
    return f"""
    WITH cent AS (SELECT {cent_cols}),
    corpus AS (
      SELECT vec_id AS neighbor_id, embedding AS cv,
             list_position(d, list_aggregate(d, 'max')) AS cell
      FROM (SELECT vec_id, embedding, {dots} AS d
            FROM embeddings, cent WHERE {_USABLE})
    ),
    qd AS (
      SELECT vec_id AS query_id, embedding AS qv, {dots} AS d
      FROM embeddings, cent WHERE vec_id < 5 AND {_USABLE}
    ),
    qprobe AS (
      SELECT query_id, qv, cell FROM (
        SELECT query_id, qv, unnest(range(1, 9)) AS cell, unnest(d) AS dot FROM qd
      ) QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, cell) <= 2
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             {_dot_sql('qv', 'cv')} / (sqrt({_dot_sql('qv', 'qv')}) * sqrt({_dot_sql('cv', 'cv')})) AS cosine
      FROM corpus JOIN qprobe USING (cell)
      WHERE query_id != neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """


@query(
    "s_ivf_cosine_topk",
    oracle=_ivf_oracle(),
    category="similarity",
    survey="ann-ivf[abs]",
)
def s_ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (8 deterministic coarse cells, 2 probes): corpus
    cell assignment is map-side; probing prunes the candidate scan to
    n_probe/n_cells of the corpus; exact re-rank inside probed cells.
    Deterministic throughout, so the gate checks exact values."""
    from orderly_spark.operators.similarity import ivf_cosine_topk

    e = load(spark, sf_dir, "embeddings", fan_out=True)
    q = e.filter(F.col("vec_id") < 5)
    out = ivf_cosine_topk(e, q, dim=64, id_col="vec_id", vec_col="embedding", k=3)
    return out.withColumn("rank", F.col("rank").cast("long"))


@query(
    "s_filtered_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 5 AND {_USABLE}),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS cl FROM embeddings
          WHERE {_USABLE}),
    scored AS (
      SELECT query_id, neighbor_id,
             {_dot_sql('qv', 'cv')} / (sqrt({_dot_sql('qv', 'qv')}) * sqrt({_dot_sql('cv', 'cv')})) AS cosine
      FROM q, c WHERE query_id != neighbor_id AND ql = cl
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    category="similarity",
    survey="ann-bruteforce[abs]",
)
def s_filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: top-3 cosine neighbours restricted to
    candidates sharing the query's ``label`` (the metadata-constrained
    ANN every training pipeline needs — same-language near-dup, same-
    licence retrieval). The label-equality term lives in the broadcast
    join condition, so mismatched candidates are skipped at probe time
    rather than scored and discarded; at 100 TB the same shape holds
    with the label folded into the LSH/IVF bucket key."""
    e = load(spark, sf_dir, "embeddings", fan_out=True)
    q = e.filter(F.col("vec_id") < 5)
    out = cosine_topk(e, q, id_col="vec_id", vec_col="embedding", k=3, match_cols=("label",))
    return out.withColumn("rank", F.col("rank").cast("long"))


def _quant_sql(v: str) -> str:
    """DuckDB int8 quantization mirroring the Spark side: floor() is
    repr-independent (unlike round), so the int arrays are identical."""
    amax = f"list_aggregate(list_transform({v}, x -> abs(CAST(x AS DOUBLE))), 'max')"
    return (
        f"CASE WHEN {amax} > 0 THEN "
        f"list_transform({v}, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / {amax})) AS BIGINT)) "
        f"ELSE list_transform({v}, x -> CAST(0 AS BIGINT)) END"
    )


def _idot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


@query(
    "s_quantized_cosine_topk",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, embedding AS v, {_quant_sql('embedding')} AS qv FROM embeddings
      WHERE {_USABLE}
    ),
    q AS (SELECT vec_id AS query_id, v AS qfv, qv AS qqv FROM base WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, v AS cfv, qv AS cqv FROM base),
    scored AS (
      SELECT query_id, neighbor_id,
             CAST({_idot_sql('qqv', 'cqv')} AS DOUBLE)
               / (sqrt(CAST({_idot_sql('qqv', 'qqv')} AS DOUBLE))
                  * sqrt(CAST({_idot_sql('cqv', 'cqv')} AS DOUBLE))) AS cosine_q,
             {_dot_sql('qfv', 'cfv')} / (sqrt({_dot_sql('qfv', 'qfv')}) * sqrt({_dot_sql('cfv', 'cfv')})) AS cosine_exact
      FROM q, c WHERE query_id != neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_q, cosine_exact,
           abs(cosine_exact - cosine_q) AS abs_err, rank
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_q DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    category="similarity",
    survey="ann-quantized[abs]",
)
def s_quantized_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 cosine neighbours computed on INT8-QUANTIZED vectors
    (per-vector absmax scaling, floor to [-127,127]), with the
    full-precision cosine and absolute error reported per result — the
    memory-bandwidth play every large ANN deployment makes (4× smaller
    vectors, integer dot products) plus the recall audit that justifies
    it. floor() not round(): floor on a double is representation-
    independent, so Spark and DuckDB produce identical int arrays,
    integer dot products are exact in any order, and the whole query
    stays under the VALUE gate despite being 'approximate'.

    Scale shape: quantization is map-side (computed once per corpus
    vector, persistable as an int8 column); candidate scoring is the
    same broadcast-queries/one-corpus-scan shape as cosine_topk with
    ~4× less data movement; exact re-scoring touches only the Q×k
    winners at full precision."""
    from orderly_spark.operators.similarity import _usable_vec

    e = load(spark, sf_dir, "embeddings", fan_out=True).filter(
        _usable_vec(F.col("embedding"))  # r11 zero-norm guard (cosine_q divides by |qv|)
    )

    def quant(vec):
        amax = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
        scaled = F.transform(vec, lambda x: F.floor(x.cast("double") * (F.lit(127.0) / amax)).cast("long"))
        zeros = F.transform(vec, lambda x: F.lit(0).cast("long"))
        return F.when(amax > 0, scaled).otherwise(zeros)

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, p: acc + p
        )

    from orderly_spark.operators.similarity import _dot_decimal, _norm

    # per-row norms (float AND int-quantized) beside the vectors
    # (r15; see similarity.cosine_topk) — bit-identical values
    base = e.select("vec_id", F.col("embedding").alias("v"), quant(F.col("embedding")).alias("qv"))
    q = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("__qfv"), F.col("qv").alias("__qqv"),
        _norm(F.col("v")).alias("__qfn"),
        F.sqrt(idot(F.col("qv"), F.col("qv")).cast("double")).alias("__qqn"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("__cfv"), F.col("qv").alias("__cqv"),
        _norm(F.col("v")).alias("__cfn"),
        F.sqrt(idot(F.col("qv"), F.col("qv")).cast("double")).alias("__cqn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_q",
            idot(F.col("__qqv"), F.col("__cqv")).cast("double")
            / (F.col("__qqn") * F.col("__cqn")),
        )
        .withColumn(
            "cosine_exact",
            _dot_decimal(F.col("__qfv"), F.col("__cfv"))
            / (F.col("__qfn") * F.col("__cfn")),
        )
        .select("query_id", "neighbor_id", "cosine_q", "cosine_exact")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .withColumn("abs_err", F.abs(F.col("cosine_exact") - F.col("cosine_q")))
        .select("query_id", "neighbor_id", "cosine_q", "cosine_exact", "abs_err", "rank")
    )


def _semantic_dedup_oracle(tau: str = "0.4") -> str:
    from orderly_spark.operators.similarity import pseudo_centroids

    cents = pseudo_centroids(64, 8)
    cent_cols = ", ".join(
        f"[{', '.join(repr(x) for x in c)}]::DOUBLE[] AS c{i}" for i, c in enumerate(cents)
    )
    dots = "[" + ", ".join(_dot_sql("embedding", f"c{i}") for i in range(8)) + "]"
    cos = f"{_dot_sql('a.ev', 'b.ev')} / (sqrt({_dot_sql('a.ev', 'a.ev')}) * sqrt({_dot_sql('b.ev', 'b.ev')}))"
    return f"""
    WITH cent AS (SELECT {cent_cols}),
    cells AS (
      SELECT vec_id, ev, CAST(list_position(d, list_aggregate(d, 'max')) AS BIGINT) AS cell
      FROM (SELECT vec_id, embedding AS ev, {dots} AS d FROM embeddings, cent
            WHERE {_USABLE})
    ),
    dropped AS (
      SELECT a.cell, b.vec_id AS idb
      FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {cos} >= {tau}
      GROUP BY a.cell, b.vec_id
    ),
    d AS (
      SELECT cell, COUNT(*) AS n_dropped, MIN(idb) AS min_dropped, MAX(idb) AS max_dropped
      FROM dropped GROUP BY cell
    ),
    s AS (SELECT cell, COUNT(*) AS n_vecs FROM cells GROUP BY cell)
    SELECT s.cell, n_vecs,
           COALESCE(n_dropped, 0) AS n_dropped,
           n_vecs - COALESCE(n_dropped, 0) AS n_kept,
           min_dropped, max_dropped
    FROM s LEFT JOIN d USING (cell)
    """


@query(
    "s_semantic_dedup_cells",
    oracle=_semantic_dedup_oracle(),
    category="similarity",
    survey="semantic-dedup[abs],embedding-neardup[abs],ann-ivf[abs]",
)
def s_semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): the
    corpus is coarse-clustered into IVF cells (map-side argmax against
    broadcast centroids), pairwise cosine is computed ONLY within each
    cell, and a vector is dropped iff a smaller-id vector within
    cosine >= 0.4 shares its cell (threshold sized to this synthetic
    embedding space, whose max pairwise cosine is ~0.51 — the rule,
    not the constant, is the operator) — the deterministic greedy keep-rule.
    Per-cell survivor accounting comes back as pure integers, so the
    whole pipeline (cells, the greedy choice, the drop set) sits under
    the value oracle.

    Scale shape: the quadratic term is confined within cells (the
    SemDeDup design point — k cells cut pairwise work by ~k), cell
    assignment is one broadcast map-side pass, and the drop rule needs
    only the (cell) self-join plus one (cell, id) distinct: no global
    pair enumeration, no iteration. For sharper balls at scale, raise
    n_cells (k-means-trained via s_kmeans_cells) — the plan shape is
    unchanged."""
    from orderly_spark.operators.similarity import pseudo_centroids, semantic_dedup_stats

    e = load(spark, sf_dir, "embeddings", fan_out=True)
    return semantic_dedup_stats(e, pseudo_centroids(64, 8), tau=0.4)
