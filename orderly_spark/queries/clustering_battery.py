"""Clustering battery: k-means (Lloyd's) over the embeddings table,
value-gated — the DuckDB oracle replays the exact same quantized
integer iterations (init → assign → update, twice → final assign), so
the driver hash-compares a full clustering, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orderly_spark.operators.clustering import DIST_SQL, QUANTIZE_SQL, kmeans_fit
from orderly_spark.registry import query
from orderly_spark.tables import load

_K = 4
_ITERS = 2
_SEED = 31
_DIM = 64


def _assign_cte(src_cents: str, out: str) -> str:
    """One assignment pass: nearest centroid, ties to smallest cell."""
    return f"""{out} AS (
      SELECT vec_id, qv, cell FROM (
        SELECT q.vec_id, q.qv, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {DIST_SQL('q.qv', 'c.cv')}, c.cell) AS rn
        FROM q CROSS JOIN {src_cents} c) t
      WHERE rn = 1)"""


def _update_cte(src_assign: str, out: str) -> str:
    """One centroid update: exact integer floor-mean per (cell, dim).
    ``(s - pmod(s, c))`` is exactly divisible by ``c``, and the
    division stays INTEGER (`//`) end-to-end — mirroring Spark's
    ``div`` — so the two engines agree at any magnitude, not just
    below 2^53 (review finding: the old DOUBLE `/` + CAST relied on
    rounding behaviour that differs between engines past 2^53)."""
    return f"""{out} AS (
      SELECT cell, list(m ORDER BY pos) AS cv FROM (
        SELECT cell, pos,
               CAST((s - ((s % c) + c) % c) // c AS BIGINT) AS m
        FROM (
          SELECT cell, i - 1 AS pos, CAST(SUM(qv[i]) AS BIGINT) AS s, COUNT(*) AS c
          FROM {src_assign}, (SELECT unnest(range(1, {_DIM} + 1)) AS i) dims
          GROUP BY cell, i) sums) comps
      GROUP BY cell)"""


def _training_ctes() -> tuple[list[str], str]:
    """The k-means training WITH-chain (quantize -> seeded init ->
    assign/update x iterations -> final assignment) shared by BOTH
    oracle builders — one definition so the two gates can never drift
    (review finding: it used to be duplicated verbatim)."""
    ctes = [
        f"""q AS (SELECT vec_id, {QUANTIZE_SQL('embedding')} AS qv FROM embeddings)""",
        f"""c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY md5('{_SEED}:' || CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1 AS cell,
             qv AS cv
      FROM q
      QUALIFY ROW_NUMBER() OVER (
        ORDER BY md5('{_SEED}:' || CAST(vec_id AS VARCHAR)), vec_id) <= {_K})""",
    ]
    cents = "c0"
    for it in range(1, _ITERS + 1):
        ctes.append(_assign_cte(cents, f"a{it}"))
        ctes.append(_update_cte(f"a{it}", f"c{it}"))
        cents = f"c{it}"
    ctes.append(_assign_cte(cents, "afinal"))
    return ctes, cents


def _kmeans_oracle() -> str:
    ctes, _ = _training_ctes()
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT vec_id, CAST(cell AS INT) AS cell FROM afinal"
    )


@query(
    "s_kmeans_cells",
    oracle=_kmeans_oracle(),
    category="clustering",
    survey="kmeans[abs]",
)
def s_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means, k=4, 2 iterations, exact integer space: the
    IVF trainer. Assignment is map-side (literal centroids, zero
    shuffle); each update shuffles only k·dim partial sums. The oracle
    replays every iteration — a hash-compared distributed clustering."""
    e = load(spark, sf_dir, "embeddings", fan_out=True)
    assigned, _cents = kmeans_fit(
        e, k=_K, iterations=_ITERS, id_col="vec_id", vec_col="embedding", seed=_SEED
    )
    return assigned.select("vec_id", F.col("cell").cast("int").alias("cell"))


from orderly_spark.operators.clustering import kmeans_ivf_topk  # noqa: E402
from orderly_spark.operators.similarity import _dot_sql  # noqa: E402

_NPROBE = 2
_TOPK = 3


def _ivf_kmeans_oracle() -> str:
    ctes, cents = _training_ctes()
    ctes.extend([
        f"""probes AS (
      SELECT query_id, quv, cell FROM (
        SELECT e.vec_id AS query_id, e.embedding AS quv, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {DIST_SQL('e.qq', 'c.cv')}, c.cell) AS rn
        FROM (SELECT vec_id, embedding, {QUANTIZE_SQL('embedding')} AS qq
              FROM embeddings WHERE vec_id < 5) e
        CROSS JOIN {cents} c) t
      WHERE rn <= {_NPROBE})""",
        f"""scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {_dot_sql('p.quv', 'e2.embedding')}
               / (sqrt({_dot_sql('p.quv', 'p.quv')}) * sqrt({_dot_sql('e2.embedding', 'e2.embedding')}))
               AS cosine
      FROM probes p
      JOIN afinal a USING (cell)
      JOIN embeddings e2 ON a.vec_id = e2.vec_id
      WHERE p.query_id <> a.vec_id)""",
    ])
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"""SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored) WHERE rank <= {_TOPK}"""
    )


@query(
    "s_ivf_kmeans_topk",
    oracle=_ivf_kmeans_oracle(),
    category="clustering",
    survey="kmeans[abs],ann-ivf[abs],ann-ivf-trained[abs]",
)
def s_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end TRAINED ANN: k-means (k=4, 2 exact integer
    iterations) trains the coarse quantizer, the corpus is indexed
    map-side against the trained centroids, 5 query vectors each probe
    their 2 nearest cells, and candidates are exactly re-ranked to a
    cosine top-3. The whole train→index→probe→re-rank chain is
    deterministic and hash-compared by the oracle — not just the
    search, the trained index too."""
    e = load(spark, sf_dir, "embeddings", fan_out=True)
    q = e.filter(F.col("vec_id") < 5)
    out = kmeans_ivf_topk(
        e, q, k=_TOPK, n_cells=_K, iterations=_ITERS, n_probe=_NPROBE, seed=_SEED
    )
    return out.withColumn("rank", F.col("rank").cast("long"))
