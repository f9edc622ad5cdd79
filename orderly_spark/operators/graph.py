"""Graph analytics operators: fixed-point PageRank.

Reference: none (the reference repo has no graph surface); [abs]
operators for the 100 TB north star, complementing the connected-
components pair in ``operators/dedup.py`` (label propagation +
large-star/small-star) and the triangle census in the dedup battery.

Determinism contract: ranks live in INTEGER fixed-point (scaled by
``scale``), every step is integer +,*,div — `div` truncates the same
way in Spark and DuckDB — so the whole iteration is bit-identical
across engines, partitionings, and retries, and the driver can
hash-compare a full PageRank, not just row counts. (Float PageRank
cannot be value-gated: the per-target contribution sum is an
order-dependent float reduction.) Truncation loses ≤1 unit of 10^-12
rank mass per edge per iteration — the deliberate price of exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    *,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """PageRank over directed ``edges(src, dst)`` in integer
    fixed-point; returns (node, rank_fp).

    Per iteration: contribution = rank div outdeg per edge, summed per
    target (ONE shuffle on dst — partial aggregation collapses
    map-side), then rank' = (100-d)·scale div (100·n) + d·contrib
    div 100 over the full node set (left join keeps isolated-inbound
    nodes at the base rank). The node count ``n`` is a single driver
    scalar (bounded by the node set, same class as the corpus-total
    count in the LM scorer). At 100 TB: pre-partition edges by src so
    the rank join is co-located; iterations reuse that partitioning;
    localCheckpoint every few rounds keeps the plan flat (same recipe
    as duplicate_clusters).

    Dangling nodes (outdeg 0) keep redistributing nothing — their rank
    mass shrinks to the base term; acceptable for the diagnostic use
    here and stated so the semantics are pinned (the classic remedy,
    spreading dangling mass uniformly, needs only one extra aggregate).
    """
    # Materialise the caller's edge lineage ONCE before anything
    # consumes it (review finding: nodes' checkpoint ran the full
    # edge subtree — for the battery caller, a distinct over the
    # fact table — and e's checkpoint then re-ran it twice more,
    # edges side + outdeg side). nodes/outdeg/e all derive from the
    # checkpointed frame, so the dominant shuffle is paid once.
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        # consumed in every iteration's left join, the count, and the
        # caller's final ranking — materialise once
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        # empty graph → empty (node, rank_fp) result with the output
        # schema, instead of the base term's integer division by zero
        # (found by the r10 empty-input sweep over all 211 queries).
        # For n > 0 this branch never fires and the built expression
        # tree is byte-identical to the pre-fix version.
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    base = ((100 - damping_pct) * scale) // (100 * n)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src").localCheckpoint()
    ranks = nodes.withColumn("rank_fp", F.lit(scale // n).cast("long"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .select("dst", F.expr("rank_fp div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                ).cast("long").alias("rank_fp"),
            )
        )
    return ranks
