"""Round-9 scale probes (measured, not asserted — the round6-8
probe tradition, honest negatives recorded):

P1. PQ-ANN vs brute-force cosine at sf0.1: end-to-end wall time
    (train+encode+scan+re-rank vs full-vector scan) AND the
    bytes-scanned accounting the ADC stage exists for. At bench
    scale the training overhead is expected to LOSE end-to-end —
    the scale claim is the per-query marginal scan, which reads
    M codes/vector instead of the vector.

P2. SimHash 2-band vs 4-band at sf0.1: candidate-pair volume
    (pre-verify) vs result pairs — the recall/candidate-cost trade
    the bands parameter buys.

Usage: python tools/round9_scale_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from orderly_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("round9_probe")

    from orderly_spark.operators.clustering import pq_adc_topk
    from orderly_spark.operators.dedup import simhash_pairs
    from orderly_spark.operators.similarity import cosine_topk
    from orderly_spark.tables import load

    e = load(spark, sf_dir, "embeddings", fan_out=True)
    n_vec, dim = e.select(
        F.count(F.lit(1)), F.first(F.size("embedding"))
    ).first()
    q = e.filter(F.col("vec_id") < 5)

    # warm footers
    e.count()

    def timed(fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    t_brute = timed(lambda: cosine_topk(e, q, k=3).count())
    t_pq = timed(
        lambda: pq_adc_topk(
            e, q, m_subs=2, codebook_k=4, n_candidates=10, topk=3
        ).count()
    )
    vec_bytes = n_vec * dim * 4          # float32 corpus scan per query set
    code_bytes = n_vec * 2 * 1           # 2 codes/vector (k=4 fits a byte)
    print(
        f"P1 sf={sf_dir} n_vec={n_vec} dim={dim}: "
        f"brute={t_brute:.2f}s pq_end_to_end={t_pq:.2f}s "
        f"(ratio {t_pq / t_brute:.2f}x — training dominates at this "
        f"scale; honest negative expected). "
        f"ADC scan bytes/query-set: {code_bytes:,} vs brute "
        f"{vec_bytes:,} = {vec_bytes / code_bytes:.0f}x less"
    )

    d = load(spark, sf_dir, "documents", fan_out=True)

    def cand_count(bands: int) -> tuple[int, int, float]:
        # candidate volume = the distinct pre-verify pair count; rebuild
        # the operator's candidate stage only
        from orderly_spark.operators.dedup import simhash16

        h = d.select(F.col("doc_id").alias("__id"), simhash16(F.col("text")).alias("sh"))
        width = 16 // bands
        mask = (1 << width) - 1
        b = None
        for i in range(bands):
            s = h.select(
                "__id",
                F.lit(i).alias("band"),
                F.shiftright(F.col("sh"), width * i).bitwiseAND(F.lit(mask)).alias("bucket"),
            )
            b = s if b is None else b.unionByName(s)
        a2, b2 = b.alias("a"), b.alias("b")
        cands = (
            a2.join(
                b2,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.__id") < F.col("b.__id")),
            )
            .select("a.__id", "b.__id")
            .distinct()
            .count()
        )
        t0 = time.time()
        pairs = simhash_pairs(d, "doc_id", "text", max_hamming=3, bands=bands).count()
        return cands, pairs, time.time() - t0

    c2, p2, t2 = cand_count(2)
    c4, p4, t4 = cand_count(4)
    print(
        f"P2 sf={sf_dir}: 2-band candidates={c2:,} pairs={p2} ({t2:.2f}s); "
        f"4-band candidates={c4:,} pairs={p4} ({t4:.2f}s); "
        f"recall gain={p4 - p2} pairs for {c4 / max(c2, 1):.1f}x the "
        f"candidate volume (4-band is complete at hamming<=3 by "
        f"pigeonhole; 2-band is not)"
    )


if __name__ == "__main__":
    main()
