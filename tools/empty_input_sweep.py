"""Empty-input robustness sweep (r10): run every registered query
against EMPTY tables (correct schemas, zero rows) and report which
raise. The latent class this catches: driver-side Python arithmetic
on collected scalars (count() == 0 divisions, collect()[0] on empty)
that no non-empty SF exercises — at 100 TB an aggressively filtered
branch or empty partition IS an empty input.

Expected failures are the documented loud-raise trainers
(kmeans_fit/pq/opq: 'empty embeddings input') and fixture-driven
queries that write zero fixture files. Anything else is a bug
(found on first run: pagerank's base-term integer division by zero).

Usage: python tools/empty_input_sweep.py  (writes /tmp/sf_empty)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
EXPECTED_RAISES = {
    # documented loud trainers
    "s_kmeans_cells", "s_ivf_kmeans_topk", "s_pq_adc_topk", "s_opq_pq_adc_topk",
    # fixture-driven: zero fixture files -> parquet schema inference
    "c_merge_extracted_roundtrip",
}


def main() -> int:
    import duckdb

    from orderly_spark.session import get_spark

    os.makedirs("/tmp/sf_empty", exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' LIMIT 0) "
            f"TO '/tmp/sf_empty/{t}.parquet' (FORMAT PARQUET)"
        )

    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY

    spark = get_spark("empty_sweep")
    unexpected = []
    for name, q in REGISTRY.items():
        try:
            q.fn(spark, "/tmp/sf_empty").count()
        except Exception as e:  # noqa: BLE001 - triage sweep
            if name not in EXPECTED_RAISES:
                unexpected.append((name, f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"))
            continue
    for name, msg in unexpected:
        print(f"UNEXPECTED {name}: {msg}")
    print(f"# {len(REGISTRY)} queries, {len(unexpected)} unexpected empty-input failures")
    return 1 if unexpected else 0


if __name__ == "__main__":
    raise SystemExit(main())
