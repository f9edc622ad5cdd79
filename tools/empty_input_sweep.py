"""Degenerate-input robustness sweep (r10): run every registered query
against EMPTY tables (correct schemas, zero rows) and report which
raise. The latent class this catches: driver-side Python arithmetic
on collected scalars (count() == 0 divisions, collect()[0] on empty)
that no non-empty SF exercises — at 100 TB an aggressively filtered
branch or empty partition IS an empty input.

Expected failures are the documented loud-raise trainers
(kmeans_fit/pq/opq: 'empty embeddings input') and fixture-driven
queries that write zero fixture files. Anything else is a bug
(found on first run: pagerank's base-term integer division by zero).

A second phase repeats the sweep on ONE-ROW tables (LIMIT 1), which
catches the hi==lo / n-1 / lag-on-one degenerate-statistics class
(first run found a_histogram_quantiles' ANSI DIVIDE_BY_ZERO on a
constant column). A third phase NULLs the free-form value columns
(documents.text/lang, embeddings.embedding/label, events.payload) —
the bad-upstream-batch shape (first run: NULL embeddings crashed all
four trainers with bare TypeErrors; they now filter null vectors and
raise a clear ValueError only when NOTHING remains).

Usage: python tools/empty_input_sweep.py  (writes /tmp/sf_empty, /tmp/sf_one, /tmp/sf_nulls)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
TRAINERS = {
    "s_kmeans_cells",
    "s_ivf_kmeans_topk",
    "s_pq_adc_topk",
    "s_opq_pq_adc_topk",
    # r12: residual quantization joins the trainer contract — no
    # trainable vectors (all NULL / zero-norm) must raise LOUDLY, not
    # return an empty "index"
    "s_rq_adc_topk",
}
EXPECTED_RAISES = TRAINERS | {
    # fixture-driven: zero fixture files -> parquet schema inference
    "c_merge_extracted_roundtrip",
}
#: value-column overrides for the null phase
_NULL_REPLACE = {
    "documents": {"text": "VARCHAR", "lang": "VARCHAR"},
    "embeddings": {"embedding": "FLOAT[]", "label": "VARCHAR"},
    "events": {"payload": "VARCHAR"},
}


def _sweep(spark, registry, sf_dir: str, expected: set[str], label: str) -> int:
    unexpected = []
    for name, q in registry.items():
        try:
            q.fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 - triage sweep
            if name not in expected:
                unexpected.append((name, f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"))
            continue
    for name, msg in unexpected:
        print(f"UNEXPECTED [{label}] {name}: {msg}")
    print(f"# {label}: {len(registry)} queries, {len(unexpected)} unexpected failures")
    return len(unexpected)


def main() -> int:
    import duckdb

    from orderly_spark.session import get_spark

    con = duckdb.connect()
    for d, limit in (("/tmp/sf_empty", 0), ("/tmp/sf_one", 1)):
        os.makedirs(d, exist_ok=True)
        for t in TABLES:
            con.execute(
                f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' LIMIT {limit}) "
                f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
            )
    os.makedirs("/tmp/sf_nulls", exist_ok=True)
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        cols = {r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()}
        repl = [
            f"CAST(NULL AS {typ}) AS {c}"
            for c, typ in _NULL_REPLACE.get(t, {}).items()
            if c in cols
        ]
        sel = f"SELECT * REPLACE ({', '.join(repl)})" if repl else "SELECT *"
        con.execute(
            f"COPY ({sel} FROM '{src}' LIMIT 20) TO '/tmp/sf_nulls/{t}.parquet' (FORMAT PARQUET)"
        )

    import orderly_spark.queries  # noqa: F401
    from orderly_spark.registry import REGISTRY

    spark = get_spark("degenerate_sweep")
    bad = _sweep(spark, REGISTRY, "/tmp/sf_empty", EXPECTED_RAISES, "empty")
    # 1-row tables: every trainer/fixture query works on one row, so
    # NOTHING is expected to raise
    bad += _sweep(spark, REGISTRY, "/tmp/sf_one", set(), "one-row")
    # null value columns: only the all-null trainers may raise (their
    # documented loud ValueError once every vector is filtered)
    bad += _sweep(spark, REGISTRY, "/tmp/sf_nulls", TRAINERS, "null-columns")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
