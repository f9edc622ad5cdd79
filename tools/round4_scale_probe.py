"""Scale probe for the round-4 operators: C4 span dedup + rebuild,
sharded inverted index, incremental LSH-index dedup, and the bucketed
interval-overlap join, at synthetic multiples of sf0.1.

Work must scale LINEARLY in copies or the probe measures an artefact:
- documents copies get copy-prefixed tokens (distinct vocab → no
  cross-copy span/band collisions; per-copy dup structure preserved);
- events copies get shifted user_id AND a +31-day-per-copy time shift
  (disjoint time ranges → session×incident pairs stay linear; without
  the shift, global incidents overlap every copy's sessions and the
  join output grows quadratically — that would be a different, fake
  workload).

Usage: python tools/round4_scale_probe.py [copies ...] (default 1 4 16)
Prints one JSON line per multiple with row counts and seconds.

Drift caveat: span_dedup / inverted_index / interval_join re-state the
CORE of their gated queries inline (the queries are closed over
load()/sf_dir, so they can't run on the scaled frames directly) —
if a gated query's pipeline changes, update the mirror here or the
probe measures the old shape. incremental_dedup avoids this by
calling the shared operators (lsh_band_keys) directly.

Measured (local[32], sf0.1 base, copies 1/4/16 — 5k→80k docs,
100k→1.6M events, warm JVM):
  span_dedup        5.3 / 3.9 /  8.5 s   (16x data → 2.2x the 4x time)
  inverted_index    1.1 / 1.7 /  4.6 s
  incremental_dedup 4.6 / 5.4 / 25.3 s   (md5-bound: 16 hashes per
                    shingle dominate; linear in shingle count)
  interval_join     2.0 / 1.7 /  3.8 s
All sub-linear or linear in input — no quadratic blowups; the
incremental-dedup CPU cost is the known MinHash hashing bill (xxhash64
would halve it at the cost of the md5-mirroring oracle).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orderly_spark.operators import dedup as D
from orderly_spark.session import DEFAULT_SF_DIR, get_spark
from orderly_spark.tables import load

OFFSET = 10_000_000
DAY_US = 86_400_000_000


def scaled_documents(spark, sf_dir: str, copies: int) -> DataFrame:
    d = load(spark, sf_dir, "documents", fan_out=True).select("doc_id", "source", "text")
    outs = [
        d.select(
            (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
            "source",
            F.regexp_replace("text", r"(\S+)", f"c{k}_$1").alias("text"),
        )
        for k in range(copies)
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def scaled_events(spark, sf_dir: str, copies: int) -> DataFrame:
    e = load(spark, sf_dir, "events")
    outs = [
        e.select(
            (F.col("event_id") + F.lit(k * OFFSET)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k * 31} DAYS")).alias("ts"),
            (F.col("user_id") + F.lit(k * OFFSET)).alias("user_id"),
            "event_type",
            "value",
        )
        for k in range(copies)
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def span_dedup(docs: DataFrame) -> DataFrame:
    # mirror of queries/curation_battery.t_span_dedup_rebuild on an
    # arbitrary documents frame
    from orderly_spark.operators import text as T

    t = docs.select("doc_id", T.tokens("text").alias("toks")).filter(F.size("toks") > 0)
    s = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(3))).alias("start"),
        "toks",
    ).select(
        "doc_id",
        F.floor((F.col("start") - 1) / 3).cast("long").alias("span_idx"),
        F.array_join(F.slice("toks", F.col("start"), F.lit(3)), " ").alias("span_text"),
    )
    s = s.withColumn("__h", F.md5("span_text"))
    firsts = s.groupBy("__h").agg(F.min(F.struct("doc_id", "span_idx")).alias("__first"))
    k = s.join(firsts, "__h").withColumn(
        "keep", F.struct("doc_id", "span_idx") == F.col("__first")
    )
    return k.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )


def inverted_index(docs: DataFrame) -> DataFrame:
    from orderly_spark.operators import text as T

    tok = docs.select("doc_id", F.explode(T.tokens("text")).alias("term"))
    p = tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    p = p.withColumn("shard", (F.col("doc_id") % 4).cast("long"))
    return p.groupBy("term", "shard").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").cast("long").alias("cf")
    )


def lsh_pairs_hash_comparison(docs: DataFrame) -> dict:
    """md5 vs xxhash64 MinHash-LSH end to end (same candidate
    semantics, different hash kernel). Measured at 16 copies (80 k
    docs, warm): md5 12.1 s vs xxhash64 10.0 s — ~1.2×, because the
    shingle explode + 16 parallel mins dominate, not the hash."""
    import time

    out = {}
    for fn in ("md5", "xxhash64"):
        t0 = time.perf_counter()
        out[f"lsh_pairs_{fn}_rows"] = D.lsh_candidate_pairs(
            docs, "doc_id", "text", hash_fn=fn
        ).count()
        out[f"lsh_pairs_{fn}_sec"] = round(time.perf_counter() - t0, 2)
    return out


def incremental_dedup(docs: DataFrame) -> DataFrame:
    new_keys = D.lsh_band_keys(docs.filter(F.col("doc_id") % 5 == 0), "doc_id", "text")
    old_keys = D.lsh_band_keys(docs.filter(F.col("doc_id") % 5 != 0), "doc_id", "text")
    hits = (
        new_keys.join(old_keys.withColumnRenamed("__id", "__old"), ["band_idx", "band_hash"])
        .select("__id", "__old")
        .distinct()
    )
    return hits.groupBy("__id").agg(F.count(F.lit(1)).alias("n"))


def interval_join(events: DataFrame) -> DataFrame:
    from orderly_spark.operators.relational import epoch_us, sessionize

    HOUR = 3_600_000_000
    HALF = 600_000_000
    sess = sessionize(events, "user_id", "ts", 30.0, "event_id")
    ints = sess.groupBy("user_id", "session_id").agg(
        F.min(epoch_us(F.col("ts"))).alias("s_start"),
        F.max(epoch_us(F.col("ts"))).alias("s_end"),
    )
    inc = events.filter(F.col("value") > 250).select(
        "event_id",
        (epoch_us(F.col("ts")) - HALF).alias("i_start"),
        (epoch_us(F.col("ts")) + HALF).alias("i_end"),
    )
    sx = ints.withColumn(
        "bucket",
        F.explode(F.sequence(F.floor(F.col("s_start") / HOUR), F.floor(F.col("s_end") / HOUR))),
    )
    ix = inc.withColumn(
        "bucket",
        F.explode(F.sequence(F.floor(F.col("i_start") / HOUR), F.floor(F.col("i_end") / HOUR))),
    )
    return (
        sx.join(ix, "bucket")
        .filter((F.col("s_start") <= F.col("i_end")) & (F.col("i_start") <= F.col("s_end")))
        .select("user_id", "session_id", "event_id")
        .distinct()
    )


def main(argv: list[str]) -> int:
    multiples = [int(a) for a in argv] or [1, 4, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("round4_scale_probe")
    for copies in multiples:
        docs = scaled_documents(spark, sf_dir, copies).localCheckpoint()
        events = scaled_events(spark, sf_dir, copies).localCheckpoint()
        row = {"copies": copies, "docs_in": docs.count(), "events_in": events.count()}
        for name, fn, src in (
            ("span_dedup", span_dedup, docs),
            ("inverted_index", inverted_index, docs),
            ("incremental_dedup", incremental_dedup, docs),
            ("interval_join", interval_join, events),
        ):
            t0 = time.perf_counter()
            row[f"{name}_rows"] = fn(src).count()
            row[f"{name}_sec"] = round(time.perf_counter() - t0, 2)
        row.update(lsh_pairs_hash_comparison(docs))
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
