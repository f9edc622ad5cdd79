"""Adversarial-text ORACLE sweep (r10): rebuild the documents table
from a hostile-string corpus and run the full Spark↔DuckDB comparator
over it — unlike the degenerate-input sweep (which only checks that
queries RUN), this checks that both engines still AGREE on values.

Corpus alphabet: quoting/escape characters (quotes, backslashes,
semicolons, tabs, newlines, SQL-injection shapes), accented Latin,
CJK, Cyrillic, emoji (incl. ZWJ/skin-tone), combining marks, NBSP and
U+3000 (pinned as punctuation on both twins), mixed case and
numerics, plus empty / whitespace-only documents. EXCLUDED by
construction: \\x0B and the Turkish dotted İ — the two documented
engine divergences, each pinned in tests/test_expression_twins.py.

First run found three real gaps (all fixed + re-verified at the
driver scales):
- DuckDB array_to_string([]) is NULL vs Spark concat_ws '' — empty/
  whitespace-only docs vanished from COUNT(DISTINCT) in
  d_exact_dup_stats and NULLed t_minhash_fingerprints' fingerprint;
- DuckDB 1.0.0 re-casts a BLOB carried through an unnest projection
  via its VARCHAR rendering, exploding on non-ASCII bytes
  (mm_frame_sampling's oracle now hexes BEFORE the unnest).

Sibling corpora built by the same run (same comparator command with
the matching ORACLE_SF):
- /tmp/sf_dup  — 100%-duplicate documents (dedup-denominator stress;
  first run: 211/211, clean negative).
- /tmp/sf_neg  — corrupt numerics in lineitem (zero/negative
  quantities and prices; first run found q2's unit-price division:
  Spark's ANSI divide threw on zero quantity while DuckDB silently
  produced inf — both twins now NULL such lines via
  try_divide/NULLIF).
- /tmp/sf_evt  — adversarial EVENTS (r11, verdict item 4): clock skew
  (timestamps shuffled out of ingest order), heavy duplicate
  timestamps (ties in every window/session/asof path), epoch-boundary
  rows (1970-01-01 00:00:00.000000 and .999999 microsecond edges,
  pre-epoch 1969 rows), hostile props JSON (empty/garbage/nested —
  the r8 props-raise class), negative and re-used user_ids, ±0.0 and
  large (in-envelope) event values.
  First run found ONE real twin gap, fixed: w_hopping_window_counts'
  oracle used DuckDB's toward-zero '//' where Spark's window() floor-
  aligns — pre-epoch rows landed in the wrong hop (now a floor-safe
  CASE in the oracle). EXPECTED-DIVERGENCE LEDGER for this corpus
  (exactly these, nothing else):
    s_stream_dedup_ingest, s_stream_outer_attribution,
    s_stream_full_outer_attribution
  — Spark initializes the stateful-streaming event-time watermark at
  EPOCH 0, so rows with unix_micros(ts) ≤ 0 (ts ≤
  1970-01-01 00:00:00.000000) are late-by-birth and dropped by every
  watermarked stateful operator while the batch oracle keeps them
  (verified on this corpus: missing id set ≡ that predicate, 270/270;
  pinned by
  tests/test_streaming.py::test_watermark_init_drops_at_or_pre_epoch_rows).
  Engine envelope, not a twin bug: stateful streaming event times
  must be strictly after epoch second 0.
    ORACLE_SF=/tmp/sf_evt python -m pytest tests/test_oracle.py -q \\
      --deselect tests/test_oracle.py::test_oracle_match[s_stream_dedup_ingest] \\
      --deselect tests/test_oracle.py::test_oracle_match[s_stream_outer_attribution] \\
      --deselect "tests/test_oracle.py::test_oracle_match[s_stream_full_outer_attribution]"
- /tmp/sf_emb  — adversarial EMBEDDINGS (r11): denormal components
  (±1e-40), ±0.0, huge magnitudes (±1e30), all-zero vectors (norm 0 —
  the cosine-division edge), NULL vectors (the r10 trainer-filter
  regression check), constant vectors. Dimensions stay 64 — a
  ragged-width table is a schema violation upstream ingest must
  reject, not an operator input (documented ceiling).

Usage:
    python tools/adversarial_oracle_sweep.py   # builds all five corpora
    ORACLE_SF=/tmp/sf_adv python -m pytest tests/test_oracle.py -q
"""

from __future__ import annotations

import os
import random
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 99
N_DOCS = 300
FRAG_POOLS = [
    ["it's", 'say "hi"', "back\\slash", "semi;colon", "tab\there", "line\nbreak", "null'); DROP--"],
    ["naïve", "Müller", "café", "über", "señor"],
    ["東京", "データ", "漢字テスト", "中文分词"],
    ["привет", "мир", "тест"],
    ["🚀", "👍🏽", "héllo🌍"],
    ["éclair", "àpropos"],  # combining marks (NFD-style sequences)
    ["non breaking", "wide　space"],
    ["MiXeD", "UPPER", "lower", "123", "42.5", "-7"],
]


def build(dst: str = "/tmp/sf_adv") -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{dst}/{t}.parquet")
    rng = random.Random(SEED)
    rows = []
    for i in range(N_DOCS):
        n = rng.randint(0, 25)
        words = [rng.choice(rng.choice(FRAG_POOLS)) for _ in range(n)]
        text = " ".join(words) if words else rng.choice(["", " ", "   "])
        rows.append((i, text, rng.choice(["en", "es", "de", "ja"]), f"src{i % 7}", len(text)))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    print(f"wrote {N_DOCS} adversarial documents to {dst}; now run:")
    print(f"  ORACLE_SF={dst} python -m pytest tests/test_oracle.py -q")


def build_siblings() -> None:
    import duckdb

    con = duckdb.connect()
    for dst in ("/tmp/sf_dup", "/tmp/sf_neg"):
        os.makedirs(dst, exist_ok=True)
        for t in "region nation customer supplier part orders events documents embeddings lineitem".split():
            shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{dst}/{t}.parquet")
    con.execute(
        """COPY (SELECT doc_id,
             'the same exact boilerplate document text repeated everywhere for dedup stress' AS text,
             'en' AS lang, 'src0' AS source, 78 AS n_chars
           FROM '/root/testdata/sf0.001/documents.parquet')
           TO '/tmp/sf_dup/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        """COPY (SELECT * REPLACE (
             CASE WHEN l_orderkey % 5 = 0 THEN 0.0
                  WHEN l_orderkey % 11 = 0 THEN -l_quantity ELSE l_quantity END AS l_quantity,
             CASE WHEN l_orderkey % 7 = 0 THEN -l_extendedprice ELSE l_extendedprice END AS l_extendedprice)
           FROM '/root/testdata/sf0.001/lineitem.parquet')
           TO '/tmp/sf_neg/lineitem.parquet' (FORMAT PARQUET)"""
    )
    print("wrote /tmp/sf_dup (100%-duplicate docs) and /tmp/sf_neg (corrupt numerics)")


def build_events(dst: str = "/tmp/sf_evt") -> None:
    """Adversarial events corpus (r11): every other table copied from
    sf0.001; events rebuilt with the hostile timestamp/props/value mix
    from the module docstring. Same row count class as the original so
    window/session queries exercise their real paths."""
    import datetime as dt

    import duckdb

    os.makedirs(dst, exist_ok=True)
    for t in "region nation customer supplier part orders lineitem documents embeddings".split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{dst}/{t}.parquet")
    rng = random.Random(SEED + 1)
    # The WHOLE corpus lives in a ~4-day window AROUND THE EPOCH
    # (1969-12-31 .. 1970-01-04): negative-epoch rows, microsecond
    # edges, duplicate ticks, and ±1-day clock skew all inside every
    # streaming watermark horizon. The first design mixed 2024 and
    # 1969 timestamps — a 55-YEAR event-time span that only reproduced
    # the DOCUMENTED streaming contract (data later than the watermark
    # horizon is dropped: s_stream_dedup_ingest's "horizon-covering
    # watermark" and the attribution joins' frontier both say so), not
    # a twin gap. Extreme-lateness drop semantics are the streaming
    # family's pinned operating envelope, not a target of this sweep.
    base = dt.datetime(1970, 1, 2)
    props_pool = [
        '{"k": 87}', '{"k": 0}', "", "not json", "{}", "null", "[1,2]",
        '{"k": {"nested": true}}', '{"k": -1, "extra": "x"}', None,
    ]
    types = ["error", "signup", "click", "view", "", "ERROR", "click\ttab"]
    rows = []
    n = 1200
    for i in range(n):
        bucket = i % 6
        if bucket == 0:  # clock skew: timestamps jump backwards (incl. pre-epoch)
            ts = base + dt.timedelta(seconds=rng.randint(-86400 * 2, 86400))
        elif bucket == 1:  # duplicate timestamps: 200 events on one tick
            ts = base + dt.timedelta(hours=1)
        elif bucket == 2:  # epoch boundary + microsecond edges
            ts = [
                dt.datetime(1970, 1, 1, 0, 0, 0, 0),
                dt.datetime(1970, 1, 1, 0, 0, 0, 999999),
                dt.datetime(1969, 12, 31, 23, 59, 59, 1),
                dt.datetime(1970, 1, 3, 23, 59, 59, 999999),
            ][i % 4]
        else:  # in-range but dense (session/window churn)
            ts = base + dt.timedelta(seconds=i * 37 % 7200, microseconds=i % 3)
        # magnitudes stay INSIDE the documented numeric envelopes so
        # the sweep surfaces NEW classes, not the pinned ceilings:
        # ±1e18 reproduced the DROUND/DBROUND DECIMAL(38,20) LOUD
        # ConversionException on every conversion-rounding oracle, and
        # ±1e12 reproduced the dsum |sum|·10⁶ < 2⁵³ double-rounding
        # ceiling (registry.py dsum docstring) on the value-sum
        # queries — both ceilings working as designed, each already
        # pinned by its own test. ±1e6 keeps Σvalue under ~9·10⁹.
        val = [185.22, 0.0, -0.0, 1e6, -1e6, 0.5][i % 6]
        rows.append(
            (i, ts, rng.choice([13, -1, 0, 13, 13, 999999]), types[i % len(types)],
             val, props_pool[i % len(props_pool)])
        )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", rows)
    con.execute(f"COPY e TO '{dst}/events.parquet' (FORMAT PARQUET)")
    print(f"wrote {n} adversarial events to {dst}")


def build_embeddings(dst: str = "/tmp/sf_emb") -> None:
    """Adversarial embeddings corpus (r11): 64-dim vectors with
    denormals, ±0.0, huge magnitudes, all-zero vectors, constant
    vectors, and NULL vectors (the r10 trainer-filter class)."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    for t in "region nation customer supplier part orders lineitem documents events".split():
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{dst}/{t}.parquet")
    rng = random.Random(SEED + 2)
    dim = 64
    rows = []
    n = 400
    for i in range(n):
        bucket = i % 8
        if bucket == 0:
            vec = None  # NULL vector — trainers must filter, not crash
        elif bucket == 1:
            vec = [0.0] * dim  # zero norm — the cosine-division edge
        elif bucket == 2:
            vec = [(-1.0) ** j * 1e-40 for j in range(dim)]  # denormals
        elif bucket == 3:
            # large but INSIDE the trainers' int64 fixed-point envelope
            # (the squared-distance arithmetic bounds |v| by
            # sqrt(2^63/dim)/2^(scale_bits+1) ≈ 180 at dim 64,
            # scale_bits 20): the first run used ±1e30 and reproduced
            # the envelope's LOUD ANSI ARITHMETIC_OVERFLOW on every
            # quantizing trainer — the designed out-of-envelope
            # behaviour (a job abort on corrupt 1e30 embeddings, not
            # silent garbage), pinned by tests/test_clustering.py::
            # test_trainer_envelope_overflows_loudly. ±50 keeps
            # magnitude stress in-contract (170x the normal corpus).
            vec = [(-1.0) ** j * 50.0 for j in range(dim)]
        elif bucket == 4:
            vec = [0.0 if j % 2 == 0 else -0.0 for j in range(dim)]  # ±0.0
        elif bucket == 5:
            vec = [1.0] * dim  # constant
        else:
            vec = [rng.uniform(-0.3, 0.3) for _ in range(dim)]  # plain
        rows.append((i, vec, i % 11))
    con = duckdb.connect()
    con.execute("CREATE TABLE m (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO m VALUES (?,?,?)", rows)
    con.execute(f"COPY m TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
    print(f"wrote {n} adversarial embeddings to {dst}")


if __name__ == "__main__":
    build()
    build_siblings()
    build_events()
    build_embeddings()
