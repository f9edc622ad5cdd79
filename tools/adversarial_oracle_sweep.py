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

Usage:
    python tools/adversarial_oracle_sweep.py   # builds all three corpora
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


if __name__ == "__main__":
    build()
    build_siblings()
