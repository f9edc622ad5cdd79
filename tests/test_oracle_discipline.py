"""Static oracle-discipline lints over every registered oracle text
(r9, institutionalizing the audits that have produced driver reds
when violated — see orderly_spark/registry.py's float-discipline
docstring and the memory of the r3/r6/r8 failures):

- NO transcendentals (ln/log/exp/pow): last-ulp differs across libms;
  log-free rational forms or pytest-gating are the sanctioned paths.
- NO bare AVG(): float means must ride DAVG (decimal accumulate) —
  a bare AVG re-introduces order-dependent summation.
- NO raw ROUND() on doubles: DuckDB rounds the raw binary double
  while Spark rounds the shortest decimal repr; DROUND (HALF_UP) and
  DBROUND (HALF_EVEN) are the twin-exact routes. (The DROUND/DBROUND
  expansions themselves wrap ROUND in a CAST( prefix, which is the
  allow-mark here.)
- every json_extract must sit in a TRY_CAST neighbourhood: DuckDB
  json_extract_string RAISES on unparseable JSON where Spark NULLs
  it (the r8 pass-3 crash class).

Windowed/CTE-intermediate integer SUMs are deliberately NOT linted:
HUGEINT widening only matters on OUTPUT columns, where the live
comparator's dtype-drift guard already fails loudly.
"""

from __future__ import annotations

import re

import orderly_spark.queries  # noqa: F401
from orderly_spark.registry import REGISTRY


def _oracles():
    return [(n, q.oracle) for n, q in REGISTRY.items() if q.oracle]


def test_no_transcendentals_in_oracles():
    bad = []
    for name, o in _oracles():
        for m in re.finditer(r"\b(ln|log|log10|log2|exp|pow|power)\s*\(", o, re.I):
            bad.append((name, o[max(0, m.start() - 30) : m.start() + 50]))
    assert not bad, bad


def test_no_bare_avg_in_oracles():
    bad = []
    for name, o in _oracles():
        # (?<![A-Za-z_]) keeps DAVG's own expansion out of scope;
        # re.I because DuckDB SQL is case-insensitive — a lowercase
        # avg(x) diverges from dsum/DSUM discipline just the same
        for m in re.finditer(r"(?<![A-Za-z_])AVG\s*\(", o, re.I):
            bad.append((name, o[max(0, m.start() - 30) : m.start() + 50]))
    assert not bad, bad


def test_no_raw_round_in_oracles():
    bad = []
    for name, o in _oracles():
        for m in re.finditer(r"(?<![_A-Za-z])ROUND\s*\(", o, re.I):
            # whitelist ONLY the exact DROUND expansion shape
            # ROUND(CAST(CAST(... AS VARCHAR) AS DECIMAL(38,20)) —
            # a hand-written CAST(ROUND(x, 2) AS DOUBLE) is precisely
            # the shortest-repr divergence this lint exists to catch,
            # so 'any CAST( nearby' must NOT pass
            if re.match(
                r"ROUND\s*\(\s*CAST\s*\(\s*CAST\s*\(", o[m.start() : m.start() + 40], re.I
            ):
                continue
            bad.append((name, o[max(0, m.start() - 30) : m.start() + 60]))
    assert not bad, bad


def test_every_json_extract_is_try_cast_guarded():
    bad = []
    for name, o in _oracles():
        for m in re.finditer(r"json_extract(_string)?\s*\(", o, re.I):
            hood = o[max(0, m.start() - 40) : m.start() + 120]
            if "TRY_CAST" not in hood:
                bad.append((name, hood))
    assert not bad, bad


def test_no_array_typed_output_columns_unchecked():
    """The driver's rows-only hasher crashes on list cells (the r3
    a_approx_sketches failure). Static proxy: an oracle's FINAL
    top-level SELECT must not emit a bare list_* / [ ... ] column
    without array_to_string. Heuristic lint: flag 'list(' appearing
    after the LAST top-level SELECT when no array_to_string wraps
    nearby — loose on purpose; the live comparator is the real gate,
    this just catches the obvious authoring mistake early."""
    bad = []
    for name, o in _oracles():
        tail = o[o.rfind("SELECT") :]
        for m in re.finditer(r"\blist\s*\(", tail):
            hood = tail[max(0, m.start() - 40) : m.start() + 40]
            # consumed-to-scalar or re-stringified shapes are fine
            if any(
                k in hood
                for k in (
                    "array_to_string",
                    "list_sort",
                    "list_reduce",
                    "list_aggregate",
                    "list_transform",
                    "len(",
                )
            ):
                continue
            bad.append((name, hood))
    assert not bad, bad
