"""Round-start grade-window planner: computes which queries MUST be in
the next GRADE_PRIORITY window from the on-disk evidence, so window
curation starts from facts instead of memory.

Buckets, in priority order (the same order every verdict has asked for):
  1. RED       — queries whose LATEST driver row failed (err, or any
                 match flag false). Highest priority: fix + regrade.
  2. NEVER     — registered queries with no driver row in any
                 CORRECTNESS_r0*.json.
  3. CHANGED   — queries whose implementing module changed since the
                 round of their latest green row (needs `git diff
                 --name-only <base>..HEAD`; pass the base commit of
                 the last graded round as argv[1] to enable this
                 bucket — module mapping is the query function's
                 source file).
  4. OK        — latest row green and code unchanged; sentinel pool.

Usage:
  python tools/window_planner.py              # buckets 1, 2, 4
  python tools/window_planner.py <base-sha>   # adds bucket 3

Prints one line per query: bucket, name, latest round/status, file.
Summary counts at the end. Purely read-only.
"""

from __future__ import annotations

import inspect
import json
import os
import re
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import orderly_spark.queries  # noqa: F401
from orderly_spark.registry import GRADE_PRIORITY, REGISTRY

ROOT = Path(__file__).resolve().parents[1]


def latest_rows() -> dict[str, tuple[int, dict]]:
    out: dict[str, tuple[int, dict]] = {}
    # round-10+ files are CORRECTNESS_r10.json etc. — glob r* and
    # parse the round numerically, then apply rows in ROUND order so
    # "latest" means latest round, not latest lexicographic filename
    # (review finding r5)
    files = []
    for f in ROOT.glob("CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)$", f.stem)
        if m:
            files.append((int(m.group(1)), f))
    for rnd, f in sorted(files):
        for name, row in json.loads(f.read_text()).items():
            out[name] = (rnd, row)
    return out


def row_ok(row: dict) -> bool:
    if row.get("err") not in (None, "no_oracle"):
        return False
    # rows-only rows have null match flags and err == "no_oracle"
    return all(row.get(k) is not False for k in ("rows_match", "schema_match", "hash_match"))


def query_file(name: str) -> str:
    try:
        return str(Path(inspect.getfile(REGISTRY[name].fn)).relative_to(ROOT))
    except Exception:
        return "?"


def changed_files(base: str) -> set[str]:
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", f"{base}..HEAD"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
        return set(out.split())
    except Exception as ex:  # detached env, bad sha — degrade gracefully
        print(f"# changed-files bucket disabled: {ex}", file=sys.stderr)
        return set()


def changed_lines(base: str, path: str) -> set[int]:
    """NEW-file line numbers touched since ``base`` (from -U0 hunk
    headers), so function spans can be intersected with the diff."""
    try:
        out = subprocess.run(
            ["git", "diff", "-U0", f"{base}..HEAD", "--", path],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
    except Exception:
        return set()
    lines: set[int] = set()
    import re as _re

    for m in _re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", out, _re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        # a pure deletion has count 0 — mark the boundary line so a
        # removal inside a function still flags it
        lines.update(range(start, start + max(count, 1)))
    return lines


def _fn_ast_text(file_src: str, fn_name: str, prefer_line: int | None = None) -> str | None:
    """``ast.unparse`` of the top-level function ``fn_name`` in
    ``file_src`` (decorators included) — comments and formatting are
    normalized away, so two versions compare EQUAL iff the edit was
    comment/whitespace-only. Returns None when the lookup is ambiguous
    (parse error, zero or multiple same-name defs without a line hint)
    so callers stay conservative and keep the CHANGED flag."""
    import ast

    try:
        tree = ast.parse(file_src)
    except SyntaxError:
        return None
    hits = [
        n
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)) and n.name == fn_name
    ]
    if len(hits) > 1 and prefer_line is not None:
        exact = [n for n in hits if n.lineno == prefer_line or (
            n.decorator_list and n.decorator_list[0].lineno <= prefer_line <= n.lineno
        )]
        hits = exact or hits
    if len(hits) != 1:
        return None
    node = hits[0]
    # strip the leading docstring — prose cannot affect the plan or
    # the oracle, so a docstring-only edit (e.g. documenting a
    # measured envelope) must not force a regrade
    body = node.body
    if (
        body
        and isinstance(body[0], ast.Expr)
        and isinstance(body[0].value, ast.Constant)
        and isinstance(body[0].value.value, str)
    ):
        node.body = body[1:] or [ast.Pass()]
    deco = "".join(ast.unparse(d) for d in node.decorator_list)
    return deco + ast.unparse(node)


def semantically_unchanged(base: str, path: str, name: str) -> bool:
    """True iff the query fn's AST (decorator + body) is identical at
    ``base`` and in the working tree — i.e. every diff line inside its
    span is a comment or formatting edit that cannot change the plan
    or the oracle. Closes the planner's comment-only false-positive
    (r11: a_approx_sketches' rows-only rationale was written INTO its
    @query decorator and flagged the query despite a byte-identical
    plan)."""
    try:
        base_src = subprocess.run(
            ["git", "show", f"{base}:{path}"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
        head_src = (ROOT / path).read_text()
    except Exception:
        return False
    fn = REGISTRY[name].fn
    a = _fn_ast_text(base_src, fn.__name__)
    b = _fn_ast_text(head_src, fn.__name__, prefer_line=query_span(name) and query_span(name)[0])
    return a is not None and a == b


def query_span(name: str) -> tuple[int, int] | None:
    """(first, last) NEW-file line numbers of the query function
    INCLUDING its @query decorator (inspect returns decorator lines),
    i.e. the oracle SQL literal is covered too. Residual blind spots,
    same as the old file-level bucket's: operators in OTHER files the
    query calls, and shared module-level helpers — cover those by
    listing the affected queries in the registry ledger by hand."""
    try:
        src, start = inspect.getsourcelines(REGISTRY[name].fn)
        return start, start + len(src) - 1
    except Exception:
        return None


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else None
    # function spans come from the WORKING TREE while diff hunks come
    # from base..HEAD — with uncommitted edits the coordinates drift
    # and the CHANGED bucket reports phantom overlaps (observed in r6:
    # an uncommitted 56-line insertion shifted every span below it).
    try:
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout.strip()
        if base and dirty:
            print(
                "# WARNING: working tree has uncommitted changes — the "
                "CHANGED bucket may report phantom overlaps; commit first",
                file=sys.stderr,
            )
    except Exception:
        pass
    rows = latest_rows()
    changed = changed_files(base) if base else set()
    diff_cache: dict[str, set[int]] = {}
    buckets: dict[str, list[str]] = {"RED": [], "NEVER": [], "CHANGED": [], "OK": []}
    n_file_touched = 0
    n_comment_only = 0
    for name in REGISTRY:
        f = query_file(name)
        if name not in rows:
            buckets["NEVER"].append(name)
            print(f"NEVER    {name}  ({f})")
        else:
            rnd, row = rows[name]
            if not row_ok(row):
                buckets["RED"].append(name)
                print(f"RED      {name}  r{rnd}: {row}  ({f})")
            elif f in changed:
                # FUNCTION-level granularity: only flag CHANGED when the
                # diff intersects the query fn's own span (decorator +
                # oracle included); an append-only battery edit no
                # longer flags every query in the file
                if f not in diff_cache:
                    diff_cache[f] = changed_lines(base, f)
                span = query_span(name)
                hit = span and any(span[0] <= ln <= span[1] for ln in diff_cache[f])
                if (hit or span is None) and semantically_unchanged(base, f, name):
                    n_comment_only += 1
                    buckets["OK"].append(name)
                    print(f"OK*      {name}  span touched since r{rnd} but AST-identical (comment/format only)")
                elif hit or span is None:
                    buckets["CHANGED"].append(name)
                    print(f"CHANGED  {name}  green r{rnd} but its code in {f} changed since")
                else:
                    n_file_touched += 1
                    buckets["OK"].append(name)
            else:
                buckets["OK"].append(name)
    must = buckets["RED"] + buckets["NEVER"] + buckets["CHANGED"]
    print(
        f"\n# red={len(buckets['RED'])} never={len(buckets['NEVER'])} "
        f"changed={len(buckets['CHANGED'])} ok={len(buckets['OK'])} "
        f"(file-touched-but-fn-unchanged={n_file_touched}, "
        f"span-touched-but-ast-identical={n_comment_only}) "
        f"| must-grade={len(must)} window=50 "
        f"sentinel-slots={max(0, 50 - len(must))}"
    )
    in_window = set(GRADE_PRIORITY)
    missing = [n for n in must if n not in in_window]
    if missing:
        print(f"# MUST-GRADE queries NOT in the current window: {missing}")


if __name__ == "__main__":
    main()
