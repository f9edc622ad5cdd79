"""Guards on the driver-facing grading window.

The round driver grades the first 50 entries of
``__spark_entry__.queries()`` in iteration order; ``GRADE_PRIORITY``
curates that window. These tests keep the curation honest: exactly 50
names, all real, no duplicates, and the adapter actually serves them
first.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import orderly_spark.queries  # noqa: F401
from orderly_spark.registry import GRADE_PRIORITY, REGISTRY, ordered_registry


def test_priority_is_exactly_the_window():
    assert len(GRADE_PRIORITY) == 50


def test_priority_names_unique_and_registered():
    assert len(set(GRADE_PRIORITY)) == len(GRADE_PRIORITY)
    missing = [n for n in GRADE_PRIORITY if n not in REGISTRY]
    assert not missing, f"unregistered priority names: {missing}"


def test_ordered_registry_serves_priority_first_and_loses_nothing():
    ordered = list(ordered_registry())
    assert tuple(ordered[:50]) == GRADE_PRIORITY
    assert set(ordered) == set(REGISTRY)
    assert len(ordered) == len(REGISTRY)


def test_entry_adapter_uses_ordered_registry():
    import __spark_entry__ as e

    assert tuple(e.queries())[:50] == GRADE_PRIORITY


def test_every_registered_query_has_a_grading_plan():
    """VERDICT r4 item 7: no query may be registered without either a
    driver row (any CORRECTNESS_r0*.json in the repo root) or a slot
    in the current grade window. This makes the round-3/round-4
    failure mode — flagship work with zero driver evidence and no
    plan to earn it — a test failure instead of a judge finding."""
    import json

    import re

    root = Path(__file__).resolve().parents[1]
    graded: set[str] = set()
    # r* (not r0*) so round-10+ evidence files stay visible
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        if re.search(r"_r(\d+)$", f.stem):
            graded |= set(json.loads(f.read_text()))
    unplanned = [
        n for n in REGISTRY if n not in graded and n not in set(GRADE_PRIORITY)
    ]
    assert not unplanned, (
        "registered queries with neither a driver row nor a window slot "
        f"(add them to GRADE_PRIORITY or drop them): {unplanned}"
    )


def test_planner_ast_normalization_sees_through_comments():
    """The window planner's comment-only detector (r11): an edit that
    only adds comments/reflows whitespace inside a @query decorator
    must compare AST-equal; a real edit (changed literal) must not."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from window_planner import _fn_ast_text

    v1 = (
        "from orderly_spark.registry import query\n"
        "@query('q_x', oracle='SELECT 1 AS a')\n"
        "def q_x(spark, sf_dir):\n"
        "    return spark.range(1)\n"
    )
    v2 = (
        "from orderly_spark.registry import query\n"
        "@query(\n"
        "    'q_x',\n"
        "    # rows-only rationale prose, many lines of it\n"
        "    oracle='SELECT 1 AS a',\n"
        ")\n"
        "def q_x(spark, sf_dir):\n"
        "    # a trailing comment\n"
        "    return spark.range(1)\n"
    )
    v3 = v1.replace("SELECT 1", "SELECT 2")  # real oracle edit
    assert _fn_ast_text(v1, "q_x") == _fn_ast_text(v2, "q_x")
    assert _fn_ast_text(v1, "q_x") != _fn_ast_text(v3, "q_x")
    # ambiguity stays conservative: duplicate defs -> None
    assert _fn_ast_text(v1 + v1.replace("import query\n", "import query as _q\n"), "q_x") is None


def test_planner_ast_normalization_sees_through_docstrings():
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from window_planner import _fn_ast_text

    v1 = "def q_y(spark, sf_dir):\n    return spark.range(1)\n"
    v2 = (
        "def q_y(spark, sf_dir):\n"
        '    """Envelope prose added later."""\n'
        "    return spark.range(1)\n"
    )
    v3 = 'def q_y(spark, sf_dir):\n    """Only a docstring."""\n'
    assert _fn_ast_text(v1, "q_y") == _fn_ast_text(v2, "q_y")
    assert _fn_ast_text(v3, "q_y") is not None  # empty body handled
    assert _fn_ast_text(v1, "q_y") != _fn_ast_text(v3, "q_y")
