"""Plan-regression tests: the 100 TB design rules as assertions over
the actual physical plans (orderly_spark/plans/audit.py). A change
that silently drops a pushed filter, un-broadcasts a dimension join,
or drags a Python UDF into a pure-expression pipeline fails here —
those regressions never show up in small-SF correctness runs."""

from __future__ import annotations

import pytest

import orderly_spark.queries  # noqa: F401
from orderly_spark.plans.audit import audit
from orderly_spark.registry import REGISTRY


def plan(spark, sf_smoke, name):
    return audit(REGISTRY[name].fn(spark, sf_smoke))


def test_q6_filters_reach_the_scan(spark, sf_smoke):
    """Predicate pushdown: q6's date/discount/quantity filters must be
    in the parquet scan's PushedFilters, not a post-scan Filter only."""
    a = plan(spark, sf_smoke, "q6_forecast_revenue")
    scan = a.scan_for("lineitem")
    assert scan is not None
    pushed = " ".join(scan.pushed_filters)
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q6_column_pruning(spark, sf_smoke):
    """Projection pruning: the scan must read only the 4 columns the
    query touches, not all 11 lineitem columns."""
    a = plan(spark, sf_smoke, "q6_forecast_revenue")
    scan = a.scan_for("lineitem")
    assert set(scan.read_columns) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    }


def test_q5_dimension_joins_broadcast(spark, sf_smoke):
    """Join strategy: q5's star joins against region/nation/supplier/
    customer must broadcast (no sort-merge join at dimension size)."""
    a = plan(spark, sf_smoke, "q5_nation_revenue")
    assert a.n_broadcast_joins >= 3
    assert a.n_sortmerge_joins == 0


def test_filter_stack_is_one_fused_pass(spark, sf_smoke):
    """P2-P6 fuse into the scaffold aggregation: exactly the fan-out +
    groupBy exchanges, no extra shuffle per filter stage."""
    a = plan(spark, sf_smoke, "c_filter_stack")
    assert a.n_exchanges <= 2  # repartition(fan_out) + scaffold groupBy
    assert not a.has_python_udf


def test_clean_pipeline_shuffle_budget(spark, sf_smoke):
    """The full pipeline's shuffle count is bounded and known: fan-out,
    scaffold groupBy, two dedup windows, counts aggregate, offending-id
    distinct + anti-join, plus their AQE reads — a regression that adds
    a per-stage shuffle breaks this ceiling."""
    spark.catalog.clearCache()  # cached intermediates change the plan shape
    a = plan(spark, sf_smoke, "c_clean_pipeline_fullscale")
    assert a.n_exchanges <= 12, a.text
    assert not a.has_python_udf


def test_pure_expression_batteries_have_no_python_udf(spark, sf_smoke):
    """Extraction/text ops are Catalyst expressions end to end; only
    the chem/multimodal kernels may cross into Python."""
    for name in [
        "x_rxn_string_parse",
        "x_unit_conversions",
        "x_solvent_agent_split",
        "t_quality_scores",
        "d_minhash_lsh_pairs",
    ]:
        a = plan(spark, sf_smoke, name)
        assert not a.has_python_udf, name


def test_chem_dimension_udf_off_fact_path(spark, sf_smoke):
    """The canonicalisation UDF runs over the distinct-pairs dimension
    (explode→distinct→UDF→broadcast join back): the plan must contain
    a Python/Arrow eval AND a broadcast join — proof the UDF is on the
    small side of the join, not mapped over the fact table."""
    a = plan(spark, sf_smoke, "c_canonicalise_dimension_roundtrip")
    assert a.has_python_udf
    assert a.n_broadcast_joins >= 1


def test_codegen_spans_exist(spark, sf_smoke):
    # AQE wraps the plan and defers codegen until execution; audit the
    # static plan with AQE off so the codegen subtrees are visible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ["q1_pricing_summary", "c_filter_stack"]:
            a = audit(REGISTRY[name].fn(spark, sf_smoke))
            assert a.n_codegen_spans >= 1, name
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_band_join_broadcasts_tiny_dimension(spark, sf_smoke):
    """j_band_quantity_tiers: the inequality join against the 3-row
    tier dimension must be a broadcast join (nested-loop over a
    broadcast side), never a shuffle of the fact table before the
    final aggregation — one exchange total (the groupBy)."""
    a = plan(spark, sf_smoke, "j_band_quantity_tiers")
    assert a.n_broadcast_joins == 1
    assert a.n_sortmerge_joins == 0
    assert a.n_exchanges <= 1


def test_grouping_sets_single_shuffle(spark, sf_smoke):
    """a_grouping_sets_mixed: Expand + one hash aggregate — all three
    granularities from a single exchange, not one scan per set."""
    a = plan(spark, sf_smoke, "a_grouping_sets_mixed")
    assert a.n_exchanges == 1
    assert "Expand" in a.text
    scan = a.scan_for("orders")
    assert set(scan.read_columns) == {"o_orderstatus", "o_orderpriority"}


def test_ntile_prunes_to_three_columns(spark, sf_smoke):
    """w_ntile_balance_quartiles: scan reads only segment/balance/key;
    the window and the groupBy share the segment-keyed exchange."""
    a = plan(spark, sf_smoke, "w_ntile_balance_quartiles")
    scan = a.scan_for("customer")
    assert set(scan.read_columns) == {"c_mktsegment", "c_acctbal", "c_custkey"}
    assert not a.has_python_udf
