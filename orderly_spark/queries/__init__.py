"""Query registry assembly — importing this package registers every
declared query into :data:`orderly_spark.registry.REGISTRY`."""

from orderly_spark.queries import (  # noqa: F401
    analytics_battery,
    arrays_battery,
    clean_battery,
    clustering_battery,
    curation_battery,
    dedup_battery,
    extract_battery,
    graph_battery,
    lakehouse_battery,
    metrics_battery,
    multimodal_battery,
    relational,
    similarity_battery,
    sql_battery,
    streaming_battery,
    text_battery,
    tpch,
    tpch_full,
)

from orderly_spark.registry import REGISTRY

__all__ = ["REGISTRY"]
