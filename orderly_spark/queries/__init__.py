"""Query registry assembly — importing this package registers every
declared query into :data:`orderly_spark.registry.REGISTRY`."""

from orderly_spark.queries import tpch  # noqa: F401

from orderly_spark.registry import REGISTRY

__all__ = ["REGISTRY"]
