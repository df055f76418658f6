"""Chunked-tensor data model: distributed N-d arrays as chunk-row DataFrames."""

from doreisa_spark.plans.chunked import ChunkedArray, GridMeta  # noqa: F401
