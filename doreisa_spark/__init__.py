"""doreisa_spark — a PySpark-native analytics engine with the capabilities of
AdrienVannson/doreisa (in-situ chunked-tensor streaming analytics), plus a full
relational operator surface and LLM-data-pipeline operators, all designed for
100 TB scale on a real cluster.

Layers
------
- ``doreisa_spark.session``   — tuned SparkSession factory.
- ``doreisa_spark.catalog``   — table loading over the driver's parquet test data.
- ``doreisa_spark.queries``   — the registered relational / LLM-op query catalog
  (each query paired with a DuckDB oracle for differential testing).
- ``doreisa_spark.plans``     — chunked-tensor data model (the doreisa core
  analog: distributed N-d arrays as chunk-row DataFrames).
- ``doreisa_spark.streaming`` — per-timestep iteration driver, sliding windows,
  backpressure (analog of doreisa's window_api / head_node loops).
- ``doreisa_spark.operators`` — reusable composite operators (as-of join,
  top-k per group, dedup, similarity search, text analysis).
"""

__version__ = "0.1.0"

from doreisa_spark.session import get_spark  # noqa: F401
