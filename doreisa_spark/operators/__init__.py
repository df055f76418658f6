"""Reusable composite operators built Spark-first.

Each operator here is a composition of DataFrame primitives (the fast path)
or an Arrow-batched Pandas UDF (only where built-ins can't express the
semantics). Nothing in this package collects to the driver.
"""

from doreisa_spark.operators.asof import asof_join  # noqa: F401
from doreisa_spark.operators.topk import topk_per_group  # noqa: F401
