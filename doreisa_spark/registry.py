"""Query registry: every operator we claim in SURVEY.md §2 registers here.

Each entry pairs a Spark implementation ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. The driver (and our own tests) execute both and compare
row-count + schema + order-insensitive value hash.

Registration is declarative::

    @register("q1_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q1(spark, sf_dir):
        ...

Oracle-less entries (``oracle=None``) are allowed for genuinely
non-SQL-expressible operators (approx sketches, stateful streaming); the
driver records a weaker rows-only check for those.

Two tiers:

- **primary** (default) — the curated set exposed through ``queries()`` /
  ``oracle_sql()`` to the external driver, sized to its 50-query
  correctness budget and covering every SURVEY.md §2 operator family.
- **extended** (``extended=True``) — additional variants of already-covered
  operators (e.g. right outer next to full outer, cube next to rollup).
  These are NOT in ``queries()``; they are oracle-verified by our own
  differential gate (``tools/check_oracle.py``, which checks both tiers,
  and ``tests/test_extended_oracles.py``) so they stay green without
  spending driver budget.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str
    # Tolerance-band oracle for sketch-based queries (approx distinct,
    # approx quantiles): their values are algorithm-specific so the exact
    # hash gate can't apply, but they MUST land within ``band_rtol`` of the
    # exact answer — band_oracle computes that exact answer in DuckDB and
    # our own gates (tools/check_oracle.py, tests/test_extended_oracles.py)
    # verify per-cell relative error. The external driver still sees these
    # as oracle-less (its protocol is exact-hash only).
    band_oracle: str | None = None
    band_rtol: float = 0.05


REGISTRY: dict[str, Query] = {}
EXTENDED: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    *,
    extended: bool = False,
    band_oracle: str | None = None,
    band_rtol: float = 0.05,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY or name in EXTENDED:
            raise ValueError(f"duplicate query name: {name}")
        if oracle is not None and band_oracle is not None:
            raise ValueError(f"{name}: oracle and band_oracle are mutually exclusive")
        target = EXTENDED if extended else REGISTRY
        target[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            band_oracle=band_oracle,
            band_rtol=band_rtol,
        )
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def extended_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in EXTENDED.items()}


def extended_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in EXTENDED.items() if q.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every query module exactly once so decorators run."""
    global _loaded
    if _loaded:
        return
    import doreisa_spark.queries  # noqa: F401  (imports all submodules)

    _loaded = True
