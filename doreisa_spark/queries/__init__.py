"""Query catalog — importing this package registers every query.

Modules group the SURVEY.md §2 inventory:
- ``tpch``        — multi-join analytic flagship queries (scan→filter→join→agg→sort).
- ``joins``       — every join type, broadcast, non-equi range, as-of.
- ``aggregates``  — hash agg, distinct, approx sketches, rollup/cube/grouping sets, pivot.
- ``windows``     — ranking / analytic window functions with frames, top-k per group.
- ``setops``      — union / intersect / except.
- ``scalar_funcs``— string / date / math / array / map / json expression surface.
- ``subqueries``  — semi/anti via EXISTS/IN, scalar subqueries, correlated patterns.
- ``events_stream`` — event-time tumbling/sliding/session windows (batch-SQL analogs).
- ``tensor_queries`` — chunk-grid tensor reductions & elementwise algebra (doreisa core).
- ``dedup``       — exact / minhash-LSH / simhash / n-gram-jaccard dedup.
- ``similarity``  — embedding cosine top-k ANN (brute-force + LSH-bucketed).
- ``textops``     — language-ID, quality scoring, token counts, fingerprinting, TF-IDF.
- ``sampling``    — deterministic hash-based stratified sampling / mixture audit.
- ``pca``         — distributed PCA sufficient statistics + projection over embeddings.
- ``pipeline``    — end-to-end corpus curation (quality → lang → dedup → keep).
- ``multimodal``  — binary payload columns: metadata extraction, decode/feature kernels.
- ``sources_io``  — csv/json/partitioned-parquet sink→source round trips.

Each module registers its queries as primary (driver-checked, budgeted at
50) or extended (oracle-verified by our own gate) — see registry.py.
"""

from doreisa_spark.queries import (  # noqa: F401
    aggregates,
    dedup,
    events_stream,
    joins,
    multimodal,
    pca,
    pipeline,
    sampling,
    scalar_funcs,
    setops,
    similarity,
    sources_io,
    subqueries,
    tensor_queries,
    textops,
    tpch,
    windows,
)
