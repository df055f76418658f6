"""Drift guard: every events-touching primary query must run on a session
with DEFAULT SQL confs.

The external driver supplies its own ``SparkSession.builder.getOrCreate()``
— none of our ``session.py`` conveniences (UTC timezone, nanosAsLong, …)
are pre-applied there. Round 4 broke exactly this way: the testdata
generator re-encoded ``events.ts`` from TIMESTAMP(NANOS) to plain
``timestamp[us]`` (→ TIMESTAMP_NTZ on a default session), and two queries
that cast ``ts`` numerically failed at analysis time while the
shared-fixture pytest suite stayed green. This test runs the whole
events-touching primary set through ``spark.newSession()`` — same JVM,
FRESH SQLConf — so any reliance on fixture-session confs fails here first.
"""

from __future__ import annotations

import pytest

from doreisa_spark.registry import REGISTRY, queries

SF = "/root/testdata/sf0.001"

# Primary queries that read the events table (keep in sync with
# `grep -l events doreisa_spark/queries/*.py` — the registry has no
# per-query source metadata, so the set is pinned explicitly).
EVENTS_QUERIES = [
    "window_ranking",
    "window_lag_lead",
    "window_range_frame",
    "window_topk_per_group",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_sessionization_islands",
    "join_asof_purchase_click",
    "func_pandas_udf_scalar",
]


def test_events_queries_listed_are_primary():
    q = queries()
    missing = [n for n in EVENTS_QUERIES if n not in q]
    assert not missing, f"stale EVENTS_QUERIES entries: {missing}"


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_events_query_on_default_conf_session(spark, name):
    # newSession(): shared SparkContext (no second JVM) but a fresh SQLConf
    # — the closest in-process stand-in for the driver's own session.
    fresh = spark.newSession()
    df = REGISTRY[name].fn(fresh, SF)
    assert df.count() >= 0
