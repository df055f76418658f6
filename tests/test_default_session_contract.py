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

from doreisa_spark.registry import EXTENDED, REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"

# Events-reading queries exercised on a default-conf session (keep in
# sync with `grep -l events doreisa_spark/queries/*.py` — the registry
# has no per-query source metadata, so the set is pinned explicitly).
# Tier doesn't matter for the guard: window_lag_lead rotated to
# extended in r14 and stays listed; agg_retract_incremental joined the
# primary tier and reads events on a fresh session too.
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
    "agg_retract_incremental",
]


def _lookup(name):
    _ensure_loaded()
    return REGISTRY.get(name) or EXTENDED.get(name)


def test_events_queries_listed_are_registered():
    missing = [n for n in EVENTS_QUERIES if _lookup(n) is None]
    assert not missing, f"stale EVENTS_QUERIES entries: {missing}"


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_events_query_on_default_conf_session(spark, name):
    # newSession(): shared SparkContext (no second JVM) but a fresh SQLConf
    # — the closest in-process stand-in for the driver's own session.
    fresh = spark.newSession()
    df = _lookup(name).fn(fresh, SF)
    assert df.count() >= 0


def test_events_cache_hit_repins_session_confs(spark):
    """ADVICE r15: the _DF_CACHE hit path must re-assert the events confs.

    A caller who follows the catalog warning — restoring their session TZ
    after running catalog queries — and then asks for ``events`` again gets
    the memoized handle; the pin (and the warning) must fire again or every
    downstream date_trunc/rendering silently runs in the wrong zone."""
    import warnings

    from doreisa_spark import catalog

    fresh = spark.newSession()
    d1 = catalog.table(fresh, SF, "events")
    d2 = catalog.table(fresh, SF, "events")
    assert d1 is d2, "expected the memoized handle on the second call"
    fresh.conf.set("spark.sql.session.timeZone", "America/New_York")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        catalog.table(fresh, SF, "events")
    assert fresh.conf.get("spark.sql.session.timeZone") == "UTC"
    assert any("timeZone" in str(w.message) for w in caught)
    # Non-events tables must not mutate session confs on hit or build.
    fresh.conf.set("spark.sql.session.timeZone", "America/New_York")
    catalog.table(fresh, SF, "lineitem")
    catalog.table(fresh, SF, "lineitem")
    assert fresh.conf.get("spark.sql.session.timeZone") == "America/New_York"
    fresh.conf.set("spark.sql.session.timeZone", "UTC")
