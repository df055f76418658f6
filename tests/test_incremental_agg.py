"""AggregateStore: streaming-incremental materialized aggregates.

Batch equivalence under any arrival order, exactly-once on redelivery
(no double counting), compaction invariance, group takedowns, snapshot
pinning, marker validation on reopen, and sidecar-pruned keyed reads.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_agg import AggregateStore

SF_SMALL = "/root/testdata/sf0.001"

AGGS = {"cnt": ("count", None), "sum_v": ("sum", "value"),
        "min_v": ("min", "value"), "max_v": ("max", "value")}


def _events(spark):
    from doreisa_spark.catalog import table

    return table(spark, SF_SMALL, "events")


def _expected(e):
    # sum_v rounded: a merged double sum differs from the one-pass sum
    # in the last ulp (summation order); cnt/min/max compare exactly
    return {
        (r["event_type"], r["user_id"], r["cnt"], round(r["sum_v"], 6),
         r["min_v"], r["max_v"])
        for r in e.groupBy("event_type", "user_id").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"), F.max("value").alias("max_v"),
        ).collect()
    }


def _view(store):
    return {
        (r["event_type"], r["user_id"], r["cnt"], round(r["sum_v"], 6),
         r["min_v"], r["max_v"])
        for r in store.read().collect()
    }


def _mk(spark, tmp_path, **kw):
    return AggregateStore(spark, str(tmp_path / "agg"),
                          key_cols=["event_type", "user_id"], aggs=AGGS,
                          **kw)


@pytest.mark.parametrize("order", [(0, 1, 2), (2, 0, 1)])
def test_merged_view_equals_batch_any_arrival_order(spark, tmp_path, order):
    e = _events(spark)
    store = _mk(spark, tmp_path)
    thirds = [e.where(F.col("event_id") % 3 == i) for i in order]
    for i, part in enumerate(thirds):
        store.process_batch(part, i)
    assert _view(store) == _expected(e)


def test_redelivery_cannot_double_count(spark, tmp_path):
    e = _events(spark)
    store = _mk(spark, tmp_path)
    half = e.where("event_id % 2 = 0")
    store.process_batch(half, 0)
    before = _view(store)
    store.process_batch(half, 0)              # same id, same data
    store.process_batch(half.limit(3), 0)     # same id, DIFFERENT data
    assert _view(store) == before


def test_compaction_never_changes_the_view(spark, tmp_path):
    e = _events(spark)
    store = _mk(spark, tmp_path, compact_every=4)
    for i in range(8):  # two folds at batches 3 and 7
        store.process_batch(e.where(F.col("event_id") % 8 == i), i)
    assert _view(store) == _expected(e)
    man = BC._manifest_load(store._log) or {}
    assert man.get("segments"), "tiered compaction should have folded"
    # roll-up fold: a segment holds ONE partial row per group, not one
    # per (group, source batch) — the log stays O(groups x tiers)
    groups = e.select("event_type", "user_id").distinct().count()
    for seg in man["segments"]:
        seg_rows = spark.read.parquet(
            f"{store._log}/{seg}"
        ).count()
        assert seg_rows <= groups


def test_roll_up_preserves_sketches_and_deletes(spark, tmp_path):
    """A rolled segment must carry MERGED sketch maps (valid partials)
    and respect tombstone masking applied before the roll-up."""
    store = AggregateStore(
        spark, str(tmp_path / "agg"), key_cols=["g"],
        aggs={"du": ("hll", "u"), "cnt": ("count", None),
              "vh": ("hist", "u", {"lo": 0.0, "hi": 1000.0, "bins": 256})},
        compact_every=None,
    )
    for i in range(4):
        store.process_batch(
            spark.range(i * 200, (i + 1) * 200 + 100).select(
                (F.col("id") % 3).alias("g"),
                F.col("id").cast("double").alias("u")), i)
    store.delete_groups([2])

    def rows(df):  # maps are dicts: normalize for set compare
        def norm(v):
            return tuple(sorted(v.items())) if isinstance(v, dict) else v

        return {tuple(norm(v) for v in r) for r in df.collect()}

    before_view = rows(store.read())
    before_q = rows(store.read_quantiles("vh", [0.5]))
    BC.compact_tiered(spark, store._log, store._ddl, keep_last=1,
                      mode=store.commit_mode, order_by=store.key_cols,
                      fold_transform=store._roll_up, epoch=store._epoch)
    assert rows(store.read()) == before_view
    assert rows(store.read_quantiles("vh", [0.5])) == before_q
    man = BC._manifest_load(store._log) or {}
    seg = spark.read.parquet(f"{store._log}/{man['segments'][0]}")
    assert seg.count() <= 2  # group 2 tombstoned out, 0/1 rolled up


def test_delete_groups_masks_and_reaccumulates(spark, tmp_path):
    e = _events(spark)
    store = AggregateStore(spark, str(tmp_path / "agg"),
                           key_cols=["event_type"],
                           aggs={"cnt": ("count", None)})
    store.process_batch(e.where("event_id % 2 = 0"), 0)
    victim = store.read().first()["event_type"]
    store.delete_groups([victim], col="event_type")
    assert store.read().where(
        F.col("event_type") == victim
    ).count() == 0
    # re-ingest after the delete: the group re-accumulates from zero
    store.process_batch(e.where("event_id % 2 = 1"), 2)
    got = store.read().where(F.col("event_type") == victim).first()
    want = e.where("event_id % 2 = 1").where(
        F.col("event_type") == victim
    ).count()
    assert got["cnt"] == want


def test_snapshot_pins_the_view(spark, tmp_path):
    e = _events(spark)
    store = _mk(spark, tmp_path, commit_mode=BC.MANIFEST)
    store.process_batch(e.where("event_id % 2 = 0"), 0)
    pinned_want = _view(store)
    sid = store.snapshot()
    store.process_batch(e.where("event_id % 2 = 1"), 1)
    assert _view(store) == _expected(e)  # live view moved on
    got = {
        (r["event_type"], r["user_id"], r["cnt"], round(r["sum_v"], 6),
         r["min_v"], r["max_v"])
        for r in store.read(snapshot=sid).collect()
    }
    assert got == pinned_want


def test_reopen_validates_marker(spark, tmp_path):
    store = _mk(spark, tmp_path)
    store.process_batch(_events(spark).limit(10), 0)
    reopened = AggregateStore(spark, str(tmp_path / "agg"))
    assert reopened.key_cols == ["event_type", "user_id"]
    assert _view(reopened) == _view(store)
    with pytest.raises(ValueError, match="groups by"):
        AggregateStore(spark, str(tmp_path / "agg"), key_cols=["user_id"],
                       aggs=AGGS)
    with pytest.raises(ValueError, match="records aggs"):
        AggregateStore(spark, str(tmp_path / "agg"),
                       key_cols=["event_type", "user_id"],
                       aggs={"cnt": ("count", None)})


def test_from_alias_opens_current_root(spark, tmp_path):
    from doreisa_spark.streaming.alias import bind_alias, flip_alias

    a = AggregateStore(spark, str(tmp_path / "blue"), key_cols=["g"],
                       aggs={"cnt": ("count", None)},
                       commit_mode=BC.MANIFEST)
    a.process_batch(spark.range(10).select((F.col("id") % 2).alias("g")), 0)
    aroot = str(tmp_path / "aliases")
    bind_alias(aroot, "stats", a.root)
    h = AggregateStore.from_alias(spark, aroot, "stats")
    assert {tuple(r) for r in h.read().collect()} == {(0, 5), (1, 5)}
    b = AggregateStore(spark, str(tmp_path / "green"), key_cols=["g"],
                       aggs={"cnt": ("count", None)},
                       commit_mode=BC.MANIFEST)
    b.process_batch(spark.range(4).select((F.col("id") % 2).alias("g")), 0)
    flip_alias(aroot, "stats", b.root, expect_root=a.root)
    h2 = AggregateStore.from_alias(spark, aroot, "stats")
    assert {tuple(r) for r in h2.read().collect()} == {(0, 2), (1, 2)}


def test_bad_specs_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="key_cols and aggs"):
        AggregateStore(spark, str(tmp_path / "a"))
    with pytest.raises(ValueError, match="fn must be"):
        AggregateStore(spark, str(tmp_path / "b"), key_cols=["k"],
                       aggs={"d": ("count_distinct", "x")})
    with pytest.raises(ValueError, match="needs a source"):
        AggregateStore(spark, str(tmp_path / "c"), key_cols=["k"],
                       aggs={"s": ("sum", None)})
    with pytest.raises(ValueError, match="shadows a key"):
        AggregateStore(spark, str(tmp_path / "d"), key_cols=["k"],
                       aggs={"k": ("count", None)})


def test_hll_sketch_merges_and_estimates(spark, tmp_path):
    """The mergeable approx-distinct column: overlapping batches must
    not double-count (register merge = MAX), small groups are exact
    via linear counting, all-null groups estimate 0, and the estimate
    stays within ±5% at 1000 distincts."""
    store = AggregateStore(spark, str(tmp_path / "agg"), key_cols=["g"],
                           aggs={"du": ("hll", "u"),
                                 "cnt": ("count", None)})
    b1 = spark.range(0, 700).select(F.lit("a").alias("g"),
                                    F.col("id").alias("u"))
    b1 = b1.union(spark.range(0, 37).select(
        F.lit("b").alias("g"), (F.col("id") + 10_000).alias("u")))
    b1 = b1.union(spark.sql(
        "select 'c' as g, cast(null as bigint) as u from range(5)"))
    b2 = spark.range(300, 1000).select(F.lit("a").alias("g"),
                                       F.col("id").alias("u"))
    store.process_batch(b1, 0)
    store.process_batch(b2, 1)
    got = {r["g"]: (r["du"], r["cnt"]) for r in store.read().collect()}
    assert got["b"] == (37, 37)          # linear-counting range: exact
    assert got["c"] == (0, 5)            # all-null source: distinct 0
    du, cnt = got["a"]
    assert cnt == 1400 and abs(du - 1000) <= 50  # merged, not 1400
    # reopen from the marker and keep ingesting: same sketch space
    reopened = AggregateStore(spark, str(tmp_path / "agg"))
    reopened.process_batch(
        spark.range(0, 100).select(F.lit("a").alias("g"),
                                   F.col("id").alias("u")), 2)
    du2 = {r["g"]: r["du"] for r in reopened.read().collect()}["a"]
    assert abs(du2 - 1000) <= 50         # pure overlap: estimate stable


def test_hist_sketch_quantiles(spark, tmp_path):
    """The mergeable quantile sketch: fixed-edge histograms merge by
    per-bin SUM across batches, and interpolated quantiles land within
    a bin width of the exact answer; out-of-range values clamp into
    the edge bins; the marker refuses drifting edges (mergeability)."""
    store = AggregateStore(
        spark, str(tmp_path / "agg"), key_cols=["g"],
        aggs={"vh": ("hist", "v", {"lo": 0.0, "hi": 1000.0, "bins": 2048})},
    )
    mk = lambda a, b: spark.range(a, b).select(  # noqa: E731
        F.lit("a").alias("g"),
        (F.pmod(F.hash("id"), 100_000) / 100.0).alias("v"))
    store.process_batch(mk(0, 20_000), 0)
    store.process_batch(mk(20_000, 40_000), 1)
    got = store.read_quantiles("vh", [0.5, 0.95]).first()
    import numpy as np

    vs = np.array([r["v"] for r in mk(0, 40_000).collect()])
    assert abs(got["q_0_5"] - np.percentile(vs, 50)) < 1.0
    assert abs(got["q_0_95"] - np.percentile(vs, 95)) < 1.0
    # clamping: a batch entirely above hi lands in the last bin
    store.process_batch(
        spark.range(3).select(F.lit("b").alias("g"),
                              F.lit(5000.0).alias("v")), 2)
    gb = store.read_quantiles("vh", [0.5]).where("g = 'b'").first()
    assert abs(gb["q_0_5"] - 1000.0) < 1.0  # edge bin, not a crash
    with pytest.raises(ValueError, match="records aggs"):
        AggregateStore(spark, str(tmp_path / "agg"), key_cols=["g"],
                       aggs={"vh": ("hist", "v",
                                    {"lo": 0.0, "hi": 900.0, "bins": 2048})})
    with pytest.raises(ValueError, match="needs opts"):
        AggregateStore(spark, str(tmp_path / "x"), key_cols=["g"],
                       aggs={"vh": ("hist", "v")})
    with pytest.raises(ValueError, match="read_quantiles needs hist"):
        s2 = AggregateStore(spark, str(tmp_path / "y"), key_cols=["g"],
                            aggs={"c": ("count", None)})
        s2.process_batch(mk(0, 10), 0)
        s2.read_quantiles("c", [0.5])


def test_null_group_key_keeps_its_sketches(spark, tmp_path):
    """SQL GROUP BY treats NULL as a real group: the NULL group's HLL
    and histogram sketches must ride the null-safe key join, not
    silently detach (r12 review finding)."""
    store = AggregateStore(
        spark, str(tmp_path / "agg"), key_cols=["g"],
        aggs={"du": ("hll", "u"), "cnt": ("count", None),
              "vh": ("hist", "u", {"lo": 0.0, "hi": 600.0, "bins": 512})},
    )
    b = spark.sql(
        "select if(id % 2 = 0, 'a', cast(null as string)) as g, "
        "cast(id as double) as u from range(500)"
    )
    store.process_batch(b, 0)
    store.process_batch(b, 0)  # redelivery: same id commits nothing
    store.process_batch(
        spark.sql("select cast(null as string) as g, "
                  "cast(id + 250 as double) as u from range(250)"), 2)
    got = {r["g"]: r for r in store.read().collect()}
    assert set(got) == {"a", None}
    # NULL group: 250 odd ids (batch 0) ∪ values 250..499 (batch 2,
    # overlapping the 125 odd ones) = 375 distinct of 500 rows
    assert abs(got[None]["du"] - 375) <= 20
    assert got[None]["cnt"] == 500
    q = store.read_quantiles("vh", [0.5]).collect()
    assert {r["g"] for r in q} == {"a", None}


def test_last_first_upsert_view(spark, tmp_path):
    """fn last/first: argmax/argmin-by-order partials give the
    latest-state (upsert) view — late batches cannot displace newer
    values, NULL order keys are ignored, roll-up folds keep the struct
    carrier, and a reopened store round-trips the 'by' opts."""
    store = AggregateStore(
        spark, str(tmp_path / "agg"), key_cols=["k"],
        aggs={"latest": ("last", "v", {"by": "struct(ts, seq)"}),
              "oldest": ("first", "v", {"by": "struct(ts, seq)"})},
        compact_every=None,
    )
    ddl = "k bigint, ts bigint, seq bigint, v string"
    newer = [(1, 100, 1, "new1"), (2, 100, 1, "new2")]
    older = [(1, 50, 0, "old1"), (2, 50, 0, "old2"),
             (2, None, 9, "null-ts-ignored")]
    store.process_batch(spark.createDataFrame(newer, ddl), 0)
    store.process_batch(spark.createDataFrame(older, ddl), 1)  # late
    want = {(1, "new1", "old1"), (2, "new2", "old2")}
    got = {(r["k"], r["latest"], r["oldest"])
           for r in store.read().collect()}
    assert got == want
    BC.compact_tiered(spark, store._log, store._ddl, keep_last=1,
                      mode=store.commit_mode, order_by=store.key_cols,
                      fold_transform=store._roll_up, epoch=store._epoch)
    assert {(r["k"], r["latest"], r["oldest"])
            for r in store.read().collect()} == want
    reopened = AggregateStore(spark, str(tmp_path / "agg"))
    assert reopened.aggs["latest"][2] == {"by": "struct(ts, seq)"}
    with pytest.raises(ValueError, match="needs opts"):
        AggregateStore(spark, str(tmp_path / "x"), key_cols=["k"],
                       aggs={"l": ("last", "v")})


def test_agg_model_randomized(spark):
    """Randomized lifecycle programs for the view: ingest / group
    takedowns / roll-up compaction / snapshots, checked after every
    step against a dict model of the documented semantics (delete
    removes the group's accumulated history; later ingest
    re-accumulates from zero; compaction and snapshots never change
    the live view; a pinned view never moves)."""
    import os
    import shutil
    import tempfile

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    OPS = st.one_of(
        st.tuples(st.just("ingest"),
                  st.lists(st.integers(0, 4), min_size=0, max_size=6)),
        st.tuples(st.just("delete"),
                  st.lists(st.integers(0, 4), min_size=1, max_size=2,
                           unique=True)),
        st.tuples(st.just("compact"), st.none()),
        st.tuples(st.just("snapshot"), st.none()),
    )

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(program=st.lists(OPS, min_size=3, max_size=8))
    def run(program):
        tmp = tempfile.mkdtemp(prefix="agg_model_")
        store = AggregateStore(
            spark, os.path.join(tmp, "agg"), key_cols=["g"],
            aggs={"cnt": ("count", None), "sum_g": ("sum", "g")},
            compact_every=None,
        )
        model: dict = {}    # g -> [cnt, sum]
        pinned: dict = {}   # sid -> model copy
        bid = 0
        try:
            for step, (op, arg) in enumerate(program):
                if op == "ingest":
                    rows = [(int(g),) for g in arg]
                    if rows:
                        store.process_batch(
                            spark.createDataFrame(rows, "g bigint"), bid)
                        bid += 1
                        for (g,) in rows:
                            c = model.setdefault(g, [0, 0])
                            c[0] += 1
                            c[1] += g
                elif op == "delete" and bid:
                    store.delete_groups([int(g) for g in arg])
                    for g in arg:
                        model.pop(g, None)
                elif op == "compact" and store._ddl:
                    BC.compact_tiered(
                        spark, store._log, store._ddl,
                        keep_last=1, mode=store.commit_mode,
                        order_by=store.key_cols,
                        fold_transform=store._roll_up,
                        epoch=store._epoch,
                    )
                elif op == "snapshot" and store._ddl:
                    pinned[store.snapshot()] = {
                        g: list(v) for g, v in model.items()}
                if store._ddl:
                    got = {r["g"]: [r["cnt"], r["sum_g"]]
                           for r in store.read().collect()}
                    assert got == model, f"step {step} ({op} {arg})"
            for sid, want in pinned.items():
                got = {r["g"]: [r["cnt"], r["sum_g"]]
                       for r in store.read(snapshot=sid).collect()}
                assert got == want, f"snapshot {sid} drifted"
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    run()


def test_keyed_read_prunes_partial_dirs(spark, tmp_path):
    """Partials commit sorted by the group keys with key-range
    sidecars: a keyed lookup merges only the matching dirs."""
    store = AggregateStore(spark, str(tmp_path / "agg"),
                           key_cols=["bucket"],
                           aggs={"cnt": ("count", None)})
    for i, (lo, hi) in enumerate([(0, 100), (100, 200), (200, 300)]):
        batch = spark.range(lo * 10, hi * 10).select(
            (F.col("id") / 10).cast("bigint").alias("bucket")
        )
        store.process_batch(batch, i)
    probe = store.partials(prune_in={"bucket": [150]})
    assert len({os.path.dirname(f) for f in probe.inputFiles()}) == 1
    got = store.read(prune_in={"bucket": [150]}).where("bucket = 150")
    assert [tuple(r) for r in got.collect()] == [(150, 10)]
