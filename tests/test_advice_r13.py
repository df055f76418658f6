"""r13 ADVICE fixes.

1. (medium) Timestamp-shaped STRING probes against sidecar stats: the
   sidecar records datetimes 'T'-separated, a Spark-style
   'YYYY-MM-DD HH:MM:SS' probe compares lexicographically (' ' < 'T'),
   so pruning could FALSELY drop a matching dir — silent wrong results.
   Fixed by probing every separator variant (batch_commit._probe_variants).
2. (low) GC orphan race: a writer stalled past GC_ORPHAN_GRACE_SECS
   between its parquet write and its manifest publish could have the
   nonce dir reclaimed by a concurrent compactor's _gc, and the later
   publish still committed — a batch entry pointing at a deleted dir.
   Fixed by a pre-publish mtime refresh + an isdir recheck inside the
   locked publish (decline-and-retry under a fresh nonce) + a locked
   liveness recheck before _gc's aged-orphan rmtree.
3. (low) JoinedAggregateView.read joined fact FK to dim key with
   eqNullSafe, so a NULL-FK fact group matched a NULL-keyed dim row —
   SQL JOIN ... ON fk = key never matches NULLs. Fixed: plain equality.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC

DDL = "k bigint, ts timestamp"


def _mk_ts_log(spark, root, mode):
    df = spark.sql(
        "select id as k, timestamp'2026-01-01 00:00:00' + "
        "make_interval(0,0,0,0,0,0,id) as ts from range(5)"
    )
    assert BC.commit_batch(df, root, 0, mode=mode, stats_cols=["k", "ts"])


def test_space_separated_string_probe_never_false_prunes(spark, tmp_path):
    """The exact r13 ADVICE scenario: recorded range is
    ['2026-01-01T00:00:00', '2026-01-01T00:00:04']; a string probe
    mn='2026-01-02 ...' compares ' ' < 'T' and used to prove
    mn > hi — dropping a dir that CONTAINS matching rows."""
    root = str(tmp_path / "ts")
    _mk_ts_log(spark, root, BC.RENAME)
    entries = BC._committed_entries(root, mode=BC.RENAME)
    # a range that DOES overlap, probed space-separated: must keep
    kept = BC._prune_entries(
        entries, None, {"ts": ("2026-01-01 00:00:02", None)})
    assert len(kept) == 1
    # the false-prune shape from the ADVICE: lo below the whole range
    # (every row matches) — must keep, not drop
    kept = BC._prune_entries(
        entries, None, {"ts": (None, "2026-01-01 23:59:59")})
    assert len(kept) == 1
    # a provably-disjoint space-separated range still prunes
    assert BC._prune_entries(
        entries, None, {"ts": ("2027-06-01 00:00:00", None)}) == []
    # point-IN probes: space-separated hit keeps, miss prunes
    assert len(BC._prune_entries(
        entries, {"ts": ["2026-01-01 00:00:03"]})) == 1
    assert BC._prune_entries(
        entries, {"ts": ["2027-01-01 00:00:03"]}) == []
    # end-to-end: the pruned read still returns the matching rows
    got = BC.read_committed(
        spark, root, DDL, mode=BC.RENAME,
        prune_between={"ts": ("2026-01-01 00:00:02",
                              "2026-01-01 00:00:03")},
    ).where("ts between '2026-01-01 00:00:02' and '2026-01-01 00:00:03'")
    assert sorted(r["k"] for r in got.collect()) == [2, 3]


def test_t_separated_probe_on_space_stored_string_column(spark, tmp_path):
    """The inverse direction: a STRING column whose raw values use the
    space separator records space-separated stats; a datetime (or
    'T'-string) probe must not falsely prune it either."""
    root = str(tmp_path / "s")
    df = spark.sql(
        "select id as k, concat('2026-01-01 00:00:0', id) as ts "
        "from range(5)"
    )
    assert BC.commit_batch(df, root, 0, mode=BC.RENAME,
                           stats_cols=["ts"])
    entries = BC._committed_entries(root, mode=BC.RENAME)
    # datetime probe normalizes to 'T' form; the space twin must keep
    assert len(BC._prune_entries(
        entries, None, {"ts": (dt.datetime(2026, 1, 1, 0, 0, 2), None)},
    )) == 1
    assert len(BC._prune_entries(
        entries, {"ts": [dt.datetime(2026, 1, 1, 0, 0, 3)]})) == 1
    # disjoint still prunes
    assert BC._prune_entries(
        entries, None, {"ts": (dt.datetime(2027, 1, 1), None)}) == []


def test_probe_variants_only_touch_timestamp_shapes():
    assert BC._probe_variants(42) == [42]
    assert BC._probe_variants("plain string") == ["plain string"]
    assert BC._probe_variants("2026-01-01") == ["2026-01-01"]  # date: no time
    assert set(BC._probe_variants("2026-01-01 10:00:00")) == {
        "2026-01-01 10:00:00", "2026-01-01T10:00:00"}
    assert set(BC._probe_variants(dt.datetime(2026, 1, 1, 10))) == {
        "2026-01-01 10:00:00", "2026-01-01T10:00:00"}


def test_publish_declines_and_retries_when_gc_reclaimed_dir(
        spark, tmp_path, monkeypatch):
    """Model of the r13 ADVICE GC race: the nonce dir vanishes (a
    concurrent compactor reclaimed an 'aged orphan') after the parquet
    write but before the manifest publish. The publish must NOT commit
    a dangling entry — it declines inside the lock and retries the
    whole write under a fresh nonce."""
    root = str(tmp_path / "gcrace")
    df = spark.range(10).select(F.col("id").alias("k"))
    real_update = BC._manifest_update
    zapped = {"n": 0}

    def zap_then_update(r, mutate, **kw):
        # simulate the concurrent GC exactly once: reclaim every
        # not-yet-published nonce dir right before the locked publish
        if r == root and zapped["n"] == 0:
            zapped["n"] = 1
            import shutil
            man = BC._manifest_load(root) or {}
            live = set(man.get("batches", {}).values())
            for name in os.listdir(root):
                if BC._DATA_RE.match(name) and name not in live:
                    shutil.rmtree(os.path.join(root, name))
        return real_update(r, mutate, **kw)

    monkeypatch.setattr(BC, "_manifest_update", zap_then_update)
    assert BC.commit_batch(df, root, 0, mode=BC.MANIFEST)
    monkeypatch.undo()
    # the committed entry points at a dir that EXISTS and reads back
    man = BC._manifest_load(root)
    dname = man["batches"]["0"]
    assert os.path.isdir(os.path.join(root, dname))
    got = BC.read_committed(spark, root, "k bigint", mode=BC.MANIFEST)
    assert got.count() == 10
    assert zapped["n"] == 1  # the race actually fired


def test_gc_aged_orphan_recheck_keeps_live_dir(spark, tmp_path):
    """_gc's locked recheck: an aged nonce dir that IS referenced by
    the current manifest survives; a genuinely orphaned aged dir is
    reclaimed."""
    root = str(tmp_path / "aged")
    df = spark.range(3).select(F.col("id").alias("k"))
    assert BC.commit_batch(df, root, 0, mode=BC.MANIFEST)
    man = BC._manifest_load(root)
    live = os.path.join(root, man["batches"]["0"])
    orphan = os.path.join(root, "d000000000099_deadbeef")
    os.makedirs(orphan)
    old = 1.0  # epoch seconds: far past any grace window
    os.utime(live, (old, old))
    os.utime(orphan, (old, old))
    BC._gc(root, man)
    assert os.path.isdir(live)
    assert not os.path.isdir(orphan)


def test_join_view_null_fk_never_matches_null_dim_key(spark, tmp_path):
    """SQL JOIN ... ON fk = key never matches NULLs: a NULL-FK fact
    group must not adopt a NULL-keyed dim row's attributes (r13
    ADVICE) — it drops from inner reads and reads NULL attributes in
    left reads."""
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    v = JoinedAggregateView(
        spark, str(tmp_path / "jvnull"),
        fk="fk", fact_keys=["et"],
        fact_aggs={"cnt": ("count", None)},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="ver",
    )
    f = spark.createDataFrame(
        [(1, "click", 1.0), (None, "click", 2.0), (None, "view", 3.0)],
        "fk bigint, et string, v double",
    )
    d = spark.createDataFrame(
        [(1, "web", 1), (None, "GHOST", 1)],
        "doc_id bigint, source string, ver int",
    )
    v.process_fact_batch(f)
    v.process_dim_batch(d)
    inner = {tuple(r) for r in v.read(["source", "et"]).collect()}
    assert inner == {("web", "click", 1)}  # NULL fk groups dropped
    left = {tuple(r) for r in
            v.read(["source", "et"], how="left").collect()}
    assert left == {("web", "click", 1), (None, "click", 1),
                    (None, "view", 1)}
