"""Snapshot / time-travel reads on the exactly-once commit layer.

``create_snapshot`` pins the store's committed state (segments, batch
dirs, tombstone masking) as one metadata-only manifest entry — no data
copy; GC refuses to reclaim pinned directories until ``drop_snapshot``.
``read_snapshot`` must reproduce the exact frame ``read_committed``
served at pin time, no matter what is later ingested, deleted,
compacted, or retired — the reproducible-training-set contract.

Contracts pinned here:

- later commits are invisible to a snapshot; the live read sees them;
- the snapshot survives tiered AND full compaction byte-for-byte, and
  dropping it releases the pinned directories;
- tombstone time travel: deletes AFTER the pin don't mask the snapshot
  (retention-window reproducibility); deletes BEFORE it keep masking
  even after the live store retires them and seals the sub-log;
- snapshot ids stay monotone across compaction (the counter rides
  through manifest rewrites);
- snapshot mutations honor writer fencing like any other mutation.
"""

from __future__ import annotations

import os

import pytest

from doreisa_spark.streaming import batch_commit as BC

MODES = [BC.RENAME, BC.MANIFEST]
DDL = "k bigint, v string"


def _commit(spark, root, b, rows, mode):
    BC.commit_batch(spark.createDataFrame(rows, DDL).coalesce(1), root, b, mode=mode)


def _keys(df):
    return sorted(r["k"] for r in df.collect())


@pytest.mark.parametrize("mode", MODES)
def test_snapshot_pins_state_across_commits(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "a"), (2, "a")], mode)
    _commit(spark, root, 1, [(3, "a")], mode)
    sid = BC.create_snapshot(root, mode=mode)
    _commit(spark, root, 2, [(4, "late")], mode)
    assert _keys(BC.read_snapshot(spark, root, DDL, sid)) == [1, 2, 3]
    assert _keys(BC.read_committed(spark, root, DDL, mode=mode)) == [1, 2, 3, 4]
    # values too, not just keys
    got = {(r["k"], r["v"]) for r in BC.read_snapshot(spark, root, DDL, sid).collect()}
    assert got == {(1, "a"), (2, "a"), (3, "a")}


@pytest.mark.parametrize("mode", MODES)
def test_snapshot_survives_compaction(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    for b in range(4):
        _commit(spark, root, b, [(b, "x")], mode)
    sid = BC.create_snapshot(root, mode=mode)
    pinned_before = {
        (r["k"], r["v"])
        for r in BC.read_snapshot(spark, root, DDL, sid).collect()
    }
    for b in range(4, 8):
        _commit(spark, root, b, [(b, "x")], mode)
    BC.compact_tiered(spark, root, DDL, keep_last=1, mode=mode,
                      band_base_bytes=512, order_by=["k"])
    assert {
        (r["k"], r["v"]) for r in BC.read_snapshot(spark, root, DDL, sid).collect()
    } == pinned_before
    BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    assert {
        (r["k"], r["v"]) for r in BC.read_snapshot(spark, root, DDL, sid).collect()
    } == pinned_before
    # live read unaffected by the pin
    assert _keys(BC.read_committed(spark, root, DDL, mode=mode)) == list(range(8))


@pytest.mark.parametrize("mode", MODES)
def test_snapshot_tombstone_time_travel(spark, tmp_path, mode):
    """Deletes BEFORE the pin mask the snapshot forever (even after the
    live store retires them); deletes AFTER it do not (retention-window
    reproducibility)."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x"), (3, "x")], mode)
    BC.delete_keys(spark, root, [1], 1, key_cols="k", mode=mode)
    sid = BC.create_snapshot(root, mode=mode)
    BC.delete_keys(spark, root, [2], 2, key_cols="k", mode=mode)
    # pre-pin delete masks; post-pin delete doesn't
    assert _keys(BC.read_snapshot(spark, root, DDL, sid)) == [2, 3]
    assert _keys(BC.read_committed(spark, root, DDL, mode=mode)) == [3]
    # the live store moves on and RETIRES everything (full fold + seal)
    _commit(spark, root, 3, [(9, "x")], mode)
    _commit(spark, root, 4, [(10, "x")], mode)
    BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    assert BC.deleted_keys(spark, root, mode=mode).count() == 0  # sealed
    # the snapshot still reads its pinned pre-compaction state, with
    # exactly the pin-time masking, from GC-protected directories
    assert _keys(BC.read_snapshot(spark, root, DDL, sid)) == [2, 3]
    assert _keys(BC.read_committed(spark, root, DDL, mode=mode)) == [3, 9, 10]


@pytest.mark.parametrize("mode", MODES)
def test_drop_snapshot_releases_pinned_dirs(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    for b in range(4):
        _commit(spark, root, b, [(b, "x")], mode)
    sid = BC.create_snapshot(root, mode=mode)
    BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])

    def data_dirs():
        return {
            n for n in os.listdir(root)
            if BC._BATCH_RE.match(n) or BC._DATA_RE.match(n) or BC._MERGED_RE.match(n)
        }

    live = set((BC._manifest_load(root) or {}).get("segments", []))
    live |= set((BC._manifest_load(root) or {}).get("batches", {}).values())
    assert data_dirs() - live  # pinned pre-compaction dirs still on disk
    assert BC.drop_snapshot(root, sid, mode=mode) is True
    assert data_dirs() <= live | {
        f"b{i:012d}" for i in BC.committed_ids(root, mode=mode)
    }
    with pytest.raises(ValueError, match="no snapshot"):
        BC.read_snapshot(spark, root, DDL, sid)
    assert BC.drop_snapshot(root, sid, mode=mode) is False  # idempotent
    assert _keys(BC.read_committed(spark, root, DDL, mode=mode)) == [0, 1, 2, 3]


@pytest.mark.parametrize("mode", MODES)
def test_snapshot_ids_monotone_across_compaction(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    for b in range(3):
        _commit(spark, root, b, [(b, "x")], mode)
    s0 = BC.create_snapshot(root, mode=mode)
    BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    s1 = BC.create_snapshot(root, mode=mode)
    assert (s0, s1) == (0, 1)  # counter rides through the manifest flip
    assert set(BC.list_snapshots(root)) == {0, 1}


def test_snapshot_mutations_are_fenced(spark, tmp_path):
    root = str(tmp_path / "log")
    a = BC.acquire_writer(root, mode=BC.MANIFEST)
    _commit(spark, root, 0, [(1, "x")], BC.MANIFEST)
    sid = BC.create_snapshot(root, mode=BC.MANIFEST, epoch=a)
    BC.acquire_writer(root, mode=BC.MANIFEST)  # supersede a
    with pytest.raises(BC.StaleWriterError):
        BC.create_snapshot(root, mode=BC.MANIFEST, epoch=a)
    with pytest.raises(BC.StaleWriterError):
        BC.drop_snapshot(root, sid, mode=BC.MANIFEST, epoch=a)
    assert set(BC.list_snapshots(root)) == {sid}  # nothing changed


# ------------------------------------------------------------ store level


def test_vector_store_snapshot_query(spark, tmp_path):
    """A pinned ANN query reproduces the pin-time top-k after later
    ingest AND a later takedown, on both scoring kernels."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "ann"))
    store.process_batch(e.where(F.col("vec_id") < 60), 0)
    store.process_batch(
        e.where((F.col("vec_id") >= 60) & (F.col("vec_id") < 120)), 1
    )
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in e.where(F.col("vec_id") < 4).collect()]
    at_pin = sorted(
        map(tuple, store.query_topk_vectors(queries, 5).collect())
    )
    sid = store.snapshot()
    store.process_batch(
        e.where((F.col("vec_id") >= 120) & (F.col("vec_id") < 200)), 2
    )
    victim = int(at_pin[0][1])
    store.delete_vectors([victim], 3)
    # live query moved (victim gone); pinned query is byte-stable
    live = sorted(map(tuple, store.query_topk_vectors(queries, 5).collect()))
    assert all(int(t[1]) != victim for t in live)
    assert sorted(
        map(tuple, store.query_topk_vectors(queries, 5, snapshot=sid).collect())
    ) == at_pin
    assert sorted(
        map(tuple,
            store.query_topk_vectors(queries, 5, scoring="blas",
                                     snapshot=sid).collect())
    ) == at_pin
    assert store.members(snapshot=sid).count() == 120


def test_curation_store_snapshot_reproduces_training_set(spark, tmp_path):
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_curation import CurationStore

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    store = CurationStore(spark, str(tmp_path / "cur"))
    store.process_batch(d.where(F.col("doc_id") < 150), 0)
    at_pin = {tuple(r) for r in store.kept().collect()}
    sid = store.snapshot()
    store.process_batch(
        d.where((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)), 1
    )
    victims = sorted(r["doc_id"] for r in store.kept().collect())[:5]
    store.delete_docs(victims)
    live = {tuple(r) for r in store.kept().collect()}
    assert not any(v in {t[0] for t in live} for v in victims)
    assert {tuple(r) for r in store.kept(snapshot=sid).collect()} == at_pin
    assert store.drop_snapshot(sid) is True


@pytest.mark.parametrize("mode", MODES)
def test_expire_snapshots_retention(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x")], mode)
    sids = [BC.create_snapshot(root, mode=mode) for _ in range(5)]
    dropped = BC.expire_snapshots(root, keep_last=2, mode=mode)
    assert dropped == sids[:3]
    assert sorted(BC.list_snapshots(root)) == sids[3:]
    # keep_last=0 empties the retention window entirely
    assert BC.expire_snapshots(root, keep_last=0, mode=mode) == sids[3:]
    assert BC.list_snapshots(root) == {}
    assert BC.expire_snapshots(root, keep_last=2, mode=mode) == []


def test_dedup_store_snapshot_pins_pairs(spark, tmp_path):
    """The dedup store's served artifact is the PAIRS log: a snapshot
    reproduces the pin-time verdict set after later ingest and a later
    takedown (the same line the curation store draws — internal
    admission state is not pinned)."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    store = LSHSignatureStore(spark, str(tmp_path / "dd"))
    store.process_batch(d.where(F.col("doc_id") < 300), 0)
    at_pin = {tuple(r) for r in store.pairs().collect()}
    assert at_pin  # non-vacuous: the sf0.001 corpus has near-dups
    sid = store.snapshot()
    store.process_batch(
        d.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 500)), 1
    )
    victim = int(next(iter(at_pin))[0])
    store.delete_docs([victim], 2)
    live = {tuple(r) for r in store.pairs().collect()}
    assert all(victim not in (a, b) for a, b, _ in live)
    assert {tuple(r) for r in store.pairs(snapshot=sid).collect()} == at_pin
    assert store.drop_snapshot(sid) is True
