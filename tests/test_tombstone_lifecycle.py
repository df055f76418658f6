"""Tombstone lifecycle (r9 verdict ask #1 + r9 ADVICE sequence point).

Contracts pinned here:

- **sequence point**: a tombstone masks only rows committed at or
  before the delete — a key re-inserted by a LATER batch is live again,
  survives every compaction policy, and duplicate-admission guards see
  the re-inserted row (the r9 ADVICE curation bug);
- **retirement**: once every live directory either postdates a
  tombstone or was rewritten with it applied, the tombstone retires —
  after a full fold past the delete, reads plan ZERO anti-joins (plan
  asserted), the sub-log is sealed empty, redelivered delete batch ids
  still refuse, and NEW deletes still mask;
- **sub-log lifecycle**: the tombstone sub-log is itself tiered-
  compacted, so many deletes never accumulate unbounded directories;
- **fenced deletes** (r9 ADVICE): a zombie writer's delete raises
  StaleWriterError and commits nothing;
- **band math**: size bands come from integer division — a segment
  landing exactly on a band boundary bins into the HIGHER band.
"""

from __future__ import annotations

import json
import os

import pytest

from doreisa_spark.streaming import batch_commit as BC

MODES = [BC.RENAME, BC.MANIFEST]
DDL = "k bigint, v string"


def _commit(spark, root, b, rows, mode, ddl=DDL):
    BC.commit_batch(spark.createDataFrame(rows, ddl).coalesce(1), root, b, mode=mode)


def _keys(spark, root, mode):
    return sorted(
        r["k"] for r in BC.read_committed(spark, root, DDL, mode=mode).collect()
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _log_dirs(root) -> list[str]:
    """Data-bearing directories of a log (batch/data/merged)."""
    if not os.path.isdir(root):
        return []
    return [
        n for n in os.listdir(root)
        if BC._BATCH_RE.match(n) or BC._DATA_RE.match(n) or BC._MERGED_RE.match(n)
    ]


# ------------------------------------------------------- sequence point


@pytest.mark.parametrize("mode", MODES)
def test_reinserted_key_after_delete_is_live(spark, tmp_path, mode):
    """The r9 ADVICE fix: deletion is a point in time, not a forever
    ban. Rows of the key committed BEFORE the delete stay masked (and
    are physically dropped at folds); a row committed AFTER it is a
    first-class insert."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "old"), (2, "keep")], mode)
    _commit(spark, root, 1, [(3, "keep")], mode)
    assert BC.delete_keys(spark, root, [1], 2, key_cols="k", mode=mode)
    assert _keys(spark, root, mode) == [2, 3]
    # re-insert the SAME key in a later batch: live again
    _commit(spark, root, 3, [(1, "new")], mode)
    got = {
        (r["k"], r["v"])
        for r in BC.read_committed(spark, root, DDL, mode=mode).collect()
    }
    assert got == {(1, "new"), (2, "keep"), (3, "keep")}
    # tiered fold: the old row is dropped, the re-inserted row survives
    BC.compact_tiered(spark, root, DDL, keep_last=1, mode=mode,
                      band_base_bytes=512, order_by=["k"])
    got2 = {
        (r["k"], r["v"])
        for r in BC.read_committed(spark, root, DDL, mode=mode).collect()
    }
    assert got2 == got
    # full fold too, and the fold's raw segment holds only "new"
    _commit(spark, root, 4, [(9, "keep")], mode)  # tail for keep_last
    got.add((9, "keep"))
    BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    man = json.load(open(os.path.join(root, "_manifest.json")))
    raw = [
        (r["k"], r["v"])
        for seg in man["segments"]
        for r in spark.read.schema(DDL).parquet(os.path.join(root, seg)).collect()
    ]
    assert (1, "old") not in raw and (1, "new") in raw


@pytest.mark.parametrize("mode", MODES)
def test_delete_then_reinsert_then_delete_again(spark, tmp_path, mode):
    """Two deletes of the same key at different times each mask exactly
    the rows that predate them."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(7, "a")], mode)
    BC.delete_keys(spark, root, [7], 1, key_cols="k", mode=mode)
    _commit(spark, root, 2, [(7, "b")], mode)
    assert _keys(spark, root, mode) == [7]
    BC.delete_keys(spark, root, [7], 3, key_cols="k", mode=mode)
    assert _keys(spark, root, mode) == []
    _commit(spark, root, 4, [(7, "c")], mode)
    got = {
        r["v"] for r in BC.read_committed(spark, root, DDL, mode=mode).collect()
    }
    assert got == {"c"}


# ----------------------------------------------------------- retirement


@pytest.mark.parametrize("mode", MODES)
def test_full_fold_retires_tombstones_to_zero_antijoins(spark, tmp_path, mode):
    """After a full fold whose tail postdates the delete: the read plan
    is a PLAIN scan (zero joins), the sub-log is sealed empty, a
    redelivered delete batch id still refuses, and a fresh delete still
    masks."""
    root = str(tmp_path / "log")
    for b in range(3):
        _commit(spark, root, b, [(b * 10 + i, "x") for i in range(5)], mode)
    assert BC.delete_keys(spark, root, [11, 21], 3, key_cols="k", mode=mode)
    assert "Join" in _plan(BC.read_committed(spark, root, DDL, mode=mode))
    # the stream moves past the delete, then a full fold
    _commit(spark, root, 4, [(40, "x")], mode)
    _commit(spark, root, 5, [(50, "x")], mode)
    assert BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    # retired: zero anti-joins planned, values still correct
    plan = _plan(BC.read_committed(spark, root, DDL, mode=mode))
    assert "Join" not in plan
    assert _keys(spark, root, mode) == [0, 1, 2, 3, 4, 10, 12, 13, 14, 20,
                                        22, 23, 24, 40, 50]
    # the sub-log shrank to nothing (marker/index stay; data dirs gone)
    troot = os.path.join(root, "_tombstones")
    assert _log_dirs(troot) == []
    assert BC.deleted_keys(spark, root, mode=mode).count() == 0
    # exactly-once survives the seal: the delete's batch id is burned
    assert BC.delete_keys(spark, root, [99], 3, key_cols="k", mode=mode) is False
    assert _keys(spark, root, mode)[-1] == 50  # nothing changed
    # a NEW delete (fresh id) masks again and plans its anti-join
    assert BC.delete_keys(spark, root, [40], 6, key_cols="k", mode=mode)
    assert 40 not in _keys(spark, root, mode)
    assert "Join" in _plan(BC.read_committed(spark, root, DDL, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_partial_retirement_keeps_late_tombstone(spark, tmp_path, mode):
    """A fold that proves only the EARLY tombstone applied retires just
    it; the late tombstone (still covering the keep_last tail) keeps
    masking."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x")], mode)
    BC.delete_keys(spark, root, [1], 1, key_cols="k", mode=mode)   # covers=0
    _commit(spark, root, 2, [(3, "x")], mode)
    _commit(spark, root, 3, [(4, "x")], mode)
    BC.delete_keys(spark, root, [4], 4, key_cols="k", mode=mode)   # covers=3
    # fold 0,2 — tail is batch 3, which tombstone@4 still covers
    BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    assert _keys(spark, root, mode) == [2, 3]
    live = sorted(r["key"] for r in BC.deleted_keys(spark, root, mode=mode).collect())
    assert live == [4]  # tombstone@1 retired, tombstone@4 still live
    # once the tail moves past it, the next fold retires it too
    _commit(spark, root, 5, [(6, "x")], mode)
    BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    assert BC.deleted_keys(spark, root, mode=mode).count() == 0
    assert _keys(spark, root, mode) == [2, 3, 6]
    assert "Join" not in _plan(BC.read_committed(spark, root, DDL, mode=mode))


@pytest.mark.parametrize("mode", MODES)
def test_tiered_only_stream_converges_too(spark, tmp_path, mode):
    """Retirement doesn't require the one-shot full fold: a pure
    compact_tiered cadence eventually folds every pre-delete batch and
    the tombstone retires on its own."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x")], mode)
    BC.delete_keys(spark, root, [1], 1, key_cols="k", mode=mode)
    for b in range(2, 8):
        _commit(spark, root, b, [(b * 10, "x")], mode)
        BC.compact_tiered(spark, root, DDL, keep_last=1, mode=mode,
                          band_base_bytes=512, order_by=["k"])
    assert BC.deleted_keys(spark, root, mode=mode).count() == 0
    assert "Join" not in _plan(BC.read_committed(spark, root, DDL, mode=mode))
    assert _keys(spark, root, mode) == [2, 20, 30, 40, 50, 60, 70]


# -------------------------------------------------- sub-log compaction


@pytest.mark.parametrize("mode", MODES)
def test_tombstone_sublog_is_compacted(spark, tmp_path, mode):
    """Many deletes must not accumulate one directory per delete batch
    forever: the sub-log tier-compacts itself past the threshold."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(i, "x") for i in range(100)], mode)
    n = BC._TOMB_COMPACT_EVERY + 3
    for i in range(n):
        assert BC.delete_keys(spark, root, [i], i + 1, key_cols="k", mode=mode)
    troot = os.path.join(root, "_tombstones")
    assert len(_log_dirs(troot)) < BC._TOMB_COMPACT_EVERY
    # every delete still masks, across the folded and unfolded tombstones
    assert _keys(spark, root, mode) == list(range(n, 100))
    assert sorted(
        r["key"] for r in BC.deleted_keys(spark, root, mode=mode).collect()
    ) == list(range(n))


# ------------------------------------------------------- fenced deletes


def test_fenced_delete_raises_for_zombie_writer(spark, tmp_path):
    """r9 ADVICE: delete_keys is a mutation like any other — a
    superseded writer's delete must die loudly, not land a destructive
    tombstone."""
    root = str(tmp_path / "log")
    a = BC.acquire_writer(root, mode=BC.MANIFEST)
    _commit(spark, root, 0, [(1, "x"), (2, "x")], BC.MANIFEST)
    b = BC.acquire_writer(root, mode=BC.MANIFEST)
    with pytest.raises(BC.StaleWriterError):
        BC.delete_keys(spark, root, [1], 1, key_cols="k", mode=BC.MANIFEST,
                       epoch=a)
    assert _keys(spark, root, BC.MANIFEST) == [1, 2]  # nothing masked
    BC.delete_keys(spark, root, [1], 1, key_cols="k", mode=BC.MANIFEST, epoch=b)
    assert _keys(spark, root, BC.MANIFEST) == [2]


def test_store_level_fenced_delete(spark, tmp_path):
    """A manifest-mode LSHVectorStore is fenced BY DEFAULT now (r9
    verdict ask #3): a newer handle supersedes the old one's deletes."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "ann")
    s1 = LSHVectorStore(spark, root, commit_mode=BC.MANIFEST)
    assert s1._epoch is not None  # fenced by default in manifest mode
    s1.process_batch(e.where(F.col("vec_id") < 40), 0)
    s2 = LSHVectorStore(spark, root, commit_mode=BC.MANIFEST)
    with pytest.raises(BC.StaleWriterError):
        s1.delete_vectors([3], 1)
    assert s2.members().count() == 40
    s2.delete_vectors([3], 1)
    assert s2.members().count() == 39


# ------------------------------------------------- store-level stories


def test_ann_store_reinserted_vector_is_searchable(spark, tmp_path):
    """Deleting then re-ingesting a vec_id behaves like a first-class
    re-insert (it used to silently vanish — r9 ADVICE)."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "ann"))
    store.process_batch(e.where(F.col("vec_id") < 60), 0)
    store.process_batch(
        e.where((F.col("vec_id") >= 60) & (F.col("vec_id") < 120)), 1
    )
    top0 = sorted(map(tuple, store.query_topk(8, 5).collect()))
    victim = int(top0[0][1])
    store.delete_vectors([victim], 2)
    assert store.members().where(F.col("vec_id") == victim).count() == 0
    store.process_batch(e.where(F.col("vec_id") == victim), 3)
    assert store.members().where(F.col("vec_id") == victim).count() == 1
    assert sorted(map(tuple, store.query_topk(8, 5).collect())) == top0
    BC.compact(spark, store._members,
               "bucket bigint, vec_id bigint, embedding array<float>",
               keep_last=1, order_by=["bucket"])
    assert sorted(map(tuple, store.query_topk(8, 5).collect())) == top0


def test_curation_readmitted_copy_guards_future_duplicates(spark, tmp_path):
    """The r9 ADVICE curation bug: after delete-then-readmit, the
    readmitted copy's OWN fingerprint must keep guarding — a THIRD
    identical ingest is rejected (it used to be re-admitted forever)."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_curation import CurationStore

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    store = CurationStore(spark, str(tmp_path / "cur"))
    store.process_batch(d.where(F.col("doc_id") < 100), 0)
    victim = min(r["doc_id"] for r in store.kept().collect())
    vtext = d.where(F.col("doc_id") == victim).first()["text"]
    store.delete_docs([victim], texts=[vtext], batch_id=1)
    clone1 = d.where(F.col("doc_id") == victim).withColumn(
        "doc_id", F.lit(10**9).cast("bigint")
    )
    store.process_batch(clone1, 2)
    kept = {r["doc_id"] for r in store.kept().collect()}
    assert 10**9 in kept  # freed fingerprint readmits once...
    clone2 = d.where(F.col("doc_id") == victim).withColumn(
        "doc_id", F.lit(10**9 + 1).cast("bigint")
    )
    store.process_batch(clone2, 3)
    kept2 = {r["doc_id"] for r in store.kept().collect()}
    assert 10**9 + 1 not in kept2  # ...and then guards again


# ------------------------------------------------------------ band math


def test_band_of_boundary_is_integer_exact():
    base, fanout = 1 << 16, 4
    for k in range(1, 6):
        edge = base * fanout**k
        assert BC._band_of(edge, base, fanout) == k
        assert BC._band_of(edge - 1, base, fanout) == k - 1
    assert BC._band_of(0, base, fanout) == 0
    assert BC._band_of(base, base, fanout) == 0
