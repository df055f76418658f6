"""Regression tests for the round-10 ADVICE findings.

Each test pins one previously-latent defect in the store layer:

- ``_tomb_index`` healed by WRITING the index file from the read path —
  a pure reader on a read-only mount would crash, and the unlocked
  read-side replace could race a retirement's rewrite. Reads now heal
  in memory only; mutation paths persist the cache.
- a retired tid's exclusion was authoritative only in the JSON cache:
  crash between the cache rewrite and the row purge + later cache loss
  resurrected the retired tombstone. Retirement now commits a durable
  ``retired_max`` watermark in the sub-log manifest FIRST.
- a fenced ``delete_keys`` held the exclusive store flock across the
  tombstone batch's whole Spark job. The write now runs unlocked; only
  the sub-log manifest publish re-verifies the epoch (CAS).
- ``_topk_blas`` collapsed probe rows by qid keeping the FIRST
  embedding — duplicate qids with differing embeddings silently merged.
  Now raises.
- a zero-norm quantizer centroid made the IVF fold path raise
  ZeroDivisionError while the blas paths silently emitted NaN cosines.
  Construction now validates the quantizer.
"""

from __future__ import annotations

import fcntl
import json
import os

import pytest

from doreisa_spark.streaming import batch_commit as BC

DDL = "k bigint, v string"


def _commit(spark, root, b, rows, mode):
    BC.commit_batch(spark.createDataFrame(rows, DDL).coalesce(1), root, b, mode=mode)


def _keys(spark, root, mode):
    return sorted(
        r["k"] for r in BC.read_committed(spark, root, DDL, mode=mode).collect()
    )


# ------------------------------------------------ read path never writes


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_read_path_heals_in_memory_only(spark, tmp_path, mode):
    """A reader that needs a heal (lost/stale index cache) must get
    correct masking WITHOUT recreating the cache file — only mutation
    paths persist it (a pure reader may sit on a read-only replica)."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x")], mode)
    assert BC.delete_keys(spark, root, [1], 1, key_cols="k", mode=mode)
    idx_path = os.path.join(root, "_tombstones", BC._TOMB_INDEX)
    assert os.path.exists(idx_path)  # the delete (a mutation) persisted it
    os.remove(idx_path)
    # reads heal in memory: masking correct, file still absent after
    assert _keys(spark, root, mode) == [2]
    assert BC._tomb_index(root, mode=mode) == {1: 0}
    assert not os.path.exists(idx_path)
    # the next mutation re-persists the cache
    assert BC.delete_keys(spark, root, [2], 2, key_cols="k", mode=mode)
    assert os.path.exists(idx_path)
    assert _keys(spark, root, mode) == []


# ------------------------------------------- durable retirement watermark


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_retired_tid_survives_cache_loss_before_purge(spark, tmp_path, mode, monkeypatch):
    """The r10 ADVICE crash window: retirement rewrites the index cache,
    then the sub-log fold purges the retired rows. Simulate a crash
    between the two (purge never runs) followed by cache loss — the
    heal must NOT resurrect the retired tombstone, because the
    retirement watermark is durable in the sub-log manifest."""
    orig_compact = BC.compact

    def no_purge(spark_, r, *a, **k):
        if os.path.basename(r) == BC._TOMBSTONES:
            return False  # simulated crash before the purge fold
        return orig_compact(spark_, r, *a, **k)

    monkeypatch.setattr(BC, "compact", no_purge)
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x")], mode)
    BC.delete_keys(spark, root, [1], 2, key_cols="k", mode=mode)  # covers=0
    _commit(spark, root, 3, [(3, "x")], mode)
    BC.delete_keys(spark, root, [3], 4, key_cols="k", mode=mode)  # covers=3
    # fold [0] (keep_last keeps batch 3): tombstone@2 retires (partial),
    # tombstone@4 still covers the live tail — purge is stubbed out, so
    # the retired tid's ROWS are still committed in the sub-log
    BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    troot = os.path.join(root, BC._TOMBSTONES)
    man = json.load(open(os.path.join(troot, "_manifest.json")))
    assert int(man["retired_max"]) == 2  # durable commit point
    # cache loss after the partial retirement
    os.remove(os.path.join(troot, BC._TOMB_INDEX))
    # heal from rows: tid 2 stays retired (watermark), tid 4 stays live
    assert BC._tomb_index(root, mode=mode) == {4: 3}
    assert _keys(spark, root, mode) == [2]
    live = sorted(r["key"] for r in BC.deleted_keys(spark, root, mode=mode).collect())
    assert live == [3]
    # and a fresh delete id at or below the watermark is refused loudly
    with pytest.raises(ValueError, match="retirement watermark"):
        BC.delete_keys(spark, root, [9], 1, key_cols="k", mode=mode)


# --------------------------------------------- fenced delete lock narrowing


def test_fenced_delete_releases_lock_during_spark_write(spark, tmp_path, monkeypatch):
    """The tombstone batch's parquet write (the Spark job) must run with
    the parent store lock RELEASED — a concurrent acquire_writer that
    lands during the write supersedes the delete, which then dies at its
    publish CAS without committing anything."""
    import pyspark.sql.readwriter as rw

    root = str(tmp_path / "log")
    a = BC.acquire_writer(root, mode=BC.MANIFEST)
    _commit(spark, root, 0, [(1, "x"), (2, "x")], BC.MANIFEST)
    events = []
    orig = rw.DataFrameWriter.parquet

    def spy(self, path, *args, **kwargs):
        res = orig(self, path, *args, **kwargs)
        if BC._TOMBSTONES in path and not events:
            # the parent lock must be free mid-write (same-process fds
            # contend under flock, so NB acquire fails if it were held)
            with open(os.path.join(root, BC._LOCK), "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX | fcntl.LOCK_NB)
                fcntl.flock(lk, fcntl.LOCK_UN)
            events.append("unlocked-during-write")
            BC.acquire_writer(root, mode=BC.MANIFEST)  # newer writer lands
        return res

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", spy)
    with pytest.raises(BC.StaleWriterError):
        BC.delete_keys(spark, root, [1], 1, key_cols="k", mode=BC.MANIFEST,
                       epoch=a)
    assert events == ["unlocked-during-write"]
    # nothing masked, nothing committed, no orphan sub-log entries
    assert _keys(spark, root, BC.MANIFEST) == [1, 2]
    dk = BC.deleted_keys(spark, root, mode=BC.MANIFEST)
    assert dk is None or dk.count() == 0


def test_fenced_delete_fast_fails_before_spark_write(spark, tmp_path, monkeypatch):
    """A delete whose writer is ALREADY superseded must raise before
    paying for the tombstone batch's Spark job."""
    import pyspark.sql.readwriter as rw

    root = str(tmp_path / "log")
    a = BC.acquire_writer(root, mode=BC.MANIFEST)
    _commit(spark, root, 0, [(1, "x")], BC.MANIFEST)
    BC.acquire_writer(root, mode=BC.MANIFEST)
    wrote = []
    orig = rw.DataFrameWriter.parquet

    def spy(self, path, *args, **kwargs):
        wrote.append(path)
        return orig(self, path, *args, **kwargs)

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", spy)
    with pytest.raises(BC.StaleWriterError):
        BC.delete_keys(spark, root, [1], 1, key_cols="k", mode=BC.MANIFEST,
                       epoch=a)
    assert wrote == []  # refused before any write


# ----------------------------------------------- blas kernel duplicate qids


def test_topk_blas_rejects_duplicate_qid_with_differing_embeddings(spark, tmp_path):
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "ann"))
    store.process_batch(e.where(F.col("vec_id") < 50), 0)
    rows = e.where(F.col("vec_id") < 2).collect()
    e0 = [float(x) for x in rows[0]["embedding"]]
    e1 = [float(x) for x in rows[1]["embedding"]]
    with pytest.raises(ValueError, match="duplicate qid"):
        store._score_topk(
            [
                {"qid": 7, "qe": e0, "bucket": 0},
                {"qid": 7, "qe": e1, "bucket": 1},
            ],
            3,
            "blas",
        )
    # same embedding under one qid is the legitimate multiprobe shape
    out = store._score_topk(
        [
            {"qid": 7, "qe": e0, "bucket": 0},
            {"qid": 7, "qe": e0, "bucket": 1},
        ],
        3,
        "blas",
    )
    assert out.count() <= 3


# ----------------------------------------------- zero-norm quantizer guard


def test_ivf_store_rejects_zero_norm_centroid(spark, tmp_path):
    from doreisa_spark.streaming.incremental_ivf import IVFVectorStore

    with pytest.raises(ValueError, match="zero norm"):
        IVFVectorStore(
            spark, str(tmp_path / "ivf"),
            centroids=[(0, [0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0])],
        )


# ------------------------------------------------- r11 self-review findings


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_retirement_seal_decides_from_healed_index(spark, tmp_path, mode):
    """The seal decision must come from the HEALED index, never the
    cache file: with the cache lost, retiring the early tombstone used
    to read keep == {} from the missing file and SEAL the sub-log —
    physically destroying the still-live later tombstone and
    resurrecting its masked rows."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x")], mode)
    BC.delete_keys(spark, root, [1], 2, key_cols="k", mode=mode)  # covers=0
    _commit(spark, root, 3, [(3, "x")], mode)
    BC.delete_keys(spark, root, [3], 4, key_cols="k", mode=mode)  # covers=3
    troot = os.path.join(root, BC._TOMBSTONES)
    os.remove(os.path.join(troot, BC._TOMB_INDEX))  # cache loss
    # fold [0]: tombstone@2 retires, tombstone@4 still covers batch 3
    BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    # the live tombstone survived the retirement and still masks
    live = sorted(r["key"] for r in BC.deleted_keys(spark, root, mode=mode).collect())
    assert live == [3]
    assert _keys(spark, root, mode) == [2]
    assert BC._tomb_index(root, mode=mode) == {4: 3}


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_fresh_lower_delete_id_is_refused(spark, tmp_path, mode):
    """Retirement scoping is only sound if delete ids are monotone: a
    FRESH delete id below an already-committed one is refused (it would
    be missing from segments written before it, so a later retirement
    could retire it while live). Redelivery of a committed id still
    no-ops."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x")], mode)
    assert BC.delete_keys(spark, root, [1], 9, key_cols="k", mode=mode)
    with pytest.raises(ValueError, match="not monotone"):
        BC.delete_keys(spark, root, [2], 7, key_cols="k", mode=mode)
    assert BC.delete_keys(spark, root, [2], 9, key_cols="k", mode=mode) is False
    assert _keys(spark, root, mode) == [2]  # only the first delete landed


def test_migration_does_not_fence_out_live_writer(spark, tmp_path):
    """Blue/green means the OLD store is never written: the migration's
    read handle must not acquire the writer epoch, or the live writer
    still serving the old root dies with StaleWriterError mid-flight."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore
    from doreisa_spark.streaming.migrate import migrate_lsh_vector_store

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old_root = str(tmp_path / "blue")
    live = LSHVectorStore(spark, old_root, commit_mode=BC.MANIFEST)
    assert live._epoch is not None  # the live fenced writer
    live.process_batch(e.where(F.col("vec_id") < 60), 0)
    new = migrate_lsh_vector_store(
        spark, old_root, str(tmp_path / "green"), planes=10
    )
    assert new.members().count() == 60
    # the live writer keeps serving the blue root, unfenced-out
    live.process_batch(
        e.where((F.col("vec_id") >= 60) & (F.col("vec_id") < 100)), 1
    )
    assert live.members().count() == 100


def test_expr_kernel_also_rejects_duplicate_qids(spark, tmp_path):
    """The duplicate-qid guard lives in the shared dispatcher, so the
    expr kernel refuses the same ambiguous input the blas kernel does
    (it used to silently rank two embeddings' cosines in one qid
    partition)."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "ann"))
    store.process_batch(e.where(F.col("vec_id") < 50), 0)
    rows = e.where(F.col("vec_id") < 2).collect()
    with pytest.raises(ValueError, match="duplicate qid"):
        store._score_topk(
            [
                {"qid": 7, "qe": [float(x) for x in rows[0]["embedding"]], "bucket": 0},
                {"qid": 7, "qe": [float(x) for x in rows[1]["embedding"]], "bucket": 1},
            ],
            3,
            "expr",
        )
