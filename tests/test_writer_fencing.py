"""Writer fencing for the manifest commit mode (batch_commit, r8 verdict
ask #5).

The stores' contract is single-writer; fencing turns an accidental
second writer from silent last-writer-wins into a LOUD StaleWriterError:
acquire_writer bumps the manifest's writer_epoch, and every epoch-passed
manifest replace CASes against it under the store lock (the conditional
PUT on an object store).
"""

from __future__ import annotations

import pytest

from doreisa_spark.streaming import batch_commit as BC


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v bigint").coalesce(1)


def _vals(spark, root):
    return sorted(
        r["v"]
        for r in BC.read_committed(spark, root, "v bigint", mode=BC.MANIFEST).collect()
    )


def test_two_writers_interleave_one_loses_loudly(spark, tmp_path):
    """The verdict's done-criterion: an interleaving of two writers —
    the superseded one raises on every subsequent commit AND compaction,
    nothing it attempted after the fence reaches the store, and the
    surviving writer's view stays consistent throughout."""
    root = str(tmp_path / "log")
    a = BC.acquire_writer(root, mode=BC.MANIFEST)
    assert BC.commit_batch(_df(spark, [1]), root, 0, mode=BC.MANIFEST, epoch=a)
    assert BC.commit_batch(_df(spark, [2]), root, 1, mode=BC.MANIFEST, epoch=a)
    # writer B takes over (e.g. a restarted query; A is now a zombie)
    b = BC.acquire_writer(root, mode=BC.MANIFEST)
    assert b == a + 1
    assert BC.commit_batch(_df(spark, [3]), root, 2, mode=BC.MANIFEST, epoch=b)
    # zombie A: every mutation path must raise BEFORE changing anything
    with pytest.raises(BC.StaleWriterError):
        BC.commit_batch(_df(spark, [99]), root, 3, mode=BC.MANIFEST, epoch=a)
    with pytest.raises(BC.StaleWriterError):
        BC.compact(spark, root, "v bigint", keep_last=1, mode=BC.MANIFEST, epoch=a)
    with pytest.raises(BC.StaleWriterError):
        BC.compact_tiered(spark, root, "v bigint", keep_last=1,
                          mode=BC.MANIFEST, epoch=a)
    assert _vals(spark, root) == [1, 2, 3]  # A's post-fence writes absent
    assert BC.committed_ids(root, mode=BC.MANIFEST) == [0, 1, 2]
    # the zombie's refused commit left no orphan data dir behind
    import os

    assert not [n for n in os.listdir(root) if n.startswith("d000000000003")]
    # B keeps working, including fenced compaction
    assert BC.commit_batch(_df(spark, [4]), root, 3, mode=BC.MANIFEST, epoch=b)
    assert BC.compact(spark, root, "v bigint", keep_last=1, mode=BC.MANIFEST, epoch=b)
    assert _vals(spark, root) == [1, 2, 3, 4]


def test_unfenced_writes_do_not_erase_the_fence(spark, tmp_path):
    root = str(tmp_path / "log")
    a = BC.acquire_writer(root, mode=BC.MANIFEST)
    # a legacy (no-epoch) commit must not clobber the recorded epoch
    assert BC.commit_batch(_df(spark, [1]), root, 0, mode=BC.MANIFEST)
    with open(f"{root}/_manifest.json") as f:
        import json

        assert json.load(f)["writer_epoch"] == a
    # so the fenced writer still works after it
    assert BC.commit_batch(_df(spark, [2]), root, 1, mode=BC.MANIFEST, epoch=a)


def test_fencing_requires_manifest_mode(spark, tmp_path):
    root = str(tmp_path / "log")
    with pytest.raises(ValueError, match="manifest"):
        BC.acquire_writer(root, mode=BC.RENAME)
    with pytest.raises(ValueError, match="manifest"):
        BC.commit_batch(_df(spark, [1]), root, 0, mode=BC.RENAME, epoch=1)
    with pytest.raises(ValueError, match="manifest"):
        BC.compact(spark, root, "v bigint", mode=BC.RENAME, epoch=1)
    with pytest.raises(ValueError, match="manifest"):
        BC.compact_tiered(spark, root, "v bigint", mode=BC.RENAME, epoch=1)


def test_fenced_store_end_to_end(spark, tmp_path):
    """Store-level wiring: a fenced LSHVectorStore commits with its
    epoch; a second fenced store on the same root supersedes it."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "ann")
    s1 = LSHVectorStore(spark, root, commit_mode=BC.MANIFEST, fenced=True)
    s1.process_batch(e.where(F.col("vec_id") < 40), 0)
    n1 = s1.members().count()
    assert n1 == 40
    s2 = LSHVectorStore(spark, root, commit_mode=BC.MANIFEST, fenced=True)
    s2.process_batch(e.where((F.col("vec_id") >= 40) & (F.col("vec_id") < 80)), 1)
    with pytest.raises(BC.StaleWriterError):
        s1.process_batch(e.where(F.col("vec_id") >= 80), 2)
    assert s2.members().count() == 80  # zombie's batch never landed


def test_fenced_default_on_for_manifest_stores(spark, tmp_path):
    """r9 verdict ask #3: fencing is the DEFAULT in manifest mode — a
    second store instance on the same root supersedes the first without
    anyone passing fenced=True. Rename mode stays unfenced (no manifest
    to fence through); fenced=False opts a manifest handle out."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    root = str(tmp_path / "ann")
    s1 = LSHVectorStore(spark, root, commit_mode=BC.MANIFEST)
    assert s1._epoch is not None
    s1.process_batch(e.where(F.col("vec_id") < 40), 0)
    s2 = LSHVectorStore(spark, root)  # mode resolves from the manifest
    assert s2._epoch == s1._epoch + 1
    with pytest.raises(BC.StaleWriterError):
        s1.process_batch(e.where(F.col("vec_id") >= 80), 1)
    ro = LSHVectorStore(spark, root, fenced=False)  # read-only handle
    assert ro._epoch is None
    assert ro.members().count() == 40
    assert s2._epoch == BC._manifest_load(f"{root}/members")["writer_epoch"]
    plain = LSHVectorStore(spark, str(tmp_path / "ren"))  # rename mode
    assert plain._epoch is None


def test_two_streams_one_root_superseded_dies_mid_stream(spark, tmp_path):
    """The r9 verdict's e2e done-criterion: two REAL foreachBatch
    streams target one store root; when the second starts, the first
    dies mid-stream with StaleWriterError on its next micro-batch, and
    the store holds exactly the pre-fence batches plus the survivor's —
    nothing from the zombie's post-fence trigger."""
    import os
    import time

    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import (
        LSHVectorStore,
        read_vector_stream,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def drop_file(src, name, pred, mtime):
        tmp = src / f"tmp_{name}"
        e.where(pred).coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = str(src / f"{name}.parquet")
        os.rename(str(tmp / data), dst)
        os.utime(dst, (mtime,) * 2)

    src1 = tmp_path / "in1"
    src1.mkdir()
    root = str(tmp_path / "ann")
    drop_file(src1, "00000", F.col("vec_id") < 40, 1_700_000_000)

    s1 = LSHVectorStore(spark, root, commit_mode=BC.MANIFEST)  # fenced default
    ckpt = str(tmp_path / "ckpt1")
    q1 = (
        read_vector_stream(spark, str(src1))
        .writeStream.foreachBatch(lambda df, bid: s1.process_batch(df))
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not BC.committed_ids(
            f"{root}/members", mode=BC.MANIFEST
        ):
            time.sleep(0.3)
        assert BC.committed_ids(f"{root}/members", mode=BC.MANIFEST)

        # takeover while stream 1 is LIVE: a second fenced writer
        s2 = LSHVectorStore(spark, root)
        s2.process_batch(e.where((F.col("vec_id") >= 40) & (F.col("vec_id") < 80)))

        # stream 1's next micro-batch must die loudly, not silently win
        drop_file(src1, "00001", F.col("vec_id") >= 80, 1_700_000_100)
        deadline = time.time() + 90
        while time.time() < deadline and q1.isActive:
            time.sleep(0.3)
        assert not q1.isActive
        exc = q1.exception()
        assert exc is not None and "StaleWriterError" in str(exc)
    finally:
        if q1.isActive:
            q1.stop()
    # store uncorrupted: pre-fence batch + survivor's batch, zombie's absent
    assert s2.members().count() == 80
    assert s2.members().where(F.col("vec_id") >= 80).count() == 0
    # the surviving writer keeps streaming
    s2.process_batch(e.where((F.col("vec_id") >= 80) & (F.col("vec_id") < 100)))
    assert s2.members().count() == 100
