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
