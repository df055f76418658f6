"""Object-store-safe MANIFEST commit mode (r7 verdict ask #2).

Every exactly-once contract test_batch_commit.py pins for rename mode
must hold when the commit point is the atomic manifest replace instead
of rename-fails-if-exists: idempotent redelivery, replay isolation
(before=), crash-leftover invisibility, compaction equivalence, and the
three stores end-to-end. Plus the ADVICE-r7 multi-root batch-id pin."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_ann import LSHVectorStore
from doreisa_spark.streaming.incremental_curation import CurationStore
from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore

SF_SMALL = "/root/testdata/sf0.001"
M = BC.MANIFEST


def _vals(spark, root):
    return sorted(
        r["v"] for r in BC.read_committed(spark, root, "v int", mode=M).collect()
    )


# --------------------------------------------------------------- primitive


def test_manifest_commit_idempotent_no_rename(spark, tmp_path):
    root = str(tmp_path / "log")
    df1 = spark.createDataFrame([(1,), (2,)], "v int")
    assert BC.commit_batch(df1, root, 0, mode=M) is True
    # redelivery with different content must be REFUSED, first writer wins
    df2 = spark.createDataFrame([(99,)], "v int")
    assert BC.commit_batch(df2, root, 0, mode=M) is False
    assert _vals(spark, root) == [1, 2]
    assert BC.committed_ids(root, mode=M) == [0]
    assert BC.is_committed(root, 0, mode=M)
    # the mode self-records: readers need no explicit mode argument
    assert BC.committed_ids(root) == [0]
    # no rename-protocol names anywhere; the refused redelivery's data
    # dir was reclaimed (no orphans)
    names = os.listdir(root)
    assert not [n for n in names if n.startswith(("b", "_staging"))]
    assert sum(1 for n in names if n.startswith("d")) == 1


def test_manifest_before_filter_and_next_id(spark, tmp_path):
    root = str(tmp_path / "log")
    for b in range(3):
        BC.commit_batch(spark.createDataFrame([(b,)], "v int"), root, b, mode=M)
    assert _vals(spark, root) == [0, 1, 2]
    assert {
        r["v"]
        for r in BC.read_committed(spark, root, "v int", before=2, mode=M).collect()
    } == {0, 1}
    assert BC.read_committed(spark, root, "v int", before=0, mode=M).count() == 0
    assert BC.next_batch_id(root, mode=M) == 3


def test_manifest_empty_batch(spark, tmp_path):
    root = str(tmp_path / "log")
    empty = spark.createDataFrame([], "v int")
    assert BC.commit_batch(empty, root, 5, mode=M) is True
    assert BC.committed_ids(root, mode=M) == [5]
    assert BC.read_committed(spark, root, "v int", mode=M).count() == 0
    assert BC.next_batch_id(root, mode=M) == 6


def test_manifest_crash_orphan_invisible_and_gcd(spark, tmp_path):
    """The manifest-mode crash shape: data dir fully written but the
    manifest replace never happened. The orphan must be invisible to
    readers, the REPLAY must commit fresh data, and compaction must
    garbage-collect the orphan."""
    root = str(tmp_path / "log")
    BC.commit_batch(spark.createDataFrame([(0,)], "v int"), root, 0, mode=M)
    # simulate the crashed first delivery of batch 1: data, no manifest
    orphan = os.path.join(root, "d000000000001_deadbeef")
    spark.createDataFrame([(777,)], "v int").write.parquet(orphan)
    os.utime(orphan, (1, 1))  # age past the GC grace window
    assert _vals(spark, root) == [0]
    assert not BC.is_committed(root, 1, mode=M)
    # redelivery commits for real
    assert BC.commit_batch(spark.createDataFrame([(1,)], "v int"), root, 1, mode=M)
    assert _vals(spark, root) == [0, 1]
    # compaction reclaims the orphan (manifest-disowned name)
    for b in range(2, 5):
        BC.commit_batch(spark.createDataFrame([(b,)], "v int"), root, b, mode=M)
    assert BC.compact(spark, root, "v int", keep_last=2, mode=M) is True
    assert not os.path.isdir(orphan)
    assert _vals(spark, root) == [0, 1, 2, 3, 4]


def test_manifest_compact_preserves_content_and_folds(spark, tmp_path):
    root = str(tmp_path / "log")
    for b in range(6):
        BC.commit_batch(
            spark.createDataFrame([(b,), (100 + b,)], "v int"), root, b, mode=M
        )
    before = _vals(spark, root)
    assert BC.compact(spark, root, "v int", keep_last=2, mode=M) is True
    assert _vals(spark, root) == before
    assert BC.committed_ids(root, mode=M) == [4, 5]
    assert BC.is_committed(root, 0, mode=M) and BC.is_committed(root, 3, mode=M)
    assert BC.next_batch_id(root, mode=M) == 6
    # folded data dirs reclaimed; exactly one merged segment
    names = os.listdir(root)
    assert sum(1 for n in names if n.startswith("m")) == 1
    assert sum(1 for n in names if n.startswith("d")) == 2
    # a second compact folds the old segment + newly eligible batches
    BC.commit_batch(spark.createDataFrame([(7,)], "v int"), root, 6, mode=M)
    assert BC.compact(spark, root, "v int", keep_last=2, mode=M) is True
    assert _vals(spark, root) == sorted(before + [7])
    assert sum(1 for n in os.listdir(root) if n.startswith("m")) == 1


def test_manifest_compact_noop_and_replay_guard(spark, tmp_path):
    root = str(tmp_path / "log")
    for b in range(2):
        BC.commit_batch(spark.createDataFrame([(b,)], "v int"), root, b, mode=M)
    assert BC.compact(spark, root, "v int", keep_last=2, mode=M) is False
    for b in range(2, 5):
        BC.commit_batch(spark.createDataFrame([(b,)], "v int"), root, b, mode=M)
    BC.compact(spark, root, "v int", keep_last=2, mode=M)  # horizon = 2
    assert {
        r["v"]
        for r in BC.read_committed(spark, root, "v int", before=4, mode=M).collect()
    } == {0, 1, 2, 3}
    with pytest.raises(ValueError, match="unsupported"):
        BC.read_committed(spark, root, "v int", before=2, mode=M)


def test_next_batch_id_multi_root_after_partial_crash(spark, tmp_path):
    """ADVICE r7: one logical batch spans several log roots; a crash that
    committed only ONE of them must not let the next different-data batch
    reuse the id (its commit against the leftover would no-op)."""
    for mode in (BC.RENAME, BC.MANIFEST):
        pairs = str(tmp_path / mode / "pairs")
        members = str(tmp_path / mode / "members")
        # crash: batch 0 committed pairs but NOT members
        BC.commit_batch(spark.createDataFrame([(1,)], "v int"), pairs, 0, mode=mode)
        bid = BC.next_batch_id(members, pairs, mode=mode)
        assert bid == 1, (mode, bid)  # single-root would have said 0
        # the new batch's commits all land
        assert BC.commit_batch(
            spark.createDataFrame([(5,)], "v int"), pairs, bid, mode=mode
        )
        assert BC.commit_batch(
            spark.createDataFrame([(6,)], "v int"), members, bid, mode=mode
        )
        got = sorted(
            r["v"]
            for r in BC.read_committed(spark, pairs, "v int", mode=mode).collect()
        )
        assert got == [1, 5], mode


# ---------------------------------------------------------- stores e2e


def test_all_three_stores_manifest_mode_match_rename_mode(spark, tmp_path):
    """Redelivery no-op + identical observable results under both commit
    modes for dedup / curation / ANN stores."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    batches_d = [
        d.where((F.col("doc_id") >= i * 80) & (F.col("doc_id") < (i + 1) * 80))
        for i in range(3)
    ]
    batches_e = [
        e.where((F.col("vec_id") >= i * 60) & (F.col("vec_id") < (i + 1) * 60))
        for i in range(3)
    ]
    ren_lsh = LSHSignatureStore(spark, str(tmp_path / "l0"))
    man_lsh = LSHSignatureStore(spark, str(tmp_path / "l1"), commit_mode=M)
    ren_cur = CurationStore(spark, str(tmp_path / "c0"))
    man_cur = CurationStore(spark, str(tmp_path / "c1"), commit_mode=M)
    ren_ann = LSHVectorStore(spark, str(tmp_path / "a0"))
    man_ann = LSHVectorStore(spark, str(tmp_path / "a1"), commit_mode=M)
    for bid in range(3):
        for s in (ren_lsh, man_lsh):
            s.process_batch(batches_d[bid], bid)
        for s in (ren_cur, man_cur):
            s.process_batch(batches_d[bid], bid)
        for s in (ren_ann, man_ann):
            s.process_batch(batches_e[bid], bid)
    pairs = sorted(map(tuple, man_lsh.pairs().collect()))
    kept = sorted(map(tuple, man_cur.kept().collect()))
    topk = sorted(map(tuple, man_ann.query_topk(8, 5).collect()))
    assert pairs == sorted(map(tuple, ren_lsh.pairs().collect()))
    assert kept == sorted(map(tuple, ren_cur.kept().collect()))
    assert topk == sorted(map(tuple, ren_ann.query_topk(8, 5).collect()))
    # redelivery of every batch (reverse order) is a no-op in manifest mode
    for bid in reversed(range(3)):
        man_lsh.process_batch(batches_d[bid], bid)
        man_cur.process_batch(batches_d[bid], bid)
        man_ann.process_batch(batches_e[bid], bid)
    assert sorted(map(tuple, man_lsh.pairs().collect())) == pairs
    assert sorted(map(tuple, man_cur.kept().collect())) == kept
    assert sorted(map(tuple, man_ann.query_topk(8, 5).collect())) == topk


def test_manifest_mode_auto_compaction(spark, tmp_path):
    """compact_every folding during a manifest-mode stream changes no
    observable result and actually folds the manifest's batch table."""
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    batches = [
        e.where((F.col("vec_id") >= i * 40) & (F.col("vec_id") < (i + 1) * 40))
        for i in range(5)
    ]
    plain = LSHVectorStore(spark, str(tmp_path / "p"), commit_mode=M)
    auto = LSHVectorStore(spark, str(tmp_path / "a"), commit_mode=M, compact_every=2)
    for bid in range(5):
        plain.process_batch(batches[bid], bid)
        auto.process_batch(batches[bid], bid)
    assert sorted(map(tuple, auto.query_topk(8, 5).collect())) == sorted(
        map(tuple, plain.query_topk(8, 5).collect())
    )
    assert len(BC.committed_ids(auto._members, mode=M)) < 5
