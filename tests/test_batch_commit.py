"""Exactly-once rename-commit protocol (streaming/batch_commit.py) and
its wiring into all three incremental stores (r6 verdict ask #2).

The contract under test: re-invoking process_batch with the SAME batch id
(structured streaming's at-least-once redelivery after a crash between
sink write and checkpoint commit) leaves every store byte-identical —
pairs / members / shingles / seen / kept / index all unchanged."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_ann import LSHVectorStore
from doreisa_spark.streaming.incremental_curation import CurationStore
from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore

SF_SMALL = "/root/testdata/sf0.001"

DOCS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, l, "web", len(t)) for i, t, l in rows], DOCS_DDL
    )


# --------------------------------------------------------------- primitive


def test_commit_batch_idempotent(spark, tmp_path):
    root = str(tmp_path / "log")
    df1 = spark.createDataFrame([(1,), (2,)], "v int")
    assert BC.commit_batch(df1, root, 0) is True
    # redelivery: different content must be REFUSED, first writer wins
    df2 = spark.createDataFrame([(99,)], "v int")
    assert BC.commit_batch(df2, root, 0) is False
    got = BC.read_committed(spark, root, "v int").collect()
    assert sorted(r["v"] for r in got) == [1, 2]
    assert BC.committed_ids(root) == [0]
    # no staging junk left behind
    assert not [f for f in os.listdir(root) if f.startswith("_staging")]


def test_read_committed_before_filter(spark, tmp_path):
    root = str(tmp_path / "log")
    for b in range(3):
        BC.commit_batch(spark.createDataFrame([(b,)], "v int"), root, b)
    assert {r["v"] for r in BC.read_committed(spark, root, "v int").collect()} == {0, 1, 2}
    assert {
        r["v"] for r in BC.read_committed(spark, root, "v int", before=2).collect()
    } == {0, 1}
    assert BC.read_committed(spark, root, "v int", before=0).count() == 0
    assert BC.next_batch_id(root) == 3


def test_empty_batch_commits_and_reads(spark, tmp_path):
    root = str(tmp_path / "log")
    empty = spark.createDataFrame([], "v int")
    assert BC.commit_batch(empty, root, 5) is True
    assert BC.committed_ids(root) == [5]
    assert BC.read_committed(spark, root, "v int").count() == 0
    assert BC.next_batch_id(root) == 6


# --------------------------------------------------------------- compaction


def _vals(spark, root):
    return sorted(r["v"] for r in BC.read_committed(spark, root, "v int").collect())


def test_compact_preserves_content_and_merges_dirs(spark, tmp_path):
    root = str(tmp_path / "log")
    for b in range(6):
        BC.commit_batch(spark.createDataFrame([(b,), (100 + b,)], "v int"), root, b)
    before = _vals(spark, root)
    assert BC.compact(spark, root, "v int", keep_last=2) is True
    assert _vals(spark, root) == before
    # batches 0..3 folded; 4,5 remain as batch dirs
    assert BC.committed_ids(root) == [4, 5]
    assert BC.is_committed(root, 0) and BC.is_committed(root, 3)
    assert BC.next_batch_id(root) == 6
    names = os.listdir(root)
    assert sum(1 for n in names if n.startswith("b0")) == 2
    assert sum(1 for n in names if n.startswith("m")) == 1
    # a second compact folds the old segment + newly eligible batches
    BC.commit_batch(spark.createDataFrame([(7,)], "v int"), root, 6)
    assert BC.compact(spark, root, "v int", keep_last=2) is True
    assert _vals(spark, root) == sorted(before + [7])
    assert sum(1 for n in os.listdir(root) if n.startswith("m")) == 1


def test_compact_noop_when_nothing_to_fold(spark, tmp_path):
    root = str(tmp_path / "log")
    for b in range(2):
        BC.commit_batch(spark.createDataFrame([(b,)], "v int"), root, b)
    assert BC.compact(spark, root, "v int", keep_last=2) is False
    with pytest.raises(ValueError, match="keep_last"):
        BC.compact(spark, root, "v int", keep_last=0)


def test_compact_crash_leftovers_invisible(spark, tmp_path):
    """Crash simulation: a merged-away batch dir that cleanup never
    reclaimed, and an orphan merged segment from a crashed attempt, are
    both ignored by readers (the manifest is the truth)."""
    import shutil

    root = str(tmp_path / "log")
    for b in range(5):
        BC.commit_batch(spark.createDataFrame([(b,)], "v int"), root, b)
    before = _vals(spark, root)
    assert BC.compact(spark, root, "v int", keep_last=2)
    # a batch dir BELOW the horizon reappearing (crash before rmtree, or a
    # late redelivery writing it again) must be invisible to readers and
    # refused by commit_batch (the manifest says id 0 is committed)
    assert BC.is_committed(root, 0)
    stray = os.path.join(root, "b000000000000")
    os.makedirs(stray, exist_ok=True)
    spark.createDataFrame([(999,)], "v int").write.mode("overwrite").parquet(stray)
    assert _vals(spark, root) == before
    # orphan merged dir from a crashed attempt (never entered the
    # manifest), with real data inside — also invisible
    orphan = os.path.join(root, "m000000000001_deadbeef")
    spark.createDataFrame([(888,)], "v int").write.mode("overwrite").parquet(orphan)
    os.utime(orphan, (1, 1))  # age past the GC grace window
    assert _vals(spark, root) == before
    # the next compact reclaims both leftovers
    BC.commit_batch(spark.createDataFrame([(5,)], "v int"), root, 5)
    BC.compact(spark, root, "v int", keep_last=1)
    assert not os.path.isdir(orphan)
    assert not os.path.isdir(stray)
    assert _vals(spark, root) == sorted(before + [5])


def test_compact_replay_depth_guard(spark, tmp_path):
    root = str(tmp_path / "log")
    for b in range(5):
        BC.commit_batch(spark.createDataFrame([(b,)], "v int"), root, b)
    BC.compact(spark, root, "v int", keep_last=2)  # horizon = 2
    # replay of the redeliverable tail still works
    assert {r["v"] for r in BC.read_committed(spark, root, "v int", before=4).collect()} == {0, 1, 2, 3}
    with pytest.raises(ValueError, match="unsupported"):
        BC.read_committed(spark, root, "v int", before=2)


def test_curation_store_survives_compaction(spark, tmp_path):
    """End-to-end: compacting a live store's logs changes nothing the
    operator can observe, and later batches still admit correctly."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    store = CurationStore(spark, str(tmp_path / "cur"))
    for i, bid in enumerate(range(4)):
        lo, hi = i * 50, (i + 1) * 50
        store.process_batch(
            d.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), bid
        )
    kept = sorted(map(tuple, store.kept().collect()))
    BC.compact(spark, store._seen, "fp string", keep_last=2)
    BC.compact(spark, store._kept, "doc_id bigint, lang string, n_tokens int", keep_last=2)
    assert sorted(map(tuple, store.kept().collect())) == kept
    # a duplicate of an already-seen doc in a NEW batch is still rejected
    store.process_batch(d.where(F.col("doc_id") < 50), 4)
    assert sorted(map(tuple, store.kept().collect())) == kept
    # redelivery of the tail batch stays a no-op
    store.process_batch(d.where(F.col("doc_id") < 50), 4)
    assert sorted(map(tuple, store.kept().collect())) == kept


def test_stores_auto_compaction_equivalence(spark, tmp_path):
    """compact_every=2 folding DURING the stream changes no observable
    result for any of the three stores (vs the never-compacted run)."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    batches_d = [
        d.where((F.col("doc_id") >= i * 80) & (F.col("doc_id") < (i + 1) * 80))
        for i in range(5)
    ]
    batches_e = [
        e.where((F.col("vec_id") >= i * 60) & (F.col("vec_id") < (i + 1) * 60))
        for i in range(5)
    ]
    plain_cur = CurationStore(spark, str(tmp_path / "c0"))
    auto_cur = CurationStore(spark, str(tmp_path / "c1"), compact_every=2)
    plain_ann = LSHVectorStore(spark, str(tmp_path / "a0"))
    auto_ann = LSHVectorStore(spark, str(tmp_path / "a1"), compact_every=2)
    plain_lsh = LSHSignatureStore(spark, str(tmp_path / "l0"))
    auto_lsh = LSHSignatureStore(spark, str(tmp_path / "l1"), compact_every=2)
    for bid in range(5):
        for s in (plain_cur, auto_cur):
            s.process_batch(batches_d[bid], bid)
        for s in (plain_ann, auto_ann):
            s.process_batch(batches_e[bid], bid)
        for s in (plain_lsh, auto_lsh):
            s.process_batch(batches_d[bid], bid)
    assert sorted(map(tuple, auto_cur.kept().collect())) == sorted(
        map(tuple, plain_cur.kept().collect())
    )
    assert sorted(map(tuple, auto_ann.query_topk(8, 5).collect())) == sorted(
        map(tuple, plain_ann.query_topk(8, 5).collect())
    )
    assert sorted(map(tuple, auto_lsh.pairs().collect())) == sorted(
        map(tuple, plain_lsh.pairs().collect())
    )
    # the folding actually happened: fewer batch dirs than batches
    assert len(BC.committed_ids(auto_ann._members)) < 5
    assert os.path.exists(os.path.join(auto_ann._members, "_manifest.json"))


# ------------------------------------------------------------- dedup store


def test_dedup_store_redelivery_is_noop(spark, tmp_path):
    docs = [
        (0, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (1, "completely unrelated text about spark structured streaming", "en"),
        (10, "the quick brown fox jumps over the lazy dog again and again!", "en"),
    ]
    store = LSHSignatureStore(spark, str(tmp_path / "store"))
    store.process_batch(_docs(spark, docs[:2]), 0)
    store.process_batch(_docs(spark, docs[2:]), 1)

    def snapshot():
        return (
            sorted(map(tuple, store.pairs().collect())),
            sorted(map(tuple, store.members().collect())),
            sorted((r["doc_id"], tuple(r["shingles"])) for r in store.shingles().collect()),
        )

    before = snapshot()
    assert before[0] and before[1] and before[2]
    # redeliver BOTH batches (any order) — nothing may change
    store.process_batch(_docs(spark, docs[2:]), 1)
    store.process_batch(_docs(spark, docs[:2]), 0)
    assert snapshot() == before


def test_dedup_store_auto_increment_batches(spark, tmp_path):
    """Driver-loop callers without stream ids get sequential batch ids —
    two distinct calls both land (no accidental same-id skip)."""
    store = LSHSignatureStore(spark, str(tmp_path / "store"))
    store.process_batch(
        _docs(spark, [(0, "alpha beta gamma delta epsilon zeta eta theta", "en")])
    )
    store.process_batch(
        _docs(spark, [(1, "iota kappa lambda mu nu xi omicron pi rho", "en")])
    )
    assert BC.committed_ids(store.members_dir) == [0, 1]
    assert store.shingles().count() == 2


# ---------------------------------------------------------- curation store


def test_curation_store_redelivery_is_noop(spark, tmp_path):
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    b1 = d.where(F.col("doc_id") < 100)
    b2 = d.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    store = CurationStore(spark, str(tmp_path / "cur"))
    store.process_batch(b1, 0)
    store.process_batch(b2, 1)
    kept = sorted(map(tuple, store.kept().collect()))
    seen = sorted(r["fp"] for r in store.seen().collect())
    assert kept and seen
    store.process_batch(b2, 1)  # redelivery
    store.process_batch(b1, 0)
    assert sorted(map(tuple, store.kept().collect())) == kept
    assert sorted(r["fp"] for r in store.seen().collect()) == seen


# --------------------------------------------------------------- ANN store


def test_ann_store_redelivery_is_noop(spark, tmp_path):
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    b1 = e.where(F.col("vec_id") < 50)
    b2 = e.where((F.col("vec_id") >= 50) & (F.col("vec_id") < 100))
    store = LSHVectorStore(spark, str(tmp_path / "ann"))
    store.process_batch(b1, 0)
    store.process_batch(b2, 1)
    n = store.members().count()
    topk = sorted(map(tuple, store.query_topk(8, 5).collect()))
    store.process_batch(b1, 0)  # redelivery: index must not grow
    assert store.members().count() == n
    assert sorted(map(tuple, store.query_topk(8, 5).collect())) == topk
