"""Exactly-once rename-commit protocol (streaming/batch_commit.py) and
its wiring into all three incremental stores (r6 verdict ask #2).

The contract under test: re-invoking process_batch with the SAME batch id
(structured streaming's at-least-once redelivery after a crash between
sink write and checkpoint commit) leaves every store byte-identical —
pairs / members / shingles / seen / kept / index all unchanged."""

from __future__ import annotations

import os

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
