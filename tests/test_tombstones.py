"""Tombstone deletes (batch_commit.delete_keys, r8 verdict ask #4).

Contract: after delete_keys, a masked key's rows never appear in any
read — before OR after compaction — and compaction physically drops the
bytes from every segment it writes; a redelivered delete batch is a
no-op; non-deleted rows are untouched; pair logs mask on BOTH endpoint
columns; the key-column marker is write-once.
"""

from __future__ import annotations

import os

import pytest

from doreisa_spark.streaming import batch_commit as BC

MODES = [BC.RENAME, BC.MANIFEST]


def _commit(spark, root, b, rows, mode, ddl="k bigint, v string"):
    BC.commit_batch(spark.createDataFrame(rows, ddl).coalesce(1), root, b, mode=mode)


@pytest.mark.parametrize("mode", MODES)
def test_delete_masks_reads_before_and_after_compaction(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    for b in range(5):
        _commit(spark, root, b, [(b * 10 + i, f"r{b}_{i}") for i in range(10)], mode)
    all_keys = set(range(50))
    dead = [7, 23, 23, 41]  # duplicate delete keys are fine
    assert BC.delete_keys(spark, root, dead, 0, key_cols="k", mode=mode) is True
    live = sorted(all_keys - set(dead))

    def read_keys():
        return sorted(
            r["k"]
            for r in BC.read_committed(spark, root, "k bigint, v string", mode=mode).collect()
        )

    assert read_keys() == live
    # physical drop: compact, then read each segment RAW (bypassing the
    # read-time filter) — the masked keys' bytes must be gone
    assert BC.compact(spark, root, "k bigint, v string", keep_last=1, mode=mode)
    assert read_keys() == live
    import json

    with open(os.path.join(root, "_manifest.json")) as f:
        man = json.load(f)
    for seg in man["segments"]:
        raw = {
            r["k"]
            for r in spark.read.schema("k bigint, v string")
            .parquet(os.path.join(root, seg))
            .collect()
        }
        assert raw.isdisjoint(dead), "deleted rows survived compaction"
    # the keep_last tail is NOT rewritten, so its raw bytes may retain
    # the key — but reads keep masking (tombstones persist)
    assert read_keys() == live


@pytest.mark.parametrize("mode", MODES)
def test_delete_redelivery_is_noop_and_more_deletes_accumulate(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(i, "x") for i in range(10)], mode)
    assert BC.delete_keys(spark, root, [3], 0, key_cols="k", mode=mode) is True
    assert BC.delete_keys(spark, root, [9], 0, key_cols="k", mode=mode) is False
    got = {r["k"] for r in BC.read_committed(spark, root, "k bigint, v string", mode=mode).collect()}
    assert got == set(range(10)) - {3}  # 9 was a REDELIVERED batch id: refused
    assert BC.delete_keys(spark, root, [9], 1, key_cols="k", mode=mode) is True
    got = {r["k"] for r in BC.read_committed(spark, root, "k bigint, v string", mode=mode).collect()}
    assert got == set(range(10)) - {3, 9}
    assert sorted(r["key"] for r in BC.deleted_keys(spark, root, mode=mode).collect()) == [3, 9]


@pytest.mark.parametrize("mode", MODES)
def test_delete_masks_both_columns_of_a_pair_log(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    pairs = [(1, 2), (2, 3), (3, 4), (5, 6)]
    _commit(spark, root, 0, pairs, mode, ddl="a bigint, b bigint")
    BC.delete_keys(spark, root, [3], 0, key_cols=["a", "b"], mode=mode)
    got = sorted(
        (r["a"], r["b"])
        for r in BC.read_committed(spark, root, "a bigint, b bigint", mode=mode).collect()
    )
    assert got == [(1, 2), (5, 6)]  # every pair touching 3 is gone
    BC.compact(spark, root, "a bigint, b bigint", keep_last=1, mode=mode)
    got2 = sorted(
        (r["a"], r["b"])
        for r in BC.read_committed(spark, root, "a bigint, b bigint", mode=mode).collect()
    )
    assert got2 == got


def test_delete_marker_is_write_once(spark, tmp_path):
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x")], BC.RENAME)
    BC.delete_keys(spark, root, [1], 0, key_cols="k")
    with pytest.raises(ValueError, match="tombstone log"):
        BC.delete_keys(spark, root, [2], 1, key_cols="v", key_type="string")
    with pytest.raises(ValueError, match="key_cols"):
        BC.delete_keys(spark, root, [2], 1, key_cols=[])


def test_string_keys(spark, tmp_path):
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [("a", 1), ("b", 2), ("c", 3)], BC.RENAME,
            ddl="fp string, n bigint")
    BC.delete_keys(spark, root, ["b"], 0, key_cols="fp", key_type="string")
    got = sorted(
        r["fp"]
        for r in BC.read_committed(spark, root, "fp string, n bigint").collect()
    )
    assert got == ["a", "c"]


# ----------------------------------------------------- store-level contracts


def test_dedup_store_delete_docs(spark, tmp_path):
    """Deleted doc never appears in dedup pairs / members / shingles,
    before and after compaction; non-deleted pairs survive."""
    from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore

    DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    mk = lambda rows: spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows], DDL
    )
    base = "the quick brown fox jumps over the lazy dog again and again"
    store = LSHSignatureStore(spark, str(tmp_path / "store"))
    store.process_batch(mk([(0, base), (1, "totally unrelated words about spark")]), 0)
    store.process_batch(mk([(10, base + "!"), (11, base + "?")]), 1)
    pairs0 = sorted((r["doc_a"], r["doc_b"]) for r in store.pairs().collect())
    assert (0, 10) in pairs0 and (0, 11) in pairs0
    store.delete_docs([10], 2)
    pairs1 = sorted((r["doc_a"], r["doc_b"]) for r in store.pairs().collect())
    assert all(10 not in p for p in pairs1)
    assert (0, 11) in pairs1  # untouched pair survives
    assert store.members().where("doc_id = 10").count() == 0
    assert store.shingles().where("doc_id = 10").count() == 0
    # compaction physically drops and changes nothing observable
    store._maybe_compact(store.compact_every - 1 if store.compact_every else 0)
    assert sorted((r["doc_a"], r["doc_b"]) for r in store.pairs().collect()) == pairs1
    # redelivered delete is a no-op
    store.delete_docs([10], 2)
    assert sorted((r["doc_a"], r["doc_b"]) for r in store.pairs().collect()) == pairs1


def test_ann_store_delete_vectors(spark, tmp_path):
    """Deleted vector never appears in ANN top-k, before/after compaction."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "ann"))
    store.process_batch(e.where(F.col("vec_id") < 60), 0)
    store.process_batch(e.where((F.col("vec_id") >= 60) & (F.col("vec_id") < 120)), 1)
    top0 = store.query_topk(8, 5).collect()
    victim = int(top0[0]["cid"])
    store.delete_vectors([victim], 2)
    top1 = store.query_topk(8, 5).collect()
    assert all(r["cid"] != victim for r in top1)
    assert store.members().where(F.col("vec_id") == victim).count() == 0
    from doreisa_spark.streaming import batch_commit as BC

    BC.compact(spark, store._members,
               "bucket bigint, vec_id bigint, embedding array<float>",
               keep_last=1, order_by=["bucket"])
    assert sorted(map(tuple, store.query_topk(8, 5).collect())) == sorted(
        map(tuple, top1)
    )


def test_curation_store_delete_docs_frees_fingerprint(spark, tmp_path):
    """Deleting a curated doc removes it from kept(); deleting its
    fingerprint frees admission so a re-ingested copy is admitted."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_curation import CurationStore

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    store = CurationStore(spark, str(tmp_path / "cur"))
    store.process_batch(d.where(F.col("doc_id") < 100), 0)
    kept0 = {r["doc_id"] for r in store.kept().collect()}
    victim = min(kept0)
    vtext = d.where(F.col("doc_id") == victim).first()["text"]
    store.delete_docs([victim], texts=[vtext], batch_id=1)
    assert victim not in {r["doc_id"] for r in store.kept().collect()}
    # the freed fingerprint admits a re-ingested copy under a NEW doc id
    clone = d.where(F.col("doc_id") == victim).withColumn(
        "doc_id", F.lit(10**9).cast("bigint")
    )
    store.process_batch(clone, 2)
    assert 10**9 in {r["doc_id"] for r in store.kept().collect()}


@pytest.mark.parametrize("mode", MODES)
def test_delete_physically_dropped_by_tiered_compaction(spark, tmp_path, mode):
    """The tiered policy's merges run the same physical drop as the
    full fold (the filter lives in the shared segment writer)."""
    import json

    root = str(tmp_path / "log")
    for b in range(9):
        _commit(spark, root, b, [(b * 10 + i, "x") for i in range(10)], mode)
    BC.delete_keys(spark, root, [5, 42, 71], 0, key_cols="k", mode=mode)
    BC.compact_tiered(spark, root, "k bigint, v string", keep_last=1,
                      mode=mode, fanout=3, band_base_bytes=512)
    with open(os.path.join(root, "_manifest.json")) as f:
        man = json.load(f)
    assert man["segments"]
    for seg in man["segments"]:
        raw = {
            r["k"]
            for r in spark.read.schema("k bigint, v string")
            .parquet(os.path.join(root, seg))
            .collect()
        }
        assert raw.isdisjoint({5, 42, 71})
    got = {
        r["k"]
        for r in BC.read_committed(spark, root, "k bigint, v string", mode=mode).collect()
    }
    assert got == set(range(90)) - {5, 42, 71}


def test_consecutive_auto_id_deletes_both_land(spark, tmp_path):
    """next_batch_id counts the tombstone sub-log too: deletes don't
    touch the main log, so two back-to-back auto-id deletes used to be
    handed the SAME id — the second silently no-oped as a 'redelivery'
    of the first. Covers all three stores' delete APIs via the shared
    auto-increment."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "ann"))
    store.process_batch(e.where(F.col("vec_id") < 100), 0)
    store.delete_vectors([11])          # auto id
    store.delete_vectors([13])          # auto id — must NOT reuse 11's
    got = {r["vec_id"] for r in store.members().select("vec_id").collect()}
    assert 11 not in got and 13 not in got
    assert sorted(
        r["key"] for r in BC.deleted_keys(spark, store._members).collect()
    ) == [11, 13]
    # a later auto-id ingest skips past the delete ids
    store.process_batch(e.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 120)))
    assert store.members().count() == 118  # 120 ingested - 2 deleted
