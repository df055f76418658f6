"""Streaming-incremental MinHash-LSH dedup ≡ the batch oracle.

The corpus streams in as three parquet files (monotonic doc_id ranges —
the natural ingest order the equivalence contract requires); a real
readStream + foreachBatch drive upserts the signature store per
micro-batch. The accumulated pairs log must equal `dedup_minhash_lsh`
(itself DuckDB-oracle-checked by the driver) row for row.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doreisa_spark.queries.dedup import dedup_minhash_lsh
from doreisa_spark.streaming.incremental_dedup import (
    LSHSignatureStore,
    PrunedLSHSignatureStore,
    run_incremental_dedup,
)

SF_SMALL = "/root/testdata/sf0.001"


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 6)) for r in df.collect()
    }


@pytest.fixture()
def doc_stream_dir(spark, tmp_path):
    """sf0.001 documents split into 3 files by doc_id range, mtimes
    ascending so the file source triggers them in order."""
    src = tmp_path / "docs_in"
    src.mkdir()
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        part = d.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        tmp = src / f"tmp{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = str(src / f"{i:05d}.parquet")
        os.rename(str(tmp / data), dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)
    return str(src)


def test_stream_accumulated_pairs_equal_batch(spark, tmp_path, doc_stream_dir):
    got = run_incremental_dedup(
        spark, doc_stream_dir, str(tmp_path / "store")
    )
    expect = dedup_minhash_lsh(spark, SF_SMALL)
    assert _pairs_set(got) == _pairs_set(expect)
    assert got.count() == got.select("doc_a", "doc_b").distinct().count()


def test_pairs_emitted_in_arriving_batch_only(spark, tmp_path):
    """Each pair lands exactly once, in the batch where its larger doc
    arrives; history contributes via the store, not a rescan."""
    docs = [
        (0, "the quick brown fox jumps over the lazy dog again and again", "en"),
        (1, "completely unrelated text about spark structured streaming", "en"),
        # near-dup of doc 0, arrives in batch 2
        (10, "the quick brown fox jumps over the lazy dog again and again!", "en"),
    ]

    def frame(rows):
        return spark.createDataFrame(
            [(i, t, l, "web", len(t)) for i, t, l in rows],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )

    store = LSHSignatureStore(spark, str(tmp_path / "store2"))
    store.process_batch(frame(docs[:2]), 0)
    assert store.pairs().count() == 0
    store.process_batch(frame(docs[2:]), 1)
    out = store.pairs().collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {(0, 10)}
    assert out[0]["jaccard"] > 0.5
    # redelivery is exactly-once (rename-commit, batch_commit.py):
    # tests/test_batch_commit.py asserts the full no-op contract
    n_members = store.members().count()
    assert n_members > 0


def test_pruned_store_equals_base_store(spark, tmp_path):
    """The deployment-layout store (sorted segments + key-pushdown
    probes, r7 verdict ask #1) must be observably IDENTICAL to the
    full-read base store across batches, compaction, and redelivery."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    batches = [
        d.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in [(0, 170), (170, 340), (340, 10**9)]
    ]
    base = LSHSignatureStore(spark, str(tmp_path / "base"))
    pruned = PrunedLSHSignatureStore(
        spark, str(tmp_path / "pruned"), compact_every=2
    )
    for bid, b in enumerate(batches):
        base.process_batch(b, bid)
        pruned.process_batch(b, bid)
    assert _pairs_set(pruned.pairs()) == _pairs_set(base.pairs())
    assert sorted(map(tuple, pruned.members().collect())) == sorted(
        map(tuple, base.members().collect())
    )
    assert sorted(
        (r["doc_id"], tuple(r["shingles"])) for r in pruned.shingles().collect()
    ) == sorted(
        (r["doc_id"], tuple(r["shingles"])) for r in base.shingles().collect()
    )
    # and against the one-shot batch operator (the DuckDB-gated oracle)
    assert _pairs_set(pruned.pairs()) == _pairs_set(dedup_minhash_lsh(spark, SF_SMALL))
    # redelivery of the tail batch stays a no-op through the pruned path
    before = _pairs_set(pruned.pairs())
    pruned.process_batch(batches[-1], len(batches) - 1)
    assert _pairs_set(pruned.pairs()) == before


def test_bands_knob(spark, tmp_path):
    """The deployment recall knob: (bands, rows)=(8, 2) draws 16
    prefix-stable perms (TX.minhash_params — the first 8 ARE the
    oracle-tied constants), so the default store's candidates are a
    subset of the 8-band store's (same sigs on shared bands, same
    caps) and verified pairs at the same tau are a SUPERSET with
    identical jaccard on the overlap. Also pins: members span the new
    band ids, a reopened store adopts the marker, a mismatched writer
    raises."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    batches = [
        d.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in [(0, 250), (250, 10**9)]
    ]
    s4 = LSHSignatureStore(spark, str(tmp_path / "b4"))
    s8 = LSHSignatureStore(spark, str(tmp_path / "b8"), n_bands=8)
    for bid, b in enumerate(batches):
        s4.process_batch(b, bid)
        s8.process_batch(b, bid)
    p4 = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in s4.pairs().collect()
    }
    p8 = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in s8.pairs().collect()
    }
    assert set(p4) <= set(p8)
    assert all(abs(p8[k] - p4[k]) < 1e-9 for k in p4)
    bands_seen = {
        r["band_id"] for r in s8.members().select("band_id").distinct().collect()
    }
    assert bands_seen == set(range(8))
    assert {
        r["band_id"] for r in s4.members().select("band_id").distinct().collect()
    } == set(range(4))
    reopened = LSHSignatureStore(spark, str(tmp_path / "b8"))
    assert (reopened.n_bands, reopened.band_rows) == (8, 2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bands"):
        LSHSignatureStore(spark, str(tmp_path / "b8"), n_bands=4)
