"""Streaming-incremental curation ≡ the batch curation oracle.

Same drive as test_incremental_dedup.py: the corpus streams in as three
monotonic doc_id files through readStream + foreachBatch; the accumulated
kept log must equal `pipeline_corpus_curation` (DuckDB-oracle-checked)
row for row, and the fingerprint store must admit each text exactly once.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doreisa_spark.queries.pipeline import pipeline_corpus_curation
from doreisa_spark.streaming.incremental_curation import (
    CurationStore,
    run_incremental_curation,
)

SF_SMALL = "/root/testdata/sf0.001"


def _rows(df):
    return {(r["doc_id"], r["lang"], r["n_tokens"]) for r in df.collect()}


@pytest.fixture()
def doc_stream_dir(spark, tmp_path):
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


def test_stream_kept_equals_batch(spark, tmp_path, doc_stream_dir):
    got = run_incremental_curation(spark, doc_stream_dir, str(tmp_path / "store"))
    expect = pipeline_corpus_curation(spark, SF_SMALL)
    assert _rows(got) == _rows(expect)
    # every admitted fingerprint exactly once
    store = CurationStore(spark, str(tmp_path / "store"))
    assert store.seen().count() == store.seen().distinct().count()


def test_duplicate_across_batches_not_readmitted(spark, tmp_path):
    """A text arriving again in a later batch is dropped by the
    fingerprint store even when its first copy failed the quality gate
    (the batch keeper semantics: a low-quality first copy still claims
    canonical-ship)."""
    store = CurationStore(spark, str(tmp_path / "store2"))
    short = "too short"  # fails the n_tok >= 20 gate
    long_ok = " ".join(["the data row value line"] * 8)  # passes gates
    b1 = spark.createDataFrame(
        [(1, "en", short), (2, "en", long_ok)], "doc_id long, lang string, text string"
    )
    b2 = spark.createDataFrame(
        [(3, "en", short), (4, "en", long_ok)], "doc_id long, lang string, text string"
    )
    store.process_batch(b1)
    store.process_batch(b2)
    kept = {r["doc_id"] for r in store.kept().collect()}
    assert kept == {2}  # 1 admitted-but-filtered; 3,4 deduped away
    assert store.seen().count() == 2
