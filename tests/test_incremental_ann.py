"""Streaming-incremental sign-LSH ANN index ≡ the batch oracle.

Vectors stream in as three parquet files through readStream +
foreachBatch; querying the accumulated store must equal `sim_ann_lsh`
(DuckDB-gated) row for row — in a SHUFFLED arrival order, proving the
stateless-bucketing claim that order cannot matter."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doreisa_spark.queries.similarity import _N_QUERIES, _TOP_K, sim_ann_lsh
from doreisa_spark.streaming.incremental_ann import (
    LSHVectorStore,
    run_incremental_ann,
)

SF_SMALL = "/root/testdata/sf0.001"


def _rows(df):
    return {(r["qid"], r["cid"], r["cos_sim"], r["rk"]) for r in df.collect()}


@pytest.fixture()
def vec_stream_dir(spark, tmp_path):
    """Embeddings split into 3 files by vec_id MODULO (interleaved — a
    deliberately non-monotone arrival order)."""
    src = tmp_path / "vecs_in"
    src.mkdir()
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    for i in range(3):
        part = e.where(F.col("vec_id") % 3 == i)
        tmp = src / f"tmp{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = str(src / f"{i:05d}.parquet")
        os.rename(str(tmp / data), dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)
    return str(src)


def test_stream_index_equals_batch(spark, tmp_path, vec_stream_dir):
    got = run_incremental_ann(
        spark, vec_stream_dir, str(tmp_path / "store"),
        query_ids_below=_N_QUERIES, k=_TOP_K,
    )
    expect = sim_ann_lsh(spark, SF_SMALL)
    assert _rows(got) == _rows(expect)
    # the store retains every vector exactly once
    store = LSHVectorStore(spark, str(tmp_path / "store"))
    n = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert store.members().count() == n
    assert store.members().select("vec_id").distinct().count() == n
