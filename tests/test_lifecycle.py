"""Cache-lifecycle + reliable-checkpoint contracts (r5 verdict items 5+6).

- cache_scope: repeated registry invocations inside a scope return
  executor storage to the pre-scope baseline on exit (the JVM
  persistent-RDD map is the ground truth).
- reliable checkpoint: the lifecycle conf switches boolean_select and
  dedup_components from localCheckpoint to reliable .checkpoint() with
  identical results, and fails loudly without a checkpoint dir.
"""

from __future__ import annotations

import numpy as np
import pytest

from doreisa_spark import lifecycle
from doreisa_spark.plans.chunked import ChunkedArray
from doreisa_spark.queries import dedup

SF_SMALL = "/root/testdata/sf0.001"


def _cached_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())


def test_cache_scope_releases_registry_caches(spark):
    """Asserted on cached-RDD IDENTITY, not count: the async
    ContextCleaner may concurrently reclaim caches other suite tests left
    behind, so counts can drift downward mid-scope — what the contract
    guarantees is that no cache CREATED inside the scope survives it.
    Starts from a cleared cache: if an earlier (unscoped) test cached the
    same dedup plan, the CacheManager would REUSE that entry ("Asked to
    cache already cached data") and no new id would appear in-scope."""
    spark.catalog.clearCache()
    baseline = _cached_ids(spark)
    with lifecycle.cache_scope():
        for _ in range(3):
            assert dedup.dedup_minhash_lsh(spark, SF_SMALL).count() > 0
        assert _cached_ids(spark) - baseline  # cache live inside the scope
    assert not _cached_ids(spark) - baseline  # and released on exit


def test_cache_scope_nests(spark):
    """Each scope releases exactly its own caches. (Checkpoint-free
    workloads only: localCheckpoint blocks are ContextCleaner-managed,
    not scope-managed, so they'd make the set nondeterministic.)"""
    spark.catalog.clearCache()  # see test above: plan-cache reuse
    baseline = _cached_ids(spark)
    with lifecycle.cache_scope():
        dedup.dedup_minhash_lsh(spark, SF_SMALL).count()
        outer = _cached_ids(spark)
        with lifecycle.cache_scope():
            df = lifecycle.scoped_persist(spark.range(1234).selectExpr("id * 3 AS x"))
            df.count()
            assert _cached_ids(spark) - outer
        assert not _cached_ids(spark) - outer  # inner scope released its own
    assert not _cached_ids(spark) - baseline


def test_unscoped_persist_keeps_one_shot_behavior(spark):
    """Without a scope the cache persists (the one-shot driver contract);
    explicit unpersist still works."""
    df = lifecycle.scoped_persist(
        spark.range(100).selectExpr("id", "id * 2 AS dbl")
    )
    try:
        df.count()
        assert df.storageLevel.useMemory
    finally:
        df.unpersist()


def _bsel(spark):
    chunks = {
        (0,): np.arange(6, dtype=np.float64),
        (1,): np.arange(6, 12, dtype=np.float64),
    }
    arr = ChunkedArray.from_numpy_chunks(spark, "ckparr", chunks)
    mask = ChunkedArray.from_numpy_chunks(
        spark,
        "ckpmask",
        {
            (0,): np.array([1, 0, 1, 0, 1, 0], dtype=np.float64),
            (1,): np.array([0, 1, 0, 1, 0, 1], dtype=np.float64),
        },
    )
    return arr.boolean_select(mask).to_numpy()


def test_reliable_checkpoint_mode(spark, tmp_path):
    expect_bsel = _bsel(spark)  # default local-checkpoint mode
    expect_comp = {
        (r["doc_id"], r["component"], r["keep"])
        for r in dedup.dedup_components(spark, SF_SMALL).collect()
    }
    spark.conf.set(lifecycle.RELIABLE_CHECKPOINT_CONF, "true")
    try:
        if spark.sparkContext.getCheckpointDir() is None:
            with pytest.raises(ValueError, match="setCheckpointDir"):
                _bsel(spark)
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        assert np.array_equal(_bsel(spark), expect_bsel)
        got_comp = {
            (r["doc_id"], r["component"], r["keep"])
            for r in dedup.dedup_components(spark, SF_SMALL).collect()
        }
        assert got_comp == expect_comp
        ckpt_files = list((tmp_path / "ckpt").rglob("*"))
        assert ckpt_files, "reliable mode must write to the checkpoint dir"
    finally:
        spark.conf.set(lifecycle.RELIABLE_CHECKPOINT_CONF, "false")
