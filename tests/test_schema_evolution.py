"""Additive schema evolution on the commit layer.

The lakehouse contract (Delta/Iceberg "add column", re-expressed on the
plain-parquet commit layer): readers pass the CURRENT ddl, and because
every read is schema-by-name over explicitly-enumerated directories,

- a directory written before a nullable column existed reads as NULL
  for that column — no rewrite, no migration job;
- compaction run with the evolved ddl folds old directories INTO the
  new schema (the lazy rewrite — at 100 TB you never stop the world to
  add a column, the tiers converge as they fold);
- dropping a trailing column from the reader's ddl is plain column
  pruning (reads narrow fine);
- tombstones, snapshots, and the stats sidecars are all
  version-agnostic: masking keys by value, pinning directories by
  name, and pruning by recorded ranges don't care which schema wrote
  the directory — and a prune column that predates a directory can
  never prune it (the sidecar records only columns it verified).

Unsupported, by design and documented here: column RENAMES (a rename
is drop+add — old rows read NULL, not migrated) and TYPE changes
(parquet readers refuse; use a new column). This matches what
plain-parquet can promise without a column-id catalog.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC

V1 = "k bigint, v bigint"
V2 = "k bigint, v bigint, w string"


def _commit(spark, root, bid, rows, ddl, mode, **kw):
    BC.commit_batch(spark.createDataFrame(rows, ddl), root, bid,
                    mode=mode, **kw)


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_old_dirs_read_null_for_new_column(spark, tmp_path, mode):
    root = str(tmp_path / "s")
    _commit(spark, root, 0, [(1, 10), (2, 20)], V1, mode)
    _commit(spark, root, 1, [(3, 30, "x")], V2, mode)
    got = {(r["k"], r["v"], r["w"])
           for r in BC.read_committed(spark, root, V2, mode=mode).collect()}
    assert got == {(1, 10, None), (2, 20, None), (3, 30, "x")}
    # narrowing reader: the evolved dir reads fine with the v1 ddl
    narrow = {(r["k"], r["v"])
              for r in BC.read_committed(spark, root, V1, mode=mode).collect()}
    assert narrow == {(1, 10), (2, 20), (3, 30)}


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_compaction_folds_old_dirs_into_evolved_schema(spark, tmp_path, mode):
    root = str(tmp_path / "s")
    _commit(spark, root, 0, [(1, 10)], V1, mode)
    _commit(spark, root, 1, [(2, 20, "b")], V2, mode)
    _commit(spark, root, 2, [(3, 30, "c")], V2, mode)
    BC.compact_tiered(spark, root, V2, keep_last=1, mode=mode,
                      order_by=["k"])
    man = BC._manifest_load(root) or {}
    seg = os.path.join(root, man["segments"][0])
    # the fold physically materialized the evolved schema for old rows
    folded = spark.read.parquet(seg)
    assert set(folded.columns) == {"k", "v", "w"}
    got = {(r["k"], r["v"], r["w"])
           for r in BC.read_committed(spark, root, V2, mode=mode).collect()}
    assert got == {(1, 10, None), (2, 20, "b"), (3, 30, "c")}


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_tombstones_mask_across_schema_versions(spark, tmp_path, mode):
    root = str(tmp_path / "s")
    _commit(spark, root, 0, [(1, 10), (2, 20)], V1, mode)
    _commit(spark, root, 1, [(1, 11, "new")], V2, mode)
    BC.delete_keys(spark, root, [2], 2, key_cols="k", mode=mode)
    got = {(r["k"], r["v"], r["w"])
           for r in BC.read_committed(spark, root, V2, mode=mode).collect()}
    assert got == {(1, 10, None), (1, 11, "new")}


def test_snapshot_pinned_before_evolution_reads_either_schema(spark, tmp_path):
    root = str(tmp_path / "s")
    _commit(spark, root, 0, [(1, 10)], V1, BC.MANIFEST)
    sid = BC.create_snapshot(root, mode=BC.MANIFEST)
    _commit(spark, root, 1, [(2, 20, "z")], V2, BC.MANIFEST)
    BC.compact_tiered(spark, root, V2, keep_last=1, mode=BC.MANIFEST,
                      order_by=["k"])
    assert [tuple(r) for r in
            BC.read_snapshot(spark, root, V1, sid).collect()] == [(1, 10)]
    assert [tuple(r) for r in
            BC.read_snapshot(spark, root, V2, sid).collect()] == \
        [(1, 10, None)]


def test_prune_column_older_than_directory_never_prunes(spark, tmp_path):
    """A sidecar records only columns it verified in the footers: a dir
    written before the prune column existed has no range for it and
    must survive any prune on it."""
    root = str(tmp_path / "s")
    _commit(spark, root, 0, [(1, 10)], V1, BC.RENAME, stats_cols=["k", "w"])
    _commit(spark, root, 1, [(2, 20, "b")], V2, BC.RENAME,
            stats_cols=["k", "w"])
    d0, d1 = BC._committed_dirs(root, mode=BC.RENAME)
    assert "w" not in (BC._dir_stats(d0) or {}).get("cols", {})
    kept = BC._prune_entries(
        BC._committed_entries(root, mode=BC.RENAME), {"w": ["zzz"]}
    )
    # dir 0 survives (no w range recorded — possibly narrowed to its
    # non-empty files); dir 1 is provably out
    dirs_kept = {
        os.path.dirname(p[0]) if isinstance(p, list) else p
        for _, p, _ in kept
    }
    assert dirs_kept == {d0}


def test_type_change_is_refused_at_read(spark, tmp_path):
    root = str(tmp_path / "s")
    _commit(spark, root, 0, [(1, 10)], V1, BC.RENAME)
    bad = BC.read_committed(spark, root, "k bigint, v array<int>",
                            mode=BC.RENAME)
    with pytest.raises(Exception):  # Spark schema-merge refusal, not silence
        bad.collect()
