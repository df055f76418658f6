"""Regression tests for the round-11 ADVICE findings.

Each test pins one previously-latent defect in the commit layer /
quantizer lifecycle:

- ``retire_tombstones`` computed the live index BEFORE its critical
  section and stamped the cache with a freshly scanned ``seen_max``:
  a tombstone committed by a concurrent ``delete_keys`` in that window
  became invisible to every future heal, and the all-retired SEAL
  branch burned its id and GC'd its rows — a silently, permanently
  lost takedown. The decision now runs inside one parent-store
  critical section, ``seen_max`` claims only the tids the index
  represents, and the seal preserves batch entries above the
  retirement watermark.
- the fenced ``delete_keys`` raised ``StaleWriterError`` from the
  post-commit compaction trigger — AFTER the tombstone had durably
  committed, so the caller saw "delete failed" for a delete that
  succeeded. A superseded writer now skips the maintenance fold and
  returns the true commit outcome.
- ``train_quantizer``'s member mean can cancel to a zero-norm centroid
  (antipodal members), which the store constructor then rejects —
  ``retrain_ivf_store`` crashed despite the "always a valid quantizer"
  docstring. Zero-norm means are now dropped like empty cells.
- the ``delete_keys`` monotonicity precheck resolved the tombstone
  sub-log's committed ids with the PARENT's resolved mode instead of
  the sub-log's own recorded manifest mode (``_tomb_index``'s rule):
  with diverging modes, ``top_tid`` came from the wrong namespace and
  an out-of-order tid could slip the guard.
"""

from __future__ import annotations

import json
import os

import pytest

from doreisa_spark.streaming import batch_commit as BC

DDL = "k bigint, v string"


def _commit(spark, root, b, rows, mode):
    BC.commit_batch(spark.createDataFrame(rows, DDL).coalesce(1), root, b, mode=mode)


def _keys(spark, root, mode):
    return sorted(
        r["k"] for r in BC.read_committed(spark, root, DDL, mode=mode).collect()
    )


# --------------------------------------- retire_tombstones TOCTOU (medium)


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_retirement_preserves_concurrent_delete(spark, tmp_path, mode, monkeypatch):
    """A delete_keys landing between retirement's index read and its
    cache rewrite / seal must stay effective: its rows survive GC, its
    id stays committed, and its masking heals on the next read. The
    old code's seal scanned a fresh ``top`` — the concurrent tombstone
    ended up <= the sealed horizon with its rows reclaimed (takedown
    silently lost) and <= the cache's seen_max (never healed)."""
    root = str(tmp_path / "log")
    for b in range(3):
        _commit(spark, root, b, [(b * 10 + 1, "x"), (b * 10 + 2, "x")], mode)
    assert BC.delete_keys(spark, root, [1], 3, key_cols="k", mode=mode)
    # the stream moves past the delete so the fold can retire it
    _commit(spark, root, 4, [(40, "x")], mode)

    # inject the racing delete inside retirement's critical section,
    # via the cache-rewrite hook (_json_replace on the index file) —
    # an unfenced delete takes no parent lock, so this interleaving is
    # reachable in production exactly here
    real_replace = BC._json_replace
    fired = {"n": 0}

    def racing_replace(path, obj):
        if path.endswith(BC._TOMB_INDEX) and fired["n"] == 0:
            fired["n"] = 1
            assert BC.delete_keys(spark, root, [2], 5, key_cols="k", mode=mode)
        real_replace(path, obj)

    monkeypatch.setattr(BC, "_json_replace", racing_replace)
    # compact applies tid 3 everywhere and triggers retirement; the
    # racing delete (tid 5) lands mid-retirement
    assert BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    monkeypatch.setattr(BC, "_json_replace", real_replace)
    assert fired["n"] == 1

    troot = BC._tomb_root(root)
    # the concurrent tombstone's id must still be committed (a
    # redelivery of tid 5 must refuse, but the ID must not be burned
    # as "already applied")
    assert BC.is_committed(troot, 5, mode=BC._mode_of(troot, None))
    # and its masking must hold on reads (heals past the rewritten
    # cache because seen_max no longer claims the fresh top)
    assert _keys(spark, root, mode) == [11, 12, 21, 22, 40]
    # the tombstone index heals tid 5 as live
    assert 5 in BC._tomb_index(root, mode=mode)
    # retirement itself did happen for tid 3
    assert BC._tomb_retired_max(root) >= 3


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_retirement_seal_still_converges(spark, tmp_path, mode):
    """Sanity alongside the fix: with no concurrent writer the seal
    still converges the sub-log to the zero-anti-join steady state and
    still refuses a redelivered delete id."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x")], mode)
    _commit(spark, root, 1, [(3, "x")], mode)
    assert BC.delete_keys(spark, root, [1], 2, key_cols="k", mode=mode)
    _commit(spark, root, 3, [(4, "x")], mode)
    assert BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    assert BC._tomb_index(root, mode=mode) == {}
    # redelivered delete id: still refused (no-op, not a new tombstone)
    assert not BC.delete_keys(spark, root, [2], 2, key_cols="k", mode=mode)
    assert _keys(spark, root, mode) == [2, 3, 4]


# --------------------------- fenced delete: no raise after durable commit


def test_fenced_delete_stale_after_commit_returns_committed(
    spark, tmp_path, monkeypatch
):
    """If the writer is superseded AFTER the tombstone batch durably
    committed but before the sub-log compaction trigger, delete_keys
    must return True (the delete succeeded), not raise
    StaleWriterError — and must skip the maintenance fold."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x")], BC.MANIFEST)
    epoch = BC.acquire_writer(root, mode=BC.MANIFEST)
    # make the very next delete trip the compaction threshold
    monkeypatch.setattr(BC, "_TOMB_COMPACT_EVERY", 1)

    real_commit = BC._commit_manifest

    def commit_then_supersede(df, r, b, **kw):
        out = real_commit(df, r, b, **kw)
        # a newer writer lands right after the publish
        if out:
            BC.acquire_writer(root, mode=BC.MANIFEST)
        return out

    monkeypatch.setattr(BC, "_commit_manifest", commit_then_supersede)
    assert BC.delete_keys(
        spark, root, [1], 1, key_cols="k", mode=BC.MANIFEST, epoch=epoch
    ) is True
    # the delete is effective ...
    assert _keys(spark, root, BC.MANIFEST) == [2]
    # ... and the superseded writer did NOT run the sub-log fold
    troot = BC._tomb_root(root)
    assert not (BC._manifest_load(troot) or {}).get("segments", [])
    # a genuinely-failed (pre-commit) stale delete still raises
    with pytest.raises(BC.StaleWriterError):
        BC.delete_keys(spark, root, [2], 2, key_cols="k",
                       mode=BC.MANIFEST, epoch=epoch)


# ------------------------------------ train_quantizer zero-norm centroid


def test_train_quantizer_drops_cancelling_cell(spark):
    """Antipodal members whose mean cancels to zero norm must not
    produce a centroid the store constructor rejects."""
    from doreisa_spark.streaming.incremental_ivf import IVFVectorStore
    from doreisa_spark.streaming.quantizer import train_quantizer

    rows = [
        (0, [1.0, 0.0]), (1, [-1.0, 0.0]),      # cancel exactly
        (2, [0.0, 1.0]), (3, [0.0, 1.0]),
        (4, [0.1, 0.9]), (5, [-0.1, 0.9]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = train_quantizer(vecs, 2, iters=2)
    assert cents, "quantizer must not be empty"
    for _, emb in cents:
        assert any(x != 0.0 for x in emb), "zero-norm centroid survived"
    # ids re-packed 0..k-1 and the store accepts the quantizer
    assert [c for c, _ in cents] == list(range(len(cents)))
    IVFVectorStore(spark, f"/tmp/_advq_{os.getpid()}", centroids=cents,
                   fenced=False)


def test_train_quantizer_all_cancel_keeps_previous(spark):
    """If EVERY mean cancels, the previous (seed) centroids survive
    rather than the quantizer collapsing to nothing."""
    from doreisa_spark.streaming.quantizer import train_quantizer

    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = train_quantizer(vecs, 1, iters=3)
    assert len(cents) == 1
    assert any(x != 0.0 for x in cents[0][1])


# ------------------------- monotonicity precheck: sub-log mode namespace


def test_delete_monotonicity_uses_sublog_recorded_mode(spark, tmp_path):
    """The precheck must read committed delete ids in the SUB-LOG's
    namespace. Parent resolves rename (no manifest), but the sub-log
    carries a manifest-mode log with committed id 5: a fresh lower id
    must be refused even though the parent-mode scan of the sub-log
    sees no b-dirs."""
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x"), (2, "x")], BC.RENAME)
    # the sub-log records MANIFEST mode at its first delete
    assert BC.delete_keys(spark, root, [1], 5, key_cols="k", mode=BC.MANIFEST)
    troot = BC._tomb_root(root)
    assert (BC._manifest_load(troot) or {}).get("mode") == BC.MANIFEST
    # parent mode resolution stays rename
    assert BC._mode_of(root, None) == BC.RENAME
    # a fresh out-of-order tid in the parent's (rename) namespace used
    # to slip the guard — the sub-log's manifest namespace must win
    with pytest.raises(ValueError, match="not monotone"):
        BC.delete_keys(spark, root, [2], 3, key_cols="k")
    # redelivery of the committed id still no-ops instead of raising
    assert BC.delete_keys(spark, root, [1], 5, key_cols="k",
                          mode=BC.MANIFEST) is False
    # a VALID new delete under the parent's (rename) resolution must
    # also COMMIT in the sub-log's namespace — committing a bare b-dir
    # the manifest readers never consult would report success while
    # masking nothing (r12 review finding). Key 1 stays visible: its
    # forced-mode delete computed covers in the wrong PARENT namespace
    # (-1), which is the caller-misconfiguration this test constructs;
    # key 2's properly-resolved delete must mask.
    assert BC.delete_keys(spark, root, [2], 6, key_cols="k") is True
    assert _keys(spark, root, BC.RENAME) == [1]
    assert 6 in BC._tomb_index(root)
