"""Blue/green alias flip (r11 verdict ask #1): the named-alias CAS
flip with fencing across the flip, completing retrain_ivf_store's
hand-off story.

Pinned properties:

- a reader resolving the alias observes the BLUE store until the flip
  and the GREEN store after it (the alias replace is atomic);
- the flip fences the blue members log: the live blue writer's next
  commit raises StaleWriterError instead of landing a write readers
  can no longer see;
- a crash between the migration and the flip leaves the alias on blue
  (the green root is unreferenced — retry or delete);
- the flip is a CAS: a stale expect_root (concurrent flip won) raises
  AliasConflictError and changes nothing;
- bind_alias refuses to silently re-point an existing alias.
"""

from __future__ import annotations

import pytest

from doreisa_spark.streaming import alias as AL
from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming import quantizer as Q
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore

CENTS_BLUE = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]


def _vectors(spark, n=60):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i in range(n):
        base = [1.0, 0.0, 0.0] if i % 2 else [0.0, 1.0, 0.0]
        v = (np.array(base) + 0.1 * rng.standard_normal(3)).tolist()
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _blue(spark, tmp_path):
    root = str(tmp_path / "blue")
    store = IVFVectorStore(spark, root, centroids=CENTS_BLUE,
                           commit_mode=BC.MANIFEST)
    store.process_batch(_vectors(spark), 0)
    return store


def test_reader_blue_until_flip_green_after(spark, tmp_path):
    blue = _blue(spark, tmp_path)
    aroot = str(tmp_path / "aliases")
    assert AL.bind_alias(aroot, "prod", blue.root) == 0
    # reader before the flip: resolves blue, serves blue's quantizer
    reader = IVFVectorStore.from_alias(spark, aroot, "prod")
    assert reader.root == blue.root
    assert len(reader.centroids) == 2
    n_before = reader.members().count()

    green_root = str(tmp_path / "green")
    new, report = Q.retrain_ivf_store(
        spark, blue.root, green_root, n_cells=3, iters=1,
        alias_root=aroot, alias="prod",
    )
    assert report["alias"] == {"name": "prod", "epoch": 1,
                               "from": blue.root, "to": green_root}
    # reader after the flip: resolves green, same corpus, new quantizer
    reader2 = IVFVectorStore.from_alias(spark, aroot, "prod")
    assert reader2.root == green_root
    assert len(reader2.centroids) == len(new.centroids)
    assert reader2.members().count() == n_before
    # history records the superseded blue root
    ent = AL.read_alias(aroot, "prod")
    assert ent["epoch"] == 1
    assert ent["history"] == [{"root": blue.root, "epoch": 0}]


def test_blue_writer_fenced_by_flip(spark, tmp_path):
    blue = _blue(spark, tmp_path)  # fenced live writer (manifest mode)
    assert blue._epoch is not None
    aroot = str(tmp_path / "aliases")
    AL.bind_alias(aroot, "prod", blue.root)
    Q.retrain_ivf_store(spark, blue.root, str(tmp_path / "green"),
                        n_cells=2, iters=1, alias_root=aroot, alias="prod")
    # the flip fenced the blue members log: the live writer is a zombie
    with pytest.raises(BC.StaleWriterError):
        blue.process_batch(_vectors(spark, 4), 1)
    # green (resolved via the alias) ingests fine
    green = IVFVectorStore.from_alias(spark, aroot, "prod", fenced=True)
    green.process_batch(_vectors(spark, 4), 1)
    assert green.members().count() == 60 + 4


def test_crash_between_migrate_and_flip_leaves_blue(spark, tmp_path, monkeypatch):
    blue = _blue(spark, tmp_path)
    aroot = str(tmp_path / "aliases")
    AL.bind_alias(aroot, "prod", blue.root)

    # crash AFTER the green store committed, BEFORE the flip: the
    # after-fit (computed pre-flip by design) dies
    real_fit = Q.fit_stats
    calls = {"n": 0}

    def crashing_fit(store, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # the post-migration fit
            raise RuntimeError("simulated crash before flip")
        return real_fit(store, **kw)

    monkeypatch.setattr(Q, "fit_stats", crashing_fit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        Q.retrain_ivf_store(spark, blue.root, str(tmp_path / "green"),
                            n_cells=2, iters=1,
                            alias_root=aroot, alias="prod")
    monkeypatch.setattr(Q, "fit_stats", real_fit)
    # alias (and every reader) still on blue; blue writer NOT fenced
    assert AL.resolve(aroot, "prod") == blue.root
    assert AL.read_alias(aroot, "prod")["epoch"] == 0
    blue.process_batch(_vectors(spark, 2), 1)  # still the live writer
    # recovery: retry the whole retrain — the flip lands this time
    Q.retrain_ivf_store(spark, blue.root, str(tmp_path / "green2"),
                        n_cells=2, iters=1, alias_root=aroot, alias="prod")
    assert AL.resolve(aroot, "prod") == str(tmp_path / "green2")


def test_flip_is_cas(spark, tmp_path):
    blue = _blue(spark, tmp_path)
    aroot = str(tmp_path / "aliases")
    AL.bind_alias(aroot, "prod", blue.root)
    g1, g2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    assert AL.flip_alias(aroot, "prod", g1, expect_root=blue.root) == 1
    # a second retrain that still believes blue is live loses the race
    with pytest.raises(AL.AliasConflictError):
        AL.flip_alias(aroot, "prod", g2, expect_root=blue.root)
    assert AL.resolve(aroot, "prod") == g1
    # idempotent re-flip to the current root is a no-op
    assert AL.flip_alias(aroot, "prod", g1, expect_root=g1) == 1
    # unknown alias
    with pytest.raises(KeyError):
        AL.flip_alias(aroot, "nope", g2)


def test_concurrent_readers_never_see_torn_alias(tmp_path):
    """A tight resolve loop racing many flips observes a MONOTONE
    sequence of roots — each flip's atomic replace means a reader sees
    the previous root or the next, never an error or a third value."""
    import threading

    aroot = str(tmp_path / "aliases")
    roots = [f"/store/gen{i}" for i in range(40)]
    AL.bind_alias(aroot, "prod", roots[0])
    seen: list[str] = []
    stop = threading.Event()
    errs: list[Exception] = []

    def reader():
        while not stop.is_set():
            try:
                seen.append(AL.resolve(aroot, "prod"))
            except Exception as e:  # noqa: BLE001 — any error is a failure
                errs.append(e)
                return

    t = threading.Thread(target=reader)
    t.start()
    try:
        for prev, nxt in zip(roots, roots[1:]):
            assert AL.flip_alias(aroot, "prod", nxt, expect_root=prev) >= 1
    finally:
        stop.set()
        t.join()
    assert not errs, f"reader errored mid-flip: {errs[:1]}"
    assert seen, "reader never resolved"
    # monotone: the sequence of distinct roots seen is a subsequence of
    # the flip order — no tearing, no rollback, no third value
    order = {r: i for i, r in enumerate(roots)}
    idxs = [order[r] for r in seen]
    assert all(a <= b for a, b in zip(idxs, idxs[1:])), "non-monotone reads"
    assert set(seen) <= set(roots)


def test_dedup_reband_flip_fences_all_sublogs(spark, tmp_path):
    """The dedup store's re-band migration completes its hand-off the
    same way: alias flips to the green root, and the blue writer is
    fenced on EVERY sub-log (members/shingles/pairs)."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_dedup import PrunedLSHSignatureStore
    from doreisa_spark.streaming.migrate import migrate_lsh_signature_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    blue = PrunedLSHSignatureStore(spark, str(tmp_path / "blue"),
                                   commit_mode=BC.MANIFEST)
    blue.process_batch(docs.where(F.col("doc_id") < 150), 0)
    aroot = str(tmp_path / "aliases")
    AL.bind_alias(aroot, "dedup", blue.root)
    new = migrate_lsh_signature_store(
        spark, blue.root, str(tmp_path / "green"), n_bands=4, band_rows=3,
        alias_root=aroot, alias="dedup",
    )
    assert AL.resolve(aroot, "dedup") == new.root
    reader = PrunedLSHSignatureStore.from_alias(spark, aroot, "dedup")
    assert reader.root == new.root and reader.n_bands == 4
    # the blue writer is a zombie on every sub-log
    with pytest.raises(BC.StaleWriterError):
        blue.process_batch(docs.where(F.col("doc_id") >= 150), 1)
    with pytest.raises(BC.StaleWriterError):
        blue.delete_docs([1])


def test_bind_alias_refuses_silent_repoint(tmp_path):
    aroot = str(tmp_path / "aliases")
    AL.bind_alias(aroot, "prod", "/a")
    assert AL.bind_alias(aroot, "prod", "/a") == 0  # same-root no-op
    with pytest.raises(AL.AliasConflictError, match="flip_alias"):
        AL.bind_alias(aroot, "prod", "/b")
    assert AL.list_aliases(aroot)["prod"]["root"] == "/a"
