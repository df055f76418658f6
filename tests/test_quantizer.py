"""Quantizer lifecycle: fit monitoring, drift detection, retraining.

The scenario these tests plant is the r10 chooser's measured failure
mode: an IVF store whose quantizer was trained on yesterday's data
distribution receives today's SHIFTED data — new vectors pile into few
cells, assignment cosines drop, recall caps. The lifecycle must (a) see
it (fit_stats/detect_drift), (b) fix it (retrain_ivf_store, blue/green)
with a recorded before/after, and (c) the retrained store must actually
serve the shifted queries better at the same nprobe.
"""

from __future__ import annotations

import numpy as np
import pytest

from doreisa_spark.streaming import quantizer as Q
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore

DIM = 8


def _cluster(center, n, seed, spread=0.05):
    rng = np.random.RandomState(seed)
    return center[None, :] + spread * rng.randn(n, DIM)


def _vec_df(spark, mats, id_from=0):
    x = np.concatenate(mats)
    rows = [
        (id_from + i, [float(v) for v in x[i]]) for i in range(len(x))
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _centers(seed, scale=1.0, offset=0.0):
    rng = np.random.RandomState(seed)
    c = rng.randn(4, DIM) * scale + offset
    return c / np.linalg.norm(c, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def drift_setup(spark, tmp_path_factory):
    """An IVF store trained on distribution A, then fed distribution B
    living in a different region of the sphere."""
    root = str(tmp_path_factory.mktemp("qdrift") / "ivf")
    ca = _centers(1)
    corpus_a = _vec_df(spark, [_cluster(c, 300, 10 + i) for i, c in enumerate(ca)])
    cents = Q.train_quantizer(corpus_a, 4, iters=3)
    store = IVFVectorStore(spark, root, centroids=cents, compact_every=None)
    store.process_batch(corpus_a, 0, assign="blas")
    baseline = Q.fit_stats(store)
    cb = _centers(2, offset=3.0)  # far region: the drifted distribution
    corpus_b = _vec_df(
        spark, [_cluster(c, 300, 20 + i) for i, c in enumerate(cb)],
        id_from=10_000,
    )
    store.process_batch(corpus_b, 1, assign="blas")
    return store, baseline, corpus_b


def test_fit_stats_on_matched_quantizer(spark, drift_setup):
    _, baseline, _ = drift_setup
    assert baseline["n"] == 1200
    assert baseline["cells_used"] == 4
    assert baseline["mean_cos"] > 0.95  # tight clusters, matched quantizer
    assert baseline["max_cell_share"] < 0.35  # balanced


def test_drift_detector_fires_on_shifted_ingest(spark, drift_setup):
    store, baseline, _ = drift_setup
    current = Q.fit_stats(store)
    verdict = Q.detect_drift(baseline, current, min_n=100)
    assert verdict["drifted"] is True
    assert verdict["reasons"]  # names the tripped rule(s)
    assert current["mean_cos"] < baseline["mean_cos"] - 0.05


def test_drift_verdict_withheld_below_min_n(spark, drift_setup):
    store, baseline, _ = drift_setup
    current = Q.fit_stats(store)
    verdict = Q.detect_drift(baseline, current, min_n=10**9)
    assert verdict["drifted"] is False
    assert "withheld" in verdict["reasons"][0]


def test_retrain_recovers_fit_and_recall(spark, drift_setup, tmp_path):
    store, _, corpus_b = drift_setup
    new_root = str(tmp_path / "ivf_green")
    new, report = Q.retrain_ivf_store(
        spark, store.root, new_root, n_cells=8, iters=3
    )
    # recorded before/after: fit recovered
    assert report["after"]["mean_cos"] > report["before"]["mean_cos"] + 0.05
    assert report["after"]["max_cell_share"] < report["before"]["max_cell_share"]
    # same corpus, nothing lost in the blue/green re-index
    assert new.members().count() == store.members().count()
    # and the SHIFTED queries are served better at the same nprobe: the
    # drifted quantizer funnels distribution B into one cell, so an
    # nprobe=1 probe scans most of the store (the cost-model breakage
    # detect_drift flags); the retrained store answers at least as many
    # queries correctly while scanning a small, balanced cell
    qrows = corpus_b.limit(20).collect()
    queries = [(int(r["vec_id"]), list(r["embedding"])) for r in qrows]

    def top1(s):
        got = s.query_topk_vectors(queries, 1, nprobe=1, scoring="blas",
                                   selection="blas")
        return {int(r["qid"]): int(r["cid"]) for r in got.collect()}

    def brute(s):
        got = s.query_topk_vectors(
            queries, 1, nprobe=len(s.centroids), scoring="blas",
            selection="blas",
        )
        return {int(r["qid"]): int(r["cid"]) for r in got.collect()}

    def scanned_frac(s):
        occ = {r["cell"]: r["n_members"] for r in Q.assignment_fit(s).collect()}
        total = sum(occ.values())
        return sum(
            occ.get(s.probe_cells(emb, 1, selection="blas")[0], 0) / total
            for _, emb in queries
        ) / len(queries)

    old_hits = sum(top1(store).get(q) == c for q, c in brute(store).items())
    new_hits = sum(top1(new).get(q) == c for q, c in brute(new).items())
    assert new_hits >= old_hits
    assert scanned_frac(new) < scanned_frac(store) / 3


def test_train_quantizer_is_deterministic(spark):
    corpus = _vec_df(
        spark, [_cluster(c, 50, 40 + i) for i, c in enumerate(_centers(3))]
    )
    a = Q.train_quantizer(corpus, 3, iters=2)
    b = Q.train_quantizer(corpus, 3, iters=2)
    assert a == b
    assert [c for c, _ in a] == [0, 1, 2]  # packed ids


def test_train_quantizer_drops_empty_cells(spark):
    # two tight far-apart clusters, ask for 3 cells: Lloyd collapses one
    c = np.zeros((2, DIM))
    c[0, 0] = 1.0
    c[1, 1] = 1.0
    corpus = _vec_df(spark, [_cluster(c[0], 60, 50, 0.01),
                             _cluster(c[1], 60, 51, 0.01)])
    cents = Q.train_quantizer(corpus, 3, iters=4)
    assert 1 <= len(cents) <= 3
    assert [i for i, _ in cents] == list(range(len(cents)))
    # always a valid quantizer for the store
    IVFVectorStore(spark, "/tmp/_qv_unused_%d" % id(cents), centroids=cents,
                   fenced=False)


def test_retrain_reads_one_consistent_pinned_state(spark, tmp_path, monkeypatch):
    """Retraining pins ONE snapshot for fit + training + migration: a
    batch ingested into the blue store mid-retrain must not leak into
    the green store (without the pin, each Spark action re-enumerates
    the live log and the migration could copy a different corpus than
    the quantizer was trained on). The pin is released on exit."""
    from doreisa_spark.streaming import batch_commit as BC

    root = str(tmp_path / "blue")
    corpus_a = _vec_df(spark, [_cluster(c, 100, 60 + i)
                               for i, c in enumerate(_centers(4))])
    corpus_b = _vec_df(spark, [_cluster(c, 100, 70 + i)
                               for i, c in enumerate(_centers(5))],
                       id_from=50_000)
    cents = Q.train_quantizer(corpus_a, 4, iters=1)
    store = IVFVectorStore(spark, root, centroids=cents, compact_every=None)
    store.process_batch(corpus_a, 0, assign="blas")

    orig_train = Q.train_quantizer

    def train_then_concurrent_ingest(vectors, n_cells, **kw):
        out = orig_train(vectors, n_cells, **kw)
        store.process_batch(corpus_b, 1, assign="blas")  # mid-retrain
        return out

    monkeypatch.setattr(Q, "train_quantizer", train_then_concurrent_ingest)
    new, report = Q.retrain_ivf_store(
        spark, root, str(tmp_path / "green"), n_cells=4, iters=1
    )
    assert new.members().count() == 400        # the pinned state only
    assert store.members().count() == 800      # blue kept ingesting
    assert report["before"]["n"] == 400
    assert BC.list_snapshots(store._members) == {}  # pin released
