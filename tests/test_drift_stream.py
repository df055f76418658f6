"""In-stream quantizer drift monitoring (r11 verdict ask #2): the IVF
store runs fit_stats + detect_drift on its own compaction cadence and
surfaces the verdict through a callback — drifted ingest trips the
detector MID-STREAM with no manual polling loop, and the train-time
fit baseline round-trips the write-once ``_centroids.json`` marker.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from doreisa_spark.streaming import quantizer as Q
from doreisa_spark.streaming.incremental_ivf import IVFVectorStore, run_incremental_ivf

CENTS = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])]


def _aligned(spark, lo, n):
    """Vectors sitting tightly in the two quantizer cells."""
    rng = np.random.default_rng(lo)
    rows = []
    for i in range(lo, lo + n):
        base = np.array([1.0, 0.0, 0.0] if i % 2 else [0.0, 1.0, 0.0])
        v = base + 0.05 * rng.standard_normal(3)
        rows.append((i, [float(x) for x in v], 0))
    return rows


def _drifted(spark, lo, n):
    """A new mode far from both centroids (cos ~0.577 to the nearest)."""
    rng = np.random.default_rng(lo)
    base = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    return [
        (i, [float(x) for x in base + 0.05 * rng.standard_normal(3)], 1)
        for i in range(lo, lo + n)
    ]


DDL = "vec_id bigint, embedding array<float>, label int"


def _write_file(spark, src, name, rows):
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, name)
    )
    # file-source streams list FILES: move the parquet up as one file
    import glob
    import shutil

    part = glob.glob(os.path.join(src, name, "*.parquet"))[0]
    shutil.move(part, os.path.join(src, f"{name}.parquet"))
    shutil.rmtree(os.path.join(src, name))


# ------------------------------------------------- baseline round-trip


def test_fit_baseline_roundtrips_marker(spark, tmp_path):
    root = str(tmp_path / "ivf")
    store = IVFVectorStore(spark, root, centroids=CENTS)
    store.process_batch(spark.createDataFrame(_aligned(spark, 0, 40), DDL), 0)
    assert store.fit_baseline is None
    base = Q.fit_stats(store)
    store.record_fit_baseline(base)
    # a FRESH handle reads the same baseline back from the marker
    again = IVFVectorStore(spark, root)
    assert again.fit_baseline == base
    assert again.centroids == [(c, list(map(float, e))) for c, e in CENTS]
    # idempotent same-record ok; moving the goalposts raises
    again.record_fit_baseline(base)
    with pytest.raises(ValueError, match="already records a fit baseline"):
        again.record_fit_baseline({**base, "mean_cos": 0.1})


def test_legacy_list_marker_still_reads(spark, tmp_path):
    """Pre-r12 markers were a bare centroid list: they must keep
    opening (baseline None) and accept a first baseline record."""
    root = str(tmp_path / "ivf")
    os.makedirs(root)
    with open(os.path.join(root, "_centroids.json"), "w") as f:
        json.dump(CENTS, f)
    store = IVFVectorStore(spark, root)
    assert store.centroids == [(c, list(map(float, e))) for c, e in CENTS]
    assert store.fit_baseline is None
    store.record_fit_baseline({"n": 1, "mean_cos": 0.9})
    assert IVFVectorStore(spark, root).fit_baseline["mean_cos"] == 0.9


# ------------------------------------------- drift trips mid-stream


def test_drift_trips_mid_stream_without_polling(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    root = str(tmp_path / "ivf")

    # train-time baseline from an identically-distributed scratch fit
    scratch = IVFVectorStore(spark, str(tmp_path / "scratch"), centroids=CENTS)
    scratch.process_batch(spark.createDataFrame(_aligned(spark, 0, 40), DDL), 0)
    baseline = Q.fit_stats(scratch)

    store = IVFVectorStore(spark, root, centroids=CENTS)
    store.record_fit_baseline(baseline)

    # stream: 4 aligned files, then 6 drifted ones (1 file per trigger)
    for i in range(4):
        _write_file(spark, src, f"a{i:02d}", _aligned(spark, 1000 + i * 20, 20))
    for i in range(6):
        _write_file(spark, src, f"b{i:02d}", _drifted(spark, 2000 + i * 20, 20))

    verdicts: list[dict] = []
    run_incremental_ivf(
        spark, src, root,
        centroids=CENTS, queries=[(90_000, [1.0, 0.0, 0.0])], k=3,
        compact_every=2,
        on_drift=verdicts.append,
        drift_opts={"min_n": 10, "max_cos_drop": 0.05},
    )
    # the monitor ran on the compaction cadence, inside the stream
    assert len(verdicts) >= 3
    assert all("batch_id" in v for v in verdicts)
    # aligned-only prefix: no drift; drifted ingest trips it mid-stream
    assert verdicts[0]["drifted"] is False
    tripped = [v for v in verdicts if v["drifted"]]
    assert tripped, f"drift never tripped: {verdicts}"
    assert any("cosine dropped" in r for v in tripped for r in v["reasons"])
    # the verdict carries both fits for the monitoring log
    assert tripped[-1]["baseline"]["mean_cos"] == baseline["mean_cos"]
    assert tripped[-1]["current"]["mean_cos"] < baseline["mean_cos"] - 0.05


def test_sampled_fit_estimates_full_fit(spark, tmp_path):
    """A 1-in-N hash-sampled fit is a deterministic, unbiased estimate
    of the full fit's ratio statistics — the big-store monitoring
    knob (drift_sample_mod)."""
    store = IVFVectorStore(spark, str(tmp_path / "ivf"), centroids=CENTS)
    rows = _aligned(spark, 0, 4000) + _drifted(spark, 10_000, 2000)
    store.process_batch(spark.createDataFrame(rows, DDL), 0)
    full = Q.fit_stats(store)
    samp = Q.fit_stats(store, sample_mod=8)
    # deterministic: same sample every run
    assert samp == Q.fit_stats(store, sample_mod=8)
    # ~1/8 of the members, binomial tolerance
    assert 0.6 * full["n"] / 8 < samp["n"] < 1.4 * full["n"] / 8
    # the ratios drift detection compares track the full fit
    assert abs(samp["mean_cos"] - full["mean_cos"]) < 0.02
    assert abs(samp["max_cell_share"] - full["max_cell_share"]) < 0.08
    # sample_mod=1 / None are the exact full fit
    assert Q.fit_stats(store, sample_mod=1) == full


def test_occupancy_rule_has_sampling_count_floor():
    """On a big quantizer, a sampled fit's top-cell share is a MAX
    statistic — ~Poisson noise alone puts it far above the balanced
    share. The occupancy rule must not fire on counts below
    min_top_n; true skew clears the floor by orders of magnitude."""
    base = {"mean_cos": 0.9}
    # balanced 65k-cell store, 1-in-N sample of 10k members: the top
    # sampled cell holds ~5 members by chance (share 5e-4 >> balanced
    # 1.5e-5 * 4) — pre-floor code declared this healthy store drifted
    noise = {"n": 10_000, "cells_total": 65_536, "cells_used": 9_000,
             "mean_cos": 0.9, "min_cos": 0.5,
             "max_cell_share": 5 / 10_000, "max_cell_n": 5,
             "empty_cell_frac": 0.86}
    assert Q.detect_drift(base, noise)["drifted"] is False
    # genuine skew: a top cell holding 25% of the corpus samples
    # thousands of members — fires
    skew = {**noise, "max_cell_share": 0.25, "max_cell_n": 2_500}
    v = Q.detect_drift(base, skew)
    assert v["drifted"] and "top cell" in v["reasons"][0]
    # a pre-r12 recorded fit (no max_cell_n) keeps the old behavior
    legacy = {k: x for k, x in noise.items() if k != "max_cell_n"}
    assert Q.detect_drift(base, legacy)["drifted"] is True


def test_migrations_validate_alias_args_at_entry(spark, tmp_path):
    """A half-given alias pair must fail BEFORE any re-index work —
    not after the corpus-scale migration has already run."""
    from doreisa_spark.streaming.migrate import migrate_ivf_store

    with pytest.raises(ValueError, match="together"):
        migrate_ivf_store(spark, str(tmp_path / "none"), str(tmp_path / "g"),
                          centroids=CENTS, alias_root=str(tmp_path / "a"))
    with pytest.raises(ValueError, match="together"):
        Q.retrain_ivf_store(spark, str(tmp_path / "none"),
                            str(tmp_path / "g"), alias="prod")


def test_drift_every_thins_the_cadence(spark, tmp_path):
    """drift_every=N runs the (full-members-scan) check only on every
    Nth compaction — the cost knob for tight compaction cadences."""
    root = str(tmp_path / "ivf")
    scratch = IVFVectorStore(spark, str(tmp_path / "scratch"), centroids=CENTS)
    scratch.process_batch(spark.createDataFrame(_aligned(spark, 0, 40), DDL), 0)
    baseline = Q.fit_stats(scratch)

    verdicts: list[dict] = []
    store = IVFVectorStore(spark, root, centroids=CENTS, compact_every=2,
                           on_drift=verdicts.append,
                           drift_opts={"min_n": 5}, drift_every=2)
    store.record_fit_baseline(baseline)
    for b in range(8):  # compactions at batches 1,3,5,7 -> checks at 3,7
        store.process_batch(
            spark.createDataFrame(_aligned(spark, 3000 + b * 20, 20), DDL), b
        )
    assert [v["batch_id"] for v in verdicts] == [3, 7]
    with pytest.raises(ValueError, match="drift_every"):
        IVFVectorStore(spark, root, drift_every=0)
