"""Quantizer lifecycle for the persisted IVF store: fit monitoring,
drift detection, and blue/green retraining.

The r10 store-chooser measurements (RECALL_r10.md / BASELINE.md) found
the failure mode this module exists for: an IVF coarse quantizer whose
centroids do not fit the corpus CAPS recall — no nprobe buys it back
below the ceiling (the stride-4096 mis-fit quantizer plateaued at
recall@5 = 0.875 while the matched one reached 1.0) — whereas sign-LSH
degrades gracefully because it has no trained state. IVF's measured
latency-at-recall win is therefore CONDITIONAL on quantizer fit, and a
streaming deployment needs the three pieces the store itself
deliberately refuses to do in place (the write-once ``_centroids.json``
marker forbids mixing two quantizers in one inverted file):

1. **fit monitoring** (``assignment_fit`` / ``fit_stats``): how well do
   the live members sit in their cells? One JVM aggregation over the
   members log — per-cell occupancy plus the cosine of each member to
   its OWN stored centroid (the assignment already persisted at ingest,
   so no re-assignment work);
2. **a drift rule** (``detect_drift``): compare today's fit against the
   fit recorded at train time — mean assignment cosine dropping, or new
   data piling into few cells (occupancy skew), is exactly what turns
   the probe's ``nprobe/cells`` cost model into a lie and caps recall;
3. **retraining** (``train_quantizer`` + ``retrain_ivf_store``):
   deterministic Lloyd k-means over the store's own retained vectors
   (the sim_kmeans_refine layout, iterated), then a blue/green
   re-index into a fresh root via ``migrate_ivf_store`` — the old
   store serves reads until the deployment flips the root.

100 TB posture: monitoring is one broadcast join (centroid table, KB)
plus a narrow partial+final aggregate — cells×3 doubles out; no
embedding ever shuffles. Each k-means iteration is ONE map-only pass
fusing the GEMM assignment (the `_ivf_assign_blas` kernel) with
per-cell partial sufficient statistics, followed by a tiny per-cell
combine — the textbook distributed-Lloyd layout; the shuffle carries
at most tasks × touched-cells sum-vectors and the driver collects
exactly ``cells`` rows per iteration (the r11 verdict's fix: the old
posexplode layout collected cells × dims Rows — ~50M/iteration at 65k
cells × 768 dims). Retraining cost is therefore iters × (one corpus
pass), and the re-index is the measured one-job migration; both run
OFFLINE against a snapshot-stable log while the live store keeps
serving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.operators import vectors as V
from doreisa_spark.operators.broadcast import bcast


def assignment_fit(store, *, snapshot: "int | None" = None,
                   sample_mod: "int | None" = None) -> DataFrame:
    """Per-cell fit of the store's quantizer over its CURRENT members
    (or a pinned ``snapshot=`` state): ``(cell, n_members, min_cos,
    max_cos, sum_cos)`` where cos is the oracle-exact fold cosine of
    each member to its OWN stored centroid. min/max are rounded to 6dp
    (order-independent, safe to hash-gate); sum_cos stays raw for the
    driver-side mean in ``fit_stats``. One broadcast join + one narrow
    aggregate; embeddings never shuffle.

    ``sample_mod=N`` fits a DETERMINISTIC 1-in-N hash sample of the
    members (``xxhash64(vec_id) % N == 0`` — reruns agree, no RNG
    state): the mean assignment cosine is an unbiased estimator of the
    full-fit mean at 1/N of the cosine-fold work, and per-cell counts
    estimate occupancy shares (the top-cell share is a MAX statistic —
    biased upward when the expected sampled count per cell is small,
    which is why ``detect_drift``'s occupancy rule has a ``min_top_n``
    count floor). This is the monitoring-cadence knob for big stores —
    the full fold is the linear term (measured ~8 s per check on a
    1M-row store, LIFECYCLE_r12.json); min/max_cos remain exact only
    over the sample."""
    cent = store._centroid_frame()
    m = store.members(snapshot=snapshot).select("cell", "vec_id", "embedding")
    if sample_mod is not None and sample_mod > 1:
        m = m.where(F.pmod(F.xxhash64("vec_id"), F.lit(sample_mod)) == 0)
    m = m.select("cell", "embedding")
    cos = F.expr(V.cosine_expr("embedding", "cemb"))
    return (
        m.join(bcast(cent, bounded=True), "cell")
        .select("cell", cos.alias("a_cos"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.min("a_cos"), 6).alias("min_cos"),
            F.round(F.max("a_cos"), 6).alias("max_cos"),
            F.sum("a_cos").alias("sum_cos"),
        )
    )


def fit_stats(store, *, snapshot: "int | None" = None,
              sample_mod: "int | None" = None) -> dict:
    """Driver-side summary of ``assignment_fit`` — the numbers a
    monitoring loop compares across time: total members, mean assignment
    cosine, worst per-cell minimum, occupancy skew (top-cell share vs
    the balanced 1/cells), and how many cells are empty. With
    ``sample_mod`` the summary describes a deterministic 1-in-N hash
    sample (``n`` is the SAMPLE size — size ``min_n`` accordingly);
    the mean is unbiased and ``max_cell_n`` carries the top cell's
    observed count so drift's occupancy rule can floor out
    max-statistic noise (see detect_drift's ``min_top_n``)."""
    rows = assignment_fit(store, snapshot=snapshot,
                          sample_mod=sample_mod).collect()
    cells_total = len(store.centroids)
    n = sum(r["n_members"] for r in rows)
    if n == 0:
        return {"n": 0, "cells_total": cells_total, "cells_used": 0,
                "mean_cos": None, "min_cos": None, "max_cell_share": 0.0,
                "empty_cell_frac": 1.0}
    top_n = max(r["n_members"] for r in rows)
    return {
        "n": int(n),
        "cells_total": cells_total,
        "cells_used": len(rows),
        "mean_cos": float(sum(r["sum_cos"] for r in rows) / n),
        "min_cos": float(min(r["min_cos"] for r in rows)),
        "max_cell_share": float(top_n / n),
        "max_cell_n": int(top_n),
        "empty_cell_frac": float(1.0 - len(rows) / cells_total),
    }


def detect_drift(
    baseline: dict, current: dict, *, max_cos_drop: float = 0.05,
    max_occ_ratio: float = 4.0, min_n: int = 1000, min_top_n: int = 25,
) -> dict:
    """Decide whether the quantizer no longer fits the corpus it now
    indexes. ``baseline`` is ``fit_stats`` recorded when the quantizer
    was (re)trained; ``current`` is today's. Fires when:

    - the mean assignment cosine dropped by more than ``max_cos_drop``
      (members sit farther from their centroids → the shortlist a probe
      scans is less likely to contain the true neighbors → recall cap);
    - the fullest cell holds more than ``max_occ_ratio`` times the
      balanced share (new data funnels into few cells → a probe of that
      cell scans occupancy × corpus, the nprobe/cells cost model breaks).

    Below ``min_n`` members the verdict is withheld (a handful of rows
    says nothing). The occupancy rule additionally requires the top
    cell to hold at least ``min_top_n`` observed members: a SAMPLED
    fit over a big quantizer (``sample_mod`` at 65k cells) has a tiny
    expected count per cell, and the maximum of many near-Poisson
    counts is biased far above the balanced share by chance alone —
    the count floor suppresses exactly that noise while true skew
    (a top cell holding a corpus fraction) clears it by orders of
    magnitude. Returns ``{"drifted", "reasons", "baseline",
    "current"}`` — reasons name the tripped rule with both numbers, so
    the monitoring log is self-explanatory."""
    reasons: list[str] = []
    if current["n"] < min_n:
        return {"drifted": False, "reasons": [f"n={current['n']} < min_n={min_n}: verdict withheld"],
                "baseline": baseline, "current": current}
    if baseline.get("mean_cos") is not None and current.get("mean_cos") is not None:
        drop = baseline["mean_cos"] - current["mean_cos"]
        if drop > max_cos_drop:
            reasons.append(
                f"mean assignment cosine dropped {drop:.4f} "
                f"({baseline['mean_cos']:.4f} -> {current['mean_cos']:.4f})"
            )
    balanced = 1.0 / max(current["cells_total"], 1)
    # max_cell_n absent = a pre-r12 recorded fit: no count floor to
    # apply, keep the old behavior for it
    top_n = current.get("max_cell_n")
    if current["max_cell_share"] > max_occ_ratio * balanced and (
        top_n is None or top_n >= min_top_n
    ):
        reasons.append(
            f"top cell holds {current['max_cell_share']:.3f} of the store "
            f"(> {max_occ_ratio:.1f}x the balanced {balanced:.3f})"
        )
    return {"drifted": bool(reasons), "reasons": reasons,
            "baseline": baseline, "current": current}


def _cell_stats(cents, corpus: DataFrame) -> list:
    """One Lloyd sufficient-statistics pass, fully executor-side (the
    r11 verdict's scale-correctness item): a single map-only pass
    assigns each Arrow batch with the ``_ivf_blas_assigner`` kernel
    (IDENTICAL semantics to ``_ivf_assign_blas``, near-tie exact-fold
    rescore included) and emits PARTIAL per-cell statistics ``(cell, n,
    sum-vector, lo_cid)``; one grouped Arrow combine reduces each
    cell's partials — summed in ``lo_cid`` order, so reruns are
    bit-identical — to a single row. The driver collects ``cells``
    rows (the size of the quantizer itself), never cells × dims: the
    old posexplode layout collected ~50M Rows per iteration at
    production sizing (65k cells × 768 dims). No join and no corpus
    shuffle — embeddings never leave their scan task; the shuffle
    carries at most tasks × touched-cells sum-vectors."""
    import numpy as np
    import pandas as pd

    from doreisa_spark.queries.similarity import _ivf_blas_assigner

    best_cells = _ivf_blas_assigner(cents)

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # cid order fixes the intra-partial summation order, so a
            # rerun over the same splits reproduces every double bit
            pdf = pdf.sort_values("cid", kind="mergesort")
            x32 = [np.asarray(v, dtype=np.float32) for v in pdf["ce"]]
            x = np.array(x32, dtype=np.float64)
            cellv = best_cells(x32, x64=x)
            cidv = pdf["cid"].to_numpy(dtype=np.int64)
            out = {"cell": [], "n": [], "s": [], "lo_cid": []}
            for c in np.unique(cellv):
                m = cellv == c
                out["cell"].append(int(c))
                out["n"].append(int(m.sum()))
                out["s"].append(np.add.reduce(x[m], axis=0).tolist())
                out["lo_cid"].append(int(cidv[m].min()))
            yield pd.DataFrame(out)

    parts = corpus.mapInPandas(
        partials, schema="cell int, n bigint, s array<double>, lo_cid bigint"
    )

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("lo_cid", kind="mergesort")
        s = np.add.reduce(
            np.stack([np.asarray(v, dtype=np.float64) for v in pdf["s"]]),
            axis=0,
        )
        return pd.DataFrame({
            "cell": [int(pdf["cell"].iloc[0])],
            "n": [int(pdf["n"].sum())],
            "s": [s.tolist()],
        })

    return (
        parts.groupBy("cell")
        .applyInPandas(combine, schema="cell int, n bigint, s array<double>")
        .collect()
    )


def train_quantizer(
    vectors: DataFrame, n_cells: int, *, iters: int = 3,
) -> list[tuple[int, list[float]]]:
    """Deterministic distributed Lloyd k-means over ``vectors``
    (columns ``vec_id``, ``embedding``): returns ``[(cell, centroid)]``
    ready for ``IVFVectorStore(centroids=...)`` / ``migrate_ivf_store``.

    Seeding is hash-spread and reproducible: the ``n_cells`` vectors
    with the smallest ``xxhash64(vec_id)`` (a deterministic uniform
    sample — corpus order can't bias it, reruns agree). Each iteration
    is ONE map-only pass — GEMM assignment fused with per-cell partial
    sufficient statistics (``_cell_stats``) — plus a tiny per-cell
    combine; the driver collects exactly ``cells`` rows per iteration
    (never cells × dims). The new centroid is the member mean (for
    cosine assignment only the direction matters; the mean keeps
    magnitudes interpretable). Cells that end empty are dropped and
    ids re-packed to 0..k-1, so the result is always a valid quantizer
    (construction validates nonzero norms)."""
    if n_cells < 1:
        raise ValueError("n_cells must be >= 1")
    corpus = vectors.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    seeds = (
        corpus.orderBy(F.xxhash64("cid"), "cid")
        .limit(n_cells)
        .orderBy("cid")
        .collect()
    )
    cents = [
        {"cell": i, "cemb": [float(x) for x in r["ce"]]}
        for i, r in enumerate(seeds)
    ]
    for _ in range(max(0, iters)):
        stats = _cell_stats(cents, corpus)
        if not stats:  # empty corpus: keep the seeds rather than die
            break
        means = [
            [x / int(r["n"]) for x in r["s"]]
            for r in sorted(stats, key=lambda r: int(r["cell"]))
        ]
        # drop zero-norm means (antipodal / cancelling members — cosine
        # assignment is undefined for such a centroid, and the store
        # constructor validation would reject the quantizer; r11
        # ADVICE), mirroring the empty-cell repack. If EVERY mean
        # cancels, keep the previous centroids rather than die.
        means = [m for m in means if any(x != 0.0 for x in m)]
        if not means:
            break
        cents = [{"cell": i, "cemb": m} for i, m in enumerate(means)]
    return [(c["cell"], c["cemb"]) for c in cents]


def retrain_ivf_store(
    spark: SparkSession, old_root: str, new_root: str, *,
    n_cells: int | None = None, iters: int = 3, assign: str = "blas",
    commit_mode: "str | None" = None,
    alias_root: "str | None" = None, alias: "str | None" = None,
):
    """The full lifecycle step the drift detector triggers: retrain the
    quantizer on the store's own retained vectors (tombstoned rows
    excluded by construction), blue/green re-index into ``new_root``
    (`migrate_ivf_store` — the old store is never written and keeps
    serving while this runs), and return ``(new_store, report)`` where
    the report carries before/after ``fit_stats`` so the improvement
    is a recorded fact, not a hope.

    ``alias_root``/``alias`` complete the hand-off (r11 verdict ask
    #1): once the green store is committed AND its after-fit is
    recorded, the named alias CAS-flips from blue to green with the
    blue members log fenced across the flip (streaming/alias.py) —
    readers resolving the alias move atomically, the blue writer's
    next commit raises StaleWriterError, and a crash anywhere before
    the flip leaves the alias (and every reader) on blue with the
    unreferenced green root free to delete or retry. Without the
    alias args the caller owns the flip, as before.

    The whole step runs against ONE pinned snapshot of the old store
    (created here, dropped on exit): fit, every Lloyd pass, and the
    migration copy all see the same committed state even while the
    live writer keeps ingesting into the blue root mid-retrain —
    without the pin, each Spark action would re-enumerate the log and
    the green store could end up indexing a different corpus than the
    quantizer was trained on."""
    from doreisa_spark.streaming.incremental_ivf import IVFVectorStore
    from doreisa_spark.streaming.migrate import (
        _check_alias_args,
        _maybe_flip,
        migrate_ivf_store,
    )

    _check_alias_args(alias_root, alias)  # fail before fit/train/migrate
    old = IVFVectorStore(spark, old_root, fenced=False)
    sid = old.snapshot()
    try:
        before = fit_stats(old, snapshot=sid)
        cents = train_quantizer(
            old.members(snapshot=sid).select("vec_id", "embedding"),
            n_cells or len(old.centroids), iters=iters,
        )
        new = migrate_ivf_store(spark, old_root, new_root, centroids=cents,
                                commit_mode=commit_mode, assign=assign,
                                snapshot=sid)
    finally:
        old.drop_snapshot(sid)
    report = {"before": before, "after": fit_stats(new),
              "n_cells": len(cents), "iters": iters}
    # the green store's train-time fit IS its drift baseline: record it
    # in the quantizer marker so the in-stream monitor (on_drift) has a
    # reference without any side channel (r11 verdict ask #2)
    new.record_fit_baseline(report["after"])
    # flip LAST: the report's after-fit is computed before readers move,
    # so a bad retrain can be aborted by never flipping
    epoch = _maybe_flip(alias_root, alias, old, new)
    if epoch is not None:
        report["alias"] = {"name": alias, "epoch": epoch,
                           "from": old.root, "to": new.root}
    return new, report
