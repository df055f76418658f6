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
embedding ever shuffles. Each k-means iteration is one map-only GEMM
assignment (the `_ivf_assign_blas` kernel) plus one (cell, dim)
partial-sum aggregate whose shuffle carries cells×dims doubles per
partition — the textbook distributed-Lloyd layout. Retraining cost is
therefore iters × (one corpus pass), and the re-index is the measured
one-job migration; both run OFFLINE against a snapshot-stable log
while the live store keeps serving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.operators import vectors as V
from doreisa_spark.operators.broadcast import bcast


def assignment_fit(store, *, snapshot: "int | None" = None) -> DataFrame:
    """Per-cell fit of the store's quantizer over its CURRENT members
    (or a pinned ``snapshot=`` state): ``(cell, n_members, min_cos,
    max_cos, sum_cos)`` where cos is the oracle-exact fold cosine of
    each member to its OWN stored centroid. min/max are rounded to 6dp
    (order-independent, safe to hash-gate); sum_cos stays raw for the
    driver-side mean in ``fit_stats``. One broadcast join + one narrow
    aggregate; embeddings never shuffle."""
    cent = store._centroid_frame()
    m = store.members(snapshot=snapshot).select("cell", "embedding")
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


def fit_stats(store, *, snapshot: "int | None" = None) -> dict:
    """Driver-side summary of ``assignment_fit`` — the numbers a
    monitoring loop compares across time: total members, mean assignment
    cosine, worst per-cell minimum, occupancy skew (top-cell share vs
    the balanced 1/cells), and how many cells are empty."""
    rows = assignment_fit(store, snapshot=snapshot).collect()
    cells_total = len(store.centroids)
    n = sum(r["n_members"] for r in rows)
    if n == 0:
        return {"n": 0, "cells_total": cells_total, "cells_used": 0,
                "mean_cos": None, "min_cos": None, "max_cell_share": 0.0,
                "empty_cell_frac": 1.0}
    return {
        "n": int(n),
        "cells_total": cells_total,
        "cells_used": len(rows),
        "mean_cos": float(sum(r["sum_cos"] for r in rows) / n),
        "min_cos": float(min(r["min_cos"] for r in rows)),
        "max_cell_share": float(max(r["n_members"] for r in rows) / n),
        "empty_cell_frac": float(1.0 - len(rows) / cells_total),
    }


def detect_drift(
    baseline: dict, current: dict, *, max_cos_drop: float = 0.05,
    max_occ_ratio: float = 4.0, min_n: int = 1000,
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
    says nothing). Returns ``{"drifted", "reasons", "baseline",
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
    if current["max_cell_share"] > max_occ_ratio * balanced:
        reasons.append(
            f"top cell holds {current['max_cell_share']:.3f} of the store "
            f"(> {max_occ_ratio:.1f}x the balanced {balanced:.3f})"
        )
    return {"drifted": bool(reasons), "reasons": reasons,
            "baseline": baseline, "current": current}


def train_quantizer(
    vectors: DataFrame, n_cells: int, *, iters: int = 3,
) -> list[tuple[int, list[float]]]:
    """Deterministic distributed Lloyd k-means over ``vectors``
    (columns ``vec_id``, ``embedding``): returns ``[(cell, centroid)]``
    ready for ``IVFVectorStore(centroids=...)`` / ``migrate_ivf_store``.

    Seeding is hash-spread and reproducible: the ``n_cells`` vectors
    with the smallest ``xxhash64(vec_id)`` (a deterministic uniform
    sample — corpus order can't bias it, reruns agree). Each iteration
    is one map-only GEMM assignment (`_ivf_assign_blas`, zero shuffle)
    plus one (cell, dim) partial-sum aggregate — the sim_kmeans_refine
    sufficient-statistics layout — and the new centroid is the member
    mean (for cosine assignment only the direction matters; the mean
    keeps magnitudes interpretable). Cells that end empty are dropped
    and ids re-packed to 0..k-1, so the result is always a valid
    quantizer (construction validates nonzero norms)."""
    from doreisa_spark.queries.similarity import _ivf_assign_blas

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
        assigned = _ivf_assign_blas(cents, corpus)
        stats = (
            assigned.join(corpus, "cid")
            .select("cell", F.posexplode("ce").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.sum(F.col("v").cast("double")).alias("s"),
                 F.count(F.lit(1)).alias("n"))
            .collect()
        )  # bounded: cells x dims rows
        by_cell: dict[int, dict] = {}
        for r in stats:
            ent = by_cell.setdefault(int(r["cell"]), {"n": int(r["n"]), "s": {}})
            ent["s"][int(r["dim"])] = float(r["s"])
        if not by_cell:  # empty corpus: keep the seeds rather than die
            break
        cents = [
            {
                "cell": i,
                "cemb": [ent["s"][d] / ent["n"] for d in sorted(ent["s"])],
            }
            for i, (_, ent) in enumerate(sorted(by_cell.items()))
        ]
    return [(c["cell"], c["cemb"]) for c in cents]


def retrain_ivf_store(
    spark: SparkSession, old_root: str, new_root: str, *,
    n_cells: int | None = None, iters: int = 3, assign: str = "blas",
    commit_mode: "str | None" = None,
):
    """The full lifecycle step the drift detector triggers: retrain the
    quantizer on the store's own retained vectors (tombstoned rows
    excluded by construction), blue/green re-index into ``new_root``
    (`migrate_ivf_store` — the old store is never written and keeps
    serving until the deployment flips the root), and return
    ``(new_store, report)`` where the report carries before/after
    ``fit_stats`` so the improvement is a recorded fact, not a hope.

    The whole step runs against ONE pinned snapshot of the old store
    (created here, dropped on exit): fit, every Lloyd pass, and the
    migration copy all see the same committed state even while the
    live writer keeps ingesting into the blue root mid-retrain —
    without the pin, each Spark action would re-enumerate the log and
    the green store could end up indexing a different corpus than the
    quantizer was trained on."""
    from doreisa_spark.streaming.incremental_ivf import IVFVectorStore
    from doreisa_spark.streaming.migrate import migrate_ivf_store

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
    return new, report
