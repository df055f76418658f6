"""Streaming-incremental IVF-Flat vector store (r8 verdict ask #3).

RECALL_r08.md crowned IVF-Flat the measured-best index on hot data
(recall@5 = 1.000 at 6.3 % of the corpus scanned, nprobe=1 on the
planted 100k corpus) — but its amortized latency assumed a PERSISTED
cell assignment, and the only incremental vector store was sign-LSH
(incremental_ann.py). This module gives IVF the same deployment
treatment on the same storage engine — the shared ``SortedVectorLog``
base (streaming/vector_store.py) provides the cell-sorted exactly-once
log, tiered compaction, tombstones, fencing, and both scoring kernels;
this module contributes the IVF index FAMILY:

- **persisted centroids**: the coarse quantizer is recorded in a
  write-once ``_centroids.json`` marker (the `_planes.json` pattern) —
  a reopened store self-configures, a writer with different centroids
  fails loudly (two quantizers must never share one inverted file);
- **map-only ingest**: cell assignment is the oracle-exact per-row
  argmax EXPRESSION over the driver-held quantizer (`sim_ann_ivf`'s
  assignment semantics — same fold arithmetic and tie-break as the
  crossJoin + row_number formulation, with zero shuffle of the batch;
  operators/vectors.ivf_argmax_cell_expr) — history is never read
  on the write path, exactly like the LSH store (the difference from
  LSH: the quantizer is trained state, which is why it lives in the
  marker; LSH's hyperplanes are stateless constants);
- **nprobe-pruned point-IN probe**: probe cells are selected
  driver-side with the same sequential-fold cosine as the JVM (bit
  agreement pinned by pytest), pushed into ONE pruned scan; scoring is
  the oracle-exact fold (default) or the BLAS GEMM kernel.

Batch equivalence: after streaming a corpus in any batch split,
``query_topk_vectors`` over the store equals the one-shot `sim_ann_ivf`
(DuckDB-gated) row for row — pinned by tests/test_incremental_ivf.py
and by the `sim_ann_ivf_store` registry entry under the batch oracle.

100 TB posture: ingest is one broadcast (the centroid table — KB) per
batch plus a sorted write; a probe reads nprobe inverted lists
(~nprobe/cells of the store) via row-group pruning and never shuffles
history. Retraining the quantizer is an explicit re-index (a new store
root written by one job from the old store's committed log), never an
in-place mutation — the marker makes the in-place variant impossible.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.operators import vectors as V
from doreisa_spark.operators.literal import literal_frame
from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.vector_store import SortedVectorLog

_MEMBERS_DDL = "cell int, vec_id bigint, embedding array<float>"


def fold_cosine_py(a, b) -> float:
    """Driver-side mirror of operators/vectors.cosine_expr: float32
    element casts, sequential double fold — bit-identical to the JVM
    expression, so driver-side probe selection agrees with the oracle."""
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", float(x)))[0]  # noqa: E731
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        xd, yd = float(f32(x)), float(f32(y))
        dot += xd * yd
        na += xd * xd
        nb += yd * yd
    return dot / (na**0.5 * nb**0.5)


class IVFVectorStore(SortedVectorLog):
    """Persisted IVF-Flat index: inverted lists as a cell-sorted
    exactly-once parquet log, quantizer in a write-once marker."""

    _PROBE_COL = "cell"
    _PROBE_TYPE = "int"

    def __init__(self, spark: SparkSession, root: str, *,
                 centroids=None,
                 compact_every: int | None = 64,
                 commit_mode: "str | None" = None,
                 batch_files: int = 1,
                 fenced: "bool | None" = None,
                 target_file_bytes: "int | None" = 128 << 20,
                 on_drift=None,
                 drift_opts: "dict | None" = None,
                 drift_every: int = 1,
                 drift_sample_mod: "int | None" = None):
        """``centroids``: list of (cell, embedding) for a NEW store —
        typically the seed set (`similarity._seed_centroids(...).collect()`)
        or a trained quantizer (`sim_kmeans_refine`'s output). A
        reopened store loads its marker; passing centroids that differ
        from the marker raises.

        ``on_drift`` wires quantizer drift monitoring into the stream
        itself (r11 verdict ask #2 — no separate polling loop): on
        every periodic compaction the store runs ``fit_stats`` against
        the baseline recorded in its marker (``record_fit_baseline``,
        written at train time by ``retrain_ivf_store``) and calls
        ``on_drift(verdict)`` with ``detect_drift``'s dict (plus
        ``batch_id``) — drifted or not, so the deployment's monitoring
        log sees every check. ``drift_opts`` are ``detect_drift``
        keyword overrides (max_cos_drop / max_occ_ratio / min_n).
        ``drift_every`` runs the check only on every Nth compaction —
        the cadence knob: the fit pass is one full members scan
        (measured ~8 s on a 1M-row store, LIFECYCLE_r12.json), so a
        deployment with a tight ``compact_every`` decouples the
        monitor's cost from the fold cadence here.
        ``drift_sample_mod=N`` additionally fits only a deterministic
        1-in-N hash sample per check (quantizer.assignment_fit) — the
        ratio statistics drift compares are unbiased, at 1/N the
        cosine-fold work; size ``min_n`` in ``drift_opts`` to the
        SAMPLE size. With no callback or no recorded baseline the
        check is skipped at zero cost."""
        # validate BEFORE super().__init__: the base constructor
        # acquires the writer epoch in manifest mode, so raising after
        # it would fence out the live writer while this handle dies
        # (r12 review finding)
        if drift_every < 1:
            raise ValueError("drift_every must be >= 1")
        super().__init__(spark, root, compact_every=compact_every,
                         commit_mode=commit_mode, batch_files=batch_files,
                         fenced=fenced, target_file_bytes=target_file_bytes)
        self._on_drift = on_drift
        self._drift_opts = dict(drift_opts or {})
        self._drift_every = drift_every
        self._drift_tick = 0
        self._drift_sample_mod = drift_sample_mod

        def _norm(r):
            # accept (cell, embedding) pairs or Rows with cell/cemb fields
            try:
                return int(r["cell"]), [float(x) for x in r["cemb"]]
            except (TypeError, KeyError):
                c, emb = r
                return int(c), [float(x) for x in emb]

        stored = self._stored_centroids()
        if centroids is not None:
            cents = sorted(_norm(r) for r in centroids)
            if stored is not None and stored != cents:
                raise ValueError(
                    f"store at {self.root} was built with a different "
                    f"quantizer ({len(stored)} centroids); refusing to mix "
                    "two coarse quantizers in one inverted file"
                )
            self.centroids = cents
        elif stored is not None:
            self.centroids = stored
        else:
            raise ValueError(
                "a new IVF store needs centroids= (the coarse quantizer); "
                "a reopened store reads its _centroids.json marker"
            )
        # validate the quantizer once at construction (r10 ADVICE): a
        # zero-norm centroid would make the fold scorer raise
        # ZeroDivisionError while the blas paths silently emit NaN
        # cosines — fail loudly before either can diverge
        for c, cemb in self.centroids:
            if not any(x != 0.0 for x in cemb):
                raise ValueError(
                    f"quantizer centroid for cell {c} has zero norm; "
                    "cosine assignment/probing is undefined for it"
                )
        self._probe_mat = None  # lazy numpy quantizer (probe_cells fast path)

    # ------------------------------------------------------------- marker
    def _marker(self) -> str:
        return f"{self.root}/_centroids.json"

    def _marker_load(self) -> "dict | None":
        """Marker contents normalized to the dict form. The pre-r12
        marker was the bare centroid list; it reads as a dict with no
        recorded baseline (old stores keep working, they just have no
        train-time fit to monitor against until one is recorded)."""
        if not os.path.exists(self._marker()):
            return None
        with open(self._marker()) as f:
            obj = json.load(f)
        if isinstance(obj, list):
            return {"centroids": obj, "fit_baseline": None}
        return obj

    def _stored_centroids(self):
        # centroid lists are positional (not the dict markers the shared
        # helpers handle), so the marker I/O stays bespoke here
        m = self._marker_load()
        if m is None:
            return None
        return [(int(c), [float(x) for x in emb]) for c, emb in m["centroids"]]

    def _record_centroids(self) -> None:
        """Atomic write-once marker, written before the first commit
        (underscore name: invisible to Spark file listing)."""
        if os.path.exists(self._marker()):
            return
        os.makedirs(self.root, exist_ok=True)
        tmp = f"{self._marker()}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"centroids": self.centroids, "fit_baseline": None}, f)
        os.replace(tmp, self._marker())

    @property
    def fit_baseline(self) -> "dict | None":
        """The ``fit_stats`` recorded when this quantizer was trained
        (``record_fit_baseline``) — what ``detect_drift`` compares
        today's fit against. None until recorded."""
        m = self._marker_load()
        return None if m is None else m.get("fit_baseline")

    def record_fit_baseline(self, stats: dict) -> None:
        """Record the train-time ``fit_stats`` in the quantizer marker
        (write-once, like the centroids themselves: the baseline IS
        part of the trained state — re-baselining without retraining
        would define drift away). ``retrain_ivf_store`` records the
        green store's after-fit here before the alias flip."""
        self._record_centroids()
        m = self._marker_load()
        if m.get("fit_baseline") is not None:
            if m["fit_baseline"] == stats:
                return  # idempotent re-record of the same fit
            raise ValueError(
                f"store at {self.root} already records a fit baseline; "
                "a new baseline means a new quantizer — retrain into a "
                "fresh root instead of moving the drift goalposts"
            )
        m["fit_baseline"] = dict(stats)
        tmp = f"{self._marker()}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._marker())

    def _post_compact(self, batch_id: int) -> None:
        """Drift monitoring on the stream's own compaction cadence
        (r11 verdict ask #2): one fit pass + the detect_drift rules,
        verdict surfaced through the ``on_drift`` callback. Skipped at
        zero cost unless both a callback and a recorded train-time
        baseline exist."""
        if self._on_drift is None:
            return
        self._drift_tick += 1
        if self._drift_tick % self._drift_every:
            return  # not this compaction's turn (the cadence knob)
        base = self.fit_baseline
        if base is None:
            return
        from doreisa_spark.streaming.quantizer import detect_drift, fit_stats

        verdict = detect_drift(
            base, fit_stats(self, sample_mod=self._drift_sample_mod),
            **self._drift_opts,
        )
        verdict["batch_id"] = batch_id
        self._on_drift(verdict)

    def _centroid_frame(self) -> DataFrame:
        return literal_frame(
            self.spark,
            [(c, emb) for c, emb in self.centroids],
            "cell int, cemb array<float>",
        )

    # ------------------------------------------------------------- ingest
    def process_batch(
        self, vectors: DataFrame, batch_id: int | None = None, *,
        assign: str = "expr",
    ) -> None:
        """Map-only exactly-once ingest: assign each batch vector to its
        nearest centroid, sort by cell, commit under the batch id.
        History is never read.

        ``assign="expr"`` (default) is the oracle-exact fold (broadcast
        centroid cross join + row_number argmax, deterministic cell
        tie-break — identical semantics to `sim_ann_ivf`'s assignment);
        it costs O(batch × cells) fold rows, right for stream-sized
        batches. ``assign="blas"`` is the bulk-load kernel: one GEMM of
        each Arrow batch against the centroid matrix, argmax per row,
        zero shuffle — the `sim_ann_ivf_blas` kernel shape, store-level
        agreement pinned by pytest (ann.py's last-ulp tie caveat
        applies; real corpora have no exact centroid-cosine ties)."""
        if batch_id is None:
            batch_id = BC.next_batch_id(self._members, mode=self.commit_mode)
        self._record_centroids()
        if assign == "blas":
            assigned = self._assign_blas(vectors)
        elif assign == "expr":
            # map-only argmax over the quantizer riding as a ONE-ROW
            # broadcast column: same fold arithmetic and (cos DESC,
            # cell ASC) tie-break as the former crossJoin + row_number
            # shape, but ZERO shuffle — the window variant exchanged
            # every batch by vec_id just to rank the per-centroid fold
            # values (guide §2.4). Exact agreement pinned by
            # tests/test_incremental_ivf.py::test_expr_assignment_matches_crossjoin_argmax.
            from doreisa_spark.operators.broadcast import bcast
            from doreisa_spark.operators.literal import centroid_arg_frame

            cents = centroid_arg_frame(self.spark, self.centroids)
            assigned = (
                vectors.select("vec_id", "embedding")
                .crossJoin(bcast(cents, bounded=True))
                .select(
                    F.expr(
                        V.ivf_argmax_cell_expr("cents", "embedding")
                    ).alias("cell"),
                    "vec_id",
                    "embedding",
                )
            )
        else:
            raise ValueError(f"assign must be 'expr' or 'blas', got {assign!r}")
        self._commit_shaped(assigned, batch_id)

    def _assign_blas(self, vectors: DataFrame) -> DataFrame:
        """Bulk-load assignment: argmax over one normalized GEMM per
        Arrow batch (cells tie-break by LOWEST cell id on equal cosine,
        mirroring the expr path's deterministic order)."""
        from collections.abc import Iterator

        import numpy as np
        import pandas as pd

        cells = np.array([c for c, _ in self.centroids], dtype=np.int32)
        cmat = np.array([emb for _, emb in self.centroids], dtype=np.float64)
        cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
        order = np.argsort(cells)  # ascending-cell scan => argmax keeps lowest
        cn, cells = cn[order], cells[order]

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                )
                xn = np.linalg.norm(x, axis=1, keepdims=True)
                sims = (x / np.where(xn > 0, xn, 1.0)) @ cn.T
                best = cells[np.argmax(sims, axis=1)]
                yield pd.DataFrame(
                    {
                        "cell": best.astype(np.int32),
                        "vec_id": pdf["vec_id"],
                        "embedding": pdf["embedding"],
                    }
                )

        return vectors.select("vec_id", "embedding").mapInPandas(
            assign, schema=_MEMBERS_DDL
        )

    # --------------------------------------------------------------- query
    def probe_cells(self, emb, nprobe: int, *, selection: str = "fold") -> list[int]:
        """The query's ``nprobe`` nearest cells by cosine against the
        quantizer (tie-break: descending cosine, then cell —
        `sim_ann_ivf`'s probe-selection semantics).

        ``selection="fold"`` (default) is the driver-side sequential
        fold, bit-identical to the JVM expression — the oracle path, but
        O(cells × dim) Python arithmetic per query, which at deployment
        quantizer sizes (10^5–10^6 cells) becomes seconds/query.
        ``selection="blas"`` scores all cells with one numpy GEMM
        (float64, same arithmetic order as a vectorized fold up to
        last-ulp summation differences) and breaks cosine ties to the
        fold's order by construction (lexsort on (-cos, cell)) —
        measured-identical to the fold on the planted corpora
        (tests/test_incremental_ivf.py pins the agreement) and the only
        tractable path for a 4,096+-cell quantizer (BASELINE.md's IVF
        store section measures the crossover)."""
        if selection == "blas":
            import numpy as np

            if self._probe_mat is None:
                cells = np.array([c for c, _ in self.centroids], dtype=np.int64)
                cmat = np.array(
                    [emb_ for _, emb_ in self.centroids], dtype=np.float32
                ).astype(np.float64)
                cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
                self._probe_mat = (cells, cn)
            cells, cn = self._probe_mat
            # float32 element cast first — the fold's arithmetic begins
            # from f32(x) too, so both paths score the same quantized query
            q = np.asarray(emb, dtype=np.float32).astype(np.float64)
            qn = np.linalg.norm(q)
            sims = cn @ (q / (qn if qn > 0 else 1.0))
            order = np.lexsort((cells, -sims))  # desc cosine, asc cell — fold's order
            return [int(c) for c in cells[order[: max(1, nprobe)]]]
        if selection != "fold":
            raise ValueError(f"selection must be 'fold' or 'blas', got {selection!r}")
        scored = sorted(
            ((-fold_cosine_py(emb, cemb), c) for c, cemb in self.centroids)
        )
        return [c for _, c in scored[: max(1, nprobe)]]

    def query_topk_vectors(
        self, queries, k: int, *, nprobe: int = 1, scoring: str = "expr",
        selection: str = "fold", snapshot: "int | None" = None,
    ) -> DataFrame:
        """Top-k for application-provided (qid, embedding) queries: ONE
        scan of the store pruned to the probed cells (point-IN on the
        cell-sorted log), each query scored only against its own probed
        cells' members, self-match excluded — `sim_ann_ivf` semantics
        from persisted state. ``scoring="blas"`` routes the candidates
        through the GEMM kernel (identical (qid,cid,rk), pytest-pinned);
        ``selection="blas"`` vectorizes the probe-cell choice for large
        quantizers (see probe_cells)."""
        qrows = [
            {"qid": int(qid), "qe": list(emb), "cell": int(c)}
            for qid, emb in queries
            for c in self.probe_cells(emb, nprobe, selection=selection)
        ]
        # snapshot= serves the query from a pinned point-in-time state
        # (SortedVectorLog.snapshot) — later ingest/deletes invisible
        return self._score_topk(qrows, k, scoring, snapshot=snapshot)


def run_incremental_ivf(
    spark: SparkSession,
    source_dir: str,
    store_root: str,
    *,
    centroids,
    queries,
    k: int,
    nprobe: int = 1,
    timeout_sec: float = 300,
    compact_every: int | None = 64,
    on_drift=None,
    drift_opts: "dict | None" = None,
) -> DataFrame:
    """Drive a vector file-stream into an IVF store via foreachBatch
    until drained (the run_incremental_ann shape); returns the top-k
    frame for ``queries`` over the accumulated inverted file.

    ``on_drift``/``drift_opts`` arm the in-stream quantizer drift
    monitor (see IVFVectorStore): with a train-time baseline recorded
    in the store marker, every periodic compaction also checks
    ``detect_drift`` and surfaces the verdict through the callback —
    drifted ingest trips the detector MID-STREAM, no polling loop."""
    from doreisa_spark.streaming.incremental_ann import read_vector_stream
    from doreisa_spark.streaming.structured import run_foreach_batch

    store = IVFVectorStore(spark, store_root, centroids=centroids,
                           compact_every=compact_every,
                           on_drift=on_drift, drift_opts=drift_opts)
    stream = read_vector_stream(spark, source_dir)
    run_foreach_batch(
        stream,
        lambda df, bid: store.process_batch(df, bid),
        timeout_sec=timeout_sec,
    )
    return store.query_topk_vectors(queries, k, nprobe=nprobe)
