"""Streaming-incremental ANN index (sign-LSH vector store).

Completes the incremental triad next to incremental_dedup (near-dup
pairs) and incremental_curation (quality/dedup admission): vectors ARRIVE
over micro-batches and must become searchable without rebuilding the
index — the vector-database ingest path.

Design: the persisted index is ``members/`` — (bucket, vec_id, embedding)
rows, bucket = the same deterministic sign-LSH of operators/vectors.py the
batch ``sim_ann_lsh`` uses. The storage engine (probe-key-sorted
exactly-once log, tiered compaction, tombstones, fencing, both scoring
kernels) is the shared ``SortedVectorLog`` base
(streaming/vector_store.py) — this module contributes the sign-LSH index
FAMILY:

1. bucket assignment is a map-only JVM expression over the batch — no
   history is touched at all during ingest (LSH is stateless per vector,
   which is exactly why it is the streaming-friendly index family; an
   IVF quantizer would freeze or drift here, see the IVFVectorStore's
   marker story for the trained-state counterpart);
2. probe selection is the driver-side hyperplane fold (bit-identical to
   ingest bucketing) plus the multiprobe sequences (Hamming-1 and the
   deep Lv et al. order) that buy recall back at high plane counts.

Query path (``query_topk``): probe ONLY the query's bucket in the store —
a bucket-equality join against members, exact sequential-fold cosine,
per-query top-k. Cost per query scales with one bucket (~n/2^planes),
never the corpus.

Batch equivalence: after streaming the whole corpus in any batch split,
``query_topk`` over the store returns row-for-row what the one-shot
`sim_ann_lsh` (DuckDB-gated) computes — asserted by
tests/test_incremental_ann.py through a real readStream + foreachBatch
drive, and by the `sim_ann_lsh_incremental` registry entry under the
batch entry's own oracle. (Order-insensitive by construction: bucket ids
and cosines are bit-deterministic, so arrival order cannot change any
result — stronger than the dedup store, which needs monotone doc_ids.)

100 TB posture: ingest is map-only + append; the store is naturally
bucket-partitioned (a deployment writes it partitioned/bucketed by
``bucket``, making every probe a single-partition read). State is the
corpus itself — an ANN index retains all vectors by definition — but the
HOT structure per query is one bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.operators import vectors as V
from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.vector_store import (
    SortedVectorLog,
    read_marker,
    write_marker_once,
)

EMBEDDINGS_DDL = "vec_id bigint, embedding array<float>, label int"


_MEMBERS_DDL = "bucket bigint, vec_id bigint, embedding array<float>"


class LSHVectorStore(SortedVectorLog):
    _PROBE_COL = "bucket"
    _PROBE_TYPE = "bigint"

    def __init__(self, spark: SparkSession, root: str, *,
                 compact_every: int | None = 64,
                 commit_mode: "str | None" = None,
                 planes: int | None = None,
                 batch_files: int = 1,
                 fenced: "bool | None" = None,
                 target_file_bytes: "int | None" = 128 << 20):
        super().__init__(spark, root, compact_every=compact_every,
                         commit_mode=commit_mode, batch_files=batch_files,
                         fenced=fenced, target_file_bytes=target_file_bytes)
        # the deployment sizes the plane count to the corpus (2^planes
        # buckets bound per-probe candidate volume — BASELINE.md's ANN
        # store section); the store records its plane count so readers
        # self-configure and a mismatched writer fails loudly instead of
        # silently splitting the index across two bucket spaces
        stored = read_marker(f"{self.root}/_planes.json")
        stored = int(stored["planes"]) if stored is not None else None
        if planes is None:
            self.planes = stored if stored is not None else V.LSH_PLANES
        elif stored is not None and stored != planes:
            raise ValueError(
                f"store at {self.root} was built with planes={stored}, "
                f"got planes={planes}"
            )
        else:
            self.planes = planes

    def process_batch(self, vectors: DataFrame, batch_id: int | None = None, *,
                      bucketing: str = "expr") -> None:
        """Exactly-once ingest: the batch's bucket rows commit under
        their batch id (batch_commit.py, rename or manifest mode) — an
        at-least-once redelivery commits nothing, so the index never
        holds duplicate vectors. ``batch_id=None`` auto-increments
        (driver-loop callers). The sorted-commit / compaction shape is
        the base's ``_commit_shaped`` (one bucket in 2^planes per probe).

        ``bucketing="expr"`` (default) assigns buckets with the map-only
        JVM hyperplane expression — the DuckDB-hash-exact path.
        ``bucketing="blas"`` is the bulk-load kernel (the IVF store's
        ``assign="blas"`` counterpart): one numpy GEMM of each Arrow
        batch against the integer hyperplane matrix, signs → bucket id —
        the interpreted fold costs ~ms/row and dominates a corpus-sized
        bulk build (measured: 89 s → GEMM-bound at 5M vectors,
        BASELINE.md chooser section). Same last-ulp caveat as every
        blas/expr split: summation order differs, so a sign could flip
        only on an exactly-zero-margin projection; store-level
        agreement on real corpora is pinned by pytest."""
        if batch_id is None:
            batch_id = BC.next_batch_id(self._members, mode=self.commit_mode)
        write_marker_once(f"{self.root}/_planes.json", {"planes": self.planes})
        if bucketing == "blas":
            bucketed = self._bucket_blas(vectors)
        elif bucketing == "expr":
            bucketed = vectors.select(
                F.expr(V.lsh_bucket_expr("embedding", self.planes))
                .cast("bigint")
                .alias("bucket"),
                "vec_id",
                "embedding",
            )
        else:
            raise ValueError(
                f"bucketing must be 'expr' or 'blas', got {bucketing!r}"
            )
        self._commit_shaped(bucketed, batch_id)

    def _bucket_blas(self, vectors: DataFrame) -> DataFrame:
        """Bulk-load bucketing: signs of one GEMM against the hyperplane
        matrix W[k, i] = ((A_k·(i+1) + B_k) mod M) − M//2 — the same
        integer weights the JVM expression and lsh_bucket_py fold."""
        from collections.abc import Iterator

        import numpy as np
        import pandas as pd

        A, B = V.lsh_params(self.planes)
        A = np.array(A, dtype=np.int64)[:, None]
        Bv = np.array(B, dtype=np.int64)[:, None]
        planes = self.planes
        bits = (1 << np.arange(planes, dtype=np.int64))

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            w = None
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                )
                if w is None or w.shape[1] != x.shape[1]:
                    i = np.arange(1, x.shape[1] + 1, dtype=np.int64)[None, :]
                    w = (((A * i + Bv) % V.LSH_MOD) - V.LSH_MOD // 2).astype(
                        np.float64
                    )
                proj = x @ w.T  # (n x planes)
                bucket = ((proj > 0) @ bits).astype(np.int64)
                yield pd.DataFrame(
                    {
                        "bucket": bucket,
                        "vec_id": pdf["vec_id"],
                        "embedding": pdf["embedding"],
                    }
                )

        return vectors.select("vec_id", "embedding").mapInPandas(
            kernel, schema=_MEMBERS_DDL
        )

    def query_topk(
        self, query_ids_below: int, k: int, *, n_flip: int = 0,
        n_probes: int | None = None,
    ) -> DataFrame:
        """Top-k per query vector (vec_id < query_ids_below, the batch
        entry's query-set contract), probing only each query's bucket.

        The query rows (bounded: the query set) are collected ONCE —
        that single pass yields both the probe vectors (re-emitted as a
        broadcast local relation, so the join never re-scans the store
        for them) and the probed-bucket set, which is pushed INTO the
        candidate scan as a point-IN filter — on the bucket-sorted log
        (see process_batch) parquet skips every row-group outside the
        probed buckets, so a probe costs one query-lookup scan plus
        O(bucket) candidate embedding bytes, not O(corpus) twice.
        (A deployment that carries its query vectors application-side
        skips the lookup scan too — query_topk_vectors; measured curves
        incl. decoded-byte pruning in tools/bench_ann_store.py.)

        ``n_flip`` / ``n_probes`` (mutually exclusive) expand the probe
        to Hamming-1 neighbors / the deep query-directed sequence —
        query_topk_vectors' recall knobs, same semantics (RECALL_r09.md)."""
        m = self.members()
        looked_up = m.where(F.col("vec_id") < query_ids_below).collect()
        if n_probes is not None or n_flip:
            return self.query_topk_vectors(
                [(r["vec_id"], r["embedding"]) for r in looked_up], k,
                n_flip=n_flip, n_probes=n_probes,
            )
        qrows = [
            {"qid": r["vec_id"], "qe": r["embedding"], "bucket": r["bucket"]}
            for r in looked_up
        ]
        return self._topk_expr(qrows, k)

    def query_topk_vectors(
        self, queries, k: int, *, scoring: str = "expr", n_flip: int = 0,
        n_probes: int | None = None, snapshot: "int | None" = None,
    ) -> DataFrame:
        """Top-k for APPLICATION-PROVIDED query vectors — the deployment
        query shape (a vector DB is handed the query embedding; it does
        not look it up in its own index, which on a bucket-sorted log
        costs a full nested-column scan — see query_topk's lookup).
        ``queries``: iterable of ``(qid, embedding)`` rows. The bucket of
        each query is computed driver-side with the SAME integer
        hyperplane arithmetic as the JVM expression (operators/vectors
        constants), so probe selection is bit-identical to ingest
        bucketing; the store is then touched by exactly ONE scan, pruned
        to the probed buckets by parquet row-group min/max on the sorted
        log (measured: 27.9x fewer embedding bytes decoded at 50M
        vectors, tools/bench_ann_store.py).

        ``scoring="expr"`` (default) ranks candidates with the oracle-
        exact sequential-fold cosine — DuckDB-hash-identical, the gated
        path. ``scoring="blas"`` ranks whole Arrow batches with one
        numpy GEMM (operators/ann.py kernel shape) — same probe
        semantics (each query scored ONLY against its own bucket), with
        ann.cosine_topk's documented last-ulp tie caveat. The fold is
        what dominates a big-store probe wall clock (a bucket holds
        corpus/2^planes candidates, so 8 probes at 50M vectors score
        ~1.5M rows): measured same-session at 50M, expr-fold probe
        12.4 s vs BLAS probe 3.0 s — 4.1x, and 5.3x over the unpruned
        counterfactual (tools/bench_ann_store.py). A deployment also
        sizes LSH_PLANES to the corpus (more planes → smaller buckets)
        to bound the candidate set itself.

        ``n_flip`` (r8 verdict ask #2) is the recall knob the planes
        knob needs: each query probes its own bucket PLUS the ``n_flip``
        Hamming-distance-1 neighbor buckets whose hyperplane margin is
        smallest (query-directed multiprobe, the batch
        ``sim_ann_multiprobe`` semantics — ``n_flip=planes`` probes the
        identical Hamming-1 set, pinned by pytest). The fan-out lives
        entirely on the driver-computed probe list; the store is still
        touched by ONE pruned scan, each candidate still belongs to
        exactly one bucket (no dedup needed), and cost grows with the
        probed-bucket count — measured recall-vs-latency per (planes,
        n_flip) in RECALL_r09.md / tools/recall_store_eval.py.

        ``n_probes`` is the DEEP multiprobe knob (mutually exclusive
        with n_flip): the full Lv et al. query-directed sequence —
        perturbations of any Hamming distance in success-probability
        order (vectors.lsh_probe_sequence_py). Hamming-1 saturates at
        high plane counts (RECALL_r09.md measures the ceiling); the
        deep sequence is how the planes=14 store buys recall@5 >= 0.9
        back at a measured, still-pruned candidate volume."""
        if n_probes is not None and n_flip:
            raise ValueError("pass n_flip (Hamming-1) OR n_probes (deep)")
        if n_probes is not None:
            probe = lambda emb: V.lsh_probe_sequence_py(  # noqa: E731
                emb, self.planes, n_probes
            )
        else:
            probe = lambda emb: V.lsh_probe_buckets_py(  # noqa: E731
                emb, self.planes, n_flip
            )
        qrows = [
            {
                "qid": int(qid),
                "qe": list(emb),
                "bucket": int(pb),
            }
            for qid, emb in queries
            for pb in probe(emb)
        ]
        # snapshot= serves the query from a pinned point-in-time state
        # (SortedVectorLog.snapshot) — later ingest/deletes invisible
        return self._score_topk(qrows, k, scoring, snapshot=snapshot)


def read_vector_stream(
    spark: SparkSession, source_dir: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of embedding rows, one file per trigger."""
    return (
        spark.readStream.schema(EMBEDDINGS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def run_incremental_ann(
    spark: SparkSession,
    source_dir: str,
    store_root: str,
    *,
    query_ids_below: int,
    k: int,
    timeout_sec: float = 300,
) -> DataFrame:
    """Drive a vector file-stream into the store via foreachBatch until
    drained; returns the top-k frame over the accumulated index."""
    from doreisa_spark.streaming.structured import run_foreach_batch

    store = LSHVectorStore(spark, store_root)
    stream = read_vector_stream(spark, source_dir)
    run_foreach_batch(
        stream,
        lambda df, bid: store.process_batch(df, bid),
        timeout_sec=timeout_sec,
    )
    return store.query_topk(query_ids_below, k)
