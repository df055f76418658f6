"""Per-batch latency vs store size for the incremental LSH dedup store.

The r7 verdict's top remaining 100 TB risk: the incremental store's
per-batch probe re-read the FULL committed history, so per-batch cost
grew linearly with the corpus. PrunedLSHSignatureStore (sorted log
segments + touched-key pushdown probes) is the fix; this tool measures
the claim the verdict asked to see:

    per-batch wall time at history sizes 1x / 10x / 100x / 1000x the
    batch, base (full-read) store vs pruned store.

Protocol
--------
- corpus: synthetic distinct-text documents generated INSIDE the JVM
  (hash-derived token sequences, ~40-80 tokens each) — near-zero
  duplicate rate, so the measurement is the PROBE cost, not
  pair-explosion pathology;
- history is bulk-loaded through the same signature/admission
  expressions the store itself runs (minhash_signature_frame + the
  bucket-cap window) and committed as one batch, then compacted to the
  steady folded state (the pruned store's segments sorted on the probe
  keys) — identical store content to a streamed load at a fraction of
  the build time;
- parquet.block.size is lowered to 1 MiB for the run so the store has
  row-group granularity at bench sizes (at production sizes the default
  128 MiB gives the same many-groups shape);
- measured: wall time of process_batch for 2 fresh 500-doc batches per
  configuration; min reported (same min-of-N protocol as bench.py).

Output: one JSON line {"batch_docs": B, "rows": [{store, mult,
history_docs, passes:[s,s], best_s}, ...]} — BASELINE.md's r8 curve.

Usage: python tools/bench_incremental_store.py [out.json] [max_mult]

Stream mode (r8 verdict ask #6 — the r8 curve's bulk-load shortcut hid
the compaction write-amplification term; this measures it):

    python tools/bench_incremental_store.py out.json --stream N [policy]

streams N real 500-doc batches through the PrunedLSHSignatureStore
(compaction applied explicitly every 64 batches — the stores' shipped
default cadence) under ``policy`` = ``tiered`` (the r9 default:
batch_commit.compact_tiered), ``full`` (the r8 default:
batch_commit.compact full rewrite) or ``both`` (sequential, same
session — the comparable pair). Per batch it records the cost
DECOMPOSITION: probe_s (signature + admission — the eager persists
inside process_batch), commit_s (verify + exactly-once writes, timed
via a wrapper on batch_commit.commit_batch), compact_s and
compact_write_mb (bytes the policy rewrote). The report aggregates per
history decade (batches 1-9 / 10-99 / 100-999 / 1000+): mean per-batch
cost of each component and the amortized compaction MB/batch — the
number that is flat under tiering and grows linearly under full
rewrite.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

from doreisa_spark.queries.dedup import _MAX_BUCKET, minhash_signature_frame  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming import batch_commit as BC  # noqa: E402
from doreisa_spark.streaming.incremental_dedup import (  # noqa: E402
    _MEMBERS_DDL,
    _PAIRS_DDL,
    _SHINGLES_DDL,
    LSHSignatureStore,
    PrunedLSHSignatureStore,
)

B = 500  # batch size (docs)
MULTS = (1, 10, 100, 1000)  # history = mult * B


def _mk_docs(spark, start: int, n: int):
    """Deterministic distinct-text docs, generated JVM-side: ~40-80
    hash-derived vocabulary tokens per doc (vocab 397)."""
    text = (
        "concat_ws(' ', transform(sequence(1, 40 + cast(pmod(xxhash64(id), 41) "
        "as int)), j -> concat('w', pmod(xxhash64(id, j), 397))))"
    )
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.expr(text).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
        F.length(F.expr(text)).cast("bigint").alias("n_chars"),
    )


def _bulk_load(spark, store, hist: int) -> None:
    """History as ONE committed batch through the store's own signature +
    admission expressions (identical state to a streamed load with no
    cross-batch duplicates, which the generator guarantees)."""
    sig = minhash_signature_frame(_mk_docs(spark, 0, hist))
    bands = sig.select("doc_id", F.posexplode("band_sigs").alias("band_id", "sig"))
    wb = W.partitionBy("band_id", "sig").orderBy("doc_id")
    admitted = (
        bands.withColumn("__r", F.row_number().over(wb))
        .where(F.col("__r") <= F.lit(_MAX_BUCKET))
        .select("band_id", "sig", "doc_id")
    )
    BC.commit_batch(
        store._members_to_commit(admitted), store.members_dir, 0
    )
    kept = sig.join(
        admitted.select("doc_id").distinct(), "doc_id", "left_semi"
    ).select("doc_id", "shingles")
    BC.commit_batch(store._shingles_to_commit(kept), store.shingles_dir, 0)
    BC.commit_batch(spark.createDataFrame([], _PAIRS_DDL), store.pairs_dir, 0)


def _compact_all(spark, store, order: bool):
    kw = dict(keep_last=1, target_files=8)
    BC.compact(spark, store.members_dir, _MEMBERS_DDL,
               order_by=["sig"] if order else None, **kw)
    BC.compact(spark, store.shingles_dir, _SHINGLES_DDL,
               order_by=["doc_id"] if order else None, **kw)
    BC.compact(spark, store.pairs_dir, _PAIRS_DDL, **kw)


_LOGS = lambda s: (  # noqa: E731 — (root, ddl, order_by) per store log
    (s.members_dir, _MEMBERS_DDL, ["sig"]),
    (s.shingles_dir, _SHINGLES_DDL, ["doc_id"]),
    (s.pairs_dir, _PAIRS_DDL, None),
)


def _segment_mb(root: str) -> dict:
    man = BC._manifest_load(root) or {}
    return dict(man.get("segment_bytes", {}))


def _policy_compact(spark, store, policy: str) -> tuple[float, float]:
    """Apply one compaction pass under the given policy; return
    (seconds, MB written by the pass)."""
    t0 = time.perf_counter()
    written = 0
    for root, ddl, ob in _LOGS(store):
        if policy == "tiered":
            st = BC.compact_tiered(spark, root, ddl, order_by=ob)
            written += st["flushed_bytes"] + st["merged_bytes"]
        else:  # full rewrite (the r8 default behavior)
            before = set(_segment_mb(root))
            if BC.compact(spark, root, ddl, order_by=ob):
                after = _segment_mb(root)
                written += sum(sz for s, sz in after.items() if s not in before)
    return time.perf_counter() - t0, written / 2**20


def stream_mode(spark, n_batches: int, policy: str, out_path: "str | None"):
    """Stream N real batches; decompose per-batch cost; aggregate per
    history decade. Both policies run in ONE session when policy='both'
    (same-session ratios are the only comparable kind on this box)."""
    policies = ("tiered", "full") if policy == "both" else (policy,)
    tmp = tempfile.mkdtemp(prefix="incr_store_stream_", dir="/dev/shm")
    report = {"batch_docs": B, "n_batches": n_batches, "compact_every": 64,
              "policies": {}}
    orig_commit = BC.commit_batch
    try:
        for pol in policies:
            root = f"{tmp}/{pol}"
            store = PrunedLSHSignatureStore(spark, root, compact_every=None)
            commit_acc = [0.0]

            def timed_commit(*a, **k):
                t0 = time.perf_counter()
                r = orig_commit(*a, **k)
                commit_acc[0] += time.perf_counter() - t0
                return r

            BC.commit_batch = timed_commit
            per_batch = []
            t_start = time.perf_counter()
            for b in range(n_batches):
                commit_acc[0] = 0.0
                t0 = time.perf_counter()
                store.process_batch(_mk_docs(spark, b * B, B), b)
                proc = time.perf_counter() - t0
                c_s, c_mb = (0.0, 0.0)
                if b % 64 == 63:
                    c_s, c_mb = _policy_compact(spark, store, pol)
                per_batch.append(
                    (proc - commit_acc[0], commit_acc[0], c_s, c_mb)
                )
                if b % 64 == 63:
                    probe, commit, cs, cmb = per_batch[-1]
                    print(
                        f"# {pol} b={b} probe={probe:.2f} commit={commit:.2f}"
                        f" compact={cs:.2f}s {cmb:.1f}MB",
                        file=sys.stderr, flush=True,
                    )
            BC.commit_batch = orig_commit
            total_s = time.perf_counter() - t_start
            decades = {}
            for lo, hi, name in ((1, 10, "1-9"), (10, 100, "10-99"),
                                 (100, 1000, "100-999"),
                                 (1000, 10**9, "1000+")):
                win = per_batch[lo:min(hi, len(per_batch))]
                if not win:
                    continue
                nb = len(win)
                decades[name] = {
                    "batches": nb,
                    "probe_s_mean": round(sum(w[0] for w in win) / nb, 3),
                    "commit_s_mean": round(sum(w[1] for w in win) / nb, 3),
                    "compact_s_total": round(sum(w[2] for w in win), 1),
                    "compact_mb_total": round(sum(w[3] for w in win), 1),
                    "compact_mb_per_batch": round(
                        sum(w[3] for w in win) / nb, 3
                    ),
                    "total_s_per_batch": round(
                        sum(w[0] + w[1] + w[2] for w in win) / nb, 3
                    ),
                }
            segs = sum(
                len((BC._manifest_load(r) or {}).get("segments", []))
                for r, _, _ in _LOGS(store)
            )
            report["policies"][pol] = {
                "wall_s": round(total_s, 1),
                "compact_mb_total": round(sum(w[3] for w in per_batch), 1),
                "compact_s_total": round(sum(w[2] for w in per_batch), 1),
                "final_segments": segs,
                "decades": decades,
            }
            print(f"# {pol}: {json.dumps(report['policies'][pol])}",
                  file=sys.stderr, flush=True)
            shutil.rmtree(root, ignore_errors=True)
    finally:
        BC.commit_batch = orig_commit
        shutil.rmtree(tmp, ignore_errors=True)
    line = json.dumps(report)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    if len(sys.argv) > 2 and sys.argv[2] == "--stream":
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
        policy = sys.argv[4] if len(sys.argv) > 4 else "both"
        spark = get_spark("bench-incremental-store-stream")
        spark.sparkContext._jsc.hadoopConfiguration().setInt(
            "parquet.block.size", 1 << 20
        )
        try:
            stream_mode(spark, n, policy, out_path)
        finally:
            spark.stop()
        return
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else MULTS[-1]
    spark = get_spark("bench-incremental-store")
    # row-group granularity at bench sizes (see module docstring)
    spark.sparkContext._jsc.hadoopConfiguration().setInt(
        "parquet.block.size", 1 << 20
    )
    tmp = tempfile.mkdtemp(prefix="incr_store_bench_", dir="/dev/shm")
    rows = []
    try:
        for mult in [m for m in MULTS if m <= max_mult]:
            hist = mult * B
            for kind in ("base", "pruned"):
                root = f"{tmp}/{kind}_{mult}"
                store = (
                    LSHSignatureStore(spark, root, compact_every=None)
                    if kind == "base"
                    else PrunedLSHSignatureStore(spark, root, compact_every=None)
                )
                t_load = time.perf_counter()
                # the commit hooks already produce the steady compacted
                # layout (single sorted file per log for the pruned
                # store), so no explicit compact pass is needed here
                _bulk_load(spark, store, hist)
                load_s = round(time.perf_counter() - t_load, 1)
                passes = []
                bid = 1
                for p in range(2):
                    batch = _mk_docs(spark, (1 + p) * 10_000_000, B)
                    t0 = time.perf_counter()
                    store.process_batch(batch, bid)
                    passes.append(round(time.perf_counter() - t0, 3))
                    bid += 1
                row = {
                    "store": kind,
                    "mult": mult,
                    "history_docs": hist,
                    "load_s": load_s,
                    "passes": passes,
                    "best_s": min(passes),
                }
                rows.append(row)
                print(f"# {row}", file=sys.stderr)
                shutil.rmtree(root, ignore_errors=True)
        report = {"batch_docs": B, "rows": rows}
        line = json.dumps(report)
        print(line)
        if out_path:
            Path(out_path).write_text(line + "\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
