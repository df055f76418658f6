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


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
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
