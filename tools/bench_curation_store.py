"""Admission-probe latency vs seen-store size for the curation store.

Completes the three-store curve set (dedup: bench_incremental_store.py,
ANN: bench_ann_store.py). The curation store's per-batch history touch
is the fingerprint admission probe; this tool measures the SHIPPED
broadcast-semi shape (`CurationStore._admit`: batch fp set broadcasts
into a left-semi probe of seen, the batch-bounded hit set broadcasts
back for the anti-join — history is scanned map-only, never shuffled)
against the naive counterfactual (`batch ANTI JOIN seen`, which
shuffles the ever-growing seen log on fp every batch because a
left-anti join can only broadcast its right side).

Protocol (mirrors the other two tools):
- seen history bulk-loaded as one committed batch of JVM-generated
  md5 fingerprints (fp = md5('doc-<id>'), the store's own formula over
  synthetic texts, so batch overlap is controllable by id range);
- the probe batch is 500 docs, half already-seen / half fresh (both
  probe outcomes exercised);
- measured per store size, min-of-2 each: admit_semi_s (shipped),
  admit_naive_s (counterfactual), plus full process_batch_s (admission
  + quality filter + two commits);
- **shuffle bytes written per probe** (Spark UI REST, per-shape stage
  delta) — the metric that RULES at deployment scale: on this box's
  tmpfs a 1.6 GB/batch shuffle is nearly free so wall clock overlaps,
  but on a cluster the naive shape pays that history-sized
  write+network on EVERY micro-batch while the semi shape's is zero by
  construction (0 exchanges on the history side — the plan-shape test
  pins it).

Output: one JSON line for BASELINE.md.

r10 additions (the r9 verdict's 50M wall profile): per size the tool
also measures

- scan_floor_s: decoding every fp in the history exactly once
  (`max(fp)` — count(*) would read only parquet metadata), the
  irreducible cost ANY admission probe pays: md5 fps are uniform, so
  no layout can row-group-skip a 500-term probe out of a 50M log;
- admit_inset_s: the batch fp set collected driver-side (bounded:
  ≤ batch, the dedup store's shingle-probe discipline) and evaluated
  as a codegen InSet FILTER at the scan instead of a broadcast-hash
  join probe — where the semi probe's wall above the scan floor goes
  if the BHJ per-row probe is the cost;

and a medium argument: scratch on /dev/shm (default) or /tmp (disk) —
the ANN-store-style disk-medium counterpoint where the naive shape
additionally pays its history-sized shuffle write through the disk.

Usage: python tools/bench_curation_store.py [out.json] [max_mult] [shm|disk]
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

from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming import batch_commit as BC  # noqa: E402
from doreisa_spark.streaming.incremental_curation import CurationStore  # noqa: E402

BATCH = 500


def synth_docs(spark, lo: int, n: int):
    """Document rows whose fp formula matches the store's md5(text)."""
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("text"),
    )


def fps_of(docs):
    return docs.select(F.md5(F.col("text").cast("binary")).alias("fp"))


def _fresh_process(store, hist):
    """process_batch thunk with fresh doc ids AND a fresh auto batch id
    per pass — reused ids would be fully admission-rejected on the
    second pass (different, cheaper work)."""
    state = [0]

    def run():
        state[0] += 1
        store.process_batch(
            synth_docs(store.spark, hist + BATCH * state[0], BATCH)
        )

    return run


def best_of(fn, passes: int = 2) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def shuffle_meter(spark):
    """Returns fn(df) -> (wall_s, shuffle_write_bytes) using the UI REST
    stage metrics (the session must run with spark.ui.enabled=true)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def snapshot():
        data = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
        )
        return {s["stageId"]: s.get("shuffleWriteBytes", 0) for s in data}

    def run(df):
        before = snapshot()
        t0 = time.monotonic()
        df.count()
        wall = round(time.monotonic() - t0, 3)
        time.sleep(1.0)  # let the status store settle
        after = snapshot()
        sw = sum(v for k, v in after.items() if k not in before)
        return wall, sw

    return run


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    max_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    medium = sys.argv[3] if len(sys.argv) > 3 else "shm"
    spark = get_spark(
        "bench-curation-store", extra_conf={"spark.ui.enabled": "true"}
    )
    meter = shuffle_meter(spark)
    if medium == "disk":
        base = "/tmp"
    else:
        base = "/dev/shm" if Path("/dev/shm").is_dir() else None
    scratch = tempfile.mkdtemp(prefix="cur_store_bench_", dir=base)
    rows = []
    try:
        mult = 1
        while mult <= max_mult:
            hist = BATCH * mult
            root = str(Path(scratch) / f"m{mult}")
            store = CurationStore(spark, root)
            # bulk-load seen (fp-only log; ~64 B/row) in ~32 MiB files
            nf = max(1, (hist * 64) // (32 << 20))
            BC.commit_batch(
                fps_of(synth_docs(spark, 0, hist)).repartition(nf),
                store._seen,
                0,
            )
            # probe batch: half already-seen ids, half fresh
            batch = synth_docs(spark, hist - BATCH // 2, BATCH)
            fp = F.md5(F.col("text").cast("binary")).alias("fp")
            canon = batch.select("doc_id", "lang", "text", fp)

            naive = canon.join(store.seen(before=1), "fp", "left_anti")
            semi = store._admit(canon, batch_id=1)
            # InSet variant: bounded driver collect of the batch fps,
            # membership test as a codegen filter at the scan (no join
            # machinery on the history side at all)
            from doreisa_spark.operators.broadcast import bcast

            batch_fps = [r["fp"] for r in canon.select("fp").distinct().collect()]
            inset_hits = store.seen(before=1).where(F.col("fp").isin(batch_fps))
            inset = canon.join(bcast(inset_hits, bounded=True), "fp", "left_anti")
            n_semi = semi.count()
            assert n_semi == BATCH // 2, n_semi  # exactly the fresh half
            assert naive.count() == n_semi
            assert inset.count() == n_semi
            seen_h = store.seen(before=1)
            scan_floor = best_of(
                lambda: seen_h.agg(F.max("fp")).collect()
            )
            semi_w, semi_b = min(meter(semi) for _ in range(2))
            naive_w, naive_b = min(meter(naive) for _ in range(2))
            inset_w, inset_b = min(meter(inset) for _ in range(2))
            row = {
                "mult": mult,
                "history_fps": hist,
                "medium": medium,
                "scan_floor_s": scan_floor,
                "admit_semi_s": semi_w,
                "admit_inset_s": inset_w,
                "admit_naive_s": naive_w,
                "semi_shuffle_mb": round(semi_b / 2**20, 1),
                "inset_shuffle_mb": round(inset_b / 2**20, 1),
                "naive_shuffle_mb": round(naive_b / 2**20, 1),
                "process_batch_s": best_of(_fresh_process(store, hist)),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            mult *= 10
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    result = {"batch_docs": BATCH, "rows": rows}
    line = json.dumps(result)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")


if __name__ == "__main__":
    main()
