"""Read-planning cost of a long-running incremental store, before vs
after compaction (r7 verdict ask #6's measurement half; the default-on
``compact_every=64`` is the code half).

A foreachBatch stream commits one directory per micro-batch
(streaming/batch_commit.py). Reading the store unions every committed
dir — each contributes a separate parquet footer read + file-listing
round trip at PLANNING time, so a 500-batch store pays ~500 footer
fetches per probe even when the data is tiny. Compaction folds the
prefix into one sorted segment; this tool measures exactly that
difference on a synthetic 500-batch store:

- build: 500 committed batches in BOTH commit modes (rename + manifest),
  each batch a small parquet file written directly in the committed
  layout (pyarrow — we are measuring the READ side, not Spark's write);
- measure: wall time of ``read_committed(...).count()`` min-of-N, i.e.
  listing + footer/schema reads + scan planning + the trivial scan;
- compact with the stores' default posture (keep_last=2, one segment),
  re-measure.

    python tools/bench_compaction_read.py [n_batches] [passes]

Prints one JSON line. /dev/shm scratch when present (same convention as
the other store benches: planning cost, not disk bandwidth, is the
object of measurement).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doreisa_spark import streaming  # noqa: F401  (package init)
from doreisa_spark.session import get_spark
from doreisa_spark.streaming import batch_commit as BC

DDL = "band_id int, sig string, doc_id bigint"


def _build(root: str, n: int, mode: str) -> None:
    """The committed on-disk layout batch_commit produces, minus the
    Spark write path: rename mode = b<id> dirs; manifest mode = nonce
    dirs named by the manifest."""
    os.makedirs(root, exist_ok=True)
    man = {"mode": mode, "horizon": -1, "segments": [], "batches": {}}
    for b in range(n):
        t = pa.table(
            {
                "band_id": pa.array([b % 8], pa.int32()),
                "sig": pa.array([f"sig{b:06d}"]),
                "doc_id": pa.array([b], pa.int64()),
            }
        )
        if mode == BC.RENAME:
            d = os.path.join(root, f"b{b:012d}")
        else:
            name = f"d{b:012d}_{'0' * 8}"
            man["batches"][str(b)] = name
            d = os.path.join(root, name)
        os.makedirs(d)
        pq.write_table(t, os.path.join(d, "part-00000.parquet"))
    if mode == BC.MANIFEST:
        BC._manifest_replace(root, man)


def _probe_s(spark, root: str, passes: int) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.monotonic()
        BC.read_committed(spark, root, DDL).count()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    scratch = tempfile.mkdtemp(prefix="compact_read_", dir=base)
    spark = get_spark("bench-compaction-read")
    out: dict = {"n_batches": n, "passes": passes}
    try:
        for mode in (BC.RENAME, BC.MANIFEST):
            root = os.path.join(scratch, mode)
            _build(root, n, mode)
            pre = _probe_s(spark, root, passes)
            t0 = time.monotonic()
            assert BC.compact(spark, root, DDL, keep_last=2, mode=mode)
            compact_s = round(time.monotonic() - t0, 3)
            post = _probe_s(spark, root, passes)
            df = BC.read_committed(spark, root, DDL)
            assert df.count() == n, "compaction lost rows"
            out[mode] = {
                "read_before_s": pre,
                "read_after_s": post,
                "speedup": round(pre / post, 2) if post else None,
                "compact_s": compact_s,
            }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
