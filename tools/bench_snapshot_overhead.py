"""Measure what snapshots COST (r11): create_snapshot is claimed
metadata-only — this prices the claim on a long-lived store. Protocol:
stream N batches (2k rows each, default 128) through a
tiered-compacted log, pinning a snapshot every 4 batches (32 retained
snapshots at the default — a generous retention window), then measure:

- create_snapshot wall (the manifest RMW);
- manifest size with 32 snapshots retained vs after expire_snapshots;
- live-read wall with 32 snapshots retained vs none (snapshots must
  not tax the live read path at all — they're consulted only by _gc
  and read_snapshot);
- pinned-vs-live disk bytes (the real retention cost: old segments GC
  would otherwise reclaim);
- read_snapshot wall for the oldest pin (time travel across ~250
  batches of subsequent history and many compactions).

Usage: python tools/bench_snapshot_overhead.py [out.json] [batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from doreisa_spark.session import get_spark  # noqa: E402
from doreisa_spark.streaming import batch_commit as BC  # noqa: E402

DDL = "k bigint, v string"


def _dir_bytes(root: str) -> int:
    total = 0
    for base, _, files in os.walk(root):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(base, f))
            except OSError:
                pass
    return total


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_snapshots_r11.json"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spark = get_spark("snapshot_overhead")
    base = "/dev/shm" if Path("/dev/shm").is_dir() else None
    scratch = tempfile.mkdtemp(prefix="snapbench_", dir=base)
    root = f"{scratch}/log"
    report: dict = {"n_batches": n_batches, "rows_per_batch": 2000}
    try:
        create_walls, sids = [], []
        for b in range(n_batches):
            rows = [(b * 2000 + i, "x" * 40) for i in range(2000)]
            BC.commit_batch(
                spark.createDataFrame(rows, DDL).coalesce(1), root, b,
                mode=BC.MANIFEST,
            )
            if b % 4 == 3:
                t0 = time.perf_counter()
                sids.append(BC.create_snapshot(root))
                create_walls.append(time.perf_counter() - t0)
            if b % 32 == 31:
                BC.compact_tiered(spark, root, DDL, keep_last=1,
                                  mode=BC.MANIFEST, order_by=["k"])
        report["snapshots_retained"] = len(sids)
        report["create_snapshot_ms_mean"] = round(
            1000 * sum(create_walls) / len(create_walls), 2
        )
        report["create_snapshot_ms_max"] = round(1000 * max(create_walls), 2)
        man_path = os.path.join(root, "_manifest.json")
        report["manifest_bytes_with_snapshots"] = os.path.getsize(man_path)
        total_rows = n_batches * 2000

        def live_read_wall() -> float:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                assert BC.read_committed(spark, root, DDL).count() == total_rows
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        report["live_read_s_with_snapshots"] = live_read_wall()
        t0 = time.perf_counter()
        oldest = BC.read_snapshot(spark, root, DDL, sids[0]).count()
        report["read_oldest_snapshot_s"] = round(time.perf_counter() - t0, 3)
        report["oldest_snapshot_rows"] = oldest
        report["disk_bytes_with_snapshots"] = _dir_bytes(root)
        dropped = BC.expire_snapshots(root, keep_last=0)
        assert len(dropped) == len(sids)
        report["manifest_bytes_after_expire"] = os.path.getsize(man_path)
        report["disk_bytes_after_expire"] = _dir_bytes(root)
        report["live_read_s_after_expire"] = live_read_wall()
        print(json.dumps(report, indent=1))
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
