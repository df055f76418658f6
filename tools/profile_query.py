"""Noise-robust per-query profile: wall time + task-metric totals.

    python tools/profile_query.py <name>[,<name>...] [sf_dir] [passes]

Runs each named registry query `passes` times against a session with the
Spark event log enabled, then parses the event log to report, per pass:
wall seconds, executor run/CPU time summed over tasks, task/stage/job
counts, and shuffle read/write bytes. On a host whose scheduler charges
erratic kernel-side stalls to thread-heavy stages (this sandbox), summed
executor CPU time and the structural counts are far steadier than wall
time, so A/B comparisons use those first and wall min-of-N second.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doreisa_spark.registry import EXTENDED, REGISTRY, _ensure_loaded  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402


def parse_eventlog(path: str) -> dict[str, dict]:
    """Aggregate task metrics per job-group description marker."""
    out: dict[str, dict] = {}
    cur = None
    stage_to_marker: dict[int, str] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                cur = props.get("spark.job.description") or "unlabeled"
                d = out.setdefault(cur, dict(
                    jobs=0, stages=0, tasks=0, run_ms=0, cpu_ms=0,
                    shuffle_read=0, shuffle_write=0, input_bytes=0))
                d["jobs"] += 1
                for sid in ev.get("Stage IDs", []):
                    stage_to_marker[sid] = cur
            elif kind == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                m = stage_to_marker.get(info["Stage ID"])
                if m:
                    out[m]["stages"] += 1
            elif kind == "SparkListenerTaskEnd":
                m = stage_to_marker.get(ev["Stage ID"])
                if m is None:
                    continue
                d = out[m]
                d["tasks"] += 1
                tm = ev.get("Task Metrics") or {}
                d["run_ms"] += tm.get("Executor Run Time", 0)
                d["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                srm = tm.get("Shuffle Read Metrics") or {}
                d["shuffle_read"] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                d["shuffle_write"] += swm.get("Shuffle Bytes Written", 0)
                im = tm.get("Input Metrics") or {}
                d["input_bytes"] += im.get("Bytes Read", 0)
    return out


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import shutil

    log_dir = "/tmp/spark-events-profile"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    _ensure_loaded()
    qs = {**EXTENDED, **REGISTRY}
    spark = get_spark("profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{log_dir}",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    # warm like bench.py does
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    from doreisa_spark.plans.chunked import ChunkedArray, GridMeta, ramp_chunk
    spark.conf.set("spark.doreisa.chunkSplitBytes", "1")  # full-width warm
    warm_meta = GridMeta("warm", (64,), (256,))
    for _ in range(3):
        ChunkedArray.from_function(spark, warm_meta, ramp_chunk).sum().collect()
    spark.conf.unset("spark.doreisa.chunkSplitBytes")

    walls: dict[str, list[float]] = {}
    for p in range(passes):
        for name in names:
            marker = f"{name}#p{p}"
            spark.sparkContext.setJobDescription(marker)
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop").save()
            walls.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()

    app_id = spark.sparkContext.applicationId
    spark.stop()
    # Spark 4 may write a rolling event-log DIRECTORY (eventlog_v2_<app>)
    # holding events_* files; fall back to the flat single-file layout.
    candidates = []
    for entry in os.listdir(log_dir):
        full = os.path.join(log_dir, entry)
        if os.path.isdir(full):
            candidates += [os.path.join(full, f) for f in sorted(os.listdir(full))
                           if f.startswith("events")]
        elif entry.startswith(app_id):
            candidates.append(full)
    per_marker: dict[str, dict] = {}
    for path in candidates:
        for k, v in parse_eventlog(path).items():
            if k in per_marker:
                for kk in v:
                    per_marker[k][kk] += v[kk]
            else:
                per_marker[k] = v

    for name in names:
        print(f"\n== {name}  walls={walls[name]}  min={min(walls[name])}")
        for p in range(passes):
            d = per_marker.get(f"{name}#p{p}")
            if not d:
                continue
            print(f"  pass{p}: jobs={d['jobs']} stages={d['stages']} "
                  f"tasks={d['tasks']} run={d['run_ms']}ms cpu={d['cpu_ms']}ms "
                  f"shW={d['shuffle_write']/1024:.0f}K shR={d['shuffle_read']/1024:.0f}K "
                  f"in={d['input_bytes']/1024:.0f}K")


if __name__ == "__main__":
    main()
