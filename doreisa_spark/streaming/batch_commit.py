"""Idempotent (exactly-once) batch appends on plain parquet.

The incremental stores (incremental_dedup / incremental_ann /
incremental_curation) append per-micro-batch results to filesystem
parquet. Structured Streaming's foreachBatch contract is AT-LEAST-ONCE:
after a crash between the sink write and the checkpoint commit, the same
batch id is redelivered — a plain ``mode("append")`` would duplicate that
batch's rows (the documented r6 hole, incremental_dedup.py's module
docstring deferred it to "Delta/Iceberg keyed by batch id").

This module closes it without a table format, using the classic
rename-commit protocol (the same trick FileStreamSink/HadoopMapReduce
commit protocols use):

- every batch writes to ``root/_staging_b<id>_<nonce>`` (underscore prefix
  = invisible to Spark's file listing), then atomically renames to
  ``root/b<id>``. POSIX rename fails if the target exists, so a redelivery
  COMMITS NOTHING — the first writer wins, duplicates are structurally
  impossible;
- reads enumerate committed batch directories explicitly; ``before=N``
  restricts to batches < N so a REPLAYED batch recomputes against exactly
  the pre-batch store state even if a crash left some of the batch's own
  outputs committed (deterministic replay → the skipped re-commit is
  guaranteed byte-equivalent to what's already there).

Long streams accumulate one directory (and its small parquet files) per
batch; ``compact`` merges the committed prefix into one merged segment
with crash-safe bookkeeping: the merged segment commits first (under a
nonce name invisible to readers), then a MANIFEST file — the single
source of truth, replaced atomically — flips readers over, and only then
are the merged-away batch dirs reclaimed (best-effort; a crash leaves
them, and readers IGNORE any batch dir at-or-below the manifest horizon,
so no sequence of crashes can double-read or lose a batch). Readers see
``manifest segments + batch dirs ABOVE the horizon``; redelivery replay
(``before=``) keeps working because streaming only ever redelivers the
LAST batch and ``keep_last`` preserves at least that many recent batches
un-compacted (a ``before`` at or below the horizon raises — that replay
depth is explicitly unsupported after compaction).

On an object store without atomic rename (S3), a deployment swaps
``_rename_commit`` for a manifest-file commit or a Delta/Iceberg
transaction; every call site goes through this module, so the swap is one
function. HDFS/POSIX (the shared-filesystem HPC deployments the staged
ingest targets) get exactly-once as-is.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_BATCH_RE = re.compile(r"^b(\d{12})$")
_MERGED_RE = re.compile(r"^m(\d{12})_[0-9a-f]{8}$")
_MANIFEST = "_manifest.json"


def _batch_dir(root: str, batch_id: int) -> str:
    return os.path.join(root, f"b{batch_id:012d}")


def _manifest(root: str) -> "dict | None":
    try:
        with open(os.path.join(root, _MANIFEST)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _horizon(root: str) -> int:
    """Highest batch id folded into a merged segment (-1 = none)."""
    m = _manifest(root)
    return int(m["horizon"]) if m else -1


def committed_ids(root: str, *, before: int | None = None) -> list[int]:
    """Sorted batch ids with a committed directory under ``root``,
    EXCLUDING ids already folded into a compacted segment (their dirs may
    linger after a crash mid-cleanup; the manifest is the truth)."""
    if not os.path.isdir(root):
        return []
    h = _horizon(root)
    out = []
    for name in os.listdir(root):
        m = _BATCH_RE.match(name)
        if m:
            bid = int(m.group(1))
            if bid > h and (before is None or bid < before):
                out.append(bid)
    return sorted(out)


def is_committed(root: str, batch_id: int) -> bool:
    """A batch folded into a compacted segment stays committed even after
    its directory is reclaimed."""
    return batch_id <= _horizon(root) or os.path.isdir(_batch_dir(root, batch_id))


def next_batch_id(root: str) -> int:
    """Auto-increment for driver-loop callers that don't carry stream
    batch ids: one past the highest committed id (incl. compacted)."""
    ids = committed_ids(root)
    top = max([_horizon(root)] + ids)
    return top + 1


def read_committed(
    spark: SparkSession, root: str, ddl: str, *, before: int | None = None
) -> DataFrame:
    """Union of the compacted segments and all committed batch
    directories above the horizon (< ``before`` if given) — an
    explicitly-enumerated read, so uncommitted staging, a replayed
    batch's own partial commits, and crash-leftover merged-away dirs are
    never visible."""
    man = _manifest(root)
    dirs: list[str] = []
    if man:
        if before is not None and before <= int(man["horizon"]):
            raise ValueError(
                f"replay before batch {before} is unsupported: batches "
                f"<= {man['horizon']} are compacted (raise keep_last if "
                "deeper redelivery is possible in this deployment)"
            )
        dirs += [os.path.join(root, d) for d in man["segments"]]
    dirs += [_batch_dir(root, b) for b in committed_ids(root, before=before)]
    if not dirs:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*dirs)


def compact(
    spark: SparkSession, root: str, ddl: str, *, keep_last: int = 2,
    target_files: int = 1,
) -> bool:
    """Fold the committed batch prefix (everything except the newest
    ``keep_last`` batches) plus any existing merged segments into ONE
    merged segment of ``target_files`` parquet files (raise it when the
    folded state is large — the default suits the bounded per-store
    state). Crash-safe by ordering (see module docstring): segment
    commit → atomic manifest replace → best-effort dir cleanup. Returns
    True if a new segment was written, False if there was nothing to
    fold. Single-writer per store (foreachBatch is serial), like
    commit_batch."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the redeliverable tail)")
    if not os.path.isdir(root):
        return False
    man = _manifest(root)
    old_segments = list(man["segments"]) if man else []
    ids = committed_ids(root)
    fold = ids[:-keep_last] if len(ids) > keep_last else []
    if not fold and len(old_segments) <= 1:
        return False  # nothing to merge that isn't already one segment
    new_horizon = fold[-1] if fold else _horizon(root)
    src = [os.path.join(root, s) for s in old_segments] + [
        _batch_dir(root, b) for b in fold
    ]
    seg_name = f"m{new_horizon:012d}_{uuid.uuid4().hex[:8]}"
    staging = os.path.join(root, f"_compact_{seg_name}")
    try:
        spark.read.schema(ddl).parquet(*src).coalesce(
            max(1, target_files)
        ).write.mode("overwrite").parquet(staging)
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    os.rename(staging, os.path.join(root, seg_name))
    # atomic flip: readers switch to the new segment in one os.replace
    tmp = os.path.join(root, f"_manifest_tmp_{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump({"horizon": int(new_horizon), "segments": [seg_name]}, f)
    os.replace(tmp, os.path.join(root, _MANIFEST))
    # best-effort reclamation — crash-leftovers are ignored by readers
    # (batch ids <= horizon, merged names not in the manifest), and any
    # stale sub-horizon batch dir a crashed cleanup left behind goes too
    for d in src:
        shutil.rmtree(d, ignore_errors=True)
    for name in os.listdir(root):
        if _MERGED_RE.match(name) and name != seg_name:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        mb = _BATCH_RE.match(name)
        if mb and int(mb.group(1)) <= new_horizon:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return True


def commit_batch(df: DataFrame, root: str, batch_id: int) -> bool:
    """Write ``df`` as batch ``batch_id`` under ``root`` exactly once.

    Returns True if this call committed, False if the batch was already
    committed (redelivery) — in which case nothing is written and the
    existing directory is untouched."""
    dest = _batch_dir(root, batch_id)
    if os.path.isdir(dest):
        return False
    os.makedirs(root, exist_ok=True)
    staging = os.path.join(root, f"_staging_b{batch_id:012d}_{uuid.uuid4().hex[:8]}")
    try:
        df.write.mode("overwrite").parquet(staging)
    except Exception:
        # a failed write must not strand an orphan staging dir (invisible
        # to readers, but it would accumulate across crash-retry loops)
        shutil.rmtree(staging, ignore_errors=True)
        raise
    try:
        os.rename(staging, dest)  # atomic; fails if dest exists
        return True
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        return False
