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

On an object store without atomic rename (S3), a deployment swaps
``_rename_commit`` for a manifest-file commit or a Delta/Iceberg
transaction; every call site goes through this module, so the swap is one
function. HDFS/POSIX (the shared-filesystem HPC deployments the staged
ingest targets) get exactly-once as-is.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_BATCH_RE = re.compile(r"^b(\d{12})$")


def _batch_dir(root: str, batch_id: int) -> str:
    return os.path.join(root, f"b{batch_id:012d}")


def committed_ids(root: str, *, before: int | None = None) -> list[int]:
    """Sorted batch ids with a committed directory under ``root``."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _BATCH_RE.match(name)
        if m:
            bid = int(m.group(1))
            if before is None or bid < before:
                out.append(bid)
    return sorted(out)


def is_committed(root: str, batch_id: int) -> bool:
    return os.path.isdir(_batch_dir(root, batch_id))


def next_batch_id(root: str) -> int:
    """Auto-increment for driver-loop callers that don't carry stream
    batch ids: one past the highest committed id."""
    ids = committed_ids(root)
    return (ids[-1] + 1) if ids else 0


def read_committed(
    spark: SparkSession, root: str, ddl: str, *, before: int | None = None
) -> DataFrame:
    """Union of all committed batch directories (< ``before`` if given) —
    an explicitly-enumerated read, so uncommitted staging and a replayed
    batch's own partial commits are never visible."""
    dirs = [_batch_dir(root, b) for b in committed_ids(root, before=before)]
    if not dirs:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*dirs)


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
