"""Idempotent (exactly-once) batch appends on plain parquet.

The incremental stores (incremental_dedup / incremental_ann /
incremental_curation) append per-micro-batch results to filesystem
parquet. Structured Streaming's foreachBatch contract is AT-LEAST-ONCE:
after a crash between the sink write and the checkpoint commit, the same
batch id is redelivered — a plain ``mode("append")`` would duplicate that
batch's rows (the documented r6 hole, incremental_dedup.py's module
docstring deferred it to "Delta/Iceberg keyed by batch id").

This module closes it without a table format, in either of two commit
modes selected per store (the mode is recorded in the store's manifest,
so readers self-configure):

**rename mode** (default — POSIX / HDFS, atomic directory rename): the
classic rename-commit protocol (the same trick FileStreamSink /
HadoopMapReduce commit protocols use):

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

**manifest mode** (object stores without atomic rename — S3 and friends,
the r7 verdict's documented hole): nothing is ever renamed. Each batch
writes its parquet directly under a UNIQUE nonce directory
``root/d<id>_<nonce>`` (unique ⇒ no writer ever collides), and the commit
point is one atomic replace of the store MANIFEST adding
``batches[id] = dirname``. Readers enumerate ONLY manifest-listed
directories — an uncommitted / crashed / duplicate-delivery data dir is
structurally invisible, and compaction garbage-collects unreferenced
dirs. The manifest replace is the single linearization point: this
module implements it as POSIX ``os.replace`` under the stores'
single-writer contract (foreachBatch is serial per query); on a real
object store the same replace maps to a conditional PUT
(If-Match/ETag CAS — S3, GCS and ABFS all support it) with no other
change to the protocol, which is exactly how Delta's S3 LogStore and
Iceberg's commit work. Exactly-once on redelivery holds because the
manifest already names the batch id: the re-commit is refused BEFORE any
manifest change, and the replay's orphan data dir is invisible + GC'd.

Long streams accumulate one directory (and its small parquet files) per
batch; ``compact`` merges the committed prefix into one merged segment
with crash-safe bookkeeping: the merged segment commits first (under a
nonce name invisible to readers), then the manifest — the single source
of truth, replaced atomically — flips readers over, and only then are
the merged-away dirs reclaimed (best-effort; a crash leaves them, and
readers IGNORE anything the manifest disowns, so no sequence of crashes
can double-read or lose a batch). Readers see ``manifest segments +
batch dirs ABOVE the horizon``; redelivery replay (``before=``) keeps
working because streaming only ever redelivers the LAST batch and
``keep_last`` preserves at least that many recent batches un-compacted
(a ``before`` at or below the horizon raises — that replay depth is
explicitly unsupported after compaction). ``order_by`` keeps a merged
segment range-partitioned + sorted on the given columns so a sorted
store (incremental_dedup's pruned probe path) retains its row-group
min/max locality through compaction.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_BATCH_RE = re.compile(r"^b(\d{12})$")
_DATA_RE = re.compile(r"^d(\d{12})_[0-9a-f]{8}$")
_MERGED_RE = re.compile(r"^m(\d{12})_[0-9a-f]{8}$")
_MANIFEST = "_manifest.json"

RENAME = "rename"
MANIFEST = "manifest"


def _batch_dir(root: str, batch_id: int) -> str:
    return os.path.join(root, f"b{batch_id:012d}")


def _manifest_load(root: str) -> "dict | None":
    try:
        with open(os.path.join(root, _MANIFEST)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _manifest_replace(root: str, man: dict) -> None:
    """The commit point: one atomic replace of the manifest. POSIX
    ``os.replace`` here; a conditional PUT (ETag CAS) on an object store
    — the stores' single-writer contract makes either linearizable."""
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f"_manifest_tmp_{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(root, _MANIFEST))


def _mode_of(root: str, mode: "str | None") -> str:
    """Resolve the store's commit mode: explicit argument wins, else the
    manifest's recorded mode, else rename (the pre-manifest default —
    rename-mode stores only grow a manifest at first compaction)."""
    if mode is not None:
        if mode not in (RENAME, MANIFEST):
            raise ValueError(f"unknown commit mode {mode!r}")
        return mode
    man = _manifest_load(root)
    return (man or {}).get("mode", RENAME)


def _horizon(root: str) -> int:
    """Highest batch id folded into a merged segment (-1 = none)."""
    m = _manifest_load(root)
    return int(m["horizon"]) if m else -1


def committed_ids(
    root: str, *, before: int | None = None, mode: "str | None" = None
) -> list[int]:
    """Sorted batch ids committed under ``root`` and not yet folded into
    a compacted segment. Rename mode enumerates ``b<id>`` directories
    (crash leftovers below the manifest horizon excluded — the manifest
    is the truth); manifest mode reads the manifest's batch table only."""
    if _mode_of(root, mode) == MANIFEST:
        man = _manifest_load(root) or {}
        ids = [int(b) for b in man.get("batches", {})]
    else:
        if not os.path.isdir(root):
            return []
        ids = [
            int(m.group(1))
            for m in (_BATCH_RE.match(n) for n in os.listdir(root))
            if m
        ]
    h = _horizon(root)
    return sorted(b for b in ids if b > h and (before is None or b < before))


def is_committed(root: str, batch_id: int, *, mode: "str | None" = None) -> bool:
    """A batch folded into a compacted segment stays committed even after
    its directory is reclaimed."""
    if batch_id <= _horizon(root):
        return True
    if _mode_of(root, mode) == MANIFEST:
        man = _manifest_load(root) or {}
        return str(batch_id) in man.get("batches", {})
    return os.path.isdir(_batch_dir(root, batch_id))


def next_batch_id(*roots: str, mode: "str | None" = None) -> int:
    """Auto-increment for driver-loop callers that don't carry stream
    batch ids: one past the highest committed id (incl. compacted).

    A store whose logical batch spans SEVERAL log roots (dedup's
    pairs/members/shingles, curation's seen/kept) must pass ALL of them:
    a crash that committed only some subdirs would otherwise hand the
    next different-data batch a reused id, and its commit against the
    crashed batch's leftover dir would silently no-op (ADVICE r7)."""
    if not roots:
        raise ValueError("next_batch_id needs at least one log root")
    top = -1
    for root in roots:
        top = max([top, _horizon(root)] + committed_ids(root, mode=mode))
    return top + 1


def _committed_dirs(
    root: str, *, before: int | None = None, mode: "str | None" = None
) -> list[str]:
    """Every directory a reader may see: compacted segments + committed
    batch dirs above the horizon (< ``before`` if given)."""
    man = _manifest_load(root)
    resolved = _mode_of(root, mode)
    dirs: list[str] = []
    if man:
        if before is not None and before <= int(man["horizon"]):
            raise ValueError(
                f"replay before batch {before} is unsupported: batches "
                f"<= {man['horizon']} are compacted (raise keep_last if "
                "deeper redelivery is possible in this deployment)"
            )
        dirs += [os.path.join(root, d) for d in man["segments"]]
    if resolved == MANIFEST:
        batches = (man or {}).get("batches", {})
        h = _horizon(root)
        dirs += [
            os.path.join(root, batches[str(b)])
            for b in sorted(int(x) for x in batches)
            if b > h and (before is None or b < before)
        ]
    else:
        dirs += [_batch_dir(root, b) for b in committed_ids(root, before=before)]
    return dirs


def read_committed(
    spark: SparkSession, root: str, ddl: str, *, before: int | None = None,
    mode: "str | None" = None,
) -> DataFrame:
    """Union of the compacted segments and all committed batch
    directories above the horizon (< ``before`` if given) — an
    explicitly-enumerated read, so uncommitted staging, a replayed
    batch's own partial commits, and crash-leftover merged-away dirs are
    never visible."""
    dirs = _committed_dirs(root, before=before, mode=mode)
    if not dirs:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*dirs)


def compact(
    spark: SparkSession, root: str, ddl: str, *, keep_last: int = 2,
    target_files: int = 1, mode: "str | None" = None,
    order_by: "list[str] | None" = None,
) -> bool:
    """Fold the committed batch prefix (everything except the newest
    ``keep_last`` batches) plus any existing merged segments into ONE
    merged segment of ``target_files`` parquet files (raise it when the
    folded state is large — the default suits the bounded per-store
    state). ``order_by`` range-partitions + sorts the merged segment on
    the given columns, preserving row-group min/max locality for pruned
    probes (PrunedLSHSignatureStore). Crash-safe by ordering (see module
    docstring): segment commit → atomic manifest replace → best-effort
    dir cleanup. Returns True if a new segment was written, False if
    there was nothing to fold. Single-writer per store (foreachBatch is
    serial), like commit_batch."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the redeliverable tail)")
    if not os.path.isdir(root):
        return False
    resolved = _mode_of(root, mode)
    man = _manifest_load(root)
    old_segments = list(man["segments"]) if man else []
    batches = dict((man or {}).get("batches", {}))
    ids = committed_ids(root, mode=resolved)
    fold = ids[:-keep_last] if len(ids) > keep_last else []
    if not fold and len(old_segments) <= 1:
        return False  # nothing to merge that isn't already one segment
    new_horizon = fold[-1] if fold else _horizon(root)
    if resolved == MANIFEST:
        fold_dirs = [os.path.join(root, batches[str(b)]) for b in fold]
    else:
        fold_dirs = [_batch_dir(root, b) for b in fold]
    src = [os.path.join(root, s) for s in old_segments] + fold_dirs
    seg_name = f"m{new_horizon:012d}_{uuid.uuid4().hex[:8]}"
    staging = os.path.join(root, f"_compact_{seg_name}")
    merged = spark.read.schema(ddl).parquet(*src)
    if order_by:
        nf = max(1, target_files)
        merged = (
            merged.repartitionByRange(nf, *order_by)
            .sortWithinPartitions(*order_by)
            if nf > 1
            else merged.coalesce(1).sortWithinPartitions(*order_by)
        )
    else:
        merged = merged.coalesce(max(1, target_files))
    try:
        merged.write.mode("overwrite").parquet(staging)
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    os.rename(staging, os.path.join(root, seg_name))
    # atomic flip: readers switch to the new segment in one replace;
    # folded batch entries leave the manifest's batch table with them
    new_man = {"horizon": int(new_horizon), "segments": [seg_name]}
    if resolved == MANIFEST:
        new_man["mode"] = MANIFEST
        new_man["batches"] = {
            b: d for b, d in batches.items() if int(b) > new_horizon
        }
    _manifest_replace(root, new_man)
    # best-effort reclamation — crash-leftovers are ignored by readers
    # (manifest-disowned names), and any stale dir a crashed cleanup or
    # an orphaned (never-committed) manifest-mode write left goes too
    live = set(new_man["segments"]) | set(new_man.get("batches", {}).values())
    for d in src:
        shutil.rmtree(d, ignore_errors=True)
    for name in os.listdir(root):
        if _MERGED_RE.match(name) and name not in live:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        elif _DATA_RE.match(name) and name not in live:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        else:
            mb = _BATCH_RE.match(name)
            if mb and int(mb.group(1)) <= new_horizon:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return True


def commit_batch(
    df: DataFrame, root: str, batch_id: int, *, mode: "str | None" = None
) -> bool:
    """Write ``df`` as batch ``batch_id`` under ``root`` exactly once.

    Returns True if this call committed, False if the batch was already
    committed (redelivery) — in which case nothing is written and the
    existing store state is untouched."""
    resolved = _mode_of(root, mode)
    if resolved == MANIFEST:
        return _commit_manifest(df, root, batch_id)
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


def _commit_manifest(df: DataFrame, root: str, batch_id: int) -> bool:
    """Manifest-mode commit: data to a unique nonce dir (no rename — the
    dir name never collides and is invisible until the manifest names
    it), then the atomic manifest replace IS the commit."""
    if is_committed(root, batch_id, mode=MANIFEST):
        return False
    os.makedirs(root, exist_ok=True)
    dname = f"d{batch_id:012d}_{uuid.uuid4().hex[:8]}"
    dest = os.path.join(root, dname)
    try:
        df.write.mode("overwrite").parquet(dest)
    except Exception:
        shutil.rmtree(dest, ignore_errors=True)
        raise
    man = _manifest_load(root) or {
        "mode": MANIFEST, "horizon": -1, "segments": [], "batches": {},
    }
    # re-check under the single-writer contract (a redelivery racing the
    # first delivery is impossible there; on an object store the
    # conditional-PUT CAS would reject the second replace instead)
    if str(batch_id) in man.get("batches", {}):
        shutil.rmtree(dest, ignore_errors=True)
        return False
    man.setdefault("mode", MANIFEST)
    man.setdefault("batches", {})[str(batch_id)] = dname
    _manifest_replace(root, man)
    return True
