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
module implements it as POSIX ``os.replace`` under an exclusive flock;
on a real object store the same replace maps to a conditional PUT
(If-Match/ETag CAS — S3, GCS and ABFS all support it) with no other
change to the protocol, which is exactly how Delta's S3 LogStore and
Iceberg's commit work. Exactly-once on redelivery holds because the
manifest already names the batch id: the re-commit is refused BEFORE any
manifest change, and the replay's orphan data dir is invisible + GC'd.

Compaction — size-tiered (LSM), the r8 verdict's write-amplification fix
---------------------------------------------------------------------
Long streams accumulate one directory (and its small parquet files) per
batch. The r7 ``compact`` folded EVERYTHING — all existing merged
segments plus the batch prefix — into ONE segment: with the default-on
``compact_every`` that rewrites the entire store every N batches, an
amortized O(store/N) write-bytes-per-batch term that grows linearly with
history (the same linear-in-history class the pruned probe path had just
eliminated on the read side). ``compact_tiered`` replaces it with the
classic LSM size-tiered policy:

- **flush**: the eligible batch prefix (everything but the newest
  ``keep_last`` batches) folds into ONE new small segment — cost is the
  NEW data only, old segments are not touched;
- **merge policy**: segments are binned into size bands (band =
  ``floor(log_fanout(bytes / band_base_bytes))``); whenever a band holds
  ≥ ``fanout`` segments they merge into one segment, which lands in a
  HIGHER band. Each byte is therefore rewritten at most once per band it
  climbs through — O(log_fanout(store/batch)) times over the store's
  lifetime, vs O(store/batch) under full rewrite;
- every segment is written sorted/range-partitioned on ``order_by``
  per-tier, so the pruned probes' row-group min/max locality survives —
  probes simply union a handful of sorted tiers instead of one;
- each step (the flush, each merge) is individually crash-safe by the
  same ordering as before: segment data commits first under a nonce name
  INVISIBLE to readers (no rename in either mode — the manifest is the
  commit point, ADVICE r8), then one atomic manifest replace flips
  readers over, then merged-away dirs are reclaimed best-effort.

The one-shot full fold (``compact``) remains for bounded state and
final-seal use; the stores' periodic auto-compaction uses the tiered
policy. Readers see ``manifest segments + batch dirs ABOVE the
horizon``; redelivery replay (``before=``) keeps working because
streaming only ever redelivers the LAST batch and ``keep_last``
preserves at least that many recent batches un-compacted (a ``before``
at or below the horizon raises — that replay depth is explicitly
unsupported after compaction).

Tombstone deletes (takedowns / GDPR — r8 verdict ask #4)
--------------------------------------------------------
Append-only logs cannot serve takedowns. ``delete_keys`` writes
tombstone rows (the deleted key values) through the SAME exactly-once
commit protocol into a sub-log ``root/_tombstones`` (underscore prefix:
invisible to the main log's readers and to Spark's file listing), with a
write-once ``_key.json`` marker naming the data column(s) the keys mask.
``read_committed`` then anti-filters every listed column against the
tombstone set (a broadcast anti-join — tombstone sets are takedown-sized,
orders of magnitude below the data), and compaction PHYSICALLY DROPS
masked rows from every segment it writes, so deleted bytes leave the
store at the next fold of their segment. Tombstones themselves persist
(they are tiny and must keep masking rows in not-yet-compacted tiers and
the keep_last tail); a redelivered delete batch is a no-op like any
other batch. Deletes observe the single-writer contract: quiesce
replays while deleting, or a replayed batch recomputes against the
post-delete state (which is the intended semantics for takedowns).

Writer fencing (manifest mode — r8 verdict ask #5)
--------------------------------------------------
The stores' contract is single-writer (foreachBatch is serial per
query), but a misconfigured second query writing the same store root
must fail LOUDLY, not last-writer-win. ``acquire_writer`` bumps a
``writer_epoch`` in the manifest and returns it; every manifest replace
made with ``epoch=`` verifies, under the same exclusive flock that makes
the replace atomic (the conditional-PUT on an object store), that the
manifest's epoch is still the caller's — a writer superseded by a newer
``acquire_writer`` gets ``StaleWriterError`` instead of silently
clobbering the newer writer's commits. Rename-mode batch commits never
touch a manifest, so fencing is (and can only be) a manifest-mode
feature; passing ``epoch`` with rename mode raises.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import math
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_BATCH_RE = re.compile(r"^b(\d{12})$")
_DATA_RE = re.compile(r"^d(\d{12})_[0-9a-f]{8}$")
_MERGED_RE = re.compile(r"^m(\d{12})_[0-9a-f]{8}$")
_MANIFEST = "_manifest.json"
_LOCK = "_manifest.lock"
_TOMBSTONES = "_tombstones"
_TOMB_KEY = "_key.json"

RENAME = "rename"
MANIFEST = "manifest"


class StaleWriterError(RuntimeError):
    """A fenced writer's epoch was superseded by a newer acquire_writer —
    its commit/compact was refused before any manifest change."""


def _batch_dir(root: str, batch_id: int) -> str:
    return os.path.join(root, f"b{batch_id:012d}")


def _manifest_load(root: str) -> "dict | None":
    try:
        with open(os.path.join(root, _MANIFEST)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


@contextlib.contextmanager
def _locked(root: str):
    """Exclusive flock serializing manifest read-check-replace. Local
    stand-in for the object store's conditional PUT: the check and the
    replace happen atomically with respect to other writers."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, _LOCK), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def _manifest_write_locked(root: str, man: dict) -> None:
    tmp = os.path.join(root, f"_manifest_tmp_{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(root, _MANIFEST))


def _manifest_replace(
    root: str, man: dict, *, expect_epoch: "int | None" = None
) -> None:
    """The commit point: one atomic replace of the manifest, under the
    store lock. With ``expect_epoch`` the replace is a guarded CAS: it
    verifies the manifest's writer_epoch is still the caller's (a stale
    writer raises StaleWriterError, committing nothing). Without it, any
    recorded epoch is carried over untouched so an unfenced code path
    cannot erase a fence."""
    with _locked(root):
        cur = _manifest_load(root) or {}
        cur_epoch = int(cur.get("writer_epoch", 0))
        if expect_epoch is not None:
            if cur_epoch != expect_epoch:
                raise StaleWriterError(
                    f"writer epoch {expect_epoch} superseded by "
                    f"{cur_epoch} at {root}: a newer writer owns this "
                    "store (acquire_writer); refusing to commit"
                )
            man = {**man, "writer_epoch": expect_epoch}
        elif cur_epoch:
            man = {**man, "writer_epoch": cur_epoch}
        _manifest_write_locked(root, man)


def acquire_writer(root: str, *, mode: "str | None" = None) -> int:
    """Fence out every previous writer of a MANIFEST-mode store and
    return this writer's epoch. Pass the epoch to commit_batch /
    compact / compact_tiered / delete_keys: once any later caller
    acquires the store, this writer's next manifest replace raises
    StaleWriterError instead of silently last-writer-winning (r8
    verdict ask #5). Maps to a conditional PUT on an object store."""
    resolved = _mode_of(root, mode)
    if resolved != MANIFEST:
        raise ValueError(
            "writer fencing requires manifest commit mode (rename-mode "
            "batch commits never pass through a manifest)"
        )
    with _locked(root):
        man = _manifest_load(root) or {
            "mode": MANIFEST, "horizon": -1, "segments": [], "batches": {},
        }
        man.setdefault("mode", MANIFEST)
        epoch = int(man.get("writer_epoch", 0)) + 1
        man["writer_epoch"] = epoch
        _manifest_write_locked(root, man)
    return epoch


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
    crashed batch's leftover dir would silently no-op (ADVICE r7).

    Each root's TOMBSTONE sub-log counts too: deletes commit batch ids
    there without touching the main log, so two consecutive auto-id
    deletes would otherwise be handed the same id and the second would
    silently no-op as a "redelivery" of the first."""
    if not roots:
        raise ValueError("next_batch_id needs at least one log root")
    top = -1
    for root in roots:
        top = max([top, _horizon(root)] + committed_ids(root, mode=mode))
        troot = _tomb_root(root)
        if os.path.isdir(troot):
            top = max([top, _horizon(troot)] + committed_ids(troot, mode=mode))
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


# ---------------------------------------------------------------- tombstones


def _tomb_root(root: str) -> str:
    return os.path.join(root, _TOMBSTONES)


def _tomb_meta(root: str) -> "dict | None":
    try:
        with open(os.path.join(_tomb_root(root), _TOMB_KEY)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def delete_keys(
    spark: SparkSession,
    root: str,
    keys,
    batch_id: int,
    *,
    key_cols,
    key_type: str = "bigint",
    mode: "str | None" = None,
) -> bool:
    """Commit a tombstone batch masking every row of ``root`` whose value
    in ANY of ``key_cols`` is in ``keys`` (takedowns / GDPR — r8 verdict
    ask #4). The tombstones go through the SAME exactly-once commit
    protocol as data (sub-log ``root/_tombstones``), so a redelivered
    delete batch is a no-op; ``read_committed`` filters masked rows from
    every read, and compaction physically drops them from each segment
    it rewrites. ``key_cols`` is a column name or list of names (a pair
    log masks on both endpoints); the choice is recorded in a write-once
    marker — a later delete with different columns/type raises."""
    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not cols:
        raise ValueError("key_cols must name at least one column")
    troot = _tomb_root(root)
    meta = _tomb_meta(root)
    if meta is not None and (meta["cols"] != cols or meta["type"] != key_type):
        raise ValueError(
            f"tombstone log at {troot} masks {meta['cols']} "
            f"({meta['type']}); got {cols} ({key_type})"
        )
    os.makedirs(troot, exist_ok=True)
    if meta is None:
        tmp = os.path.join(troot, f"{_TOMB_KEY}.tmp{os.getpid()}")
        with open(tmp, "w") as f:
            json.dump({"cols": cols, "type": key_type}, f)
        os.replace(tmp, os.path.join(troot, _TOMB_KEY))
    df = spark.createDataFrame([(k,) for k in keys], f"key {key_type}")
    return commit_batch(df.coalesce(1), troot, batch_id, mode=mode)


def deleted_keys(
    spark: SparkSession, root: str, *, mode: "str | None" = None
) -> "DataFrame | None":
    """The committed tombstone keys of ``root`` (column ``key``), or None
    if the store has no tombstone log."""
    meta = _tomb_meta(root)
    if meta is None:
        return None
    return read_committed(
        spark, _tomb_root(root), f"key {meta['type']}", mode=mode
    )


def _apply_tombstones(
    spark: SparkSession, root: str, df: DataFrame, *, mode: "str | None"
) -> DataFrame:
    """Anti-filter every marker-listed column against the tombstone set.
    Tombstones are takedown-sized (orders of magnitude below the data),
    so each filter is a broadcast anti-join — map-side, no shuffle of
    the data. The tombstone sub-log has no sub-log of its own, so the
    recursion terminates immediately for its reads."""
    meta = _tomb_meta(root)
    if meta is None:
        return df
    from doreisa_spark.operators.broadcast import bcast

    tdf = deleted_keys(spark, root, mode=mode)
    for c in meta["cols"]:
        df = df.join(bcast(tdf.withColumnRenamed("key", c)), c, "left_anti")
    return df


def read_committed(
    spark: SparkSession, root: str, ddl: str, *, before: int | None = None,
    mode: "str | None" = None,
) -> DataFrame:
    """Union of the compacted segments and all committed batch
    directories above the horizon (< ``before`` if given) — an
    explicitly-enumerated read, so uncommitted staging, a replayed
    batch's own partial commits, and crash-leftover merged-away dirs are
    never visible. Tombstoned rows (delete_keys) are filtered out."""
    dirs = _committed_dirs(root, before=before, mode=mode)
    if not dirs:
        return spark.createDataFrame([], ddl)
    df = spark.read.schema(ddl).parquet(*dirs)
    return _apply_tombstones(spark, root, df, mode=mode)


# ---------------------------------------------------------------- compaction


def _dir_bytes(path: str) -> int:
    total = 0
    for base, _, files in os.walk(path):
        for f in files:
            with contextlib.suppress(OSError):
                total += os.path.getsize(os.path.join(base, f))
    return total


def _segment_sizes(root: str, man: dict) -> dict:
    """Byte size per live segment, from the manifest where recorded
    (compact writes it), else by walking (pre-r9 manifests)."""
    sizes = dict(man.get("segment_bytes", {}))
    out = {}
    for s in man.get("segments", []):
        out[s] = int(sizes.get(s, 0)) or _dir_bytes(os.path.join(root, s))
    return out


def _write_segment(
    spark: SparkSession,
    root: str,
    ddl: str,
    src_dirs: list[str],
    horizon: int,
    *,
    order_by: "list[str] | None",
    target_files: int,
    mode: "str | None",
) -> tuple[str, int]:
    """Write one merged segment from ``src_dirs`` directly under its
    final nonce name — INVISIBLE to readers until the manifest names it
    (the manifest is the commit point in both modes; nothing is renamed,
    ADVICE r8). Tombstoned rows are physically dropped here: a deleted
    key's bytes leave the store at the first fold of their segment.
    ``order_by`` keeps the segment range-partitioned + sorted so pruned
    probes retain row-group min/max locality through compaction."""
    name = f"m{horizon:012d}_{uuid.uuid4().hex[:8]}"
    dest = os.path.join(root, name)
    merged = spark.read.schema(ddl).parquet(*src_dirs)
    merged = _apply_tombstones(spark, root, merged, mode=mode)
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
        merged.write.mode("overwrite").parquet(dest)
    except Exception:
        shutil.rmtree(dest, ignore_errors=True)
        raise
    return name, _dir_bytes(dest)


def _gc(root: str, man: dict) -> None:
    """Best-effort reclamation of everything the manifest disowns —
    merged-away segments, orphaned nonce dirs from crashed attempts, and
    batch dirs at or below the horizon. Readers never see these (the
    manifest is the truth), so no sequence of crashes can double-read or
    lose a batch; a crashed cleanup just leaves work for the next one."""
    live = set(man.get("segments", [])) | set(man.get("batches", {}).values())
    horizon = int(man.get("horizon", -1))
    for name in os.listdir(root):
        if (_MERGED_RE.match(name) or _DATA_RE.match(name)) and name not in live:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        else:
            mb = _BATCH_RE.match(name)
            if mb and int(mb.group(1)) <= horizon:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def compact(
    spark: SparkSession, root: str, ddl: str, *, keep_last: int = 2,
    target_files: int = 1, mode: "str | None" = None,
    order_by: "list[str] | None" = None, epoch: "int | None" = None,
) -> bool:
    """FULL fold: the committed batch prefix (everything except the
    newest ``keep_last`` batches) plus any existing merged segments
    merge into ONE segment of ``target_files`` parquet files. This
    rewrites the whole store — O(history) write bytes — so it suits
    bounded state, a final seal, or reclaiming all tombstoned rows at
    once; periodic auto-compaction on unbounded logs should use
    ``compact_tiered`` (the r8 verdict's write-amplification finding).
    Crash-safe by ordering (module docstring): segment data under a
    reader-invisible nonce name → atomic manifest replace → best-effort
    dir cleanup. Returns True if a new segment was written. ``epoch``
    fences the manifest replace (acquire_writer)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the redeliverable tail)")
    if epoch is not None and _mode_of(root, mode) != MANIFEST:
        raise ValueError("epoch fencing requires manifest commit mode")
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
    seg_name, seg_bytes = _write_segment(
        spark, root, ddl, src, new_horizon,
        order_by=order_by, target_files=target_files, mode=resolved,
    )
    # atomic flip: readers switch to the new segment in one replace;
    # folded batch entries leave the manifest's batch table with them
    new_man = {
        "horizon": int(new_horizon),
        "segments": [seg_name],
        "segment_bytes": {seg_name: seg_bytes},
    }
    if resolved == MANIFEST:
        new_man["mode"] = MANIFEST
        new_man["batches"] = {
            b: d for b, d in batches.items() if int(b) > new_horizon
        }
    _manifest_replace(root, new_man, expect_epoch=epoch)
    _gc(root, new_man)
    return True


def compact_tiered(
    spark: SparkSession, root: str, ddl: str, *, keep_last: int = 2,
    mode: "str | None" = None, order_by: "list[str] | None" = None,
    fanout: int = 4, band_base_bytes: int = 1 << 16,
    target_files: int = 1, epoch: "int | None" = None,
) -> dict:
    """LSM size-tiered compaction — bounded write amplification (r8
    verdict ask #1). One **flush** folds the eligible batch prefix into
    a new small segment WITHOUT touching existing segments; the **merge
    policy** then merges any size band (``floor(log_fanout(bytes /
    band_base_bytes))``) holding ≥ ``fanout`` segments into one segment
    a band up, cascading until no band overflows. A byte is rewritten at
    most once per band it climbs — O(log(store/batch)) lifetime rewrites
    instead of the full fold's O(store/batch) per compaction. Per-tier
    ``order_by`` sorting preserves pruned-probe row-group locality;
    readers union the tiers (they already union segments + batch dirs).

    Each step commits like ``compact``: reader-invisible nonce segment →
    atomic (optionally epoch-fenced) manifest replace → best-effort GC.
    Returns accounting for write-amplification curves:
    ``{"flushed_bytes", "merged_bytes", "steps", "segments"}`` —
    merged_bytes is the policy's rewrite cost, flushed_bytes the
    unavoidable new-data fold."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the redeliverable tail)")
    if fanout < 2:
        raise ValueError("fanout must be >= 2")
    resolved = _mode_of(root, mode)
    if epoch is not None and resolved != MANIFEST:
        raise ValueError("epoch fencing requires manifest commit mode")
    stats = {"flushed_bytes": 0, "merged_bytes": 0, "steps": 0, "segments": 0}
    if not os.path.isdir(root):
        return stats

    def band_of(nbytes: int) -> int:
        return int(math.log(max(nbytes, band_base_bytes) / band_base_bytes,
                            fanout))

    man = _manifest_load(root)
    batches = dict((man or {}).get("batches", {}))
    ids = committed_ids(root, mode=resolved)
    fold = ids[:-keep_last] if len(ids) > keep_last else []
    if fold:  # ---- flush: fold ONLY the new batches, never old segments
        new_horizon = fold[-1]
        if resolved == MANIFEST:
            fold_dirs = [os.path.join(root, batches[str(b)]) for b in fold]
        else:
            fold_dirs = [_batch_dir(root, b) for b in fold]
        seg_name, seg_bytes = _write_segment(
            spark, root, ddl, fold_dirs, new_horizon,
            order_by=order_by, target_files=target_files, mode=resolved,
        )
        sizes = _segment_sizes(root, man or {})
        sizes[seg_name] = seg_bytes
        new_man = {
            "horizon": int(new_horizon),
            "segments": list((man or {}).get("segments", [])) + [seg_name],
            "segment_bytes": sizes,
        }
        if resolved == MANIFEST:
            new_man["mode"] = MANIFEST
            new_man["batches"] = {
                b: d for b, d in batches.items() if int(b) > new_horizon
            }
        _manifest_replace(root, new_man, expect_epoch=epoch)
        _gc(root, new_man)
        stats["flushed_bytes"] += seg_bytes
        stats["steps"] += 1
    # ---- merge policy: collapse any size band holding >= fanout segments
    while True:
        man = _manifest_load(root)
        if not man or len(man.get("segments", [])) < fanout:
            break
        sizes = _segment_sizes(root, man)
        bands: dict[int, list[str]] = {}
        for s in man["segments"]:
            bands.setdefault(band_of(sizes[s]), []).append(s)
        over = [b for b, segs in bands.items() if len(segs) >= fanout]
        if not over:
            break
        victims = bands[min(over)]  # lowest band first: cheapest, cascades up
        src = [os.path.join(root, s) for s in victims]
        horizon = int(man["horizon"])
        seg_name, seg_bytes = _write_segment(
            spark, root, ddl, src, horizon,
            order_by=order_by, target_files=target_files, mode=resolved,
        )
        keep = [s for s in man["segments"] if s not in victims]
        new_sizes = {s: sizes[s] for s in keep}
        new_sizes[seg_name] = seg_bytes
        new_man = {**man, "segments": keep + [seg_name],
                   "segment_bytes": new_sizes}
        _manifest_replace(root, new_man, expect_epoch=epoch)
        _gc(root, new_man)
        stats["merged_bytes"] += seg_bytes
        stats["steps"] += 1
    final = _manifest_load(root)
    stats["segments"] = len((final or {}).get("segments", []))
    return stats


# -------------------------------------------------------------------- commit


def commit_batch(
    df: DataFrame, root: str, batch_id: int, *, mode: "str | None" = None,
    epoch: "int | None" = None,
) -> bool:
    """Write ``df`` as batch ``batch_id`` under ``root`` exactly once.

    Returns True if this call committed, False if the batch was already
    committed (redelivery) — in which case nothing is written and the
    existing store state is untouched. ``epoch`` (manifest mode only)
    fences the commit against newer writers (acquire_writer)."""
    resolved = _mode_of(root, mode)
    if resolved == MANIFEST:
        return _commit_manifest(df, root, batch_id, epoch=epoch)
    if epoch is not None:
        raise ValueError("epoch fencing requires manifest commit mode")
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


def _commit_manifest(
    df: DataFrame, root: str, batch_id: int, *, epoch: "int | None" = None
) -> bool:
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
    # first delivery is impossible there; with fencing, the epoch CAS
    # inside _manifest_replace rejects a stale writer's replace instead)
    if str(batch_id) in man.get("batches", {}):
        shutil.rmtree(dest, ignore_errors=True)
        return False
    man.setdefault("mode", MANIFEST)
    man.setdefault("batches", {})[str(batch_id)] = dname
    try:
        _manifest_replace(root, man, expect_epoch=epoch)
    except StaleWriterError:
        shutil.rmtree(dest, ignore_errors=True)
        raise
    return True
