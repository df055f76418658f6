"""Consistent multi-store pipeline snapshots (r11 verdict ask #6).

A curation pipeline's "training set" is not one log — it is the joint
state of several stores (curation kept-set, dedup verdicts, ANN
index). Pinning them one by one leaves the cut's composition implicit
(three ids in three places, nothing recording they belong together);
this module makes the cut ONE named, durable object:

- ``pipeline_snapshot(name, stores)`` pins every store (each pin is
  the store's own metadata-only ``snapshot()`` — O(1), no data copied)
  and records the pin ids TOGETHER in a ``_pipeline_snapshots.json``
  ledger under the pipeline root, keyed by a monotone cut id;
- ``read_pipeline_snapshot`` hands back ``{store_name: pin_id}`` so a
  replay opens each store at exactly the recorded cut — months later,
  after further ingest, deletes, and compaction on all of them;
- ``drop_pipeline_snapshot`` releases every member pin and removes the
  ledger entry (the retention lever: takedowns reach the cut's bytes
  when the cut is dropped — same contract as a single-store pin).

Consistency contract: call between batches of the (single-writer)
pipeline loop — foreachBatch is serial per query, so a cut taken at a
batch boundary is a true simultaneous state of all member stores; the
ledger write is atomic (flock + replace, the alias/manifest pattern),
and a crash mid-pinning leaves only unreferenced single-store pins
(visible in each store's own snapshot list, droppable) — the cut
either appears in the ledger complete or not at all, because the
ledger entry is written LAST.

Works with any object exposing ``snapshot() -> int`` /
``drop_snapshot(int)`` — CurationStore, LSHSignatureStore,
LSHVectorStore, IVFVectorStore. ``snapshot_kwargs`` is keyed by STORE
NAME: pass ``{"dedup": {"pin_members": True}}`` to give the dedup
store's pin the full re-bandable state.
"""

from __future__ import annotations

import json
import os

from doreisa_spark.streaming import batch_commit as BC

_LEDGER = "_pipeline_snapshots.json"


def _ledger_path(pipeline_root: str) -> str:
    return os.path.join(pipeline_root, _LEDGER)


def _load(pipeline_root: str) -> dict:
    try:
        with open(_ledger_path(pipeline_root)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"next": 0, "cuts": {}}


def pipeline_snapshot(
    pipeline_root: str, stores: dict, *,
    snapshot_kwargs: "dict | None" = None,
) -> int:
    """Pin every store in ``stores`` (``{name: store}``) and record the
    pin ids together as one cut; returns the cut id. ``snapshot_kwargs``
    maps a store NAME to extra kwargs for that store's ``snapshot()``
    (e.g. ``{"dedup": {"pin_members": True}}`` to make the dedup pin
    re-bandable). Call at a batch boundary of the single-writer loop —
    see the module docstring's consistency contract."""
    if not stores:
        raise ValueError("pipeline_snapshot needs at least one store")
    kw = snapshot_kwargs or {}
    pins: dict[str, int] = {}
    try:
        for name, store in stores.items():
            pins[name] = int(store.snapshot(**kw.get(name, {})))
    except Exception:
        # crash-consistency: never record a partial cut — release what
        # was pinned and surface the error (each member pin is atomic,
        # so there is nothing half-pinned to leak)
        for name, sid in pins.items():
            stores[name].drop_snapshot(sid)
        raise
    with BC._locked(pipeline_root):
        led = _load(pipeline_root)
        cut = int(led["next"])
        led["cuts"][str(cut)] = {"pins": pins}
        led["next"] = cut + 1
        BC._json_replace(_ledger_path(pipeline_root), led)
    return cut


def list_pipeline_snapshots(pipeline_root: str) -> dict[int, dict]:
    """Retained cuts as ``{cut_id: {"pins": {store_name: pin_id}}}``."""
    return {int(c): rec for c, rec in _load(pipeline_root)["cuts"].items()}


def read_pipeline_snapshot(pipeline_root: str, cut_id: int) -> dict[str, int]:
    """The recorded ``{store_name: pin_id}`` of one cut — pass each pin
    to the matching store's ``snapshot=`` read paths to replay the
    training set exactly as pinned."""
    rec = _load(pipeline_root)["cuts"].get(str(int(cut_id)))
    if rec is None:
        raise ValueError(
            f"no pipeline snapshot {cut_id} at {pipeline_root} "
            f"(retained: {sorted(list_pipeline_snapshots(pipeline_root))})"
        )
    return {k: int(v) for k, v in rec["pins"].items()}


def expire_pipeline_snapshots(
    pipeline_root: str, stores: dict, *, keep_last: int
) -> list[int]:
    """Retention for cuts: drop every cut except the newest
    ``keep_last`` (each drop releases ALL member pins — the lever that
    lets takedowns reach a pinned training set's bytes) and return the
    dropped cut ids."""
    doomed = BC.doomed_ids(list_pipeline_snapshots(pipeline_root), keep_last)
    return [c for c in doomed if drop_pipeline_snapshot(pipeline_root, c, stores)]


def drop_pipeline_snapshot(
    pipeline_root: str, cut_id: int, stores: dict
) -> bool:
    """Release the cut: drop every member store's pin, then remove the
    ledger entry. ``stores`` must name the same stores the cut pinned
    (a missing one raises before anything is dropped, so a typo cannot
    leave a half-released cut)."""
    pins = read_pipeline_snapshot(pipeline_root, cut_id)
    missing = sorted(set(pins) - set(stores))
    if missing:
        raise ValueError(
            f"cut {cut_id} pins stores {missing} not present in the "
            "stores mapping; pass every member to release the cut"
        )
    for name, sid in pins.items():
        stores[name].drop_snapshot(sid)
    with BC._locked(pipeline_root):
        led = _load(pipeline_root)
        if str(int(cut_id)) not in led["cuts"]:
            return False
        del led["cuts"][str(int(cut_id))]
        BC._json_replace(_ledger_path(pipeline_root), led)
    return True
