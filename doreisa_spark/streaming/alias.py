"""Named store aliases with atomic CAS flip — the blue/green hand-off
primitive (r11 verdict ask #1).

``retrain_ivf_store`` builds a green store and, before this module,
ended with "the old store serves reads until the deployment flips the
root" — leaving the flip itself undefined: no named pointer, no CAS,
no fencing story, no crash semantics. This module owns that last step.
Mirrors the reference's deployment story only in spirit — the
reference (AdrienVannson/doreisa) has no persisted index to flip; this
is the piece a Spark deployment of the store layer needs.

Model: an ``_alias.json`` manifest under an alias directory maps
``name -> {"root": store_root, "epoch": N}``. Every mutation is a
read-modify-write inside an exclusive flock on the alias directory
(``batch_commit._locked`` — the same local stand-in for an object
store's conditional PUT used by the store manifests), published with
one atomic ``os.replace``. Properties:

- **readers resolve, never lock**: ``resolve`` is one small JSON read;
  a reader loop sees the blue root until the flip's atomic replace and
  the green root after — never a torn state, never a lock stall;
- **CAS flip**: ``flip_alias(..., expect_root=blue)`` verifies, inside
  the critical section, that the alias still points where the caller
  believes — two concurrent retrains can't double-flip (the loser gets
  ``AliasConflictError`` and its green store is simply never aliased);
- **fencing across the flip**: ``fence=[log_roots...]`` bumps each
  manifest-mode log's ``writer_epoch`` (``batch_commit.acquire_writer``)
  BEFORE the alias replace — the blue writer's next commit raises
  ``StaleWriterError``, so no write can land on blue "after" readers
  moved to green. Ordering makes the crash windows safe: a crash
  after the fence but before the replace leaves the alias on blue with
  a fenced writer (readers unaffected; the writer re-acquires or the
  flip is retried), never a flipped alias with an unfenced blue writer;
- **crash before the flip is a no-op**: migration commits into a fresh
  green root that nothing references until the alias replace — the
  alias stays on blue, and the orphaned green root can be deleted or
  the flip retried (tests pin this);
- **history**: each flip appends the superseded root + epoch to the
  entry's ``history``, so "what served this alias when" is auditable
  (the takedown-compliance report composes with this).

On an object store the flock + replace maps to a conditional PUT of
the alias object (If-Match/ETag), identical to the store manifests'
mapping — nothing here assumes POSIX beyond what batch_commit already
does.
"""

from __future__ import annotations

import json
import os

from doreisa_spark.streaming import batch_commit as BC

_ALIAS = "_alias.json"


class AliasConflictError(RuntimeError):
    """A CAS flip found the alias no longer pointing at expect_root —
    a concurrent flip won; nothing was changed."""


def _load(alias_root: str) -> dict:
    try:
        with open(os.path.join(alias_root, _ALIAS)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def list_aliases(alias_root: str) -> dict[str, dict]:
    """All alias entries as ``{name: {"root", "epoch", "history"}}``."""
    return _load(alias_root)


def read_alias(alias_root: str, name: str) -> "dict | None":
    """The full entry for ``name`` (root, epoch, history), or None."""
    return _load(alias_root).get(name)


def resolve(alias_root: str, name: str) -> str:
    """The store root ``name`` currently points at. One small JSON
    read — the reader hot path takes no lock; the flip's atomic
    replace guarantees it sees blue or green, never a torn state."""
    ent = read_alias(alias_root, name)
    if ent is None:
        raise KeyError(
            f"no alias {name!r} at {alias_root} "
            f"(known: {sorted(_load(alias_root))})"
        )
    return ent["root"]


def open_by_alias(cls, spark, alias_root: str, name: str, **kw):
    """Construct ``cls`` (a store class) on whatever root the alias
    currently points at — the one implementation behind every store's
    ``from_alias`` classmethod. ``fenced=False`` by default: resolving
    an alias is a READER operation and must never displace the live
    writer; resolution happens once, here — re-open after a flip to
    pick up the green root."""
    kw.setdefault("fenced", False)
    return cls(spark, resolve(alias_root, name), **kw)


def bind_alias(alias_root: str, name: str, store_root: str) -> int:
    """Create ``name -> store_root`` (epoch 0). Rebinding to the SAME
    root is a no-op; rebinding an existing alias to a different root
    must go through ``flip_alias`` (the CAS + fencing path) — a blind
    re-bind would be exactly the unfenced root swap this module
    exists to prevent."""
    with BC._locked(alias_root):
        cur = _load(alias_root)
        ent = cur.get(name)
        if ent is not None:
            if ent["root"] == store_root:
                return int(ent["epoch"])
            raise AliasConflictError(
                f"alias {name!r} already points at {ent['root']}; use "
                "flip_alias (CAS + fencing) to move it"
            )
        cur[name] = {"root": store_root, "epoch": 0, "history": []}
        BC._json_replace(os.path.join(alias_root, _ALIAS), cur)
        return 0


def flip_alias(
    alias_root: str, name: str, new_root: str, *,
    expect_root: "str | None" = None, fence: "list[str] | None" = None,
) -> int:
    """Atomically repoint ``name`` at ``new_root`` and return the new
    alias epoch. ``expect_root`` makes it a CAS: if the alias moved
    since the caller read it (a concurrent flip won), raises
    ``AliasConflictError`` and changes nothing. ``fence`` lists
    manifest-mode LOG roots (e.g. the blue store's ``members`` dir)
    whose writers must be fenced out BEFORE readers can resolve green
    — each gets a ``batch_commit.acquire_writer`` bump inside this
    critical section, so the old writer's next commit raises
    ``StaleWriterError`` (see the module docstring for why the fence
    precedes the replace). Rename-mode logs cannot be fenced (no
    manifest) — passing one raises, as acquire_writer does."""
    with BC._locked(alias_root):
        cur = _load(alias_root)
        ent = cur.get(name)
        if ent is None:
            raise KeyError(f"no alias {name!r} at {alias_root}")
        if expect_root is not None and ent["root"] != expect_root:
            raise AliasConflictError(
                f"alias {name!r} points at {ent['root']}, not the "
                f"expected {expect_root}: a concurrent flip won; "
                "refusing to double-flip"
            )
        if ent["root"] == new_root:
            return int(ent["epoch"])
        # fence first, replace second: a crash between the two leaves
        # the alias on blue with a fenced blue writer (recoverable —
        # retry the flip or re-acquire), never green with a live one
        for log_root in fence or []:
            BC.acquire_writer(log_root)
        new_epoch = int(ent["epoch"]) + 1
        hist = list(ent.get("history", []))
        hist.append({"root": ent["root"], "epoch": int(ent["epoch"])})
        cur[name] = {"root": new_root, "epoch": new_epoch, "history": hist}
        BC._json_replace(os.path.join(alias_root, _ALIAS), cur)
        return new_epoch
