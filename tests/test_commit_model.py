"""Model-based randomized interleaving test of the commit layer.

Hypothesis generates PROGRAMS — sequences of commits, deletes,
reinserts, redeliveries, tiered compactions, tombstone retirements,
index-cache losses, crash-leftover directories, and snapshot
pin/drops — and after every step the store's `read_committed` frame is
compared against a 30-line in-memory model of the documented
semantics:

- a committed row is visible until a delete whose sequence point
  covers its batch masks its key; a key re-inserted by a later batch
  is live again (delete_keys' covers rule);
- redelivery of a committed batch id commits NOTHING, even with
  different data;
- compaction, retirement, cache loss, and crash leftovers never change
  the visible frame;
- a snapshot pins the exact visible frame at pin time, forever, until
  dropped — later ingest, deletes, compactions, and retirements are
  invisible to it.

This is the proactive net for the class of defect the last three
rounds' reviews kept finding by hand in lifecycle interleavings (lost
takedowns, resurrected rows, seal-time races): any program whose final
frame disagrees with the model shrinks to a minimal reproduction.
Single-process by design — true concurrency is covered by the
dedicated race tests (test_advice_r11.py, test_alias_flip.py); this
file exhausts the ORDERINGS of lifecycle events.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from doreisa_spark.streaming import batch_commit as BC

DDL = "k bigint, v bigint"
KEYS = st.integers(min_value=0, max_value=7)

OPS = st.one_of(
    st.tuples(st.just("commit"), st.lists(KEYS, min_size=0, max_size=4)),
    st.tuples(st.just("delete"),
              st.lists(KEYS, min_size=1, max_size=3, unique=True)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("retire"), st.none()),
    st.tuples(st.just("redeliver"), st.none()),
    st.tuples(st.just("cache_loss"), st.none()),
    st.tuples(st.just("orphan"), st.none()),
    st.tuples(st.just("snapshot"), st.none()),
    st.tuples(st.just("drop_snap"), st.none()),
    st.tuples(st.just("zombie"), st.lists(KEYS, min_size=1, max_size=2)),
)


def _frame(spark, root, mode):
    return Counter(
        (r["k"], r["v"])
        for r in BC.read_committed(spark, root, DDL, mode=mode).collect()
    )


def _run_program(spark, mode, program):
    tmp = tempfile.mkdtemp(prefix="commit_model_")
    root = os.path.join(tmp, "store")
    model: Counter = Counter()          # visible (k, v) multiset
    pinned: dict[int, Counter] = {}     # snapshot id -> frame at pin
    committed_data: list[int] = []      # data batch ids, for redelivery
    try:
        for step, (op, arg) in enumerate(program):
            bid = BC.next_batch_id(root, BC._tomb_root(root), mode=mode)
            if op == "commit":
                rows = [(int(k), int(k) * 100 + bid) for k in arg]
                BC.commit_batch(spark.createDataFrame(rows, DDL), root, bid,
                                mode=mode)
                model.update(rows)
                committed_data.append(bid)
            elif op == "delete":
                BC.delete_keys(spark, root, [int(k) for k in arg], bid,
                               key_cols="k", mode=mode)
                for k, v in list(model):
                    if k in set(arg):
                        del model[(k, v)]
            elif op == "compact":
                BC.compact_tiered(spark, root, DDL, keep_last=1, mode=mode,
                                  order_by=["k"])
            elif op == "retire":
                BC.retire_tombstones(spark, root, mode=mode)
            elif op == "redeliver" and committed_data:
                # same id, DIFFERENT data: must commit nothing — unless
                # compaction burned the id, which must refuse likewise
                rid = committed_data[0]
                poison = [(99, 99)]
                assert not BC.commit_batch(
                    spark.createDataFrame(poison, DDL), root, rid, mode=mode
                ), f"step {step}: redelivered batch {rid} double-committed"
            elif op == "cache_loss":
                # the tombstone index cache is a CACHE: reads must heal
                try:
                    os.remove(os.path.join(BC._tomb_root(root),
                                           BC._TOMB_INDEX))
                except FileNotFoundError:
                    pass
            elif op == "orphan":
                # crash leftovers: an unrenamed staging dir (rename
                # mode) / an unpublished nonce dir (manifest mode) must
                # be structurally invisible to every read
                nonce = uuid.uuid4().hex[:8]
                name = (f"_staging_b{bid:012d}_{nonce}" if mode == BC.RENAME
                        else f"d{bid:012d}_{nonce}")
                spark.createDataFrame([(88, 88)], DDL).write.mode(
                    "overwrite").parquet(os.path.join(root, name))
            elif op == "zombie" and mode == BC.MANIFEST and \
                    os.path.isdir(root):
                # a superseded (fenced-out) writer must commit NOTHING:
                # acquire a newer epoch, then drive every fenced
                # mutation with the stale one — each must refuse
                stale = BC.acquire_writer(root, mode=mode)
                BC.acquire_writer(root, mode=mode)  # supersedes `stale`
                rows = [(int(k), -1) for k in arg]
                df = spark.createDataFrame(rows, DDL)
                with pytest.raises(BC.StaleWriterError):
                    BC.commit_batch(df, root, bid, mode=mode, epoch=stale)
                with pytest.raises(BC.StaleWriterError):
                    BC.delete_keys(spark, root, [int(k) for k in arg],
                                   bid + 1, key_cols="k", mode=mode,
                                   epoch=stale)
            elif op == "snapshot" and os.path.isdir(root):
                pinned[BC.create_snapshot(root, mode=mode)] = Counter(model)
            elif op == "drop_snap" and pinned:
                sid = sorted(pinned)[0]
                BC.drop_snapshot(root, sid, mode=mode)
                del pinned[sid]
                with pytest.raises(ValueError):
                    BC.read_snapshot(spark, root, DDL, sid)
            got = _frame(spark, root, mode)
            assert got == model, (
                f"step {step} ({op} {arg}): visible frame diverged\n"
                f"  extra: {got - model}\n  missing: {model - got}"
            )
        for sid, want in pinned.items():
            got = Counter(
                (r["k"], r["v"])
                for r in BC.read_snapshot(spark, root, DDL, sid).collect()
            )
            assert got == want, (
                f"snapshot {sid} drifted\n"
                f"  extra: {got - want}\n  missing: {want - got}"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(program=st.lists(OPS, min_size=4, max_size=9))
def test_rename_mode_matches_model(spark, program):
    _run_program(spark, BC.RENAME, program)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(program=st.lists(OPS, min_size=4, max_size=9))
def test_manifest_mode_matches_model(spark, program):
    _run_program(spark, BC.MANIFEST, program)


def test_known_hard_interleaving_regression(spark):
    """The r11 ADVICE shape, deterministically: delete → retire-all →
    seal → reinsert → delete again → compact → retire. The second
    delete must survive the sealed sub-log's horizon and the reinsert
    must be live between the deletes."""
    program = [
        ("commit", [1, 2, 3]),
        ("delete", [2]),
        ("compact", None),
        ("retire", None),
        ("commit", [2, 4]),
        ("snapshot", None),
        ("delete", [2, 4]),
        ("compact", None),
        ("retire", None),
        ("cache_loss", None),
        ("commit", [2]),
    ]
    for mode in (BC.RENAME, BC.MANIFEST):
        _run_program(spark, mode, program)
