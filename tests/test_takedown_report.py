"""Takedown-compliance report over snapshots (r11 verdict ask #5):
``takedown_retention_report(root, tid)`` lists the retained snapshots
still pinning rows the delete masks, with the bytes each holds, and
goes ``clear`` exactly when the retention contract says the takedown
has reached every remaining byte.
"""

from __future__ import annotations

import pytest

from doreisa_spark.streaming import batch_commit as BC

DDL = "k bigint, v string"


def _commit(spark, root, b, rows, mode=BC.MANIFEST):
    BC.commit_batch(spark.createDataFrame(rows, DDL).coalesce(1), root, b, mode=mode)


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_report_lists_predating_pins_only(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    for b in range(3):
        _commit(spark, root, b, [(b * 10 + i, "x") for i in range(4)], mode)
    s_pre = BC.create_snapshot(root, mode=mode)      # predates the delete
    assert BC.delete_keys(spark, root, [11], 3, key_cols="k", mode=mode)
    s_post = BC.create_snapshot(root, mode=mode)     # carries the delete

    rep = BC.takedown_retention_report(root, 3, mode=mode)
    assert rep["covers"] == 2 and rep["retired"] is False
    ids = [s["id"] for s in rep["snapshots"]]
    assert ids == [s_pre], "only the pre-delete pin SERVES masked rows"
    assert rep["snapshots"][0]["bytes"] > 0
    assert len(rep["snapshots"][0]["dirs"]) == 3  # all three pinned batches
    assert rep["total_bytes"] > 0 and rep["clear"] is False

    # the post-delete pin masks the rows at read but still physically
    # pins the pre-delete batch dirs holding their bytes — the report's
    # second tier (r12 review: clear != bytes gone)
    assert [s["id"] for s in rep["masked_pins"]] == [s_post]
    assert rep["physically_clear"] is False
    got = {r["k"] for r in BC.read_snapshot(spark, root, DDL, s_post).collect()}
    assert 11 not in got

    # dropping the predating pin clears SERVING; physical clearance
    # needs the masked pin gone too
    assert BC.drop_snapshot(root, s_pre, mode=mode)
    rep2 = BC.takedown_retention_report(root, 3, mode=mode)
    assert rep2["clear"] is True and rep2["snapshots"] == []
    assert rep2["total_bytes"] == 0
    assert rep2["physically_clear"] is False
    assert BC.drop_snapshot(root, s_post, mode=mode)
    assert BC.takedown_retention_report(root, 3, mode=mode)["physically_clear"] \
        is True


@pytest.mark.parametrize("mode", [BC.RENAME, BC.MANIFEST])
def test_report_survives_retirement_and_flags_old_pin(spark, tmp_path, mode):
    """After the tombstone retires (sub-log sealed, live reads plain),
    an old pre-delete pin still shows up as retaining — the pin is the
    ONLY remaining record, and the report finds covers in it."""
    root = str(tmp_path / "log")
    for b in range(3):
        _commit(spark, root, b, [(b * 10 + i, "x") for i in range(4)], mode)
    s_pre = BC.create_snapshot(root, mode=mode)
    assert BC.delete_keys(spark, root, [11], 3, key_cols="k", mode=mode)
    _commit(spark, root, 4, [(40, "x")], mode)
    assert BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    assert BC._tomb_index(root, mode=mode) == {}  # retired

    rep = BC.takedown_retention_report(root, 3, mode=mode)
    assert rep["retired"] is True
    assert [s["id"] for s in rep["snapshots"]] == [s_pre]
    # a pin created NOW (post-retirement) pins only live dirs, which
    # retirement proved clean — it must NOT be flagged, in EITHER tier,
    # even after its pinned segments are later merged away from the
    # live set (r12 review: the pin records the retirement watermark)
    s_now = BC.create_snapshot(root, mode=mode)
    for b in range(5, 9):
        _commit(spark, root, b, [(b * 10, "x")], mode)
    assert BC.compact(spark, root, DDL, keep_last=1, mode=mode, order_by=["k"])
    rep2 = BC.takedown_retention_report(root, 3, mode=mode)
    assert [s["id"] for s in rep2["snapshots"]] == [s_pre]
    assert [s["id"] for s in rep2["masked_pins"]] == []
    BC.drop_snapshot(root, s_pre, mode=mode)
    rep3 = BC.takedown_retention_report(root, 3, mode=mode)
    assert rep3["clear"] is True and rep3["physically_clear"] is True
    BC.drop_snapshot(root, s_now, mode=mode)


def test_unknown_tid_raises(spark, tmp_path):
    root = str(tmp_path / "log")
    _commit(spark, root, 0, [(1, "x")])
    with pytest.raises(ValueError, match="no record"):
        BC.takedown_retention_report(root, 99)


def test_report_on_vector_store_members_log(spark, tmp_path):
    """The recipe a deployment runs: compose the report with a store's
    members log root (the BASELINE.md recipe)."""
    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    import numpy as np

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.standard_normal(8)], 0)
            for i in range(40)]
    store = LSHVectorStore(spark, str(tmp_path / "ann"))
    store.process_batch(
        spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int"), 0
    )
    sid = store.snapshot()
    store.delete_vectors([3, 7])
    tid = max(BC._tomb_index(store._members))
    rep = BC.takedown_retention_report(store._members, tid)
    assert [s["id"] for s in rep["snapshots"]] == [sid]
    assert rep["clear"] is False
    store.drop_snapshot(sid)
    assert BC.takedown_retention_report(store._members, tid)["clear"] is True
