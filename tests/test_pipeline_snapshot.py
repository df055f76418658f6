"""Consistent multi-store pipeline snapshots (r11 verdict ask #6): one
call pins curation + dedup + ANN at a single logical cut (pin ids
recorded together in a ledger), and the pinned cut replays
hash-identically after further ingest AND deletes on all three stores.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming import pipeline_snapshot as PS
from doreisa_spark.streaming.incremental_ann import LSHVectorStore
from doreisa_spark.streaming.incremental_curation import CurationStore
from doreisa_spark.streaming.incremental_dedup import PrunedLSHSignatureStore

SF_SMALL = "/root/testdata/sf0.001"
EMB_DDL = "vec_id bigint, embedding array<float>, label int"


def _emb_rows(lo, n):
    rng = np.random.default_rng(lo)
    return [(i, [float(x) for x in rng.standard_normal(8)], 0)
            for i in range(lo, lo + n)]


def _stores(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    cur = CurationStore(spark, str(tmp_path / "cur"))
    ded = PrunedLSHSignatureStore(spark, str(tmp_path / "ded"))
    ann = LSHVectorStore(spark, str(tmp_path / "ann"))
    cur.process_batch(docs.where(F.col("doc_id") < 150), 0)
    ded.process_batch(docs.where(F.col("doc_id") < 150), 0)
    ann.process_batch(spark.createDataFrame(_emb_rows(0, 50), EMB_DDL), 0)
    return docs, cur, ded, ann


def _hashes(spark, cur, ded, ann, *, cut=None, proot=None):
    """Order-insensitive content hash of each store's served frame at
    the cut (or live)."""
    pins = PS.read_pipeline_snapshot(proot, cut) if cut is not None else {}

    def h(df):
        cols = [F.col(c).cast("string") for c in sorted(df.columns)]
        row = df.select(
            F.sum(F.crc32(F.concat_ws("|", *cols))).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return (row["h"], row["n"])

    return {
        "curation": h(cur.kept(snapshot=pins.get("curation"))),
        "dedup": h(ded.pairs(snapshot=pins.get("dedup"))),
        "ann": h(ann.members(snapshot=pins.get("ann"))),
    }


def test_pinned_cut_replays_after_ingest_and_deletes(spark, tmp_path):
    docs, cur, ded, ann = _stores(spark, tmp_path)
    proot = str(tmp_path / "pipeline")

    cut = PS.pipeline_snapshot(
        proot, {"curation": cur, "dedup": ded, "ann": ann},
        snapshot_kwargs={"dedup": {"pin_members": True}},
    )
    # the cut is one recorded object: all three pin ids together
    pins = PS.read_pipeline_snapshot(proot, cut)
    assert set(pins) == {"curation", "dedup", "ann"}
    expected = _hashes(spark, cur, ded, ann, cut=cut, proot=proot)
    live_at_pin = _hashes(spark, cur, ded, ann)
    assert expected == live_at_pin  # at pin time, cut == live

    # churn ALL THREE stores: further ingest + takedowns
    cur.process_batch(docs.where(F.col("doc_id").between(150, 250)), 1)
    ded.process_batch(docs.where(F.col("doc_id").between(150, 250)), 1)
    ann.process_batch(spark.createDataFrame(_emb_rows(50, 50), EMB_DDL), 1)
    cur.delete_docs([int(r["doc_id"]) for r in cur.kept().limit(3).collect()])
    ded.delete_docs([int(ded.members().limit(1).collect()[0]["doc_id"])])
    ann.delete_vectors([5, 7])

    # live state moved ...
    assert _hashes(spark, cur, ded, ann) != expected
    # ... the pinned cut did not: hash-identical replay
    assert _hashes(spark, cur, ded, ann, cut=cut, proot=proot) == expected

    # releasing the cut drops every member pin + the ledger entry
    assert PS.drop_pipeline_snapshot(
        proot, cut, {"curation": cur, "dedup": ded, "ann": ann}
    )
    assert PS.list_pipeline_snapshots(proot) == {}
    assert BC.list_snapshots(cur._kept) == {}
    assert BC.list_snapshots(ded.pairs_dir) == {}
    assert BC.list_snapshots(ann._members) == {}


def test_partial_pin_failure_leaks_nothing(spark, tmp_path, monkeypatch):
    """If one store's pin raises, already-taken pins are released and
    no ledger entry appears — a cut is all-or-nothing."""
    _, cur, ded, ann = _stores(spark, tmp_path)
    proot = str(tmp_path / "pipeline")
    monkeypatch.setattr(ann, "snapshot", lambda **kw: (_ for _ in ()).throw(
        RuntimeError("pin failed")))
    with pytest.raises(RuntimeError, match="pin failed"):
        PS.pipeline_snapshot(
            proot, {"curation": cur, "dedup": ded, "ann": ann}
        )
    assert PS.list_pipeline_snapshots(proot) == {}
    assert BC.list_snapshots(cur._kept) == {}
    assert BC.list_snapshots(ded.pairs_dir) == {}


def test_expire_pipeline_cuts(spark, tmp_path):
    _, cur, ded, ann = _stores(spark, tmp_path)
    proot = str(tmp_path / "pipeline")
    stores = {"curation": cur, "ann": ann}
    cuts = [PS.pipeline_snapshot(proot, stores) for _ in range(3)]
    dropped = PS.expire_pipeline_snapshots(proot, stores, keep_last=1)
    assert dropped == cuts[:2]
    assert sorted(PS.list_pipeline_snapshots(proot)) == [cuts[2]]
    # only the kept cut's member pins remain
    assert len(BC.list_snapshots(cur._kept)) == 1
    assert len(BC.list_snapshots(ann._members)) == 1


def test_drop_requires_every_member(spark, tmp_path):
    _, cur, ded, ann = _stores(spark, tmp_path)
    proot = str(tmp_path / "pipeline")
    cut = PS.pipeline_snapshot(proot, {"curation": cur, "ann": ann})
    with pytest.raises(ValueError, match="ann"):
        PS.drop_pipeline_snapshot(proot, cut, {"curation": cur})
    # nothing was dropped by the refused call
    assert len(BC.list_snapshots(cur._kept)) == 1
    assert PS.drop_pipeline_snapshot(proot, cut, {"curation": cur, "ann": ann})
    with pytest.raises(ValueError, match="no pipeline snapshot"):
        PS.read_pipeline_snapshot(proot, cut)


def test_aggregate_store_joins_the_cut(spark, tmp_path):
    """The stats table rides the same cut as the training set: an
    AggregateStore (r12) satisfies the snapshot()/drop_snapshot()
    protocol, so 'corpus + its per-group statistics' is one
    reproducible object — post-cut ingest moves the live view but not
    the pinned one."""
    from doreisa_spark.streaming.incremental_agg import AggregateStore

    agg = AggregateStore(spark, str(tmp_path / "agg"), key_cols=["g"],
                         aggs={"cnt": ("count", None)},
                         commit_mode=BC.MANIFEST)
    agg.process_batch(
        spark.range(100).select((F.col("id") % 5).alias("g")), 0)
    proot = str(tmp_path / "pipeline")
    cut = PS.pipeline_snapshot(proot, {"stats": agg})
    pinned = {(r["g"], r["cnt"])
              for r in agg.read(snapshot=PS.read_pipeline_snapshot(
                  proot, cut)["stats"]).collect()}
    agg.process_batch(
        spark.range(300).select((F.col("id") % 5).alias("g")), 1)
    live = {(r["g"], r["cnt"]) for r in agg.read().collect()}
    assert live != pinned
    again = {(r["g"], r["cnt"])
             for r in agg.read(snapshot=PS.read_pipeline_snapshot(
                 proot, cut)["stats"]).collect()}
    assert again == pinned
    assert PS.drop_pipeline_snapshot(proot, cut, {"stats": agg})
