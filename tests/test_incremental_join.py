"""JoinedAggregateView: incrementally-maintained grouped views over
fact ⋈ dim (streaming/incremental_join.py).

Batch equivalence vs the one-pass joined GROUP BY under any arrival
order on BOTH inputs, dim-version upserts (newest wins regardless of
arrival order), exactly-once on redelivery of either side, inner/left
semantics, dim takedowns, and two-sided snapshot replay after churn.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming.incremental_join import JoinedAggregateView

FACT_ROWS = [
    # (fk, event_type, value)
    (1, "click", 2.0), (1, "view", 1.0), (2, "click", 5.0),
    (2, "click", 3.0), (3, "view", 7.0), (4, "click", 11.0),
    (9, "view", 13.0),  # no dim match
]
DIM_ROWS = [
    # (doc_id, source, version)
    (1, "web", 1), (2, "web", 1), (3, "pdf", 1), (4, "pdf", 1),
]


def _frames(spark):
    f = spark.createDataFrame(FACT_ROWS, "fk bigint, et string, v double")
    d = spark.createDataFrame(DIM_ROWS, "doc_id bigint, source string, ver int")
    return f, d


def _view(spark, tmp_path, name="jv", **kw):
    return JoinedAggregateView(
        spark, str(tmp_path / name),
        fk="fk", fact_keys=["et"],
        fact_aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="ver",
        **kw,
    )


def _got(df):
    return {tuple(r) for r in df.collect()}


def _expected_inner(f, d):
    return _got(
        f.join(d, f["fk"] == d["doc_id"]).groupBy("source", "et").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
    )


def test_matches_one_pass_join_any_arrival_order(spark, tmp_path):
    f, d = _frames(spark)
    v = _view(spark, tmp_path)
    # interleaved, out-of-order on both sides
    v.process_fact_batch(f.where("fk >= 3"))
    v.process_dim_batch(d.where("doc_id in (2, 4)"))
    v.process_fact_batch(f.where("fk < 3"))
    v.process_dim_batch(d.where("doc_id in (1, 3)"))
    assert _got(v.read(["source", "et"])) == _expected_inner(f, d)


def test_dim_update_newest_wins_out_of_order(spark, tmp_path):
    f, d = _frames(spark)
    v = _view(spark, tmp_path)
    v.process_fact_batch(f)
    # version 2 of doc 1 moves it web -> pdf; it arrives BEFORE version 1
    upd = spark.createDataFrame([(1, "pdf", 2)],
                                "doc_id bigint, source string, ver int")
    v.process_dim_batch(upd)
    v.process_dim_batch(d)
    d_latest = spark.createDataFrame(
        [(1, "pdf", 2), (2, "web", 1), (3, "pdf", 1), (4, "pdf", 1)],
        "doc_id bigint, source string, ver int",
    )
    assert _got(v.read(["source", "et"])) == _expected_inner(f, d_latest)


def test_redelivery_noops_on_both_sides(spark, tmp_path):
    f, d = _frames(spark)
    v = _view(spark, tmp_path)
    fid = v.process_fact_batch(f.where("fk < 3"))
    did = v.process_dim_batch(d)
    v.process_fact_batch(f.where("fk >= 3"))
    # redeliver both committed ids: the exactly-once log refuses them
    v.process_fact_batch(f.where("fk < 3"), batch_id=fid)
    v.process_dim_batch(d, batch_id=did)
    assert _got(v.read(["source", "et"])) == _expected_inner(f, d)


def test_left_join_keeps_unmatched_fact_groups(spark, tmp_path):
    f, d = _frames(spark)
    v = _view(spark, tmp_path)
    v.process_fact_batch(f)
    v.process_dim_batch(d)
    exp = _got(
        f.join(d, f["fk"] == d["doc_id"], "left").groupBy("source").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
    )
    got = _got(v.read(["source"], how="left"))
    assert got == exp
    assert any(r[0] is None for r in got)  # the unmatched fk=9 group


def test_dim_takedown_hides_contribution(spark, tmp_path):
    f, d = _frames(spark)
    v = _view(spark, tmp_path)
    v.process_fact_batch(f)
    v.process_dim_batch(d)
    v.delete_dim_keys([3, 4])  # pdf docs taken down
    assert _got(v.read(["source", "et"])) == _expected_inner(
        f, d.where("doc_id in (1, 2)"))


def test_snapshot_replays_across_churn_on_both_sides(spark, tmp_path):
    f, d = _frames(spark)
    v = _view(spark, tmp_path)
    v.process_fact_batch(f.where("fk < 3"))
    v.process_dim_batch(d)
    pins = v.snapshot()
    before = _got(v.read(["source", "et"]))
    # churn: more facts, a dim move, a dim takedown
    v.process_fact_batch(f.where("fk >= 3"))
    v.process_dim_batch(spark.createDataFrame(
        [(2, "pdf", 9)], "doc_id bigint, source string, ver int"))
    v.delete_dim_keys([1])
    after = _got(v.read(["source", "et"]))
    assert after != before
    assert _got(v.read(["source", "et"], fact_snapshot=pins["fact"],
                       dim_snapshot=pins["dim"])) == before
    v.drop_snapshot(pins)


def test_distributive_extras_regroup_exactly(spark, tmp_path):
    """min/max/hll survive the FK-grain → final-grain re-group: the
    register-map merge of FK subgroups IS the HLL of the union."""
    f, d = _frames(spark)
    v = JoinedAggregateView(
        spark, str(tmp_path / "jx"),
        fk="fk", fact_keys=[],
        fact_aggs={"mn": ("min", "v"), "mx": ("max", "v"),
                   "users": ("hll", "et")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="ver",
    )
    v.process_fact_batch(f.where("fk % 2 = 0"))
    v.process_fact_batch(f.where("fk % 2 = 1"))
    v.process_dim_batch(d)
    exp = {
        (r["source"], r["mn"], r["mx"], r["users"])
        for r in f.join(d, f["fk"] == d["doc_id"]).groupBy("source").agg(
            F.min("v").alias("mn"), F.max("v").alias("mx"),
            F.countDistinct("et").alias("users")).collect()
    }  # tiny cardinalities land in HLL's exact linear-counting range
    assert _got(v.read(["source"])) == exp


def test_dim_column_collision_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="collide"):
        JoinedAggregateView(
            spark, str(tmp_path / "bad"),
            fk="fk", fact_keys=["source"],
            fact_aggs={"cnt": ("count", None)},
            dim_key="doc_id", dim_cols=["source"], dim_order_by="ver",
        )


def test_star_two_dims_snapshot_and_takedown(spark, tmp_path):
    """Star form: two dims, independent updates, per-dim takedown, and
    a full star pin replay."""
    f = spark.createDataFrame(
        [(1, 10, "click", 2.0), (2, 11, "view", 3.0), (1, 11, "click", 5.0),
         (9, 10, "view", 7.0)],  # fk 9: no doc match
        "dfk bigint, gfk bigint, et string, v double",
    )
    docs = spark.createDataFrame([(1, "web", 1), (2, "pdf", 1)],
                                 "doc_id bigint, source string, ver int")
    geo = spark.createDataFrame([(10, "US", 1), (11, "FR", 1)],
                                "geo_id bigint, region string, ver int")
    v = JoinedAggregateView(
        spark, str(tmp_path / "star"), fact_keys=["et"],
        fact_aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
        dims=[
            {"name": "doc", "fk": "dfk", "key": "doc_id",
             "cols": ["source"], "order_by": "ver"},
            {"name": "geo", "fk": "gfk", "key": "geo_id",
             "cols": ["region"], "order_by": "ver"},
        ],
    )
    v.process_dim_batch(geo, dim="geo")
    v.process_fact_batch(f)
    v.process_dim_batch(docs, dim="doc")

    def exp(fd, dd, gd):
        return _got(
            fd.join(dd, fd["dfk"] == dd["doc_id"])
              .join(gd, fd["gfk"] == gd["geo_id"])
              .groupBy("source", "region", "et").agg(
                  F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
        )

    assert _got(v.read(["source", "region", "et"])) == exp(f, docs, geo)
    pins = v.snapshot()
    before = _got(v.read(["source", "region", "et"]))
    # dim updates on both sides + a geo takedown
    v.process_dim_batch(
        spark.createDataFrame([(1, "pdf", 2)],
                              "doc_id bigint, source string, ver int"),
        dim="doc")
    v.delete_dim_keys([10], dim="geo")
    docs2 = spark.createDataFrame([(1, "pdf", 2), (2, "pdf", 1)],
                                  "doc_id bigint, source string, ver int")
    geo2 = geo.where("geo_id = 11")
    assert _got(v.read(["source", "region", "et"])) == exp(f, docs2, geo2)
    # the pinned star replays the pre-churn view exactly
    assert _got(v.read_pins(pins, ["source", "region", "et"])) == before
    v.drop_snapshot(pins)


def test_star_requires_dim_name_on_ambiguity(spark, tmp_path):
    v = JoinedAggregateView(
        spark, str(tmp_path / "star2"), fact_keys=[],
        fact_aggs={"cnt": ("count", None)},
        dims=[
            {"name": "a", "fk": "fa", "key": "ka",
             "cols": ["ca"], "order_by": "ka"},
            {"name": "b", "fk": "fb", "key": "kb",
             "cols": ["cb"], "order_by": "kb"},
        ],
    )
    d = spark.createDataFrame([(1, "x")], "ka bigint, ca string")
    with pytest.raises(ValueError, match="name one"):
        v.process_dim_batch(d)
    with pytest.raises(ValueError, match="no dim named"):
        v.process_dim_batch(d, dim="zzz")
