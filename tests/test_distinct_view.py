"""Exact retractable distinct-counts / heavy-hitters (DistinctView).

The support-count arrangement: an inner pair-grain retractable store
gives EXACT ``count(DISTINCT v)`` and exact per-group top-k under
row-level CDC — the standard IVM treatment for the two aggregate
classes (hll/topk) the sketch store refuses to retract. These tests
pin the SQL semantics (NULLs, group existence, post-delete equality in
any arrival order), the CDC contract inherited from the inner store
(mixed batches, redelivery refusal, over-deletion audit), and the
persistence surface (reopen, snapshots, spec mismatch refusal).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming.incremental_distinct import DistinctView


def _rows(spark, n=200):
    # k: 4 groups; v: value with a skewed distribution so top-k is
    # non-trivial; some NULL values (v is NULL when id % 13 == 0)
    return spark.range(n).select(
        (F.col("id") % 4).alias("k"),
        F.when(F.col("id") % 13 != 0,
               (F.col("id") % 7) * (F.col("id") % 3)).alias("v"),
        F.col("id"),
    )


def _view(spark, tmp_path, name="dv", **kw):
    return DistinctView(spark, str(tmp_path / name), key_cols=["k"],
                        value_col="v", **kw)


def _expect_distinct(df):
    return {r["k"]: r["d"] for r in df.groupBy("k").agg(
        F.countDistinct("v").alias("d")).collect()}


def _got_distinct(view, **kw):
    return {r["k"]: r["distinct_v"]
            for r in view.read_distinct(**kw).collect()}


def _expect_topk(df, k):
    from pyspark.sql import Window as W

    pairs = df.where(F.col("v").isNotNull()).groupBy("k", "v").agg(
        F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("k").orderBy(F.desc("n"), F.asc("v"))
    top = pairs.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= k)
    return sorted((r["k"], r["v"], r["n"]) for r in top.collect())


def test_distinct_matches_post_delete_any_order(spark, tmp_path):
    rows = _rows(spark)
    v = _view(spark, tmp_path)
    # delete arrives before most of its inserts (commutative Z-set merge)
    v.process_retract_batch(rows.where("id % 3 = 1"))
    v.process_batch(rows.where("id % 2 = 0"))
    v.process_batch(rows.where("id % 2 = 1"))
    expect = _expect_distinct(rows.where("id % 3 != 1"))
    assert _got_distinct(v) == expect


def test_value_fully_deleted_stops_counting(spark, tmp_path):
    rows = _rows(spark, 60)
    v = _view(spark, tmp_path)
    v.process_batch(rows)
    # remove EVERY occurrence of one value in one group
    kill = rows.where("k = 1 AND v = 2")
    assert kill.count() > 0
    v.process_retract_batch(kill)
    expect = _expect_distinct(
        rows.exceptAll(kill))
    assert _got_distinct(v) == expect
    # the arrangement row is gone, not zeroed
    pairs = v.read_counts().where("k = 1 AND v = 2")
    assert pairs.count() == 0


def test_group_fully_deleted_drops_row(spark, tmp_path):
    rows = _rows(spark, 80)
    v = _view(spark, tmp_path)
    v.process_batch(rows)
    v.process_retract_batch(rows.where("k = 2"))
    got = _got_distinct(v)
    assert 2 not in got
    assert set(got) == {0, 1, 3}


def test_null_values_follow_sql(spark, tmp_path):
    # group 9 holds ONLY null-valued rows: distinct = 0, group present
    rows = spark.range(30).select(
        F.lit(9).alias("k"), F.lit(None).cast("bigint").alias("v"),
        F.col("id"))
    v = _view(spark, tmp_path)
    v.process_batch(rows)
    got = v.read_distinct(include_total=True).collect()
    assert len(got) == 1
    assert got[0]["distinct_v"] == 0 and got[0]["cnt"] == 30
    # NULL never ranks in top-k
    assert v.read_topk(3).count() == 0
    # deleting the null rows drops the group entirely
    v.process_retract_batch(rows)
    assert v.read_distinct().count() == 0


def test_topk_exact_with_deterministic_ties(spark, tmp_path):
    rows = _rows(spark)
    v = _view(spark, tmp_path)
    v.process_batch(rows.where("id % 2 = 0"))
    v.process_batch(rows.where("id % 2 = 1"))
    v.process_retract_batch(rows.where("id % 5 = 2"))
    surviving = rows.where("id % 5 != 2")
    for k in (1, 3, 10_000):
        got = sorted((r["k"], r["v"], r["n"])
                     for r in v.read_topk(k).collect())
        assert got == _expect_topk(surviving, k)
    with pytest.raises(ValueError, match="k must be"):
        v.read_topk(0)


def test_cdc_mixed_batch_and_update(spark, tmp_path):
    rows = _rows(spark, 90)
    v = _view(spark, tmp_path)
    v.process_batch(rows)
    # UPDATE id=7's value: Z-set decomposition in ONE atomic batch
    old = rows.where("id = 7").withColumn("op", F.lit("D"))
    new = rows.where("id = 7").withColumn("v", F.lit(999)) \
        .withColumn("op", F.lit("I"))
    v.process_cdc_batch(old.unionByName(new))
    after = rows.where("id != 7").unionByName(
        rows.where("id = 7").withColumn("v", F.lit(999)))
    assert _got_distinct(v) == _expect_distinct(after)
    # unknown op fails loudly and commits nothing
    nid = v.next_batch_id()
    with pytest.raises(ValueError, match="unknown op"):
        v.process_cdc_batch(
            rows.limit(3).withColumn("op", F.lit("X")))
    assert v.next_batch_id() == nid


def test_redelivered_batch_refused(spark, tmp_path):
    rows = _rows(spark, 40)
    v = _view(spark, tmp_path)
    bid = v.process_batch(rows, 7)
    assert bid == 7
    before = _got_distinct(v)
    v.process_batch(rows, 7)  # same id: exactly-once no-op, no double count
    assert _got_distinct(v) == before


def test_over_deletion_audit(spark, tmp_path):
    rows = _rows(spark, 40)
    v = _view(spark, tmp_path)
    v.process_batch(rows.where("id < 20"))
    v.process_retract_batch(rows.where("id < 25"))  # 5 never inserted
    bad = v.unmatched_retractions().collect()
    assert len(bad) > 0 and all(r["support"] < 0 for r in bad)


def test_reopen_and_spec_mismatch(spark, tmp_path):
    rows = _rows(spark, 50)
    v = _view(spark, tmp_path)
    v.process_batch(rows)
    expect = _got_distinct(v)
    v2 = DistinctView(spark, str(tmp_path / "dv"))
    assert v2.key_cols == ["k"] and v2.value_col == "v"
    assert _got_distinct(v2) == expect
    with pytest.raises(ValueError, match="value_col"):
        DistinctView(spark, str(tmp_path / "dv"), key_cols=["k"],
                     value_col="id")
    with pytest.raises(ValueError, match="required"):
        DistinctView(spark, str(tmp_path / "fresh"))
    with pytest.raises(ValueError, match="group key"):
        DistinctView(spark, str(tmp_path / "fresh2"), key_cols=["k"],
                     value_col="k")


def test_snapshot_pins_pre_delete_state(spark, tmp_path):
    rows = _rows(spark, 60)
    v = _view(spark, tmp_path)
    v.process_batch(rows)
    snap = v.snapshot()
    v.process_retract_batch(rows.where("id % 2 = 0"))
    assert _got_distinct(v) == _expect_distinct(rows.where("id % 2 = 1"))
    assert _got_distinct(v, snapshot=snap) == _expect_distinct(rows)
    assert v.drop_snapshot(snap)


def test_value_takedown_via_delete_groups(spark, tmp_path):
    rows = _rows(spark, 70)
    v = _view(spark, tmp_path)
    v.process_batch(rows)
    # forget value 4 everywhere (GDPR-style): tombstone at pair grain
    v.delete_groups([4], col="v")
    expect = _expect_distinct(rows.where("v IS NULL OR v != 4"))
    assert _got_distinct(v) == expect


def test_joined_distinct_and_topk_exact(spark, tmp_path):
    """The arrangement is LOSSLESS through the join re-group: exact
    distinct and exact top-k at the dim-attribute grain under
    fact-side CDC, vs a direct computation over the post-delete join."""
    from doreisa_spark.streaming.incremental_distinct import (
        read_joined_distinct, read_joined_topk,
    )
    from doreisa_spark.streaming.incremental_join import (
        JoinedAggregateView,
    )

    facts = spark.range(300).select(
        (F.col("id") % 10).alias("fk"),
        (F.col("id") % 6).alias("u"),
        F.col("id"),
    )
    dims = spark.range(10).select(
        F.col("id").alias("dk"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
    )
    view = JoinedAggregateView(
        spark, str(tmp_path / "jd"), fk="fk", fact_keys=["u"],
        fact_aggs={"n": ("count", None)}, dim_key="dk",
        dim_cols=["grp"], dim_order_by="dk", retractable=True,
    )
    view.process_fact_batch(facts.where("id % 2 = 0"))
    view.process_dim_batch(dims)
    view.process_fact_retract_batch(facts.where("id % 7 = 3"))
    view.process_fact_batch(facts.where("id % 2 = 1"))

    surviving = facts.where("id % 7 != 3").join(
        dims, facts["fk"] == dims["dk"])
    expect = {r["grp"]: r["d"] for r in surviving.groupBy("grp").agg(
        F.countDistinct("u").alias("d")).collect()}
    got = {r["grp"]: r["distinct_u"] for r in
           read_joined_distinct(view, "u", ["grp"]).collect()}
    assert got == expect

    from pyspark.sql import Window as W

    pairs = surviving.groupBy("grp", "u").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("grp").orderBy(F.desc("n"), F.asc("u"))
    exp_tk = sorted(
        (r["grp"], r["u"], r["n"]) for r in
        pairs.withColumn("r", F.row_number().over(w))
        .where("r <= 2").collect())
    got_tk = sorted(
        (r["grp"], r["u"], r["n"]) for r in
        read_joined_topk(view, "u", ["grp"], 2).collect())
    assert got_tk == exp_tk

    # exact quantile_disc at the joined grain, vs DuckDB
    import duckdb

    from doreisa_spark.streaming.incremental_distinct import (
        read_joined_quantiles,
    )

    con = duckdb.connect()
    con.register("s", surviving.select("grp", "u").toPandas())
    exp_q = {r[0]: (r[1], r[2]) for r in con.execute(
        "SELECT grp, quantile_disc(u, 0.5), quantile_disc(u, 0.9) "
        "FROM s GROUP BY grp").fetchall()}
    got_q = {r["grp"]: (r["q_0_5"], r["q_0_9"]) for r in
             read_joined_quantiles(view, "u", ["grp"],
                                   [0.5, 0.9]).collect()}
    assert got_q == exp_q


def test_exact_quantiles_match_duckdb_disc(spark, tmp_path):
    """read_quantiles implements SQL quantile_disc exactly: smallest
    value whose cumulative count reaches ceil(q * total), NULLs never
    counting but all-NULL groups keeping a row — differentially checked
    vs DuckDB over the post-delete table, plus boundary probes."""
    import duckdb

    rows = _rows(spark)
    v = _view(spark, tmp_path)
    v.process_batch(rows.where("id % 2 = 0"))
    v.process_retract_batch(rows.where("id % 5 = 2"))
    v.process_batch(rows.where("id % 2 = 1"))
    pdf = rows.where("id % 5 != 2").toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    exp = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        "SELECT k, quantile_disc(v, 0.25), quantile_disc(v, 0.5), "
        "quantile_disc(v, 0.9) FROM t GROUP BY k").fetchall()}
    got = {r["k"]: (r["q_0_25"], r["q_0_5"], r["q_0_9"])
           for r in v.read_quantiles([0.25, 0.5, 0.9]).collect()}
    assert got == exp
    with pytest.raises(ValueError, match="quantiles"):
        v.read_quantiles([0.0])
    # all-NULL group keeps its row with NULL quantiles
    v2 = _view(spark, tmp_path, name="qnull")
    v2.process_batch(spark.range(5).select(
        F.lit(3).alias("k"), F.lit(None).cast("bigint").alias("v"),
        F.col("id")))
    r = v2.read_quantiles([0.5]).collect()
    assert len(r) == 1 and r[0]["q_0_5"] is None


def test_windowed_distinct_with_retention(spark, tmp_path):
    """The daily-uniques shape: distinct users per (day, segment) with
    CDC exactness, expired days dropped by retention while later days
    keep serving — window keys are just more group keys, so the whole
    store lifecycle applies unchanged."""
    rows = spark.createDataFrame(
        [(d, s, u) for d in (1, 2, 3) for s in ("a", "b")
         for u in range(d * 3)],
        "day bigint, seg string, u bigint")
    v = DistinctView(spark, str(tmp_path / "dau"),
                     key_cols=["day", "seg"], value_col="u")
    v.process_batch(rows)
    v.process_retract_batch(rows.where("day = 2 AND u = 0"))
    got = {(r["day"], r["seg"]): r["distinct_u"]
           for r in v.read_distinct().collect()}
    assert got == {(1, "a"): 3, (1, "b"): 3, (2, "a"): 5, (2, "b"): 5,
                   (3, "a"): 9, (3, "b"): 9}
    expired = v.expire_windows(2, col="day")
    assert sorted(expired) == [1]
    got = {(r["day"], r["seg"]): r["distinct_u"]
           for r in v.read_distinct().collect()}
    assert set(d for d, _ in got) == {2, 3}


def test_churn_state_stays_bounded_by_live_pairs(spark, tmp_path):
    """The arrangement's operational hazard is churn: ever-seen pairs
    vastly outnumber live pairs when values rotate (session ids,
    tokens). Z-set consolidation at roll-up (incremental_agg._roll_up)
    must keep the pair-grain log tracking LIVE pairs — retired cycles
    consolidate away once the tiered policy merges their band."""
    v = DistinctView(spark, str(tmp_path / "churn"), key_cols=["k"],
                     value_col="v", compact_every=2)

    def gen(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 2).alias("k"), F.col("id").alias("v"))

    v.process_batch(gen(0, 4))  # 4 pairs stay live
    for c in range(8):
        cyc = gen(1000 + c * 40, 1040 + c * 40)
        v.process_batch(cyc)
        v.process_retract_batch(cyc)
    pair_rows = v.store.partials().count()
    # 4 live + only the newest cycles' unmerged halves; ever-seen = 324
    assert pair_rows <= 170, pair_rows
    got = {r["k"]: r["distinct_v"] for r in v.read_distinct().collect()}
    assert got == {0: 2, 1: 2}


def test_cdc_stream_drive_exactly_once(spark, tmp_path):
    """drive_cdc_view accepts a DistinctView duck-typed, with the same
    crash-after-commit exactly-once guarantee as the sketch stores: a
    mixed batch's commit lands, the sink crashes before the checkpoint,
    the restart redelivers the batch under the same id and the refusal
    makes it a no-op — exact distinct counts equal the one-pass
    expectation."""
    import os

    from doreisa_spark.streaming.incremental_agg import drive_cdc_view
    from doreisa_spark.streaming.structured import run_foreach_batch

    src = tmp_path / "cdc_in"
    src.mkdir()
    frames = [
        [(k, v, "I") for k in range(2) for v in (1, 1, 2, 3)],
        [(0, 1, "D"), (0, 1, "D"), (1, 9, "I")],  # drains value 1 of k=0
        [(1, 3, "D"), (0, 7, "I")],
    ]
    for i, rows in enumerate(frames):
        df = spark.createDataFrame(rows, "k bigint, v bigint, op string")
        tmp = tmp_path / f"t{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        os.rename(str(tmp / data), str(src / f"{i:05d}.parquet"))
        os.utime(str(src / f"{i:05d}.parquet"),
                 (1_700_000_000 + i * 10,) * 2)

    def read_stream():
        return (spark.readStream.schema("k bigint, v bigint, op string")
                .option("maxFilesPerTrigger", 1).parquet(str(src)))

    view = _view(spark, tmp_path, name="cdcdv")
    ckpt = str(tmp_path / "ckpt")
    crashed = {"n": 0}

    def crashing(df, bid):
        view.process_cdc_batch(df, bid)
        if bid == 1 and crashed["n"] == 0:
            crashed["n"] = 1
            raise RuntimeError("crash after mixed-batch commit")

    try:
        run_foreach_batch(read_stream(), crashing, timeout_sec=120,
                          checkpoint=ckpt)
    except Exception:
        pass
    assert crashed["n"] == 1
    final = drive_cdc_view(read_stream(), view, checkpoint=ckpt,
                           timeout_sec=120)
    # k0 survivors: {2, 3, 7} (both copies of value 1 deleted);
    # k1 survivors: {1, 1, 2, 9} (value 3 deleted)
    got = {r["k"]: r["distinct_v"] for r in final.collect()}
    assert got == {0: 3, 1: 3}


def test_seeded_random_differential(spark, tmp_path):
    """Random insert/retract interleavings vs a pandas model of the
    post-delete table — the same style as the bounded-extrema
    differential (tests/test_retraction_properties.py)."""
    import random

    rng = random.Random(0xD15C)
    live: list[tuple[int, int]] = []  # (id, v) currently inserted
    v = _view(spark, tmp_path)
    next_id = 0
    for step in range(6):
        if live and rng.random() < 0.4:
            take = rng.sample(live, k=max(1, len(live) // 3))
            for t in take:
                live.remove(t)
            df = spark.createDataFrame(
                [(i % 3, val, i) for i, val in take], "k long, v long, id long")
            v.process_retract_batch(df)
        else:
            batch = [(next_id + j, rng.randrange(6)) for j in range(25)]
            next_id += 25
            live.extend(batch)
            df = spark.createDataFrame(
                [(i % 3, val, i) for i, val in batch],
                "k long, v long, id long")
            v.process_batch(df)
    import pandas as pd

    if live:
        model = pd.DataFrame([(i % 3, val) for i, val in live],
                             columns=["k", "v"])
        expect = model.groupby("k")["v"].nunique().to_dict()
    else:
        expect = {}
    assert _got_distinct(v) == expect
    # the same end state must agree on ALL THREE read surfaces: top-k
    # (count desc, value asc) and quantile_disc (exact index rule) vs
    # the model
    if live:
        cnt = model.groupby(["k", "v"]).size().reset_index(name="n")
        exp_tk = sorted(
            (r.k, r.v, r.n) for _, g in cnt.groupby("k")
            for r in g.sort_values(["n", "v"], ascending=[False, True])
            .head(2).itertuples())
        got_tk = sorted((r["k"], r["v"], r["n"])
                        for r in v.read_topk(2).collect())
        assert got_tk == exp_tk
        import math

        def disc(g, q):
            s = sorted(g)
            return s[math.ceil(q * len(s)) - 1]  # q exact in halves

        exp_q = {k: disc(list(g["v"]), 0.5)
                 for k, g in model.groupby("k")}
        got_q = {r["k"]: r["q_0_5"]
                 for r in v.read_quantiles([0.5]).collect()}
        assert got_q == exp_q


def test_distinct_view_rides_pipeline_txn(spark, tmp_path):
    """A DistinctView is a valid pipeline-txn sink (duck-typed on
    next_batch_id/process_batch): one logical batch feeds an aggregate
    store AND the exact-distinct arrangement atomically — a crash
    between the two heals from the staged payload and the counts
    agree; redelivery no-ops both."""
    from doreisa_spark.streaming import pipeline_commit as PC
    from doreisa_spark.streaming.incremental_agg import AggregateStore
    from doreisa_spark.streaming.pipeline_commit import PipelineIngest

    root = str(tmp_path / "pipe")
    agg = AggregateStore(spark, f"{root}/agg", key_cols=["k"],
                         aggs={"cnt": ("count", None)})
    dv = DistinctView(spark, f"{root}/dv", key_cols=["k"],
                      value_col="v")
    pipe = PipelineIngest(spark, root, {
        "agg": (agg, lambda df: df.select("k", "v")),
        "distinct": (dv, lambda df: df.select("k", "v")),
    })
    batch = spark.createDataFrame(
        [(i % 3, i % 4) for i in range(24)], "k bigint, v bigint")
    assert pipe.commit(batch, 0)
    assert not pipe.commit(batch, 0)  # redelivery no-ops atomically
    assert PC.pipeline_pending(root) == {}
    assert {r["k"]: r["cnt"] for r in agg.read().collect()} \
        == {0: 8, 1: 8, 2: 8}
    assert {r["k"]: r["distinct_v"]
            for r in dv.read_distinct().collect()} == {0: 4, 1: 4, 2: 4}


def test_quantile_disc_index_rule_grid(spark, tmp_path):
    """The ceil(q * total) double-arithmetic index rule must bit-match
    DuckDB across a dense q grid INCLUDING every exact-integer q*n
    boundary (where a one-ulp disagreement would pick the neighboring
    order statistic), over group sizes that exercise those boundaries
    and duplicated values (weighted cumulative counts)."""
    import duckdb

    rows = ([(0, float(v)) for v in range(10)]            # n=10 unique
            + [(1, float(v)) for v in range(100)]         # n=100 unique
            + [(2, float(v // 3)) for v in range(60)])    # n=60, dup x3
    df = spark.createDataFrame(rows, "k bigint, v double")
    v = DistinctView(spark, str(tmp_path / "grid"),
                     key_cols=["k"], value_col="v")
    v.process_batch(df.withColumn("id", F.monotonically_increasing_id()))
    qs = [round(0.05 * i, 2) for i in range(1, 21)]  # 0.05 .. 1.00
    got_rows = v.read_quantiles(qs).collect()
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sel = ", ".join(f"quantile_disc(v, {q})" for q in qs)
    exp = {r[0]: r[1:] for r in con.execute(
        f"SELECT k, {sel} FROM t GROUP BY k").fetchall()}
    names = [f"q_{str(q).replace('.', '_')}" for q in qs]
    for r in got_rows:
        assert tuple(r[n] for n in names) == exp[r["k"]], r["k"]
