"""Row-level retraction (CDC deletes) in the view layer — r13 verdict
ask #1 — plus the Welford/Chan moment stability fix (r13 ADVICE) and
the topk-across-join refusal (r13 verdict ask #2).

A ``retractable=True`` AggregateStore commits NEGATED partials for
delete batches (Z-set negative weights) plus a hidden signed
``__support`` multiplicity; the ordinary merges cancel deleted
contributions exactly in any arrival order, fully-retracted groups
drop from the view, and everything composes with the commit layer:
redelivered delete batches no-op, roll-up folds preserve the signed
partials, snapshots pinned before a delete still serve it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming.incremental_agg import AggregateStore
from doreisa_spark.streaming.incremental_join import JoinedAggregateView


def _rows(spark, n=120):
    return spark.range(n).select(
        (F.col("id") % 4).alias("k"), (F.col("id") * 1.0).alias("v"),
        F.col("id"),
    )


def _store(spark, tmp_path, name="r", **kw):
    kw.setdefault("aggs", {"cnt": ("count", None), "sum_v": ("sum", "v"),
                           "avg_v": ("avg", "v"), "var_v": ("var", "v")})
    return AggregateStore(spark, str(tmp_path / name), key_cols=["k"],
                          retractable=True, **kw)


def _expect(df):
    return {
        r["k"]: (r["cnt"], round(r["sum_v"], 6), round(r["avg_v"], 6),
                 round(r["var_v"], 6))
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"),
            F.avg("v").alias("avg_v"), F.var_pop("v").alias("var_v"),
        ).collect()
    }


def _got(store, **kw):
    return {
        r["k"]: (r["cnt"], round(r["sum_v"], 6), round(r["avg_v"], 6),
                 round(r["var_v"], 6))
        for r in store.read(**kw).collect()
    }


def test_retract_matches_post_delete_table_any_order(spark, tmp_path):
    rows = _rows(spark)
    st = _store(spark, tmp_path)
    dels = rows.where("id % 3 = 1")
    # delete arrives BEFORE most of its inserts (commutative merge)
    st.process_batch(rows.where("id < 40"))
    st.process_retract_batch(dels)
    st.process_batch(rows.where("id >= 80"))
    st.process_batch(rows.where("id >= 40 and id < 80"))
    assert _got(st) == _expect(rows.where("id % 3 != 1"))


def test_fully_retracted_group_drops_not_zero_row(spark, tmp_path):
    rows = _rows(spark)
    st = _store(spark, tmp_path)
    st.process_batch(rows)
    st.process_retract_batch(rows.where("k = 2"))
    got = _got(st)
    assert 2 not in got  # dropped, like SQL over the post-delete table
    assert got == _expect(rows.where("k != 2"))
    # re-inserting revives the group from zero
    st.process_batch(rows.where("k = 2 and id < 20"))
    assert _got(st) == _expect(
        rows.where("k != 2").unionAll(rows.where("k = 2 and id < 20")))


def test_retract_redelivery_noops(spark, tmp_path):
    rows = _rows(spark)
    st = _store(spark, tmp_path)
    st.process_batch(rows)
    dels = rows.where("id % 5 = 0")
    rid = st.process_retract_batch(dels)
    st.process_retract_batch(dels, batch_id=rid)  # must not double-delete
    assert _got(st) == _expect(rows.where("id % 5 != 0"))


def test_retract_survives_rollup_compaction(spark, tmp_path):
    rows = _rows(spark)
    st = _store(spark, tmp_path, name="c", compact_every=4)
    for i in range(4):
        st.process_batch(rows.where(f"id % 4 = {i}"))
    st.process_retract_batch(rows.where("id % 3 = 0"))
    for i in range(4):  # churn past the fold cadence
        st.process_batch(rows.where(f"id % 4 = {i}").withColumn(
            "v", F.col("v") + 1000))
    extra = rows.withColumn("v", F.col("v") + 1000)
    assert _got(st) == _expect(rows.where("id % 3 != 0").unionAll(extra))


def test_snapshot_pinned_before_delete_still_serves(spark, tmp_path):
    rows = _rows(spark)
    st = _store(spark, tmp_path, name="s")
    st.process_batch(rows)
    pin = st.snapshot()
    st.process_retract_batch(rows.where("k = 0"))
    assert _got(st) == _expect(rows.where("k != 0"))
    assert _got(st, snapshot=pin) == _expect(rows)


def test_hist_retraction_bins_recount_exact(spark, tmp_path):
    rows = _rows(spark)
    st = AggregateStore(
        spark, str(tmp_path / "h"), key_cols=["k"], retractable=True,
        aggs={"hv": ("hist", "v", {"lo": 0.0, "hi": 120.0, "bins": 64})},
    )
    st.process_batch(rows.where("id % 2 = 0"))
    st.process_retract_batch(rows.where("id % 3 = 0"))
    st.process_batch(rows.where("id % 2 = 1"))
    qs = {r["k"]: r["q_0_5"] for r in
          st.read_quantiles("hv", [0.5]).collect()}
    # the estimate lands inside the bin of the CROSSING order statistic
    # (the smallest value whose rank reaches 0.5·n) — the sketch's
    # actual guarantee; vs the interpolated median it can differ by the
    # data's value gaps, which is not what retraction is being tested on
    rem = {k: sorted(r["v"] for r in
                     rows.where(f"id % 3 != 0 and k = {k}").collect())
           for k in range(4)}
    for k, vals in rem.items():
        import math
        cross = vals[math.ceil(0.5 * len(vals)) - 1]
        assert abs(qs[k] - cross) <= 120.0 / 64 + 1e-9, (k, qs[k], cross)


def test_retractable_refuses_non_distributive_fns(spark, tmp_path):
    # hll/topk summaries only grow — still refused; min/max/last/first
    # are admitted since r15 via bounded k-extrema candidates
    # (tests/test_retraction_extrema.py)
    for fn, spec in [("hll", ("hll", "v")),
                     ("topk", ("topk", "v", {"k": 2}))]:
        with pytest.raises(ValueError, match="not retraction-distributive"):
            AggregateStore(spark, str(tmp_path / f"bad_{fn}"),
                           key_cols=["k"], retractable=True,
                           aggs={"x": spec})
    for fn, spec in [("max", ("max", "v")), ("min", ("min", "v")),
                     ("last", ("last", "v", {"by": "id"}))]:
        st = AggregateStore(spark, str(tmp_path / f"ok_{fn}"),
                            key_cols=["k"], retractable=True,
                            aggs={"x": spec})
        assert st.retractable


def test_non_retractable_store_refuses_retract(spark, tmp_path):
    st = AggregateStore(spark, str(tmp_path / "nr"), key_cols=["k"],
                        aggs={"cnt": ("count", None)})
    with pytest.raises(ValueError, match="not retractable"):
        st.process_retract_batch(_rows(spark))


def test_marker_pins_retractable_mode_on_reopen(spark, tmp_path):
    rows = _rows(spark)
    st = _store(spark, tmp_path, name="m",
                aggs={"cnt": ("count", None), "sum_v": ("sum", "v")})
    st.process_batch(rows)
    # reopen without the flag adopts the recorded mode
    st2 = AggregateStore(spark, str(tmp_path / "m"))
    assert st2.retractable
    st2.process_retract_batch(rows.where("k = 1"))
    assert 1 not in {r["k"] for r in st2.read().collect()}
    # an explicit contradicting flag fails loudly (the moment
    # representation differs per mode — partials must not interleave)
    with pytest.raises(ValueError, match="retractable"):
        AggregateStore(spark, str(tmp_path / "m"), retractable=False)


def test_chan_moments_stable_at_huge_mean(spark, tmp_path):
    """The r13 ADVICE hazard: |mean| >> stddev. Raw moments lose every
    significant digit (s² ~ 2.9e25 at mean 1.7e9 — double epsilon makes
    the s2 - s²/n finalize pure noise); the default store's Welford/
    Chan partials stay within 1e-6 relative."""
    big = spark.range(20000).select(
        F.lit(0).alias("k"), (1.7e9 + (F.col("id") % 11) * 0.25).alias("v"))
    st = AggregateStore(spark, str(tmp_path / "chan"), key_cols=["k"],
                        aggs={"var_v": ("var", "v"),
                              "std_v": ("std", "v", {"ddof": 1})})
    st.process_batch(big.where("id < 7000"))
    st.process_batch(big.where("id >= 7000 and id < 15000"))
    st.process_batch(big.where("id >= 15000"))
    got = st.read().collect()[0]
    exp = big.agg(F.var_pop("v"), F.stddev_samp("v")).collect()[0]
    assert abs(got["var_v"] - exp[0]) < 1e-6 * exp[0]
    assert abs(got["std_v"] - exp[1]) < 1e-6 * exp[1]


def test_join_view_fact_retraction_all_grains(spark, tmp_path):
    f = spark.createDataFrame(
        [(1, "a", 2.0), (1, "b", 4.0), (2, "a", 8.0), (2, "a", 16.0),
         (3, "b", 32.0)],
        "fk bigint, et string, v double")
    d = spark.createDataFrame(
        [(1, "web", 1), (2, "pdf", 1), (3, "web", 1)],
        "doc_id bigint, source string, ver int")
    v = JoinedAggregateView(
        spark, str(tmp_path / "jv"), fk="fk", fact_keys=["et"],
        fact_aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="ver",
        retractable=True)
    v.process_fact_batch(f)
    v.process_dim_batch(d)
    # retract one row of fk=1 and ALL of fk=3 (whole FK group empties)
    v.process_fact_retract_batch(f.where("fk = 1 and et = 'b'"))
    v.process_fact_retract_batch(f.where("fk = 3"))
    rem = f.where("not (fk = 1 and et = 'b') and fk != 3")
    exp = {tuple(r) for r in rem.join(d, rem["fk"] == d["doc_id"])
           .groupBy("source", "et")
           .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"))
           .collect()}
    assert {tuple(r) for r in v.read(["source", "et"]).collect()} == exp
    # coarser grain too — the regrouped __support still gates drops
    exp_src = {tuple(r) for r in rem.join(d, rem["fk"] == d["doc_id"])
               .groupBy("source")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.sum("v").alias("sum_v")).collect()}
    assert {tuple(r) for r in v.read(["source"]).collect()} == exp_src


def test_join_view_read_refuses_topk_by_default(spark, tmp_path):
    v = JoinedAggregateView(
        spark, str(tmp_path / "jt"), fk="fk", fact_keys=[],
        fact_aggs={"top": ("topk", "u", {"k": 2, "cap": 64})},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="ver")
    f = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11), (2, 10), (2, 12), (2, 12)],
        "fk bigint, u bigint")
    d = spark.createDataFrame([(1, "web", 1), (2, "web", 1)],
                              "doc_id bigint, source string, ver int")
    v.process_fact_batch(f)
    v.process_dim_batch(d)
    with pytest.raises(ValueError, match="topk"):
        v.read(["source"])
    # the documented opt-in surface: cap > distinct items => exact
    got = {(r["source"], r["item"], r["est_n"], r["rank"])
           for r in v.read_topk("top", ["source"]).collect()}
    assert got == {("web", 10, 3, 1), ("web", 12, 2, 2)}


def test_retract_with_schema_evolution_null_columns(spark, tmp_path):
    """Retraction × add_agg: deleting a PRE-evolution row must not
    decrement the post-evolution column — the CDC replay carries NULL
    for a column that did not exist at insert time, and NULLs skip
    every partial (the documented contract on process_retract_batch)."""
    st = AggregateStore(spark, str(tmp_path / "evo"), key_cols=["k"],
                        retractable=True,
                        aggs={"cnt": ("count", None)})
    old = spark.createDataFrame([(0, 10.0), (0, 20.0), (1, 30.0)],
                                "k bigint, v double")
    st.process_batch(old.select("k"))  # pre-evolution shape: no v
    st.add_agg("sum_v", "sum", "v")
    new = spark.createDataFrame([(0, 100.0), (1, 200.0)],
                                "k bigint, v double")
    st.process_batch(new)
    # CDC delete of one OLD row: v NULL (the column didn't exist then)
    st.process_retract_batch(
        spark.createDataFrame([(0, None)], "k bigint, v double"))
    got = {r["k"]: (r["cnt"], r["sum_v"]) for r in st.read().collect()}
    # counts: k0 had 2 old + 1 new - 1 deleted = 2; k1: 1 old + 1 new
    # sum_v accumulates from evolution only and the delete must not
    # touch it (the deleted row never contributed)
    assert got == {0: (2, 100.0), 1: (2, 200.0)}


def test_retract_windowed_view_then_expire(spark, tmp_path):
    """Retraction composes with event-time retention: CDC deletes heal
    a window's aggregates; expire_windows then tombstones whole window
    groups below the horizon, including ones already retracted to
    nothing."""
    rows = spark.createDataFrame(
        [(h, i, float(h * 100 + i)) for h in range(4) for i in range(5)],
        "hour bigint, i bigint, v double")
    st = AggregateStore(spark, str(tmp_path / "win"), key_cols=["hour"],
                        retractable=True,
                        aggs={"cnt": ("count", None), "sum_v": ("sum", "v")})
    st.process_batch(rows)
    st.process_retract_batch(rows.where("hour = 1"))  # window emptied
    st.process_retract_batch(rows.where("hour = 3 and i < 2"))
    got = {r["hour"]: r["cnt"] for r in st.read().collect()}
    assert got == {0: 5, 2: 5, 3: 3}  # hour 1 dropped by retraction
    expired = st.expire_windows(2)
    assert set(expired) <= {0, 1}
    got = {r["hour"]: r["cnt"] for r in st.read().collect()}
    assert got == {2: 5, 3: 3}


def test_cdc_mixed_batch_atomic(spark, tmp_path):
    """process_cdc_batch: inserts + deletes of ONE micro-batch commit
    as ONE signed partial — a redelivered mixed batch is refused whole
    (the half-application window of a process_batch +
    process_retract_batch pair does not exist here)."""
    st = AggregateStore(spark, str(tmp_path / "cdc"), key_cols=["k"],
                        retractable=True,
                        aggs={"cnt": ("count", None),
                              "sum_v": ("sum", "v")})
    def b(rows):
        return spark.createDataFrame(rows, "k bigint, v double, op string")
    st.process_cdc_batch(b([(0, 1.0, "I"), (0, 2.0, "I"), (1, 3.0, "I")]))
    # UPDATE of (0, 2.0) -> (0, 5.0) plus a fresh insert, one batch
    bid = st.process_cdc_batch(
        b([(0, 2.0, "D"), (0, 5.0, "I"), (1, 7.0, "I")]))
    # redelivery of the MIXED batch: refused whole
    st.process_cdc_batch(
        b([(0, 2.0, "D"), (0, 5.0, "I"), (1, 7.0, "I")]), batch_id=bid)
    got = {r["k"]: (r["cnt"], r["sum_v"]) for r in st.read().collect()}
    assert got == {0: (2, 6.0), 1: (2, 10.0)}
    # unknown ops fail loudly
    with pytest.raises(ValueError, match="op"):
        st.process_cdc_batch(b([(0, 1.0, "X")]))
    # non-retractable stores refuse
    nr = AggregateStore(spark, str(tmp_path / "cdcnr"), key_cols=["k"],
                        aggs={"cnt": ("count", None)})
    with pytest.raises(ValueError, match="not retractable"):
        nr.process_cdc_batch(b([(0, 1.0, "I")]))


def test_cdc_stream_drive_exactly_once_mixed(spark, tmp_path):
    """drive_cdc_view end-to-end with a forced crash AFTER a mixed
    batch's commit: the restart redelivers the same micro-batch under
    the same id and the view equals the one-pass expectation — neither
    the insert half nor the delete half double-applies."""
    import os

    from doreisa_spark.streaming.incremental_agg import drive_cdc_view
    from doreisa_spark.streaming.structured import run_foreach_batch

    src = tmp_path / "cdc_in"
    src.mkdir()
    frames = [
        [(k, float(k * 10 + i), "I") for k in range(3) for i in range(4)],
        [(0, 0.0, "D"), (0, 1.0, "D"), (1, 99.0, "I")],  # mixed
        [(2, 20.0, "D"), (2, 300.0, "I")],               # mixed
    ]
    for i, rows in enumerate(frames):
        df = spark.createDataFrame(rows, "k bigint, v double, op string")
        tmp = tmp_path / f"t{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        os.rename(str(tmp / data), str(src / f"{i:05d}.parquet"))
        os.utime(str(src / f"{i:05d}.parquet"),
                 (1_700_000_000 + i * 10,) * 2)

    def read_stream():
        return (spark.readStream.schema("k bigint, v double, op string")
                .option("maxFilesPerTrigger", 1).parquet(str(src)))

    st = AggregateStore(spark, str(tmp_path / "cdcst"), key_cols=["k"],
                        retractable=True,
                        aggs={"cnt": ("count", None),
                              "sum_v": ("sum", "v")})
    ckpt = str(tmp_path / "ckpt")
    crashed = {"n": 0}

    def crashing(df, bid):
        st.process_cdc_batch(df, bid)  # the mixed commit LANDS...
        if bid == 1 and crashed["n"] == 0:
            crashed["n"] = 1
            raise RuntimeError("crash after mixed-batch commit")

    try:
        run_foreach_batch(read_stream(), crashing, timeout_sec=120,
                          checkpoint=ckpt)
    except Exception:
        pass
    assert crashed["n"] == 1
    drive_cdc_view(read_stream(), st, checkpoint=ckpt, timeout_sec=120)
    # survivors: k0 rows {2,3}; k1 rows {10..13, 99}; k2 rows {21,22,23,300}
    exp = {0: (2, 5.0), 1: (5, 145.0), 2: (4, 366.0)}
    got = {r["k"]: (r["cnt"], round(r["sum_v"], 6))
           for r in st.read().collect()}
    assert got == exp


def test_unmatched_retractions_audit_surface(spark, tmp_path):
    """The CDC-contract monitor: a delete that outran its insert shows
    the group with negative support; it heals when the insert lands;
    a consistent store audits empty."""
    rows = _rows(spark)
    st = _store(spark, tmp_path, name="aud",
                aggs={"cnt": ("count", None)})
    st.process_batch(rows.where("id < 40"))        # 10 rows per group
    assert st.unmatched_retractions().count() == 0
    st.process_retract_batch(rows.where("id >= 40"))  # 20/group, outruns
    bad = {r["k"]: r["support"]
           for r in st.unmatched_retractions().collect()}
    assert set(bad) == {0, 1, 2, 3} and all(v == -10 for v in bad.values())
    st.process_batch(rows.where("id >= 40"))  # the inserts land
    assert st.unmatched_retractions().count() == 0
    # non-retractable stores have no multiplicity to audit
    nr = AggregateStore(spark, str(tmp_path / "audnr"), key_cols=["k"],
                        aggs={"cnt": ("count", None)})
    with pytest.raises(ValueError, match="not retractable"):
        nr.unmatched_retractions()


def test_roll_up_consolidates_retired_groups(spark, tmp_path):
    """Z-set consolidation at roll-up: groups whose every row was
    retracted (support 0, all aggregates at merge identity) DROP from
    the folded log — under churn the log tracks LIVE groups, not
    ever-seen groups — while reads and late re-inserts stay exact."""
    from doreisa_spark.streaming import batch_commit as BC

    st = AggregateStore(
        spark, str(tmp_path / "cons"), key_cols=["k"], retractable=True,
        aggs={"cnt": ("count", None), "sum_v": ("sum", "v"),
              "avg_v": ("avg", "v"),
              "vh": ("hist", "v", {"lo": 0.0, "hi": 500.0, "bins": 64})},
        compact_every=2,
    )

    def gen(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))

    # churn: each cycle inserts a fresh 50-group slice and retracts it;
    # two groups stay live throughout. An insert and its retract land
    # in DIFFERENT flush segments, so cancellation happens when the
    # size-tiered policy merges their band — older cycles climb bands
    # first and consolidate away.
    st.process_batch(gen(0, 2))
    for c in range(8):
        slice_ = gen(100 + c * 50, 150 + c * 50)
        st.process_batch(slice_)
        st.process_retract_batch(slice_)
    man = BC._manifest_load(st._log) or {}
    assert man.get("segments"), "compaction should have folded"
    log_groups = {r["k"] for r in st.partials().select("k").collect()}
    # the early cycles' 150 retired groups are consolidated away...
    assert not any(100 <= k < 250 for k in log_groups), sorted(log_groups)
    # ...so the log holds the live groups + only the newest cycles'
    # not-yet-band-merged halves: far below the 402 ever-seen groups
    assert st.partials().count() <= 250
    assert {r["k"]: r["cnt"] for r in st.read().collect()} == {0: 1, 1: 1}
    # a retired group re-inserts from a clean slate
    st.process_batch(gen(100, 101))
    assert {r["k"]: r["cnt"] for r in st.read().collect()} \
        == {0: 1, 1: 1, 100: 1}


def test_consolidation_keeps_pending_and_partial_state(spark, tmp_path):
    """Rows that are NOT merge identity survive the fold: negative
    support (delete before its insert) and zero-support rows whose
    moment fields are nonzero (a NULL-valued delete against a
    non-NULL insert). Dropping either would corrupt the late half."""
    st = AggregateStore(
        spark, str(tmp_path / "pend"), key_cols=["k"], retractable=True,
        aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
        compact_every=4,
    )
    mk = lambda rows: spark.createDataFrame(rows, "k bigint, v double")  # noqa: E731
    # k=7: delete arrives first (support -1). k=8: insert v=5 and a
    # NULL-valued delete land together (support 0, sum_v stays 5).
    st.process_retract_batch(mk([(7, 1.0)]))
    st.process_batch(mk([(8, 5.0)]))
    st.process_retract_batch(mk([(8, None)]))
    st.process_batch(mk([(0, 2.0)]))
    st.process_batch(mk([(1, 3.0)]))  # 5th commit -> fold happened
    kept = {r["k"] for r in st.partials().select("k").collect()}
    assert {7, 8}.issubset(kept), kept
    # the pending halves land: k=7's late insert matches its early
    # delete (net zero — the group correctly has NO surviving rows and
    # the audit clears), k=8's NULL-valued insert restores support 1
    # with the preserved sum intact
    st.process_batch(mk([(7, 1.0)]))
    st.process_batch(mk([(8, None)]))
    got = {r["k"]: (r["cnt"], r["sum_v"]) for r in st.read().collect()}
    assert 7 not in got
    assert st.unmatched_retractions().count() == 0
    assert got[8] == (1, 5.0)
    # a fresh insert revives k=7 from a clean slate
    st.process_batch(mk([(7, 2.0)]))
    got = {r["k"]: (r["cnt"], r["sum_v"]) for r in st.read().collect()}
    assert got[7] == (1, 2.0)


def test_consolidation_keeps_truncated_extrema_frontier(spark, tmp_path):
    """A zero-support group whose extrema frontier is non-NULL carries
    truncation evidence and must NOT consolidate away."""
    st = AggregateStore(
        spark, str(tmp_path / "extf"), key_cols=["k"], retractable=True,
        aggs={"cnt": ("count", None), "mx": ("max", "v", {"k": 2})},
        compact_every=4,
    )
    rows = spark.createDataFrame(
        [(5, float(v)) for v in range(10)], "k bigint, v double")
    st.process_batch(rows)            # k=2 candidates, frontier set
    st.process_retract_batch(rows)    # support 0, frontier survives
    for i in range(3):                # push past the fold boundary
        st.process_batch(spark.createDataFrame(
            [(i, 1.0)], "k bigint, v double"))
    kept = {r["k"] for r in st.partials().select("k").collect()}
    assert 5 in kept, kept
