"""Bounded k-extrema candidates for retractable min/max/last/first —
r14 verdict ask #1 — plus the r14 ADVICE fixes that ride the same code:
the CDC single-pass signed partial with in-plan NULL-safe op validation
(ask #4 / ADVICE medium), opt-in centered raw moments (ask #5), and the
legacy raw-moment representation guard (ADVICE low).

The candidate state is struct(m: map<value, net_count>, f: frontier):
a signed multiset of the k extreme distinct values per group, complete
(exact net multiplicity) on the extreme side of the frontier, NULL
frontier = never truncated. Deletes inside the frontier cancel exactly
in any order; a drained frontier fails reads loudly and re_derive()
rebuilds only those groups from the raw source. No reference analog
(the reference's timesteps are append-only); this is the repo's own
IVM bar (DBSP/Materialize semantics, see incremental_join.py:10).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming.incremental_agg import AggregateStore


def _mk(spark, tmp_path, name="x", k=4, compact_every=64):
    return AggregateStore(
        spark, str(tmp_path / name), key_cols=["k"], retractable=True,
        compact_every=compact_every,
        aggs={"mn": ("min", "v", {"k": k}),
              "mx": ("max", "v", {"k": k}),
              "lst": ("last", "v", {"by": "struct(ts, id)", "k": k}),
              "sum_v": ("sum", "v")})


def _rows(spark, n=60):
    return spark.range(n).select(
        (F.col("id") % 3).alias("k"), (F.col("id") * 1.0).alias("v"),
        (F.col("id") % 7).alias("ts"), F.col("id"))


def _expect(df):
    from pyspark.sql import Window as W

    last = df.withColumn(
        "_rn", F.row_number().over(
            W.partitionBy("k").orderBy(F.desc("ts"), F.desc("id")))
    ).where("_rn = 1").select("k", F.col("v").alias("lst"))
    agg = df.groupBy("k").agg(F.min("v").alias("mn"), F.max("v").alias("mx"),
                              F.sum("v").alias("sum_v"))
    return {r["k"]: (r["mn"], r["mx"], r["lst"], r["sum_v"])
            for r in agg.join(last, "k").collect()}


def _got(store, **kw):
    return {r["k"]: (r["mn"], r["mx"], r["lst"], r["sum_v"])
            for r in store.read(**kw).collect()}


def test_extrema_matches_post_delete_table_any_order(spark, tmp_path):
    rows = _rows(spark)
    st = _mk(spark, tmp_path)
    dels = rows.where("id % 5 = 2")
    # a delete lands before most of its inserts — commutative merge
    st.process_retract_batch(dels.where("id < 30"))
    st.process_batch(rows.where("id < 40"))
    st.process_batch(rows.where("id >= 40"))
    st.process_retract_batch(dels.where("id >= 30"))
    assert _got(st) == _expect(rows.where("id % 5 != 2"))


def test_extrema_duplicate_values_need_both_deletes(spark, tmp_path):
    # multiplicity: the same value inserted twice must survive one
    # delete — a set-based candidate would drop it too early
    st = _mk(spark, tmp_path, name="dup")
    b = lambda t: spark.createDataFrame(  # noqa: E731
        t, "k bigint, v double, ts bigint, id bigint")
    st.process_batch(b([(0, 1.0, 0, 1), (0, 1.0, 0, 2), (0, 5.0, 1, 3)]))
    st.process_retract_batch(b([(0, 1.0, 0, 1)]))
    assert {r["k"]: r["mn"] for r in st.read().collect()} == {0: 1.0}
    st.process_retract_batch(b([(0, 1.0, 0, 2)]))
    assert {r["k"]: r["mn"] for r in st.read().collect()} == {0: 5.0}


def test_extrema_survives_rollup_folds_and_snapshot(spark, tmp_path):
    rows = _rows(spark, 90)
    st = _mk(spark, tmp_path, name="fold", compact_every=4)
    for lo in range(0, 90, 10):  # 9 insert batches -> at least 2 folds
        st.process_batch(rows.where(f"id >= {lo} and id < {lo + 10}"))
    snap = st.snapshot()
    st.process_retract_batch(rows.where("id % 4 = 1"))
    assert _got(st) == _expect(rows.where("id % 4 != 1"))
    # the pre-delete snapshot still serves the full table
    assert _got(st, snapshot=snap) == _expect(rows)


def test_extrema_redelivered_delete_noops(spark, tmp_path):
    rows = _rows(spark)
    st = _mk(spark, tmp_path, name="redel")
    st.process_batch(rows)
    bid = st.process_retract_batch(rows.where("id % 6 = 0"))
    st.process_retract_batch(rows.where("id % 6 = 0"), batch_id=bid)
    assert _got(st) == _expect(rows.where("id % 6 != 0"))


def test_extrema_delete_before_insert_heals(spark, tmp_path):
    st = _mk(spark, tmp_path, name="ooo")
    b = lambda t: spark.createDataFrame(  # noqa: E731
        t, "k bigint, v double, ts bigint, id bigint")
    st.process_retract_batch(b([(0, 1.0, 0, 1)]))  # delete outruns insert
    st.process_batch(b([(0, 1.0, 0, 1), (0, 3.0, 1, 2), (0, 9.0, 2, 3)]))
    st.process_retract_batch(b([(0, 1.0, 0, 1)]))  # the REAL delete
    r = st.read().collect()[0]
    assert (r["mn"], r["mx"], r["lst"]) == (3.0, 9.0, 9.0)


def test_frontier_drain_raises_dirty_lists_rederive_heals(spark, tmp_path):
    st = _mk(spark, tmp_path, name="drain", k=4)
    rows = spark.createDataFrame(
        [(0, float(v), v, v) for v in range(1, 11)]
        + [(1, 7.0, 0, 100)],
        "k bigint, v double, ts bigint, id bigint")
    st.process_batch(rows)
    # group 0 tracked min candidates {1,2,3,4} (frontier 4.0, k=4);
    # deleting all four drains the frontier — true min 5.0 is unknown
    dels = rows.where("k = 0 and v <= 4.0")
    st.process_retract_batch(dels)
    with pytest.raises(Exception, match="drained its k-extrema"):
        st.read().collect()
    assert [r["k"] for r in st.dirty_groups().collect()] == [0]
    # max/lst for group 0 are fine — only the min side drained — and
    # group 1 is untouched; re_derive rebuilds ONLY group 0 from the
    # post-delete source
    src = rows.where("not (k = 0 and v <= 4.0)")
    assert st.re_derive(src) == [0]
    assert st.dirty_groups().count() == 0
    assert _got(st) == _expect(src)


def test_rederive_crash_between_tombstone_and_reinsert_replays(
        spark, tmp_path):
    st = _mk(spark, tmp_path, name="crash", k=2)
    rows = spark.createDataFrame(
        [(0, float(v), v, v) for v in range(1, 6)],
        "k bigint, v double, ts bigint, id bigint")
    st.process_batch(rows)
    st.process_retract_batch(rows.where("v <= 2.0"))
    src = rows.where("v > 2.0")
    real = st.process_batch

    def boom(df, batch_id=None):
        raise RuntimeError("crash between tombstone and re-ingest")

    st.process_batch = boom
    with pytest.raises(RuntimeError, match="crash between"):
        st.re_derive(src)
    st.process_batch = real
    # the crash window left group 0 ABSENT (tombstoned, not yet
    # re-ingested) — the pending note replays it on the next call
    assert st.read().count() == 0
    assert st.re_derive(src) == [0]
    assert _got(st) == _expect(src)


def test_extrema_all_null_group_reads_null_not_dirty(spark, tmp_path):
    st = _mk(spark, tmp_path, name="nulls")
    rows = spark.createDataFrame(
        [(0, None, 0, 1), (0, None, 1, 2)],
        "k bigint, v double, ts bigint, id bigint")
    st.process_batch(rows)
    r = st.read().collect()[0]
    # never-truncated frontier + no candidates = genuine SQL NULL
    assert r["mn"] is None and r["mx"] is None and r["lst"] is None
    assert st.dirty_groups().count() == 0


def test_extrema_through_cdc_single_pass(spark, tmp_path):
    st = AggregateStore(
        spark, str(tmp_path / "cdc"), key_cols=["k"], retractable=True,
        aggs={"mn": ("min", "v", {"k": 3}), "mx": ("max", "v", {"k": 3}),
              "cnt": ("count", None)})
    b = lambda t: spark.createDataFrame(  # noqa: E731
        t, "k bigint, v double, op string")
    st.process_cdc_batch(b([(0, 2.0, "I"), (0, 8.0, "I"), (0, 5.0, "I")]))
    # one mixed batch: UPDATE 2.0 -> 1.0 (Z-set decomposition) — the
    # insert and delete halves land as ONE signed candidate partial
    st.process_cdc_batch(b([(0, 2.0, "D"), (0, 1.0, "I")]))
    r = st.read().collect()[0]
    assert (r["mn"], r["mx"], r["cnt"]) == (1.0, 8.0, 3)
    # insert+delete of the SAME value in one batch cancels to nothing
    bid = st.process_cdc_batch(b([(0, 0.5, "I"), (0, 0.5, "D")]))
    r = st.read().collect()[0]
    assert (r["mn"], r["mx"], r["cnt"]) == (1.0, 8.0, 3)
    # redelivered mixed batch refused whole
    st.process_cdc_batch(b([(0, 0.5, "I"), (0, 0.5, "D")]), batch_id=bid)
    assert st.read().collect()[0]["cnt"] == 3


def test_cdc_null_op_fails_loudly(spark, tmp_path):
    # r14 ADVICE medium: ~isin() is NULL for NULL ops, so the old
    # anti-join validation passed them and then silently dropped the
    # rows from both halves; the in-plan weight raise catches NULL too
    st = AggregateStore(spark, str(tmp_path / "nullop"), key_cols=["k"],
                        retractable=True, aggs={"cnt": ("count", None)})
    b = lambda t: spark.createDataFrame(  # noqa: E731
        t, "k bigint, v double, op string")
    st.process_cdc_batch(b([(0, 1.0, "I")]))
    for bad in ("X", None):
        with pytest.raises(ValueError, match="op"):
            st.process_cdc_batch(b([(0, 1.0, bad)]))
    # nothing from the failed batches landed — the raise aborts the
    # commit job before the manifest publish
    assert st.read().collect()[0]["cnt"] == 1


def test_centered_moments_stable_at_huge_mean_retractable(spark, tmp_path):
    """The r14 verdict ask #5 'done' bar: the huge-mean stability test
    repeated on a RETRACTABLE store — raw moments, which would lose
    every significant digit at mean 1.7e9 — passing without manual
    pre-centering, through inserts AND retractions."""
    big = spark.range(20000).select(
        F.lit(0).alias("k"), (1.7e9 + (F.col("id") % 11) * 0.25).alias("v"),
        F.col("id"))
    st = AggregateStore(
        spark, str(tmp_path / "cen"), key_cols=["k"], retractable=True,
        aggs={"avg_v": ("avg", "v", {"center": True}),
              "var_v": ("var", "v", {"center": True}),
              "std_v": ("std", "v", {"ddof": 1, "center": True})})
    st.process_batch(big.where("id < 7000"))
    st.process_batch(big.where("id >= 7000"))
    st.process_retract_batch(big.where("id % 4 = 3"))
    kept = big.where("id % 4 != 3")
    got = st.read().collect()[0]
    exp = kept.agg(F.avg("v"), F.var_pop("v"), F.stddev_samp("v")).collect()[0]
    assert abs(got["avg_v"] - exp[0]) < 1e-6
    assert abs(got["var_v"] - exp[1]) < 1e-6 * exp[1]
    assert abs(got["std_v"] - exp[2]) < 1e-6 * exp[2]
    # the offset is recorded write-once: a fresh handle reproduces it
    st2 = AggregateStore(spark, str(tmp_path / "cen"))
    got2 = st2.read().collect()[0]
    assert abs(got2["var_v"] - exp[1]) < 1e-6 * exp[1]


def test_center_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="retractable"):
        AggregateStore(spark, str(tmp_path / "c1"), key_cols=["k"],
                       aggs={"a": ("avg", "v", {"center": True})})
    with pytest.raises(ValueError, match="avg/var/std"):
        AggregateStore(spark, str(tmp_path / "c2"), key_cols=["k"],
                       retractable=True,
                       aggs={"a": ("sum", "v", {"center": True})})
    st = AggregateStore(spark, str(tmp_path / "c3"), key_cols=["k"],
                        retractable=True, aggs={"cnt": ("count", None)})
    st.process_batch(spark.createDataFrame([(0, 1.0)], "k bigint, v double"))
    with pytest.raises(ValueError, match="store creation"):
        st.add_agg("a", "avg", "v", {"center": True})


def test_legacy_raw_moment_store_reopens_and_keeps_representation(
        spark, tmp_path):
    """r14 ADVICE low: a non-retractable store persisted BEFORE the
    Welford switch holds raw struct(n, s, s2) partials; reopening must
    detect the representation from the recorded ddl and keep BOTH the
    merge and new partials on the raw path (no mixed-representation
    log, no getField('m') failure)."""
    root = str(tmp_path / "legacy")
    st = AggregateStore(spark, root, key_cols=["k"],
                        aggs={"avg_v": ("avg", "v"), "var_v": ("var", "v")})
    st._moments_raw = True  # simulate the pre-r14 writer
    rows = spark.range(100).select((F.col("id") % 2).alias("k"),
                                   (F.col("id") * 1.0).alias("v"))
    st.process_batch(rows.where("id < 50"))
    # a FRESH handle must adopt raw from the ddl, read correctly, and
    # commit raw partials that keep merging with the legacy ones
    st2 = AggregateStore(spark, root)
    assert st2._moments_raw is True
    st2.process_batch(rows.where("id >= 50"))
    got = {r["k"]: (round(r["avg_v"], 6), round(r["var_v"], 6))
           for r in st2.read().collect()}
    exp = {r["k"]: (round(r["a"], 6), round(r["s"], 6))
           for r in rows.groupBy("k").agg(
               F.avg("v").alias("a"), F.var_pop("v").alias("s")).collect()}
    assert got == exp
    # and a Welford store records m/m2 and reopens Welford
    w = AggregateStore(spark, str(tmp_path / "welford"), key_cols=["k"],
                       aggs={"avg_v": ("avg", "v")})
    w.process_batch(rows)
    assert AggregateStore(spark, str(tmp_path / "welford"))._moments_raw \
        is False
