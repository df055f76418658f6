"""Round-13 AggregateStore extensions: var/std moment partials,
Misra-Gries topk sketches (approximation regime), the read_quantiles
NULL-group fix, time-based window retention (expire_windows), partial
file-count sizing, and the _stats_write footer guard.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_agg import AggregateStore


def _store(spark, tmp_path, name, key_cols, aggs, **kw):
    return AggregateStore(spark, str(tmp_path / name), key_cols=key_cols,
                          aggs=aggs, **kw)


# ------------------------------------------------------------- var / std


def test_var_std_match_one_pass(spark, tmp_path):
    rows = [("a", float(v)) for v in (1, 2, 3, 4, 10)] + \
           [("b", 7.0)] + [("c", None), ("c", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    st = _store(spark, tmp_path, "var", ["k"], {
        "n": ("count", "v"), "avg_v": ("avg", "v"), "var_p": ("var", "v"),
        "var_s": ("var", "v", {"ddof": 1}), "std_p": ("std", "v"),
        "std_s": ("std", "v", {"ddof": 1}),
    })
    # out-of-order thirds
    st.process_batch(df.where("v >= 4 or v is null"))
    st.process_batch(df.where("v < 3"))
    st.process_batch(df.where("v >= 3 and v < 4"))
    got = {r["k"]: r for r in st.read().collect()}
    exp = {r["k"]: r for r in df.groupBy("k").agg(
        F.avg("v").alias("avg_v"),
        F.var_pop("v").alias("var_p"), F.var_samp("v").alias("var_s"),
        F.stddev_pop("v").alias("std_p"), F.stddev_samp("v").alias("std_s"),
    ).collect()}
    for k in ("a", "b", "c"):
        for c in ("avg_v", "var_p", "var_s", "std_p", "std_s"):
            e, g = exp[k][c], got[k][c]
            if e is None:
                assert g is None, (k, c, g)
            else:
                assert g == pytest.approx(e, rel=1e-9, abs=1e-9), (k, c)
    # single-value group: var_pop exact 0, var_samp NULL (matches SQL)
    assert got["b"]["var_p"] == 0.0 and got["b"]["var_s"] is None
    # all-NULL group keeps its row with NULL stats (avg too, like SQL)
    assert got["c"]["var_p"] is None and got["c"]["n"] == 0
    assert got["c"]["avg_v"] is None


def test_var_survives_rollup_compaction(spark, tmp_path):
    df = spark.range(0, 400).select(
        (F.col("id") % 4).cast("string").alias("k"),
        (F.col("id") * 1.37 % 23).alias("v"),
    )
    st = _store(spark, tmp_path, "varc", ["k"], {"var_p": ("var", "v")},
                compact_every=4, commit_mode=BC.MANIFEST)
    for i in range(8):
        st.process_batch(df.where(F.col("id") % 8 == i))
    exp = {r["k"]: r["var_p"]
           for r in df.groupBy("k").agg(F.var_pop("v").alias("var_p")).collect()}
    got = {r["k"]: r["var_p"] for r in st.read().collect()}
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-9)


# ---------------------------------------------------------------- topk


def _zipf_tokens(spark):
    # token t_i appears ~ 3000/i times: heavy skew, many distinct items
    rows = []
    for i in range(1, 200):
        rows += [("g", f"t{i:03d}")] * (3000 // i)
    return spark.createDataFrame(rows, "k string, tok string")


def test_topk_trim_regime_undercount_bound_and_recall(spark, tmp_path):
    df = _zipf_tokens(spark)
    cap, k = 32, 5
    st = _store(spark, tmp_path, "topk", ["k"],
                {"hh": ("topk", "tok", {"k": k, "cap": cap})})
    # 4 batches: trims fire (199 distinct >> cap=32) in every partial
    for i in range(4):
        st.process_batch(df.where(F.crc32(F.col("tok")) % 4 == i))
    exact = {r["tok"]: r["n"] for r in df.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    top_exact = sorted(exact, key=lambda t: (-exact[t], t))[:k]
    got = st.read_topk("hh").collect()
    got_items = [r["item"] for r in sorted(got, key=lambda r: r["rank"])]
    # recall: heavy skew → the true top-k survives the trims
    assert got_items == top_exact
    # Misra-Gries bound: estimates UNDERCOUNT by at most total/(cap+1)
    # per merge step; 4 partial trims + 1 read merge → 5 steps is a
    # loose upper envelope
    total = sum(exact.values())
    bound = 5 * total / (cap + 1)
    for r in got:
        assert 0 < r["est_n"] <= exact[r["item"]]
        assert exact[r["item"]] - r["est_n"] <= bound
    # partial maps really are capacity-bounded on disk
    part = st.partials().select(F.size("hh").alias("s")).collect()
    assert all(r["s"] <= cap for r in part)


def test_topk_exact_when_under_capacity(spark, tmp_path):
    df = spark.createDataFrame(
        [("g", t) for t in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]],
        "k string, tok string",
    )
    st = _store(spark, tmp_path, "topke", ["k"],
                {"hh": ("topk", "tok", {"k": 2, "cap": 16})})
    st.process_batch(df.where("tok >= 'c'"))
    st.process_batch(df.where("tok < 'c'"))
    got = {(r["item"], r["est_n"], r["rank"])
           for r in st.read_topk("hh").collect()}
    assert got == {("a", 5, 1), ("b", 3, 2)}


def test_topk_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="topk needs"):
        _store(spark, tmp_path, "bad1", ["k"], {"hh": ("topk", "tok")})
    with pytest.raises(ValueError, match="cap >= k"):
        _store(spark, tmp_path, "bad2", ["k"],
               {"hh": ("topk", "tok", {"k": 8, "cap": 4})})


# ------------------------------------------- read_quantiles NULL groups


def test_read_quantiles_keeps_all_null_group(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None)],
        "k string, v double",
    )
    st = _store(spark, tmp_path, "qn", ["k"],
                {"h": ("hist", "v", {"lo": 0.0, "hi": 4.0, "bins": 8})})
    st.process_batch(df)
    got = {r["k"]: r["q_0_5"] for r in st.read_quantiles("h", [0.5]).collect()}
    # the all-NULL group keeps its row with a NULL estimate, exactly
    # like SQL quantile_cont over an all-NULL group (r12 ADVICE)
    assert set(got) == {"a", "b"}
    assert got["b"] is None and got["a"] is not None


# ------------------------------------------------------ expire_windows


def test_expire_windows_retention(spark, tmp_path):
    # year-shaped stream: 16 "weeks", one batch per week, frequent
    # roll-up folds so expiry is physically reclaimed
    base = dt.datetime(2024, 1, 1)
    weeks = [base + dt.timedelta(days=7 * i) for i in range(16)]
    st = _store(spark, tmp_path, "exp", ["win", "k"],
                {"cnt": ("count", None), "sum_v": ("sum", "v")},
                compact_every=4, commit_mode=BC.MANIFEST)

    def batch(w):
        return spark.createDataFrame(
            [(w, kk, float(j)) for kk in ("x", "y") for j in range(5)],
            "win timestamp, k string, v double",
        )

    horizon = 8  # keep the last 8 weeks
    sizes, rows = [], []
    pin = None
    for i, w in enumerate(weeks):
        st.process_batch(batch(w))
        if i == 9:
            pin = st.snapshot()  # before the expiry that drops week 2
        if i >= horizon:
            cutoff = weeks[i - horizon + 1]
            expired = st.expire_windows(cutoff)
            assert all(v < cutoff for v in expired)
        rows.append(st.read().count())
        # LIVE log bytes (manifest-listed dirs): the snapshot pin keeps
        # its historical dirs on disk by contract, so raw du would
        # conflate retention with snapshot retention
        root = str(tmp_path / "exp" / "partials")
        man = BC._manifest_load(root) or {}
        live_dirs = list(man.get("segments", [])) + \
            list(man.get("batches", {}).values())
        sizes.append(sum(BC._dir_bytes(os.path.join(root, n))
                         for n in live_dirs))
    # groups-bounded: view rows flat at horizon × 2 keys once retention
    # kicks in
    assert rows[-1] == horizon * 2
    assert rows[-1] == rows[horizon + 1] == rows[-2]
    # expired windows vanish from read()
    live = {r["win"] for r in st.read().select("win").distinct().collect()}
    assert min(live) == weeks[16 - horizon]
    # log bytes flat after the expiry horizon (fold reclaims physically):
    # the last post-fold size is no bigger than the first post-fold size
    # after retention kicked in (allow ~35% jitter for parquet framing)
    post = [sizes[i] for i in range(horizon, 16) if (i % 4) == 3]
    assert post[-1] <= post[0] * 1.35
    # a snapshot pinned at week 9 (after week 0's expiry, before week
    # 1's) still serves week 1 — expiry after the pin cannot reach it
    snap_wins = {r["win"] for r in
                 st.read(snapshot=pin).select("win").distinct().collect()}
    assert weeks[1] in snap_wins and snap_wins == set(weeks[1:10])


def test_expire_windows_is_pruned_read(spark, tmp_path, monkeypatch):
    st = _store(spark, tmp_path, "expp", ["win"], {"cnt": ("count", None)},
                commit_mode=BC.MANIFEST)
    for d in range(4):
        st.process_batch(spark.createDataFrame(
            [(dt.datetime(2024, 1, 1 + d),)], "win timestamp"))
    seen = {}
    orig = BC._prune_entries

    def spy(entries, prune_in, prune_between=None):
        out = orig(entries, prune_in, prune_between)
        if prune_between:
            seen["in"], seen["out"] = len(entries), len(out)
        return out

    monkeypatch.setattr(BC, "_prune_entries", spy)
    expired = st.expire_windows(dt.datetime(2024, 1, 2))
    assert expired == [dt.datetime(2024, 1, 1)]
    # the enumeration read was sidecar-pruned to the expired range
    assert seen["out"] < seen["in"]


# ------------------------------------------- partial file-count sizing


def test_partial_file_count_scales_with_rows(spark, tmp_path):
    df = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 7.0).alias("v"))
    st = _store(spark, tmp_path, "pf", ["k"], {"s": ("sum", "v")},
                partial_rows_per_file=1000)
    st.process_batch(df)  # 3000 groups -> 3 files
    dirs = BC._committed_dirs(str(tmp_path / "pf" / "partials"))
    files = [f for f in os.listdir(dirs[0]) if f.endswith(".parquet")]
    assert len(files) == 3
    st2 = _store(spark, tmp_path, "pf1", ["k"], {"s": ("sum", "v")})
    st2.process_batch(df)  # default 1M rows/file -> 1 file
    dirs2 = BC._committed_dirs(str(tmp_path / "pf1" / "partials"))
    files2 = [f for f in os.listdir(dirs2[0]) if f.endswith(".parquet")]
    assert len(files2) == 1


# ---------------------------------------------- _stats_write footer guard


def test_stats_write_skips_sidecar_on_unreadable_footer(spark, tmp_path):
    dest = str(tmp_path / "seg")
    spark.range(0, 10).select(F.col("id").alias("k")) \
        .coalesce(1).write.parquet(dest)
    # a file pyarrow cannot open must cost the sidecar, never raise
    with open(os.path.join(dest, "zz_corrupt.parquet"), "wb") as f:
        f.write(b"not a parquet footer")
    BC._stats_write(dest, ["k"])
    assert not os.path.exists(os.path.join(dest, "_stats.json"))


# ------------------------------------------------------ schema evolution


def test_add_agg_accumulates_from_evolution(spark, tmp_path):
    df1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double")
    df2 = spark.createDataFrame([("a", 10.0), ("c", 5.0)], "k string, v double")
    df3 = spark.createDataFrame([("a", 100.0)], "k string, v double")
    st = _store(spark, tmp_path, "evo", ["k"], {"cnt": ("count", None)},
                commit_mode=BC.MANIFEST)
    st.process_batch(df1)
    st.add_agg("sum_v", "sum", "v")
    # staged: reads between add_agg and the next batch serve the OLD view
    assert "sum_v" not in st.read().columns
    st.process_batch(df2)
    st.process_batch(df3)
    got = {(r["k"], r["cnt"], r["sum_v"]) for r in st.read().collect()}
    # sums accumulate from the evolution point; group b (pre-evolution
    # only) keeps its count but shows NULL for the new column
    assert got == {("a", 3, 110.0), ("b", 1, None), ("c", 1, 5.0)}


def test_add_agg_survives_rollup_and_reopen(spark, tmp_path):
    st = _store(spark, tmp_path, "evo2", ["k"],
                {"cnt": ("count", None)},
                commit_mode=BC.MANIFEST, compact_every=3)
    mk = lambda lo: spark.range(lo, lo + 40).select(
        (F.col("id") % 4).cast("string").alias("k"),
        (F.col("id") * 0.5).alias("v"))
    st.process_batch(mk(0))
    st.process_batch(mk(40))
    st.add_agg("mx", "max", "v")
    for i in range(2, 8):  # folds fire: mixed old/new-schema sources
        st.process_batch(mk(40 * i))
    exp_mx = {r["k"]: r["mx"] for r in
              spark.range(80, 320).select(
                  (F.col("id") % 4).cast("string").alias("k"),
                  (F.col("id") * 0.5).alias("v"))
              .groupBy("k").agg(F.max("v").alias("mx")).collect()}
    got = {r["k"]: (r["cnt"], r["mx"]) for r in st.read().collect()}
    assert {k: v[0] for k, v in got.items()} == {str(i): 80 for i in range(4)}
    assert {k: v[1] for k, v in got.items()} == exp_mx
    # a fresh handle reopens the EVOLVED spec from the marker
    st2 = AggregateStore(spark, str(tmp_path / "evo2"), fenced=False)
    assert set(st2.aggs) == {"cnt", "mx"}
    got2 = {r["k"]: (r["cnt"], r["mx"]) for r in st2.read().collect()}
    assert got2 == got


def test_add_agg_fences_shared_writers(spark, tmp_path):
    root = str(tmp_path / "evo3")
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    st1 = AggregateStore(spark, root, key_cols=["k"],
                         aggs={"cnt": ("count", None)},
                         commit_mode=BC.MANIFEST, fenced="shared")
    st1.process_batch(df)
    st2 = AggregateStore(spark, root, commit_mode=BC.MANIFEST,
                         fenced="shared")
    st2.process_batch(df)
    st1.add_agg("sum_v", "sum", "v")  # hard-fences st2
    with pytest.raises(BC.StaleWriterError):
        st2.process_batch(df)
    st1.process_batch(df)  # evolution publishes, st1 keeps writing
    assert {(r["k"], r["cnt"], r["sum_v"]) for r in st1.read().collect()} \
        == {("a", 3, 1.0)}


def test_add_agg_validation(spark, tmp_path):
    st = _store(spark, tmp_path, "evo4", ["k"], {"cnt": ("count", None)})
    with pytest.raises(ValueError, match="already exists"):
        st.add_agg("cnt", "sum", "v")
    with pytest.raises(ValueError, match="needs a source"):
        st.add_agg("s", "sum", None)
    # pre-first-batch evolution folds straight into the initial spec
    st.add_agg("sum_v", "sum", "v")
    st.process_batch(spark.createDataFrame([("a", 2.0)],
                                           "k string, v double"))
    assert {(r["k"], r["cnt"], r["sum_v"]) for r in st.read().collect()} \
        == {("a", 1, 2.0)}
