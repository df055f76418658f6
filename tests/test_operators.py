"""Composite-operator unit tests against independent oracles (pandas)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from doreisa_spark.operators.asof import asof_join
from doreisa_spark.operators.topk import topk_per_group


def test_asof_join_matches_merge_asof(spark):
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "lt": rng.integers(0, 1000, 200),
            "lid": range(200),
        }
    ).astype({"lt": "int64"})
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 150),
            "rt": rng.integers(0, 1000, 150),
            "val": rng.normal(size=150).round(3),
        }
    ).astype({"rt": "int64"})

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            left_ts="lt",
            right_ts="rt",
            value_cols=["val"],
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    # asof_join's documented tie rule: among right rows equal on (k, rt),
    # the greatest value tuple wins. Collapse ties to that row first so
    # merge_asof (which picks last-in-input-order) computes the same spec.
    right_dedup = (
        right.sort_values(["k", "rt", "val"])
        .groupby(["k", "rt"], as_index=False)
        .last()
    )
    expect = pd.merge_asof(
        left.sort_values("lt", kind="stable"),
        right_dedup.sort_values("rt", kind="stable"),
        left_on="lt",
        right_on="rt",
        by="k",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)

    # compare the attached value nullwise
    got_vals = got["val_asof"].where(got["val_asof"].notna(), None)
    exp_vals = expect["val"].where(expect["val"].notna(), None)
    mism = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(got_vals, exp_vals))
        if (a is None) != (b is None) or (a is not None and abs(a - b) > 1e-12)
    ]
    assert not mism, mism[:5]


def test_asof_join_tie_is_deterministic(spark):
    """Several right rows at the same (key, ts): the greatest value tuple
    is attached, on every run and partitioning."""
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "lt": [10], "lid": [0]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1], "rt": [10, 10, 5], "val": [1.5, 2.5, 9.0]})
    )
    for _ in range(3):
        got = asof_join(
            left, right, on=["k"], left_ts="lt", right_ts="rt", value_cols=["val"]
        ).collect()
        assert len(got) == 1 and got[0]["val_asof"] == 2.5


def test_topk_per_group(spark):
    df = spark.range(100).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("v")
    )
    out = topk_per_group(df, ["g"], [F.desc("v")], 3).toPandas()
    assert len(out) == 21
    for g, grp in out.groupby("g"):
        top = sorted(x for x in range(100) if x % 7 == g)[-3:]
        assert sorted(grp["v"]) == top


def test_salted_join_equals_plain_join(spark):
    """Salting must not change the join result multiset, including under
    heavy key skew and big-side rows with duplicate content."""
    from doreisa_spark.operators.salted import salted_join

    rng = np.random.default_rng(11)
    # 90% of rows on one hot key; some fully-duplicated rows
    keys = np.where(rng.random(2000) < 0.9, 0, rng.integers(1, 20, 2000))
    big = spark.createDataFrame(
        pd.DataFrame({"k": keys, "v": rng.integers(0, 50, 2000)})
    )
    small = spark.createDataFrame(
        pd.DataFrame({"k": range(0, 15), "label": [f"L{i}" for i in range(15)]})
    )

    for how in ("inner", "left"):
        got = (
            salted_join(big, small, "k", n_salts=8, how=how)
            .groupBy("k", "v", "label").count().collect()
        )
        want = (
            big.join(small, "k", how)
            .groupBy("k", "v", "label").count().collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_compaction_reduces_file_count(spark):
    """sink_compaction must physically shrink the file count while
    preserving every row (the aggregate is oracle-gated; this pins the
    filesystem effect)."""
    import glob

    from doreisa_spark.queries import sources_io

    sources_io.sink_compaction(spark, "/root/testdata/sf0.001").collect()
    frag = sources_io._sink("/root/testdata/sf0.001", "orders_fragmented")
    comp = sources_io._sink("/root/testdata/sf0.001", "orders_compacted")
    n_frag = len(glob.glob(f"{frag}/part-*.parquet"))
    n_comp = len(glob.glob(f"{comp}/part-*.parquet"))
    assert n_frag == 64
    assert n_comp == sources_io._COMPACT_FILES
    a = spark.read.parquet(frag).count()
    b = spark.read.parquet(comp).count()
    assert a == b > 0
