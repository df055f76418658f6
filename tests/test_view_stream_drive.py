"""Structured-Streaming drives for the view layer (r13 verdict ask #4):
drive_aggregate_view / drive_join_view push micro-batches through the
exactly-once partial log via foreachBatch.

The load-bearing test forces the classic at-least-once failure: the
sink COMMITS a batch, then crashes before Spark records the offset.
On restart Spark redelivers the same micro-batch under the SAME id,
and the commit layer's per-id refusal must make the redelivery a
no-op — the view equals the one-pass batch aggregate exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from doreisa_spark.streaming.incremental_agg import (
    AggregateStore,
    drive_aggregate_view,
)

EVENTS_DDL = ("event_id bigint, event_type string, user_id bigint, "
              "value double, n bigint")


def _stream_dir(spark, tmp_path, n_files=3):
    """n_files parquet files of synthetic events, mtimes ascending so
    the file source triggers them in order, one per micro-batch."""
    src = tmp_path / "in"
    src.mkdir()
    df = spark.range(300).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), (F.col("id") % 3)).alias("event_type"),
        (F.col("id") % 17).alias("user_id"),
        (F.col("id") * 0.25).alias("value"),
        F.lit(1).alias("n"),
    )
    per = 300 // n_files
    for i in range(n_files):
        part = df.where(
            (F.col("event_id") >= i * per)
            & (F.col("event_id") < (i + 1) * per))
        tmp = src / f"tmp{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = str(src / f"{i:05d}.parquet")
        os.rename(str(tmp / data), dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)
    return str(src), df


def _read_stream(spark, src):
    return (spark.readStream.schema(EVENTS_DDL)
            .option("maxFilesPerTrigger", 1).parquet(src))


def _expect(df):
    return {
        (r["event_type"], r["cnt"], round(r["sum_v"], 6))
        for r in df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_v")).collect()
    }


def _mk_store(spark, tmp_path, name="st"):
    return AggregateStore(
        spark, str(tmp_path / name), key_cols=["event_type"],
        aggs={"cnt": ("count", None), "sum_v": ("sum", "value")})


def test_drive_equals_one_pass_batch(spark, tmp_path):
    src, df = _stream_dir(spark, tmp_path)
    store = _mk_store(spark, tmp_path)
    got = drive_aggregate_view(_read_stream(spark, src), store,
                               timeout_sec=120)
    assert {(r["event_type"], r["cnt"], round(r["sum_v"], 6))
            for r in got.collect()} == _expect(df)


def test_forced_redelivery_is_exactly_once(spark, tmp_path):
    """Crash AFTER the store commit of micro-batch 1 but BEFORE Spark
    checkpoints its offset; the restarted drive REDELIVERS batch 1
    under the same id. Without the commit layer's refusal the batch
    would double-count — the view must equal the one-pass aggregate."""
    src, df = _stream_dir(spark, tmp_path)
    store = _mk_store(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    crashed = {"n": 0}

    def crashing(sdf, bid):
        store.process_batch(sdf, bid)  # the commit LANDS...
        if bid == 1 and crashed["n"] == 0:
            crashed["n"] = 1
            raise RuntimeError("synthetic crash after commit")

    from doreisa_spark.streaming.structured import run_foreach_batch

    try:
        run_foreach_batch(_read_stream(spark, src), crashing,
                          timeout_sec=120, checkpoint=ckpt)
    except Exception:
        pass  # the query died mid-stream, offsets for batch 1 unwritten
    assert crashed["n"] == 1  # the crash actually fired
    # restart with the same checkpoint THROUGH THE PRODUCTION HELPER:
    # Spark redelivers batch 1 under the same id (the store refuses it),
    # then batch 2 proceeds
    drive_aggregate_view(_read_stream(spark, src), store,
                         timeout_sec=120, checkpoint=ckpt)
    got = {(r["event_type"], r["cnt"], round(r["sum_v"], 6))
           for r in store.read().collect()}
    assert got == _expect(df)


def test_resumed_drive_processes_only_new_files(spark, tmp_path):
    src, df = _stream_dir(spark, tmp_path)
    store = _mk_store(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt2")
    drive_aggregate_view(_read_stream(spark, src), store,
                         timeout_sec=120, checkpoint=ckpt)
    # a NEW file arrives; the resumed drive must ingest exactly it
    extra = spark.range(300, 360).select(
        F.col("id").alias("event_id"), F.lit("t9").alias("event_type"),
        (F.col("id") % 17).alias("user_id"),
        (F.col("id") * 0.25).alias("value"), F.lit(1).alias("n"))
    tmp = tmp_path / "tmpx"
    extra.coalesce(1).write.mode("overwrite").parquet(str(tmp))
    data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
    os.rename(str(tmp / data), os.path.join(src, "99990.parquet"))
    got = drive_aggregate_view(_read_stream(spark, src), store,
                               timeout_sec=120, checkpoint=ckpt)
    assert {(r["event_type"], r["cnt"], round(r["sum_v"], 6))
            for r in got.collect()} == _expect(df.unionByName(extra))


def test_drive_with_transform_derives_window_keys(spark, tmp_path):
    """The transform runs inside the sink (covered by exactly-once):
    the windowed-view recipe — derive the hour key per batch."""
    src, df = _stream_dir(spark, tmp_path)
    store = AggregateStore(
        spark, str(tmp_path / "w"), key_cols=["bucket", "event_type"],
        aggs={"cnt": ("count", None)})
    got = drive_aggregate_view(
        _read_stream(spark, src), store, timeout_sec=120,
        transform=lambda d: d.withColumn(
            "bucket", (F.col("event_id") / 100).cast("int")))
    exp = {(r["bucket"], r["event_type"], r["cnt"]) for r in
           df.withColumn("bucket", (F.col("event_id") / 100).cast("int"))
           .groupBy("bucket", "event_type")
           .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert {(r["bucket"], r["event_type"], r["cnt"])
            for r in got.collect()} == exp


def test_drive_join_view_both_inputs(spark, tmp_path):
    from doreisa_spark.streaming.incremental_join import (
        JoinedAggregateView,
        drive_join_view,
    )

    src, df = _stream_dir(spark, tmp_path)
    dim_dir = tmp_path / "dim_in"
    dim_dir.mkdir()
    dim = spark.createDataFrame(
        [(i, f"s{i % 2}", 1) for i in range(17)],
        "doc_id bigint, source string, ver int")
    tmp = tmp_path / "tmpd"
    dim.coalesce(1).write.mode("overwrite").parquet(str(tmp))
    data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
    os.rename(str(tmp / data), str(dim_dir / "00000.parquet"))
    view = JoinedAggregateView(
        spark, str(tmp_path / "jv"), fk="user_id", fact_keys=[],
        fact_aggs={"cnt": ("count", None)},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="ver")
    got = drive_join_view(
        view,
        fact_stream=_read_stream(spark, src),
        dim_streams={"dim": spark.readStream
                     .schema("doc_id bigint, source string, ver int")
                     .option("maxFilesPerTrigger", 1)
                     .parquet(str(dim_dir))},
        timeout_sec=120)
    exp = {tuple(r) for r in
           df.join(dim, df["user_id"] == dim["doc_id"])
           .groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
           .collect()}
    assert {tuple(r) for r in got.collect()} == exp


def test_drive_join_view_cdc_fact_stream(spark, tmp_path):
    """fact_op_col: the join view's fact side drains a MIXED CDC
    stream — each micro-batch's inserts+deletes commit atomically; the
    view equals the one-pass join over the surviving fact rows."""
    from doreisa_spark.streaming.incremental_join import (
        JoinedAggregateView,
        drive_join_view,
    )

    src = tmp_path / "cdcj_in"
    src.mkdir()
    frames = [
        [(k, float(10 * k + i), "I") for k in range(4) for i in range(3)],
        # delete one row of fk 0, insert a replacement, delete ALL fk 3
        [(0, 1.0, "D"), (0, 100.0, "I"),
         (3, 30.0, "D"), (3, 31.0, "D"), (3, 32.0, "D")],
    ]
    for i, rows in enumerate(frames):
        df = spark.createDataFrame(rows, "fk bigint, v double, op string")
        tmp = tmp_path / f"jt{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        os.rename(str(tmp / data), str(src / f"{i:05d}.parquet"))
        os.utime(str(src / f"{i:05d}.parquet"),
                 (1_700_000_000 + i * 10,) * 2)
    dim = spark.createDataFrame(
        [(k, f"s{k % 2}", 1) for k in range(4)],
        "doc_id bigint, source string, ver int")
    view = JoinedAggregateView(
        spark, str(tmp_path / "jvc"), fk="fk", fact_keys=[],
        fact_aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
        dim_key="doc_id", dim_cols=["source"], dim_order_by="ver",
        retractable=True)
    view.process_dim_batch(dim)
    got = drive_join_view(
        view,
        fact_stream=(spark.readStream
                     .schema("fk bigint, v double, op string")
                     .option("maxFilesPerTrigger", 1).parquet(str(src))),
        fact_op_col="op", timeout_sec=120)
    # survivors: fk0 {0,2,100}, fk1 {10,11,12}, fk2 {20,21,22}; fk3 gone
    exp = {("s0", 6, 0.0 + 2.0 + 100.0 + 20.0 + 21.0 + 22.0),
           ("s1", 3, 33.0)}
    assert {(r["source"], r["cnt"], round(r["sum_v"], 6))
            for r in got.collect()} == exp
