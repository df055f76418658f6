"""Differential property test for the retraction algebra: RANDOM
interleavings of insert / delete / mixed-CDC batches, roll-up folds,
and redeliveries against a seeded row universe must always read equal
to the one-pass aggregate over the surviving rows.

Seeded-random trials instead of hypothesis: each trial spins real
Spark jobs (~seconds), so a handful of wide seeds beats hypothesis'
shrinking loop here; failures print the seed + op script for replay.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from doreisa_spark.streaming.incremental_agg import AggregateStore

N_ROWS = 400
N_KEYS = 5


def _universe(spark):
    return spark.range(N_ROWS).select(
        (F.col("id") % N_KEYS).alias("k"),
        ((F.col("id") * 37) % 1000 / 4.0).alias("v"),
        F.col("id"),
    )


def _expect(df):
    return {
        r["k"]: (r["cnt"], round(r["sum_v"], 6), round(r["avg_v"], 6),
                 round(r["var_v"], 4))
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sum_v"),
            F.avg("v").alias("avg_v"), F.var_pop("v").alias("var_v"),
        ).collect()
    }


def test_random_interleavings_match_one_pass(spark, tmp_path):
    rows = _universe(spark).persist()
    rows.count()
    try:
        for seed in (11, 23, 47):
            rng = random.Random(seed)
            ids = list(range(N_ROWS))
            rng.shuffle(ids)
            # partition the universe into 6 slices; each is inserted
            # exactly once and deleted at most once, in random order,
            # with deletes allowed to precede their inserts
            slices = [set(ids[i::6]) for i in range(6)]
            to_delete = [i for i, _ in enumerate(slices) if rng.random() < 0.5]
            script = [("I", i) for i in range(6)] + \
                     [("D", i) for i in to_delete]
            rng.shuffle(script)
            st = AggregateStore(
                spark, str(tmp_path / f"p{seed}"), key_cols=["k"],
                retractable=True, compact_every=3,
                aggs={"cnt": ("count", None), "sum_v": ("sum", "v"),
                      "avg_v": ("avg", "v"), "var_v": ("var", "v")},
            )
            committed = {}
            for op, i in script:
                sl = sorted(slices[i])
                frame = rows.where(F.col("id").isin(sl)).drop("id")
                if op == "I":
                    committed[("I", i)] = st.process_batch(frame)
                else:
                    committed[("D", i)] = st.process_retract_batch(frame)
            # redeliver a random committed batch: must no-op
            op, i = rng.choice(list(committed))
            frame = rows.where(
                F.col("id").isin(sorted(slices[i]))).drop("id")
            if op == "I":
                st.process_batch(frame, batch_id=committed[(op, i)])
            else:
                st.process_retract_batch(frame, batch_id=committed[(op, i)])
            surviving = sorted(
                x for i, sl in enumerate(slices) if i not in to_delete
                for x in sl
            )
            exp = _expect(rows.where(F.col("id").isin(surviving)))
            got = {
                r["k"]: (r["cnt"], round(r["sum_v"], 6),
                         round(r["avg_v"], 6), round(r["var_v"], 4))
                for r in st.read().collect()
            }
            assert got == exp, (seed, script, to_delete)
            assert st.unmatched_retractions().count() == 0, (seed, script)
    finally:
        rows.unpersist()


def test_random_cdc_scripts_match_one_pass(spark, tmp_path):
    """Mixed-CDC variant: each random step packs an insert slice AND a
    delete slice (possibly empty) into ONE op-tagged batch."""
    rows = _universe(spark).persist()
    rows.count()
    try:
        for seed in (5, 61):
            rng = random.Random(seed)
            ids = list(range(N_ROWS))
            rng.shuffle(ids)
            slices = [set(ids[i::6]) for i in range(6)]
            insert_order = list(range(6))
            rng.shuffle(insert_order)
            deleted: list[int] = []
            st = AggregateStore(
                spark, str(tmp_path / f"c{seed}"), key_cols=["k"],
                retractable=True, compact_every=3,
                aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
            )
            inserted: list[int] = []
            for i in insert_order:
                ins = rows.where(
                    F.col("id").isin(sorted(slices[i]))
                ).drop("id").withColumn("op", F.lit("I"))
                batch = ins
                # maybe delete one PREVIOUSLY INSERTED slice in the
                # same mixed batch
                cand = [j for j in inserted if j not in deleted]
                if cand and rng.random() < 0.6:
                    j = rng.choice(cand)
                    deleted.append(j)
                    batch = ins.unionByName(
                        rows.where(F.col("id").isin(sorted(slices[j])))
                        .drop("id").withColumn("op", F.lit("D")))
                st.process_cdc_batch(batch)
                inserted.append(i)
            surviving = sorted(
                x for i, sl in enumerate(slices) if i not in deleted
                for x in sl
            )
            exp = {
                r["k"]: (r["cnt"], round(r["sum_v"], 6))
                for r in rows.where(F.col("id").isin(surviving))
                .groupBy("k").agg(F.count(F.lit(1)).alias("cnt"),
                                  F.sum("v").alias("sum_v")).collect()
            }
            got = {r["k"]: (r["cnt"], round(r["sum_v"], 6))
                   for r in st.read().collect()}
            assert got == exp, (seed, insert_order, deleted)
    finally:
        rows.unpersist()

def test_random_extrema_scripts_match_one_pass(spark, tmp_path):
    """Bounded k-extrema differential (r15): random insert/delete
    interleavings on a retractable min/max/last store with a TINY
    candidate window (k=3) so frontier drains actually happen; when a
    read raises dirty, re_derive from the surviving rows must heal it,
    and the final state must equal the one-pass aggregate — including
    fully-retracted groups dropping."""
    rows = _universe(spark).persist()
    rows.count()
    try:
        for seed in (7, 31, 101):
            rng = random.Random(seed)
            ids = list(range(N_ROWS))
            rng.shuffle(ids)
            slices = [set(ids[i::6]) for i in range(6)]
            to_delete = [i for i, _ in enumerate(slices)
                         if rng.random() < 0.6]
            script = [("I", i) for i in range(6)] + \
                     [("D", i) for i in to_delete]
            rng.shuffle(script)
            st = AggregateStore(
                spark, str(tmp_path / f"x{seed}"), key_cols=["k"],
                retractable=True, compact_every=3,
                aggs={"mn": ("min", "v", {"k": 3}),
                      "mx": ("max", "v", {"k": 3}),
                      "last_v": ("last", "v", {"by": "ord", "k": 3}),
                      "cnt": ("count", None)},
            )
            for op, i in script:
                frame = rows.where(
                    F.col("id").isin(sorted(slices[i]))
                ).withColumn("ord", F.col("id")).drop("id")
                if op == "I":
                    st.process_batch(frame)
                else:
                    st.process_retract_batch(frame)
            surviving = sorted(
                x for i, sl in enumerate(slices) if i not in to_delete
                for x in sl
            )
            src = rows.where(F.col("id").isin(surviving)).withColumn(
                "ord", F.col("id")).drop("id")
            if st.dirty_groups().count():
                st.re_derive(src)  # targeted: only the drained groups
            exp = {
                r["k"]: (round(r["mn"], 6), round(r["mx"], 6),
                         round(r["last_v"], 6), r["cnt"])
                for r in src.groupBy("k").agg(
                    F.min("v").alias("mn"), F.max("v").alias("mx"),
                    F.max_by("v", "ord").alias("last_v"),
                    F.count(F.lit(1)).alias("cnt")).collect()
            }
            got = {
                r["k"]: (round(r["mn"], 6), round(r["mx"], 6),
                         round(r["last_v"], 6), r["cnt"])
                for r in st.read().collect()
            }
            assert got == exp, (seed, script, to_delete)
    finally:
        rows.unpersist()
