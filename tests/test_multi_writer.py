"""Optimistic multi-writer commits (r12 verdict ask #3).

The commit layer's single-writer fence (acquire_writer) stays the hard
fence — migrations and alias flips still kill every other writer — but
two pipelines may now append to one store concurrently by joining as
SHARED writers (join_writer / AggregateStore(fenced="shared")): commits
CAS against the shared epoch, disjoint batch ids all land, an
id-allocation race declines exactly one side and the loser retries on a
fresh id (the Delta/Iceberg commit-retry pattern). Model test: two
concurrent writer loops — no lost batch, no double-counted batch,
explicit same-id conflicts still refuse, concurrent compactions decline
rather than double-fold, and a hard fence stops both writers.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_agg import AggregateStore

AGGS = {"cnt": ("count", None), "sum_v": ("sum", "v")}


def _mk(spark, root, **kw):
    return AggregateStore(spark, root, key_cols=["k"], aggs=AGGS,
                          commit_mode=BC.MANIFEST, fenced="shared", **kw)


def _slice(spark, writer: int, i: int):
    # writer-disjoint, deterministic data: (writer, i) -> 20 rows
    base = writer * 1000 + i * 20
    return spark.range(base, base + 20).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 0.5).alias("v"))


def _all_data(spark, n_each: int):
    frames = [_slice(spark, w, i) for w in (1, 2) for i in range(n_each)]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


def test_two_concurrent_writer_loops_lose_nothing(spark, tmp_path):
    root = str(tmp_path / "mw")
    n_each = 10
    st1 = _mk(spark, root)
    st1.process_batch(_slice(spark, 1, 0))  # seed the spec marker
    st2 = _mk(spark, root)
    start = threading.Barrier(2)
    errs: list = []

    def loop(store, writer, lo):
        try:
            start.wait()
            for i in range(lo, n_each):
                store.process_batch(_slice(spark, writer, i))
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    t1 = threading.Thread(target=loop, args=(st1, 1, 1))
    t2 = threading.Thread(target=loop, args=(st2, 2, 0))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    # every batch landed exactly once: the view equals the one-pass
    # aggregate of ALL the data both writers produced
    exp = {
        (r["k"], r["cnt"], round(r["sum_v"], 6))
        for r in _all_data(spark, n_each).groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sum_v")).collect()
    }
    got = {(r["k"], r["cnt"], round(r["sum_v"], 6))
           for r in st1.read().collect()}
    assert got == exp
    # 2 * n_each distinct batch ids committed (compaction off by
    # default here would keep them all; compact_every=64 never fired)
    ids = BC.committed_ids(f"{root}/partials", mode=BC.MANIFEST)
    assert len(ids) == 2 * n_each and len(set(ids)) == len(ids)


def test_explicit_same_id_conflict_still_refuses(spark, tmp_path):
    root = str(tmp_path / "dup")
    st1 = _mk(spark, root)
    bid = st1.process_batch(_slice(spark, 1, 0))
    st2 = _mk(spark, root)
    # explicit redelivery of a committed id commits NOTHING, even from
    # a different shared writer with different data
    st2.process_batch(_slice(spark, 2, 0), batch_id=bid)
    exp = {
        (r["k"], r["cnt"]) for r in _slice(spark, 1, 0).groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert {(r["k"], r["cnt"]) for r in st1.read().collect()} == exp


def test_hard_fence_stops_shared_writers(spark, tmp_path):
    root = str(tmp_path / "fence")
    st1 = _mk(spark, root)
    st1.process_batch(_slice(spark, 1, 0))
    st2 = _mk(spark, root)
    st2.process_batch(_slice(spark, 2, 0))
    # a hard (exclusive) acquire — what migrate/alias-flip do — bumps
    # the epoch: both shared writers are fenced mid-flight
    BC.acquire_writer(f"{root}/partials", mode=BC.MANIFEST)
    with pytest.raises(BC.StaleWriterError):
        st1.process_batch(_slice(spark, 1, 1))
    with pytest.raises(BC.StaleWriterError):
        st2.process_batch(_slice(spark, 2, 1))
    # late joiners resume under the new epoch
    st3 = _mk(spark, root)
    st3.process_batch(_slice(spark, 1, 1))


def test_concurrent_deletes_both_apply(spark, tmp_path):
    root = str(tmp_path / "dels")
    st1 = _mk(spark, root)
    st1.process_batch(_slice(spark, 1, 0))
    st1.process_batch(_slice(spark, 2, 0))
    st2 = _mk(spark, root)
    start = threading.Barrier(2)
    errs: list = []

    def dele(store, keys):
        try:
            start.wait()
            store.delete_groups(keys)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=dele, args=(st1, [0, 1]))
    t2 = threading.Thread(target=dele, args=(st2, [1, 2]))  # overlap on 1
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    left = {r["k"] for r in st1.read().collect()}
    assert left == {3, 4, 5, 6}


def test_concurrent_compaction_declines_never_double_folds(spark, tmp_path):
    root = str(tmp_path / "comp")
    st1 = _mk(spark, root, compact_every=4)
    st1.process_batch(_slice(spark, 1, 0))
    st2 = _mk(spark, root, compact_every=4)
    start = threading.Barrier(2)
    errs: list = []

    def loop(store, writer, lo, n):
        try:
            start.wait()
            for i in range(lo, n):
                store.process_batch(_slice(spark, writer, i))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=loop, args=(st1, 1, 1, 8))
    t2 = threading.Thread(target=loop, args=(st2, 2, 0, 8))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    exp = {
        (r["k"], r["cnt"], round(r["sum_v"], 6))
        for r in _all_data(spark, 8).groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sum_v")).collect()
    }
    got = {(r["k"], r["cnt"], round(r["sum_v"], 6))
           for r in st2.read().collect()}
    assert got == exp


def test_shared_writers_on_join_view(spark, tmp_path):
    """Two pipelines feed ONE join view concurrently — one ingesting
    facts, one ingesting dim updates — as shared writers; the view
    equals the one-pass join of everything both wrote."""
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    def mk():
        return JoinedAggregateView(
            spark, str(tmp_path / "jv"), fk="fk", fact_keys=[],
            fact_aggs={"cnt": ("count", None), "sum_v": ("sum", "v")},
            dim_key="doc_id", dim_cols=["source"], dim_order_by="ver",
            commit_mode=BC.MANIFEST, fenced="shared",
        )

    def facts(i):
        base = i * 30
        return spark.range(base, base + 30).select(
            (F.col("id") % 5).alias("fk"), (F.col("id") * 0.25).alias("v"))

    def dimv(i):
        return spark.range(0, 5).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit(f"s{i}_"), F.col("id")).alias("source"),
            F.lit(i).alias("ver"))

    v1 = mk()
    v1.process_fact_batch(facts(0))
    v1.process_dim_batch(dimv(0))
    v2 = mk()
    start = threading.Barrier(2)
    errs: list = []

    def fact_loop():
        try:
            start.wait()
            for i in range(1, 6):
                v1.process_fact_batch(facts(i))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def dim_loop():
        try:
            start.wait()
            for i in range(1, 4):
                v2.process_dim_batch(dimv(i))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=fact_loop)
    t2 = threading.Thread(target=dim_loop)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    all_f = facts(0)
    for i in range(1, 6):
        all_f = all_f.unionAll(facts(i))
    latest = dimv(3)  # ver 3 wins every key
    exp = {
        (r["source"], r["cnt"], round(r["sum_v"], 6))
        for r in all_f.join(latest, all_f["fk"] == latest["doc_id"])
        .groupBy("source").agg(F.count(F.lit(1)).alias("cnt"),
                               F.sum("v").alias("sum_v")).collect()
    }
    got = {(r["source"], r["cnt"], round(r["sum_v"], 6))
           for r in v2.read(["source"]).collect()}
    assert got == exp


def test_shared_writers_on_vector_store(spark, tmp_path):
    """Two ingest pipelines append to ONE LSH vector store as shared
    writers; a probe sees every vector both committed, and the hard
    fence (what migrate/alias-flip acquire) still stops both."""
    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    def vecs(lo, n=40):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("vec_id"),
            F.expr("transform(sequence(0, 7), j -> "
                   "CAST(pmod(hash(id, j), 100) / 50.0 - 1.0 AS FLOAT))")
            .alias("embedding"))

    root = str(tmp_path / "lsh")
    s1 = LSHVectorStore(spark, root, commit_mode=BC.MANIFEST,
                        fenced="shared", compact_every=None)
    s1.process_batch(vecs(0), 0)
    s2 = LSHVectorStore(spark, root, commit_mode=BC.MANIFEST,
                        fenced="shared", compact_every=None)
    s2.process_batch(vecs(40), 1)
    s1.process_batch(vecs(80), 2)
    assert s1.members().count() == 120
    BC.acquire_writer(f"{root}/members", mode=BC.MANIFEST)
    with pytest.raises(BC.StaleWriterError):
        s1.process_batch(vecs(120), 3)
    with pytest.raises(BC.StaleWriterError):
        s2.process_batch(vecs(120), 3)


def test_shared_writers_across_processes(spark, tmp_path):
    """The deployment shape: two OS PROCESSES (not threads — flock
    semantics differ) ingest one store concurrently as shared writers.
    Every batch lands exactly once."""
    import subprocess
    import sys

    root = str(tmp_path / "xproc")
    st = _mk(spark, root)
    st.process_batch(_slice(spark, 1, 0))  # seed the spec marker

    script = r"""
import sys
sys.path.insert(0, {repo!r})
from doreisa_spark.session import get_spark
from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_agg import AggregateStore
from pyspark.sql import functions as F

writer = int(sys.argv[1]); root = sys.argv[2]
spark = get_spark(f"xproc-w{{writer}}", cpus=2, shuffle_partitions=2,
                  extra_conf={{"spark.driver.memory": "2g",
                               "spark.driver.extraJavaOptions":
                               "-Xms512m -XX:ReservedCodeCacheSize=128m"}})
st = AggregateStore(spark, root, commit_mode=BC.MANIFEST, fenced="shared")
for i in range(0 if writer == 2 else 1, 6):
    base = writer * 1000 + i * 20
    st.process_batch(
        spark.range(base, base + 20).select(
            (F.col("id") % 7).alias("k"), (F.col("id") * 0.5).alias("v")))
print("DONE", writer)
"""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = script.format(repo=repo)
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(w), root],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for w in (1, 2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert all(f"DONE {w}" in o for w, o in zip((1, 2), outs)), outs
    exp = {
        (r["k"], r["cnt"], round(r["sum_v"], 6))
        for r in _all_data(spark, 6).groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sum_v")).collect()
    }
    got = {(r["k"], r["cnt"], round(r["sum_v"], 6))
           for r in st.read().collect()}
    assert got == exp
    ids = BC.committed_ids(f"{root}/partials", mode=BC.MANIFEST)
    assert len(ids) == 12 and len(set(ids)) == 12
