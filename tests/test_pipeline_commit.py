"""Pipeline-scoped atomic ingest across stores (r14 verdict ask #3).

One logical pipeline batch feeding curation AND dedup (AND a join
view's fact side) commits through a single pipeline-primary txn record
(streaming/pipeline_commit.py): the batch stages durably, ONE WAL
write publishes the intent with pre-allocated store ids, each store
applies exactly-once under its recorded id, and a crash anywhere heals
from ANY handle — so a pipeline cut (which heals first) can never
capture a between-stores skew.
"""

from __future__ import annotations

import os

import pytest
from doreisa_spark.queries.textops import _STOPWORDS
from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming import pipeline_commit as PC
from doreisa_spark.streaming.incremental_curation import CurationStore
from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore
from doreisa_spark.streaming.pipeline_commit import PipelineIngest

DOCS_DDL = ("doc_id bigint, text string, lang string, source string, "
            "n_chars bigint")
_SW = sorted(_STOPWORDS)


def _docs(spark, lo, hi):
    """Quality-passing texts (24 tokens, stopword ratio 0.5) whose
    CONTENT tokens are unique per doc: every word 3-gram contains a
    unique token, so shingle sets are pairwise disjoint — each doc is
    admitted to the dedup store with zero bucket collisions and the
    expected member set is exact."""
    rows = []
    for i in range(lo, hi):
        t = " ".join(f"u{i}t{j} {_SW[j % len(_SW)]}" for j in range(12))
        rows.append((i, t, "en", "web", len(t)))
    return spark.createDataFrame(rows, DOCS_DDL)


def _member_docs(ded, **kw) -> int:
    return ded.members(**kw).select("doc_id").distinct().count()


def _pipe(spark, tmp_path, name="pipe"):
    root = str(tmp_path / name)
    cur = CurationStore(spark, f"{root}/cur", commit_mode=BC.MANIFEST,
                        compact_every=None, fenced=False)
    ded = LSHSignatureStore(spark, f"{root}/ded", commit_mode=BC.MANIFEST,
                            compact_every=None, fenced=False)
    pipe = PipelineIngest(spark, root, {
        "curation": (cur, lambda df: df.select("doc_id", "lang", "text")),
        "dedup": ded,
    })
    return pipe, cur, ded


def test_atomic_commit_and_redelivery(spark, tmp_path):
    pipe, cur, ded = _pipe(spark, tmp_path)
    assert pipe.commit(_docs(spark, 0, 6), 0)
    assert not pipe.commit(_docs(spark, 0, 6), 0)  # redelivery no-ops
    assert cur.kept().count() == 6
    assert _member_docs(ded) == 6
    assert PC.pipeline_pending(pipe.root) == {}
    # both stores landed under the RECORDED (pre-allocated) ids
    assert BC.committed_ids(f"{pipe.root}/cur/seen", mode=BC.MANIFEST) == [0]
    assert BC.committed_ids(f"{pipe.root}/ded/members",
                            mode=BC.MANIFEST) == [0]
    # staging reclaimed after COMPLETE
    assert os.listdir(os.path.join(pipe.root, "_txn_stage")) == []


def test_auto_pid_sequences_and_folds_wal(spark, tmp_path):
    pipe, cur, ded = _pipe(spark, tmp_path)
    for k in range(3):
        assert pipe.commit(_docs(spark, 10 * k, 10 * k + 4))
    wal = PC._wal_load(pipe.root)
    # completed txns fold into the contiguous horizon: O(pending) WAL
    assert wal == {"next": 3, "done_horizon": 2, "done": [], "txns": {}}
    assert cur.kept().count() == 12
    assert _member_docs(ded) == 12


def _arm_crash_between_stores(pipe):
    """Crash between member stores on THIS handle: the curation sink
    (first in sorted order) applies, then the txn dies before the
    dedup sink — the exact window the r14 verdict named."""

    def bomb(name):
        raise RuntimeError("induced crash between member stores")

    pipe._after_sink_apply = bomb


def test_crash_between_stores_heals_from_fresh_handle(spark, tmp_path):
    pipe, cur, ded = _pipe(spark, tmp_path)
    assert pipe.commit(_docs(spark, 0, 4))
    _arm_crash_between_stores(pipe)
    with pytest.raises(RuntimeError, match="induced crash"):
        pipe.commit(_docs(spark, 10, 14))
    # the skew is REAL: curation admitted batch 1, dedup never saw it
    assert cur.kept().count() == 8
    assert _member_docs(ded) == 4
    assert set(PC.pipeline_pending(pipe.root)) == {1}
    # a FRESH handle (the restarted driver) heals without the original
    # DataFrame — the staged payload is the redo log
    pipe2, cur2, ded2 = _pipe(spark, tmp_path)
    assert pipe2.heal() == 1
    assert cur2.kept().count() == 8   # exactly-once: no double admit
    assert _member_docs(ded2) == 8
    assert PC.pipeline_pending(pipe2.root) == {}


def test_pipeline_cut_cannot_capture_the_skew(spark, tmp_path):
    """THE r14 'Done =' shape: a crash lands curation but not dedup;
    a pipeline cut taken through snapshot() heals FIRST, so the pinned
    cut sees both stores with the batch — never the skew."""
    from doreisa_spark.streaming.pipeline_snapshot import (
        read_pipeline_snapshot,
    )

    pipe, cur, ded = _pipe(spark, tmp_path)
    assert pipe.commit(_docs(spark, 0, 4))
    _arm_crash_between_stores(pipe)
    with pytest.raises(RuntimeError, match="induced crash"):
        pipe.commit(_docs(spark, 10, 14))
    assert cur.kept().count() == 8 and _member_docs(ded) == 4  # skewed
    pipe2, cur2, ded2 = _pipe(spark, tmp_path)
    cut = pipe2.snapshot(snapshot_kwargs={"dedup": {"pin_members": True}})
    pins = read_pipeline_snapshot(pipe2.root, cut)
    assert set(pins) == {"curation", "dedup"}
    # the pinned cut is consistent: BOTH stores contain both batches
    assert cur2.kept(snapshot=pins["curation"]).count() == 8
    assert _member_docs(ded2, snapshot=pins["dedup"]) == 8


def test_crash_injection_at_every_wal_mutation(spark, tmp_path, monkeypatch):
    """Kill the txn at the 1st, 2nd, ... WAL mutation (heal's GC sweep,
    intent, complete): after every crash a heal converges both stores
    to all-or-nothing, and a retry lands the batch exactly once."""
    real_mutate = PipelineIngest._mutate
    for crash_at in (1, 2, 3):
        pipe, cur, ded = _pipe(spark, tmp_path, name=f"p{crash_at}")
        calls = {"n": 0}

        def bomb(self, fn, crash_at=crash_at, calls=calls):
            calls["n"] += 1
            if calls["n"] == crash_at:
                raise RuntimeError(f"induced crash at mutation {crash_at}")
            return real_mutate(self, fn)

        monkeypatch.setattr(PipelineIngest, "_mutate", bomb)
        crashed = False
        try:
            pipe.commit(_docs(spark, 0, 4), 0)
        except RuntimeError:
            crashed = True
        monkeypatch.undo()
        pipe.heal()
        counts = (cur.kept().count(), _member_docs(ded))
        committed = PipelineIngest._is_done(0, PC._wal_load(pipe.root))
        assert counts == ((4, 4) if committed else (0, 0)), (
            crash_at, counts, committed)
        pipe.commit(_docs(spark, 0, 4), 0)  # retry / redelivery
        assert (cur.kept().count(), _member_docs(ded)) == (4, 4), (
            crash_at, "after retry")
        assert PC.pipeline_pending(pipe.root) == {}
        if not crashed:
            break  # no mutation points left: later crash_at are no-ops


def test_orphan_stage_gc_spares_fresh_dirs(spark, tmp_path):
    pipe, cur, ded = _pipe(spark, tmp_path)
    base = os.path.join(pipe.root, "_txn_stage")
    # a crash BEFORE intent: staged dir, no WAL record
    os.makedirs(os.path.join(base, "sdeadbeef0001"))
    os.makedirs(os.path.join(base, "sdeadbeef0002"))
    os.utime(os.path.join(base, "sdeadbeef0001"), (1.0, 1.0))  # aged
    pipe.heal()
    assert not os.path.isdir(os.path.join(base, "sdeadbeef0001"))
    assert os.path.isdir(os.path.join(base, "sdeadbeef0002"))  # in grace


def test_heal_refuses_a_handle_missing_sinks(spark, tmp_path):
    pipe, cur, ded = _pipe(spark, tmp_path)
    _arm_crash_between_stores(pipe)
    with pytest.raises(RuntimeError, match="induced crash"):
        pipe.commit(_docs(spark, 0, 4))
    short = PipelineIngest(spark, pipe.root, {"curation": cur})
    with pytest.raises(RuntimeError, match="names sinks.*dedup"):
        short.heal()


def test_two_concurrent_handles_lose_nothing(spark, tmp_path):
    """Two pipeline handles share one root and commit DISJOINT batches
    concurrently: the WAL lock serializes intents, store ids floor
    above pending txns' recorded ids (without the floor, two in-flight
    txns would record colliding store ids and one batch would no-op as
    a phantom redelivery), and a handle's head-heal rolling the peer's
    in-flight txn forward is absorbed by the stores' per-id refusal —
    every doc lands in BOTH stores exactly once."""
    import threading

    pipe1, cur, ded = _pipe(spark, tmp_path)
    pipe2, _, _ = _pipe(spark, tmp_path)
    start = threading.Barrier(2)
    errs: list = []

    def loop(pipe, lo):
        try:
            start.wait()
            for k in range(3):
                pipe.commit(_docs(spark, lo + 10 * k, lo + 10 * k + 4))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=loop, args=(pipe1, 0))
    t2 = threading.Thread(target=loop, args=(pipe2, 100))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    pipe1.heal()
    kept = sorted(r["doc_id"] for r in cur.kept().collect())
    exp = sorted([lo + 10 * k + j for lo in (0, 100)
                  for k in range(3) for j in range(4)])
    assert kept == exp                       # each doc once, none lost
    assert _member_docs(ded) == 24
    # six distinct store ids per log — no collision ate a batch
    ids = BC.committed_ids(f"{pipe1.root}/cur/seen", mode=BC.MANIFEST)
    assert len(ids) == 6 and len(set(ids)) == 6
    assert PC.pipeline_pending(pipe1.root) == {}
    wal = PC._wal_load(pipe1.root)
    assert wal["done_horizon"] == 5 and wal["txns"] == {}


def test_cdc_sink_routes_mixed_batches_atomically(spark, tmp_path):
    """A CDC pipeline batch (op-tagged inserts AND deletes) spans an
    append-only curation sink (transform keeps the inserts) and a
    retractable view through CdcSink (one signed partial) — crashed
    between the stores, healed from a fresh handle, the view must equal
    the post-delete aggregate and curation must hold every insert."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_agg import AggregateStore
    from doreisa_spark.streaming.pipeline_commit import CdcSink

    root = str(tmp_path / "cdcp")

    def mk():
        cur = CurationStore(spark, f"{root}/cur", commit_mode=BC.MANIFEST,
                            compact_every=None, fenced=False)
        view = AggregateStore(
            spark, f"{root}/view", key_cols=["lang"], retractable=True,
            aggs={"cnt": ("count", None), "chars": ("sum", "n_chars")},
            commit_mode=BC.MANIFEST, fenced=False)
        return cur, view, PipelineIngest(spark, root, {
            "curation": (cur, lambda df: df.where("op = 'I'")
                         .select("doc_id", "lang", "text")),
            "view": (CdcSink(view),
                     lambda df: df.select("op", "lang", "n_chars")),
        })

    cur, view, pipe = mk()
    ins = lambda lo, hi: _docs(spark, lo, hi).withColumn(  # noqa: E731
        "op", F.lit("I"))
    assert pipe.commit(ins(0, 6))
    # batch 1 MIXES inserts (6..8) with CDC deletes replaying rows 0..2
    mixed = ins(6, 8).unionByName(
        _docs(spark, 0, 2).withColumn("op", F.lit("D")))
    _arm_crash_between_stores(pipe)  # curation applies, view does not
    with pytest.raises(RuntimeError, match="induced crash"):
        pipe.commit(mixed)
    got = view.read().collect()  # skew: view still shows batch 0 only
    assert [(r["lang"], r["cnt"]) for r in got] == [("en", 6)]
    cur2, view2, pipe2 = mk()
    assert pipe2.heal() == 1
    got = view2.read().collect()  # post-delete: docs 2..8 survive
    assert [(r["lang"], r["cnt"]) for r in got] == [("en", 6)]
    exp_chars = sum(r["n_chars"] for r in
                    _docs(spark, 2, 8).select("n_chars").collect())
    assert got[0]["chars"] == exp_chars
    assert cur2.kept().count() == 8  # every INSERT admitted exactly once


def test_pipeline_heal_across_processes(spark, tmp_path):
    """A SEPARATE OS process (real flock semantics) heals the crashed
    txn from the staged payload; this process observes convergence."""
    import subprocess
    import sys

    pipe, cur, ded = _pipe(spark, tmp_path)
    assert pipe.commit(_docs(spark, 0, 4))
    _arm_crash_between_stores(pipe)
    with pytest.raises(RuntimeError, match="induced crash"):
        pipe.commit(_docs(spark, 10, 14))
    assert set(PC.pipeline_pending(pipe.root)) == {1}
    script = r"""
import sys
sys.path.insert(0, {repo!r})
from doreisa_spark.session import get_spark
from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_curation import CurationStore
from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore
from doreisa_spark.streaming.pipeline_commit import PipelineIngest

root = sys.argv[1]
spark = get_spark("pipe-heal-xproc", cpus=2, shuffle_partitions=2,
                  extra_conf={{"spark.driver.memory": "2g",
                               "spark.driver.extraJavaOptions":
                               "-Xms512m -XX:ReservedCodeCacheSize=128m"}})
cur = CurationStore(spark, f"{{root}}/cur", commit_mode=BC.MANIFEST,
                    compact_every=None, fenced=False)
ded = LSHSignatureStore(spark, f"{{root}}/ded", commit_mode=BC.MANIFEST,
                        compact_every=None, fenced=False)
pipe = PipelineIngest(spark, root, {{
    "curation": (cur, lambda df: df.select("doc_id", "lang", "text")),
    "dedup": ded,
}})
print("HEALED", pipe.heal())
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = script.format(repo=repo)
    p = subprocess.run([sys.executable, "-c", code, pipe.root],
                       capture_output=True, timeout=420)
    out = p.stdout.decode() + p.stderr.decode()
    assert p.returncode == 0 and "HEALED 1" in out, out
    assert cur.kept().count() == 8
    assert _member_docs(ded) == 8
    assert PC.pipeline_pending(pipe.root) == {}


def _stream_src(spark, tmp_path, n_files=3, per=4):
    """n_files parquet files of _docs rows, mtimes ascending so the
    file source triggers them in order (monotone doc_ids — the dedup
    store's ingest contract), one per micro-batch."""
    src = tmp_path / "in"
    src.mkdir()
    for i in range(n_files):
        part = _docs(spark, i * per, (i + 1) * per)
        tmp = src / f"tmp{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        data = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = str(src / f"{i:05d}.parquet")
        os.rename(str(tmp / data), dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)
    return str(src)


def _read_stream(spark, src):
    return (spark.readStream.schema(DOCS_DDL)
            .option("maxFilesPerTrigger", 1).parquet(src))


def test_drive_pipeline_stream_end_to_end(spark, tmp_path):
    from doreisa_spark.streaming.pipeline_commit import drive_pipeline

    pipe, cur, ded = _pipe(spark, tmp_path)
    src = _stream_src(spark, tmp_path)
    drive_pipeline(_read_stream(spark, src), pipe, timeout_sec=120)
    assert cur.kept().count() == 12
    assert _member_docs(ded) == 12
    assert PC.pipeline_pending(pipe.root) == {}


def test_drive_pipeline_crash_between_stores_then_restart(spark, tmp_path):
    """The full at-least-once story at pipeline scope: micro-batch 1's
    txn crashes BETWEEN member stores (curation applied, dedup not),
    killing the query before the offset write. The restarted drive
    redelivers batch 1 under the same id: commit's head-heal completes
    the pending txn from the staged payload, the redelivered id then
    no-ops, and the stream continues — both stores converge to exactly
    one copy of every batch."""
    from doreisa_spark.streaming.pipeline_commit import drive_pipeline

    pipe, cur, ded = _pipe(spark, tmp_path)
    src = _stream_src(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    fired = {"n": 0}

    def bomb_once(name):
        if fired["n"] == 0:
            fired["n"] = 1
            raise RuntimeError("induced crash between member stores")

    def arming(df, bid):
        pipe._after_sink_apply = bomb_once if bid == 1 else None
        pipe.commit(df, bid)

    from doreisa_spark.streaming.structured import run_foreach_batch

    try:
        run_foreach_batch(_read_stream(spark, src), arming,
                          timeout_sec=120, checkpoint=ckpt)
    except Exception:
        pass  # the query died mid-stream, offsets for batch 1 unwritten
    assert fired["n"] == 1
    assert set(PC.pipeline_pending(pipe.root)) == {1}  # skew window open
    # restart THROUGH THE PRODUCTION HELPER with fresh handles
    pipe2, cur2, ded2 = _pipe(spark, tmp_path)
    drive_pipeline(_read_stream(spark, src), pipe2, timeout_sec=120,
                   checkpoint=ckpt)
    assert cur2.kept().count() == 12        # exactly once, no double
    assert _member_docs(ded2) == 12         # the healed store caught up
    assert PC.pipeline_pending(pipe2.root) == {}


def test_join_view_fact_side_joins_a_pipeline(spark, tmp_path):
    """A join view's fact side participates via ``view.fact`` — the
    pipeline txn spans THREE stores; the view read reflects the batch
    only after the atomic commit."""
    from doreisa_spark.streaming.incremental_join import JoinedAggregateView

    root = str(tmp_path / "p3")
    cur = CurationStore(spark, f"{root}/cur", commit_mode=BC.MANIFEST,
                        compact_every=None, fenced=False)
    ded = LSHSignatureStore(spark, f"{root}/ded", commit_mode=BC.MANIFEST,
                            compact_every=None, fenced=False)
    view = JoinedAggregateView(
        spark, f"{root}/view", fk="lang", fact_keys=[],
        fact_aggs={"n_docs": ("count", None),
                   "chars": ("sum", "n_chars")},
        dim_key="lang", dim_cols=["lang_name"], dim_order_by="v",
        commit_mode=BC.MANIFEST, fenced=False)
    view.process_dim_batch(spark.createDataFrame(
        [("en", "english", 0)], "lang string, lang_name string, v int"))
    pipe = PipelineIngest(spark, root, {
        "curation": (cur, lambda df: df.select("doc_id", "lang", "text")),
        "dedup": ded,
        "facts": (view.fact, lambda df: df.select("lang", "n_chars")),
    })
    assert pipe.commit(_docs(spark, 0, 5))
    got = view.read().collect()
    assert len(got) == 1
    assert (got[0]["lang_name"], got[0]["n_docs"]) == ("english", 5)
    assert cur.kept().count() == 5 and _member_docs(ded) == 5
