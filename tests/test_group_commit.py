"""Cross-log transactional commits (r13 verdict ask #3).

A multi-root store's logical batch (dedup: members+shingles+pairs;
curation: seen+kept) commits ATOMICALLY through the primary log's
manifest transaction (batch_commit.commit_batch_group — the Percolator
primary-row pattern): secondaries roll forward idempotently
(heal_txn_group), GC treats pending-txn dirs as live, and shared
writers serialize by optimistic id allocation — a group commit lands
only if its id is still free at the primary publish, so the loser
recomputes against the new state under a fresh id.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_curation import CurationStore
from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore

DOCS_DDL = ("doc_id bigint, text string, lang string, source string, "
            "n_chars bigint")


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows], DOCS_DDL)


# --------------------------------------------------- primitive contracts

def test_group_commit_atomic_and_redelivery(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df1 = spark.range(5).select(F.col("id").alias("k"))
    df2 = spark.range(3).select(F.col("id").alias("v"))
    assert BC.commit_batch_group({a: df1, b: df2}, a, 0)
    assert not BC.commit_batch_group({a: df1, b: df2}, a, 0)  # redelivery
    assert BC.read_committed(spark, a, "k bigint", mode=BC.MANIFEST).count() == 5
    assert BC.read_committed(spark, b, "v bigint", mode=BC.MANIFEST).count() == 3
    assert BC.group_pending(a) == {}


def test_crash_window_heals_from_any_handle(spark, tmp_path):
    """Simulate the crash between the primary publish and the
    roll-forward: the secondary manifest lags; heal_txn_group completes
    it and clears the txn record."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = spark.range(4).select(F.col("id").alias("k"))
    assert BC.commit_batch_group({a: df, b: df}, a, 0)
    dn = BC._manifest_load(b)["batches"]["0"]
    BC._manifest_update(b, lambda cur: {**cur, "batches": {}})
    BC._manifest_update(
        a, lambda cur: {**cur, "txns": {"0": {"b": dn}}})
    assert BC.read_committed(spark, b, "k bigint",
                             mode=BC.MANIFEST).count() == 0  # lagging
    assert BC.heal_txn_group(a) == 1
    assert BC.read_committed(spark, b, "k bigint",
                             mode=BC.MANIFEST).count() == 4
    assert BC.group_pending(a) == {}


def test_gc_keeps_pending_secondary_dirs_alive(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = spark.range(4).select(F.col("id").alias("k"))
    assert BC.commit_batch_group({a: df, b: df}, a, 0)
    dn = BC._manifest_load(b)["batches"]["0"]
    BC._manifest_update(b, lambda cur: {**cur, "batches": {}})
    BC._manifest_update(a, lambda cur: {**cur, "txns": {"0": {"b": dn}}})
    # even AGED far past the orphan grace, the pending dir is live via
    # the secondary's group_primary pointer
    os.utime(os.path.join(b, dn), (1.0, 1.0))
    BC._gc(b, BC._manifest_load(b))
    assert os.path.isdir(os.path.join(b, dn))
    BC.heal_txn_group(a)
    assert BC.read_committed(spark, b, "k bigint",
                             mode=BC.MANIFEST).count() == 4


def test_group_txn_state_survives_compaction_flip(spark, tmp_path):
    """txns / group_primary are _CARRIED_KEYS: a compaction's wholesale
    manifest flip on either log must not drop them."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = spark.range(4).select(F.col("id").alias("k"))
    for i in range(4):
        assert BC.commit_batch_group(
            {a: df.withColumn("k", F.col("k") + i * 10), b: df}, a, i)
    dn = BC._manifest_load(b)["batches"]["3"]
    BC._manifest_update(
        b, lambda cur: {**cur,
                        "batches": {k: v for k, v in cur["batches"].items()
                                    if k != "3"}})
    BC._manifest_update(a, lambda cur: {**cur, "txns": {"3": {"b": dn}}})
    BC.compact_tiered(spark, a, "k bigint", keep_last=2, mode=BC.MANIFEST)
    BC.compact_tiered(spark, b, "k bigint", keep_last=2, mode=BC.MANIFEST)
    assert BC.group_pending(a) == {3: {"b": dn}}  # carried through flips
    assert BC._manifest_load(b).get("group_primary")
    assert BC.heal_txn_group(a) == 1
    assert BC.read_committed(spark, b, "k bigint",
                             mode=BC.MANIFEST).count() == 16


# --------------------------------------------------- dedup store (3 logs)

def _near_dups(writer: int, i: int):
    """Two near-dup docs per batch. Every TOKEN is unique to the
    (writer, segment), so word-3-gram shingle sets are fully disjoint
    across batches/writers (zero cross-pair Jaccard) and the expected
    pairs are order-independent under concurrency; within the pair the
    one-token suffix keeps Jaccard ~0.9."""
    base = writer * 10_000 + i * 10
    t = " ".join(f"uw{writer}s{i}t{j}" for j in range(12))
    return [(base, t), (base + 1, t + f" uw{writer}s{i}x")]


def test_dedup_store_group_commit_crash_heals(spark, tmp_path):
    root = str(tmp_path / "ded")
    st = LSHSignatureStore(spark, root, commit_mode=BC.MANIFEST,
                           compact_every=None)
    st.process_batch(_docs(spark, _near_dups(1, 0)), 0)
    assert st.pairs().count() == 1
    # un-roll the pairs secondary (the crash window), then read through
    # a FRESH handle: the read-side heal must serve the committed pair
    dn = BC._manifest_load(st.pairs_dir)["batches"]["0"]
    BC._manifest_update(st.pairs_dir, lambda cur: {**cur, "batches": {}})
    BC._manifest_update(
        st.members_dir, lambda cur: {**cur, "txns": {"0": {"pairs": dn}}})
    st2 = LSHSignatureStore(spark, root, commit_mode=BC.MANIFEST,
                            compact_every=None, fenced=False)
    assert st2.pairs().count() == 1
    assert BC.group_pending(st.members_dir) == {}


def test_two_shared_dedup_writers_lose_nothing(spark, tmp_path):
    """The r13 'Done =' shape: two ingest pipelines share ONE dedup
    store as shared writers — every batch's pairs/members/shingles land
    exactly once; the pairs equal the union of each writer's own
    near-dup pairs (shingle-disjoint across writers, so the expectation
    is arrival-order independent)."""
    root = str(tmp_path / "shared")
    n_each = 4
    s1 = LSHSignatureStore(spark, root, commit_mode=BC.MANIFEST,
                           fenced="shared", compact_every=None)
    s1.process_batch(_docs(spark, _near_dups(1, 0)))
    s2 = LSHSignatureStore(spark, root, commit_mode=BC.MANIFEST,
                           fenced="shared", compact_every=None)
    start = threading.Barrier(2)
    errs: list = []

    def loop(store, writer, lo):
        try:
            start.wait()
            for i in range(lo, n_each):
                store.process_batch(_docs(spark, _near_dups(writer, i)))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=loop, args=(s1, 1, 1))
    t2 = threading.Thread(target=loop, args=(s2, 2, 0))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    exp_pairs = {
        (w * 10_000 + i * 10, w * 10_000 + i * 10 + 1)
        for w in (1, 2) for i in range(n_each)
    }
    got = {(r["doc_a"], r["doc_b"]) for r in s1.pairs().collect()}
    assert got == exp_pairs
    # 2*n_each distinct ids, all three logs in step after heals
    ids = BC.committed_ids(s1.members_dir, mode=BC.MANIFEST)
    assert len(ids) == 2 * n_each and len(set(ids)) == len(ids)
    assert BC.committed_ids(s1.pairs_dir, mode=BC.MANIFEST) == ids
    assert BC.committed_ids(s1.shingles_dir, mode=BC.MANIFEST) == ids


def test_hard_fence_still_stops_shared_dedup_writers(spark, tmp_path):
    root = str(tmp_path / "fence")
    s1 = LSHSignatureStore(spark, root, commit_mode=BC.MANIFEST,
                           fenced="shared", compact_every=None)
    s1.process_batch(_docs(spark, _near_dups(1, 0)))
    s2 = LSHSignatureStore(spark, root, commit_mode=BC.MANIFEST,
                           fenced="shared", compact_every=None)
    s2.process_batch(_docs(spark, _near_dups(2, 0)))
    # what a re-band migration / alias flip does: exclusive acquire
    BC.acquire_writer(f"{root}/members", mode=BC.MANIFEST)
    with pytest.raises(BC.StaleWriterError):
        s1.process_batch(_docs(spark, _near_dups(1, 1)))
    with pytest.raises(BC.StaleWriterError):
        s2.process_batch(_docs(spark, _near_dups(2, 1)))


def test_shared_dedup_writers_across_processes(spark, tmp_path):
    """Two OS PROCESSES (real flock semantics) ingest one dedup store
    concurrently as shared writers — no lost or double batch."""
    import subprocess
    import sys

    root = str(tmp_path / "xproc")
    st = LSHSignatureStore(spark, root, commit_mode=BC.MANIFEST,
                           fenced="shared", compact_every=None)
    st.process_batch(_docs(spark, _near_dups(1, 0)))

    script = r"""
import sys
sys.path.insert(0, {repo!r})
from doreisa_spark.session import get_spark
from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore

writer = int(sys.argv[1]); root = sys.argv[2]
spark = get_spark(f"gxproc-w{{writer}}", cpus=2, shuffle_partitions=2,
                  extra_conf={{"spark.driver.memory": "2g",
                               "spark.driver.extraJavaOptions":
                               "-Xms512m -XX:ReservedCodeCacheSize=128m"}})
st = LSHSignatureStore(spark, root, commit_mode=BC.MANIFEST,
                       fenced="shared", compact_every=None)
for i in range(0 if writer == 2 else 1, 3):
    base = writer * 10_000 + i * 10
    t = " ".join(f"uw{{writer}}s{{i}}t{{j}}" for j in range(12))
    docs = spark.createDataFrame(
        [(base, t, "en", "web", len(t)),
         (base + 1, t + f" uw{{writer}}s{{i}}x", "en", "web", len(t) + 10)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint")
    st.process_batch(docs)
print("DONE", writer)
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = script.format(repo=repo)
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(w), root],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for w in (1, 2)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    exp_pairs = {(w * 10_000 + i * 10, w * 10_000 + i * 10 + 1)
                 for w in (1, 2) for i in range(3)}
    got = {(r["doc_a"], r["doc_b"]) for r in st.pairs().collect()}
    assert got == exp_pairs
    ids = BC.committed_ids(st.members_dir, mode=BC.MANIFEST)
    assert len(ids) == 6 and len(set(ids)) == 6


# --------------------------------------------------- curation (2 logs)

def test_shared_curation_writers_admit_each_fp_once(spark, tmp_path):
    """THE serializability test: two shared writers ingest OVERLAPPING
    content; the fingerprint-admission invariant (each distinct text
    kept exactly once, whoever wins) must hold under every interleave —
    an allocation-race loser recomputes its admission against the
    winner's committed seen-set."""
    root = str(tmp_path / "cur")
    # >= 20 tokens with a sane stopword ratio: passes quality_filter
    texts = [f"the shared corpus document number {i} is about the usual "
             f"topic and it has enough words to pass the quality gate "
             f"easily with margin to spare {i}"
             for i in range(12)]

    def batch(writer, lo, hi):
        return spark.createDataFrame(
            [(writer * 1000 + j, "en", texts[j]) for j in range(lo, hi)],
            "doc_id bigint, lang string, text string")

    c1 = CurationStore(spark, root, commit_mode=BC.MANIFEST,
                       fenced="shared", compact_every=None)
    c1.process_batch(batch(1, 0, 4))
    c2 = CurationStore(spark, root, commit_mode=BC.MANIFEST,
                       fenced="shared", compact_every=None)
    start = threading.Barrier(2)
    errs: list = []

    def loop(store, writer, ranges):
        try:
            start.wait()
            for lo, hi in ranges:
                store.process_batch(batch(writer, lo, hi))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    # overlapping slices: [0,8) from writer 1 vs [4,12) from writer 2
    t1 = threading.Thread(target=loop, args=(c1, 1, [(4, 8)]))
    t2 = threading.Thread(target=loop, args=(c2, 2, [(4, 10), (10, 12)]))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    # kept rows are (doc_id, lang, n_tokens); doc_id % 1000 recovers
    # which TEXT a row is (text j was offered as 1000+j and/or 2000+j)
    ids = [r["doc_id"] for r in c1.kept().collect()]
    assert len(ids) == 12, sorted(ids)              # each text ONCE
    assert {d % 1000 for d in ids} == set(range(12))  # every text
    # seen log and kept log agree batch-for-batch
    assert (BC.committed_ids(f"{root}/seen", mode=BC.MANIFEST)
            == BC.committed_ids(f"{root}/kept", mode=BC.MANIFEST))


def test_crash_injection_at_every_mutation_point(spark, tmp_path,
                                                 monkeypatch):
    """Kill commit_batch_group at the 1st, 2nd, 3rd ... manifest
    mutation (primary publish, secondary roll-forwards, txn clear) —
    after every crash the store must read CONSISTENTLY (the batch is
    visible in all logs or none, modulo a heal) and a retry must land
    the batch exactly once."""
    df = spark.range(6).select(F.col("id").alias("k"))
    real_update = BC._manifest_update
    for crash_at in (1, 2, 3, 4):
        a = str(tmp_path / f"a{crash_at}")
        b = str(tmp_path / f"b{crash_at}")
        c = str(tmp_path / f"c{crash_at}")
        calls = {"n": 0}

        def bomb(root, mutate, **kw):
            calls["n"] += 1
            if calls["n"] == crash_at:
                raise RuntimeError(f"induced crash at mutation {crash_at}")
            return real_update(root, mutate, **kw)

        monkeypatch.setattr(BC, "_manifest_update", bomb)
        crashed = False
        try:
            BC.commit_batch_group({a: df, b: df, c: df}, a, 0)
        except RuntimeError:
            crashed = True
        monkeypatch.undo()
        # consistency after the crash: primary committed => heal makes
        # every log serve the batch; primary not committed => no log
        # serves anything
        BC.heal_txn_group(a)
        counts = [
            BC.read_committed(spark, r, "k bigint", mode=BC.MANIFEST).count()
            if BC._manifest_load(r) else 0
            for r in (a, b, c)
        ]
        if BC.is_committed(a, 0, mode=BC.MANIFEST):
            assert counts == [6, 6, 6], (crash_at, counts)
        else:
            assert counts == [0, 0, 0], (crash_at, counts)
        # the retry (redelivery or fresh commit) converges to exactly once
        BC.commit_batch_group({a: df, b: df, c: df}, a, 0)
        BC.heal_txn_group(a)
        assert [
            BC.read_committed(spark, r, "k bigint",
                              mode=BC.MANIFEST).count()
            for r in (a, b, c)
        ] == [6, 6, 6], (crash_at, "after retry")
        assert BC.group_pending(a) == {}
        if not crashed:
            break  # ran out of mutation points: later crash_at are no-ops


def test_concurrent_insert_and_retract_shared_writers(spark, tmp_path):
    """One shared writer streams inserts while another streams CDC
    deletes of already-inserted slices — the view must equal the
    one-pass aggregate over the surviving rows (the commit layer
    serializes; signed partials commute)."""
    import threading

    from doreisa_spark.streaming.incremental_agg import AggregateStore

    root = str(tmp_path / "ir")
    rows = spark.range(240).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 0.5).alias("v"),
        F.col("id"))

    def mk():
        return AggregateStore(
            spark, root, key_cols=["k"], retractable=True,
            commit_mode=BC.MANIFEST, fenced="shared",
            aggs={"cnt": ("count", None), "sum_v": ("sum", "v")})

    w1 = mk()
    w1.process_batch(rows.where("id < 40").drop("id"))
    w2 = mk()
    start = threading.Barrier(2)
    errs: list = []

    def inserts():
        try:
            start.wait()
            for lo in range(40, 240, 40):
                w1.process_batch(
                    rows.where(f"id >= {lo} and id < {lo + 40}").drop("id"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def deletes():
        try:
            start.wait()
            # delete slices of the FIRST batch only (contract: already
            # inserted) — out-of-order vs w1's concurrent inserts
            for m in range(4):
                w2.process_retract_batch(
                    rows.where(f"id < 40 and id % 4 = {m}").drop("id"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=inserts)
    t2 = threading.Thread(target=deletes)
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    exp = {
        (r["k"], r["cnt"], round(r["sum_v"], 6))
        for r in rows.where("id >= 40").groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sum_v")).collect()
    }
    got = {(r["k"], r["cnt"], round(r["sum_v"], 6))
           for r in w1.read().collect()}
    assert got == exp
    assert w1.unmatched_retractions().count() == 0
