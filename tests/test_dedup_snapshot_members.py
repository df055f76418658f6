"""Full-state dedup-store snapshots (r11 verdict ask #4):
``LSHSignatureStore.snapshot(pin_members=True)`` pins the members AND
shingles sub-logs under the same handle as the pairs pin, so a re-band
migration (or audit re-derivation) can run FROM THE PIN exactly like
the IVF retrain does — a takedown landing between pin and migrate does
NOT change the migrated result. The pairs-only default stays the cheap
served-artifact mode and refuses pinned members/shingles reads with a
pointed message.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.incremental_dedup import PrunedLSHSignatureStore
from doreisa_spark.streaming.migrate import migrate_lsh_signature_store

SF_SMALL = "/root/testdata/sf0.001"


def _store(spark, tmp_path, name="old"):
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    store = PrunedLSHSignatureStore(spark, str(tmp_path / name))
    store.process_batch(d.where(F.col("doc_id") < 200), 0)
    store.process_batch(d.where(F.col("doc_id") >= 200), 1)
    return store


def _mtuples(df):
    return sorted(map(tuple, df.collect()))


def _stuples(df):
    return sorted((r["doc_id"], tuple(r["shingles"])) for r in df.collect())


def test_migrate_from_pin_isolated_from_takedown(spark, tmp_path):
    old = _store(spark, tmp_path)
    sid = old.snapshot(pin_members=True)

    # expected: migrate from the pin BEFORE any takedown
    r1 = migrate_lsh_signature_store(
        spark, old.root, str(tmp_path / "new1"),
        n_bands=4, band_rows=3, snapshot=sid,
    )
    m1, s1, p1 = (_mtuples(r1.members()), _stuples(r1.shingles()),
                  _mtuples(r1.pairs()))

    # a takedown lands between pin and (re)migration — pick a doc that
    # actually has state in every log
    victim = int(old.members().limit(1).collect()[0]["doc_id"])
    old.delete_docs([victim])
    assert victim not in {r["doc_id"] for r in old.members().collect()}

    # migrating FROM THE PIN again: byte-identical result — the
    # takedown is invisible to the pinned cut
    r2 = migrate_lsh_signature_store(
        spark, old.root, str(tmp_path / "new2"),
        n_bands=4, band_rows=3, snapshot=sid,
    )
    assert _mtuples(r2.members()) == m1
    assert _stuples(r2.shingles()) == s1
    assert _mtuples(r2.pairs()) == p1
    assert any(t[2] == victim for t in m1), "victim must be in the pinned cut"

    # a LIVE migration (no pin) reflects the takedown — the contrast
    # that makes the pin meaningful
    r3 = migrate_lsh_signature_store(
        spark, old.root, str(tmp_path / "new3"), n_bands=4, band_rows=3,
    )
    assert victim not in {t[2] for t in _mtuples(r3.members())}

    # dropping the handle releases all three pins
    assert old.drop_snapshot(sid)
    assert BC.list_snapshots(old.pairs_dir) == {}
    assert BC.list_snapshots(old.members_dir) == {}
    assert BC.list_snapshots(old.shingles_dir) == {}


def test_pairs_only_default_refuses_pinned_member_reads(spark, tmp_path):
    old = _store(spark, tmp_path)
    sid = old.snapshot()  # the cheap served-artifact default
    assert old.pairs(snapshot=sid).count() == old.pairs().count()
    with pytest.raises(ValueError, match="pin_members=True"):
        old.members(snapshot=sid)
    with pytest.raises(ValueError, match="pin_members=True"):
        old.shingles(snapshot=sid)
    with pytest.raises(ValueError, match="pin_members=True"):
        migrate_lsh_signature_store(
            spark, old.root, str(tmp_path / "new"),
            n_bands=4, band_rows=3, snapshot=sid,
        )
    # members/shingles logs carry NO pin under the default
    assert BC.list_snapshots(old.members_dir) == {}
    assert BC.list_snapshots(old.shingles_dir) == {}
    assert old.drop_snapshot(sid)


def test_pin_members_failure_releases_sublog_pins(spark, tmp_path, monkeypatch):
    """If the final pairs pin fails (e.g. a fenced-out writer), the
    already-taken members/shingles pins must be released — a stranded
    pin with no composite handle would GC-protect bytes forever and
    block takedown propagation (r12 review finding)."""
    old = _store(spark, tmp_path)
    real = BC.create_snapshot

    def failing(root, **kw):
        if root == old.pairs_dir:
            raise BC.StaleWriterError("superseded")
        return real(root, **kw)

    monkeypatch.setattr(BC, "create_snapshot", failing)
    with pytest.raises(BC.StaleWriterError):
        old.snapshot(pin_members=True)
    monkeypatch.setattr(BC, "create_snapshot", real)
    assert BC.list_snapshots(old.members_dir) == {}
    assert BC.list_snapshots(old.shingles_dir) == {}
    assert BC.list_snapshots(old.pairs_dir) == {}


def test_expire_releases_linked_sublog_pins(spark, tmp_path):
    """Store-level expire_snapshots must release the members/shingles
    pins linked into expired pin_members handles — the root-level
    expire on the pairs log alone would strand them."""
    old = _store(spark, tmp_path)
    s1 = old.snapshot(pin_members=True)
    s2 = old.snapshot(pin_members=True)
    s3 = old.snapshot()  # pairs-only
    assert len(BC.list_snapshots(old.members_dir)) == 2
    dropped = old.expire_snapshots(keep_last=1)
    assert dropped == [s1, s2]
    # the kept handle is the newest (pairs-only) pin; every linked
    # sub-log pin of the expired composite handles is released
    assert sorted(BC.list_snapshots(old.pairs_dir)) == [s3]
    assert BC.list_snapshots(old.members_dir) == {}
    assert BC.list_snapshots(old.shingles_dir) == {}


def test_pinned_members_survive_compaction_and_deletes(spark, tmp_path):
    """The pinned members/shingles state is immutable under later
    ingest + takedown + compaction, like every commit-layer pin."""
    old = _store(spark, tmp_path)
    sid = old.snapshot(pin_members=True)
    m0, s0 = _mtuples(old.members(snapshot=sid)), _stuples(old.shingles(snapshot=sid))
    victim = int(old.members().limit(1).collect()[0]["doc_id"])
    old.delete_docs([victim])
    BC.compact(spark, old.members_dir, "band_id int, sig string, doc_id bigint",
               keep_last=1, mode=old.commit_mode,
               epoch=old._epochs[old.members_dir])
    assert _mtuples(old.members(snapshot=sid)) == m0
    assert _stuples(old.shingles(snapshot=sid)) == s0
    old.drop_snapshot(sid)
