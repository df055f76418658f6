"""Size-tiered (LSM) compaction contract (batch_commit.compact_tiered,
r8 verdict ask #1).

What must hold:
- content equivalence: tiered folding changes nothing any reader sees;
- bounded write amplification: streaming N batches with per-batch tiered
  compaction rewrites FAR fewer bytes than the full-rewrite policy
  (O(N log N) vs O(N^2) total) — asserted on measured byte accounting;
- tier structure: the live segment count stays bounded (no band ever
  holds >= fanout segments after a compaction returns);
- per-tier order_by sortedness survives merging (pruned probes' row-group
  locality);
- the crash-safety and replay guarantees of the full-fold path carry
  over (orphan invisibility, before= replay, horizon guard).
"""

from __future__ import annotations

import json
import os

import pytest

from doreisa_spark.streaming import batch_commit as BC

MODES = [BC.RENAME, BC.MANIFEST]


def _commit_range(spark, root, ids, mode, *, rows=300):
    for b in ids:
        df = spark.range(b * rows, (b + 1) * rows).selectExpr("id AS v")
        BC.commit_batch(df.coalesce(1), root, b, mode=mode)


def _vals(spark, root, mode):
    return sorted(
        r["v"] for r in BC.read_committed(spark, root, "v bigint", mode=mode).collect()
    )


def _manifest(root):
    with open(os.path.join(root, "_manifest.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("mode", MODES)
def test_tiered_preserves_content_and_ids(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    _commit_range(spark, root, range(8), mode, rows=50)
    before = _vals(spark, root, mode)
    stats = BC.compact_tiered(spark, root, "v bigint", keep_last=2, mode=mode,
                              band_base_bytes=1024)
    assert stats["steps"] >= 1 and stats["flushed_bytes"] > 0
    assert _vals(spark, root, mode) == before
    # batches 0..5 folded; 6,7 remain; folded ids stay committed
    assert BC.committed_ids(root, mode=mode) == [6, 7]
    assert BC.is_committed(root, 0, mode=mode)
    assert BC.next_batch_id(root, mode=mode) == 8
    # replay of the redeliverable tail still works; deeper raises
    assert BC.read_committed(spark, root, "v bigint", before=7, mode=mode).count() == 7 * 50
    with pytest.raises(ValueError, match="unsupported"):
        BC.read_committed(spark, root, "v bigint", before=5, mode=mode)


@pytest.mark.parametrize("mode", MODES)
def test_tiered_segment_count_bounded_and_bands_collapse(spark, tmp_path, mode):
    """Stream 24 batches with per-batch tiered compaction: the policy
    must keep merging bands up, so the live segment count stays small
    and no band holds >= fanout segments when a compaction returns."""
    import math

    root = str(tmp_path / "log")
    fanout, base = 3, 1024
    for b in range(24):
        _commit_range(spark, root, [b], mode, rows=300)
        BC.compact_tiered(spark, root, "v bigint", keep_last=1, mode=mode,
                          fanout=fanout, band_base_bytes=base)
    man = _manifest(root)
    sizes = man["segment_bytes"]
    assert len(man["segments"]) <= 8  # ~fanout-1 per band, a few bands
    bands = {}
    for s in man["segments"]:
        band = int(math.log(max(sizes[s], base) / base, fanout))
        bands.setdefault(band, []).append(s)
    assert all(len(v) < fanout for v in bands.values())
    assert _vals(spark, root, mode) == list(range(23 * 300 + 300))


def test_tiered_write_amplification_beats_full_rewrite(spark, tmp_path):
    """The r8 finding, measured: per-batch FULL compaction rewrites the
    whole store every time (total bytes O(N^2 * batch)); tiered rewrites
    each byte only as it climbs bands (O(N log N)). Assert the measured
    totals separate by a wide margin at N=20."""
    full_root = str(tmp_path / "full")
    tier_root = str(tmp_path / "tier")
    n = 20
    full_written = tier_written = 0
    for b in range(n):
        _commit_range(spark, full_root, [b], BC.RENAME, rows=300)
        _commit_range(spark, tier_root, [b], BC.RENAME, rows=300)
        seg_before = (
            set(_manifest(full_root)["segment_bytes"])
            if os.path.exists(os.path.join(full_root, "_manifest.json"))
            else set()
        )
        if BC.compact(spark, full_root, "v bigint", keep_last=1):
            man = _manifest(full_root)
            full_written += sum(
                sz for s, sz in man["segment_bytes"].items() if s not in seg_before
            )
        st = BC.compact_tiered(spark, tier_root, "v bigint", keep_last=1,
                               fanout=4, band_base_bytes=1024)
        tier_written += st["flushed_bytes"] + st["merged_bytes"]
    assert _vals(spark, full_root, BC.RENAME) == _vals(spark, tier_root, BC.RENAME)
    # full rewrite: ~sum(i) = N^2/2 batches of bytes; tiered: ~N log N.
    # Demand a >=2.5x separation (the asymptotic gap at N=20 is ~4x).
    assert tier_written * 2.5 < full_written, (tier_written, full_written)


@pytest.mark.parametrize("mode", MODES)
def test_tiered_order_by_keeps_each_tier_sorted(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    for b in range(11):
        df = spark.range(b * 100, (b + 1) * 100).selectExpr(
            "pmod(id * 2654435761, 100000) AS k", "id AS v"
        ).coalesce(1).sortWithinPartitions("k")
        BC.commit_batch(df, root, b, mode=mode)
        BC.compact_tiered(spark, root, "k bigint, v bigint",
                          keep_last=1, mode=mode, order_by=["k"],
                          fanout=3, band_base_bytes=1024)
    man = _manifest(root)
    assert len(man["segments"]) >= 2  # multiple tiers exist
    for seg in man["segments"]:
        ks = [
            r["k"]
            for r in spark.read.schema("k bigint, v bigint")
            .parquet(os.path.join(root, seg))
            .collect()
        ]
        assert ks == sorted(ks), f"tier {seg} lost its sort order"


@pytest.mark.parametrize("mode", MODES)
def test_tiered_orphans_invisible_and_reclaimed(spark, tmp_path, mode):
    root = str(tmp_path / "log")
    _commit_range(spark, root, range(6), mode, rows=50)
    BC.compact_tiered(spark, root, "v bigint", keep_last=2, mode=mode)
    before = _vals(spark, root, mode)
    # crashed merge attempt: a real-data segment the manifest never named
    orphan = os.path.join(root, "m000000000009_deadbeef")
    spark.createDataFrame([(10**9,)], "v bigint").write.mode("overwrite").parquet(orphan)
    os.utime(orphan, (1, 1))  # age past the GC grace window
    assert _vals(spark, root, mode) == before
    _commit_range(spark, root, [6], mode, rows=50)
    BC.compact_tiered(spark, root, "v bigint", keep_last=1, mode=mode)
    assert not os.path.isdir(orphan)
    assert _vals(spark, root, mode) == sorted(before + list(range(300, 350)))


def test_tiered_noop_cases(spark, tmp_path):
    root = str(tmp_path / "log")
    assert BC.compact_tiered(spark, root, "v bigint")["steps"] == 0
    _commit_range(spark, root, range(2), BC.RENAME, rows=10)
    st = BC.compact_tiered(spark, root, "v bigint", keep_last=2)
    assert st["steps"] == 0 and st["flushed_bytes"] == 0
    with pytest.raises(ValueError, match="keep_last"):
        BC.compact_tiered(spark, root, "v bigint", keep_last=0)
    with pytest.raises(ValueError, match="fanout"):
        BC.compact_tiered(spark, root, "v bigint", fanout=1)
