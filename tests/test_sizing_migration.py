"""Knob sizing helpers + store re-index migrations (r8 verdict ask #8).

Sizing is unit-tested against its closed-form models AND against a
built store's measured occupancy; each migration must produce a store
byte-equivalent (query-result-equivalent) to one freshly built at the
new knob from the same retained corpus, leave the old store untouched,
and resume streaming with correct batch ids.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doreisa_spark.streaming import sizing
from doreisa_spark.streaming.migrate import (
    migrate_ivf_store,
    migrate_lsh_signature_store,
    migrate_lsh_vector_store,
)

SF_SMALL = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- sizing


def test_planes_for_occupancy_model():
    assert sizing.planes_for_occupancy(50_000_000, 200) == 18
    assert sizing.planes_for_occupancy(256, 1) == 8
    assert sizing.planes_for_occupancy(100, 1000) == 1  # clamp low
    assert sizing.planes_for_occupancy(10**12, 1) == 30  # clamp high
    # monotone: more vectors or tighter occupancy never needs fewer planes
    assert sizing.planes_for_occupancy(10**7, 100) >= sizing.planes_for_occupancy(
        10**6, 100
    )
    with pytest.raises(ValueError):
        sizing.planes_for_occupancy(0, 10)
    with pytest.raises(ValueError):
        sizing.planes_for_occupancy(10, 0)


def test_planes_sizing_matches_built_store_occupancy(spark, tmp_path):
    """The occupancy model behind the helper, validated on a real store:
    mean bucket occupancy of the built index lands within 3x of the
    sizing target (hash uniformity over a small real corpus)."""
    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    n = e.count()
    target = 8
    planes = sizing.planes_for_occupancy(n, target)
    store = LSHVectorStore(spark, str(tmp_path / "s"), planes=planes)
    store.process_batch(e, 0)
    occ = store.members().groupBy("bucket").count()
    mean_occ = n / occ.count()
    assert mean_occ <= target * 3
    assert sizing.planes_for_occupancy(n, target * 2**10) < planes


def test_ivf_cells_for_occupancy():
    assert sizing.ivf_cells_for_occupancy(100_000, 6250) == 16
    assert sizing.ivf_cells_for_occupancy(10, 1000) == 1
    with pytest.raises(ValueError):
        sizing.ivf_cells_for_occupancy(0, 1)


def test_minhash_bands_for_targets():
    tau, noise = 0.8, 0.2
    bands, rows = sizing.minhash_bands_for(tau, min_recall=0.9,
                                           noise_sim=noise, max_noise_rate=0.05)
    p = sizing.minhash_candidate_prob
    assert p(tau, bands, rows) >= 0.9
    assert p(noise, bands, rows) <= 0.05
    # minimality: no cheaper (fewer perms) pair satisfies both
    for r in range(1, 9):
        for b in range(1, 65):
            if b * r < bands * rows:
                assert not (
                    p(tau, b, r) >= 0.9 and p(noise, b, r) <= 0.05
                ), f"cheaper ({b},{r}) satisfies both"
    # impossible targets raise loudly
    with pytest.raises(ValueError, match="widen"):
        sizing.minhash_bands_for(0.55, min_recall=0.999, noise_sim=0.5,
                                 max_noise_rate=0.0001)
    with pytest.raises(ValueError, match="noise_sim"):
        sizing.minhash_bands_for(0.3, noise_sim=0.5)


# --------------------------------------------------------------- migrations


def test_migrate_lsh_vector_store(spark, tmp_path):
    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    old = LSHVectorStore(spark, str(tmp_path / "old"))
    old.process_batch(e.where(F.col("vec_id") < 200), 0)
    old.process_batch(e.where(F.col("vec_id") >= 200), 1)
    old_rows = sorted(map(tuple, old.members().collect()))
    queries = [
        (r["vec_id"], r["embedding"])
        for r in e.where(F.col("vec_id") < 8).collect()
    ]
    new = migrate_lsh_vector_store(
        spark, str(tmp_path / "old"), str(tmp_path / "new"), planes=12
    )
    fresh = LSHVectorStore(spark, str(tmp_path / "fresh"), planes=12)
    fresh.process_batch(e, 0)
    assert sorted(map(tuple, new.members().collect())) == sorted(
        map(tuple, fresh.members().collect())
    )
    assert sorted(map(tuple, new.query_topk_vectors(queries, 5).collect())) == sorted(
        map(tuple, fresh.query_topk_vectors(queries, 5).collect())
    )
    # the old store is untouched; the new marker records the new knob
    assert sorted(map(tuple, old.members().collect())) == old_rows
    assert LSHVectorStore(spark, str(tmp_path / "new")).planes == 12
    # streaming resumes with the next batch id
    from doreisa_spark.streaming import batch_commit as BC

    assert BC.next_batch_id(new._members) == 1


def test_migrate_lsh_vector_store_purges_deleted(spark, tmp_path):
    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    old = LSHVectorStore(spark, str(tmp_path / "old"))
    old.process_batch(e, 0)
    old.delete_vectors([17, 23], 1)
    new = migrate_lsh_vector_store(
        spark, str(tmp_path / "old"), str(tmp_path / "new"), planes=10
    )
    # physically absent in the migrated store, not just filtered
    import glob

    raw = spark.read.parquet(
        *glob.glob(str(tmp_path / "new" / "members" / "b*"))
    )
    assert raw.where(F.col("vec_id").isin([17, 23])).count() == 0


def test_migrate_ivf_store(spark, tmp_path):
    from doreisa_spark.queries.similarity import _seed_centroids
    from doreisa_spark.streaming.incremental_ivf import IVFVectorStore

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cents = [(r["cell"], r["cemb"]) for r in _seed_centroids(e).collect()]
    old = IVFVectorStore(spark, str(tmp_path / "old"), centroids=cents)
    old.process_batch(e, 0)
    # retrained quantizer: shift every centroid (deterministic fake Lloyd)
    new_cents = [(c, [x * 0.5 + 0.1 for x in emb]) for c, emb in cents]
    new = migrate_ivf_store(
        spark, str(tmp_path / "old"), str(tmp_path / "new"), centroids=new_cents
    )
    fresh = IVFVectorStore(spark, str(tmp_path / "fresh"), centroids=new_cents)
    fresh.process_batch(e, 0, assign="blas")
    assert sorted(
        (r["cell"], r["vec_id"]) for r in new.members().select("cell", "vec_id").collect()
    ) == sorted(
        (r["cell"], r["vec_id"]) for r in fresh.members().select("cell", "vec_id").collect()
    )
    queries = [
        (r["vec_id"], r["embedding"]) for r in e.where(F.col("vec_id") < 8).collect()
    ]
    assert sorted(map(tuple, new.query_topk_vectors(queries, 5, nprobe=2).collect())) \
        == sorted(map(tuple, fresh.query_topk_vectors(queries, 5, nprobe=2).collect()))


def test_migrate_dedup_store_rebands(spark, tmp_path):
    from doreisa_spark.streaming.incremental_dedup import PrunedLSHSignatureStore

    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    b1 = d.where(F.col("doc_id") < 200)
    b2 = d.where(F.col("doc_id") >= 200)
    old = PrunedLSHSignatureStore(spark, str(tmp_path / "old"))
    old.process_batch(b1, 0)
    old.process_batch(b2, 1)
    old_pairs = sorted(map(tuple, old.pairs().collect()))
    new = migrate_lsh_signature_store(
        spark, str(tmp_path / "old"), str(tmp_path / "new"),
        n_bands=4, band_rows=3,
    )
    # members == a fresh store at the new banding fed the same corpus
    # (cap never binds on this corpus, so retention is total)
    fresh = PrunedLSHSignatureStore(
        spark, str(tmp_path / "fresh"), n_bands=4, band_rows=3
    )
    fresh.process_batch(b1, 0)
    fresh.process_batch(b2, 1)
    assert sorted(map(tuple, new.members().collect())) == sorted(
        map(tuple, fresh.members().collect())
    )
    assert sorted(
        (r["doc_id"], tuple(r["shingles"])) for r in new.shingles().collect()
    ) == sorted(
        (r["doc_id"], tuple(r["shingles"])) for r in fresh.shingles().collect()
    )
    # verified pairs are banding-independent truth: copied verbatim
    assert sorted(map(tuple, new.pairs().collect())) == old_pairs
    # the new store keeps streaming: next batch admits + verifies against
    # the migrated members under the new banding
    clone = b1.limit(1).withColumn("doc_id", F.lit(10**6).cast("bigint"))
    new.process_batch(clone, 1)
    assert any(
        r["doc_b"] == 10**6 for r in new.pairs().collect()
    ), "re-ingested duplicate must pair against migrated members"
    # knob marker recorded; a default-knob writer is refused
    with pytest.raises(ValueError, match="bands"):
        PrunedLSHSignatureStore(spark, str(tmp_path / "new"), n_bands=4,
                                band_rows=2)
