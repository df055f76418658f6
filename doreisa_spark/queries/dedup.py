"""Deduplication operators over the documents table — a first-class
training-data-pipeline capability.

- exact dedup: hash-groupBy on content (or a content fingerprint).
- n-gram Jaccard near-dup: blocked self-join + exact set similarity.
- MinHash+LSH near-dup: shingle → minhash signature → band buckets →
  candidate join → exact-Jaccard verification. The oracle runs the SAME
  deterministic algorithm in DuckDB (shared constants in operators/text.py),
  so the comparison checks the full pipeline, not just its happy path.
- SimHash signatures + near-dup pairs by Hamming distance.

Scale posture (100 TB): exact dedup and fingerprinting are single-shuffle
hash aggregates; LSH turns the O(n²) similarity join into per-bucket joins
(shuffle on band signature); the blocked Jaccard join exists as the exact
verifier and for modest blocks only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from doreisa_spark.catalog import column_minmax, table
from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.lifecycle import checkpoint, scoped_persist
from doreisa_spark.operators import text as TX
from doreisa_spark.operators import vectors as V
from doreisa_spark.registry import register

# Scratch root for the incremental-store entries: per-invocation stores
# must be FRESH (idempotent gate runs) but not LEAKED — every store lands
# under one session dir removed at interpreter exit. Created LAZILY on
# first use (ADVICE r6): importing the queries package must not have a
# filesystem side effect for sessions that never touch incremental stores.
import atexit as _atexit
import shutil as _shutil
import tempfile as _tempfile

_STORE_TMP: "str | None" = None


def _fresh_store_dir(tag: str) -> str:
    global _STORE_TMP
    if _STORE_TMP is None:
        _STORE_TMP = _tempfile.mkdtemp(prefix="doreisa_stores_")
        _atexit.register(_shutil.rmtree, _STORE_TMP, ignore_errors=True)
    return _tempfile.mkdtemp(prefix=tag + "_", dir=_STORE_TMP)



@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS fingerprint,
       count(*) AS n_copies,
       min(doc_id) AS keeper_doc_id
FROM documents
GROUP BY md5(text)
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct content,
    keeping the smallest doc_id. The shuffle key is the 128-bit md5, not
    the document body — at 100 TB only fingerprints move."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.col("text").cast("binary"))
    return d.groupBy(fp.alias("fingerprint")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


@register(
    "dedup_exact_keep_first", extended=True,
    oracle="""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
  FROM documents
)
WHERE rn = 1
""",
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-based dedup keeping a deterministic representative per
    (lang, source) — the `dropDuplicates` semantics made deterministic via
    window rank (dropDuplicates itself keeps an arbitrary row)."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents")
    w = W.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


_NGRAM_TAU = 0.12


@register(
    "dedup_ngram_jaccard", extended=True,
    oracle=f"""
WITH sh AS (
  SELECT doc_id, lang, {TX.duck_shingles('text', 3)} AS shingles FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round({TX.duck_jaccard('a.shingles', 'b.shingles')}, 6) AS jaccard
FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE {TX.duck_jaccard('a.shingles', 'b.shingles')} >= {_NGRAM_TAU}
""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact word-3-gram Jaccard, blocked by lang.

    Jaccard is an integer ratio → bit-identical across engines. The lang
    blocking bounds the self-join; at 100 TB use dedup_minhash_lsh instead
    (this operator is its exact verifier)."""
    d = table(spark, sf_dir, "documents", spread=True)
    sh = d.select("doc_id", "lang", F.expr(TX.shingles_expr("text", 3)).alias("shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    jac = F.expr(TX.jaccard_expr("a.shingles", "b.shingles"))
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .where(jac >= _NGRAM_TAU)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


# Degenerate-bucket guard: a signature shared by huge numbers of documents
# (empty/boilerplate text) would otherwise make one bucket's pair fan-out
# quadratic. Both engines keep the MAX_BUCKET smallest doc_ids per bucket,
# so the candidate sets still agree exactly. 64 is ~6x the largest bucket
# observed at sf0.1; overflow means near-identical boilerplate, where the
# kept 64 still link the duplicate cluster transitively.
_MAX_BUCKET = 64


def minhash_signature_frame(
    d: DataFrame,
    n_bands: int = TX.N_BANDS,
    band_rows: int = TX.BAND_ROWS,
) -> DataFrame:
    """(doc_id, shingles, band_sigs) for a documents frame — the shared
    signature pass of batch `dedup_minhash_lsh` and the streaming
    incremental store (streaming/incremental_dedup.py): distinct word
    3-gram shingles, K = n_bands×band_rows affine minhashes over one
    md5-derived 28-bit hash per shingle, banded into n_bands
    '-'-joined signature strings. One fused JVM expression pipeline,
    no Python. The default (4×2) is the DuckDB-oracle-tied setting;
    other shapes draw prefix-stable extended perms from
    TX.minhash_params (the deployment's recall/precision knob —
    candidate probability 1-(1-s^rows)^bands)."""
    return signatures_from_shingles(
        d.select("doc_id", F.expr(TX.shingles_expr("text", 3)).alias("shingles")),
        n_bands,
        band_rows,
    )


def signatures_from_shingles(
    sh: DataFrame, n_bands: int = TX.N_BANDS, band_rows: int = TX.BAND_ROWS
) -> DataFrame:
    """The banding half of minhash_signature_frame, from an existing
    (doc_id, shingles) frame — shared with the store re-band migration
    (streaming/migrate.py), which re-derives band signatures from the
    RETAINED shingle log instead of the original text."""
    band_sigs = F.array(
        *[
            F.concat_ws(
                "-",
                *[
                    F.expr(
                        TX.minhash_from_hashes_expr(
                            "hashes", band * band_rows + r
                        )
                    )
                    for r in range(band_rows)
                ],
            )
            for band in range(n_bands)
        ]
    )
    return (
        sh.withColumn("hashes", F.expr(TX.hashes_expr("shingles")))
        .select("doc_id", "shingles", band_sigs.alias("band_sigs"))
    )


def _lsh_oracle() -> str:
    """DuckDB SQL running the identical minhash-LSH pipeline."""
    mh_cols = ",\n         ".join(
        f"{TX.duck_minhash('shingles', k)} AS mh{k}" for k in range(TX.N_BANDS * TX.BAND_ROWS)
    )
    band_selects = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {band} AS band_id, "
        f"concat(mh{band * TX.BAND_ROWS}, '-', mh{band * TX.BAND_ROWS + 1}) AS sig FROM mh"
        for band in range(TX.N_BANDS)
    )
    return f"""
WITH sh AS (
  SELECT doc_id, {TX.duck_shingles('text', 3)} AS shingles FROM documents
), mh AS (
  SELECT doc_id, shingles,
         {mh_cols}
  FROM sh
), bands AS (
  {band_selects}
), capped AS (
  SELECT doc_id, band_id, sig FROM bands
  QUALIFY row_number() OVER (PARTITION BY band_id, sig ORDER BY doc_id) <= {_MAX_BUCKET}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b ON a.band_id = b.band_id AND a.sig = b.sig
  WHERE a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round({TX.duck_jaccard('sa.shingles', 'sb.shingles')}, 6) AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.doc_a
JOIN sh sb ON sb.doc_id = c.doc_b
WHERE {TX.duck_jaccard('sa.shingles', 'sb.shingles')} >= {_NGRAM_TAU}
"""


@register("dedup_minhash_lsh", oracle=_lsh_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection, fully deterministic.

    Pipeline: distinct word-3-gram shingles → K=8 affine minhashes over a
    28-bit md5-derived hash (constants in operators/text.py) → 4 bands of 2
    → explode to (band_id, signature) → self-join per bucket → exact-Jaccard
    verification at τ=0.12. The DuckDB oracle executes the same algorithm.

    100 TB posture: the band join shuffles on (band_id, sig) — candidate
    generation is linear in collisions, never O(n²); the verify join only
    re-reads the candidate docs' shingle arrays.
    """
    d = table(spark, sf_dir, "documents", spread=True)
    # ONE pass computes shingles, per-shingle hashes (single md5 each), all
    # K minhashes, and the band signature array; persisted so the candidate
    # and verification stages never re-run the text pipeline.
    # scoped_persist: long-lived sessions wrap invocations in
    # lifecycle.cache_scope() to release this cache deterministically
    sig = scoped_persist(minhash_signature_frame(d))
    # EAGER materialization: three downstream subtrees (bands, verify-a,
    # verify-b) read this cache, and AQE launches them concurrently — on a
    # lazy persist their ~3×32 tasks convoy on the same uncomputed cache
    # partitions (measured 20-45 s vs ~3 s; block-lock waits, not compute).
    # The count runs on a DRIVER THREAD so the materialization job overlaps
    # the ~0.2 s of py4j plan construction below (guide §2.6 — actions are
    # only sequential because the driver calls them sequentially); the join
    # before return keeps the eager contract: the cache is fully built
    # before any consumer can execute.
    from threading import Thread

    count_err: list[BaseException] = []

    def _materialize() -> None:
        try:
            sig.count()
        except BaseException as e:  # re-raised on the caller below
            count_err.append(e)

    count_thread = Thread(target=_materialize, name="sig-materialize")
    count_thread.start()
    # candidate generation: explode to (band_id, sig), bucket by groupBy,
    # emit ordered in-bucket pairs — one shuffle of (long, int, string)
    # rows, never a self-join (no O(n²) and no pipeline re-execution).
    # The collect_list is bounded: ranks over the same (band_id, sig)
    # partitioning cap each bucket at _MAX_BUCKET docs first (the window
    # and the groupBy reuse one shuffle), so a degenerate signature can
    # never materialize an unbounded bucket row.
    bands = sig.select(
        "doc_id", F.posexplode("band_sigs").alias("band_id", "sig")
    )
    wb = W.partitionBy("band_id", "sig").orderBy("doc_id")
    capped = (
        bands.withColumn("__r", F.row_number().over(wb))
        .where(F.col("__r") <= _MAX_BUCKET)
        .drop("__r")
    )
    buckets = (
        capped.groupBy("band_id", "sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pairs = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x AS a, y AS b))))"
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.expr(TX.jaccard_expr("sh_a", "sh_b"))
    out = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= _NGRAM_TAU)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
    count_thread.join()
    if count_err:
        raise count_err[0]
    return out


@register(
    "dedup_simhash",
    extended=True,  # signature map-pass; dedup_simhash_blocked is the
    # interesting (pairing) variant and holds the family's primary slot
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {TX.duck_shingles('text', 3)} AS shingles FROM documents
)
SELECT doc_id, {TX.duck_simhash('shingles')} AS simhash16
FROM sh
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature per document ({TX.SIMHASH_BITS}-bit, majority-vote
    bits over shingle hashes). Near-dup mining then pairs signatures within
    small Hamming distance (see dedup_simhash_pairs)."""
    d = table(spark, sf_dir, "documents", spread=True)
    sh = d.select("doc_id", F.expr(TX.shingles_expr("text", 3)).alias("shingles"))
    hashed = sh.select("doc_id", F.expr(TX.hashes_expr("shingles")).alias("hashes"))
    return hashed.select(
        "doc_id", F.expr(TX.simhash_from_hashes_expr("hashes")).alias("simhash16")
    )


_HAM_K = 1  # max Hamming distance for near-dup pairs
_SEG_BITS = TX.SIMHASH_BITS // (_HAM_K + 1)  # pigeonhole: k+1 segments


@register(
    "dedup_simhash_blocked",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {TX.duck_shingles('text', 3)} AS shingles FROM documents
), sig AS (
  SELECT doc_id, {TX.duck_simhash('shingles')} AS sh16 FROM sh
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sh16, b.sh16)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh16, b.sh16)) <= {_HAM_K}
""",
)
def dedup_simhash_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via bit-prefix pigeonhole blocking — the
    100 TB scale path (no O(n²) self-join anywhere).

    Hamming distance ≤ k implies the two signatures are EQUAL on at least
    one of k+1 disjoint bit segments, so candidate pairs are generated only
    inside (segment_id, segment_value) buckets: explode each signature into
    its k+1 segments, group, emit ordered in-bucket pairs, verify exact
    Hamming ≤ k. The DuckDB oracle is the all-pairs SEMANTIC spec, so a
    green row proves the blocking loses nothing. Segment width scales with
    signature width (here {TX.SIMHASH_BITS}-bit/{_HAM_K + 1} segments); at
    a larger corpus use a 64-bit simhash and k+1 16-bit segments — the plan
    shape (map-explode → bucket groupBy → verify join) is unchanged.
    """
    d = table(spark, sf_dir, "documents", spread=True)
    sig = d.select(
        "doc_id",
        F.expr(TX.hashes_expr(TX.shingles_expr("text", 3))).alias("hashes"),
    ).select("doc_id", F.expr(TX.simhash_from_hashes_expr("hashes")).alias("sh16"))
    segs = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"(sh16 DIV {2 ** (i * _SEG_BITS)}) % {2 ** _SEG_BITS}")
                    for i in range(_HAM_K + 1)
                ]
            )
        ).alias("seg_id", "seg_val"),
    )
    # bounded fan-out: sorted bucket membership, ordered pairs (a < b)
    buckets = (
        segs.groupBy("seg_id", "seg_val")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pairs = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x AS a, y AS b))))"
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sh16").alias("sh_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sh16").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(hamming <= _HAM_K)
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
    )


@register(
    "dedup_simhash_pairs", extended=True,
    oracle=f"""
WITH sh AS (
  SELECT doc_id, lang, {TX.duck_shingles('text', 3)} AS shingles FROM documents
), sig AS (
  SELECT doc_id, lang, {TX.duck_simhash('shingles')} AS sh16 FROM sh
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sh16, b.sh16)) AS INTEGER) AS hamming
FROM sig a JOIN sig b
  ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh16, b.sh16)) <= 1
""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming distance ≤ 1 within a lang block.

    At 100 TB: block on simhash bit-prefixes (pigeonhole: distance ≤ k ⇒
    equal in one of k+1 prefix segments) instead of lang."""
    d = table(spark, sf_dir, "documents", spread=True)
    sig = d.select(
        "doc_id",
        "lang",
        F.expr(TX.hashes_expr(TX.shingles_expr("text", 3))).alias("hashes"),
    ).select("doc_id", "lang", F.expr(TX.simhash_from_hashes_expr("hashes")).alias("sh16"))
    a = sig.alias("a")
    b = sig.alias("b")
    hamming = F.bit_count(F.col("a.sh16").bitwiseXOR(F.col("b.sh16")))
    return (
        a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .where(hamming <= 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
    )


_EMB_TAU = 0.4  # calibrated to this synthetic corpus: random 64-dim
# vectors top out at cosine ~0.43 in-bucket, so 0.4 captures the closest
# ~1% of pairs; a real near-dup corpus would use 0.9+ with the same plan


@register(
    "dedup_embedding_cosine",
    oracle=f"""
WITH b AS (
  SELECT vec_id, embedding, {V.duck_lsh_bucket('embedding')} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       round({V.duck_cosine('a.embedding', 'c.embedding')}, 6) AS cos_sim
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
WHERE {V.duck_cosine('a.embedding', 'c.embedding')} >= {_EMB_TAU}
""",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with sign-LSH blocking — the
    semantic-dedup pass of an LLM data pipeline (docs whose EMBEDDINGS
    nearly coincide are duplicates even when their text differs).

    Plan: map-only bucket assignment ({V.LSH_PLANES} deterministic integer
    hyperplanes, operators/vectors.py) → self-join ON bucket equality →
    exact cosine filter. The join shuffles on bucket id, candidates are
    ~n²/2^{V.LSH_PLANES} per bucket, never all-pairs; at 100 TB raise the
    plane count so buckets stay bounded (each +1 plane halves bucket
    size), and multi-probe neighboring buckets for recall.

    The same kept-pair rule as the text dedups applies downstream: keep
    min(vec_id) per connected component."""
    e = table(spark, sf_dir, "embeddings", spread=True)
    b = e.select(
        "vec_id", "embedding", F.expr(V.lsh_bucket_expr("embedding")).alias("bucket")
    )
    a = b.alias("a")
    c = b.alias("c")
    cos = F.expr(V.cosine_expr("a.embedding", "c.embedding"))
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .where(cos >= _EMB_TAU)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


from doreisa_spark.queries.similarity import _IVF_CELLS, _IVF_CENT_LO  # noqa: E402
# (shared coarse-quantizer constants: SemDeDup reuses the ANN index's cells)

_SEM_TAU = 0.35  # looser than _EMB_TAU: cell-mates share a centroid, so
# the interesting near-dup band inside a cell starts lower than the
# random-pair band the LSH entry filters


@register(
    "dedup_semantic",
    extended=True,
    oracle=f"""
WITH cent AS (
  SELECT vec_id - {_IVF_CENT_LO} AS cell, embedding AS cemb
  FROM embeddings
  WHERE vec_id >= {_IVF_CENT_LO} AND vec_id < {_IVF_CENT_LO + _IVF_CELLS}
), assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, cent.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {V.duck_cosine('e.embedding', 'cent.cemb')} DESC, cent.cell
           ) AS rnk
    FROM embeddings e CROSS JOIN cent)
  WHERE rnk = 1
), dup AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a
  JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {V.duck_cosine('a.embedding', 'b.embedding')} >= {_SEM_TAU}
)
SELECT s.vec_id, s.cell, (d.vec_id IS NULL) AS keep
FROM assigned s LEFT JOIN dup d ON s.vec_id = d.vec_id
""",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus embeddings with a k-means coarse
    quantizer, then compare pairs ONLY within a cluster and drop every
    vector that has a smaller-id cluster-mate at cosine >= {_SEM_TAU} —
    keep = the minimal member of each within-cluster near-dup group. The
    third semantic-dedup blocking strategy next to sign-LSH
    (dedup_embedding_cosine) and MinHash text shingles: k-means cells
    capture semantic neighborhoods that random hyperplanes split, at the
    cost of missing cross-cluster duplicates (SemDeDup's documented
    approximation; raise the cluster count and the miss rate trades
    against per-cell candidate volume).

    Plan: the IVF cell assignment is REUSED verbatim from the ANN index
    (queries/similarity.py `_ivf_assign_expr`: broadcast centroid
    cross-join + narrow (cid, cell, cos) window — embeddings never enter
    the assignment shuffle; the production-scale path is the map-only BLAS
    GEMM of `_ivf_assign_blas`, same contract). The pair join shuffles on
    cell id, so candidates are bounded per cell, never all-pairs; the drop
    set is a DISTINCT over pair right-members and the verdict a left
    join. At 100 TB: train real k-means centroids (kmeans_refine entry),
    raise cells so cells stay ~10^4 rows, and the per-cell join stays
    local to one shuffle partition.

    Reference analog: the reference has no dedup surface at all (its
    domain is in-situ simulation arrays); this family exists for the
    LLM-training-data pipeline the brief adds on top, and the oracle runs
    the identical algorithm in DuckDB SQL."""
    from doreisa_spark.queries.similarity import _ivf_assign_expr, _seed_centroids

    e = table(spark, sf_dir, "embeddings", spread=True)
    corpus = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    assigned = _ivf_assign_expr(_seed_centroids(e), corpus)
    withemb = assigned.join(corpus, "cid").select(
        F.col("cid").alias("vec_id"), "cell", F.col("ce").alias("embedding")
    )
    a = withemb.alias("a")
    b = withemb.alias("b")
    dup = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(F.expr(V.cosine_expr("a.embedding", "b.embedding")) >= _SEM_TAU)
        .select(F.col("b.vec_id").alias("dup_id"))
        .distinct()
    )
    return withemb.join(
        dup, withemb["vec_id"] == dup["dup_id"], "left"
    ).select("vec_id", "cell", F.col("dup_id").isNull().alias("keep"))


@register(
    "dedup_components",
    extended=True,
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_lsh_oracle()})
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
), nodes AS (
  SELECT DISTINCT u FROM edges
), walk(u, v) AS (
  SELECT u, u FROM nodes
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u
)
SELECT u AS doc_id, min(v) AS component,
       (u = min(v)) AS keep
FROM walk GROUP BY u
""",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the near-dup pair
    graph — the step that turns pairwise matches into keep/drop decisions
    (keep min(doc_id) per component; everything else is a duplicate).

    ITERATIVE algorithm (min-label propagation): each round every node
    takes the min of its own and its neighbors' labels; converges in
    graph-diameter rounds (near-dup clusters are shallow — boilerplate
    families, not long chains). Each round is one join + one groupBy;
    ``localCheckpoint`` truncates the growing lineage so round N's plan
    does not replay rounds 0..N-1 — the standard Spark iterative pattern
    (same shape as GraphFrames/Pregel). The DuckDB oracle computes the
    same components via a recursive transitive closure.

    At 100 TB the pair graph is tiny relative to the corpus (pairs only
    exist where LSH found candidates), so the iteration runs on the
    residual graph, never the full dataset."""
    pairs = scoped_persist(dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b"))
    pairs.count()  # eager: every iteration reads this, compute once
    half = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    edges = scoped_persist(
        half.union(half.select(F.col("v").alias("u"), F.col("u").alias("v")))
    )
    labels = edges.select("u").distinct().select("u", F.col("u").alias("component"))
    for _ in range(20):  # diameter bound; real clusters converge in 2-4
        nbr = (
            edges.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.u"))
            .groupBy(F.col("e.u").alias("u"))
            .agg(F.min("l.component").alias("nb_min"))
        )
        merged = labels.join(nbr, "u", "left").select(
            "u",
            F.col("component").alias("old_component"),
            F.least(
                "component", F.coalesce("nb_min", F.col("component"))
            ).alias("component"),
        )
        # truncate iterative lineage; reliable mode via lifecycle conf
        merged = checkpoint(merged)
        changed = merged.where(
            F.col("component") != F.col("old_component")
        ).count()
        labels = merged.select("u", "component")
        if changed == 0:
            break
    pairs.unpersist()
    edges.unpersist()
    # min-label propagation converges to component == min(doc_id) of the
    # component, so the keep/drop decision is a pure projection: keep the
    # representative, drop every other member — the actionable drop-list
    # that ends the dedup pipeline.
    return labels.select(
        F.col("u").alias("doc_id"),
        "component",
        (F.col("u") == F.col("component")).alias("keep"),
    )


_BENCH_DOCS = 20  # doc_id < 20 stand in for a benchmark/eval set
_CONTAM_MIN_SHARED = 3  # shared distinct 3-gram shingles to flag


@register(
    "dedup_decontaminate",
    extended=True,
    oracle=f"""
WITH bench AS (
  SELECT doc_id AS bench_id, {TX.duck_shingles('text', 3)} AS sh
  FROM documents WHERE doc_id < {_BENCH_DOCS}
), train AS (
  SELECT doc_id, {TX.duck_shingles('text', 3)} AS sh
  FROM documents WHERE doc_id >= {_BENCH_DOCS}
), pairs AS (
  SELECT t.doc_id, b.bench_id,
         len(list_intersect(t.sh, b.sh)) AS shared
  FROM train t CROSS JOIN bench b
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_bench_hits,
       CAST(max(shared) AS INTEGER) AS max_shared
FROM pairs
WHERE shared >= {_CONTAM_MIN_SHARED}
GROUP BY doc_id
""",
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥
    {_CONTAM_MIN_SHARED} distinct word 3-gram shingles with any document
    of a (small) benchmark set — the eval-overlap filter every serious
    pretraining pipeline runs.

    Scale shape: the benchmark side is tiny BY DEFINITION (an eval set),
    so its exploded (shingle → bench_id) table broadcasts; the corpus
    explodes its shingles map-only and the overlap count is one
    broadcast-join + (doc, bench) hash aggregate — the corpus never
    shuffles by content, never self-joins. The oracle's cross-join
    formulation is quadratic but exact; the engine path is linear in
    corpus shingles."""
    d = table(spark, sf_dir, "documents", spread=True)
    bench = (
        d.where(F.col("doc_id") < _BENCH_DOCS)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.explode(F.expr(TX.shingles_expr("text", 3))).alias("sh"),
        )
    )
    train = (
        d.where(F.col("doc_id") >= _BENCH_DOCS)
        .select("doc_id", F.explode(F.expr(TX.shingles_expr("text", 3))).alias("sh"))
    )
    shared = (
        train.join(bcast(bench, bounded=True), "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= _CONTAM_MIN_SHARED)
    )
    return shared.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bench_hits"),
        F.max("shared").cast("int").alias("max_shared"),
    )


# promoted to the primary tier in r13 (driver-budget rotation toward
# the deployment layer: the external hash gate now exercises the
# exactly-once incremental dedup store every round)
@register("dedup_minhash_lsh_incremental", oracle=_lsh_oracle())
def dedup_minhash_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalence gate for the STREAMING-incremental MinHash-LSH
    dedup (streaming/incremental_dedup.py): the corpus is split into
    three monotonic doc_id ranges and ingested micro-batch by
    micro-batch against the persisted signature store; the accumulated
    pairs log must hash-match the one-shot `dedup_minhash_lsh` oracle —
    proving each pair is found exactly once, in the batch where its
    larger doc arrives, with history touched only through the bucket
    store. The real stream driver (readStream + foreachBatch) runs the
    identical `process_batch` in tests/test_incremental_dedup.py; this
    entry calls it directly so the driver's gate is deterministic."""
    from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore

    d = table(spark, sf_dir, "documents", spread=True)
    lo, hi = column_minmax(spark, sf_dir, "documents", "doc_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    # the store must outlive this call (the returned frame reads it
    # lazily); a session-temp dir is the price of simulating a persistent
    # store inside a pure-function registry entry
    store = LSHSignatureStore(spark, _fresh_store_dir("incdedup"))
    for cond in (
        F.col("doc_id") <= cut1,
        (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2),
        F.col("doc_id") > cut2,
    ):
        store.process_batch(d.where(cond))
    return store.pairs()


@register(
    "dedup_pairs_snapshot",
    extended=True,
    oracle=f"""SELECT * FROM ({_lsh_oracle()}
) __pairs
WHERE doc_a <= (SELECT min(doc_id) + 2 * (max(doc_id) - min(doc_id)) // 3
                FROM documents)
  AND doc_b <= (SELECT min(doc_id) + 2 * (max(doc_id) - min(doc_id)) // 3
                FROM documents)""",
)
def dedup_pairs_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reads on the dedup store's served artifact, under the
    driver's DuckDB gate: two of the three doc_id ranges are ingested,
    the PAIRS log is pinned (`LSHSignatureStore.snapshot`), then the
    third range lands and ten pinned docs are taken down. The pinned
    read must hash-match the batch oracle restricted to pairs whose
    BOTH endpoints lie in the first two ranges — exact because ingest
    is monotone in doc_id, so the prefix run's bucket-cap state equals
    the full run's restricted to the prefix (prefix docs always precede
    post-cut docs in every bucket), and because inside the retention
    window a snapshot keeps serving even later-deleted pairs (the
    lakehouse time-travel contract; tests/test_snapshots.py covers the
    GC/compaction sides)."""
    from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore

    d = table(spark, sf_dir, "documents", spread=True)
    lo, hi = column_minmax(spark, sf_dir, "documents", "doc_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    store = LSHSignatureStore(spark, _fresh_store_dir("incdedupsnap"))
    store.process_batch(d.where(F.col("doc_id") <= cut1))
    store.process_batch(d.where((F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2)))
    sid = store.snapshot()
    store.process_batch(d.where(F.col("doc_id") > cut2))
    victims = sorted({int(r["doc_a"]) for r in
                      store.pairs(snapshot=sid).limit(10).collect()})
    store.delete_docs(victims)
    return store.pairs(snapshot=sid)


@register("dedup_minhash_lsh_incremental_pruned", extended=True, oracle=_lsh_oracle())
def dedup_minhash_lsh_incremental_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r8 DEPLOYMENT paths of the incremental dedup store under the
    same batch-equivalence oracle: `PrunedLSHSignatureStore` (sorted log
    segments, broadcast-semi-join members probe, candidate-id parquet
    pushdown into the shingle store — per-batch cost scales with the
    batch, BASELINE.md r8 curve) committing in MANIFEST mode (the
    object-store-safe protocol: nonce data dirs + atomic manifest
    replace, streaming/batch_commit.py), with auto-compaction folding
    mid-stream (compact_every=2 over FOUR batches, so the fold at batch 3
    really merges batches 0–1 past keep_last — with 3 batches the fold
    set was empty and the path never ran, ADVICE r8). Hash-equal to the
    one-shot `dedup_minhash_lsh` — the driver's gate now covers both new
    storage paths end-to-end, not just pytest."""
    from doreisa_spark.streaming import batch_commit as BC
    from doreisa_spark.streaming.incremental_dedup import PrunedLSHSignatureStore

    d = table(spark, sf_dir, "documents", spread=True)
    lo, hi = column_minmax(spark, sf_dir, "documents", "doc_id")
    cuts = [lo + i * (hi - lo) // 4 for i in (1, 2, 3)]
    store = PrunedLSHSignatureStore(
        spark,
        _fresh_store_dir("incdedup_pruned"),
        commit_mode=BC.MANIFEST,
        compact_every=2,
    )
    for cond in (
        F.col("doc_id") <= cuts[0],
        (F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1]),
        (F.col("doc_id") > cuts[1]) & (F.col("doc_id") <= cuts[2]),
        F.col("doc_id") > cuts[2],
    ):
        store.process_batch(d.where(cond))
    return store.pairs()


_PF_TAU = 0.8  # Jaccard threshold; prefix math uses the exact 4/5 rational


@register(
    "dedup_prefix_filter",
    extended=True,
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {TX.duck_shingles('text', 3)} AS shingles FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round({TX.duck_jaccard('a.shingles', 'b.shingles')}, 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE {TX.duck_jaccard('a.shingles', 'b.shingles')} >= {_PF_TAU}
""",
)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity join by PREFIX FILTERING (the AllPairs/PPJoin
    family) — the third scale strategy next to MinHash-LSH (probabilistic
    buckets) and SimHash (bit blocks), and unlike those it is EXACT: sort
    every shingle set by global rarity, take the first
    |d| - ceil(tau*|d|) + 1 tokens as the prefix, and any pair with
    Jaccard >= tau provably shares a prefix token — so candidates =
    prefix-token equi-join, then exact verification. The oracle is the
    full quadratic Jaccard join; the engine path must reproduce it
    row-for-row WITHOUT the quadratic step.

    Determinism/completeness details: the prefix length uses integer
    arithmetic (sz - (4*sz + 4) DIV 5 + 1 — a float ceil(0.8*sz) can
    round the wrong way and silently shorten the prefix); the global
    order is (frequency, shingle), total and identical in both engines;
    verification reuses the exact fold of dedup_ngram_jaccard.

    100 TB posture: the rarity join shuffles (token, doc) pairs once
    (hot stopword-shingles are exactly the tokens prefixes EXCLUDE, which
    is the point of rarity ordering); candidate fan-out is bounded by
    prefix token frequency, never all-pairs."""
    d = table(spark, sf_dir, "documents", spread=True)
    sh = d.select("doc_id", F.expr(TX.shingles_expr("text", 3)).alias("shingles"))
    sh = scoped_persist(sh)
    tok = sh.select("doc_id", F.explode("shingles").alias("s"))
    freq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    ordered = (
        tok.join(freq, "s")
        .groupBy("doc_id")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(n, s))), x -> x.s)").alias(
                "sorted_sh"
            )
        )
    )
    sz = F.size("sorted_sh")
    p = sz - F.expr("CAST((4 * size(sorted_sh) + 4) DIV 5 AS INT)") + F.lit(1)
    prefix = ordered.select(
        "doc_id", F.explode(F.slice("sorted_sh", 1, p)).alias("ps")
    )
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), F.col("x.ps") == F.col("y.ps"))
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.expr(TX.jaccard_expr("sh_a", "sh_b"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .where(jac >= _PF_TAU)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )
