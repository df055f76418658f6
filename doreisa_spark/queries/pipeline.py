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

from doreisa_spark.catalog import table
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


@register("pipeline_curation_incremental", extended=True, oracle=_CURATION_ORACLE)
def pipeline_curation_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalence gate for the STREAMING-incremental curation
    chain (streaming/incremental_curation.py): the corpus splits into
    three monotonic doc_id ranges ingested micro-batch by micro-batch
    against the persisted fingerprint store; the accumulated kept log
    must hash-match the one-shot `pipeline_corpus_curation` oracle —
    proving first-arrival canonicalization under streaming ingest equals
    the batch min-doc_id keeper, with history touched only through the
    fingerprint anti-join. The real stream driver (readStream +
    foreachBatch) runs the identical `process_batch` in
    tests/test_incremental_curation.py; this entry calls it directly so
    the driver's gate is deterministic."""
    import tempfile

    from doreisa_spark.streaming.incremental_curation import CurationStore

    d = table(spark, sf_dir, "documents", spread=True)
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    store = CurationStore(spark, tempfile.mkdtemp(prefix="doreisa_inccur_"))
    for cond in (
        F.col("doc_id") <= cut1,
        (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2),
        F.col("doc_id") > cut2,
    ):
        store.process_batch(d.where(cond))
    return store.kept()
