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
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    sw = F.array([F.lit(s) for s in _STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).cast(
        "double"
    ) / n_tok.cast("double")
    keepers = d.groupBy(F.md5(F.col("text").cast("binary"))).agg(
        F.min("doc_id").alias("keeper")
    )
    filtered = d.where(
        F.col("lang").isin(*_KEEP_LANGS)
        & (n_tok >= 20)
        & (stop_ratio >= 0.05)
        & (stop_ratio <= 0.6)
    ).select("doc_id", "lang", n_tok.alias("n_tokens"))
    return filtered.join(
        keepers, filtered["doc_id"] == keepers["keeper"], "left_semi"
    )
