"""Deterministic sampling operators — the downsampling/mixing step of a
training-data pipeline (rebalance languages/sources before training).

Spark's ``sample()``/``sampleBy()`` are seeded-RNG based: resilient but
not reproducible across engines or partitionings. These operators sample
by a content hash instead — ``keep iff h(doc_id) mod 1000 < rate[stratum]``
— which is (a) exactly reproducible anywhere (the DuckDB oracle runs the
identical predicate), (b) stable under re-partitioning/retries, and
(c) a pure map: no shuffle, no state, trivially parallel at 100 TB.
The hash is the same 28-bit md5-derived ``hash60`` the dedup family uses
(operators/text.py), so one constant set drives both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.operators import text as TX
from doreisa_spark.registry import register

# per-language keep rates in permille: downsample the dominant language,
# keep the tail languages whole-ish — the usual rebalancing shape
_PERMILLE = {"en": 400, "de": 800, "es": 800, "fr": 800, "zh": 800}
_DEFAULT_PERMILLE = 1000  # unknown strata pass through


def _rate_case_sql(lang: str) -> str:
    arms = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_PERMILLE.items()))
    return f"CASE {lang} {arms} ELSE {_DEFAULT_PERMILLE} END"


@register(
    "sample_stratified",
    extended=True,
    oracle=f"""
SELECT doc_id, lang, source,
       ({TX.duck_hash60('CAST(doc_id AS VARCHAR)')} % 1000) AS sample_bucket
FROM documents
WHERE ({TX.duck_hash60('CAST(doc_id AS VARCHAR)')} % 1000)
      < {_rate_case_sql('lang')}
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic downsampling by language.

    Map-only plan: hash predicate evaluated per row at the scan, no
    shuffle, no driver state; rates are a literal CASE, so there is no
    dimension join at all. Changing the rate table re-samples
    consistently (a document kept at 400‰ is still kept at 800‰ —
    nested samples, the property seeded RNG cannot give)."""
    d = table(spark, sf_dir, "documents")
    bucket = F.expr(TX.hash60_expr("CAST(doc_id AS STRING)")) % 1000
    rate = F.expr(_rate_case_sql("lang"))
    return (
        d.select("doc_id", "lang", "source", bucket.alias("sample_bucket"), rate.alias("__r"))
        .where(F.col("sample_bucket") < F.col("__r"))
        .drop("__r")
    )


@register(
    "sample_mixture_counts",
    extended=True,
    oracle=f"""
SELECT lang, count(*) AS n_kept
FROM documents
WHERE ({TX.duck_hash60('CAST(doc_id AS VARCHAR)')} % 1000)
      < {_rate_case_sql('lang')}
GROUP BY lang
""",
)
def sample_mixture_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture audit: per-language kept counts of the stratified sample —
    the control report a pipeline emits to confirm the realized mixture
    matches the target rates. Same predicate, one tiny groupBy."""
    return (
        sample_stratified(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


# per-language repeat weights in permille (>= 1000: pure upsampling) —
# the "epochs per source" mixing knob of a pretraining run
_UPWEIGHT_PERMILLE = {"de": 2400, "fr": 1500, "zh": 3000}
_DEFAULT_UPWEIGHT = 1000


def _upweight_case_sql(lang: str) -> str:
    arms = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_UPWEIGHT_PERMILLE.items()))
    return f"CASE {lang} {arms} ELSE {_DEFAULT_UPWEIGHT} END"


@register(
    "sample_upweight",
    extended=True,
    oracle=f"""
WITH w AS (
  SELECT doc_id, lang,
         ({_upweight_case_sql('lang')}) // 1000
         + CASE WHEN ({TX.duck_hash60('CAST(doc_id AS VARCHAR)')} % 1000)
                     < ({_upweight_case_sql('lang')}) % 1000
                THEN 1 ELSE 0 END AS n_copies
  FROM documents
)
SELECT doc_id, lang, CAST(unnest(range(0, n_copies)) AS INTEGER) AS copy_no
FROM w
""",
)
def sample_upweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fractional upsampling — the repeat-factor half of
    source mixing (downsampling is sample_stratified). A 2.4× language
    weight emits 2 copies of every document plus a 3rd for the
    hash-selected 40% — exactly 2.4× in expectation, reproducible
    anywhere, and nested (raising a weight only ever ADDS copies).

    Map-only row expansion: the copy fan-out happens inside the scan
    stage via explode(sequence); no shuffle, no RNG state, no driver.
    Downstream training shards shuffle-read the expanded stream once."""
    d = table(spark, sf_dir, "documents")
    w = F.expr(_upweight_case_sql("lang"))
    bucket = F.expr(TX.hash60_expr("CAST(doc_id AS STRING)")) % 1000
    copies = (w / 1000).cast("int") + F.when(bucket < w % 1000, 1).otherwise(0)
    # sequence(0, -1) steps DOWNWARD ([0,-1]) — a sub-1000 weight would emit
    # two phantom copies per dropped doc. Filter n_copies=0 rows out first,
    # matching the oracle's empty range(0, 0).
    return (
        d.select("doc_id", "lang", copies.alias("n_copies"))
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy_no"),
        )
    )


_PACK_BUCKETS = 8  # parallel packing streams (hash-assigned)
_PACK_BUDGET = 2048  # whitespace tokens per packed training sequence


@register(
    "sample_pack_sequences",
    extended=True,
    oracle=f"""
WITH docs AS (
  SELECT doc_id,
         ({TX.duck_hash60('CAST(doc_id AS VARCHAR)')} % {_PACK_BUCKETS}) AS bucket,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), placed AS (
  SELECT doc_id, bucket, n_tokens,
         COALESCE(sum(n_tokens) OVER (
           PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM docs
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(start_off // {_PACK_BUDGET} AS INTEGER) AS seq_no,
       CAST(count(*) AS INTEGER) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM placed
GROUP BY bucket, start_off // {_PACK_BUDGET}
""",
)
def sample_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining — the concat-then-chunk layout:
    documents concatenate in deterministic (bucket, doc_id) order and the
    stream splits into {_PACK_BUDGET}-token training sequences; a doc
    belongs to the sequence its first token lands in.

    Distributed shape: {_PACK_BUCKETS} independent hash-assigned packing
    streams (at cluster scale, thousands) — each bucket's running offset
    is one partitioned window cumsum, so the plan is a single
    bucket-keyed shuffle; no global coordination, no driver. All
    arithmetic is integer-exact, so the oracle matches bit-for-bit."""
    d = table(spark, sf_dir, "documents")
    bucket = (F.expr(TX.hash60_expr("CAST(doc_id AS STRING)")) % _PACK_BUCKETS).alias(
        "bucket"
    )
    n_tokens = F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    docs = d.select("doc_id", bucket, n_tokens)
    w = (
        W.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = docs.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        placed.groupBy(
            F.col("bucket").cast("int").alias("bucket"),
            F.floor(F.col("start_off") / _PACK_BUDGET).cast("int").alias("seq_no"),
        )
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "sample_temperature_mixture",
    extended=True,
    oracle="""
WITH src AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
), tot AS (
  SELECT sum(sqrt(CAST(n AS DOUBLE))) AS z, sum(n) AS total FROM src
)
SELECT source, n,
       round(sqrt(CAST(n AS DOUBLE)) / z, 6) AS weight,
       round(sqrt(CAST(n AS DOUBLE)) / z * total, 2) AS expected_docs
FROM src, tot
""",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source re-weighting (alpha = 0.5) — the
    multilingual/multi-source mixing rule (weight proportional to
    count^alpha) that upsamples rare sources relative to raw frequency.
    alpha is pinned to 0.5 because IEEE sqrt is correctly rounded in both
    engines, keeping the weights bit-stable where a libm pow(x, 0.3)
    could differ in the last ulp.

    Plan: one (source) count agg — map-side combined, 20 groups — then a
    broadcast one-row normalizer; everything downstream is per-group
    scalar math."""
    d = table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = src.agg(
        F.sum(F.sqrt(F.col("n").cast("double"))).alias("z"),
        F.sum("n").alias("total"),
    )
    w = F.sqrt(F.col("n").cast("double")) / F.col("z")
    return src.crossJoin(bcast(tot)).select(
        "source",
        "n",
        F.round(w, 6).alias("weight"),
        F.round(w * F.col("total"), 2).alias("expected_docs"),
    )


_DSIR_BUCKETS = 4096  # hashed n-gram feature space (DSIR uses 10^4-10^6;
# small here so bucket collisions actually exercise the hashing path)
_DSIR_TARGET = ("src0", "src1")  # stand-in target domain (DSIR: the
# formal/quality corpus whose distribution the sample should match)
_DSIR_TOP = 100


def _grams_sql(text: str) -> str:
    """Word unigrams + bigrams WITH multiplicity (Spark SQL): DSIR's
    features are bag-of-hashed-ngram counts, not the distinct shingle
    sets the dedup family uses."""
    toks = f"split({text}, ' ')"
    bi = (
        f"CASE WHEN size({toks}) >= 2 THEN "
        f"transform(sequence(1, size({toks}) - 1), "
        f"i -> concat_ws(' ', element_at({toks}, i), element_at({toks}, i + 1))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return f"concat({toks}, {bi})"


def _duck_grams(text: str) -> str:
    toks = f"string_split({text}, ' ')"
    bi = f"list_transform(range(1, len({toks})), i -> {toks}[i] || ' ' || {toks}[i + 1])"
    return f"list_concat({toks}, {bi})"


@register(
    "sample_dsir",
    extended=True,
    oracle=f"""
WITH feat AS (
  SELECT d.doc_id, d.source,
         ({TX.duck_hash60('g')} % {_DSIR_BUCKETS}) AS bucket
  FROM documents d, unnest({_duck_grams('d.text')}) AS t(g)
), raw AS (
  SELECT bucket, count(*) AS cr FROM feat GROUP BY bucket
), tgt AS (
  SELECT bucket, count(*) AS ct FROM feat
  WHERE source IN {_DSIR_TARGET} GROUP BY bucket
), llr AS (
  SELECT r.bucket,
         (1000 * (COALESCE(t.ct, 0) + 1)) // (r.cr + 1) AS pts
  FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket
)
SELECT f.doc_id, min(f.source) AS source,
       sum(l.pts) AS dsir_score
FROM feat f JOIN llr l ON f.bucket = l.bucket
GROUP BY f.doc_id
ORDER BY dsir_score DESC, f.doc_id
LIMIT {_DSIR_TOP}
""",
)
def sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, arXiv:2302.03169): score every raw document by how much its
    hashed-n-gram bag looks like a small TARGET domain versus the raw
    corpus, keep the top-{_DSIR_TOP}. Features are word uni+bigrams WITH
    multiplicity hashed into {_DSIR_BUCKETS} buckets (DSIR's hashed
    bag-of-ngrams); the target here is two sources standing in for the
    formal corpus (Wikipedia/books in the paper).

    Per-feature weight: integer ratio points
    ``(1000 * (ct+1)) DIV (cr+1)`` — the add-one-smoothed target/raw
    contrast in exact integer arithmetic instead of DSIR's
    log-likelihood ratio, the same integer-surrogate convention as
    text_tfidf_top's integer idf: cross-engine float logs cannot be
    summed bit-identically under Spark's unordered partial aggregation,
    and an integer-linear surrogate keeps the selection fully
    deterministic in both engines. (The paper's sampled-Gumbel step is
    likewise replaced by deterministic top-N — resampling noise is a
    training-time choice, not an engine capability.)

    Plan at 100 TB: the gram explode is map-side; both count aggs
    shuffle NARROW (bucket) rows into {_DSIR_BUCKETS} groups; the
    per-feature weight table is {_DSIR_BUCKETS} rows — broadcast to
    score the exploded stream map-side; per-doc score is one (doc_id)
    shuffle of integer partial sums; the final top-N is
    TakeOrderedAndProject, never a global sort. Raw-corpus statistics
    are computed once and reusable across selection runs (persist the
    llr frame in a real pipeline)."""
    d = table(spark, sf_dir, "documents")
    feat = d.select(
        "doc_id", "source", F.explode(F.expr(_grams_sql("text"))).alias("g")
    ).select(
        "doc_id", "source", (F.expr(TX.hash60_expr("g")) % _DSIR_BUCKETS).alias("bucket")
    )
    raw = feat.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        feat.where(F.col("source").isin(*_DSIR_TARGET))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    llr = raw.join(tgt, "bucket", "left").select(
        "bucket",
        F.expr("(1000 * (COALESCE(ct, 0) + 1)) DIV (cr + 1)").alias("pts"),
    )
    return (
        feat.join(bcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(F.min("source").alias("source"), F.sum("pts").alias("dsir_score"))
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(_DSIR_TOP)
    )
