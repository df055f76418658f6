"""Text analysis over documents: token statistics, quality scoring,
heuristic language-ID, and rolling-hash fingerprinting.

Everything is built-in expression work (JVM-side, codegen) — no Python in
the hot path. Where a fold is needed (rolling hash) it's `aggregate` /
`list_reduce`, identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.operators.broadcast import bcast
from doreisa_spark.operators import text as TX
from doreisa_spark.registry import register


@register(
    "text_token_stats",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_unique,
       round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS ttr,
       CAST(length(text) AS INTEGER) AS n_chars_actual,
       round(CAST(length(text) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE), 6)
         AS avg_token_len
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + type-token ratio + average token length.

    Integer-ratio doubles → bit-identical across engines."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_chars = F.length("text")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique"),
        F.round(n_uniq.cast("double") / n_tok.cast("double"), 6).alias("ttr"),
        n_chars.cast("int").alias("n_chars_actual"),
        F.round(n_chars.cast("double") / n_tok.cast("double"), 6).alias("avg_token_len"),
    )


_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]


@register(
    "text_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, n_chars,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
)
SELECT doc_id,
       CAST(n_tok AS INTEGER) AS n_tokens,
       round(CAST(len(list_filter(toks,
                t -> list_contains({_STOPWORDS!r}, t))) AS DOUBLE)
             / CAST(n_tok AS DOUBLE), 6) AS stopword_ratio,
       round(CAST(len(list_filter(toks, t -> length(t) >= 4)) AS DOUBLE)
             / CAST(n_tok AS DOUBLE), 6) AS long_token_ratio,
       CASE WHEN n_tok >= 20
              AND CAST(len(list_filter(toks,
                    t -> list_contains({_STOPWORDS!r}, t))) AS DOUBLE)
                  / CAST(n_tok AS DOUBLE) BETWEEN 0.05 AND 0.6
            THEN 1 ELSE 0 END AS passes_quality
FROM t
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: stopword ratio, long-token ratio, and a
    pass/fail gate — the C4-style filter shape for pretraining pipelines."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    sw = F.array([F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_long = F.size(F.filter(toks, lambda t: F.length(t) >= 4))
    stop_ratio = n_stop.cast("double") / n_tok.cast("double")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(n_long.cast("double") / n_tok.cast("double"), 6).alias("long_token_ratio"),
        F.when((n_tok >= 20) & (stop_ratio >= 0.05) & (stop_ratio <= 0.6), 1)
        .otherwise(0)
        .alias("passes_quality"),
    )


_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "y", "los", "es"],
}


def _duck_lang_score(lang: str) -> str:
    return (
        f"len(list_filter(string_split(text, ' '), "
        f"t -> list_contains({_LANG_MARKERS[lang]!r}, t)))"
    )


@register(
    "text_lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         {_duck_lang_score('en')} AS s_en,
         {_duck_lang_score('de')} AS s_de,
         {_duck_lang_score('fr')} AS s_fr,
         {_duck_lang_score('es')} AS s_es
  FROM documents
)
SELECT doc_id, labeled_lang,
       CASE
         WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         WHEN s_fr >= s_es THEN 'fr'
         ELSE 'es'
       END AS pred_lang,
       CAST(s_en AS INTEGER) AS score_en
FROM scored
""",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword-marker language ID heuristic: count marker-word hits
    per candidate language, argmax with a fixed precedence order (en > de >
    fr > es on ties) — deterministic in both engines."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = F.split(F.col("text"), " ")

    def score(lang: str):
        markers = F.array([F.lit(m) for m in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))

    s_en, s_de, s_fr, s_es = score("en"), score("de"), score("fr"), score("es")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when((s_en >= s_de) & (s_en >= s_fr) & (s_en >= s_es), "en")
        .when((s_de >= s_fr) & (s_de >= s_es), "de")
        .when(s_fr >= s_es, "fr")
        .otherwise("es")
        .alias("pred_lang"),
        s_en.cast("int").alias("score_en"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5(lower(text)) AS md5_fp,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(lower(text), ' '),
                          w -> {TX.duck_hash60('w')} % {TX.MERSENNE_P})),
         (acc, h) -> (31 * acc + h) % {TX.MERSENNE_P}) AS rolling_fp
FROM documents
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text + a word-level
    polynomial rolling hash (acc = 31·acc + h(w) mod p), folded
    sequentially — identical in both engines."""
    d = table(spark, sf_dir, "documents", spread=True)
    h_w = TX.hash60_expr("w")
    rolling = (
        f"aggregate(transform(split(lower(text), ' '), w -> {h_w} % {TX.MERSENNE_P}), "
        f"CAST(0 AS BIGINT), (acc, h) -> (31L * acc + h) % {TX.MERSENNE_P})"
    )
    return d.select(
        "doc_id",
        F.md5(F.lower(F.col("text")).cast("binary")).alias("md5_fp"),
        F.expr(rolling).alias("rolling_fp"),
    )


@register(
    "text_ngram_top", extended=True,
    oracle="""
WITH grams AS (
  SELECT lang, unnest(list_transform(range(1, len(string_split(text, ' '))),
                 i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))) AS bigram
  FROM documents
), counted AS (
  SELECT lang, bigram, count(*) AS n
  FROM grams GROUP BY lang, bigram
)
SELECT lang, bigram, n, rk FROM (
  SELECT lang, bigram, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
  FROM counted)
WHERE rk <= 5
""",
)
def text_ngram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language: n-gram explode → count → windowed
    top-k. The heavy explode+count is a classic map-side-combine aggregate."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents", spread=True)
    toks = "split(text, ' ')"
    bigrams = F.expr(
        f"CASE WHEN size({toks}) >= 2 THEN "
        f"transform(sequence(1, size({toks}) - 1), "
        f"i -> array_join(slice({toks}, i, 2), ' ')) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    counted = (
        d.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return counted.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)


@register(
    "text_tfidf_top", extended=True,
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), idf AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT doc_id, term, score, rk FROM (
  SELECT tf.doc_id, tf.term,
         tf.tf * (1000000 // idf.df) AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * (1000000 // idf.df) DESC, tf.term) AS rk
  FROM tf JOIN idf USING (term)
  WHERE tf.doc_id % 97 = 0)
WHERE rk <= 3
""",
)
def text_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (output bounded to every 97th doc;
    term statistics computed over the FULL corpus).

    Two-level aggregation + join + windowed top-k: token explode →
    (doc, term) counts (map-side combine) → document frequency per term
    → score join → per-doc top-3. The idf is the integer surrogate
    ``1e6 div df`` so both engines rank on exact integers — a float
    ``ln(N/df)`` would hash-diverge on libm differences; a real pipeline
    swaps the expression, not the plan. At 100 TB both aggregations are
    single-shuffle hash aggs on their natural keys and the score join
    shuffles on term (the window then re-shuffles only the candidate
    subset by doc)."""
    from pyspark.sql import Window as W

    d = table(spark, sf_dir, "documents", spread=True)
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    score = (F.col("tf") * F.expr("1000000 DIV df")).alias("score")
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        tf.join(idf, "term")
        .where(F.col("doc_id") % 97 == 0)
        .select("doc_id", "term", score)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )


# BPE-ish pre-tokenization pattern (GPT-2 style, simplified): letter runs
# are one token each, every DIGIT is its own token, punctuation runs split
# per char. Same regex dialect subset works in Java (Spark) and RE2 (DuckDB).
_BPE_PAT = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@register(
    "text_bpe_token_count",
    extended=True,
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS INTEGER) AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
       round(CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS fertility
FROM documents
""",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenization regex (letter
    runs | single digits | punctuation chars) estimates subword token cost
    per document, next to the whitespace word count; ``fertility`` =
    tokens-per-word, the standard tokenizer-efficiency metric used for
    corpus budgeting.

    Pure JVM regex work (codegen, no Python); the integer-ratio double is
    bit-identical across engines. At 100 TB this is a map-only pass."""
    d = table(spark, sf_dir, "documents", spread=True)
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PAT), F.lit(0)))
    ws = F.size(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        bpe.alias("n_bpe_tokens"),
        ws.alias("n_ws_tokens"),
        F.round(bpe.cast("double") / ws.cast("double"), 6).alias("fertility"),
    )


_CHUNK_TOKS = 50  # tokens per chunk
_CHUNK_HOP = 40   # hop (10-token overlap) — RAG chunking convention


@register(
    "text_chunk_windows",
    extended=True,
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), w AS (
  SELECT doc_id, ts,
         unnest(range(0, greatest((len(ts) - {_CHUNK_TOKS} + {_CHUNK_HOP} - 1) // {_CHUNK_HOP} + 1, 1))) AS chunk_no
  FROM toks
), sliced AS (
  SELECT doc_id, chunk_no,
         ts[(CAST(chunk_no AS INTEGER) * {_CHUNK_HOP} + 1):least(CAST(chunk_no AS INTEGER) * {_CHUNK_HOP} + {_CHUNK_TOKS}, len(ts))] AS ck
  FROM w
)
SELECT doc_id, CAST(chunk_no AS INTEGER) AS chunk_no,
       CAST(len(ck) AS INTEGER) AS n_tokens,
       ck[1] AS first_token,
       md5(array_to_string(ck, ' ')) AS chunk_digest
FROM sliced
WHERE len(ck) > 0
""",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for embedding/RAG pipelines: overlapping
    {_CHUNK_TOKS}-token windows with a {_CHUNK_HOP}-token hop, one output
    row per chunk with its token count and content digest — the fan-out
    stage that feeds an embedding model at corpus scale.

    Pure JVM array work: tokenize once, slide windows via
    transform(sequence)+slice, explode — map-only row expansion, no
    Python, no shuffle. The digest proves chunk CONTENT (not just counts)
    survives the slicing identically in both engines."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = "split(text, ' ')"
    n_win = (
        f"greatest((size({toks}) - {_CHUNK_TOKS} + {_CHUNK_HOP} - 1) DIV {_CHUNK_HOP} + 1, 1)"
    )
    win = F.expr(
        f"transform(sequence(0, {n_win} - 1), "
        f"w -> struct(w AS chunk_no, slice({toks}, w * {_CHUNK_HOP} + 1, {_CHUNK_TOKS}) AS ck))"
    )
    e = d.select("doc_id", F.explode(win).alias("s")).select(
        "doc_id",
        F.col("s.chunk_no").cast("int").alias("chunk_no"),
        F.col("s.ck").alias("ck"),
    )
    return e.where(F.size("ck") > 0).select(
        "doc_id",
        "chunk_no",
        F.size("ck").alias("n_tokens"),
        F.element_at("ck", 1).alias("first_token"),
        F.md5(F.array_join("ck", " ").cast("binary")).alias("chunk_digest"),
    )


@register(
    "text_repetition",
    extended=True,
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS grams
  FROM t
)
SELECT doc_id,
       CAST(len(grams) AS INTEGER) AS n_2grams,
       CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
       round(CASE WHEN len(grams) > 0
                  THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                       / CAST(len(grams) AS DOUBLE)
                  ELSE 0.0 END, 6) AS dup_fraction,
       CASE WHEN len(grams) >= 10
             AND 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                 / CAST(len(grams) AS DOUBLE) > 0.5
            THEN 1 ELSE 0 END AS is_repetitive
FROM g
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition scoring (the Gopher 'duplicate n-gram
    fraction' quality rule): fraction of whitespace 2-grams that are
    repeats, plus a repetitive-document flag — the filter that drops
    boilerplate/looping text before pretraining.

    Map-only: every metric is a JVM higher-order expression over the
    token array (no shuffle, no Python); the dup fraction is one exact
    integer division per doc, so the doubles match DuckDB bit-for-bit.
    The gram builder guards the <2-token case (sequence(0, -1) would
    step DOWNWARD, the sample_upweight lesson)."""
    d = table(spark, sf_dir, "documents", spread=True)
    toks = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n = F.size(grams)
    nd = F.size(F.array_distinct(grams))
    dup = F.when(
        n > 0, F.lit(1.0) - nd.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        n.alias("n_2grams"),
        nd.alias("n_distinct"),
        F.round(dup, 6).alias("dup_fraction"),
        F.when((n >= 10) & (dup > 0.5), 1).otherwise(0).alias("is_repetitive"),
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): character classes + bounded repetition only, no
# backrefs/lookarounds.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "555-[0-9]{4}"
_PII_IP = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

# The synthetic corpus contains no PII, so the op would be a vacuous
# all-zeros pass. Both engines therefore append DETERMINISTIC PII derived
# from doc_id (emails on ~2/3 of docs, phones on 1/2, an IP on all) and
# the oracle verifies the redactor actually finds and strips it.
_PII_AUG_DUCK = """
text
|| CASE WHEN doc_id % 3 > 0
        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
|| CASE WHEN doc_id % 2 = 0
        THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
|| ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 + 1 AS VARCHAR)
"""


@register(
    "text_pii_redact",
    extended=True,
    oracle=f"""
WITH aug AS (
  SELECT doc_id, {_PII_AUG_DUCK} AS t FROM documents
), red AS (
  SELECT doc_id, t,
         len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails,
         len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phones,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g'),
           '{_PII_IP}', '<IP>', 'g') AS redacted
  FROM aug
)
SELECT doc_id,
       CAST(n_emails AS INTEGER) AS n_emails,
       CAST(n_phones AS INTEGER) AS n_phones,
       CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS INTEGER) AS n_ips,
       CAST(length(redacted) AS INTEGER) AS n_chars_redacted,
       md5(redacted) AS redacted_md5
FROM red
""",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrubbing pass every training-data
    pipeline runs before anything else: count and replace emails, phone
    numbers, and IP addresses with typed placeholder tokens.

    Map-only JVM regexps (regexp_count / chained regexp_replace), no
    Python in the path; at 100 TB this is a pure scan-shaped pass that
    pipelines with quality scoring and dedup fingerprinting in one stage.
    Patterns are restricted to the Java-regex ∩ RE2 common subset so both
    engines match identically; redaction order (emails → phones → IPs) is
    pinned because the output of one rule can affect the next. The md5 of
    the fully redacted text proves byte-identical redaction, not just
    equal counts."""
    d = table(spark, sf_dir, "documents", spread=True)
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 > 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((did % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.lit(" from 10."),
        (did % 256).cast("string"),
        F.lit(".0."),
        (did % 100 + 1).cast("string"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
        ),
        _PII_IP,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count(aug, F.lit(_PII_PHONE)).cast("int").alias("n_phones"),
        F.regexp_count(aug, F.lit(_PII_IP)).cast("int").alias("n_ips"),
        F.length(red).cast("int").alias("n_chars_redacted"),
        F.md5(red).alias("redacted_md5"),
    )


_HH_K = 4096   # Misra-Gries counters per partition
_HH_TOP = 25


@register(
    "text_heavy_hitters",
    extended=True,
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), counted AS (
  SELECT token, count(*) AS n FROM toks GROUP BY token
)
SELECT token, n, rk FROM (
  SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rk
  FROM counted)
WHERE rk <= {_HH_TOP}
""",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT top-{_HH_TOP} most frequent tokens via the two-pass
    Misra-Gries pattern — the bounded-shuffle alternative to hashing
    every distinct token:

    1. each partition reduces its token stream to <= {_HH_K} MG counters
       (vectorized batch-decrement: merge value_counts, subtract the
       (K+1)-th largest, keep positives — the classic superset guarantee:
       any token with partition count > n_part/(K+1) survives);
    2. the union of surviving candidates (<= K x n_partitions narrow
       rows, vs every distinct token) is exactly recounted with a
       broadcast semi-join and ranked.

    The MG guarantee is ASSERTED at runtime: the {_HH_TOP}-th exact count
    must exceed n_tokens/(K+1), else the candidate set could have missed
    a true heavy hitter and the query raises instead of silently
    under-reporting. ``n_tokens`` RIDES THE MG PASS (each partition emits
    one sentinel row carrying its token total — r6 verdict nit #2: the
    guard used to be a third corpus scan), so the corpus is read exactly
    twice: the MG pass and the exact recount. At 100 TB this shuffles
    candidate token strings only; the full-groupBy formulation
    (text_ngram_top's shape) shuffles the whole vocabulary."""
    import pandas as pd

    from pyspark.sql import Window as W

    from doreisa_spark.lifecycle import scoped_persist

    d = table(spark, sf_dir, "documents", spread=True)
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))

    def mg(batches):
        s = pd.Series(dtype="int64")
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            s = s.add(pdf["token"].value_counts(), fill_value=0)
            if len(s) > _HH_K:
                thr = s.nlargest(_HH_K + 1).iloc[-1]
                s = s - thr
                s = s[s > 0]
        yield pd.DataFrame(
            {
                "token": s.index.astype(str),
                "part_total": pd.Series([None] * len(s), dtype="Int64"),
            }
        )
        # sentinel: this partition's token count, NULL token key
        yield pd.DataFrame(
            {
                "token": pd.Series([None], dtype=object),
                "part_total": pd.Series([seen], dtype="Int64"),
            }
        )

    # tiny frame (<= (K+1) x n_partitions rows) feeding two consumers —
    # persist so the corpus-wide MG scan runs once
    mg_out = scoped_persist(
        toks.mapInPandas(mg, schema="token string, part_total bigint")
    )
    cands = mg_out.where(F.col("token").isNotNull()).select("token").distinct()
    exact = (
        toks.join(bcast(cands, bounded=True), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.orderBy(F.col("n").desc(), F.col("token"))
    top = (
        exact.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _HH_TOP)
    )
    n_tokens = (
        mg_out.where(F.col("token").isNull())
        .agg(F.sum("part_total").alias("n"))
        .first()["n"]
    ) or 0
    kth = top.agg(F.min("n").alias("kth")).first()["kth"]
    if kth is not None and kth * (_HH_K + 1) <= n_tokens:
        raise ValueError(
            f"Misra-Gries guarantee violated: top-{_HH_TOP} count "
            f"{kth} <= n/(K+1) = {n_tokens/(_HH_K+1):.1f}; raise _HH_K"
        )
    return top
