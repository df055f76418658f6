"""Scalar expression surface: string, date/time, math, conditional, array,
map, json, and binary/hash functions — plus scalar Pandas-UDF and
mapInPandas coverage.

All built-ins run JVM-side inside whole-stage codegen; the two UDF queries
exist to prove the Arrow-vectorized Python path (with built-in oracles).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.registry import register


@register(
    "func_string",
    # rotated to the extended tier in r13: long-stable, family still
    # exercised by primary twins; driver budget moved to the store layer
    extended=True,
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substr(p_name, 1, 5) AS name_prefix,
       CAST(length(p_name) AS INTEGER) AS name_len,
       concat(p_brand, ':', p_type) AS brand_type,
       replace(p_type, 'A', '_') AS type_repl,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       trim('  ' || p_brand || ' ') AS trimmed,
       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
       CAST(strpos(p_name, 'a') AS INTEGER) AS first_a,
       reverse(p_brand) AS brand_rev,
       CASE WHEN p_name LIKE '%steel%' THEN 1 ELSE 0 END AS has_steel
FROM part
""",
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery on part."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("A"), F.lit("_")).alias("type_repl"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.instr(F.col("p_name"), "a").cast("int").alias("first_a"),
        F.reverse("p_brand").alias("brand_rev"),
        F.when(F.col("p_name").like("%steel%"), 1).otherwise(0).alias("has_steel"),
    )


@register(
    "func_date", extended=True,
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(dayofweek(o_orderdate) AS INTEGER) + 1 AS dow_sun1,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 3 MONTH AS plus_3m,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
         AS days_since_1995,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
""",
)
def func_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery on orders.

    Cross-engine notes: Spark dayofweek is 1=Sunday vs DuckDB 0=Sunday
    (oracle adds 1); Spark date_format == DuckDB strftime for %Y-%m.
    """
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("days_since_1995"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "func_math", extended=True,
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(abs(l_extendedprice - 30000.0), 2) AS abs_diff,
       CAST(ceil(l_discount * 100) AS DOUBLE) AS disc_pct_ceil,
       CAST(floor(l_quantity / 10.0) AS DOUBLE) AS qty_decile,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice + 1), 6) AS price_ln,
       round(log10(l_extendedprice + 1), 6) AS price_log10,
       round(pow(l_quantity, 2), 2) AS qty_sq,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
       CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS price_sign,
       round(greatest(l_quantity, 25.0), 2) AS qty_floor25,
       round(least(l_discount, 0.05), 4) AS disc_cap
FROM lineitem
""",
)
def func_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery on lineitem."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000.0), 2).alias("abs_diff"),
        F.ceil(F.col("l_discount") * 100).cast("double").alias("disc_pct_ceil"),
        F.floor(F.col("l_quantity") / 10.0).cast("double").alias("qty_decile"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.signum(F.col("l_extendedprice") - 30000.0).cast("double").alias("price_sign"),
        F.round(F.greatest("l_quantity", F.lit(25.0)), 2).alias("qty_floor25"),
        F.round(F.least("l_discount", F.lit(0.05)), 4).alias("disc_cap"),
    )


@register(
    "func_array", extended=True,
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
       array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 40), ' '))), ',')
         AS sorted_prefix_tokens,
       CAST(list_contains(string_split(text, ' '), 'spark') AS INTEGER) AS has_spark,
       string_split(text, ' ')[1] AS first_token,
       string_split(text, ' ')[-1] AS last_token
FROM documents
""",
)
def func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/list function battery on tokenized documents (split, distinct,
    sort, contains, element access incl. negative index)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.substring(F.col("text"), 1, 40), " "))),
            ",",
        ).alias("sorted_prefix_tokens"),
        F.array_contains(toks, "spark").cast("int").alias("has_spark"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    )


@register(
    "func_array_lambda",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 5)) AS INTEGER)
         AS n_long_tokens,
       array_to_string(list_transform(string_split(substr(text, 1, 30), ' '),
                                      t -> upper(t)), '|') AS upper_prefix,
       CAST(list_reduce(list_transform(string_split(text, ' '), t -> length(t)),
                        (a, b) -> a + b) AS BIGINT) AS total_token_chars
FROM documents
""",
)
def func_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: filter / transform / aggregate(fold)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
        F.array_join(
            F.transform(F.split(F.substring(F.col("text"), 1, 30), " "), lambda t: F.upper(t)),
            "|",
        ).alias("upper_prefix"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_token_chars"),
    )


@register(
    "func_json",
    # rotated to the extended tier in r13: long-stable, family still
    # exercised by primary twins; driver budget moved to the store layer
    extended=True,
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
            THEN 'high' ELSE 'low' END AS k_bucket
FROM events
""",
)
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props column + conditional logic."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_bucket"),
    )


@register(
    "func_map",
    # rotated to the extended tier in r13: long-stable, family still
    # exercised by primary twins; driver budget moved to the store layer
    extended=True,
    oracle="""
SELECT event_id, event_type,
       round(value, 2) AS v_direct,
       round(value * 2, 2) AS v_doubled
FROM events
""",
)
def func_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type construction + element access (map_from_arrays / getItem).

    The oracle computes the same output scalars directly — the map is
    engine-internal plumbing being proven, not part of the output schema."""
    ev = table(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("v"), F.lit("v2")),
        F.array(F.col("value"), F.col("value") * 2),
    )
    return ev.select(
        "event_id",
        "event_type",
        F.round(m.getItem("v"), 2).alias("v_direct"),
        F.round(m.getItem("v2"), 2).alias("v_doubled"),
    )


@register(
    "func_hash_binary", extended=True,
    oracle="""
SELECT doc_id,
       md5(text) AS text_md5,
       sha256(text) AS text_sha256,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS hash60
FROM documents
""",
)
def func_hash_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary + cryptographic-hash functions; also derives the 60-bit
    cross-engine numeric hash used by the dedup/minhash operators."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.sha2(F.encode(F.col("text"), "UTF-8"), 256).alias("text_sha256"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("int").alias("n_bytes"),
        F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hash60"),
    )


@register(
    "func_pandas_udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS total_charge
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
""",
)
def func_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (Arrow-vectorized): net charge computation.

    Exists to prove the vectorized Python path; at 100 TB this exact
    expression belongs JVM-side (see the oracle), but the UDF column is the
    pattern for kernels Catalyst can't express."""

    @F.pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - disc) * (1.0 + tax)

    l = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    # no round(): double round() implementations disagree on ties across
    # engines; the raw IEEE product (same op order) is bit-identical
    return l.select(
        "l_orderkey",
        "l_linenumber",
        charge(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")).alias(
            "total_charge"
        ),
    )


@register(
    "func_map_in_pandas",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
WHERE event_type IN ('click', 'view')
GROUP BY user_id
""",
)
def func_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas partition-batch operator: per-batch filter + projection,
    then a normal Spark aggregate on top (partial agg in Python would break
    the partial+final contract — Spark does the agg)."""

    def batch_filter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["event_type"].isin(["click", "view"])]
            yield out[["user_id", "value"]]

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    filtered = ev.mapInPandas(batch_filter, schema="user_id bigint, value double")
    return filtered.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "func_apply_in_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_quantity - avg(l_quantity) OVER (PARTITION BY l_returnflag), 6) AS qty_demeaned
FROM lineitem
""",
)
def func_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): per-group demeaning.

    l_quantity is integral, so the group mean is exact in float64 and
    matches the window-function oracle bit-for-bit."""

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        mean_qty = pdf["l_quantity"].sum() / len(pdf)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "qty_demeaned": (pdf["l_quantity"] - mean_qty).round(6),
            }
        )

    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return l.groupBy("l_returnflag").applyInPandas(
        demean, schema="l_orderkey bigint, l_linenumber int, qty_demeaned double"
    )


@register(
    "func_udtf_tokens",
    extended=True,
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ')[1:5] AS toks FROM documents)
SELECT doc_id,
       CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos,
       unnest(toks) AS token
FROM t
""",
)
def func_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) in a LATERAL join: each document row
    expands to its first 5 (pos, token) rows — the UDTF leg of the
    UDF/UDAF/UDTF surface (§2C), distinct from the grouped-map and
    map-in-pandas variants: arbitrary rows OUT per row IN, composable in
    SQL FROM clauses.

    At scale a UDTF is a narrow per-partition transform — no shuffle; the
    lateral join is flatMap-shaped, never a cartesian."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class FirstTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")[:5]):
                yield i, tok

    spark.udtf.register("first_tokens", FirstTokens)
    table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        "SELECT doc_id, pos, token FROM __docs_udtf, LATERAL first_tokens(text)"
    )
