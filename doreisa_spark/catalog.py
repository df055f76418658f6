"""Table catalog over the driver-generated parquet test data.

Reads are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown / column pruning / partition pruning against the files. At cluster
scale the same entry points read partitioned directories; nothing here
assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Memoized input-split counts, keyed by (app_id, sf_dir, table). The probe
# (df.rdd.getNumPartitions) forces a DataFrame→RDD plan conversion, so it
# must run at most once per table per session, not once per table() call.
_SPLITS_CACHE: dict[tuple[str, str, str], int] = {}

# Memoized INFERRED schemas, keyed the same way. A bare
# spark.read.parquet(path) runs a footer schema-inference job (a 1-task
# "parquet at" job) on EVERY call — per table, per query, per bench pass
# (~30 ms job + 40-60 ms driver gap each; a 6-table join pays ~0.45 s of
# pure metadata latency per invocation). A deployment reads through a
# catalog/metastore whose schemas are known (Iceberg/Delta manifests —
# optimization guide §6), so re-inferring per query is pure local waste.
# The memo holds the schema Spark itself inferred from the SAME files on
# first read and replays it via reader.schema(...), which skips only the
# inference job — scan, pushdown, and pruning are unchanged. Keyed by
# app_id so a new session (possibly against regenerated testdata)
# re-infers; this caches session planning metadata, never data or results.
_SCHEMA_CACHE: dict[tuple[str, str, str], "object"] = {}

# Memoized BASE DataFrame handles (post ts-normalization, pre-spread).
# Re-deriving the relation per call costs ~15-20 ms of py4j round-trips
# (reader construction + schema transfer + the events normalization
# chain) per table per query — a 6-table join pays ~0.1 s of pure driver
# chatter per invocation. A DataFrame is an immutable query-plan handle:
# handing the same one back is exactly what a catalog/metastore client
# does with a resolved table, and it caches planning metadata only —
# every action on it still scans parquet. Keyed by the SESSION OBJECT
# (weakly), not just app_id: ``spark.newSession()`` shares the
# application but carries its own SQLConf/state, and a DataFrame must
# only ever be served back to the session that built it. Each cached
# entry is (df, needs_conf_pins): for ``events`` under a normalized
# encoding the correctness of every downstream truncation/rendering
# depends on two session confs (nanosAsLong + UTC session TZ), so the
# hit path re-runs the same cheap driver-only conf checks the build
# path does (ADVICE r15: a caller who restored their TZ after a
# catalog query must get the pin — and the warning — again).
import weakref as _weakref

_DF_CACHE: "_weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], tuple[DataFrame, bool]]]" = (
    _weakref.WeakKeyDictionary()
)


def _pin_events_confs(spark: SparkSession) -> None:
    """Re-assert the two runtime confs the normalized events table needs.

    Driver-only conf gets (~µs); safe to run on every cache hit."""
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        import warnings

        warnings.warn(
            "doreisa_spark.catalog: normalizing events.ts requires "
            "spark.sql.session.timeZone=UTC (both for the NTZ "
            "reinterpretation and for truncation/rendering of the "
            "rebuilt timestamps); pinning it for this session. Set "
            "the TZ back after running catalog queries if your "
            "application needs another zone.",
            stacklevel=3,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def _input_splits(spark: SparkSession, sf_dir: str, name: str, df: DataFrame) -> int:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key not in _SPLITS_CACHE:
        _SPLITS_CACHE[key] = df.rdd.getNumPartitions()
    return _SPLITS_CACHE[key]


def table(
    spark: SparkSession, sf_dir: str, name: str, *, spread: bool = False
) -> DataFrame:
    """Load one table. Column pruning + filter pushdown happen downstream.

    ``spread=True`` is for CPU-dense downstream pipelines (shingling,
    minhash, cosine folds): at small SF a table arrives as one parquet
    row-group = 1 input split, which would serialize all the per-row
    compute onto one core, so the caller asks for an up-front repartition
    to cluster width. Scan-bound queries must NOT ask for it — the extra
    shuffle of raw bodies costs more than it buys (measured 3.8× on
    dedup_exact). On a real cluster inputs arrive as many splits and the
    repartition is skipped by the guard below; Catalyst still pushes
    filters/pruning through a Repartition node when it does fire.

    ``events.ts`` has shipped under two parquet encodings across testdata
    generations — TIMESTAMP(NANOS) (needs ``nanosAsLong`` + a µs rebuild)
    and plain ``timestamp[us]`` with isAdjustedToUTC=false (reads as
    TIMESTAMP_NTZ in Spark 4.x, which refuses numeric casts). Both are
    normalized HERE to a session-TZ ``timestamp`` so every downstream
    consumer can ``cast("long")``/``cast("double")`` freely. The confs must
    be set on WHATEVER session calls us (the external driver supplies its
    own), so they are applied at runtime, not only in session.py; the TZ is
    pinned UTC so the NTZ→TZ reinterpretation is the identity and matches
    what DuckDB's oracle sees."""
    skey = (spark.sparkContext.applicationId, sf_dir, name)
    session_dfs = _DF_CACHE.setdefault(spark, {})
    cached = session_dfs.get((sf_dir, name))
    if cached is not None:
        cached_df, needs_pins = cached
        if needs_pins:
            _pin_events_confs(spark)
        if spread:
            target = spark.sparkContext.defaultParallelism
            if _input_splits(spark, sf_dir, name, cached_df) < target:
                return cached_df.repartition(target)
        return cached_df
    if name == "events":
        # Narrow legacy flag: lets Spark 4.x read TIMESTAMP(NANOS) parquet at
        # all (it errors without it). Must be set before the read.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cached_schema = _SCHEMA_CACHE.get(skey)
    if cached_schema is not None:
        df = spark.read.schema(cached_schema).parquet(f"{sf_dir}/{name}.parquet")
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _SCHEMA_CACHE[skey] = df.schema
    needs_pins = False
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type in ("bigint", "timestamp_ntz"):
            # Both REBUILT/REINTERPRETED encodings produce a
            # session-TZ-rendered TIMESTAMP column: the NTZ branch
            # reinterprets wall-clock fields in the session TZ, and the
            # nanos branch's rebuilt timestamp is rendered/truncated in the
            # session TZ by every downstream date_trunc/hour/collect.
            # Either way the session must be UTC to match a DuckDB oracle
            # reading the same file as naive-UTC wall clock. The pin is
            # SCOPED to these two branches (ADVICE r6): a testdata
            # generation shipping plain TIMESTAMP needs no normalization
            # and gets no session mutation. Callers that deliberately run
            # under another TZ are warned rather than silently overridden
            # (ADVICE r5: no silent conf clobbering).
            if spark.conf.get("spark.sql.session.timeZone") != "UTC":
                import warnings

                warnings.warn(
                    "doreisa_spark.catalog: normalizing events.ts requires "
                    "spark.sql.session.timeZone=UTC (both for the NTZ "
                    "reinterpretation and for truncation/rendering of the "
                    "rebuilt timestamps); pinning it for this session. Set "
                    "the TZ back after running catalog queries if your "
                    "application needs another zone.",
                    stacklevel=2,
                )
                spark.conf.set("spark.sql.session.timeZone", "UTC")
        if ts_type == "bigint":
            # integer division — double division drifts ±1µs at 1e18 magnitudes
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
            needs_pins = True
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            needs_pins = True
    session_dfs[(sf_dir, name)] = (df, needs_pins)
    if spread:
        target = spark.sparkContext.defaultParallelism
        if _input_splits(spark, sf_dir, name, df) < target:
            df = df.repartition(target)
    return df


# Memoized exact column min/max from parquet FOOTER statistics, keyed by
# (sf_dir, table, column). The ingest-split queries (aggregates.py) need
# a table's integer-key range only to derive deterministic micro-batch
# cut points; running a Spark aggregate job for that is two jobs + a
# driver gap per invocation, while the footers already carry exact
# min/max for plain integer columns (guide §6 — manifest metadata over
# scans; DuckDB/Iceberg answer this from metadata too). Planning
# metadata only, same memo posture as _SCHEMA_CACHE.
_MINMAX_CACHE: dict[tuple[str, str, str], tuple] = {}


def column_minmax(spark: SparkSession, sf_dir: str, name: str, col: str):
    """Exact (min, max) of a top-level integer column, from parquet row-
    group statistics when every row group carries them (exact for
    physical INT32/INT64 — never truncated like string stats), else from
    a Spark aggregate. NULL handling matches Spark MIN/MAX (stats ignore
    nulls; an all-null/empty table falls through to the Spark path and
    returns (None, None) exactly as before)."""
    key = (sf_dir, name, col)
    if key in _MINMAX_CACHE:
        return _MINMAX_CACHE[key]
    lo = hi = None
    ok = True
    try:
        import glob as _glob

        import pyarrow.parquet as _pq

        path = f"{sf_dir}/{name}.parquet"
        files = (
            [path]
            if os.path.isfile(path)
            else sorted(_glob.glob(f"{path}/*.parquet"))
        )
        if not files:
            ok = False
        for p in files:
            md = _pq.ParquetFile(p).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ci = names.index(col) if col in names else -1
            if ci < 0:
                ok = False
                break
            for rg in range(md.num_row_groups):
                cc = md.row_group(rg).column(ci)
                st = cc.statistics
                if (
                    st is None
                    or not st.has_min_max
                    or st.physical_type not in ("INT32", "INT64")
                ):
                    ok = False
                    break
                if st.num_values > 0:
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            if not ok:
                break
    except Exception:
        ok = False
    if not ok or lo is None:
        from pyspark.sql import functions as F

        lo, hi = (
            table(spark, sf_dir, name)
            .agg(F.min(col), F.max(col))
            .first()
        )
    _MINMAX_CACHE[key] = (lo, hi)
    return (lo, hi)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
