"""Driver-literal DataFrames as LocalRelations, not Python RDDs.

``spark.createDataFrame(list_of_tuples, schema)`` routes through
``applySchemaToPythonRDD``: the driver pickles the rows into an RDD with
``spark.default.parallelism`` slices, and EVERY scan of the frame runs
that many tasks, each round-tripping a Python worker to deserialize a
handful of rows (a 4-row band dim scanned as 32 Python tasks, measured
~0.4 s of pure overhead per use in the bench sandbox; an EMPTY frame
still schedules a full wave of empty tasks). The Arrow path
(``createDataFrame(pyarrow.Table)``) instead lands a **LocalRelation**:
zero tasks, folded by Catalyst, broadcast directly — the right shape for
literal dims, query sets, LUTs, and read-path empties, whose data is by
construction driver-held and tiny (optimization guide §4: don't pay the
Python boundary for data that never needed to cross it).

``literal_frame`` converts through an Arrow schema derived from the
TARGET Spark schema, so types (int vs bigint, float vs double, nested
arrays, binary) match ``createDataFrame(rows, ddl)`` exactly — verified
schema- and value-identical for every shape used in this repo. Any
conversion surprise falls back to the classic path rather than failing
the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def literal_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` that plans as a
    LocalRelation (no Python-RDD scan). ``schema`` is a DDL string or
    StructType; ``rows`` is a (possibly empty) sequence of tuples/Rows.
    """
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import _parse_datatype_string

        st = (schema if isinstance(schema, StructType)
              else _parse_datatype_string(schema))
        names = [f.name for f in st.fields]

        def as_dict(r):
            if isinstance(r, dict):
                return r
            if hasattr(r, "asDict"):  # pyspark Row
                return r.asDict()
            return dict(zip(names, r))

        tbl = pa.Table.from_pylist(
            [as_dict(r) for r in rows], schema=to_arrow_schema(st)
        )
        return spark.createDataFrame(tbl)
    except Exception:
        # conversion edge (exotic type, malformed row): the classic
        # pickled-RDD path is slower but always correct
        return spark.createDataFrame(list(rows), schema)


def centroid_arg_frame(
    spark: SparkSession, cent_pairs, *, cell_type: str = "int",
    elem_type: str = "float",
) -> DataFrame:
    """ONE-ROW frame carrying the whole (KB-sized) centroid list as an
    ``array<struct<cell, cemb>>`` column named ``cents`` — the broadcast
    operand of the map-only IVF argmax assignment
    (operators/vectors.ivf_argmax_cell_expr): cross-joining this single
    row is a BroadcastNestedLoopJoin, i.e. a map over the corpus, never
    a shuffle. ``cell_type``/``elem_type`` pin the column dtypes to the
    source centroid frame's so the fold arithmetic (element CASTs) and
    the served cell dtype are byte-identical to the former per-cell
    broadcast frame."""
    rows = sorted((int(c), list(e)) for c, e in cent_pairs)
    return literal_frame(
        spark,
        [(rows,)],
        f"cents array<struct<cell:{cell_type},cemb:array<{elem_type}>>>",
    )
