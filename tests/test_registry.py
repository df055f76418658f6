"""Registry integrity + a fast differential sample against DuckDB.

The full both-tier differential (every registered query) runs via
tools/check_oracle.py (and the round driver); here a representative fast
subset guards refactors."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import normalize, value_hash  # noqa: E402

from doreisa_spark.catalog import TABLES
from doreisa_spark.registry import (
    extended_oracles,
    extended_queries,
    oracles,
    queries,
)

from conftest import SF_SMALL

SAMPLE = [
    "q1_pricing_summary",
    "join_left_anti",
    "agg_rollup",
    "window_ranking",
    "setop_except",  # extended since the r13 rotation
    "func_string",   # extended since the r13 rotation
    "agg_join_incremental",
    "agg_var_incremental",
    "subq_correlated_agg",
    "text_token_stats",
    "dedup_exact",
    "mm_meta_extract",
]


def test_registry_shape():
    qs, os_ = queries(), oracles()
    # primary tier = the driver's 50-query correctness budget, all
    # oracle-backed (extended variants live in registry.EXTENDED — see
    # tests/test_extended_oracles.py)
    assert len(qs) == 50
    assert set(os_) == set(qs)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_differential_sample(spark, duck, name):
    qs = {**extended_queries(), **queries()}
    os_ = {**extended_oracles(), **oracles()}
    sdf = qs[name](spark, SF_SMALL).toPandas()
    odf = duck.execute(os_[name]).fetchdf()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(normalize(sdf)) == value_hash(normalize(odf))
