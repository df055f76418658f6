"""Local replica of the driver's DuckDB differential gate.

Runs every registered query on Spark AND its oracle on DuckDB over the
same parquet tables, then compares row count, (sorted) column names, and
an order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]

Checks BOTH registry tiers (primary + extended) by default; restrict with
explicit query names. Exit code 0 iff everything matches.
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from doreisa_spark.catalog import TABLES  # noqa: E402
from doreisa_spark.registry import EXTENDED, REGISTRY, _ensure_loaded  # noqa: E402
from doreisa_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values to strings (stable across engines)
    def cell(v):
        if v is None or v != v:  # NaN/None
            return "␀"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(v)
        return str(v)

    out = df.apply(lambda col: col.map(cell))
    rows = ["\x1f".join(r) for r in out.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def value_hash(rows: list[str]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def band_compare(sdf: pd.DataFrame, odf: pd.DataFrame, rtol: float) -> list[str]:
    """Compare a sketch query against its exact oracle within relative
    tolerance: non-numeric (key) columns must align exactly after sorting,
    every numeric cell must satisfy |spark - exact| <= rtol * max(|exact|, 1).
    Returns a list of problems (empty = pass)."""
    problems: list[str] = []
    if len(sdf) != len(odf):
        return [f"rowcount spark={len(sdf)} duck={len(odf)}"]
    # normalize casing first so column access below can't KeyError on a
    # Spark-vs-DuckDB case difference
    sdf = sdf.rename(columns=str.lower)
    odf = odf.rename(columns=str.lower)
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        return [f"columns spark={s_cols} duck={o_cols}"]
    sdf = sdf.reindex(s_cols, axis=1)
    odf = odf.reindex(o_cols, axis=1)
    num = [c for c in s_cols if pd.api.types.is_numeric_dtype(sdf[c])]
    keys = [c for c in s_cols if c not in num]
    if not keys and len(sdf) > 1:
        # without exact key columns the two sides can't be row-aligned
        # (each would sort by its own approximate values) — a band oracle
        # must group by at least one non-numeric key
        return ["band oracle needs a non-numeric key column to align rows"]
    sdf = sdf.sort_values(keys or s_cols, ignore_index=True)
    odf = odf.sort_values(keys or o_cols, ignore_index=True)
    for c in keys:
        if not sdf[c].astype(str).equals(odf[c].astype(str)):
            problems.append(f"key column {c} differs after sort")
    for c in num:
        sv, ov = sdf[c].astype(float), odf[c].astype(float)
        bound = ov.abs().clip(lower=1.0) * rtol
        bad = (sv - ov).abs() > bound
        if bad.any():
            i = int(bad.idxmax())
            problems.append(
                f"{c} out of ±{rtol:.0%} band at row {i}: "
                f"spark={sv[i]} exact={ov[i]}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    _ensure_loaded()

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures, passes, weak = [], [], []
    for name, q in sorted({**REGISTRY, **EXTENDED}.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if q.oracle is None and q.band_oracle is not None:
            try:
                odf = con.execute(q.band_oracle).fetchdf()
            except Exception:
                print(f"FAIL {name}: DUCKDB ERROR (band)\n{traceback.format_exc()}")
                failures.append(name)
                continue
            problems = band_compare(sdf, odf, q.band_rtol)
            if problems:
                print(f"FAIL {name}: {'; '.join(problems)}")
                failures.append(name)
            else:
                passes.append(name)
                print(
                    f"ok   {name}: rows={len(sdf)} "
                    f"({time.time() - t0:.1f}s, ±{q.band_rtol:.0%} band)"
                )
            continue
        if q.oracle is None:
            weak.append(name)
            print(f"weak {name}: rows={len(sdf)} ({time.time() - t0:.1f}s, no oracle)")
            continue
        try:
            odf = con.execute(q.oracle).fetchdf()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR\n{traceback.format_exc()}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(odf)}")
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if [c.lower() for c in s_cols] != [c.lower() for c in o_cols]:
            problems.append(f"columns spark={s_cols} duck={o_cols}")
        if not problems:
            s_rows, o_rows = normalize(sdf), normalize(odf)
            if value_hash(s_rows) != value_hash(o_rows):
                diff = [
                    (a, b) for a, b in zip(s_rows, o_rows) if a != b
                ][:3]
                problems.append(f"value hash mismatch; first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            passes.append(name)
            print(f"ok   {name}: rows={len(sdf)} ({time.time() - t0:.1f}s)")

    print(
        f"\n{len(passes)} ok, {len(weak)} weak (no oracle), {len(failures)} FAILED"
        + (f": {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
