"""Materialize an sf1 dataset (10× sf0.1) by key-shifted replication.

The driver ships sf0.1 at most; the sf1 run in BASELINE.md needs ~6M
lineitem rows so per-query engine work dominates Spark's local-mode
scheduling floor. Replication recipe:

- `region`/`nation` are fixed dimensions — copied once, unshifted.
- Every other table is unioned 10× with its key columns shifted by
  ``replica * (max_key + 1)`` per key domain, so FK joins land exactly as
  in the original (each replica is a self-contained TPC-H-ish universe
  over the shared nation/region dims) and key-match cardinalities scale
  linearly.
- `events.ts` is shifted by +40 days per replica: session/window state
  stays bounded per replica instead of multiplying per-key event density,
  which is how real traffic grows (more time × more users, not 10 events
  at the same instant).
- `documents.text` gets a short replica suffix for replicas > 0 so the
  corpus gains near-duplicates, not 10 exact copies of every doc — exact
  dedup keeps its original within-replica duplicate groups, MinHash gains
  realistic cross-replica near-dup pairs.

Writes one parquet per table under the (gitignored) output dir.
Deterministic: no RNG anywhere.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.tmp_io/sf1"
REPLICAS = int(os.environ.get("SF1_REPLICAS", "10"))
# Optional comma-separated table subset (e.g. SF1_TABLES=documents for the
# sf10 scaling-curve run, where only the compute-heavy document queries
# need 100x data) — empty means all tables.
ONLY = {t for t in os.environ.get("SF1_TABLES", "").split(",") if t}

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count() or 8}")

for t in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
    )

K = {
    "cust": con.sql("SELECT max(c_custkey)+1 FROM customer").fetchone()[0],
    "supp": con.sql("SELECT max(s_suppkey)+1 FROM supplier").fetchone()[0],
    "part": con.sql("SELECT max(p_partkey)+1 FROM part").fetchone()[0],
    "order": con.sql("SELECT max(o_orderkey)+1 FROM orders").fetchone()[0],
    "event": con.sql("SELECT max(event_id)+1 FROM events").fetchone()[0],
    "user": con.sql("SELECT max(user_id)+1 FROM events").fetchone()[0],
    "doc": con.sql("SELECT max(doc_id)+1 FROM documents").fetchone()[0],
    "vec": con.sql("SELECT max(vec_id)+1 FROM embeddings").fetchone()[0],
}

REPL = {
    "customer": f"""
        SELECT c_custkey + i*{K['cust']} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM customer CROSS JOIN range({REPLICAS}) r(i)""",
    "supplier": f"""
        SELECT s_suppkey + i*{K['supp']} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM supplier CROSS JOIN range({REPLICAS}) r(i)""",
    "part": f"""
        SELECT p_partkey + i*{K['part']} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM part CROSS JOIN range({REPLICAS}) r(i)""",
    "orders": f"""
        SELECT o_orderkey + i*{K['order']} AS o_orderkey,
               o_custkey + i*{K['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders CROSS JOIN range({REPLICAS}) r(i)""",
    "lineitem": f"""
        SELECT l_orderkey + i*{K['order']} AS l_orderkey,
               l_partkey + i*{K['part']} AS l_partkey,
               l_suppkey + i*{K['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM lineitem CROSS JOIN range({REPLICAS}) r(i)""",
    "events": f"""
        SELECT event_id + i*{K['event']} AS event_id,
               ts + to_days(CAST(i*40 AS INTEGER)) AS ts,
               user_id + i*{K['user']} AS user_id,
               event_type, value, props
        FROM events CROSS JOIN range({REPLICAS}) r(i)""",
    "documents": f"""
        SELECT doc_id + i*{K['doc']} AS doc_id,
               CASE WHEN i = 0 THEN text ELSE text || ' r' || i END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars ELSE n_chars + 2 + len(CAST(i AS VARCHAR)) END AS n_chars
        FROM documents CROSS JOIN range({REPLICAS}) r(i)""",
    "embeddings": f"""
        SELECT vec_id + i*{K['vec']} AS vec_id, embedding, label
        FROM embeddings CROSS JOIN range({REPLICAS}) r(i)""",
}

os.makedirs(OUT, exist_ok=True)
for t in ("region", "nation"):
    if ONLY and t not in ONLY:
        continue
    con.execute(f"COPY (SELECT * FROM {t}) TO '{OUT}/{t}.parquet' (FORMAT parquet)")
    print(t, "copied")
for t, sql in REPL.items():
    if ONLY and t not in ONLY:
        continue
    con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT parquet, ROW_GROUP_SIZE 262144)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(t, n, "rows")
print("done ->", OUT)
