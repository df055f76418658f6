"""Salted join — the explicit skew-mitigation operator.

AQE's skew-join splitting (enabled in session.py) handles skewed SHUFFLE
partitions after the fact; salting is the planning-time tool for the
pathological case it can't fix: one join key so hot that every row of the
big side lands in one task (power-law user_ids, null-heavy keys).

Mechanics: the big side gets a deterministic salt in [0, n_salts) derived
from its row content, splitting each hot key across n_salts tasks; the
small side is replicated n_salts times (a crossJoin with spark.range —
acceptable precisely because that side is small). The join key becomes
(key, salt), so the result multiset is IDENTICAL to the unsalted join —
verified by tests/test_operators.py.

Cost model: big-side shuffle unchanged in volume (+8 bytes of salt),
small side inflated n_salts×. Choose n_salts ≈ (hot-key rows) /
(rows-per-task target); 8-32 covers most real skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from doreisa_spark.operators.broadcast import bcast


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⨝ ``small`` on column ``on`` with big-side salting.

    ``how`` supports the outer-ness of the BIG side ('inner', 'left');
    small-side outer joins would need per-salt null handling and are out
    of scope (replicate-and-salt the other way around instead)."""
    if how not in {"inner", "left"}:
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # content-derived salt: deterministic across retries (a random salt
    # breaks Spark's task-retry idempotence), and rows of one hot key
    # spread because their non-key columns differ
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt)
    s = small.crossJoin(
        bcast(
            # spark.range would need the session; sequence+explode keeps
            # this a pure DataFrame transform
            small.sparkSession.range(n_salts).withColumnRenamed("id", "__salt")
        )
    )
    joined = b.join(s, on=[on, "__salt"], how=how)
    return joined.drop("__salt")
