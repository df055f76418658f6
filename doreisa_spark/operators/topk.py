"""Top-K per group — window row_number, the shuffle-bounded formulation.

At scale: one shuffle on the group key; each partition sorts locally.
For extreme K=1 cases, ``max_by``/``min_by`` aggregates avoid the sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    *,
    rank_col: str = "rk",
) -> DataFrame:
    """Keep the top-k rows of each group under a deterministic ordering.

    ``order_cols`` must produce a total order within each group (append a
    unique key as tie-break) or row_number is nondeterministic.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
