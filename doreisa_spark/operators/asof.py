"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as union + ordered window with ``last(..., ignorenulls=True)``,
the shuffle-minimal distributed formulation: one shuffle on the partition
key, no per-group Python, no driver materialization. This scales to any
partition cardinality (vs ``pd.merge_asof`` in ``applyInPandas``, which
requires each group to fit in one Arrow batch — kept as the fallback for
very wide per-key histories with few keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    *,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` partition.

    Returns ``left`` with one extra column per entry of ``value_cols``,
    named ``f"{col}{suffix}"`` (nullable — null when no prior right row).

    Single shuffle: both sides are unioned and window-partitioned by ``on``;
    ties at equal timestamps resolve right-before-left so a right row at
    exactly ``left_ts`` is visible (<= semantics). When several RIGHT rows
    share the same (on, right_ts), the one with the greatest ``value_cols``
    tuple (struct ordering, field by field) wins — a total order, so the
    result is deterministic across runs/partitionings
    (``last(..., ignorenulls=True)`` alone would pick an arbitrary row of
    the tie group).
    """
    marker = "__asof_is_left"
    ts = "__asof_ts"
    seq = "__asof_seq"

    lcols = [F.col(c) for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias(ts),
        F.lit(1).alias(marker),
        # left rows never compete on seq (marker already separates them)
        F.struct(
            *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols]
        ).alias(seq),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(marker),
        # deterministic right-side tiebreak: total order over the value tuple
        F.struct(*[F.col(c) for c in value_cols]).alias(seq),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).select(*[c for c in l_tagged.columns])

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(F.col(ts), F.col(marker), F.col(seq).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled: list[Column] = [
        F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in value_cols
    ]
    out = unioned.select(
        *[F.col(c) for c in left.columns], F.col(marker), *filled
    ).where(F.col(marker) == 1)
    return out.drop(marker)
