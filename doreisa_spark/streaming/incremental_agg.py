"""Streaming-incremental materialized aggregates on the commit layer.

The materialized-view pattern every training-data pipeline reinvents —
per-domain document counts, per-source token totals, per-user event
stats — kept incrementally instead of rescanned: each micro-batch
commits its PARTIAL aggregate (one tiny groupBy of the batch) through
the exactly-once log (streaming/batch_commit.py), and a read merges
the partials with one aggregate over the partial log. Reading the
view costs O(groups × tiers); the raw history is never rescanned.
This is the classic distributive-aggregate decomposition (the same
algebra Catalyst uses for partial+final hash aggregation, here made
DURABLE across batches):

- ``sum`` / ``count`` partials merge by SUM;
- ``min`` / ``max`` partials merge by MIN / MAX;
- ``avg`` is the caller's ``sum/count`` (document-level recipe below),
  and non-distributive aggregates (exact distinct, medians) are out of
  scope by design — they need the raw rows.

Everything the commit layer provides composes for free, and is tested
to: exactly-once per-batch commits (a redelivered batch cannot
double-count — THE correctness hazard of incremental aggregation),
size-tiered compaction of the partial log (folds CONCATENATE partials;
reads merge, so a fold never changes the view), group takedowns via
tombstones, metadata-only snapshots of the view, and the r12 stats
sidecars: partials commit sorted by the group keys with per-dir/file
key ranges, so a keyed lookup (``read(prune_in=...)`` /
``read(prune_between=...)``) merges only the directories whose key
range can match.

avg recipe::

    store = AggregateStore(spark, root, ["event_type"],
                           {"cnt": ("count", None),
                            "sum_v": ("sum", "value")})
    view = store.read().withColumn("avg_v", F.col("sum_v") / F.col("cnt"))

Reference scope note: the reference engine (AdrienVannson/doreisa)
delegates reductions to dask.array over in-flight chunks
(reference: doreisa/simulation_node.py preprocessing + dask reductions);
persisted incremental aggregation has no reference counterpart — this
is part of the deployment layer this repo adds on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.streaming import batch_commit as BC
from doreisa_spark.streaming.vector_store import read_marker, write_marker_once

# fn -> (batch partial, merge of partials). count's partial is a count;
# its merge is a SUM of counts — the one asymmetric row of the algebra.
_PARTIAL = {
    "sum": lambda e: F.sum(e),
    "count": lambda e: F.count(e if e is not None else F.lit(1)),
    "min": lambda e: F.min(e),
    "max": lambda e: F.max(e),
}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max,
          "last": F.max, "first": F.min}


def _by_partial(fn: str, e: str, opts: dict, batch: DataFrame):
    """fn "last"/"first" — the argmax/argmin pair that turns an
    append-only log into an incrementally-maintained LATEST-STATE
    (upsert / CDC-mirror) table: the partial carries struct(order,
    value), struct comparison is lexicographic, so MAX of structs IS
    argmax-by-order — distributive, roll-up-safe, and deterministic
    when ``by`` is unique per group (make it a struct with a
    tiebreaker, e.g. ``struct(ts, event_id)``). Rows whose order key
    is NULL — or, for a struct order key, with any NULL top-level
    field — are ignored: a CDC row without a timestamp must not win
    the min's nulls-first struct ordering."""
    from pyspark.sql.types import StructType

    ord_e, val = F.expr(opts["by"]), F.expr(e)
    guard = ord_e.isNotNull()
    dt = batch.select(ord_e.alias("_o")).schema[0].dataType
    if isinstance(dt, StructType):
        for f in dt.fields:
            guard = guard & ord_e.getField(f.name).isNotNull()
    s = F.when(guard, F.struct(ord_e.alias("o"), val.alias("v")))
    return F.max(s) if fn == "last" else F.min(s)

# HyperLogLog sketch column (fn "hll"): the mergeable approx-distinct
# the plain algebra can't give — exact COUNT(DISTINCT) is not
# distributive, but an HLL register vector is (merge = element-wise
# MAX), so the store keeps a map<register, rho> per group per batch and
# the view estimates cardinality from the merged registers. All
# JVM-side integer ops: xxhash64 → low HLL_P bits pick the register,
# rho = trailing zeros of the remaining bits + 1 (geometric under a
# uniform hash exactly like the textbook leading-zeros variant;
# trailing zeros are exactly computable as bit_count((w & -w) - 1),
# no float log in the hot path).
HLL_P = 12                      # 4096 registers, rsd ~1.6%
_HLL_M = 1 << HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_MAXRHO = 64 - HLL_P + 1


def _hll_partial(batch: DataFrame, key_cols: list, out: str,
                 expr: str) -> DataFrame:
    h = f"xxhash64({expr})"
    w = f"shiftrightunsigned({h}, {HLL_P})"
    rho = (f"if({w} = 0, {_HLL_MAXRHO}, "
           f"bit_count(({w} & -({w})) - 1) + 1)")
    return (
        batch.where(F.expr(expr).isNotNull())  # SQL DISTINCT skips nulls
        .select(*key_cols,
                F.expr(f"cast({h} & {_HLL_M - 1} as int)").alias("__reg"),
                F.expr(f"cast({rho} as int)").alias("__rho"))
        .groupBy(*key_cols, "__reg").agg(F.max("__rho").alias("__rho"))
        .groupBy(*key_cols).agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("__reg", "__rho")))
            ).alias(out)
        )
    )


def _hist_partial(batch: DataFrame, key_cols: list, out: str, expr: str,
                  opts: dict) -> DataFrame:
    """Fixed-bin histogram sketch (fn "hist"): map<bin, count> per group
    per batch. Bin edges are RECORDED in the store marker, so every
    batch bins identically and the merge is plain per-bin SUM — the
    exactly-mergeable quantile sketch (error bounded by the bin width;
    out-of-range values clamp into the edge bins). Same reason as HLL:
    quantiles aren't distributive, a fixed-edge histogram is."""
    lo, hi, bins = float(opts["lo"]), float(opts["hi"]), int(opts["bins"])
    width = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((F.expr(expr) - lo) / width), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    return (
        batch.where(F.expr(expr).isNotNull())
        .select(*key_cols, b.alias("__bin"))
        .groupBy(*key_cols, "__bin").agg(F.count(F.lit(1)).alias("__n"))
        .groupBy(*key_cols).agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("__bin", "__n")))
            ).alias(out)
        )
    )


def _hll_estimate(regs: DataFrame, key_cols: list, out: str) -> DataFrame:
    """Standard HLL estimator over merged registers: harmonic mean with
    untouched registers counting 2^0, linear-counting correction in the
    small range (E <= 2.5m with empty registers) — which is also what
    makes the all-null group estimate an exact 0."""
    n = F.count("__reg")
    z = F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("__rho"))), F.lit(0.0)) \
        + (F.lit(float(_HLL_M)) - n)
    raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / z
    v = F.lit(float(_HLL_M)) - n
    lin = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v)
    est = F.when((raw <= F.lit(2.5 * _HLL_M)) & (v > 0), lin).otherwise(raw)
    return regs.groupBy(*key_cols).agg(
        F.round(est).cast("bigint").alias(out)
    )


class AggregateStore:
    """Persisted incremental GROUP BY ``key_cols`` view.

    ``aggs``: ``{out_col: (fn, src_expr)}`` with fn in
    sum/count/min/max; ``src_expr`` is any SQL expression over the
    batch columns (None = ``count(*)``). The spec is recorded in a
    write-once marker; a reopened store validates against it so two
    writers can never interleave incompatible partials into one log."""

    def __init__(self, spark: SparkSession, root: str, *,
                 key_cols: "list[str] | None" = None,
                 aggs: "dict | None" = None,
                 compact_every: int | None = 64,
                 commit_mode: "str | None" = None,
                 fenced: "bool | None" = None,
                 target_file_bytes: "int | None" = 128 << 20):
        self.spark = spark
        self.root = root.rstrip("/")
        self._log = f"{self.root}/partials"
        def norm(a):
            # (fn, expr) | (fn, expr, opts) -> (fn, expr, opts-or-None)
            return {
                o: (v[0], v[1],
                    dict(v[2]) if len(v) > 2 and v[2] is not None else None)
                for o, v in a.items()
            }

        spec = read_marker(f"{self.root}/_aggs.json")
        if spec is None:
            if not key_cols or not aggs:
                raise ValueError(
                    f"new store at {self.root}: key_cols and aggs required"
                )
            aggs = norm(aggs)
            for out, (fn, e, opts) in aggs.items():
                if fn not in _PARTIAL and fn not in ("hll", "hist",
                                                     "last", "first"):
                    raise ValueError(
                        f"{out}: fn must be one of "
                        f"{sorted(_PARTIAL) + ['first', 'hist', 'hll', 'last']}"
                        f", got {fn!r} (avg = sum/count at read; hll = "
                        "mergeable approx-distinct; hist = mergeable "
                        "quantile sketch; last/first = argmax/argmin by "
                        "an order key — the latest-state/upsert view; "
                        "exact distinct/medians need the raw rows)"
                    )
                if e is None and fn != "count":
                    raise ValueError(f"{out}: {fn} needs a source expression")
                if fn in ("last", "first") and \
                        not (opts and opts.get("by")):
                    raise ValueError(
                        f"{out}: {fn} needs opts {{'by': <order expr>}} — "
                        "include a tiebreaker for determinism, e.g. "
                        "struct(ts, event_id)"
                    )
                if fn == "hist":
                    if not opts or not {"lo", "hi", "bins"} <= set(opts):
                        raise ValueError(
                            f"{out}: hist needs opts {{lo, hi, bins}} — "
                            "fixed edges are what make the sketch mergeable"
                        )
                    if not (float(opts["lo"]) < float(opts["hi"])
                            and int(opts["bins"]) >= 2):
                        raise ValueError(f"{out}: need lo < hi and bins >= 2")
                if out in key_cols:
                    raise ValueError(f"output column {out} shadows a key")
        else:
            recorded = norm(spec["aggs"])
            if key_cols is not None and list(key_cols) != spec["key_cols"]:
                raise ValueError(
                    f"store at {self.root} groups by {spec['key_cols']}, "
                    f"got {list(key_cols)}"
                )
            if aggs is not None and norm(aggs) != recorded:
                raise ValueError(
                    f"store at {self.root} records aggs {recorded}, "
                    f"got {aggs}"
                )
            key_cols, aggs = spec["key_cols"], recorded
        self.key_cols = list(key_cols)
        self.aggs = dict(aggs)
        self._ddl: "str | None" = (spec or {}).get("ddl")
        self.commit_mode = BC._mode_of(self._log, commit_mode)
        if fenced is None:
            fenced = self.commit_mode == BC.MANIFEST
        self._epoch = (BC.acquire_writer(self._log, mode=self.commit_mode)
                       if fenced else None)
        self.compact_every = compact_every
        self.target_file_bytes = target_file_bytes

    @classmethod
    def from_alias(cls, spark: SparkSession, alias_root: str, name: str,
                   **kw):
        """Open a READ handle on whatever root the named alias points
        at (alias.open_by_alias, unfenced by default) — a rebuilt view
        store hands off blue/green exactly like the vector stores."""
        from doreisa_spark.streaming.alias import open_by_alias

        return open_by_alias(cls, spark, alias_root, name, **kw)

    # ------------------------------------------------------------ write
    def _attach(self, base: DataFrame, right: DataFrame,
                how: str = "left") -> DataFrame:
        """Join ``right`` onto ``base`` by the group keys with
        NULL-SAFE equality: SQL GROUP BY treats NULL as a real group,
        so a null-unsafe key join would silently detach the NULL
        group's sketch/estimate from its row (r12 review finding).
        The right side's keys are renamed to unique temps first — both
        frames derive from the same lineage, and Spark's self-join
        disambiguation makes dropping ``right[k]`` by column reference
        silently drop the LEFT key instead."""
        tmp = {k: f"__rk_{k}" for k in self.key_cols}
        for k, t in tmp.items():
            right = right.withColumnRenamed(k, t)
        cond = None
        for k, t in tmp.items():
            c = base[k].eqNullSafe(F.col(t))
            cond = c if cond is None else cond & c
        return base.join(right, cond, how).drop(*tmp.values())

    def _partial(self, batch: DataFrame) -> DataFrame:
        plain = [
            (_by_partial(fn, e, opts, batch) if fn in ("last", "first")
             else _PARTIAL[fn](F.expr(e) if e is not None else None)
             ).alias(o)
            for o, (fn, e, opts) in self.aggs.items()
            if fn in _PARTIAL or fn in ("last", "first")
        ]
        base = (batch.groupBy(*self.key_cols).agg(*plain) if plain
                else batch.select(*self.key_cols).distinct())
        for o, (fn, e, opts) in self.aggs.items():
            if fn in ("hll", "hist"):
                # left join: a group whose sketch source is all-null in
                # this batch keeps its row with a NULL map (hll
                # estimates it 0, like SQL count(distinct); hist
                # contributes no mass)
                sketch = (_hll_partial(batch, self.key_cols, o, e)
                          if fn == "hll"
                          else _hist_partial(batch, self.key_cols, o, e,
                                             opts))
                base = self._attach(base, sketch)
        return base

    def process_batch(self, batch: DataFrame,
                      batch_id: "int | None" = None) -> None:
        """One tiny groupBy of the batch → exactly-once commit of the
        partial rows, sorted by the group keys with key-range sidecars
        (keyed reads prune the partial log like a store probe). A
        redelivered batch id commits nothing — double-counting is
        structurally impossible, which is the whole reason the partial
        log rides the commit protocol instead of a blind append."""
        if batch_id is None:
            batch_id = BC.next_batch_id(self._log, mode=self.commit_mode)
        part = self._partial(batch)
        if self._ddl is None:
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in part.schema.fields
            )
            write_marker_once(f"{self.root}/_aggs.json", {
                "key_cols": self.key_cols,
                "aggs": {o: list(v) for o, v in self.aggs.items()},
                "ddl": ddl, "v": 1,
            })
            # write-once can LOSE to a concurrent first-ingest: validate
            # the full winning spec, not just adopt its ddl — two
            # incompatible writers must not interleave their partials
            # into one log (r12 review finding)
            won = read_marker(f"{self.root}/_aggs.json")
            if won["key_cols"] != self.key_cols or {
                o: (v[0], v[1], dict(v[2]) if len(v) > 2 and v[2] is not None
                    else None)
                for o, v in won["aggs"].items()
            } != self.aggs:
                raise ValueError(
                    f"store at {self.root} was concurrently created with "
                    f"keys {won['key_cols']} / aggs {won['aggs']}; this "
                    f"writer wanted {self.key_cols} / {self.aggs}"
                )
            self._ddl = won["ddl"]
        shaped = part.repartition(1).sortWithinPartitions(*self.key_cols)
        BC.commit_batch(shaped, self._log, batch_id, mode=self.commit_mode,
                        epoch=self._epoch, stats_cols=self.key_cols)
        ce = self.compact_every
        if ce and batch_id % ce == ce - 1:
            # roll-up fold: every segment re-aggregates to one partial
            # row per group, so the log — and with it the view-read
            # cost — stays O(groups × tiers), never O(batches)
            BC.compact_tiered(self.spark, self._log, self._ddl,
                              mode=self.commit_mode,
                              order_by=self.key_cols,
                              target_file_bytes=self.target_file_bytes,
                              fold_transform=self._roll_up,
                              epoch=self._epoch)

    # ------------------------------------------------------------- read
    def partials(self, *, snapshot: "int | None" = None,
                 prune_in: "dict | None" = None,
                 prune_between: "dict | None" = None) -> DataFrame:
        if self._ddl is None:
            raise ValueError(f"store at {self.root} has no committed state")
        if snapshot is not None:
            return BC.read_snapshot(self.spark, self._log, self._ddl,
                                    snapshot, prune_in=prune_in,
                                    prune_between=prune_between)
        return BC.read_committed(self.spark, self._log, self._ddl,
                                 mode=self.commit_mode, prune_in=prune_in,
                                 prune_between=prune_between)

    def read(self, *, snapshot: "int | None" = None,
             prune_in: "dict | None" = None,
             prune_between: "dict | None" = None) -> DataFrame:
        """The materialized view: one merge aggregate over the partial
        log — O(groups × tiers) rows in, ``groups`` rows out. Keyed
        lookups pass ``prune_in`` / ``prune_between`` over the GROUP
        KEY columns: the sidecars skip non-matching partial dirs/files
        driver-side, and the caller applies the same predicate
        row-level (pruning alone is a superset, exactly like the
        vector-store probes)."""
        m = self._merged_partials(
            self.partials(snapshot=snapshot, prune_in=prune_in,
                          prune_between=prune_between)
        )
        # hll columns leave the merged view as register maps; the VIEW
        # contract is the cardinality estimate — one projection over
        # the merged map, no explode (size + harmonic fold of values)
        for o, (fn, _, _) in self.aggs.items():
            if fn == "hll":
                # size(NULL) is -1 outside ANSI mode — branch, don't
                # coalesce
                n = F.when(F.col(o).isNull(), F.lit(0)) \
                    .otherwise(F.size(F.col(o))).cast("double")
                z = F.coalesce(
                    F.aggregate(F.map_values(F.col(o)), F.lit(0.0),
                                lambda a, x: a + F.pow(F.lit(2.0), -x)),
                    F.lit(0.0),
                ) + (F.lit(float(_HLL_M)) - n)
                raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / z
                v = F.lit(float(_HLL_M)) - n
                lin = F.lit(float(_HLL_M)) * \
                    F.log(F.lit(float(_HLL_M)) / v)
                est = F.when((raw <= F.lit(2.5 * _HLL_M)) & (v > 0),
                             lin).otherwise(raw)
                m = m.withColumn(o, F.round(est).cast("bigint"))
            elif fn in ("last", "first"):
                # the view serves the VALUE; the order key was only the
                # merge's argmax/argmin carrier
                m = m.withColumn(o, F.col(o).getField("v"))
        return m

    def _merged_partials(self, base: DataFrame) -> DataFrame:
        """One VALID partial row per group: plain columns by their
        merge fn, sketch maps by their element-wise merge (hll = MAX
        per register, hist = SUM per bin). A merge of merged partials
        is itself a partial (associativity), which is what lets this
        single definition serve as BOTH the read-side merge and the
        roll-up ``fold_transform`` compaction applies (``_roll_up``)."""
        merged = [
            _MERGE[fn](F.col(o)).alias(o)
            for o, (fn, _, _) in self.aggs.items() if fn in _MERGE
        ]
        view = (base.groupBy(*self.key_cols).agg(*merged) if merged
                else base.select(*self.key_cols).distinct())
        for o, (fn, _, _) in self.aggs.items():
            if fn not in ("hll", "hist"):
                continue
            val, comb = (("__rho", F.max) if fn == "hll"
                         else ("__n", F.sum))
            ent = base.select(
                *self.key_cols,
                F.explode_outer(F.col(o)).alias("__k", val),
            ).where(F.col("__k").isNotNull()).groupBy(
                *self.key_cols, "__k"
            ).agg(comb(val).alias(val))
            maps = ent.groupBy(*self.key_cols).agg(
                F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct("__k", val)))
                ).alias(o)
            )
            # left attach: an all-null-map group keeps its row with a
            # NULL map, exactly like its source partials
            view = self._attach(view, maps)
        return view

    def _roll_up(self, fold: DataFrame) -> DataFrame:
        """compact_tiered ``fold_transform``: re-aggregate the fold so
        a segment holds ONE partial row per group (Druid-style segment
        roll-up) instead of one per (group, source batch) — the
        partial log stays O(groups × tiers) on disk, not O(batches)."""
        cols = [f.split(" ", 1)[0] for f in (self._ddl or "").split(", ")]
        return self._merged_partials(fold).select(*cols)

    def read_quantiles(self, col: str, qs, *,
                       snapshot: "int | None" = None) -> DataFrame:
        """Quantile estimates from a merged ``hist`` sketch column:
        per-group cumulative bin counts (one window over groups × bins
        rows — sketch-bounded, not history-bounded) and linear
        interpolation inside the crossing bin. Output: key columns +
        one ``q_<pct>`` column per requested quantile. Error is
        bounded by the recorded bin width."""
        from pyspark.sql import Window as W

        fn, _, opts = self.aggs[col]
        if fn != "hist":
            raise ValueError(f"{col} is {fn}, read_quantiles needs hist")
        if not qs or not all(0 < float(q) <= 1 for q in qs):
            raise ValueError(f"quantiles must be in (0, 1], got {qs}")
        lo, hi, bins = float(opts["lo"]), float(opts["hi"]), int(opts["bins"])
        width = (hi - lo) / bins
        # merge the bins straight off the partial log: going through
        # read() would compute — and discard — every OTHER aggregate
        # column, including other sketches' explode/join chains (r12
        # review finding)
        ex = self.partials(snapshot=snapshot).select(
            *self.key_cols, F.explode_outer(F.col(col)).alias("__bin", "__n")
        ).where(F.col("__bin").isNotNull()).groupBy(
            *self.key_cols, "__bin"
        ).agg(F.sum("__n").alias("__n"))
        w = W.partitionBy(*self.key_cols).orderBy("__bin")
        cum = ex.select(
            *self.key_cols, "__bin", "__n",
            F.sum("__n").over(w).alias("__cum"),
            F.sum("__n").over(
                W.partitionBy(*self.key_cols)
            ).alias("__tot"),
        )
        view = None
        for q in qs:
            name = f"q_{str(q).replace('.', '_')}"
            tgt = F.col("__tot") * float(q)
            hit = cum.where(F.col("__cum") >= tgt).groupBy(
                *self.key_cols
            ).agg(
                F.min(F.struct("__bin", "__n", "__cum", "__tot"))
                .alias("__h")
            ).select(
                *self.key_cols,
                (F.lit(lo) + (
                    F.col("__h.__bin")
                    + (F.col("__h.__tot") * float(q)
                       - (F.col("__h.__cum") - F.col("__h.__n")))
                    / F.col("__h.__n")
                ) * F.lit(width)).alias(name),
            )
            # null-safe attach (a NULL group key is a real group);
            # every q in (0, 1] yields the same group set — the last
            # bin's cumulative equals the total — so left is exact
            view = hit if view is None else self._attach(view, hit)
        return view

    # ------------------------------------------------- lifecycle plumbing
    def delete_groups(self, values, *, col: "str | None" = None,
                      batch_id: "int | None" = None) -> bool:
        """Takedown of whole groups: tombstones mask every PARTIAL row
        whose ``col`` (default: first key column) matches — the group
        vanishes from the view; partials ingested after the delete
        re-accumulate from zero (the commit layer's covers rule)."""
        if self._ddl is None:
            raise ValueError(f"store at {self.root} has no committed state")
        col = col or self.key_cols[0]
        ktype = dict(
            (f.split(" ", 1)[0], f.split(" ", 1)[1])
            for f in self._ddl.split(", ")
        ).get(col, "bigint")
        if batch_id is None:
            batch_id = BC.next_batch_id(
                self._log, BC._tomb_root(self._log), mode=self.commit_mode
            )
        return BC.delete_keys(self.spark, self._log, values, batch_id,
                              key_cols=col, key_type=ktype,
                              mode=self.commit_mode, epoch=self._epoch)

    def snapshot(self) -> int:
        """Pin the view as-of now (metadata-only): ``read(snapshot=)``
        reproduces it regardless of later ingest/deletes/compaction."""
        return BC.create_snapshot(self._log, mode=self.commit_mode,
                                  epoch=self._epoch)

    def drop_snapshot(self, snapshot_id: int) -> bool:
        return BC.drop_snapshot(self._log, snapshot_id,
                                mode=self.commit_mode, epoch=self._epoch)

    def expire_snapshots(self, *, keep_last: int) -> list[int]:
        return BC.expire_snapshots(self._log, keep_last=keep_last,
                                   mode=self.commit_mode, epoch=self._epoch)
