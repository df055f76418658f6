"""Physical-plan shape assertions — the 100 TB scale posture, pinned.

Correctness gates prove values; these prove the PLAN stays the one that
survives a 1000-executor cluster: filters reach the parquet scan, small
dimensions broadcast, windows are partitioned (never single-partition),
top-k never sorts globally, and map-only operators stay shuffle-free.
A regression here is invisible at sf0.01 and fatal at 100 TB.
"""

from __future__ import annotations

import pytest

from conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    from doreisa_spark.registry import extended_queries, queries

    qs = {**extended_queries(), **queries()}
    df = qs[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q3_uses_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_small_dim_joins_broadcast(spark):
    plan = _plan(spark, "join_inner_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_exact_single_shuffle_on_fingerprint(spark):
    plan = _plan(spark, "dedup_exact")
    assert plan.count("Exchange") == 1  # one md5-keyed shuffle, nothing else
    # partial aggregation before the exchange (map-side combine)
    assert "partial_count" in plan


def test_range_frame_window_is_partitioned(spark):
    plan = _plan(spark, "window_range_frame")
    assert "Window" in plan
    # the value-bucket partitioning must reach the Window operator: its
    # required distribution is hashpartitioning on `part`, never all-to-one
    assert "hashpartitioning(part" in plan
    assert "SinglePartition" not in plan


def test_all_primary_windows_are_partitioned(spark):
    for name in (
        "window_ranking",
        "window_lag_lead",
        "window_range_frame",
        "window_topk_per_group",
    ):
        plan = _plan(spark, name)
        assert "SinglePartition" not in plan, f"{name} windows on a single partition"


def test_text_scan_prunes_columns(spark):
    # quality scoring needs doc_id + text (+ n_chars): the scan must not
    # drag lang/source along
    plan = _plan(spark, "text_quality_score")
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "lang" not in scan and "source" not in scan


def test_meta_extract_is_map_only(spark):
    # metadata extraction is a pure map: no exchange anywhere in the plan
    plan = _plan(spark, "mm_meta_extract")
    assert "Exchange" not in plan


def test_sample_stratified_is_map_only(spark):
    plan = _plan(spark, "sample_stratified")
    assert "Exchange" not in plan


def test_range_band_join_broadcasts_tiny_dim(spark):
    plan = _plan(spark, "join_range_bands")
    assert "BroadcastNestedLoopJoin" in plan


def test_tensor_sum_fuses_to_one_python_stage(spark):
    # generation + kernel chain + partial reduce must be ONE Arrow stage
    assert _plan(spark, "tensor_global_sum").count("MapInPandas") == 1


def test_tensor_minmax_one_python_stage_per_branch(spark):
    # min().crossJoin(max()): exactly one fused Arrow stage per reduction
    # branch, joined broadcast (two 1-row sides), never a shuffle join
    plan = _plan(spark, "tensor_minmax")
    assert plan.count("MapInPandas") == 2
    assert "SortMergeJoin" not in plan


def test_q7_broadcasts_all_dims(spark):
    # only lineitem⨝orders may shuffle (at tiny SF it broadcasts too);
    # supplier/customer/nation always broadcast — never a sort-merge join
    plan = _plan(spark, "q7_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q17_never_shuffles_the_fact_table(spark):
    # both the threshold build and the probe side join via broadcast;
    # the only exchanges feed aggregates, not sort-merge joins
    plan = _plan(spark, "q17_small_quantity")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_q19_pushes_common_residuals_to_scans(spark):
    # the OR-of-brackets keeps a common quantity envelope that must reach
    # the lineitem scan, and the join stays broadcast on partkey
    plan = _plan(spark, "q19_bracket_revenue")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan


def test_ivf_assignment_shuffles_narrow_rows_only(spark):
    # the centroid cross join must broadcast; the assignment window must
    # partition by cid (never single-partition)
    plan = _plan(spark, "sim_ann_ivf")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SinglePartition" not in plan


def test_bpe_token_count_no_key_shuffle(spark):
    # the only exchange is the intentional CPU-spread round-robin
    # repartition (regex work over a single input split); no data ever
    # shuffles on a key
    plan = _plan(spark, "text_bpe_token_count")
    assert plan.count("Exchange") == 1
    assert "RoundRobinPartitioning" in plan


def test_curation_pipeline_single_corpus_shuffle(spark):
    # the keeper build is the ONLY full-corpus shuffle: md5 fingerprints,
    # never bodies; the semi join broadcasts the keeper side or shuffles
    # narrow ids — either way no document body moves twice
    plan = _plan(spark, "pipeline_corpus_curation")
    assert "LeftSemi" in plan
    assert "partial_min" in plan  # map-side combine under the keeper agg


def test_bucketed_groupby_has_no_shuffle(spark):
    # the bucketed layout satisfies the agg's required distribution: the
    # scan reads 8 pre-hashed buckets and the HashAggregate runs in place
    plan = _plan(spark, "source_bucketed_groupby")
    assert "Exchange hashpartitioning" not in plan
    assert "Bucketed: true" in plan


def test_global_sort_is_range_partitioned(spark):
    # a full orderBy must distribute by key ranges, never collapse to one
    # partition; each range sorts locally
    plan = _plan(spark, "sort_global_range")
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan


def test_q16_suppression_list_broadcasts(spark):
    # the NOT IN list and the part dim both broadcast; no sort-merge join
    # ever touches the fact table
    plan = _plan(spark, "q16_supplier_cnt")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q21_aggregates_replace_self_joins(spark):
    # the EXISTS/NOT-EXISTS pair is lowered to per-order aggregates:
    # supplier lookup broadcasts, top-20 is TakeOrderedAndProject (no
    # global sort), and no sort-merge self-join of lineitem survives
    plan = _plan(spark, "q21_waiting_supplier")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_q22_scalar_broadcast_and_anti_join(spark):
    # the global average is a broadcast nested-loop of a 1-row side; the
    # dormancy check is an anti join with its date filter pushed to scan
    plan = _plan(spark, "q22_sales_opportunity")
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate" in plan


def test_ivf_blas_assignment_is_map_only_after_spread(spark):
    # the GEMM assignment path: no assignment window, no cross join —
    # the only exchanges are the CPU-spread repartition and the final
    # top-k; cell assignment itself is one MapInPandas over the corpus
    plan = _plan(spark, "sim_ann_ivf_blas")
    assert "MapInPandas" in plan
    assert "Window" in plan  # final per-query rank only


def test_pq_encode_blas_is_map_only_after_spread(spark):
    # PQ encoding is one MapInPandas over the corpus: the only exchange
    # tolerated is catalog.table's CPU-spread repartition — nothing about
    # the encode itself may shuffle, window, or join
    plan = _plan(spark, "sim_pq_encode_blas")
    assert "MapInPandas" in plan
    assert plan.count("Exchange") <= 1
    assert "Window" not in plan
    assert "Join" not in plan


def test_pq_encode_expression_path_no_join(spark):
    # the fold-expression encode: codebook rides as literals, so the plan
    # has no join/window at all (argmin is array arithmetic per row)
    plan = _plan(spark, "sim_pq_encode")
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1  # CPU-spread only


def test_pii_redact_is_map_only(spark):
    plan = _plan(spark, "text_pii_redact")
    assert plan.count("Exchange") <= 1  # CPU-spread only
    assert "Join" not in plan
    assert "Aggregate" not in plan


def test_pca_dim_stats_partial_agg(spark):
    # the (dim) hash agg must combine map-side: partial_sum before the
    # single 64-group exchange
    plan = _plan(spark, "emb_dim_stats")
    assert "partial_sum" in plan
    assert plan.count("Exchange") <= 2  # CPU-spread + the 64-group agg


def test_ivf_pq_broadcasts_probes_and_lut(spark):
    # candidate generation joins must broadcast the tiny sides (probes,
    # LUT, query set) — the corpus-side codes never sort-merge
    plan = _plan(spark, "sim_ann_ivf_pq")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_prefix_filter_no_cartesian(spark):
    # candidates must come from the prefix-token equi-join; the quadratic
    # all-pairs shape is the ORACLE's job, never the engine's
    plan = _plan(spark, "dedup_prefix_filter")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_is_keyed_join(spark):
    # equi-shuffle on the customer key with the interval predicate as a
    # residual — not a nested-loop over all order pairs
    plan = _plan(spark, "join_interval_overlap")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_heavy_hitters_candidates_broadcast(spark):
    # the exact recount joins the corpus against the (small) MG candidate
    # set by broadcast — the token stream itself never sort-merge-joins
    plan = _plan(spark, "text_heavy_hitters")
    assert "MapInPandas" in plan
    assert "SortMergeJoin" not in plan


def test_bcast_guard_hints_small_and_drops_oversized(spark):
    """r7 verdict perf nit #1: forced broadcast hints are size-guarded.
    Under the threshold the hint fires (BroadcastHashJoin, the measured
    win); an 'oversized' build side (threshold forced to 1 byte) falls
    back to the plain join and Catalyst/AQE picks a non-forced strategy."""
    from doreisa_spark.catalog import table
    from doreisa_spark.operators.broadcast import CONF, bcast, estimated_size_bytes

    c = table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment")
    o = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    est = estimated_size_bytes(c)
    assert est is not None and est > 0
    hinted = o.join(bcast(c), o.o_custkey == c.c_custkey)
    plan = hinted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # explicit per-call ceiling below the estimate → no hint in the plan
    unhinted = o.join(bcast(c, max_bytes=1), o.o_custkey == c.c_custkey)
    lplan = unhinted._jdf.queryExecution().optimizedPlan().toString()
    assert "UnresolvedHint" not in lplan and "ResolvedHint" not in lplan
    # session-conf ceiling drives the default path the 60 call sites use
    prior = spark.conf.get(CONF, None)
    try:
        spark.conf.set(CONF, "1")
        guarded = o.join(bcast(c), o.o_custkey == c.c_custkey)
        gplan = guarded._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in gplan
    finally:
        if prior is None:
            spark.conf.unset(CONF)
        else:
            spark.conf.set(CONF, prior)


def test_bcast_scalar_aggregates_keep_hint_at_any_scale(spark):
    """Ungrouped aggregates are estimated at ONE row, so scalar frames
    (avg_qty / max-revenue style) keep their broadcast hints even under
    a tiny ceiling — the guard only kills SF-scaling builds."""
    from pyspark.sql import functions as F

    from doreisa_spark.catalog import table
    from doreisa_spark.operators.broadcast import bcast, estimated_size_bytes

    li = table(spark, SF_SMALL, "lineitem")
    scalar = li.agg(F.avg("l_quantity").alias("aq"))
    est = estimated_size_bytes(scalar)
    assert est is not None and est < 1024  # one-row estimate
    joined = li.crossJoin(bcast(scalar, max_bytes=4096))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_curation_admission_never_shuffles_history(spark, tmp_path):
    """The curation store's seen-history probe must scan history
    map-only: the batch's bounded fingerprint set is an InSet filter at
    the seen scan (r10 — the broadcast-semi per-row probe cost 6.9 s vs
    the 1.1 s scan floor at 50M fps) and the bounded hit set broadcasts
    back for the anti-join — no Exchange may carry the (corpus-sized)
    seen log. The naive batch-ANTI-JOIN-seen shape would: a left-anti
    join can only broadcast its right side."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_curation import CurationStore

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    store = CurationStore(spark, str(tmp_path / "cur"))
    half = docs.where(F.col("doc_id") % 2 == 0)
    store.process_batch(half, 0)  # seed real history
    fp = F.md5(F.col("text").cast("binary")).alias("fp")
    canon = docs.select("doc_id", "lang", "text", fp)
    admit = store._admit(canon, batch_id=1)
    plan = admit._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    # and the shape is value-correct: exactly the odd docs get admitted
    admitted_ids = {r["doc_id"] for r in admit.select("doc_id").collect()}
    dup = {
        r["doc_id"]
        for r in canon.join(store.seen(before=1), "fp", "left_semi").collect()
    }
    expect = {r["doc_id"] for r in docs.collect()} - dup
    assert admitted_ids == expect


def test_snapshot_probe_keeps_pruned_scan_shape(spark, tmp_path):
    """A point-in-time ANN probe (``snapshot=``) must plan exactly like
    the live probe: the probed-bucket IN filter pushed into the PINNED
    parquet scan, the query relation broadcast, no sort-merge join —
    pinning is metadata-only and must not cost plan shape. And because
    the planned delete POSTDATES the pin, the snapshot read plans ZERO
    tombstone anti-joins while the live read plans one."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_ann import LSHVectorStore

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    store = LSHVectorStore(spark, str(tmp_path / "ann"))
    store.process_batch(e.where(F.col("vec_id") < 200), 0)
    sid = store.snapshot()
    store.process_batch(e.where(F.col("vec_id") >= 200), 1)
    store.delete_vectors([5], 2)  # postdates the pin
    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.where(F.col("vec_id") < 2).collect()
    ]
    snap_plan = (
        store.query_topk_vectors(queries, 5, snapshot=sid)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "In(bucket" in snap_plan  # pruning survives the pinned read
    assert "SortMergeJoin" not in snap_plan
    assert "LeftAnti" not in snap_plan  # post-pin delete: no masking join
    live_plan = (
        store.query_topk_vectors(queries, 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in live_plan  # the live read DOES mask it


def test_distinct_arrangement_reads_two_exchanges(spark, tmp_path):
    """The support-count arrangement's scale posture (r15): the
    distinct read is exactly pair-fold + re-group — 2 exchanges, no
    window, no join — and the exact top-k/quantile reads add their
    per-group window WITHOUT a third exchange (the window's
    hashpartitioning on the group keys is reused by the final
    aggregate). A third exchange here means the re-group stopped
    riding the window's shuffle — invisible at test scale, a whole
    extra pass over O(pairs) at 100 TB."""
    from pyspark.sql import functions as F

    from doreisa_spark.streaming.incremental_distinct import DistinctView

    v = DistinctView(spark, str(tmp_path / "planshape"),
                     key_cols=["k"], value_col="v")
    v.process_batch(spark.range(200).select(
        (F.col("id") % 5).alias("k"), (F.col("id") % 11).alias("v")))

    def plan(df):
        df.write.mode("overwrite").format("noop").save()
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan(v.read_distinct())
    assert p.count("Exchange") == 2, p
    assert "Window" not in p and "Join" not in p
    for df in (v.read_topk(3), v.read_quantiles([0.5, 0.9])):
        p = plan(df)
        assert p.count("Exchange") == 2, p
        assert "SinglePartition" not in p  # the window is partitioned
