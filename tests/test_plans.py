"""Physical-plan quality gates — the SURVEY §4 optimizer claims,
asserted against actual `.explain` output so a regression in plan
shape fails CI, not just a benchmark.

Checked per claim:
- projection + predicate pushdown reach the Parquet scan,
- dimension joins broadcast (no shuffle of the fact side),
- grouped aggregation is two-phase (partial before the exchange),
- top-k compiles to TakeOrderedAndProject (never a global sort),
- no accidental CartesianProduct outside the declared cross join,
- scalar-function pipelines stay inside WholeStageCodegen (no
  Python/BatchEvalPython in the hot path).
"""

from __future__ import annotations

import io
import contextlib

from datafusion_tpc_spark import registry
from tests.conftest import SF_DIR

registry.load_all()


def _plan(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_and_projection_push_into_scan(spark):
    plan = _plan(spark, "q_filter_proj")
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]" in plan
    # projection pruning: only the 3 referenced columns reach the reader
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in read_schema and "l_quantity" not in read_schema


def test_dimension_joins_broadcast(spark):
    for name in ("q_join_broadcast", "q_join_inner"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
    # q_join_broadcast must not shuffle before the aggregation's own
    # exchange: exactly one Exchange (the groupBy), rest broadcast
    plan = _plan(spark, "q_join_broadcast")
    n_exchanges = sum(
        1 for l in plan.splitlines() if l.strip().startswith("(") and ") Exchange" in l
    )
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"


def test_aggregation_is_two_phase(spark):
    plan = _plan(spark, "q_agg_avg")
    # partial + final HashAggregate around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "GlobalSort" not in plan


def test_no_accidental_cartesian(spark):
    for name in sorted(registry.QUERIES):
        if name in ("q_join_cross",) or name.startswith(("q_stream", "q_mm_decode")):
            continue
        if name in ("q_dedup_ngram", "q_dedup_embed"):  # heavyweight; shapes tested elsewhere
            continue
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_scalar_pipeline_stays_in_codegen(spark):
    for name in ("q_fn_math", "q_fn_string", "q_pred_algebra"):
        df = registry.QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()  # simple mode: '*(n)' prefixes = codegen stages
        plan = buf.getvalue()
        assert "*(" in plan, f"{name} has no whole-stage-codegen stage:\n{plan}"
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            f"{name} fell off the JVM fast path"
        )


def test_partitioned_scan_prunes(spark):
    """q_scan_partitioned's status predicate must become a partition
    filter (pruned directories never listed), not a data filter."""
    registry.QUERIES["q_scan_partitioned"](spark, SF_DIR)  # ensure layout exists
    plan = _plan(spark, "q_scan_partitioned")
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_orderstatus" in pf  # predicate landed in PartitionFilters
    # and it is not re-checked as a pushed data filter
    assert "EqualTo(o_orderstatus,F)" not in plan.replace(pf, "")


def test_pipeline_rowlocal_ops_stay_in_codegen(spark):
    """Sampling/split/redaction are scan-speed row-local expressions:
    no Python boundary, no shuffle anywhere in the plan."""
    for name in ("q_pipe_sample", "q_pipe_split", "q_pipe_pii_redact",
                 "q_pipe_quality_filter"):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "Exchange" not in plan, name
        # formatted mode marks codegen stages with a `*` prefix
        assert "* Project" in plan or "* Filter" in plan, name


def test_pipeline_tfidf_broadcasts_df_side(spark):
    """BM25: the document-frequency side (vocabulary-sized)
    broadcasts; the corpus is never shuffled twice for it. TF-IDF
    (r12): df is a COUNT window over the tf stream's term partition —
    no dfreq join at all; the only join left is the broadcast 1-row
    N, and nothing may plan a sort-merge join."""
    plan = _plan(spark, "q_pipe_bm25")
    assert "BroadcastHashJoin" in plan
    plan = _plan(spark, "q_pipe_tfidf")
    assert "SortMergeJoin" not in plan
    assert "Window" in plan
    assert "Broadcast" in plan  # the 1-row N


def test_contamination_broadcasts_eval_set(spark):
    plan = _plan(spark, "q_pipe_contamination")
    assert "BroadcastHashJoin" in plan


def test_tpch_shapes(spark):
    """Q1 partial-aggregates before its exchange; Q10 ends in
    TakeOrdered with nation broadcast; Q18's HAVING subquery reaches
    the orders join as a semi-join."""
    q1 = _plan(spark, "q_tpch_q1")
    assert q1.count("HashAggregate") >= 2  # partial + final
    q10 = _plan(spark, "q_tpch_q10")
    assert "TakeOrderedAndProject" in q10
    assert "BroadcastHashJoin" in q10
    q18 = _plan(spark, "q_tpch_q18")
    assert "LeftSemi" in q18
    assert "TakeOrderedAndProject" in q18


def test_grouped_topk_uses_window_group_limit(spark):
    """q_topk_group (rank-filter shape) must compile to
    WindowGroupLimit: map tasks keep k rows per group BEFORE the
    shuffle, the grouped analog of TakeOrderedAndProject."""
    plan = _plan(spark, "q_topk_group")
    assert "WindowGroupLimit" in plan


def test_bloom_filter_runtime_injection(spark):
    """Spark's runtime bloom-filter row pruning (on by default in 4.x)
    must inject on a shuffle join whose build side carries a selective
    filter: the filtered orders side aggregates into a bloom filter
    that pre-filters lineitem rows BEFORE the shuffle — at 100 TB this
    cuts shuffle bytes by the filter's selectivity without any manual
    work. Local files sit under the application-side scan threshold,
    so the test drops it to zero (and disables broadcast to force the
    shuffle join); both confs are restored."""
    import io
    import contextlib

    from pyspark.sql import functions as F

    from datafusion_tpc_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderstatus") == "F")
        q = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain("formatted")
        assert "bloom_filter_agg" in buf.getvalue(), "runtime bloom filter not injected"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dpp_subquery_is_injected(spark):
    """q_scan_dpp's fact scan must carry a dynamicpruning partition
    filter (runtime subquery on the broadcast dim), not a full listing
    of all partitions."""
    registry.QUERIES["q_scan_dpp"](spark, SF_DIR)  # ensure layout exists
    plan = _plan(spark, "q_scan_dpp")
    assert "dynamicpruning" in plan.lower(), "DPP subquery missing from plan"


def test_upsert_never_shuffles_base(spark):
    """q_pipe_upsert must stay broadcast anti-join + union: zero
    exchanges anywhere — the window/row_number formulation would
    range-sort the whole corpus."""
    plan = _plan(spark, "q_pipe_upsert")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
    assert "Window" not in plan and "Sort" not in plan


def test_vocab_topk_uses_take_ordered(spark):
    plan = _plan(spark, "q_text_vocab")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # map-side combine


def test_chunking_plan_shapes(spark):
    """q_pipe_chunk is pure row-local expression work — zero shuffle,
    zero Python; q_pipe_pack's only shuffle is the bucket groupBy
    feeding one applyInPandas."""
    chunk = _plan(spark, "q_pipe_chunk")
    assert "Exchange" not in chunk
    assert "BatchEvalPython" not in chunk and "ArrowEvalPython" not in chunk
    pack = _plan(spark, "q_pipe_pack")
    n_exchanges = sum(
        1 for l in pack.splitlines() if l.strip().startswith("(") and ") Exchange" in l
    )
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"
    assert "FlatMapGroupsInPandas" in pack


def test_tpch_q4_semi_join_with_residual(spark):
    """Q4's EXISTS must decorrelate to a LEFT SEMI join carrying the
    non-equi date residual — never a distinct+inner-join
    materialization — and the 9-month window must prune the orders
    scan (pushed filters on o_orderdate)."""
    q4 = _plan(spark, "q_tpch_q4")
    assert "LeftSemi" in q4
    assert "GreaterThanOrEqual(o_orderdate" in q4  # date filter pushed to scan
    assert "HashAggregate" in q4


def test_tpch_q6_predicates_reach_scan(spark):
    """Q6 is the predicate-pushdown stress: all range predicates must
    reach the parquet reader (row-group pruning on l_shipdate stats),
    read schema limited to the 4 referenced columns, and the single
    aggregate two-phased."""
    q6 = _plan(spark, "q_tpch_q6")
    pushed = next(l for l in q6.splitlines() if "PushedFilters" in l)
    for want in ("l_shipdate", "l_discount", "l_quantity"):
        assert want in pushed, (want, pushed)
    read_schema = next(l for l in q6.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" in read_schema and "l_returnflag" not in read_schema
    assert q6.count("HashAggregate") >= 2  # partial + final


def test_bucketed_join_no_exchange(spark):
    """operators/bucketing.py claim: both sides written bucketBy(8,
    orderkey) → the sort-merge join's distribution requirement is
    satisfied by file layout, so NO Exchange feeds the join — the
    only shuffles in the whole plan are the post-join groupBy and the
    presentation sort on 3 rows. Scans must actually report the
    bucketed layout."""
    plan = _plan(spark, "q_join_bucketed")
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") >= 2, "scans are not bucket-aware"
    # The tree section of formatted explain (everything before the
    # first blank line) shows structure by indentation: no Exchange
    # may sit BELOW the SortMergeJoin node (deeper-indented after it).
    tree = plan.split("\n\n")[0].splitlines()
    smj_at = next(i for i, l in enumerate(tree) if "SortMergeJoin" in l)
    smj_depth = len(tree[smj_at]) - len(tree[smj_at].lstrip())
    below_join = [
        l
        for l in tree[smj_at + 1 :]
        if (len(l) - len(l.lstrip())) > smj_depth
    ]
    assert below_join, "could not resolve the join subtree"
    assert not any("Exchange" in l for l in below_join), (
        f"an Exchange feeds the bucketed join: {below_join}"
    )
    # above the join: the groupBy hash exchange and the tiny
    # presentation-sort range exchange only
    above = [l for l in tree[:smj_at] if "Exchange" in l]
    assert len(above) == 2, f"expected 2 post-join shuffles, got {above}"


def test_zorder_box_prunes_partitions(spark):
    """q_layout_zorder: the 2-D box must become a zbucket IN-list in
    PartitionFilters (file-level skipping on both key dimensions), and
    the cell cover must be a small fraction of the 256-cell grid."""
    from datafusion_tpc_spark.operators import layout

    registry.QUERIES["q_layout_zorder"](spark, SF_DIR)  # ensure layout exists
    plan = _plan(spark, "q_layout_zorder")
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "zbucket" in pf
    # the IN-list the scan prunes on covers a small fraction of the
    # 256-cell grid (inputFiles() is pre-pruning, so assert the cover
    # itself — the PartitionFilters line above is what applies it)
    _, max_p, max_s = layout._zorder_copy(spark, SF_DIR)
    cover = layout.box_cover(max_p, max_s)
    assert 0 < len(cover) < 64, f"cell cover not selective: {cover}"
    # and the exact box survives as residual data filters
    assert "l_partkey" in plan and "l_suppkey" in plan


def test_hardneg_rank_uses_window_group_limit(spark):
    """q_sim_hardneg: per-anchor top-3 must compile to
    WindowGroupLimit (map-side truncation before the rank shuffle) —
    the grouped analog of TakeOrdered, same gate as q_topk_group."""
    plan = _plan(spark, "q_sim_hardneg")
    assert "WindowGroupLimit" in plan


def test_rrf_candidate_cut_is_take_ordered(spark):
    """q_sim_rrf: each candidate list must be cut via
    TakeOrderedAndProject (map-side top-K), never a partition-less
    rank-then-filter window (WindowGroupLimit does not fire on global
    windows — measured r6 — so that shape single-partition-sorts the
    corpus)."""
    plan = _plan(spark, "q_sim_rrf")
    assert "TakeOrderedAndProject" in plan


def test_forget_purge_is_broadcast_anti(spark):
    """q_pipe_forget: the tombstone purge must ride the document scan
    as a broadcast anti join — never a co-partitioning shuffle of the
    corpus against a tiny forget-list."""
    plan = _plan(spark, "q_pipe_forget")
    assert "BroadcastHashJoin LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_two_scans_max(spark):
    """(r12) q_pipe_tfidf's document frequency is a COUNT window over
    the term partition of the tf stream — the broadcast-dfreq form
    re-executed the corpus scan+explode lineage (3 scans, measured
    ~23% slower). Allowed scans: the token stream + the 1-row N
    count; a third scan means the join-back shape crept back."""
    df = registry.QUERIES["q_pipe_tfidf"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("Scan parquet") <= 2, "tfidf re-scans the corpus"


def test_sharding_and_curriculum_windows_are_partitioned(spark):
    """q_pipe_shard / q_pipe_curriculum: their ranking windows must
    partition (by source / lang) — a partition-less window would
    funnel the corpus into one task. No SinglePartition exchange
    anywhere in either plan."""
    for name in ("q_pipe_shard", "q_pipe_curriculum"):
        plan = _plan(spark, name)
        assert "SinglePartition" not in plan, name
        assert "hashpartitioning" in plan, name


def test_zorder_box_skips_files_measured(spark):
    """The z-order benefit MEASURED, not just plan-shaped (VERDICT r5
    item 7): count distinct `_metadata.file_name` actually read by the
    pruned box scan vs the total file population of the z-copy, at
    sf0.1. The pruned read must touch at most the box's cell-cover
    fraction of the files (cover < 64 of 256 cells ⇒ < ~25%, with one
    file per populated cell directory)."""
    from pyspark.sql import functions as F

    from datafusion_tpc_spark.operators import layout

    sf_dir = "/root/testdata/sf0.1"
    path, _, _ = layout._zorder_copy(spark, sf_dir)
    total = (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("f"))  # file_name is
        # NOT unique across partition dirs (one task writes the same
        # part-XXXXX name into many zbucket=N/ dirs)
        .distinct()
        .count()
    )
    read = (
        layout.zorder_read(spark, sf_dir)
        .select(F.col("_metadata.file_path").alias("f"))
        .distinct()
        .count()
    )
    assert total >= 200, f"z-copy unexpectedly sparse: {total} files"
    assert 0 < read < total * 0.3, f"no file skipping measured: {read}/{total}"


def test_bloom_probe_no_fact_exchange(spark):
    """q_join_bloom (operators/bloom.py): the fact probe must be pure
    broadcast joins — the only Exchange allowed is the tiny bloom
    build's own aggregation (positions → word OR), never the orders
    side."""
    plan = _plan(spark, "q_join_bloom")
    assert plan.count("BroadcastHashJoin") >= 3  # 3 word lookups
    # no SortMergeJoin anywhere — fact side never co-partitions
    assert "SortMergeJoin" not in plan


def test_skyline_candidate_antijoin_is_broadcast(spark):
    """q_skyline: the dominance anti-join runs over the PRUNED
    candidate set via BroadcastNestedLoopJoin (quadratic only in
    candidates); the corpus-side work is one aggregation."""
    plan = _plan(spark, "q_skyline")
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan


def test_ema_single_window_no_join(spark):
    """q_win_ema: truncated EMA must compile to one Window over one
    user_id exchange — no self-join fallback, no Python."""
    plan = _plan(spark, "q_win_ema")
    assert "Window" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scd2_reuses_user_partitioning(spark):
    """q_scd2: both window passes hash-partition by user_id; Catalyst
    must plan exactly ONE shuffle (the second window's requirement is
    satisfied by the first's output partitioning)."""
    plan = _plan(spark, "q_scd2")
    n_exchanges = sum(
        1
        for l in plan.splitlines()
        if l.strip().startswith("(") and ") Exchange" in l
    )
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"


def test_weighted_sample_take_ordered(spark):
    """q_pipe_sample_weighted: priority top-k must be
    TakeOrderedAndProject (O(k) heap per partition), never a global
    Sort."""
    plan = _plan(spark, "q_pipe_sample_weighted")
    assert "TakeOrderedAndProject" in plan


def test_r7_prefix_join_verify_width_is_pinned(spark):
    """q_dedup_prefix: the CPU-dense verify stage must keep its
    explicit core-width repartition (cpu_width(spark) since r16; AQE's
    byte-based coalescing would fold the tiny-bytes candidate set into
    one task and serialize the hash-set intersections — measured
    3.8 s -> sub-second)."""
    plan = _plan(spark, "q_dedup_prefix")
    assert "REPARTITION_BY_NUM" in plan
    assert "CartesianProduct" not in plan


def test_r7_hll_register_agg_is_two_phase(spark):
    """q_agg_hll: the 256-register MAX agg must partial-combine
    map-side — the property that makes the sketch mergeable at scale."""
    plan = _plan(spark, "q_agg_hll")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_r7_pq_codebooks_broadcast(spark):
    """q_sim_pq: centroid codebooks (K·dim doubles) must broadcast —
    the corpus side never shuffles for assignment."""
    plan = _plan(spark, "q_sim_pq")
    assert "BroadcastHashJoin" in plan


def test_r7_domain_cap_window_group_limit(spark):
    """q_pipe_domain_cap: the rank<=K filter must rewrite to
    WindowGroupLimit (map-side per-source top-K heap before the
    window exchange) — the shape that keeps a hot domain from
    shuffling its full row set into one reducer."""
    plan = _plan(spark, "q_pipe_domain_cap")
    assert "WindowGroupLimit" in plan


def test_r7_semdedup_centroids_broadcast(spark):
    """q_dedup_semantic: the |labels|-row centroid table must
    broadcast onto the corpus; the only row shuffle is the explicit
    32-way repartition(label) feeding the per-cluster GEMM."""
    plan = _plan(spark, "q_dedup_semantic")
    assert "BroadcastHashJoin" in plan
    assert "REPARTITION_BY_NUM" in plan


def test_r7_lenbucket_agg_is_two_phase(spark):
    """q_pipe_lenbucket: the bucket rollup must partial-aggregate
    map-side — shuffle carries ≤~20 cap groups, never rows."""
    plan = _plan(spark, "q_pipe_lenbucket")
    assert plan.count("HashAggregate") >= 2


def test_r7_ldiv_distinct_is_partial(spark):
    """q_dq_ldiv: the distinct-count must expand to a two-phase
    aggregate keyed at (QI class × sensitive bucket) cardinality —
    no row-level shuffle."""
    plan = _plan(spark, "q_dq_ldiv")
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan


def test_r7_temperature_no_row_shuffle_joins(spark):
    """q_pipe_temperature: the two scalar totals must broadcast onto
    the |sources|-row aggregate (BroadcastNestedLoopJoin); a
    SortMergeJoin would mean the allocator shuffles rows."""
    plan = _plan(spark, "q_pipe_temperature")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_r7_cdc_chunking_width_is_pinned(spark):
    """q_pipe_cdc: the CPU-dense chunking stage must keep its
    explicit 32-way repartition off the unsplittable single-row-group
    scan (AQE would coalesce the tiny-bytes exchange to one task)."""
    plan = _plan(spark, "q_pipe_cdc")
    assert "REPARTITION_BY_NUM" in plan


def test_r7_ndcg_corpus_never_shuffles(spark):
    """q_sim_ndcg: candidate generation must be the q_sim_topk shape —
    broadcast 1-row query vector onto the corpus scan + TakeOrdered
    per-partition heaps; the corpus itself must not shuffle or
    sort-merge. The window stages run on the 10-row top-k only."""
    plan = _plan(spark, "q_sim_ndcg")
    assert "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_r7_calibration_agg_is_two_phase(spark):
    """q_dq_calibration: the 10-bin integer-moment rollup must
    partial-aggregate map-side (shuffle carries 10 groups of BIGINT
    sums, never rows), and the grand-total join onto the bins must be
    a broadcast, not a row shuffle."""
    plan = _plan(spark, "q_dq_calibration")
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan


def test_r7_autocorr_count_is_two_phase(spark):
    """q_evt_autocorr: the only corpus-sized stage is the day-keyed
    count, which must partial-combine map-side; the lag sweep joins
    run on the O(days) series (broadcast, no sort-merge)."""
    plan = _plan(spark, "q_evt_autocorr")
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan


def test_r7_tclose_single_scan_then_grid(spark):
    """q_dq_tclose: one corpus rollup (map-side partial agg) feeding
    grid-sized broadcast joins — no sort-merge join anywhere."""
    plan = _plan(spark, "q_dq_tclose")
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan


def test_r7_chi2_marginals_broadcast(spark):
    """q_dq_chi2: the contingency rollup partial-aggregates map-side;
    marginal/grid joins run broadcast on <=100 rows."""
    plan = _plan(spark, "q_dq_chi2")
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan


def test_r7_readability_agg_is_two_phase(spark):
    """q_text_readability: the per-language rollup of the row-local
    regex counts must partial-combine map-side — the shuffle carries
    |languages| rows of integer sums, never documents."""
    plan = _plan(spark, "q_text_readability")
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" not in plan


def test_r8_vocab_rank_no_global_window(spark):
    """q_dedup_prefix's dictionary encoding (VERDICT r7 item 4): the
    vocabulary rank must be the two-pass bucketed form — a window
    PARTITIONED by the data-derived prefix bucket — never a
    Window.orderBy with no partitionBy (a single-reducer gather of
    the whole vocabulary at web-scale vocab)."""
    import contextlib
    import io

    from datafusion_tpc_spark.functions.shingles import shingle_table
    from datafusion_tpc_spark.operators.prefix_join import _ranked_vocab_local

    df = _ranked_vocab_local(shingle_table(spark, SF_DIR))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # every window spec must carry the bucket partition column
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        # the PARTITION clause (columns before the first ordered term)
        # must contain bkt — "bkt#" merely appearing anywhere would
        # also match the banned Window.orderBy('bkt', 's') shape,
        # where bkt is an ORDER column ("bkt#N ASC ...") and the
        # window still gathers into one reducer (review r8)
        head = spec.split(",", 1)[0].strip()
        assert "bkt#" in head and " ASC" not in head and " DESC" not in head, (
            f"window not partitioned by bkt: {spec}"
        )


def test_r8_two_pass_rank_equals_global_rank(spark):
    """The assembled sid (per-bucket offsets + local rank) must
    equal the global row_number over s — the boundary-independence
    argument in prefix_join.py made executable."""
    from pyspark.sql import Window, functions as F

    from datafusion_tpc_spark.functions.shingles import shingle_table
    from datafusion_tpc_spark.operators.prefix_join import _vocab_sids

    sh = shingle_table(spark, SF_DIR)
    two_pass = _vocab_sids(sh).select("s", "sid")
    global_rank = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .select("s", F.row_number().over(Window.orderBy("s")).alias("sid"))
    )
    mismatch = (
        two_pass.join(global_rank.withColumnRenamed("sid", "gsid"), "s")
        .filter(F.col("sid") != F.col("gsid"))
        .count()
    )
    n = two_pass.count()
    assert n > 0 and mismatch == 0, (n, mismatch)


def test_sim_batch_uses_window_group_limit(spark):
    """q_sim_batch: the per-qid top-5 must compile to WindowGroupLimit
    (map-side per-partition truncation before the qid exchange — the
    batched-retrieval scale claim in its docstring), and the 10-row
    query batch must broadcast."""
    plan = _plan(spark, "q_sim_batch")
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_r9_seed_pick_no_corpus_window(spark):
    """The k-means-family seed selection (VERDICT r8 item 2 / r9 item
    1): seeds must come from seed_pick's TakeOrderedAndProject(K)
    map-side heap, never from a corpus-wide partition-less
    row_number window (Exchange SinglePartition + global Sort of
    every (vec_id, hash) row).

    Three assertions:
    1. seed_pick's own plan: TakeOrderedAndProject present, and its
       single partition-less window sits ABOVE the K-row limit (the
       plan is a linear chain, so the Window line precedes the
       TakeOrderedAndProject line in topmost-first explain output).
    2. The three consumers (kmeans, pq, quantization) actually call
       seed_pick — source-level wiring check so a revert to the
       inline ranked form fails here, not in a benchmark.
    3. q_sim_kmeans / q_sim_pq full plans: TakeOrderedAndProject
       present and exactly ONE partition-less windowspecdefinition
       (the K-row cid numbering) — a reintroduced corpus window
       would add a second.
    """
    import inspect
    import re

    from datafusion_tpc_spark.catalog import load_table
    from datafusion_tpc_spark.functions.seeds import seed_pick
    from datafusion_tpc_spark.operators import kmeans, pq, quantization

    # 1. seed_pick subtree shape
    v = load_table(spark, SF_DIR, "embeddings").select("vec_id")
    df = seed_pick(v, "gate:", 4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
    # Anchor to the Window OPERATOR line (ADVICE r10): a bare
    # plan.index("Window") also matches WindowGroupLimit or a column
    # named *window*, weakening the ordering assertion.
    win_op = re.search(r"^[\s+:*(\d)-]*Window\b(?!GroupLimit)", plan, re.M)
    assert win_op, plan
    tko_at = plan.index("TakeOrderedAndProject")
    assert win_op.start() < tko_at, plan  # window consumes the K-row limit

    # 2. wiring: all three trainers call seed_pick
    for mod in (kmeans, pq, quantization):
        src = inspect.getsource(mod)
        assert "seed_pick(" in src, mod.__name__
        assert mod.seed_pick is seed_pick, mod.__name__

    # 3. full trainer plans
    for qname in ("q_sim_kmeans", "q_sim_pq"):
        p = _plan(spark, qname)
        assert "TakeOrderedAndProject" in p, qname
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", p)
        # exactly one window — the K-row cid numbering (partition-less
        # by design: its input is the TakeOrdered K-row result, not
        # the corpus). A second window = the ranked form crept back.
        assert len(specs) == 1, (qname, specs)


def test_r10_batched_evals_use_window_group_limit(spark):
    """q_sim_ndcg_batch / q_sim_anneval_batch (VERDICT r9 item 4):
    the per-qid top-k must compile to WindowGroupLimit (map-side
    truncation before the qid exchange — the q_sim_batch shape) and
    the 10-row query batch must broadcast, so the corpus never
    shuffles wide."""
    for qname in ("q_sim_ndcg_batch", "q_sim_anneval_batch", "q_sim_ivf_batch",
                  "q_sim_ivfeval_batch", "q_sim_ivf_sweep"):
        plan = _plan(spark, qname)
        assert "WindowGroupLimit" in plan, qname
        assert (
            "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        ), qname


def test_r10_ivf_assignment_is_shuffle_free(spark):
    """The IVF final cell assignment (functions/ivf.py::ivf_model) is
    a ROW-LOCAL projection over the literal trained codebook — the
    whole q_sim_ivf plan must contain no data shuffle (no
    hashpartitioning / SinglePartition exchange; broadcast exchanges
    of the ≤8-row probe/codebook and the 1-row query are expected).
    lloyd.assign's crossJoin+groupBy shape here would shuffle the
    FULL vector payload through a vec_id exchange — a corpus-payload
    shuffle at 100 TB for a value computable in the scan
    projection."""
    plan = _plan(spark, "q_sim_ivf")
    assert "hashpartitioning" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "TakeOrderedAndProject" in plan


def test_r11_ivf_served_plan_is_pruned_and_training_free(spark):
    """q_sim_ivf_served (VERDICT r10 item 3): the serving plan must
    (a) partition-prune the materialized assignment to the probed
    cells (PartitionFilters IN-list — file-level skipping, the
    q_layout_zorder shape), (b) contain NO training lineage (the
    Lloyd iterations aggregate; serving must not — no HashAggregate,
    no ObjectHashAggregate, no data shuffle), and (c) keep the final
    top-k a TakeOrderedAndProject map-side heap."""
    import re

    plan = _plan(spark, "q_sim_ivf_served")
    pf = re.search(r"PartitionFilters: \[cell#\d+ IN \([\d,]+\)\]", plan)
    assert pf, plan
    assert "HashAggregate" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert "TakeOrderedAndProject" in plan
    # batched twin: same pruned training-free scan, probe table
    # broadcast, per-qid top-k as a WindowGroupLimit map-side heap.
    # The filter list carries extra terms here (isnotnull + a
    # dynamicpruningexpression from the broadcast probe join — DPP on
    # top of the static IN-list), so no closing-bracket anchor; at
    # sf0.01 the 10-query batch can legitimately probe all 8 cells.
    plan = _plan(spark, "q_sim_ivf_served_batch")
    pf = re.search(r"PartitionFilters: \[cell#\d+ IN \([\d,]+\)", plan)
    assert pf, plan
    assert "HashAggregate" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_lm_two_scans_max(spark):
    """(r12) q_pipe_lm's bigram count is a window over the gram
    stream; allowed scans are the gram stream + the unigram pass
    (n(w) counts doc-final words that never appear as w1, so it is
    genuinely a second pass). A third scan means the bi-table
    join-back crept back."""
    df = registry.QUERIES["q_pipe_lm"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("Scan parquet") <= 2, "lm re-scans the corpus"
