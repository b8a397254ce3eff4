"""Plan-shape regression tests — the golden-plan layer (SURVEY.md §5:
gtest_planner_interpreter.out). These assert the physical properties that
make the engine viable at 100 TB: pushdown, pruning, broadcast choices,
bounded shuffles, wide codegen spans."""

from __future__ import annotations

from tests.conftest import SF_SMALL
from tiflash_spark.operators.joins import join_inner_broadcast, join_self_agg
from tiflash_spark.operators.relational import (
    q1_pricing_summary,
    q3_filter_project_limit,
    q6_forecast_revenue,
)
from tiflash_spark.operators.tpch import q18_large_orders
from tiflash_spark.operators.windows import window_ranking, window_rows_frame
from tiflash_spark.plans.explain import (
    count_operator,
    exchange_count,
    formatted_plan,
    has_filter_pushdown,
    pushed_filters,
    read_schemas,
)


def test_q1_filter_pushed_and_pruned(spark):
    df = q1_pricing_summary(spark, SF_SMALL)
    assert has_filter_pushdown(df)
    [schema] = read_schemas(df)
    # 7 columns needed of lineitem's 11 — pruning must reach the scan
    assert 0 < len(schema.split(",")) <= 7


def test_q3_all_predicates_reach_scan(spark):
    df = q3_filter_project_limit(spark, SF_SMALL)
    [filters] = pushed_filters(df)
    assert "LessThan(l_orderkey,500)" in filters
    assert "GreaterThan(l_discount,0.02)" in filters


def test_q6_no_shuffle_before_final_agg(spark):
    df = q6_forecast_revenue(spark, SF_SMALL)
    # ungrouped agg: partial → single exchange → final, nothing else
    assert exchange_count(df) == 1
    assert count_operator(df, "HashAggregate") <= 2


def test_topn_plans_take_ordered(spark):
    from tiflash_spark.operators.relational import q2_topn

    plan = formatted_plan(q2_topn(spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan


def test_dim_joins_broadcast(spark):
    df = join_inner_broadcast(spark, SF_SMALL)
    assert count_operator(df, "BroadcastHashJoin") == 5
    assert count_operator(df, "SortMergeJoin") == 0


def test_self_agg_join_reuses_partitioning(spark):
    df = join_self_agg(spark, SF_SMALL)
    # agg-side shuffle + final-agg shuffle; the join side reuses the
    # l_partkey partitioning (broadcast on the agg output), so exactly 2
    assert exchange_count(df) == 2


def test_window_single_shuffle(spark):
    # all window specs share one (partition, order) → exactly one exchange
    assert exchange_count(window_ranking(spark, SF_SMALL)) == 1
    assert exchange_count(window_rows_frame(spark, SF_SMALL)) == 1


def test_q18_having_side_copartitioned(spark):
    df = q18_large_orders(spark, SF_SMALL)
    # groupBy(l_orderkey) then join on o_orderkey = l_orderkey: the big-order
    # side must not re-shuffle after its aggregation — one exchange total
    assert exchange_count(df) == 1


def test_set_operations_single_shuffle_rewrite(spark):
    """The driver's set_operations is the one-pass conditional-agg rewrite:
    identical rows to the chained INTERSECT/EXCEPT form, but one shuffle
    on o_custkey (+1 for the orderBy) instead of 4+."""
    from tiflash_spark.operators.relational import (
        set_operations,
        set_operations_chained,
    )

    fast = set_operations(spark, SF_SMALL)
    slow = set_operations_chained(spark, SF_SMALL)
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
    assert exchange_count(fast) <= 2
    assert exchange_count(slow) > exchange_count(fast)


def test_window_topk_map_side_group_limit(spark):
    """Per-group top-k (row_number <= k) must plan a PARTIAL
    WindowGroupLimit below the shuffle — each map task keeps only k rows
    per group before the exchange, the behavior that makes per-key top-k
    viable on a 100 TB fact table (the analogue of the reference's
    TopN pushdown through the window executor)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tiflash_spark.catalog import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy(F.col("l_extendedprice").desc())
    df = li.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan.split("WindowGroupLimit")[2]  # map-side copy exists


def test_execution_profile_proves_partial_agg(spark):
    """Runtime-metrics surface (reference ExecutionSummaryHelper.cpp —
    per-operator rows/bytes shipped back for EXPLAIN ANALYZE): the
    executed q1 plan must show map-side combining EMPIRICALLY — the
    shuffle carries ~#groups records, orders of magnitude below the
    filtered input row count."""
    from tiflash_spark.operators.relational import q1_pricing_summary
    from tiflash_spark.plans.explain import execution_profile

    prof = execution_profile(q1_pricing_summary(spark, SF_SMALL))
    by_node = {}
    for p in prof:
        by_node.setdefault(p["node"], []).append(p["metrics"])
    scan_rows = max(m["numOutputRows"] for m in by_node["FileSourceScan"])
    shuffled = max(
        m["shuffleRecordsWritten"] for m in by_node["ShuffleExchange"]
    )
    assert scan_rows > 1000
    assert 0 < shuffled <= 64, (scan_rows, shuffled)  # ~#groups, not #rows


def test_round3_query_shuffle_ceilings(spark):
    """Exchange-count ceilings for the round-3 operators — regression
    fence so a future edit can't silently add data-sized shuffles. The
    tiny-table exchanges (source/count frames of ≤ |sources| rows) are
    included in the count, so ceilings sit at the measured value."""
    from tiflash_spark.plans.explain import exchange_count
    from tiflash_spark.registry import all_queries

    qs = all_queries()
    ceilings = {
        "quality_signals": 1,      # conditional repartition only
        "pack_sequences": 2,       # per-shard window + final agg
        "ann_quantized_topk": 0,   # persisted scales + broadcast q
        "events_resample": 5,      # cached hourly rollup build + grid, fill
                                   # window, sort (distinct-id count; +1 when
                                   # the warm cached plan embeds its AQE-final
                                   # exchange); runtime: 1 event scan (was 3)
        "dedup_incremental": 5,    # fp agg + anti join + counts
        "lm_perplexity": 3,        # score + rollup + sort (vocab is bucket-local)
        "vocab_topk": 0,           # bucket-local groupBy(tok) + TakeOrdered
        "sample_temperature": 6,   # cached source-count agg + quota joins
                                   # (rows ≤ |sources|); runtime pays 2
                                   # corpus scans (was 5)
        # round-4 operators
        "boilerplate_lines": 5,    # line df agg + flag join + doc agg + rollup/sort
        "hybrid_search_rrf": 2,    # two index lookups; fusion is broadcast-sized
        "ann_filtered_topk": 0,    # pushed filter + broadcast q + TakeOrdered
        "events_time_range_window": 2,  # user window + rollup
        "mvcc_bitmap_scan": 3,     # winner agg + semi join + final agg
        "multimodal_ann_chain": 0,  # mapInPandas stages + broadcast q + TakeOrdered
        # round-4 additions
        "dedup_exact_substring": 5,  # gram window + doc agg + source agg/sort
        "dedup_semantic": 5,         # cluster pair join + rank + report join
        "fulltext_boolean": 3,       # posting agg + anti join + sort
        "ccnet_buckets": 4,          # doc score agg + lang window + rollup
        # round-5 operators
        "shard_training_order": 2,   # shard window shuffle + final agg
        "mix_token_budget": 9,       # 2 corpus legs (bucket agg + bucket window);
                                     # rest are |sources|-row offs/quota frames
        "multimodal_phash": 5,       # cached sig agg + distinct-sig band join
                                     # + 1-row assembly; runtime pays 1 decode
                                     # pass + 1 sig-agg shuffle (was 4 decodes)
        # TPC-DS perf-suite shapes (dims broadcast; only the fact shuffles)
        "tpcds_q67_shape": 3,        # rollup agg + window sort + final order
        "tpcds_q27_shape": 2,        # rollup agg + order
        "tpcds_q18_shape": 2,        # rollup agg + order (6 joins all broadcast)
        "tpcds_q5_shape": 4,         # 2 channel aggs + rollup + order
    }
    for name, cap in ceilings.items():
        got = exchange_count(qs[name](spark, SF_SMALL))
        assert got <= cap, (name, got, cap)


def test_scan_data_sharing_reused_exchange(spark):
    """Scan/data sharing across consumers (reference design doc
    2022-07-25-read-thread-pool-and-data-sharing.md: one storage read
    feeds multiple query threads). Spark analogue: identical exchange
    subtrees are computed ONCE and re-read (ReusedExchange). Pin it on a
    self-join of an aggregate with itself — the shuffled agg must appear
    once, the second consumer as ReusedExchange, not a second scan."""
    from pyspark.sql import functions as F
    from tiflash_spark.catalog import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("qty"))
    joined = per_part.alias("a").hint("merge").join(
        per_part.alias("b"),
        (F.col("a.l_partkey") == F.col("b.l_partkey"))
        & (F.col("a.qty") <= F.col("b.qty")),
    )
    # AQE applies exchange/stage reuse at runtime — the pin must read the
    # EXECUTED plan (the initial explain still shows two exchanges)
    joined.collect()
    jplan = joined._jdf.queryExecution().executedPlan()
    assert "ReusedExchange" in jplan.toString()


def test_r10_provable_distinct_rewrites(spark):
    """Round-10 batch: COUNT(DISTINCT) sites whose input is provably
    unique per key were rewritten to plain COUNT. A single-distinct
    aggregate plans as a 4-phase aggregate with an extra exchange keyed
    by the distinct column; the rewrite halves the HashAggregate phases
    and drops that exchange. Uniqueness proofs: postings are a GROUP BY
    (term, doc_id); mvcc_snapshot's input keeps exactly the _rn == 1 row
    per handle. mvcc_bitmap_scan is the deliberate counter-example
    (semi-join output multiplicity is NOT provably 1) and must keep the
    distinct plan (more aggregate phases than snapshot's final agg)."""
    from tiflash_spark.operators.mvcc import mvcc_bitmap_scan, mvcc_snapshot
    from tiflash_spark.pipeline.fulltext import fulltext_bm25, fulltext_search
    from tiflash_spark.plans.explain import count_operator, exchange_count

    # window (1 exchange) + plain two-phase final agg (1 exchange)
    snap = mvcc_snapshot(spark, SF_SMALL)
    assert exchange_count(snap) == 2
    assert count_operator(snap, "HashAggregate") == 2
    assert exchange_count(fulltext_search(spark, SF_SMALL)) == 1
    assert count_operator(fulltext_bm25(spark, SF_SMALL), "HashAggregate") <= 4
    # bitmap mode keeps countDistinct: its final agg alone is 4 phases
    assert count_operator(mvcc_bitmap_scan(spark, SF_SMALL), "HashAggregate") >= 4


def test_r10_hybrid_fusion_no_sort_merge_join(spark):
    """hybrid_search_rrf's rank fusion is a union + pivot aggregate, not
    a FULL OUTER SortMergeJoin (full outer cannot broadcast): the plan
    must contain no join operator at all."""
    from tiflash_spark.pipeline.similarity import hybrid_search_rrf
    from tiflash_spark.plans.explain import formatted_plan

    tree = formatted_plan(hybrid_search_rrf(spark, SF_SMALL)).split("\n\n")[0]
    assert "SortMergeJoin" not in tree
    assert "ShuffledHashJoin" not in tree


def test_r10_asof_events_single_events_scan(spark):
    """asof_join_events reads the events table ONCE (single-source as-of);
    the two-frame form scanned it twice."""
    from tiflash_spark.operators.temporal import asof_join_events
    from tiflash_spark.plans.explain import formatted_plan

    tree = formatted_plan(asof_join_events(spark, SF_SMALL)).split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree


def test_r10_ann_literal_folds(spark):
    """Session-3/4 batches: ann_quantized_topk's per-dim scales AND its
    query row, and ann_pq_topk's ADC lookup table, ride as from_json
    STRING literals that must CONSTANT-FOLD at plan time — the physical
    plan contains no from_json call (the folded array literal replaces
    it), and quantized scores off ONE corpus scan with NO broadcast
    join at all (session 4 folded the query row + its precomputed
    norms, removing the last BroadcastNestedLoopJoin and the per-row
    query-norm folds)."""
    from tiflash_spark.pipeline.similarity import ann_pq_topk, ann_quantized_topk
    from tiflash_spark.plans.explain import formatted_plan

    quant = formatted_plan(ann_quantized_topk(spark, SF_SMALL))
    assert "from_json" not in quant, "scales/query literals did not fold"
    tree = quant.split("\n\n")[0]
    assert tree.count("BroadcastNestedLoopJoin") == 0, tree
    assert tree.count("Scan parquet") == 1, tree

    pq = formatted_plan(ann_pq_topk(spark, SF_SMALL))
    assert "from_json" not in pq, "PQ LUT literal did not fold"
