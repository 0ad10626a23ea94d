"""Plan-shape regression tests: pushdown reaches the scan, columns are
pruned, small dims broadcast, shuffle counts stay minimal. These pin
the 100 TB-relevant properties of the headline queries."""

from go_streams_spark.plans import (
    pushed_filters, read_schema_columns, count_exchanges,
    has_broadcast_join, wholestage_codegen_spans,
)
from go_streams_spark.queries import QUERIES


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed  # predicate reached the parquet scan
    (cols,) = read_schema_columns(df)
    assert len(cols) == 7  # 7 of 11 lineitem columns — pruning works
    assert count_exchanges(df) <= 2  # partial agg -> final agg -> sort


def test_map_project_no_shuffle(spark, sf_dir):
    df = QUERIES["map_project"](spark, sf_dir)
    assert count_exchanges(df) == 0  # pure projection: scan -> project
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_extendedprice",
                         "l_discount", "l_returnflag"}
    assert wholestage_codegen_spans(df) >= 1


def test_q3_broadcasts_filtered_dim(spark, sf_dir):
    df = QUERIES["q3_shipping_priority"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 2  # one shuffle for the big join/agg + top-k


def test_q5_broadcasts_small_dims(spark, sf_dir):
    df = QUERIES["q5_local_supplier_volume"](spark, sf_dir)
    assert has_broadcast_join(df)
    # the only shuffle should be orders<->lineitem + final agg
    assert count_exchanges(df) <= 2


def test_dedup_minhash_no_cross_join(spark, sf_dir):
    # LSH candidates must come from an equi-join on (band, band_key),
    # never a cartesian pair product. (The broadcast nested-loop join of
    # the 12-row seed table is an intentional fan-out, not a pair join.)
    from go_streams_spark.plans import explain_str
    df = QUERIES["dedup_minhash_pairs"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    # corpus-scale intermediates are pinned to shuffle joins (broadcast
    # of an exploded subtree is the 100 TB anti-pattern)
    assert "band_key" in plan and ("ShuffledHashJoin" in plan or "SortMergeJoin" in plan)
    assert "BroadcastHashJoin" not in plan


def test_simhash_no_broadcast_stages(spark, sf_dir):
    # simhash must stay one straight scan->explode->agg pipeline: the
    # vocab-broadcast variant added single-task broadcast-exchange jobs
    # with pathological tail latency in long-lived sessions (SCALE.md §8)
    from go_streams_spark.plans import explain_str
    from go_streams_spark.queries import QUERIES
    plan = explain_str(QUERIES["simhash_docs"](spark, sf_dir), "simple")
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan


def test_simhash_pairs_banded_equi_join(spark, sf_dir):
    """simhash near-pairs candidates must come from the pigeonhole
    band equi-join — never an all-pairs non-equi self-join (the O(N^2)
    plan VERDICT r1 flagged). Shuffle joins only: the band rows are a
    corpus-scale intermediate."""
    from go_streams_spark.plans import explain_str
    df = QUERIES["simhash_near_pairs"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_key" in plan and ("ShuffledHashJoin" in plan
                                   or "SortMergeJoin" in plan)
    assert "BroadcastHashJoin" not in plan


def test_embedding_near_dup_no_nested_loop(spark, sf_dir):
    """Exact near-dup runs as the blocked cogroup pair scan: no join
    node at all — in particular no BroadcastNestedLoopJoin and no
    driver-side collect (plan contains the cogroup's FlatMapCoGroups)."""
    from go_streams_spark.plans import explain_str
    df = QUERIES["embedding_near_dup"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "FlatMapCoGroupsInPandas" in plan


def test_embedding_near_dup_lsh_banded_equi_join(spark, sf_dir):
    """The near-dup path never degenerates to an unbounded pair scan:
    either the bucketed sign-bit band equi-join (sparse regime) or the
    r10 dense blocked cogroup scan with the in-batch band predicate
    (the runtime occupancy estimate picked it — this config's 2-3-bit
    bands retain ~2/3 of the pair space at any SF, so dense is the
    expected branch here); never a cartesian/broadcast nested loop.
    Result equivalence of the two branches is pinned by
    test_functions.test_cosine_near_dup_lsh_dense_plan_equivalent."""
    from go_streams_spark.plans import explain_str
    df = QUERIES["embedding_near_dup_lsh"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    banded = "band_key" in plan and ("ShuffledHashJoin" in plan
                                     or "SortMergeJoin" in plan)
    dense = "FlatMapCoGroupsInPandas" in plan
    assert banded or dense


def test_embedding_knn_distributed_no_collect(spark, sf_dir):
    """Exact kNN is the 2-D blocked cogroup matmul: the only window is
    the global top-k partitioned by query id — no single-partition
    WindowExec, no nested-loop pair join."""
    from go_streams_spark.plans import explain_str
    df = QUERIES["embedding_knn"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the top-k window shuffles on id_a, not into one partition
    assert "Exchange SinglePartition" not in plan


def test_batch_by_count_gate_no_single_partition_window(spark, sf_dir):
    """The batch_by_count gate query numbers rows via
    distributed_ordinal: range shuffle + per-partition window — the
    global row_number's Exchange SinglePartition must not appear."""
    from go_streams_spark.plans import explain_str
    df = QUERIES["batch_by_count"](spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()


def test_q21_single_lineitem_scan_reused(spark, sf_dir):
    """The decorrelated Q21 must NOT rescan lineitem for the per-order
    stats: 'lines' feeds both the aggregate and the final join, so the
    physical plan reuses one subtree (ReusedExchange / reused scan)
    instead of the reference EXISTS/NOT-EXISTS triple-scan shape."""
    from go_streams_spark.plans import explain_str
    from go_streams_spark.queries import QUERIES
    df = QUERIES["q21_waiting_suppliers"](spark, sf_dir)
    plan = explain_str(df, "simple")
    # window form: the fact feeds ONE scan into window aggregates — no
    # groupBy+self-join (which forced a second scan), no sort-merge join
    assert plan.count("lineitem") <= 1
    assert "Window" in plan
    assert "SortMergeJoin" not in plan


def test_q2_window_decorrelation_no_extra_join(spark, sf_dir):
    """Adapted Q2's correlated min-subquery must compile to a window
    over the aggregated costs — not a join of costs against a second
    aggregation of costs."""
    from go_streams_spark.plans import explain_str
    from go_streams_spark.queries import QUERIES
    df = QUERIES["q2_min_cost_supplier"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "Window" in plan
    # the only joins are the dim joins (broadcast) and the semi filter —
    # no SortMergeJoin of the agg against itself
    assert "SortMergeJoin" not in plan


def test_mad_hist_no_exact_percentile_buffers(spark, sf_dir):
    """mad_outlier_stats_hist must aggregate to (group, bucket) grain
    with partial hash aggregation — never an exact percentile, whose
    buffer funnels a whole column through one reducer per group."""
    from go_streams_spark.plans import explain_str
    df = QUERIES["mad_outlier_stats_hist"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "percentile" not in plan.lower()
    assert "HashAggregate" in plan
    # two scans of the fact (median pass + deviation pass), no more
    assert plan.count("FileScan parquet") == 2


def test_equidepth_no_fact_wide_single_partition(spark, sf_dir):
    """equidepth_price_histogram must number rows via the distributed
    ordinal (range shuffle), not a fact-wide single-partition ntile
    window; the only SinglePartition exchanges allowed sit above
    partition-count aggregates (bounded metadata)."""
    from go_streams_spark.plans import explain_str
    df = QUERIES["equidepth_price_histogram"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "rangepartitioning" in plan.lower()
    assert "ntile" not in plan.lower()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            below = "\n".join(lines[i + 1:i + 4])
            assert "HashAggregate" in below, (
                "fact-wide SinglePartition exchange:\n" + below)


def test_simhash64_pairs_no_nonequi_join(spark, sf_dir):
    """simhash64_near_pairs must run as per-band equi-joins (pigeonhole
    LSH), never an all-pairs non-equi self-join."""
    from go_streams_spark.plans import explain_str
    df = QUERIES["simhash64_near_pairs"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_execution_metrics_shuffle_accounting(spark, sf_dir):
    """execution_metrics reads runtime counters off the executed plan:
    a keyed aggregate reports rows and a nonzero shuffle volume; a pure
    projection reports zero shuffle bytes — the measure-don't-guess
    loop as code."""
    from pyspark.sql import functions as F

    from go_streams_spark.plans import execution_metrics
    from go_streams_spark.queries import _t
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    agg.collect()
    m = execution_metrics(agg)
    assert m.get("rows_output", 0) > 0
    assert m.get("shuffle_bytes_written", 0) > 0
    proj = li.select("l_orderkey")
    proj.collect()
    m2 = execution_metrics(proj)
    assert m2.get("shuffle_bytes_written", 0) == 0


def test_release_tracked_frees_all_caches(spark, sf_dir):
    """Operators that pin materializations (distributed_ordinal, LSH
    band tables, TF-IDF/bigram intermediates) must all route through
    track_persist, and release_tracked must leave ZERO persisted RDDs
    behind — the bench/oracle loops rely on this to not accumulate
    executor memory across a 188-query session."""
    from go_streams_spark.plans import release_tracked
    from go_streams_spark.queries import QUERIES
    release_tracked()  # clean slate from earlier tests

    def persisted_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet()
                   .toArray())

    baseline = persisted_ids()  # other tests' own caches are not ours
    for name in ("equidepth_price_histogram", "tfidf_top_terms",
                 "bigram_lm_doc_scores", "dedup_minhash_pairs"):
        QUERIES[name](spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
    assert persisted_ids() - baseline
    freed = release_tracked()
    assert freed >= 4
    assert persisted_ids() - baseline == set()


def test_pagerank_shuffle_mode_no_broadcast(spark, sf_dir):
    """broadcast_ranks=False is the billion-node plan: rank tables must
    NEVER be broadcast (forced F.broadcast bypasses
    autoBroadcastJoinThreshold — a guaranteed OOM at 1e9 nodes), and the
    shuffle_hash hints must also stop Catalyst's size estimation from
    re-introducing one. Exactly the defect VERDICT r3 flagged weak."""
    from go_streams_spark.plans import explain_str, release_tracked
    from go_streams_spark.queries import QUERIES
    df = QUERIES["pagerank_part_graph_shuffle"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "BroadcastExchange" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ShuffledHashJoin" in plan  # the hinted co-partitioned joins
    # broadcast mode (the default at this node count) keeps its 1-shuffle
    # -per-iteration shape
    plan_b = explain_str(QUERIES["pagerank_part_graph"](spark, sf_dir),
                         "simple")
    assert "BroadcastHashJoin" in plan_b
    release_tracked()


def test_pin_scope_releases_only_its_own_pins(spark, sf_dir):
    """pin_scope must release exactly the pins registered inside it and
    leave global/tracked pins (and outer scopes) alone — the ADVICE
    concurrency hazard: release_tracked() from a bench thread must not
    unpersist a DataFrame a concurrent scoped query still depends on."""
    from go_streams_spark.plans import pin_scope, release_tracked
    from go_streams_spark.plans.caching import track_persist
    release_tracked()

    def persisted_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet()
                   .toArray())

    baseline = persisted_ids()
    outer = track_persist(spark.range(10).selectExpr("id AS a"))
    outer.count()
    with pin_scope() as pins:
        inner = track_persist(spark.range(20).selectExpr("id AS b"))
        inner.count()
        assert pins == [inner]
        # a bench thread's global release must NOT free the scoped pin
        assert release_tracked() == 1  # frees outer only
        assert inner.storageLevel.useMemory  # still pinned
    assert not inner.storageLevel.useMemory  # freed at scope exit
    assert persisted_ids() - baseline == set()
    with pin_scope():  # nested scopes: inner frees before outer
        with pin_scope() as p2:
            track_persist(spark.range(5)).count()
            assert len(p2) == 1
        assert persisted_ids() - baseline == set()


def test_exchange_report_kinds_keys_and_cache_echo_skip(spark, sf_dir):
    """exchange_report names each shuffle's kind/keys/partitions, skips
    BroadcastExchange, and does NOT count the exchanges echoed inside a
    cached subtree's InMemoryRelation definition."""
    from pyspark.sql import functions as F
    from go_streams_spark.plans.inspect import exchange_report
    from go_streams_spark.plans.caching import track_persist

    df = spark.range(200).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    rep = exchange_report(agg.orderBy("s"))
    kinds = [e["kind"] for e in rep]
    assert kinds.count("hashpartitioning") == 1
    assert kinds.count("rangepartitioning") == 1
    hashed = next(e for e in rep if e["kind"] == "hashpartitioning")
    assert hashed["keys"] == ["k"]
    assert hashed["partitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions"))

    # broadcast join contributes NO entry
    small = spark.range(5).select(F.col("id").alias("k"),
                                  F.lit("d").alias("dim"))
    joined = df.join(F.broadcast(small), "k")
    assert exchange_report(joined) == []

    # cached subtree: its build-plan echo must not inflate the report
    cached = track_persist(agg)
    downstream = cached.groupBy().agg(F.sum("s").alias("t"))
    rep2 = exchange_report(downstream)
    # only the scalar-agg single partition move remains visible
    assert all(e["kind"] != "hashpartitioning" or e["keys"] != ["k"]
               for e in rep2), rep2


def test_exchange_report_single_partition(spark):
    """'Exchange SinglePartition' prints with NO argument parens; the
    report must still surface it (kind=SinglePartition, no keys) —
    regression for a regex that silently skipped the paren-less form."""
    from pyspark.sql import functions as F
    from go_streams_spark.plans.inspect import exchange_report

    df = spark.range(100).select(F.col("id").alias("v"))
    one = df.agg(F.sum("v").alias("s"))
    rep = exchange_report(one)
    assert any(e["kind"] == "SinglePartition" and e["keys"] == []
               for e in rep), rep
