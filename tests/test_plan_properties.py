"""Physical-plan regression tests: the perf-critical plan properties the
engine's scale story depends on (PLANS.md prose), pinned as assertions so
a refactor can't silently lose them.

These check plan SHAPE, not timings — shape is deterministic, timings are
not. Each one failing means a 100 TB regression even if sf0.01 wall time
looks fine.
"""

import pytest
from pyspark.sql import functions as F

from cies_ocr_java_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_metadata_scan_pushes_filter_and_prunes_columns(spark):
    plan = plan_of(QUERIES["doc_metadata_scan"](spark, SF))
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,400)]" in plan
    # column pruning: the text payload must not be in the read schema
    assert "text" not in plan.split("ReadSchema:")[1].split("\n")[0]


def test_pipeline_is_zero_python(spark):
    """ZERO ArrowEvalPython nodes in the flagship plan: every extraction
    route — pdf, ocr, text, AND html — is a codegen'd expression tree.
    Any Python node appearing means an expression fell out of the JVM."""
    plan = plan_of(QUERIES["pipeline_end_to_end"](spark, SF))
    assert plan.count("ArrowEvalPython") == 0
    assert plan.count("BatchEvalPython") == 0


def test_tfidf_df_table_broadcast_when_small(spark):
    """The DF-table join must NOT carry a forced broadcast hint (a web
    corpus vocabulary is 10^8+ terms — the driver would OOM building it);
    AQE governs. When the table IS small (here, sf0.01) AQE must still
    end up at a broadcast-hash join at runtime."""
    df = QUERIES["tfidf_top_terms"](spark, SF)
    # no compile-time hint in the optimized logical plan
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical
    # AQE's runtime pick for the small case: broadcast
    df.write.format("noop").mode("overwrite").save()
    assert "BroadcastHashJoin" in plan_of(df)


def test_quartiles_have_no_global_single_partition_window(spark):
    """customer_revenue_quartiles must compute global row numbers via
    range repartition + local window + broadcast offsets — never an
    ntile over an unpartitioned Window (the round-1 single-task sort).
    The one allowed SinglePartition exchange feeds the partitions-sized
    offsets table."""
    plan = plan_of(QUERIES["customer_revenue_quartiles"](spark, SF))
    assert "ntile" not in plan
    assert "rangepartitioning" in plan  # the distributed sort
    assert plan.count("Exchange SinglePartition") <= 1


def test_range_join_is_equi_hash_not_nested_loop(spark):
    """The bucket trick must plan as an equi hash join; a
    BroadcastNestedLoopJoin means the theta condition leaked back in."""
    plan = plan_of(QUERIES["events_range_join"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_q6_scan_pushes_range_predicates(spark):
    # toString truncates FileScan metadata; formatted explain keeps the
    # full PushedFilters list
    jdf = QUERIES["q6_forecast_revenue"](spark, SF)._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = jdf.queryExecution().explainString(mode)
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_exact_dedup_is_single_shuffle(spark):
    """Exact dedup = scan -> partial agg -> ONE exchange -> final agg.
    (AQE wraps the plan; count Exchange nodes in the final plan string.)"""
    df = QUERIES["dedup_exact"](spark, SF)
    df.write.format("noop").mode("overwrite").save()  # let AQE finalize
    plan = plan_of(df)
    # fanout repartition (guarded, local-only) + the aggregate shuffle
    assert plan.count("Exchange") <= 2


def test_bucketed_join_is_shuffle_free(spark):
    """Co-located joins via bucketing: two tables bucketed by the join key
    into the same bucket count join with ZERO Exchange nodes — at 100 TB
    this is the difference between a join that moves the corpus over the
    network and one that doesn't. (Bucketed scans can't use AQE coalescing
    or codegen'd Exchange reuse, so reserve bucketing for keys joined
    repeatedly — e.g. doc_id across extraction/dedup/state tables.)"""
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    stats = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("w")
    )
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_stats")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_docs")
    stats.write.bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_stats")
    # disable broadcast so the join would otherwise shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_docs").join(spark.table("b_stats"), "doc_id")
        plan = plan_of(j)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_stats")


def test_pack_sequences_has_no_global_data_window(spark):
    """corpus_pack_sequences' global prefix sum must be the two-level
    scan (range repartition + partition-local window + broadcast
    offsets): the only SinglePartition exchange allowed is the one
    feeding the partitions-sized subtotal table, and the fragment
    explosion must ride on the range partitioning, not re-shuffle."""
    plan = plan_of(QUERIES["corpus_pack_sequences"](spark, SF))
    assert "rangepartitioning" in plan
    assert plan.count("Exchange SinglePartition") <= 1
    assert "BroadcastHashJoin" in plan  # offsets join back by _pid


def test_zorder_layout_prunes_files(spark, tmp_path):
    """Z-order layout evidence: a synthetic (x, y) grid written
    range-partitioned + sorted by the Morton key gives every file a tight
    bounding box in BOTH dimensions, so a box predicate on (x, y) — and a
    single-dimension predicate on y, the one a linear x-sort cannot prune
    — overlaps only a fraction of the files' footer min/max ranges. This
    is the min/max skipping a 100 TB scan does per row group; measured
    here directly from the parquet footers."""
    import pyarrow.parquet as pq
    from cies_ocr_java_spark.functions.layout import zorder_key

    n, files = 1 << 14, 16
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.col("id") / 128).cast("long").alias("y"),
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    zk = zorder_key(F.col("x"), F.col("y"), bits=7)
    (df.repartitionByRange(files, zk)
       .sortWithinPartitions(zk)
       .write.mode("overwrite").parquet(zdir))
    (df.repartitionByRange(files, F.col("x"))
       .sortWithinPartitions("x")
       .write.mode("overwrite").parquet(ldir))

    def boxes(d):
        out = []
        import os
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            lo = {c: None for c in ("x", "y")}
            hi = {c: None for c in ("x", "y")}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in lo:
                        st = col.statistics
                        lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                        hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
            out.append((lo["x"], hi["x"], lo["y"], hi["y"]))
        return out

    def overlapping(bx, x0, x1, y0, y1):
        return sum(
            1 for (xl, xh, yl, yh) in bx
            if xh >= x0 and xl <= x1 and yh >= y0 and yl <= y1
        )

    zb, lb = boxes(zdir), boxes(ldir)
    assert len(zb) == files and len(lb) == files
    # box query: 1/16 of each dimension -> z-order touches few files
    box_z = overlapping(zb, 0, 7, 0, 7)
    assert box_z <= files // 4
    # y-only predicate: the x-sorted layout cannot prune AT ALL,
    # the z-ordered one still skips most files
    y_z = overlapping(zb, 0, 127, 0, 7)
    y_l = overlapping(lb, 0, 127, 0, 7)
    assert y_l == files  # linear layout: every file overlaps
    assert y_z <= files // 2


def test_region_segment_single_arrow_stage(spark):
    """media_region_segment: the codec decode is the ONE Arrow stage
    (MapInPandas); the segmentation itself (band explode, ink hash,
    gaps-and-islands, region windows) must stay codegen — no
    ArrowEvalPython, and every window partitioned per image."""
    plan = plan_of(QUERIES["media_region_segment"](spark, SF))
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_phrase_search_is_postings_broadcast_join(spark):
    """phrase_search: the phrase-term table must broadcast into the
    postings (BroadcastHashJoin), never a sort-merge or nested-loop join
    — at scale the postings side is the corpus's matching tokens and the
    phrase side is constant-sized."""
    plan = plan_of(QUERIES["phrase_search"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "NestedLoop" not in plan


def test_triangle_join_is_equi_hash_not_nested_loop(spark):
    """neardup_triangle_counts: wedge closure must execute as equi joins
    on edge endpoints — a BroadcastNestedLoopJoin here means the pair
    predicate degenerated to a theta join (O(|E|^2) at scale)."""
    plan = plan_of(QUERIES["neardup_triangle_counts"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_is_two_level(spark):
    """bm25_retrieval: exactly two row_number windows — the partition-
    local prune and the global rank over <= k*n_parts survivors. A single
    global window over the unpruned scored table is the unbounded
    single-partition sort this query exists to avoid."""
    plan = plan_of(QUERIES["bm25_retrieval"](spark, SF))
    assert plan.count("Window [row_number()") == 2
    # Spark pushes the rank-<=-k prune below each window as WindowGroupLimit
    # (partial+final), so no task ever materializes the unpruned scored table.
    assert "WindowGroupLimit" in plan


def test_q19_single_join_no_union(spark):
    """q19_disjunctive_join: the OR-of-conjunctions must stay ONE
    equi-join with a residual filter — a Union in the plan means the
    optimizer (or a refactor) split it into three scans of the fact
    table; a nested-loop means the equi key was lost under the
    disjunction."""
    plan = plan_of(QUERIES["q19_disjunctive_join"](spark, SF))
    assert "Union" not in plan
    assert "NestedLoop" not in plan
    assert plan.count("Join") >= 1


def test_q21_semi_and_anti_stay_equi_hash(spark):
    """q21_sole_returned_supplier: EXISTS/NOT-EXISTS compile to LeftSemi/
    LeftAnti equi joins on l_orderkey with the suppkey inequality as a
    residual condition — never a BroadcastNestedLoopJoin (the correlated
    predicate degenerating to a theta join, O(|lineitem|^2) at scale)."""
    plan = plan_of(QUERIES["q21_sole_returned_supplier"](spark, SF))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q15_max_subquery_no_global_sort(spark):
    """q15_top_supplier: the scalar-max tie filter must be a broadcast
    equality join against the 1-row max — not a global sort of the
    supplier aggregate (single-partition stage) and not a window."""
    plan = plan_of(QUERIES["q15_top_supplier"](spark, SF))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_q8_share_is_single_aggregate_pass(spark):
    """q8_market_share: numerator and denominator are CASE branches of
    ONE aggregate — a second Aggregate-over-join pass (self-join of two
    grouped queries) would scan and shuffle the star join twice."""
    plan = plan_of(QUERIES["q8_market_share"](spark, SF))
    assert "BroadcastHashJoin" in plan  # nation/region dims broadcast
    assert "CartesianProduct" not in plan


def test_url_canonicalize_is_map_only_codegen(spark):
    """url_canonicalize: a pure projection — ZERO exchanges (fuses into
    the scan at 100 TB) and zero Python nodes (all regexp/array ops are
    codegen)."""
    plan = plan_of(QUERIES["url_canonicalize"](spark, SF))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_url_blocklist_is_broadcast_equi_join(spark):
    """url_host_blocklist: the suffix match must be a broadcast EQUI-join
    of the exploded suffix chain against the (human-sized) blocklist —
    never a LIKE-style nested loop."""
    plan = plan_of(QUERIES["url_host_blocklist"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_parquet_aggregate_pushdown_answers_from_footers(spark):
    """Scan-less aggregation evidence: with the V2 parquet source and
    spark.sql.parquet.aggregatePushdown, MIN/MAX/COUNT compile to a
    PushedAggregation BatchScan — at 100 TB these global stats are
    answered from row-group footers without touching a data page. The
    engine's metadata queries (ingest cursors, snapshot stats, scan-split
    planning) qualify; anything with a residual filter or AVG falls back
    to a normal scan, which is why the default session keeps the V1
    source (this is an opt-in per-query config, pinned here)."""
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    prev_agg = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        df = spark.read.parquet(f"{SF}/lineitem.parquet").selectExpr(
            "min(l_shipdate) AS mn", "max(l_shipdate) AS mx", "count(*) AS n"
        )
        plan = plan_of(df)
        assert "PushedAggregation" in plan
        row = df.collect()[0]
        assert row["n"] == 60000  # sf0.01 lineitem cardinality
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", prev_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev_agg)


def test_aqe_splits_skewed_join_partitions(spark):
    """Executable evidence for the 'AQE handles hot buckets' claims in
    the dedup/LSH docstrings: a 95%-hot-key fact joined to a dim must
    come out of AQE with the hot partition SPLIT (SortMergeJoin(skew=true)
    + 'AQEShuffleRead ... skewed') instead of one straggler task sorting
    95% of the data. Thresholds are scaled down to fixture size; the
    mechanism (factor x median + byte threshold) is the same one that
    fires at 100 TB."""
    restore = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 224).alias("attr"),
        )
        j = fact.join(dim, "k")
        assert len(j.collect()) == 200_000  # finalize the adaptive plan
        plan = plan_of(j)
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in restore.items():
            spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_join_probe_side(spark):
    """Runtime row-level pruning evidence: with runtime.bloomFilter on, a
    selective dim filter injects a might_contain(bloom) predicate into
    the FACT scan side of the join — at 100 TB the shuffle moves only
    rows that can possibly match, the semi-join effect without a second
    pass. Pinned here because several registry joins (decontaminate,
    postings semi-joins) rely on exactly this class of runtime filter
    when the filtered side is too big to broadcast."""
    restore = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = plan_of(j)
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in restore.items():
            spark.conf.set(k, v)


def test_salted_agg_has_two_phase_exchanges(spark):
    """salted_hot_key_agg: phase 1 shuffles on (event_type, _salt) —
    spreading a hot key over the salt buckets — and phase 2 on
    event_type alone. Losing the salted exchange re-creates the hot-key
    straggler this query exists to defuse."""
    import re

    plan = plan_of(QUERIES["salted_hot_key_agg"](spark, SF))
    assert re.search(r"hashpartitioning\(event_type#\d+, _salt#\d+", plan)
    assert re.search(r"hashpartitioning\(event_type#\d+, \d+\)", plan)


def test_accent_fold_single_arrow_stage(spark):
    """text_accent_fold: exactly ONE ArrowEvalPython node (the NFKD fold
    — the only part with no JVM builtin); injection, hashing, and the
    non-ASCII count stay codegen."""
    plan = plan_of(QUERIES["text_accent_fold"](spark, SF))
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


def test_layout_reconstruction_single_exchange_zero_python(spark):
    """pdf_reading_order / pdf_table_cells: every window is partitioned
    by doc_id, so ALL of them must reuse ONE hash exchange (re-sorting is
    fine; re-shuffling the same keys is the regression), and the whole
    reconstruction stays codegen — no Arrow/Python nodes."""
    for name in ("pdf_reading_order", "pdf_table_cells"):
        plan = plan_of(QUERIES[name](spark, SF))
        assert "Python" not in plan and "Arrow" not in plan, name
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "Exchange SinglePartition" not in plan, name


def test_c4_line_filter_map_only_zero_python(spark):
    """quality_c4_line_filter: the whole rewrite — line synthesis, both
    rule filters, the page gate, and the kept-text hash — is higher-order
    array expressions fused into the scan. No DATA shuffle (the guarded
    single-split fanout RoundRobin is the documented local-input no-op)
    and no Python: a 100 TB corpus pays exactly one map pass."""
    plan = plan_of(QUERIES["quality_c4_line_filter"](spark, SF))
    for shuffle in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert shuffle not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_lr_features_gradient_is_decimal_and_zero_python(spark):
    """quality_lr_train's per-round aggregation: gradient sums are
    DECIMAL (exact, order-independent, map-side combinable — a double
    sum would drift between engines AND between Spark's own partition
    orders) and the feature/sigmoid math is all codegen, no Python."""
    from cies_ocr_java_spark.functions.text import EN_STOPWORDS
    from cies_ocr_java_spark.operators import logreg

    d = spark.read.parquet(f"{SF}/documents.parquet")
    feats = logreg.lr_features(d, EN_STOPWORDS)
    e = (F.lit(0.5).cast(logreg.FEAT_DEC) - F.col("y"))
    agg = feats.select(
        F.sum(e * F.col("xq1")).alias("g1"), F.count("*").alias("n")
    )
    assert dict(agg.dtypes)["g1"].startswith("decimal")
    plan = plan_of(agg)
    assert "Python" not in plan and "Arrow" not in plan
    # a partial_sum stage exists = map-side combine (the plan string is
    # top-down, so the partial aggregate prints BELOW the exchange)
    assert "partial_sum" in plan


def test_contrastive_pairs_is_bucket_equi_join(spark):
    """Hard-negative mining must stay a bucket equi self-join: a
    CartesianProduct / nested-loop means the [lo, hi) band condition
    leaked into the join and the corpus is being cross-producted."""
    plan = plan_of(QUERIES["contrastive_pairs"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)
    assert "Python" not in plan and "Arrow" not in plan


def test_passage_rewrite_zero_python_no_cartesian(spark):
    """The rewrite's kept-token selection is a codegen'd higher-order
    indexed filter over the collected interval array — Python here would
    put the whole corpus through an Arrow hop; a cartesian means the
    coverage test degenerated to positions x intervals."""
    plan = plan_of(QUERIES["dedup_passage_rewrite"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_char_entropy_is_map_only_zero_python(spark):
    """The entropy signal must stay a single map pass: a char explode
    (one row per corpus character) or a Python node here is a 100 TB
    catastrophe; the distribution math lives in higher-order array
    expressions inside the scan projection."""
    plan = plan_of(QUERIES["char_entropy_filter"](spark, SF))
    for shuffle in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert shuffle not in plan
    assert "Generate" not in plan  # no explode
    assert "Python" not in plan and "Arrow" not in plan


def test_dehyphenate_and_readability_are_map_only(spark):
    """Both text-repair/quality signals must stay single map passes
    (the c4-line-filter class): any shuffle or Python node means a
    100 TB corpus pays more than one scan-side projection."""
    for name in ("pdf_dehyphenate", "readability_scores"):
        plan = plan_of(QUERIES[name](spark, SF))
        for shuffle in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
            assert shuffle not in plan, name
        assert "Python" not in plan and "Arrow" not in plan, name


def test_record_linkage_is_blocked_equi_join(spark):
    """Record linkage must get its candidates from blocking-key equi
    joins — a nested-loop/cartesian means edit distance leaked into the
    join condition (the all-pairs trap the blocking exists to avoid)."""
    plan = plan_of(QUERIES["record_linkage_blocked"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_integrity_repair_is_map_only(spark):
    """The ingest integrity gate is one map pass: no explode of the span
    arrays (Generate), no shuffle, no Python."""
    plan = plan_of(QUERIES["interleaved_integrity_repair"](spark, SF))
    assert "Generate" not in plan
    for shuffle in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert shuffle not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_rolling_range_window_is_user_partitioned(spark):
    """The 7-day RANGE frame must ride a user-keyed hash partitioning —
    a SinglePartition exchange here means the window lost its PARTITION
    BY and the whole event stream sorts on one task."""
    plan = plan_of(QUERIES["events_rolling_range_window"](spark, SF))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan


def test_pareto_frontier_has_no_pair_join(spark):
    """The skyline must come from the two category-partitioned windows —
    any join node means the oracle's O(n^2) NOT-EXISTS leaked into the
    engine plan."""
    plan = plan_of(QUERIES["pareto_frontier_parts"](spark, SF))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(p_type" in plan


def test_auc_window_is_over_bounded_histogram(spark):
    """classifier_eval_auc's cumulative window runs AFTER the groupBy on
    the quantized score (bounded histogram) — the plan must aggregate
    before the single-partition window, and stay zero-Python."""
    plan = plan_of(QUERIES["classifier_eval_auc"](spark, SF))
    assert "Python" not in plan and "Arrow" not in plan
    # the window input is the aggregated histogram: HashAggregate appears
    # below the Window node in the tree dump (deeper = later in string)
    win = plan.index("Window")
    assert "HashAggregate" in plan[win:]


def test_anomaly_mad_windows_are_type_partitioned(spark):
    plan = plan_of(QUERIES["events_anomaly_mad"](spark, SF))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(event_type" in plan


def test_moments_sketch_is_one_aggregation(spark):
    """Moments state must be ONE map-side-combinable aggregation: two
    HashAggregates (partial+final) around a single exchange, no window,
    no Python."""
    plan = plan_of(QUERIES["moments_sketch"](spark, SF))
    assert "Window" not in plan
    assert "Python" not in plan and "Arrow" not in plan
    assert plan.count("Exchange") <= 2  # agg shuffle (+AQE read at most)


def test_link_prediction_has_no_cartesian(spark):
    plan = plan_of(QUERIES["graph_link_prediction"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mojibake_and_wordlist_are_map_only(spark):
    """Both cleanup/gate passes must stay single map passes (the
    c4-line-filter class)."""
    for name in ("text_mojibake_repair", "content_wordlist_filter"):
        plan = plan_of(QUERIES[name](spark, SF))
        for shuffle in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
            assert shuffle not in plan, name
        assert "Python" not in plan and "Arrow" not in plan, name


def test_forward_fill_is_user_partitioned(spark):
    plan = plan_of(QUERIES["events_forward_fill"](spark, SF))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan


def test_basket_lift_joins_on_order_key(spark):
    """The pair join must be keyed on the order (equi-join) — a
    cartesian/nested-loop means the type cross product leaked in."""
    plan = plan_of(QUERIES["basket_type_lift"](spark, SF))
    assert "CartesianProduct" not in plan
    # the single CROSS JOIN in the query is the 1-row order-count table;
    # a nested-loop join is only legal against that 1-row side
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_dup_coverage_semi_join_and_doc_window(spark):
    plan = plan_of(QUERIES["dup_ngram_coverage"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(doc_id" in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_log2_histogram_is_one_aggregation(spark):
    plan = plan_of(QUERIES["events_log2_histogram"](spark, SF))
    assert "Window" not in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_lead_time_median_reads_bounded_histogram(spark):
    """The median must come from the (priority, lead_days) histogram —
    the plan aggregates BEFORE any window (no row_number over the raw
    join output, which would sort 10^9 rows/class on one task)."""
    plan = plan_of(QUERIES["order_lead_time_stats"](spark, SF))
    assert "row_number" not in plan
    win = plan.index("Window")
    assert "HashAggregate" in plan[win:]  # aggregate below the window


def test_rolling_distinct_has_no_range_join(spark):
    """The 7-day distinct must use the contribute-forward explode —
    a nested-loop/cartesian between days and observations means the
    range self-join leaked in (the 1-row bounds broadcast is the only
    legal nested-loop)."""
    plan = plan_of(QUERIES["rolling_distinct_users"](spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "Generate" in plan  # the explode is the mechanism


def test_provenance_and_trim_ride_doc_partitioning(spark):
    for name in ("span_provenance_offsets", "interleaved_budget_trim"):
        plan = plan_of(QUERIES[name](spark, SF))
        assert "hashpartitioning(doc_id" in plan, name
        assert "SinglePartition" not in plan, name


def test_rfm_ranks_are_distributed(spark):
    """orders_rfm_segments (round-2 verdict #2): all three quintile
    ranks must be range-repartition + local row_number + broadcast
    offsets — the customer-grain rows must never cross a
    SinglePartition exchange. The allowed SinglePartition exchanges
    feed the three partitions-sized offset tables and the 1-row n
    scalar (each ~32 rows / 1 row)."""
    plan = plan_of(QUERIES["orders_rfm_segments"](spark, SF))
    assert plan.count("rangepartitioning") >= 3  # three distributed sorts
    # every Window over customer-grain rows is partitioned (by _pid —
    # the precedent's shape, a distributed hash exchange); the only
    # SinglePartition exchanges feed the three partitions-sized offset
    # tables and the 1-row n scalar
    assert plan.count("Exchange SinglePartition") <= 4


def test_lsh_evaluators_sample_below_the_shingle_explode(spark):
    """Round-2 verdict #5, re-pinned after the round-3 verdict #8
    amortization. The scan-stage-sampling invariant now lives in the
    BUILD-ONCE builder (_build_sampled_exact_pairs): the hash-sample
    Filter must sit directly above the parquet relation, below any
    Generate — sampled-away docs never get shingled, once, at build
    time. The CONSUMERS (lsh_s_curve_planner / lsh_recall_eval) must
    then be scans of the committed cache table with NO re-shingling
    (no Generate) in their consumed plans."""
    from cies_ocr_java_spark.plans.queries import (
        _build_sampled_exact_pairs,
    )

    opt = (
        _build_sampled_exact_pairs(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    lines = opt.splitlines()
    marker = "md5(cast(cast(doc_id"
    hits = [
        i for i, ln in enumerate(lines)
        if "Filter (" in ln and marker in ln and "parquet" not in ln
    ]
    assert hits  # the hash-sample predicate exists in the builder
    for i in hits:
        assert "parquet" in lines[i + 1], lines[i + 1][-120:]

    for name in ("lsh_s_curve_planner", "lsh_recall_eval"):
        plan = plan_of(QUERIES[name](spark, SF))
        assert "cies_fixture_payloads" in plan, name  # committed cache
        # no re-shingling (recall_eval's band explode over the 8-int
        # signature table is legitimate and cheap; a shingle column
        # anywhere means the text pipeline snuck back in)
        assert "shingle" not in plan, name
    # recall_eval's signature side: the hash-sample filter on the sig
    # cache scan (id column) must still reach the parquet relation
    opt2 = (
        QUERIES["lsh_recall_eval"](spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    lines2 = opt2.splitlines()
    hits2 = [
        i for i, ln in enumerate(lines2)
        if "Filter (" in ln and "md5(cast(cast(id" in ln
        and "parquet" not in ln
    ]
    assert hits2
    for i in hits2:
        assert "parquet" in lines2[i + 1], lines2[i + 1][-120:]


def test_neardup_pairs_build_returns_a_table_scan(spark):
    """neardup_pairs_build (round-2 verdict #6): the returned DataFrame
    must be a parquet scan of the COMMITTED snapshot table — no shingle
    explode, no band join, no Python anywhere in the consumed plan. The
    expensive derivation happened once inside the commit; everything
    downstream (seven graph-family consumers) re-reads this scan."""
    plan = plan_of(QUERIES["neardup_pairs_build"](spark, SF))
    assert "cies_neardup_pairs" in plan  # the committed table's path
    assert "Generate" not in plan  # no re-shingling
    assert "Python" not in plan and "Arrow" not in plan


def test_giant_payload_routing_is_shuffle_free(spark):
    """giant_payload_routing (round-2 verdict #7, the LargeFileThreshold
    analog): the chunk/etag plan must be ONE map-side codegen projection
    — an oversized payload must never cross an exchange whole, and no
    Python hop may touch the bytes."""
    plan = plan_of(QUERIES["giant_payload_routing"](spark, SF))
    for shuffle in ("hashpartitioning", "rangepartitioning", "SinglePartition"):
        assert shuffle not in plan
    assert "Python" not in plan and "Arrow" not in plan
    # both routes exist on the fixture corpus and the gate matches id%97
    from pyspark.sql import functions as _F

    df = QUERIES["giant_payload_routing"](spark, SF)
    agg = df.agg(
        _F.sum((_F.col("route") == "direct").cast("int")).alias("direct"),
        _F.sum((_F.col("doc_id") % 97 == 0).cast("int")).alias("gated"),
        _F.max(_F.when(_F.col("route") == "direct", _F.col("n_chunks"))).alias("mx"),
    ).first()
    assert agg["direct"] == agg["gated"] > 0
    assert agg["mx"] >= 2  # the multipart case is actually exercised


def test_real_format_decodes_are_single_arrow_pass(spark):
    """Every real-format round-trip query (PDF layouts, media codecs,
    codec dispatch, ZIP) must be Arrow-batched map work only: the sole
    exchange allowed is the fanout round-robin repartition — no
    hash/range/single-partition shuffle anywhere, payload bytes never
    cross a keyed exchange."""
    names = (
        "extract_pdf_flate", "extract_pdf_xref_stream",
        "extract_pdf_incremental", "media_real_decode",
        "media_wav_decode", "media_png_decode", "media_dispatch_decode",
        "archive_zip_extract", "archive_tar_extract",
    )
    for name in names:
        plan = plan_of(QUERIES[name](spark, SF))
        for shuffle in (
            "hashpartitioning", "rangepartitioning", "SinglePartition"
        ):
            assert shuffle not in plan, (name, shuffle)
        assert "MapInPandas" in plan, name


def test_kmv_topk_is_take_ordered_not_window(spark):
    """kmv_set_operations (ADVICE r2): the k minimum hashes must come
    from a distributed TakeOrderedAndProject, not a row_number over a
    global Window sort of the whole distinct-user union."""
    plan = plan_of(QUERIES["kmv_set_operations"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "row_number" not in plan


# ---------------------------------------------------------------------------
# session-3 geometry / structured-extraction plan shapes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name,max_hash_ex",
    [
        ("pdf_column_reading_order", 3),
        ("pdf_figure_anchors", 3),
        ("pdf_line_assembly", 2),
        ("pdf_paragraph_segment", 2),
    ],
)
def test_geometry_queries_bounded_doc_hash_exchanges(spark, name, max_hash_ex):
    """The geometry family reorders WITHIN documents: every exchange must
    be a doc-keyed hash partition (the natural 10^12-doc layout), counts
    bounded, never SinglePartition, never a global sort."""
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES[name](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= max_hash_ex, name
    assert "Exchange SinglePartition" not in plan, name
    assert "Sort [" not in plan or "global=true" not in plan, name


def test_markdown_extract_single_exchange(spark):
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES["markdown_extract"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Exchange SinglePartition" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "html_microdata_extract",
        "robots_sitemap_directives",
        "html_hidden_text_extract",
        "html_pagination_stitch",
        "mime_multipart_extract",
        "svg_text_extract",
        "anchor_text_signal",
        "subtitle_cue_extract",
        "ics_event_extract",
        "rtf_extract_text",
        "http_chunked_decode",
        "html_robots_meta",
        "hreflang_variant_clusters",
        "accept_language_rank",
        "vcard_extract",
        "markdown_front_matter",
        "css_cascade_styles",
        "mail_thread_assembly",
        "hls_playlist_extract",
        "csv_rfc4180_parse",
        "dkim_relaxed_canon",
        "jwt_claims_decode",
        "url_homograph_flags",
        "warc_http_extract",
        "mime_nested_forward",
        "ical_event_expand",
        "cookie_jar_match",
        "mime_partial_reassembly",
        "intel_hex_parse",
        "svg_path_geometry",
        "toml_config_parse",
        "java_properties_parse",
        # round-4 session-3 relational parsers + lakehouse replay
        "diff_unified_parse",
        "syslog_rfc5424_parse",
        "gettext_po_parse",
        "hudi_timeline_replay",
        # round-5 cross-document reassembly family
        "http_range_reassembly",
        "warc_revisit_resolve",
    ],
)
def test_session5_queries_zero_python_no_single_partition(spark, name):
    """Session-5 crawl operators: all-JVM plans (no Python/Arrow eval),
    no SinglePartition exchange, no global row sort — the shapes that
    survive a 1000-executor scale-up."""
    from cies_ocr_java_spark.plans.queries import QUERIES

    plan = (
        QUERIES[name](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Arrow" not in plan, name
    assert "Exchange SinglePartition" not in plan, name
    assert "Sort [" not in plan or "global=true" not in plan, name


def test_mp4_container_queries_single_pass_no_shuffle(spark):
    """media_mp4_decode / media_mp4_frames: payload synthesis + container
    walk fuse into Arrow-batched MapInPandas stages with NO exchange —
    the per-doc container decode never shuffles, and nothing falls back
    to row-at-a-time Python."""
    for name in ("media_mp4_decode", "media_mp4_frames",
                 "media_mp3_decode", "docx_extract_text",
                 "epub_spine_extract", "proto_wire_decode",
                 "epub_interleaved_spans", "epub_media_decode",
                 "archive_gzip_extract", "archive_targz_extract",
                 "pdf_cid_tounicode", "media_ico_decode",
                 "media_ogg_decode", "cbor_wire_decode",
                 "pdf_link_annots", "font_sfnt_cmap",
                 "lz4_frame_decode", "id3_tag_frames",
                 "media_flac_decode", "archive_tar_longnames",
                 "torrent_metainfo_decode", "media_heif_items",
                 "font_woff_decode", "media_png_metadata",
                 "media_webp_decode", "git_object_walk",
                 "archive_zip64_extract",
                 # session-8 walkers: one mapInPandas pass each
                 "pcap_packet_walk", "dns_message_walk",
                 "media_mkv_walk", "avro_container_read",
                 "jpeg_exif_extract", "tls_client_hello_walk",
                 "msgpack_decode_walk", "elf_binary_walk",
                 "bplist_decode_walk", "bzip2_decode_walk",
                 "iso9660_walk", "git_pack_walk",
                 "lzma_decode_walk", "xz_decode_walk",
                 "deb_package_walk", "java_class_walk",
                 "wasm_module_walk", "rpm_package_walk",
                 "media_avi_walk", "cafebabe_dispatch",
                 "pe_binary_walk", "media_tiff_lzw_decode",
                 "sqlite_wal_recovery", "bson_decode_walk",
                 "utf7_mail_decode", "media_ppm_decode",
                 "uuencode_decode", "binary_artifact_dispatch",
                 "pcap_dns_capture", "base58check_decode",
                 "leveldb_sst_walk", "midi_track_walk",
                 "fits_image_walk", "dicom_image_walk",
                 "safetensors_walk", "gguf_model_walk",
                 "flatbuffer_decode", "git_index_walk",
                 "jar_manifest_walk", "roaring_bitmap_walk",
                 "parquet_page_values",
                 # round-4 session-3 walkers: one mapInPandas pass
                 "media_qoi_decode", "media_tga_decode",
                 "ole2_compound_walk", "java_serial_walk",
                 "pcapng_block_walk", "pgp_armor_walk",
                 "py_marshal_walk", "flv_tag_walk",
                 "parquet_delta_values", "psd_layer_walk",
                 "swf_tag_walk", "npz_array_walk",
                 "dwarf_lineprog_walk",
                 "websocket_frame_walk", "http2_frame_walk",
                 "font_glyf_outlines"):
        plan = plan_of(QUERIES[name](spark, SF))
        # the only exchange allowed is the single-split fanout guard
        assert plan.count("Exchange") <= 1, name
        assert "hashpartitioning" not in plan, name
        assert "rangepartitioning" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_css_cascade_join_is_never_a_broadcast(spark):
    """Round-3 verdict #4: the element x rule join has DATA-SIZED sides
    (O(docs) each); at local small stats Catalyst used to elect a
    broadcast build — harmless at 500 docs, a driver OOM at 10^12. The
    shuffle_hash hint in resolve_cascade forbids that at every scale;
    this pin enforces the claim instead of narrating it."""
    plan = plan_of(QUERIES["css_cascade_styles"](spark, SF))
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastExchange" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the doc-keyed co-partitioned exchange IS the intended join
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_wide_codegen_queries_compile_without_fallback(spark):
    """Round-3 verdict #9: intel_hex_parse's 9.5 s was one-time
    whole-stage-codegen compile of a WIDE expression tree; if future
    widening pushed it past the JVM method limit, Spark would silently
    fall back to interpreted mode and 10x the per-task cost. With
    spark.sql.codegen.fallback=false a compile failure THROWS instead —
    executing one partition under that conf proves the whole plan still
    compiles."""
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        for name in ("intel_hex_parse", "css_cascade_styles"):
            df = QUERIES[name](spark, "/root/testdata/sf0.001")
            # the enforcement: with fallback disabled, a generated
            # method past the JVM limit throws here instead of
            # silently interpreting
            df.collect()
            # codegen stage markers on the now-FINAL adaptive plan:
            # "*(n)" stage stars mark whole-stage-codegen spans
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan, name
            assert "*(" in plan, name
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
