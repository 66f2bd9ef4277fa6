"""Physical-plan audits: the shapes we promise at 100 TB are asserted
here, not just claimed in docstrings.

The flagship chain (remove_up_to -> split -> down -> press_check ->
bindata) must ride ONE exchange and ONE sort: every stage windows or
aggregates on the same cast key, the grouped agg's ClusteredDistribution
is satisfied by the window's hash partitioning (key subset rule), and
every window declares the same (cast, order) sort.
"""

import re

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _count(plan: str, pat: str) -> int:
    return len(re.findall(pat, plan))


def test_ctd_pipeline_single_exchange_single_sort(spark):
    """One exchange for the whole chain (every window/agg key is a
    superset of the cast hash key); one sort on the FACT side shared by
    all scan-order windows, plus one sort over the post-aggregate table
    (rows = non-empty bins per cast) that orders bindata's grid
    emission — tiny by construction."""
    out = entrymod.queries()["ctd_pipeline"](spark, SF_DIR)
    plan = _plan(out)
    n_exchange = _count(plan, r"Exchange hashpartitioning")
    n_sort = _count(plan, r"\+- Sort \[")
    assert n_exchange == 1, f"expected 1 exchange, plan has {n_exchange}:\n{plan}"
    assert n_sort <= 2, f"expected <=2 sorts (fact + post-agg), plan has {n_sort}:\n{plan}"


def test_despike_single_sort(spark):
    out = entrymod.queries()["despike"](spark, SF_DIR)
    plan = _plan(out)
    assert _count(plan, r"Exchange hashpartitioning") == 1
    assert _count(plan, r"\+- Sort \[") == 1, plan


def test_filter_pushdown_reaches_scan(spark):
    """remove_up_to's predicate must reach the parquet scan."""
    out = entrymod.queries()["remove_above_water"](spark, SF_DIR)
    plan = _plan(out)
    assert "PushedFilters: [" in plan
    # the pushed filter list is non-empty (value column predicate)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), plan


def test_broadcast_join_in_flagship_joins(spark):
    """q3's dimension joins must broadcast, not sort-merge."""
    out = entrymod.queries()["q3_top_orders"](spark, SF_DIR)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan


def test_window_ranks_single_sort_per_order(spark):
    """Five ranking functions over two orderings -> at most 2 sorts and
    ONE exchange (both windows hash-partition on the same cast key)."""
    out = entrymod.queries()["window_ranks"](spark, SF_DIR)
    plan = _plan(out)
    assert _count(plan, r"Exchange hashpartitioning") == 1, plan
    assert _count(plan, r"\+- Sort \[") <= 2, plan


def test_json_extract_prunes_columns(spark):
    """The JSON aggregate must scan only the columns it touches."""
    out = entrymod.queries()["json_extract_stats"](spark, SF_DIR)
    plan = _plan(out)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"event_type", "props"}, cols


def test_unpivot_uses_expand_not_union(spark):
    """unpivot compiles to one Expand over one scan — not a UNION that
    re-reads the fact table four times."""
    out = entrymod.queries()["unpivot_lineitem"](spark, SF_DIR)
    plan = _plan(out)
    assert "Expand" in plan, plan
    assert _count(plan, r"Scan parquet") == 1, plan
    assert "Exchange" not in plan, plan  # map-side only


def test_stratified_sample_predicate_is_map_side(spark):
    """The sampling decision is a scan-side filter: no exchange, no
    aggregate anywhere in the plan."""
    out = entrymod.queries()["stratified_sample"](spark, SF_DIR)
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_cube_single_scan(spark):
    """CUBE expands grouping sets in one pass over one scan."""
    out = entrymod.queries()["cube_events"](spark, SF_DIR)
    plan = _plan(out)
    assert "Expand" in plan, plan
    assert _count(plan, r"Scan parquet") == 1, plan


def test_pack_documents_no_per_domain_window(spark):
    """pack_documents' prefix sum must never put a whole domain's rows
    in one window partition: the row-level cumsum (the window ordered by
    doc_id) is keyed by (bucket, domain), riding a range exchange.  The
    only window partitioned by domain alone is the bucket-offset cumsum
    over the per-bucket aggregate — one row per (bucket, domain), tiny
    by construction (it orders by the bucket id, not by doc_id).  (A
    dominant domain at 100 TB would serialize through the r3
    partitionBy(source)-only row window this guards against.)"""
    out = entrymod.queries()["pack_documents"](spark, SF_DIR)
    plan = _plan(out)
    assert "Exchange rangepartitioning" in plan, plan
    # physical Window prints: Window [exprs], [partition keys], [order keys]
    for m in re.finditer(r"Window \[([^\]]*)\], \[([^\]]*)\], \[([^\]]*)\]", plan):
        part_keys, order_keys = m.group(2), m.group(3)
        if "doc_id" in order_keys:
            assert "__bkt" in part_keys, (
                f"row-level window partitioned by [{part_keys}] without bucket key:\n{plan}"
            )


def test_repetition_stats_is_map_side(spark):
    """Per-document repetition stats are pure projections: no exchange,
    no aggregate — the corpus never shuffles."""
    out = entrymod.queries()["repetition_stats"](spark, SF_DIR)
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_pack_greedy_single_exchange(spark):
    """Greedy packing shuffles once — the (domain, chunk) grouping for
    the Arrow kernel — with deterministic chunk keys derived from ids."""
    out = entrymod.queries()["pack_greedy"](spark, SF_DIR)
    plan = _plan(out)
    assert _count(plan, r"Exchange hashpartitioning") == 1, plan
    assert "FlatMapGroupsInPandas" in plan or "MapGroups" in plan, plan


def test_dup_passage_stats_shuffles_hashes_not_strings(spark):
    """The n-gram stream must hash to 64-bit BEFORE the first exchange:
    no string column crosses the wire, every exchange is keyed (no
    round-robin), and partial aggregation runs below the full-stream
    shuffle (map-side combine before the wire)."""
    out = entrymod.queries()["dup_passage_stats"](spark, SF_DIR)
    plan = _plan(out)
    assert "Exchange rangepartitioning" not in plan, plan
    assert "RoundRobin" not in plan, plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert "text" not in keys, f"text column shuffled: {keys}\n{plan}"
    # partial (merge-less) aggregate appears below the exchange
    assert _count(plan, r"HashAggregate") >= 2, plan


def test_q5_broadcasts_every_dimension(spark):
    """Q5's four dimension joins broadcast; no cartesian/nested-loop
    join sneaks in via the two-table nation equality."""
    out = entrymod.queries()["q5_local_supplier"](spark, SF_DIR)
    plan = _plan(out)
    assert _count(plan, r"BroadcastHashJoin") >= 4, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_gopher_rules_is_map_side(spark):
    """Per-document rules are pure projections over one scan: no
    exchange, no aggregate — the corpus never shuffles."""
    out = entrymod.queries()["gopher_rules"](spark, SF_DIR)
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "HashAggregate" not in plan, plan
    assert _count(plan, r"Scan parquet") == 1, plan


def test_despike_closeout_trims_before_python(spark):
    """The close-out must filter each cast to its tail JVM-side BEFORE
    the pandas kernel: a Filter on the reverse row number sits between
    the Window and FlatMapGroupsInPandas, and the whole plan rides one
    hash exchange (trim window and kernel groupBy share the cast key)."""
    out = entrymod.queries()["despike_closeout"](spark, SF_DIR)
    plan = _plan(out)
    assert "FlatMapGroupsInPandas" in plan, plan
    assert re.search(r"Filter .*__rev", plan), plan
    assert _count(plan, r"Exchange hashpartitioning") == 1, plan


def test_correlated_subquery_decorrelates(spark):
    """Catalyst must rewrite the correlated scalar subquery to an
    aggregate + join — never a per-row nested-loop re-execution."""
    out = entrymod.queries()["correlated_subquery"](spark, SF_DIR)
    plan = _plan(out)
    assert "NestedLoop" not in plan, plan
    assert _count(plan, r"HashAggregate") >= 2, plan
    assert _count(plan, r"SortMergeJoin|BroadcastHashJoin") >= 1, plan


def test_q4_exists_compiles_to_semi_join(spark):
    """The EXISTS must become a semi join carrying the non-equi ship-date
    predicate as a residual — never a per-row subquery or a nested loop,
    and no pre-aggregation/distinct of lineitem."""
    plan = _plan(entrymod.queries()["q4_order_priority"](spark, SF_DIR))
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin).*LeftSemi", plan), plan
    assert "NestedLoop" not in plan, plan
    assert "l_shipdate" in plan.split("LeftSemi")[1].split("\n")[0], plan


def test_q10_topk_is_take_ordered(spark):
    """ORDER BY revenue LIMIT 20 must compile to TakeOrderedAndProject
    (per-partition top-k, driver merge of 20-row heads) — a global Sort
    of the aggregate output would shuffle everything to sort a table the
    query keeps 20 rows of."""
    plan = _plan(entrymod.queries()["q10_returned_items"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert _count(plan, r"Exchange hashpartitioning") == 1, plan


def test_quantile_filter_broadcasts_bounds(spark):
    """The per-domain percentile bounds must broadcast back onto the
    corpus — the corpus side never shuffles for the trim."""
    plan = _plan(entrymod.queries()["quantile_filter"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    # the only exchange feeds the tiny bounds aggregate, not the corpus
    assert _count(plan, r"Exchange hashpartitioning") <= 1, plan


def test_domain_mix_temp_is_map_side_on_corpus(spark):
    """Temperature mixing: counts aggregate + 1-row denominator cross
    join + broadcast rate join; the corpus side itself never exchanges."""
    plan = _plan(entrymod.queries()["domain_mix_temp"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    # exchanges only below the tiny counts/denominator aggregates
    assert _count(plan, r"Exchange hashpartitioning") <= 2, plan


def test_chunk_documents_no_shuffle(spark):
    """Chunking is a pure map-side 1->N fan-out: no exchange anywhere."""
    plan = _plan(entrymod.queries()["chunk_documents"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "Generate explode" in plan, plan


def test_exact_sample_uses_window_group_limit(spark):
    """Per-group fixed-budget sampling must push a partial top-k below
    the exchange (WindowGroupLimit), so ~k rows per group shuffle."""
    plan = _plan(entrymod.queries()["exact_sample"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan


def test_interval_join_is_hash_join_on_cells(spark):
    """The range join must compile to a hash equi-join on the grid cell
    with the containment residual — never a nested loop."""
    plan = _plan(entrymod.queries()["interval_join"](spark, SF_DIR))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin).*__cell", plan), plan


def test_q6_all_predicates_pushed_and_pruned(spark):
    """TPC-H Q6: every predicate reaches the parquet scan and only the
    four referenced columns are read — the canonical pushdown check."""
    out = entrymod.queries()["q6_forecast_revenue"](spark, SF_DIR)
    plan = _plan(out)
    # the plan printer truncates long filter lists ("...," with no
    # closing bracket) — match to end-of-line instead
    m = re.search(r"PushedFilters: \[([^\r\n]*)", plan)
    assert m, plan
    pushed = m.group(1)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(
        f.split(":")[0] for f in m.group(1).split(",")
    ) == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}, plan
    assert "Exchange hashpartitioning" not in plan  # single global agg


def test_q19_disjunction_stays_hash_join(spark):
    """TPC-H Q19: the OR-of-branches must not force a nested-loop join —
    the common part-key conjunct keeps one broadcast hash join, and the
    per-branch predicates reach both scans."""
    out = entrymod.queries()["q19_disjunctive_revenue"](spark, SF_DIR)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    assert _count(plan, r"PushedFilters: \[[^\]]*Or\(") >= 2, plan


def test_q21_exists_pair_is_aggregates_not_correlated(spark):
    """TPC-H Q21: the EXISTS / NOT-EXISTS pair compiles to two hash
    aggregates + a join — no nested-loop re-execution per row."""
    out = entrymod.queries()["q21_waiting_suppliers"](spark, SF_DIR)
    plan = _plan(out)
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    assert _count(plan, r"HashAggregate") >= 4, plan  # 2 aggs x partial/final


def test_q22_anti_join_is_hash(spark):
    """TPC-H Q22: NOT EXISTS compiles to a hash LeftAnti join (never
    sort-merge on this dim size) and the recent-orders date filter is
    pushed to the orders scan.  The scalar avg enters via a 1-row
    BroadcastNestedLoopJoin — the standard scalar-subquery shape, NOT a
    data-sized nested loop — so only SortMergeJoin is banned here."""
    out = entrymod.queries()["q22_idle_customers"](spark, SF_DIR)
    plan = _plan(out)
    assert "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert re.search(r"PushedFilters: \[[^\r\n]*o_orderdate", plan), plan


def test_quantized_ann_corpus_never_shuffles_before_rank(spark):
    """sq8: the quantized candidate scan must be map-side (broadcast
    query side); the only exchanges serve the per-query rank windows."""
    out = entrymod.queries()["quantized_ann_topk"](spark, SF_DIR)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_aqe_splits_planted_skew_join(spark):
    """VERDICT r8 item 8: AQE's runtime skew-join split, asserted on the
    executed plan of a planted 90%-hot-key sort-merge join (the
    tools/bench_scale.py skew-join fixture, shrunk).  Thresholds scale
    with the fixture (same ratios as the 256m/64m/5 defaults), the
    dimension is non-broadcastable by config (modeling a dim too big to
    broadcast — when it fits, F.broadcast makes skew moot), and the
    assertion reads SortMergeJoin(skew=true) from the FINALIZED adaptive
    plan — the split that actually happened, not the config that allows
    it.  The wall/speedup evidence lives in bench_scale + PLANS.md r9."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(400_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 100).alias("key"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("key"), (F.col("id") * 2).alias("attr")
        )
        j = (
            fact.join(dim, "key")
            .groupBy("attr")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        )
        rows = j.collect()
        assert len(rows) == 11  # key 0 + the 10 mod-10 survivors
        plan = _plan(j)
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_heavy_hitters_candidate_pass_never_shuffles(spark):
    """The Misra-Gries candidate pass is a map-side mapInPandas — no
    Exchange may appear BELOW it (the whole point: the value space
    reaches no shuffle); the exact pass joins the candidates broadcast,
    and no SortMergeJoin exists anywhere in the executed plan."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.sketches import heavy_hitters

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    # the candidate pass runs EAGERLY inside heavy_hitters (its result
    # is bounded driver state: partitions x (capacity+1) rows), so the
    # RETURNED plan is the exact pass only.  Pin the candidate pass's
    # map-side shape on the equivalent staged frame first:
    from pyspark.sql import types as T

    staged = df.select(F.col("tok").cast("string").alias("v"))
    probe = staged.mapInPandas(
        lambda it: it, T.StructType([T.StructField("v", T.StringType())])
    )
    probe.write.format("noop").mode("overwrite").save()
    cand_plan = _plan(probe)
    assert "MapInPandas" in cand_plan
    assert "Exchange" not in cand_plan, "candidate pass must not shuffle"

    out = heavy_hitters(df, "tok", threshold_frac=0.01)
    out.write.format("noop").mode("overwrite").save()
    plan = _plan(out)
    # exact pass: candidates arrive as COLLECTED bounded rows (a local
    # relation / RDD scan, not a recomputation of the corpus)...
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    # ...joined broadcast-semi; the corpus-sized side never sort-merges
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    # shuffle budget: one exchange for the exact count aggregate plus
    # the broadcast — never one per distinct value set
    assert _count(plan, "Exchange") <= 3


def test_strip_boilerplate_plan_shapes(spark):
    """Boilerplate set joins BROADCAST (it is the handful of lines over
    the doc threshold), no cartesian product anywhere, and the rebuild
    aggregates on the doc key."""
    from python_ctd_spark.operators.text import strip_boilerplate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    out = strip_boilerplate(docs, min_docs=400, sep=" ")
    out.write.format("noop").mode("overwrite").save()
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_remove_dup_passages_plan_shape(spark):
    """Duplicated-span removal (new r11): every join is hash-based (no
    nested-loop / cartesian anywhere), the gram/doc-frequency passes
    read ONLY (doc_id, text) from parquet, and every exchange is keyed
    (gram hash, (doc, pos), or doc) — the shape that survives 100x."""
    out = entrymod.queries()["remove_dup_passages"](spark, SF_DIR)
    out.write.format("noop").mode("overwrite").save()
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # column pruning on the gram-side scans: at least one scan carries
    # only the two referenced fields
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    # all exchanges are hash-keyed (plus broadcasts); never round-robin
    # or single-partition funnels
    assert _count(plan, r"Exchange rangepartitioning") == 0
    assert _count(plan, r"Exchange SinglePartition") == 0


def test_quality_classifier_training_and_scoring_plans(spark):
    """The classifier's gradient step must be ONE partial->final
    aggregate pair over the feature frame (map-side combine; the wire
    carries 7 longs per partition) with zero joins; scoring must be
    entirely map-side — no Exchange at all."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.classify import (
        FEATURES, _p_sql, _z_sql, quality_features,
        score_quality_classifier,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feats = quality_features(docs, "text").select(
        F.lit(1).cast("bigint").alias("y"),
        *[f"qf{i}" for i in range(len(FEATURES))],
    )
    w = [0.1] * len(FEATURES)
    staged = feats.selectExpr(
        "y", f"{_z_sql(w)} AS __z", *[f"qf{i}" for i in range(len(FEATURES))]
    ).selectExpr(
        f"CAST(floor(({_p_sql()} - CAST(y AS DOUBLE)) * 1000000.0 + 0.5)"
        " AS BIGINT) AS __r",
        *[f"qf{i}" for i in range(len(FEATURES))],
    )
    grad = staged.agg(
        *[F.sum(F.col("__r") * F.col(f"qf{i}")).alias(f"g{i}")
          for i in range(len(FEATURES))]
    )
    plan = _plan(grad)
    assert _count(plan, r"HashAggregate") == 2, plan  # partial + final
    assert "Join" not in plan
    assert _count(plan, r"Exchange") == 1, plan       # the 7-long gather

    scored = score_quality_classifier(docs, w)
    splan = _plan(scored)
    assert "Exchange" not in splan, "scoring must be map-side"
    assert "Join" not in splan


def test_redact_pii_plan_is_map_side(spark):
    """The PII chain is native regex projections only — no Exchange, no
    Python workers in the plan."""
    out = entrymod.queries()["pii_redact_full"](spark, SF_DIR)
    plan = _plan(out)
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
