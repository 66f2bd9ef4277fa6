"""sf1-class scale check (PLANS.md evidence): does the engine's wall
time stay ~linear — and the CC fixpoint iteration count flat — when the
corpus grows 10x past the bench scale?

Measurements (pick by arg):

- **docs / both**: dedup_clusters (LSH pairs -> iterative connected
  components) over sf0.1 documents vs a 10x suffix-perturbed staged
  corpus; wall, fixpoint iterations, shuffle bytes (Spark REST API).
- **fleet / both**: canonical CTD chain at 64 vs 640 casts.
- **probe / probe-ivf / probe-sq8**: stored-index serving paths at
  1x/10x/100x — probe wall must track candidates, never corpus size.
- **cc-chain**: planted 1k/10k-node chains — the auto algorithm must
  hand off to large-star/small-star and finish in ~log n rounds.
- **semantic**: semantic_dedup with a planted 20% hot cell at
  1x/10x/100x — the max_cell_rows LSH split must bound candidate
  pairs to <= cap * n_rows.
- **partition-prune**: a one-day rollup against flat vs
  event_date-partitioned 10x archives — non-empty PartitionFilters and
  a files-read metric pruned to the matching date directory.
- **skew-join**: planted 90%-hot-key sort-merge join at 1x/10x — the
  executed plan must show ``SortMergeJoin(skew=true)`` (AQE actually
  split the hot partitions) and wall with handling on must stay
  bounded while handling off degrades with the hot key.
- **tail**: tokenize -> pack_sequences -> shard_documents at
  1x/10x/100x documents — parts/doc bound, shard balance within the
  4-sigma binomial bound (ASSERTED), wall ~linear.
- **media**: image decode+hash+banded pairs and the cluster-balanced
  diversity sample at 1x/10x ids — pair count EXACTLY linear in
  fixture groups, sample size invariant (budget-sized), shuffle =
  fingerprints only (ASSERTED).
- **warc**: the crawl ingestion head at 4 vs 40 gzip shards — exact
  doc counts, ZERO shuffle bytes end-to-end (ASSERTED), wall tracks
  records/core with shard-level parallelism.
- **warc-big**: the memory contract for ONE >=100 MB compressed shard
  that inflates ~15x — pyspark-worker peak RSS delta must stay under
  HALF the decompressed size (ASSERTED), proving the gzip members are
  streamed record-by-record, never inflated whole in the worker.

Usage:  python tools/bench_scale.py [docs|fleet|both|probe|probe-ivf|
        probe-sq8|probe-pq|pack|cc-chain|semantic|partition-prune|
        skew-join|spans|spans-clean|media|warc|warc-big|training-dataset]
        (default docs)

Run each measurement in its own process — the fleet run builds ~650 MB
of staged casts and its own session.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _shuffle_bytes(ui_port: int = 4040) -> dict:
    """Total shuffle read/write bytes across all completed stages."""
    base = f"http://localhost:{ui_port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/applications/{app_id}/stages"))
    return {
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
        ),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
        ),
        "n_stages": len(stages),
    }


def stage_docs(mult: int, out_dir: str) -> str:
    """10x the sf0.1 documents table: copy i remaps doc_id += i*N and
    appends a short suffix so copies remain NEAR-duplicates of their
    source (byte-identical copies would collapse into exact-dup cliques
    and understate the fuzzy path's work)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet")
    n = tbl.num_rows
    parts = []
    for i in range(mult):
        ids = pa.compute.add(tbl["doc_id"], i * n)
        texts = tbl["text"] if i == 0 else pa.compute.binary_join_element_wise(
            pa.compute.cast(tbl["text"], pa.string()), f" copytag{i}", ""
        )
        cols = {name: tbl[name] for name in tbl.column_names}
        cols["doc_id"] = ids
        cols["text"] = texts
        parts.append(pa.table(cols))
    big = pa.concat_tables(parts)
    path = os.path.join(out_dir, f"documents_x{mult}.parquet")
    pq.write_table(big, path)
    return path


def measure_docs(mult: int) -> dict:
    from python_ctd_spark.operators.dedup import dedup_clusters
    from python_ctd_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_scale_x{mult}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    tmp = tempfile.mkdtemp(prefix="scale_docs_")
    try:
        path = stage_docs(mult, tmp)
        docs = spark.read.parquet(path)
        stats: dict = {}
        t0 = time.perf_counter()
        out = dedup_clusters(docs, stats=stats)
        n_rows = out.count()
        n_dups = out.filter("NOT is_keeper").count()
        wall = time.perf_counter() - t0
        rec = {
            "mult": mult,
            "docs": docs.count(),
            "wall_s": round(wall, 2),
            "cc_iterations": stats.get("iterations"),
            "out_rows": n_rows,
            "non_keepers": n_dups,
        }
        rec.update(_shuffle_bytes())
        return rec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def _scan_metrics(df) -> list:
    """Executed-plan FileSourceScan metrics (numFiles/numPartitions) —
    run an action on df first; walks through the AQE wrappers (same
    helper as tests/test_sinks.py)."""
    out = []

    def walk(n):
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(n.executedPlan())
            return
        if "QueryStage" in cls:
            walk(n.plan())
            return
        if "FileSourceScan" in cls or cls.startswith("BatchScan"):
            m, vals = n.metrics(), {}
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            out.append(vals)
        cs = n.children()
        for i in range(cs.size()):
            walk(cs.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def measure_partition_prune(mult: int) -> dict:
    """VERDICT r7 item 8 evidence: END-TO-END partition pruning on a
    mult-x staged event archive.  The same one-day rollup runs against
    (a) a flat parquet copy and (b) a copy partitioned by event_date
    (io.sinks.write_casts layout); the partitioned read must show
    non-empty PartitionFilters in the plan AND a files-read metric
    pruned to the matching date directory — the scan cost of a
    date-bounded query becomes O(day), not O(archive)."""
    from pyspark.sql import functions as F

    from python_ctd_spark.io import sinks
    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name=f"bench_prune_x{mult}")
    tmp = tempfile.mkdtemp(prefix="scale_prune_")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        ts = (
            F.timestamp_micros(F.expr("ts div 1000"))
            if dict(ev.dtypes).get("ts") == "bigint"
            else F.col("ts").cast("timestamp")
        )
        base = ev.select(
            "event_id", "user_id", "value", F.to_date(ts).alias("event_date")
        )
        staged = base
        for i in range(1, mult):
            staged = staged.unionByName(
                base.withColumn("event_id", F.col("event_id") + F.lit(i * 10**9))
            )
        flat, parted = os.path.join(tmp, "flat"), os.path.join(tmp, "parted")
        staged.write.parquet(flat)
        sinks.write_casts(staged, parted, partition_by="event_date")
        day = base.agg(F.min("event_date")).first()[0]

        def rollup(df):
            return (
                df.filter(F.col("event_date") == F.lit(day))
                .groupBy("user_id")
                .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
            )

        def files_on_disk(path):
            return sum(
                1 for r, _, fs in os.walk(path)
                for f in fs if f.endswith(".parquet")
            )

        rec = {"mult": mult, "rows": staged.count(), "filter_day": str(day)}
        for tag, path in (("flat", flat), ("parted", parted)):
            df = rollup(spark.read.parquet(path))
            t0 = time.perf_counter()
            # collect THIS frame: metrics live on the executed plan of
            # the exact DataFrame inspected (count() plans separately)
            n = len(df.collect())
            wall = time.perf_counter() - t0
            (m,) = _scan_metrics(df)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rec[tag] = {
                "wall_s": round(wall, 2),
                "files_on_disk": files_on_disk(path),
                "files_read": m.get("numFiles"),
                "partitions_read": m.get("numPartitions"),
                "result_rows": n,
                "partition_filter_in_plan": "PartitionFilters: [isnotnull(event_date"
                in plan,
            }
        rec["files_pruned_ratio"] = round(
            rec["parted"]["files_on_disk"] / max(rec["parted"]["files_read"], 1), 1
        )
        return rec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_semantic(mult: int, cap: int = 500, hot_frac_mod: int = 5) -> dict:
    """VERDICT r7 item 3 evidence: semantic_dedup with a PLANTED hot
    cell (a crawl-burst 20% of the corpus crammed into one coarse cell)
    at mult-x corpus scale.  Without the guard the hot cell contributes
    n_hot^2/2 pairs (quadratic pocket); with ``max_cell_rows=cap`` the
    LSH sub-split must keep actual candidate pairs <= cap * n_rows.
    Cold cells are sized ~cap so the hot cell is the only stress."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.similarity import (
        semantic_cell_stats, semantic_dedup,
    )
    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name=f"bench_semantic_x{mult}")
    tmp = tempfile.mkdtemp(prefix="scale_sem_")
    try:
        path = stage_embeddings(mult, tmp)
        corpus = spark.read.parquet(path)
        n = corpus.count()
        n_cold_cells = max(16, (n * (hot_frac_mod - 1) // hot_frac_mod) // cap)
        assign = corpus.select(
            F.col("vec_id").alias("id"),
            F.when(F.col("vec_id") % hot_frac_mod == 0, F.lit(1))
            .otherwise(10 + F.pmod(F.xxhash64("vec_id"), F.lit(n_cold_cells)))
            .alias("cell"),
        )
        uncapped = semantic_cell_stats(assign).agg(
            F.sum("n_pairs").alias("p"), F.max("n_rows").alias("m")
        ).first()
        stats: dict = {}
        t0 = time.perf_counter()
        out = semantic_dedup(
            corpus=corpus, assignments=assign, threshold=0.95,
            max_cell_rows=cap, split_planes=8, dim=64, stats=stats,
        )
        n_out = out.count()
        wall = time.perf_counter() - t0
        return {
            "mult": mult,
            "corpus_rows": n,
            "hot_cell_rows": int(uncapped["m"]),
            "uncapped_pairs": int(uncapped["p"]),
            "capped_pairs": stats["n_candidate_pairs"],
            "pair_bound_cap_x_n": cap * n,
            "bound_ok": stats["n_candidate_pairs"] <= cap * n,
            "wall_s": round(wall, 2),
            "out_rows": n_out,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_skew_join(mult: int) -> dict:
    """VERDICT r8 item 8 evidence: AQE's runtime skew-join handling on a
    planted-zipfian key — the one scale guard not previously
    evidence-pinned.  A fact table with 90% of its rows on ONE key
    sort-merge-joins a 1000-row dimension (auto-broadcast disabled: the
    fixture models a dimension too big to broadcast — when it DOES fit,
    ``F.broadcast`` makes skew moot, which is always the first move).
    Thresholds are scaled to the fixture (skewedPartitionThreshold 1m /
    advisory 512k / factor 2 — the same RATIOS as the 256m/64m/5
    defaults at cluster scale) so the optimizer faces the same decision
    it would at 100 TB.  Asserts the executed plan shows
    ``SortMergeJoin(skew=true)`` (the split actually happened, not just
    the config) and reports wall with handling on vs off.

    When is ``salted_agg`` still needed?  AQE skew handling covers
    JOINS only — a skewed ``groupBy`` key gets partial (map-side)
    aggregation for free, which absorbs skew when the aggregate state
    is tiny (sums/counts), but high-cardinality state per hot key
    (collect_list/distinct counts) still needs the explicit two-stage
    salt.  PLANS.md r9 has the decision table."""
    from pyspark.sql import functions as F

    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name=f"bench_skew_x{mult}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    n = 2_000_000 * mult

    def run(skew_on: bool) -> tuple[float, bool]:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
        )
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000).alias("key"),
            (F.col("id") % 97).cast("double").alias("v"),
            # ~64-byte payload so the hot partition is bytes-skewed,
            # not just row-skewed (the optimizer decides on bytes)
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("key"), (F.col("id") * 2).alias("attr")
        )
        j = (
            fact.join(dim, "key")
            .groupBy("attr")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        )
        t0 = time.perf_counter()
        rows = j.collect()
        wall = round(time.perf_counter() - t0, 2)
        assert len(rows) == 101  # key 0 + the 9-mod-10 survivors
        # the DataFrame's OWN QueryExecution carries the finalized
        # adaptive plan after collect() — a .write builds a fresh one
        plan = j._jdf.queryExecution().executedPlan().toString()
        return wall, "skew=true" in plan

    run(True)  # warm (JIT + shuffle services)
    wall_on, split_on = run(True)
    wall_off, split_off = run(False)
    assert split_on, "AQE did not split the planted skewed partitions"
    assert not split_off
    return {
        "rows": n,
        "wall_skew_on_s": wall_on,
        "wall_skew_off_s": wall_off,
        "plan_shows_skew_split": split_on,
        "speedup": round(wall_off / max(wall_on, 1e-9), 2),
    }


def measure_cc_chain(n: int) -> dict:
    """VERDICT r7 item 6 evidence: connected components on a planted
    n-node CHAIN — the worst shape for min-label propagation (diameter
    = n).  The default auto algorithm must hand off to the alternating
    large-star/small-star phase and finish in ~log n total rounds, with
    every node labeled by the chain minimum."""
    import time as _time

    from pyspark.sql import functions as F

    from python_ctd_spark.operators.dedup import connected_components
    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name=f"bench_cc_chain_{n}")
    try:
        edges = spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        stats: dict = {}
        t0 = _time.perf_counter()
        out = connected_components(edges, stats=stats)
        n_nodes = out.count()
        n_root = out.filter("label = 0").count()
        wall = _time.perf_counter() - t0
        import math

        return {
            "chain_nodes": n,
            "wall_s": round(wall, 2),
            "iterations": stats["iterations"],
            "label_rounds": stats["label_rounds"],
            "star_rounds": stats["star_rounds"],
            "algorithm": stats["algorithm"],
            "log2_n": round(math.log2(n), 1),
            "all_rooted_at_min": n_root == n_nodes == n,
        }
    finally:
        spark.stop()


def measure_fleet(n: int) -> dict:
    from tools.bench_fleet import time_engine

    eng = time_engine(n)
    return {"n_casts": n, **{k: round(v, 2) for k, v in eng.items()}}


def stage_embeddings(mult: int, out_dir: str) -> str:
    """mult-x the sf0.1 embeddings table: copy i remaps vec_id += i*N
    and deterministically perturbs each vector (~1e-3 relative) so the
    copies are near- but not exact duplicates — buckets stay realistic,
    candidate sets don't collapse."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    n = tbl.num_rows
    vecs = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float32)
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    labels = np.asarray(tbl["label"].to_pylist(), dtype=np.int32)
    parts = []
    for i in range(mult):
        v = vecs if i == 0 else vecs * (
            1.0 + 1e-3 * np.cos(i + np.arange(vecs.shape[1]))[None, :]
        ).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + i * n),
                    "embedding": pa.array([list(map(float, r)) for r in v],
                                          type=pa.list_(pa.float32())),
                    "label": pa.array(labels),
                }
            )
        )
    path = os.path.join(out_dir, f"embeddings_x{mult}.parquet")
    pq.write_table(pa.concat_tables(parts), path)
    return path


def measure_probe(mult: int, n_queries: int = 50) -> dict:
    """Serving-path scale check (VERDICT r6 item 7): build + store the
    LSH index ONCE (corpus-sized, one-time), then time lsh_probe for a
    FIXED query set against the mult-x corpus.  Probe wall should track
    the candidate count (occupancy of the probed buckets), never re-pay
    corpus-size work — the plan never re-hashes the corpus (pinned in
    tests/test_sinks.py)."""
    from pyspark.sql import functions as F

    from python_ctd_spark.io import sinks
    from python_ctd_spark.operators.similarity import (
        lsh_index, lsh_probe, probe_masks, signature_table,
    )
    from python_ctd_spark.session import get_spark

    n_planes, n_tables, dim, bits = 6, 4, 64, 2
    spark = get_spark(app_name=f"bench_probe_x{mult}")
    tmp = tempfile.mkdtemp(prefix="scale_emb_")
    table = f"t_scale_ann_x{mult}"
    try:
        path = stage_embeddings(mult, tmp)
        corpus = spark.read.parquet(path)
        n_corpus = corpus.count()
        t0 = time.perf_counter()
        sinks.write_bucketed(
            lsh_index(corpus, n_planes=n_planes, n_tables=n_tables, dim=dim),
            table, buckets=8, by=["tbl", "bkt"], sort_by=["tbl", "bkt"],
        )
        build_s = time.perf_counter() - t0
        ix = sinks.read_table(spark, table)
        queries = corpus.filter(F.col("vec_id") < n_queries)

        # candidate volume: rows fetched from the probed buckets (the
        # quantity probe wall should scale with)
        q = queries.select(F.col("vec_id").alias("qid"),
                           F.col("embedding").cast("array<double>").alias("qe"))
        qb = signature_table(q, ["qid"], "qe", n_planes, n_tables, dim)
        probes = F.array(*[F.col("bkt").bitwiseXOR(F.lit(m))
                           for m in probe_masks(n_planes, bits)])
        qb = qb.select("qid", "tbl", F.explode(probes).alias("bkt"))
        n_cand = (
            ix.join(F.broadcast(qb), ["tbl", "bkt"])
            .filter(F.col("id") != F.col("qid"))
            .select("qid", "id").distinct().count()
        )

        # steady-state probe wall (min of 3; first pass pays JIT)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = lsh_probe(
                ix, corpus, queries, k=5, n_planes=n_planes,
                n_tables=n_tables, dim=dim, n_probe_bits=bits,
            )
            n_res = res.count()
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return {
            "mult": mult,
            "corpus_rows": n_corpus,
            "index_build_s": round(build_s, 2),
            "n_candidates": n_cand,
            "probe_wall_s": round(min(walls), 2),
            "result_rows": n_res,
        }
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_ivf_probe(mult: int, n_queries: int = 50) -> dict:
    """IVF twin of measure_probe: assignments + centroids stored once,
    then ivf_probe for a fixed query set.  Per-query work = scoring
    against the tiny broadcast centroid table + fetching the probed
    cells' candidates; the corpus argmax never reruns."""
    from pyspark.sql import functions as F

    from python_ctd_spark.io import sinks
    from python_ctd_spark.operators.similarity import ivf_index, ivf_probe
    from python_ctd_spark.session import get_spark

    n_centroids, n_probe = 16, 2
    spark = get_spark(app_name=f"bench_ivf_probe_x{mult}")
    tmp = tempfile.mkdtemp(prefix="scale_emb_")
    t_assign, t_cent = f"t_scale_ivf_x{mult}", f"t_scale_ivf_cent_x{mult}"
    try:
        path = stage_embeddings(mult, tmp)
        corpus = spark.read.parquet(path)
        n_corpus = corpus.count()
        t0 = time.perf_counter()
        assignments, cent = ivf_index(corpus, n_centroids=n_centroids)
        sinks.write_bucketed(
            assignments, t_assign, buckets=8, by="cell", sort_by="cell"
        )
        cent.write.mode("overwrite").saveAsTable(t_cent)
        build_s = time.perf_counter() - t0
        ix = sinks.read_table(spark, t_assign)
        stored_cent = sinks.read_table(spark, t_cent)
        queries = corpus.filter(F.col("vec_id") < n_queries)
        # candidate volume = occupancy of the probed cells (what the
        # probe wall should scale with, NOT corpus size)
        from python_ctd_spark.operators.similarity import (
            _as_double, _nearest_cells,
        )

        q = queries.select(
            F.col("vec_id").alias("qid"), _as_double("embedding").alias("qe")
        )
        probes = _nearest_cells(
            q, "qid", "qe", n_probe, stored_cent
        ).select("qid", "cell")
        n_cand = (
            ix.join(F.broadcast(probes), "cell")
            .filter(F.col("id") != F.col("qid"))
            .select("qid", "id").distinct().count()
        )
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = ivf_probe(
                ix, stored_cent, corpus, queries, k=5, n_probe=n_probe
            )
            n_res = res.count()
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        return {
            "mult": mult,
            "corpus_rows": n_corpus,
            "index_build_s": round(build_s, 2),
            "n_candidates": n_cand,
            "probe_wall_s": round(min(walls), 2),
            "result_rows": n_res,
        }
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_assign}")
        spark.sql(f"DROP TABLE IF EXISTS {t_cent}")
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_sq8(mult: int, n_queries: int = 10) -> dict:
    """int8-quantized brute scan vs exact brute at mult-x corpus.

    sq8 is deliberately LINEAR in the corpus (it is compressed brute
    force — the sub-linear dials are the LSH/IVF candidate cuts it
    composes with); what this measures is the *constant*: wall of the
    integer candidate scan vs the exact double+decimal scan over the
    same pairs, plus the stored-codes parquet footprint vs the raw
    embedding column (the 100 TB byte claim)."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.similarity import (
        cosine_topk, quantize_vectors, quantized_topk,
    )
    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name=f"bench_sq8_x{mult}")
    tmp = tempfile.mkdtemp(prefix="scale_sq8_")
    try:
        path = stage_embeddings(mult, tmp)
        corpus = spark.read.parquet(path)
        n_corpus = corpus.count()
        queries = corpus.filter(F.col("vec_id") < n_queries)

        codes_path = os.path.join(tmp, "codes.parquet")
        t0 = time.perf_counter()
        quantize_vectors(corpus).write.parquet(codes_path)
        build_s = time.perf_counter() - t0
        raw_b = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path if os.path.isdir(path) else tmp)
            for f in fs if f.endswith(".parquet") and "codes" not in r
        ) or os.path.getsize(path)
        code_b = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(codes_path) for f in fs
        )

        def _wall(fn):
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn().count()
                walls.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            return round(min(walls), 2)

        sq8_wall = _wall(lambda: quantized_topk(corpus, queries, k=5))
        exact_wall = _wall(lambda: cosine_topk(corpus, queries, k=5))
        return {
            "mult": mult,
            "corpus_rows": n_corpus,
            "quantize_write_s": round(build_s, 2),
            "raw_parquet_bytes": raw_b,
            "codes_parquet_bytes": code_b,
            "bytes_ratio": round(raw_b / max(code_b, 1), 2),
            "sq8_wall_s": sq8_wall,
            "exact_wall_s": exact_wall,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_pq(mult: int, n_queries: int = 10) -> dict:
    """Stored-PQ-codes probe vs exact brute at mult-x corpus.

    Like sq8, the ADC candidate scan is LINEAR in the corpus — what PQ
    changes is the CONSTANT per pair (8 table lookups, not 64 double
    multiplies) and, above all, the BYTES: 8 one-byte codes + one
    stored norm per vector vs the raw float column.  This measures the
    stored-codes parquet footprint vs raw (the 100 TB residency claim),
    the one-pass encode wall, and probe wall (codes pre-built, the
    serving shape) vs the exact scan."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.pq import (
        pq_encode, pq_seed_codebooks, pq_topk,
    )
    from python_ctd_spark.operators.similarity import cosine_topk
    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name=f"bench_pq_x{mult}")
    tmp = tempfile.mkdtemp(prefix="scale_pq_")
    try:
        path = stage_embeddings(mult, tmp)
        corpus = spark.read.parquet(path)
        n_corpus = corpus.count()
        queries = corpus.filter(F.col("vec_id") < n_queries)

        books = pq_seed_codebooks(corpus)
        codes_path = os.path.join(tmp, "pq_codes.parquet")
        t0 = time.perf_counter()
        pq_encode(corpus, books).write.parquet(codes_path)
        build_s = time.perf_counter() - t0
        raw_b = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path if os.path.isdir(path) else tmp)
            for f in fs if f.endswith(".parquet") and "codes" not in r
        ) or os.path.getsize(path)
        code_b = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(codes_path) for f in fs
        )
        stored = spark.read.parquet(codes_path)

        def _wall(fn):
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn().count()
                walls.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            return round(min(walls), 2)

        pq_wall = _wall(
            lambda: pq_topk(stored, corpus, queries, books, k=5, margin=16)
        )
        exact_wall = _wall(lambda: cosine_topk(corpus, queries, k=5))
        return {
            "mult": mult,
            "corpus_rows": n_corpus,
            "encode_write_s": round(build_s, 2),
            "raw_parquet_bytes": raw_b,
            "codes_parquet_bytes": code_b,
            "bytes_ratio": round(raw_b / max(code_b, 1), 2),
            "pq_probe_wall_s": pq_wall,
            "exact_wall_s": exact_wall,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_pack(mult: int, seq_len: int = 512) -> dict:
    """pack_sequences assembly at mult-x documents: verifies the O(docs)
    claim — the shuffle ships per-window array slices, never per-token
    rows, so wall should track the document count ~linearly (the token
    stream is synthesized natively so the measurement isolates the
    ASSEMBLY, not the Python BPE loop).  Records wall, window counts,
    and the parts:docs ratio (each doc emits 1 + n_tokens/seq_len
    slices; a token-level explode would make this ratio ~avg_tokens)."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.assemble import pack_sequences
    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name=f"bench_pack_x{mult}")
    tmp = tempfile.mkdtemp(prefix="scale_pack_")
    try:
        path = stage_docs(mult, tmp)
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        # deterministic synthetic ids, ~128 tokens/doc
        ids = docs.select(
            "source", "doc_id",
            F.expr(
                "transform(sequence(1, 64 + CAST(doc_id % 128 AS INT)),"
                " i -> CAST((doc_id * 131 + i) % 50000 AS INT))"
            ).alias("token_ids"),
        )
        walls = []
        out_rows = total_tokens = 0
        for _ in range(3):
            t0 = time.perf_counter()
            agg = pack_sequences(ids, seq_len=seq_len).agg(
                {"n_tokens": "sum", "seq_id": "count"}
            ).collect()[0]
            walls.append(time.perf_counter() - t0)
            out_rows, total_tokens = int(agg[1]), int(agg[0])
            spark.catalog.clearCache()
        avg_tokens = total_tokens / max(out_rows, 1)
        return {
            "mult": mult,
            "n_docs": n_docs,
            "full_windows": out_rows,
            "packed_tokens": total_tokens,
            "parts_per_doc_bound": round(1 + (avg_tokens / seq_len), 2),
            "wall_s": round(min(walls), 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_tail(mult: int, seq_len: int = 512, n_shards: int = 64) -> dict:
    """VERDICT r8 item 5: the full pipeline TAIL — tokenize ->
    pack_sequences -> shard_documents — at mult-x documents, with the
    three scale invariants asserted, not just reported:

    - **parts/doc ~2**: the packer ships one array slice per window a
      document overlaps (1 + n_tokens/seq_len), never per-token rows;
    - **shard balance within the binomial bound**: shards are
      equi-probable bins of an md5 uniform, so max deviation from
      n/n_shards must sit inside 4 sigma — skew impossible by
      construction, now measured at scale;
    - **wall ~linear**: the caller compares walls across 1x/10x/100x
      (one hash shuffle on (source, seq_id); no stage holds more than
      a window's tokens).

    Token ids are synthesized natively at ~128/doc so the measurement
    isolates the ENGINE tail; the Python BPE loop is map-side
    embarrassingly parallel (its own scaling is the bpe_wall_s column,
    measured with the real merges fixture at 1x/10x — at 100x it costs
    minutes of pure UDF CPU and adds no assembly information)."""
    import math

    from pyspark.sql import functions as F

    from python_ctd_spark.operators.assemble import (
        pack_sequences, shard_documents,
    )
    from python_ctd_spark.session import get_spark

    spark = get_spark(app_name=f"bench_tail_x{mult}")
    tmp = tempfile.mkdtemp(prefix="scale_tail_")
    try:
        path = stage_docs(mult, tmp)
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        bpe_wall = None
        if mult <= 10:
            from python_ctd_spark.operators.text import bpe_tokenize

            t0 = time.perf_counter()
            bpe_tokenize(docs.select("source", "doc_id", "text")).agg(
                F.sum(F.size("token_ids"))
            ).collect()
            bpe_wall = round(time.perf_counter() - t0, 2)
        ids = docs.select(
            "source", "doc_id",
            F.expr(
                "transform(sequence(1, 64 + CAST(doc_id % 128 AS INT)),"
                " i -> CAST((doc_id * 131 + i) % 50000 AS INT))"
            ).alias("token_ids"),
        )
        walls = []
        stats = None
        for _ in range(3):
            t0 = time.perf_counter()
            seqs = pack_sequences(ids, seq_len=seq_len)
            keyed = seqs.select(
                "n_tokens",
                F.concat_ws("|", "source", "seq_id").alias("seq_key"),
            )
            sharded = shard_documents(
                keyed, n_shards, key_col="seq_key", rank=False
            )
            row = sharded.groupBy("shard").agg(
                F.count(F.lit(1)).alias("n")
            ).agg(
                F.sum("n").alias("n_seqs"),
                F.max("n").alias("max_shard"),
                F.min("n").alias("min_shard"),
                F.count(F.lit(1)).alias("shards_hit"),
            ).collect()[0]
            walls.append(time.perf_counter() - t0)
            stats = row
            spark.catalog.clearCache()
        n_seqs = int(stats["n_seqs"])
        mean = n_seqs / n_shards
        sigma = math.sqrt(n_seqs * (1 / n_shards) * (1 - 1 / n_shards))
        max_dev = max(
            abs(int(stats["max_shard"]) - mean),
            abs(int(stats["min_shard"]) - mean),
        )
        parts_bound = 1 + (128.0 / seq_len)  # avg ~128 tokens/doc
        assert max_dev <= 4 * sigma, (
            f"shard imbalance {max_dev:.1f} > 4 sigma ({4 * sigma:.1f})"
        )
        return {
            "mult": mult,
            "n_docs": n_docs,
            "n_sequences": n_seqs,
            "shards_hit": int(stats["shards_hit"]),
            "shard_max_dev": round(max_dev, 1),
            "shard_4sigma_bound": round(4 * sigma, 1),
            "parts_per_doc_bound": round(parts_bound, 2),
            "bpe_wall_s": bpe_wall,
            "tail_wall_s": round(min(walls), 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_training_dataset(mult: int) -> dict:
    """VERDICT r9 item 6: scale-run the COMPOSED training_dataset row
    (clean -> dedup keepers -> leakage-safe TRAIN cut -> mixture -> BPE
    ids -> packed sequences -> shard report) at mult-x documents — the
    stages are individually scale-measured; this measures their
    composition.  Asserted invariants:

    - the driver sees only the <= n_shards-row report (the query's own
      contract — the collect is the report build);
    - shuffle bytes scale ~linearly with documents (each stage boundary
      is one hash shuffle on corpus-sized keys; nothing quadratic
      hides in the composition) — asserted by the CALLER across mults
      via the shuffle_write_mb column;
    - checkpoint sizes stay bounded by corpus size: the two
      localCheckpoints (cluster table, tokenized frame) are O(docs)
      rows; reported as rdd storage bytes for the PLANS table."""
    import urllib.request

    from python_ctd_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name=f"bench_td_x{mult}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    tmp = tempfile.mkdtemp(prefix="scale_td_")
    try:
        staged = stage_docs(mult, tmp)
        os.rename(staged, os.path.join(tmp, "documents.parquet"))
        import pyarrow.parquet as _pq

        n_docs = _pq.ParquetFile(
            os.path.join(tmp, "documents.parquet")
        ).metadata.num_rows
        t0 = time.perf_counter()
        rep = entrymod.queries()["training_dataset"](spark, tmp)
        rows = rep.collect()
        wall = time.perf_counter() - t0
        assert len(rows) <= 8, "report must stay <= n_shards rows"
        # checkpointed block sizes (cluster table + tokenized frame)
        try:
            base = "http://localhost:4040/api/v1"
            apps = json.load(urllib.request.urlopen(f"{base}/applications"))
            rdds = json.load(urllib.request.urlopen(
                f"{base}/applications/{apps[0]['id']}/storage/rdd"
            ))
            ckpt_mb = round(sum(r.get("memoryUsed", 0) +
                                r.get("diskUsed", 0) for r in rdds) / 1e6, 1)
        except Exception:
            ckpt_mb = None
        rec = {
            "mult": mult,
            "n_docs": n_docs,
            "wall_s": round(wall, 2),
            "n_report_rows": len(rows),
            "sum_tokens": sum(int(r["sum_tokens"]) for r in rows),
            "sum_docs": sum(int(r["sum_docs"]) for r in rows),
            "checkpoint_mb": ckpt_mb,
        }
        rec.update(_shuffle_bytes())
        return rec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_cleaning(mult: int) -> dict:
    """r10 cleaning-family scale evidence: strip_boilerplate and
    heavy_hitters over the mult-x staged near-dup corpus.  Invariants
    asserted by the CALLER across mults: wall ~linear, and the
    heavy-hitters CANDIDATE count bounded by partitions x capacity
    (the quantity that replaces a full-vocabulary shuffle)."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.sketches import heavy_hitters
    from python_ctd_spark.operators.text import strip_boilerplate, tokens
    from python_ctd_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_clean_x{mult}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    tmp = tempfile.mkdtemp(prefix="scale_clean_")
    try:
        path = stage_docs(mult, tmp)
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        t0 = time.perf_counter()
        sb = strip_boilerplate(docs, min_docs=390 * mult, sep=" ")
        n_boiler = int(sb.agg(F.sum("n_boiler")).first()[0])
        sb_wall = time.perf_counter() - t0
        toks = docs.select(F.explode(tokens("text")).alias("tok"))
        cap = 200
        t0 = time.perf_counter()
        hh = heavy_hitters(toks, "tok", threshold_frac=0.01, capacity=cap)
        n_hitters = hh.count()
        hh_wall = time.perf_counter() - t0
        n_parts = toks.rdd.getNumPartitions()
        rec = {
            "mult": mult,
            "n_docs": n_docs,
            "strip_wall_s": round(sb_wall, 2),
            "boiler_lines_removed": n_boiler,
            "hh_wall_s": round(hh_wall, 2),
            "n_heavy_hitters": n_hitters,
            "candidate_bound": n_parts * cap,
        }
        rec.update(_shuffle_bytes())
        return rec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_spans(mult: int) -> dict:
    """r11 scale evidence for the new family: remove_dup_passages (the
    duplicated-span removal) and quality-classifier TRAINING over the
    mult-x staged near-dup corpus.  Invariants asserted by the caller:
    span-removal wall ~linear in docs with per-doc shuffle bounded by a
    constant (the staged copies share nearly all their n-grams, so this
    measures the dup-saturated worst case), and the classifier's
    gradient shuffle ~CONSTANT in corpus size (7 BIGINTs per partition
    per iteration — the whole point of the integer-sum design)."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.classify import train_quality_classifier
    from python_ctd_spark.operators.dedup import remove_dup_passages
    from python_ctd_spark.session import get_spark
    from tools.oracles.text import _QC_GIBBERISH_EXPR

    spark = get_spark(
        app_name=f"bench_spans_x{mult}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    tmp = tempfile.mkdtemp(prefix="scale_spans_")
    try:
        path = stage_docs(mult, tmp)
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        base = _shuffle_bytes()
        t0 = time.perf_counter()
        rp = remove_dup_passages(docs, n=5, min_docs=2)
        agg = rp.agg(
            F.sum("n_dup_tokens").alias("rm"), F.sum("n_tokens").alias("nt")
        ).first()
        rp_wall = time.perf_counter() - t0
        mid = _shuffle_bytes()

        good = docs.selectExpr("coalesce(text, '') AS text")
        bad = docs.selectExpr(f"{_QC_GIBBERISH_EXPR} AS text")
        t0 = time.perf_counter()
        w = train_quality_classifier(good, bad, iters=3, lr=5.0)
        clf_wall = time.perf_counter() - t0
        end = _shuffle_bytes()
        return {
            "mult": mult,
            "n_docs": n_docs,
            "span_wall_s": round(rp_wall, 2),
            "dup_tokens_removed": int(agg["rm"]),
            "total_tokens": int(agg["nt"]),
            "span_shuffle_write_mb": round(
                mid["shuffle_write_mb"] - base["shuffle_write_mb"], 2
            ),
            "clf_wall_s": round(clf_wall, 2),
            "clf_shuffle_write_mb": round(
                end["shuffle_write_mb"] - mid["shuffle_write_mb"], 3
            ),
            "clf_weights_nonzero": sum(1 for x in w if x != 0.0),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def _agg_node_rows(df, class_substr: str, metric: str = "numOutputRows") -> int:
    """Sum a metric over every executed-plan node whose class name
    contains ``class_substr`` (walks AQE wrappers like _scan_metrics)."""
    total = [0]

    def walk(n):
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(n.executedPlan())
            return
        if "QueryStage" in cls:
            walk(n.plan())
            return
        if class_substr in cls:
            m = n.metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == metric:
                    total[0] += kv._2().value()
        cs = n.children()
        for i in range(cs.size()):
            walk(cs.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return total[0]


def measure_spans_clean(n_docs: int, every_k: int) -> dict:
    """r12 evidence for the remove_dup_passages CLEAN-DOC FAST PATH
    (VERDICT r11 item 4): a synthetic corpus of per-doc-unique token
    streams (md5 chains — ZERO natural shared grams) with one fixed
    passage planted into every k-th doc.  Only the planted docs own
    duplicated-gram starts, so the token-level explode + rebuild must
    shrink proportionally to the dup fraction; the gram-side
    doc-frequency aggregates are corpus-wide in both cases (they are
    the detector).  Evidence is the executed plan's own metrics — the
    rebuild aggregate's (ObjectHashAggregate/collect_list) output rows
    must equal the DIRTY doc count, not the corpus size — plus wall.
    Shuffle bytes are reported but carry no signal at bench scale:
    with a 10 MB broadcast threshold the whole token side composes as
    broadcast joins, so the gated work shows up as compute, not
    exchanges (at fleet scale those joins shuffle, and the same row
    gating bounds the exchanged bytes)."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.dedup import remove_dup_passages
    from python_ctd_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_spans_clean_{every_k}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    try:
        uniq = F.concat_ws(
            " ",
            *[F.md5(F.concat_ws("-", F.col("id").cast("string"), F.lit(str(j))))
              for j in range(100)],
        )
        planted = (
            "the quick brown crawl fox jumps over the lazy span "
            "dog again and again today"
        )
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.when(
                F.col("id") % every_k == 0,
                F.concat(uniq, F.lit(" " + planted)),
            ).otherwise(uniq).alias("text"),
        )
        # warm-up on a tiny slice: each measurement owns a fresh
        # session, so without this the FIRST variant measured pays all
        # JVM/JIT/codegen warm-up and the wall comparison is ordering,
        # not work
        warm = remove_dup_passages(docs.limit(500), n=5, min_docs=2)
        warm.agg(F.sum(F.length("text_clean"))).collect()
        base = _shuffle_bytes()
        t0 = time.perf_counter()
        rp = remove_dup_passages(docs, n=5, min_docs=2)
        # sum(length(text_clean)) forces the rebuilt text to
        # materialize — an audit-only agg lets the column pruner drop
        # the collect_list entirely and measures nothing
        out = rp.agg(
            F.sum((F.col("n_dup_tokens") > 0).cast("bigint")).alias("dirty"),
            F.sum("n_dup_tokens").alias("rm"),
            F.sum("n_tokens").alias("nt"),
            F.sum(F.length("text_clean")).alias("out_chars"),
            F.sum(
                ((F.col("n_dup_tokens") == 0)
                 & (F.col("text_clean") != F.col("text"))).cast("bigint")
            ).alias("clean_rewritten"),
        )
        # collect() (not first(), which builds a separate limit plan)
        # so the plan-node metrics below describe THIS execution
        agg = out.collect()[0]
        wall = time.perf_counter() - t0
        end = _shuffle_bytes()
        # final + partial rebuild aggregates both report; with docs
        # spanning ~1 input partition each this sums to ~2x dirty docs
        rebuild_rows = _agg_node_rows(out, "ObjectHashAggregate")
        return {
            "n_docs": n_docs,
            "dirty_every_k": every_k,
            "n_dirty": int(agg["dirty"]),
            "dup_tokens_removed": int(agg["rm"]),
            "total_tokens": int(agg["nt"]),
            "clean_docs_rewritten": int(agg["clean_rewritten"]),
            "rebuild_agg_rows": int(rebuild_rows),
            "wall_s": round(wall, 2),
            "shuffle_write_mb": round(
                end["shuffle_write_mb"] - base["shuffle_write_mb"], 2
            ),
        }
    finally:
        spark.stop()


def measure_media(mult: int) -> dict:
    """Scale evidence for the media/curation family (image_dedup +
    diversity_sample): the image pipeline's decode+hash pass is
    map-side (blobs never shuffle — only (id, hash) fingerprints enter
    the banded join), so wall should grow ~linearly in ids and pair
    count exactly linearly in fixture groups; the diversity sample's
    OUTPUT is invariant in corpus size (cells x per_cell rows), the
    whole point of a budgeted curation operator."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.curation import cluster_balanced_sample
    from python_ctd_spark.operators.media_dedup import (
        ahash_pairs, image_ahash, synthesize_image_blobs,
    )
    from python_ctd_spark.operators.similarity import ivf_index
    from python_ctd_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_media_x{mult}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    tmp = tempfile.mkdtemp(prefix="scale_media_")
    try:
        n_base = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        ids = spark.range(n_base * mult).withColumnRenamed("id", "doc_id")
        blobs = synthesize_image_blobs(ids)
        base = _shuffle_bytes()
        t0 = time.perf_counter()
        pairs = ahash_pairs(image_ahash(blobs), max_hamming=3)
        n_pairs = pairs.count()
        img_wall = time.perf_counter() - t0
        mid = _shuffle_bytes()

        emb_path = stage_embeddings(mult, tmp)
        emb = spark.read.parquet(emb_path)
        t0 = time.perf_counter()
        assignments, _cent = ivf_index(emb, n_centroids=16)
        sample = cluster_balanced_sample(assignments, per_cell=3)
        n_sample = sample.count()
        div_wall = time.perf_counter() - t0
        return {
            "mult": mult,
            "n_images": n_base * mult,
            "img_wall_s": round(img_wall, 2),
            "n_pairs": int(n_pairs),
            "img_shuffle_write_mb": round(
                mid["shuffle_write_mb"] - base["shuffle_write_mb"], 2
            ),
            "div_wall_s": round(div_wall, 2),
            "n_sample_rows": int(n_sample),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def _rss_map() -> dict[int, tuple[int, int]]:
    """pid -> (ppid, rss_pages) for every live process."""
    procs: dict[int, tuple[int, int]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                st = f.read()
            # pid (comm) state ppid ... rss is field 24 (1-based);
            # comm may contain spaces — split after the last ')'
            rest = st[st.rindex(")") + 2 :].split()
            procs[int(d)] = (int(rest[1]), int(rest[21]))
        except (OSError, ValueError, IndexError):
            continue
    return procs


def _pyworker_rss_mb() -> float:
    """Total resident MB of the pyspark DAEMON/WORKER descendants of
    this process — the processes the WARC parse (and the old
    whole-shard gzip.decompress) actually runs in.  The JVM is
    deliberately excluded: its RSS never shrinks after transient
    pipeline allocations, so a whole-tree peak measures GC slack, not
    the parser's footprint."""
    me = os.getpid()
    procs = _rss_map()
    total_pages = 0
    for pid, (_ppid, rss) in procs.items():
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
        except OSError:
            continue
        if b"pyspark.daemon" not in cmd and b"pyspark.worker" not in cmd:
            continue
        p = pid
        while p > 1:
            if p == me:
                total_pages += rss
                break
            p = procs.get(p, (0, 0))[0]
    return total_pages * os.sysconf("SC_PAGESIZE") / 1048576.0


def measure_warc_big_shard(target_mb: int = 100) -> dict:
    """Memory evidence for the streamed WARC parse (VERDICT r11 item
    6): ONE gzip shard of >= target_mb COMPRESSED bytes whose records
    inflate ~15x, read through the full head, with peak RSS of the
    pyspark WORKER processes (where the parse runs — and where the old
    whole-shard gzip.decompress lived) sampled by a daemon thread.
    The parser inflates gzip members record-by-record (gzip.GzipFile),
    so the worker peak delta must track the compressed shard (one
    Arrow-delivered copy) plus one record + one bounded output batch —
    NOT the ~15x-larger decompressed archive.  The JVM is excluded
    from the sample on purpose: its RSS keeps transient pipeline
    allocations until GC and never shrinks, so a whole-tree peak
    measures GC slack, not parser footprint.  A small warm-up parse
    runs first so worker processes and JIT'd scan code are in the
    baseline."""
    import hashlib
    import threading

    from python_ctd_spark.io.warc import (
        build_warc, make_response_record, read_warc,
        warc_responses_to_documents,
    )
    from python_ctd_spark.session import get_spark

    spark = get_spark(
        app_name="bench_warc_big", extra_conf={"spark.ui.enabled": "true"}
    )
    tmp = tempfile.mkdtemp(prefix="scale_warc_big_")
    try:
        # per-record body: 4 KiB unique hex (counter-seeded hashes, so
        # the shard can't be trivially tiny) + 28 KiB repeated filler
        # -> ~15x decompressed:compressed, the shape that separates a
        # streamed parse from a whole-shard inflate in the RSS trace
        filler = b"the quick brown crawl fox " * 1130  # ~28 KiB
        per_batch = 1024
        written = 0
        ridx = 0
        shard_path = os.path.join(tmp, "big.warc.gz")
        with open(shard_path, "wb") as f:
            while written < target_mb * 1024 * 1024:
                recs = []
                for i in range(per_batch):
                    uniq = b"".join(
                        hashlib.sha256(f"{ridx + i}-{j}".encode())
                        .hexdigest().encode()
                        for j in range(64)
                    )  # 4 KiB
                    recs.append(make_response_record(
                        f"https://big.example.org/{ridx + i}",
                        b"<html><body><p>" + uniq + filler + b"</p></body></html>",
                        f"big-{ridx + i}",
                    ))
                chunk = build_warc(recs, gz=True)
                f.write(chunk)
                written += len(chunk)
                ridx += per_batch
        from pyspark.sql import functions as F

        # warm-up: spawn workers / JIT the scan so the baseline holds them
        warm = os.path.join(tmp, "warm")
        os.makedirs(warm)
        with open(os.path.join(warm, "w.warc.gz"), "wb") as f:
            f.write(build_warc(
                [make_response_record("https://w.example.org/", b"warm", "w0")],
                gz=True,
            ))
        warc_responses_to_documents(read_warc(spark, warm)).count()

        rss0 = _pyworker_rss_mb()
        peak = [rss0]
        stop = threading.Event()

        def _sample():
            while not stop.is_set():
                peak[0] = max(peak[0], _pyworker_rss_mb())
                stop.wait(0.1)

        t = threading.Thread(target=_sample, daemon=True)
        t.start()
        t0 = time.perf_counter()
        docs = warc_responses_to_documents(read_warc(spark, shard_path))
        agg = docs.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")
        ).first()
        wall = time.perf_counter() - t0
        stop.set()
        t.join()
        return {
            "shard_mb_compressed": round(written / 1048576.0, 1),
            "n_records": int(ridx),
            "n_docs": int(agg["n"]),
            "decompressed_mb": round(int(agg["c"]) / 1048576.0, 1),
            "wall_s": round(wall, 2),
            "worker_rss_before_mb": round(rss0, 1),
            "worker_rss_peak_delta_mb": round(peak[0] - rss0, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_warc(n_shards: int, per_shard: int = 500) -> dict:
    """Scale evidence for the WARC ingestion head: n_shards gz archives
    (each ``per_shard`` HTML responses built from sf0.1 document text)
    through read_warc -> warc_responses_to_documents.  The plan is
    Scan binaryFile -> MapInPandas -> map-side projection: wall should
    track total records ~linearly with shard-level parallelism and the
    stage should produce (approximately) ZERO shuffle bytes."""
    import pyarrow.parquet as pq_

    from python_ctd_spark.io.warc import (
        build_warc, make_response_record, read_warc,
        warc_responses_to_documents,
    )
    from python_ctd_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_warc_{n_shards}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    tmp = tempfile.mkdtemp(prefix="scale_warc_")
    try:
        texts = (
            pq_.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
            ["text"].to_pylist()
        )
        for s in range(n_shards):
            recs = [
                make_response_record(
                    f"https://site{i % 97}.example.org/{s}/{i}",
                    f"<html><body><p>{texts[(s * per_shard + i) % len(texts)] or ''}"
                    f"</p></body></html>".encode(),
                    f"r-{s}-{i}",
                )
                for i in range(per_shard)
            ]
            with open(os.path.join(tmp, f"s{s}.warc.gz"), "wb") as f:
                f.write(build_warc(recs, gz=True))
        from pyspark.sql import functions as F

        base = _shuffle_bytes()
        t0 = time.perf_counter()
        docs = warc_responses_to_documents(read_warc(spark, tmp))
        # ONE action: a second pass would re-run the whole parse and
        # double the quoted wall
        agg = docs.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")
        ).first()
        n_docs, n_chars = agg["n"], agg["c"]
        wall = time.perf_counter() - t0
        end = _shuffle_bytes()
        return {
            "n_shards": n_shards,
            "n_docs": int(n_docs),
            "total_chars": int(n_chars),
            "wall_s": round(wall, 2),
            "shuffle_write_mb": round(
                end["shuffle_write_mb"] - base["shuffle_write_mb"], 3
            ),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


def measure_links(mult: int) -> dict:
    """Scale evidence for the crawl link-graph stage (r13): the full
    registered ``extract_links`` surface — four tag types, quoting
    normalization, base-URI resolution, blocklist — over a
    ``mult``-times map-side-staged sf0.1 documents table.  The plan is
    project -> explode -> project (whole-stage codegen regex work):
    wall should track input ~linearly and the stage should produce
    (approximately) ZERO shuffle bytes — link rows never cross the
    wire; at 100 TB the parallelism is the input splits'."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.markup import extract_links
    from python_ctd_spark.session import get_spark
    from tools.oracles.text import (
        _LINKS_BASE_SPARK_EXPR, _LINKS_SYNTH_SPARK_EXPR,
    )

    spark = get_spark(
        app_name=f"bench_links_{mult}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        if mult > 1:
            # map-side 1->N staging (explode, not a join): doc ids stay
            # distinct and no stage shuffles
            docs = docs.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            ).withColumn(
                "doc_id", F.col("doc_id") * mult + F.col("rep")
            ).drop("rep")
        docs = docs.withColumn(
            "html", F.expr(_LINKS_SYNTH_SPARK_EXPR)
        ).withColumn("base_uri", F.expr(_LINKS_BASE_SPARK_EXPR))
        base = _shuffle_bytes()
        t0 = time.perf_counter()
        links = extract_links(docs, "html", base_col="base_uri")
        agg = links.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("abs_url")).alias("c"),
            F.sum(F.col("is_blocked").cast("long")).alias("b"),
        ).first()
        wall = time.perf_counter() - t0
        end = _shuffle_bytes()
        return {
            "mult": mult,
            "n_links": int(agg["n"]),
            "abs_url_chars": int(agg["c"]),
            "n_blocked": int(agg["b"]),
            "wall_s": round(wall, 2),
            "shuffle_write_mb": round(
                end["shuffle_write_mb"] - base["shuffle_write_mb"], 3
            ),
        }
    finally:
        spark.stop()


def measure_robots(mult: int) -> dict:
    """Scale evidence for the crawl gatekeeper (r14, the registered
    ``robots_filter`` composition): the RULES side is fixed (one
    robots.txt per domain — at any crawl scale it is bounded by the
    domain count and KB-sized), while the LINKS side grows ``mult``x
    via map-side staging.  The 100 TB contract: per-domain rule arrays
    broadcast onto the links, the winner picked with higher-order
    array functions — link rows never cross the wire, so shuffle bytes
    must stay ~FLAT (rules-side only) while wall tracks the link
    count."""
    from pyspark.sql import functions as F

    from python_ctd_spark.operators.robots import apply_robots
    from python_ctd_spark.session import get_spark
    from tools.oracles.crawl import ROBOTS_FILTER_AGENT, robots_fixture_frames

    spark = get_spark(
        app_name=f"bench_robots_{mult}",
        extra_conf={"spark.ui.enabled": "true"},
    )
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "source"
        )
        if mult > 1:
            docs = docs.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
            ).withColumn(
                "doc_id", F.col("doc_id") * mult + F.col("rep")
            ).drop("rep")
        rules, links = robots_fixture_frames(docs)
        base = _shuffle_bytes()
        t0 = time.perf_counter()
        out = apply_robots(links, rules, agent=ROBOTS_FILTER_AGENT)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_robots_disallowed").cast("long")).alias("d"),
        ).first()
        wall = time.perf_counter() - t0
        end = _shuffle_bytes()
        return {
            "mult": mult,
            "n_links": int(agg["n"]),
            "n_disallowed": int(agg["d"]),
            "wall_s": round(wall, 2),
            "shuffle_write_mb": round(
                end["shuffle_write_mb"] - base["shuffle_write_mb"], 3
            ),
        }
    finally:
        spark.stop()


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "docs"
    results = {}
    if what in ("docs", "both"):
        results["docs_x1"] = measure_docs(1)
        results["docs_x10"] = measure_docs(10)
    if what in ("fleet", "both"):
        results["fleet_64"] = measure_fleet(64)
        results["fleet_640"] = measure_fleet(640)
    if what == "probe":
        for m in (1, 10, 100):
            results[f"probe_x{m}"] = measure_probe(m)
    if what == "probe-ivf":
        for m in (1, 10, 100):
            results[f"ivf_probe_x{m}"] = measure_ivf_probe(m)
    if what == "probe-sq8":
        for m in (1, 10):
            results[f"sq8_x{m}"] = measure_sq8(m)
    if what == "probe-pq":
        for m in (1, 10):
            results[f"pq_x{m}"] = measure_pq(m)
    if what == "pack":
        for m in (1, 10):
            results[f"pack_x{m}"] = measure_pack(m)
    if what == "cc-chain":
        for n in (1000, 10000):
            results[f"cc_chain_{n}"] = measure_cc_chain(n)
    if what == "semantic":
        for m in (1, 10, 100):
            results[f"semantic_x{m}"] = measure_semantic(m)
    if what == "partition-prune":
        results["prune_x10"] = measure_partition_prune(10)
    if what == "skew-join":
        for m in (1, 10):
            results[f"skew_join_x{m}"] = measure_skew_join(m)
    if what == "tail":
        for m in (1, 10, 100):
            results[f"tail_x{m}"] = measure_tail(m)
    if what == "cleaning":
        for m in (1, 10):
            results[f"cleaning_x{m}"] = measure_cleaning(m)
        w1, w10 = results["cleaning_x1"], results["cleaning_x10"]
        for key in ("strip_wall_s", "hh_wall_s"):
            r = w10[key] / max(w1[key], 1e-9)
            assert r < 20.0, f"{key} scaled {r:.1f}x at 10x docs"
            results[f"{key}_ratio_10x"] = round(r, 2)
    if what == "spans":
        mults = (1, 10, 100) if os.environ.get("SPANS_DEEP") else (1, 10)
        for m in mults:
            results[f"spans_x{m}"] = measure_spans(m)
        w1, w10 = results["spans_x1"], results["spans_x10"]
        r = w10["span_wall_s"] / max(w1["span_wall_s"], 1e-9)
        assert r < 20.0, f"span wall scaled {r:.1f}x at 10x docs"
        results["span_wall_ratio_10x"] = round(r, 2)
        per_doc_kb = w10["span_shuffle_write_mb"] * 1e3 / max(w10["n_docs"], 1)
        assert per_doc_kb < 32.0, f"span shuffle {per_doc_kb:.2f} KB/doc"
        results["span_shuffle_kb_per_doc_10x"] = round(per_doc_kb, 3)
        # classifier gradient shuffle must stay ~constant (not scale
        # with docs): 3 iterations x 7 longs per partition
        assert w10["clf_shuffle_write_mb"] < max(
            4 * w1["clf_shuffle_write_mb"], 1.0
        ), (w1, w10)
        results["clf_shuffle_x1_mb"] = w1["clf_shuffle_write_mb"]
        results["clf_shuffle_x10_mb"] = w10["clf_shuffle_write_mb"]
    if what == "robots":
        for m in (1, 10):
            results[f"robots_x{m}"] = measure_robots(m)
        w1, w10 = results["robots_x1"], results["robots_x10"]
        r = w10["wall_s"] / max(w1["wall_s"], 1e-9)
        assert r < 20.0, f"robots wall scaled {r:.1f}x at 10x links"
        results["robots_wall_ratio_10x"] = round(r, 2)
        # links never shuffle: the delta is the tiny rules-side prep
        # and must not scale with the link count
        assert w10["shuffle_write_mb"] < max(
            4 * w1["shuffle_write_mb"], 2.0
        ), (w1, w10)
        # the flag must follow the links: 10x links, and the disallow
        # FRACTION stays in the same band (doc ids shift under staging,
        # so per-id mod arms differ slightly — rate, not count, is the
        # invariant)
        assert w10["n_links"] == 10 * w1["n_links"]
        f1 = w1["n_disallowed"] / max(w1["n_links"], 1)
        f10 = w10["n_disallowed"] / max(w10["n_links"], 1)
        assert abs(f10 - f1) < 0.1, (f1, f10)
        results["disallow_frac_x1"] = round(f1, 4)
        results["disallow_frac_x10"] = round(f10, 4)
    if what == "media":
        for m in (1, 10):
            results[f"media_x{m}"] = measure_media(m)
        w1, w10 = results["media_x1"], results["media_x10"]
        r = w10["img_wall_s"] / max(w1["img_wall_s"], 1e-9)
        assert r < 20.0, f"image pipeline wall scaled {r:.1f}x at 10x"
        results["img_wall_ratio_10x"] = round(r, 2)
        # fixture groups are disjoint 16-id blocks, so true pairs scale
        # EXACTLY linearly with ids — the banded join must find them all
        pr = w10["n_pairs"] / max(w1["n_pairs"], 1)
        assert 9.5 <= pr <= 10.5, f"pair count scaled {pr:.2f}x at 10x ids"
        results["pair_ratio_10x"] = round(pr, 2)
        # the diversity sample's size is a function of the BUDGET
        # (cells x per_cell), never of corpus size
        assert w1["n_sample_rows"] == w10["n_sample_rows"] == 48, (w1, w10)
    if what == "spans-clean":
        for k in (50, 1):  # 2% dirty vs FULLY dirty, same corpus size
            results[f"spans_clean_k{k}"] = measure_spans_clean(20_000, k)
        lo, hi = results["spans_clean_k50"], results["spans_clean_k1"]
        # fast-path correctness: exactly the planted docs are dirty and
        # no clean doc's text was rewritten
        assert lo["n_dirty"] == 400 and hi["n_dirty"] == 20000, (lo, hi)
        assert lo["clean_docs_rewritten"] == 0, lo
        assert hi["clean_docs_rewritten"] == 0, hi
        # fast-path scaling, from the executed plan's own metrics: rows
        # through the rebuild aggregate follow the DIRTY count (final +
        # partial sum to <= ~3x dirty docs), never the corpus size —
        # on the saturated corpus the same metric covers every doc
        assert lo["rebuild_agg_rows"] <= 3 * lo["n_dirty"], lo
        assert hi["rebuild_agg_rows"] >= hi["n_docs"], hi
        ratio = lo["rebuild_agg_rows"] / max(hi["rebuild_agg_rows"], 1)
        assert ratio < 0.1, (lo, hi)
        results["rebuild_rows_ratio_2pct_vs_full"] = round(ratio, 4)
        # walls are reported but NOT asserted: at 20k docs the suite
        # is broadcast-composed and wall is dominated by plan/GC noise
        # (observed both 0.5x and 1.7x across sessions for identical
        # work splits) — the deterministic fast-path contract is the
        # row metric above
    if what == "warc":
        for m in (4, 40):
            results[f"warc_{m}_shards"] = measure_warc(m)
        w1, w10 = results["warc_4_shards"], results["warc_40_shards"]
        assert w1["n_docs"] == 2000 and w10["n_docs"] == 20000
        r = w10["wall_s"] / max(w1["wall_s"], 1e-9)
        assert r < 20.0, f"warc ingest wall scaled {r:.1f}x at 10x shards"
        results["warc_wall_ratio_10x"] = round(r, 2)
        # the ingest head is map-side end-to-end: no shuffle at EITHER scale
        assert w1["shuffle_write_mb"] < 1.0, w1
        assert w10["shuffle_write_mb"] < 1.0, w10
    if what == "warc-big":
        big = measure_warc_big_shard(100)
        results["warc_big_shard"] = big
        # the memory contract: the streamed parse must NOT materialize
        # the decompressed archive — the whole-tree peak RSS delta
        # stays under HALF the decompressed size (the old whole-shard
        # gzip.decompress held all of it at once, so it could not pass
        # this), while the shard really is >=100 MB compressed and
        # inflates substantially
        assert big["shard_mb_compressed"] >= 100, big
        assert big["decompressed_mb"] > 8 * big["shard_mb_compressed"], big
        assert big["worker_rss_peak_delta_mb"] < big["decompressed_mb"] / 2, big
    if what == "links":
        for m in (1, 10):
            results[f"links_x{m}"] = measure_links(m)
        l1, l10 = results["links_x1"], results["links_x10"]
        # links scale with docs (the synth's per-doc CASE branches keep
        # the same mod-residue mix at both scales): ~10x rows
        nr = l10["n_links"] / max(l1["n_links"], 1)
        assert 9.5 < nr < 10.5, f"link rows scaled {nr:.2f}x at 10x docs"
        # ~linear wall, and every scale has blocked links (the tracker
        # img resolves through the protocol-relative form — if
        # resolution broke, this goes to zero)
        r = l10["wall_s"] / max(l1["wall_s"], 1e-9)
        assert r < 15.0, f"extract_links wall scaled {r:.1f}x at 10x docs"
        results["links_wall_ratio_10x"] = round(r, 2)
        assert l10["n_blocked"] > 10 * l1["n_blocked"] * 0.9 > 0
        # map-side end-to-end: no shuffle at EITHER scale
        assert l1["shuffle_write_mb"] < 1.0, l1
        assert l10["shuffle_write_mb"] < 1.0, l10
    if what == "training-dataset":
        for m in (1, 10):
            results[f"training_dataset_x{m}"] = measure_training_dataset(m)
        w1 = results["training_dataset_x1"]
        w10 = results["training_dataset_x10"]
        # ~linear wall: 10x docs < 20x wall (measured 22.7 -> 27.4s —
        # fixed per-stage overhead dominates at this size)
        r = w10["wall_s"] / max(w1["wall_s"], 1e-9)
        assert r < 20.0, f"wall scaled {r:.1f}x at 10x docs"
        results["wall_ratio_10x"] = round(r, 2)
        # shuffle: a RATIO vs the 1x base is meaningless here — at 1x
        # the corpus has ~no duplicates and every join side broadcasts
        # under the AQE threshold (measured 0.9 MB total), while the
        # 10x staging plants 9 near-dup copies per doc and the joins go
        # shuffle-mode.  The scale invariant is per-document shuffle
        # bounded by a constant (linear regime): measured ~5.5 KB/doc
        # at 10x (273.6 MB / 50k docs — LSH signatures + verify pairs +
        # token arrays + packing, on a dup-saturated corpus where 90%
        # of docs are planted near-copies); assert < 16 KB/doc.
        per_doc_kb = w10["shuffle_write_mb"] * 1e3 / max(w10["n_docs"], 1)
        assert per_doc_kb < 16.0, f"shuffle {per_doc_kb:.2f} KB/doc at 10x"
        results["shuffle_kb_per_doc_10x"] = round(per_doc_kb, 3)
        # checkpointed state (cluster table + token frame) ~linear too
        if w1.get("checkpoint_mb") and w10.get("checkpoint_mb"):
            ck = w10["checkpoint_mb"] / max(w1["checkpoint_mb"], 1e-9)
            assert ck < 15.0, f"checkpoint bytes scaled {ck:.1f}x"
            results["checkpoint_ratio_10x"] = round(ck, 2)
    print(json.dumps(results, indent=1))
