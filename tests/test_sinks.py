"""Sink layouts: partition pruning and bucketed no-shuffle joins."""

import pytest
from pyspark.sql import functions as F

from python_ctd_spark.io import sinks


def _scan_metrics(df) -> list[dict]:
    """Executed-plan FileSourceScan metrics (numFiles, numPartitions, ...)
    — run an action on ``df`` first.  Walks through the AQE wrappers."""
    out: list[dict] = []

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


def test_write_casts_partition_pruning(spark, multi_cast, tmp_path):
    path = str(tmp_path / "casts")
    sinks.write_casts(multi_cast, path, partition_by="cast_id")
    back = spark.read.parquet(path)
    assert back.count() == multi_cast.count()
    pruned = back.filter(F.col("cast_id") == "cast_1")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the partition filter must prune at the source, not post-scan
    assert "PartitionFilters: [isnotnull(cast_id" in plan
    assert pruned.count() == multi_cast.filter(F.col("cast_id") == "cast_1").count()
    # END-TO-END pruning (VERDICT r7 item 8): the executed scan's file
    # metrics must show fewer files/partitions READ than the layout
    # holds — the plan-string promise, verified at the runtime metric
    full = back.agg(F.count(F.lit(1)))
    full.collect()
    (m_full,) = _scan_metrics(full)
    q = pruned.agg(F.count(F.lit(1)))
    q.collect()
    (m_pruned,) = _scan_metrics(q)
    assert m_full["numPartitions"] == 3  # three casts in the fixture
    assert m_pruned["numPartitions"] == 1
    assert 0 < m_pruned["numFiles"] < m_full["numFiles"]


def test_bucketed_join_skips_exchange(spark, multi_cast):
    # saveAsTable writes to the session's (static) warehouse dir; the
    # DROP TABLEs below remove the managed data again.
    name_a, name_b = "t_casts_a", "t_casts_b"
    try:
        sinks.write_bucketed(multi_cast, name_a, buckets=4)
        sinks.write_bucketed(
            multi_cast.withColumn("v2", F.col("t090C") * 2.0), name_b, buckets=4
        )
        a, b = sinks.read_table(spark, name_a), sinks.read_table(spark, name_b)
        joined = a.join(
            b.select("cast_id", "scan", "v2"), ["cast_id", "scan"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == multi_cast.count()
        # co-bucketed equi-join: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan
        # grouped agg on the bucket key also rides the bucketing
        agg = a.groupBy("cast_id").agg(F.avg("t090C"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in agg_plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name_a}")
        spark.sql(f"DROP TABLE IF EXISTS {name_b}")


def test_incremental_dedup_probe_against_bucketed_index(spark):
    """The rolling-ingest layout: the LSH band index STORED bucketed by
    (band, bsig) makes every shard probe a one-sided shuffle — the
    index side scans its buckets pre-clustered, only the (much smaller)
    new-shard band rows exchange.  This is the physical contract the
    incremental_dedup docstring promises at 100 TB."""
    import pandas as pd

    from python_ctd_spark.operators.dedup import band_rows, minhash_signatures

    base = "the quick brown fox jumps over the lazy dog near the river today"
    old = spark.createDataFrame(pd.DataFrame(
        [(i, base + f" tail{i}") for i in range(30)], columns=["doc_id", "text"]
    ))
    new = spark.createDataFrame(pd.DataFrame(
        [(100 + i, base + f" tail{i}") for i in range(5)], columns=["doc_id", "text"]
    ))
    try:
        sinks.write_bucketed(
            band_rows(minhash_signatures(old), 8, 2), "t_lsh_index",
            buckets=4, by=["band", "bsig"], sort_by=["band", "bsig"],
        )
        idx = sinks.read_table(spark, "t_lsh_index")
        probe = band_rows(minhash_signatures(new), 8, 2)
        cand = probe.withColumnRenamed("id", "new_id").join(
            idx.withColumnRenamed("id", "old_id"), ["band", "bsig"]
        )
        # at toy size Catalyst rightly broadcasts the probe; the bucketed
        # contract matters on the shuffle path (index >> broadcast
        # threshold at fleet scale), so pin that path explicitly
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = cand._jdf.queryExecution().executedPlan().toString()
            # exactly one exchange — the probe side; the stored index
            # scans its buckets pre-clustered, no exchange above its scan
            import re
            assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
            assert "Bucketed: true" in plan, plan
            assert cand.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lsh_index")


def test_lsh_probe_against_bucketed_ann_index(spark):
    """The ANN serving layout (similarity twin of the dedup test above):
    the LSH signature index STORED bucketed by (tbl, bkt); lsh_probe
    answers queries from it with (a) results identical to the one-shot
    lsh_topk and (b) a plan whose ONLY signature computation is the
    query side — the corpus is never re-hashed per query, its work is
    the bucketed index scan plus the candidate vector fetch."""
    import re

    import pandas as pd

    from python_ctd_spark.operators.similarity import lsh_index, lsh_probe, lsh_topk

    dim, n_planes, n_tables = 8, 6, 2
    rng = __import__("numpy").random.default_rng(11)
    vecs = rng.normal(size=(40, dim)).round(3)
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(40), "embedding": [list(v) for v in vecs]})
    )
    queries = corpus.filter("vec_id < 3")
    kw = dict(k=4, n_planes=n_planes, n_tables=n_tables, dim=dim)
    expected = {
        (r["qid"], r["id"], r["rk"])
        for r in lsh_topk(corpus, queries, **kw).collect()
    }
    try:
        sinks.write_bucketed(
            lsh_index(corpus, n_planes=n_planes, n_tables=n_tables, dim=dim),
            "t_ann_index", buckets=4, by=["tbl", "bkt"], sort_by=["tbl", "bkt"],
        )
        ix = sinks.read_table(spark, "t_ann_index")
        probe = lsh_probe(ix, corpus, queries, **kw)
        got = {(r["qid"], r["id"], r["rk"]) for r in probe.collect()}
        assert got == expected and len(got) > 0
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # AQE prints the Initial Plan section after the final one —
        # assert on the final plan only
        plan = plan.split("== Initial Plan ==")[0]
        # the index side is a bucketed table scan, not a recompute
        assert "FileScan parquet" in plan and "t_ann_index" in plan, plan
        assert "Bucketed: true" in plan, plan
        # every signature computation in the plan belongs to the QUERY
        # side: the only cached signature relations carry qid, and no
        # signature explode produces the corpus id
        for rel_cols in re.findall(r"InMemoryRelation \[(\w+)#", plan):
            assert rel_cols == "qid", plan
        for gen in re.findall(r"Generate explode.*", plan):
            assert "qid#" in gen or "__s_" in gen, gen
            assert not re.search(r"\[id#\d+L?, tbl", gen), gen
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ann_index")


def test_ivf_probe_against_bucketed_index(spark):
    """IVF twin of the LSH test above: assignments stored bucketed by
    cell + centroid table stored; ivf_probe answers queries with results
    identical to the one-shot ivf_topk, and its plan never re-runs the
    corpus-wide assignment argmax (no __farr/__nband staging columns —
    the corpus appears only as the candidate vector fetch)."""
    import pandas as pd

    from python_ctd_spark.operators.similarity import ivf_index, ivf_probe, ivf_topk

    rng = __import__("numpy").random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).round(3)
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(60), "embedding": [list(v) for v in vecs]})
    )
    queries = corpus.filter("vec_id >= 57")
    expected = {
        (r["qid"], r["id"], r["rk"])
        for r in ivf_topk(corpus, queries, k=4, n_centroids=6, n_probe=2).collect()
    }
    try:
        assignments, cent = ivf_index(corpus, n_centroids=6)
        sinks.write_bucketed(
            assignments, "t_ivf_assign", buckets=4, by="cell", sort_by="cell"
        )
        cent.write.mode("overwrite").saveAsTable("t_ivf_cent")
        probe = ivf_probe(
            sinks.read_table(spark, "t_ivf_assign"),
            sinks.read_table(spark, "t_ivf_cent"),
            corpus, queries, k=4, n_probe=2,
        )
        got = {(r["qid"], r["id"], r["rk"]) for r in probe.collect()}
        assert got == expected and len(got) > 0
        plan = probe._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "t_ivf_assign" in plan and "Bucketed: true" in plan, plan
        for marker in ("__farr", "__nband", "__cfast"):
            assert marker not in plan, f"assignment recompute leaked: {marker}"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivf_assign")
        spark.sql("DROP TABLE IF EXISTS t_ivf_cent")


def test_ivf_append_shard_against_stored_centroids(spark):
    """Rolling-ingest IVF lifecycle: a new shard is assigned against the
    STORED centroid table (quantizer fixed), inserted into the stored
    assignments, and probes over the grown index equal a from-scratch
    build over the full corpus.  Also pins the failure the API exists to
    prevent: re-indexing the shard standalone derives a different
    quantizer (seed centroids from the shard), i.e. assignments that
    disagree with the stored basis."""
    import pandas as pd

    from python_ctd_spark.operators.similarity import (
        ivf_append, ivf_index, ivf_probe, ivf_topk,
    )

    rng = __import__("numpy").random.default_rng(13)
    vecs = rng.normal(size=(50, 8)).round(3)
    full = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(50), "embedding": [list(v) for v in vecs]})
    )
    base = full.filter("vec_id < 30")    # holds the seed-centroid ids
    shard = full.filter("vec_id >= 30")
    queries = full.filter("vec_id >= 47")
    try:
        assignments, cent = ivf_index(base, n_centroids=5)
        sinks.write_bucketed(
            assignments, "t_ivf_grow", buckets=4, by="cell", sort_by="cell"
        )
        cent.write.mode("overwrite").saveAsTable("t_ivf_grow_cent")
        stored_cent = sinks.read_table(spark, "t_ivf_grow_cent")

        # append = assign against STORED centroids, insert
        ivf_append(shard, stored_cent).write.insertInto("t_ivf_grow")

        grown = sinks.read_table(spark, "t_ivf_grow")
        # grown assignments == from-scratch build over the full corpus
        # (same seed ids live in base, so the quantizer is identical)
        fresh, _ = ivf_index(full, n_centroids=5)
        assert {(r["id"], r["cell"]) for r in grown.collect()} == {
            (r["id"], r["cell"]) for r in fresh.collect()
        }
        # probe over the grown index == one-shot over the full corpus
        got = {
            (r["qid"], r["id"], r["rk"])
            for r in ivf_probe(
                grown, stored_cent, full, queries, k=4, n_probe=2
            ).collect()
        }
        expected = {
            (r["qid"], r["id"], r["rk"])
            for r in ivf_topk(full, queries, k=4, n_centroids=5, n_probe=2).collect()
        }
        assert got == expected and len(got) > 0
        # shard members are reachable as results (the index really grew)
        assert any(i >= 30 for _, i, _ in got)

        # the anti-pattern: indexing the shard standalone re-derives the
        # quantizer from the shard -> disagreeing assignments
        wrong, _ = ivf_index(shard, n_centroids=5)
        wrong_cells = {(r["id"], r["cell"]) for r in wrong.collect()}
        right_cells = {
            (r["id"], r["cell"])
            for r in ivf_append(shard, stored_cent).collect()
        }
        assert wrong_cells != right_cells

        import pytest as _pytest

        with _pytest.raises(ValueError, match="empty centroid table"):
            ivf_append(shard, stored_cent.filter("cid < 0"))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivf_grow")
        spark.sql("DROP TABLE IF EXISTS t_ivf_grow_cent")


def test_lsh_index_append_is_stateless_union(spark):
    """The LSH append contract lsh_index's docstring promises: the
    hyperplane basis is a pure function of (n_planes, n_tables, dim),
    so indexing shards independently and unioning the rows IS the index
    of the union — appends are plain inserts, no basis state, and a
    probe over the shard-built index equals one over the whole-corpus
    build."""
    import pandas as pd

    from python_ctd_spark.operators.similarity import lsh_index, lsh_probe

    rng = __import__("numpy").random.default_rng(5)
    vecs = rng.normal(size=(40, 8)).round(3)
    full = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(40), "embedding": [list(v) for v in vecs]})
    )
    kw = dict(n_planes=4, n_tables=2, dim=8)
    whole = {
        (r["id"], r["tbl"], r["bkt"])
        for r in lsh_index(full, **kw).collect()
    }
    sharded = {
        (r["id"], r["tbl"], r["bkt"])
        for lo, hi in ((0, 15), (15, 40))
        for r in lsh_index(
            full.filter(f"vec_id >= {lo} AND vec_id < {hi}"), **kw
        ).collect()
    }
    assert sharded == whole and len(whole) == 40 * 2

    queries = full.filter("vec_id < 3")
    ix_union = lsh_index(full.filter("vec_id < 15"), **kw).unionByName(
        lsh_index(full.filter("vec_id >= 15"), **kw)
    )
    got = {
        (r["qid"], r["id"], r["rk"])
        for r in lsh_probe(ix_union, full, queries, k=3, **kw).collect()
    }
    expected = {
        (r["qid"], r["id"], r["rk"])
        for r in lsh_probe(lsh_index(full, **kw), full, queries, k=3, **kw).collect()
    }
    assert got == expected and len(got) > 0


def test_ivf_sq_probe_against_stored_artifacts(spark):
    """IVF,SQ8 serving lifecycle: assignments bucketed by cell +
    centroid table + int8 code table all stored once; ivf_sq_probe
    answers queries from them with (a) top-k identical to the stored
    ivf_probe (exact re-rank means the composition loses bytes, not
    answers, when the margin covers the cell candidates) and (b) a plan
    that reads codes from the stored table — no corpus-wide quantization
    or assignment recompute (the raw corpus appears only as the bounded
    margin*k re-rank fetch)."""
    import pandas as pd

    from python_ctd_spark.operators.similarity import (
        ivf_index, ivf_probe, ivf_sq_probe, quantize_vectors,
    )

    rng = __import__("numpy").random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).round(3)
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(60), "embedding": [list(v) for v in vecs]})
    )
    queries = corpus.filter("vec_id >= 57")
    try:
        assignments, cent = ivf_index(corpus, n_centroids=6)
        sinks.write_bucketed(
            assignments, "t_sq_assign", buckets=4, by="cell", sort_by="cell"
        )
        cent.write.mode("overwrite").saveAsTable("t_sq_cent")
        quantize_vectors(corpus).write.mode("overwrite").saveAsTable("t_sq_codes")
        st_assign = sinks.read_table(spark, "t_sq_assign")
        st_cent = sinks.read_table(spark, "t_sq_cent")
        st_codes = sinks.read_table(spark, "t_sq_codes")
        exact_ivf = {
            (r["qid"], r["id"], r["rk"])
            for r in ivf_probe(
                st_assign, st_cent, corpus, queries, k=4, n_probe=2
            ).collect()
        }
        probe = ivf_sq_probe(
            st_assign, st_cent, st_codes, corpus, queries,
            k=4, n_probe=2, margin=8,
        )
        got = {(r["qid"], r["id"], r["rk"]) for r in probe.collect()}
        assert got == exact_ivf and len(got) > 0
        plan = probe._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "t_sq_codes" in plan and "t_sq_assign" in plan, plan
        for marker in ("__farr", "__nband", "__cfast", "__amax"):
            assert marker not in plan, f"corpus-wide recompute leaked: {marker}"
    finally:
        for t in ("t_sq_assign", "t_sq_cent", "t_sq_codes"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_write_training_shards_layout_manifest_and_integrity(spark, tmp_path):
    """The training-tail SINK: one parquet file per shard directory
    (dataloaders open shard=i/ with no index), within-shard rows in
    shuffle (shard_u) order, a manifest whose per-shard counts/tokens/
    checksums match an independent recompute, read-back == source
    content, and a shard=N read prunes to that one directory."""
    import json

    from python_ctd_spark.operators.assemble import pack_sequences
    from python_ctd_spark.operators.sampling import hash_uniform

    ids = spark.range(300).selectExpr(
        "concat('s', id % 3) AS source",
        "id AS doc_id",
        "transform(sequence(1, 40 + CAST(id % 50 AS INT)),"
        " i -> CAST((id * 7 + i) % 999 AS INT)) AS token_ids",
    )
    seqs = pack_sequences(ids, seq_len=64).withColumn(
        "seq_key", F.concat_ws("|", "source", "seq_id")
    )
    n_src = seqs.count()
    path = str(tmp_path / "shards")
    manifest = sinks.write_training_shards(seqs, path, 4, seed="e0")

    # layout: one file per shard dir
    import glob
    import os

    for shard_dir in sorted(glob.glob(os.path.join(path, "shard=*"))):
        files = [f for f in os.listdir(shard_dir) if f.endswith(".parquet")]
        assert len(files) == 1, (shard_dir, files)
    assert len(glob.glob(os.path.join(path, "shard=*"))) <= 4

    # manifest == file copy == recompute
    on_disk = json.load(open(os.path.join(path, "_manifest.json")))
    assert on_disk == json.loads(json.dumps(manifest))
    assert manifest["total_rows"] == n_src
    back = spark.read.parquet(path)
    assert back.count() == n_src
    recount = {
        int(r["shard"]): (int(r["n"]), int(r["t"]))
        for r in back.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("token_ids")).alias("t"),
        ).collect()
    }
    for s, (n, t) in recount.items():
        assert manifest["shards"][str(s)]["n_rows"] == n
        assert manifest["shards"][str(s)]["n_tokens"] == t

    # within-shard file order == shard_u (shuffle) order
    for shard_dir in glob.glob(os.path.join(path, "shard=*")):
        pdf = (
            spark.read.parquet(shard_dir)
            .withColumn(
                "u", hash_uniform(F.concat(F.lit("e0|"), F.col("seq_key")))
            )
            .toPandas()
        )
        assert (pdf["u"].values == sorted(pdf["u"].values)).all()

    # shard=2 read prunes to one directory's file
    one = back.filter(F.col("shard") == 2).agg(F.count(F.lit(1)))
    one.collect()
    (m_one,) = _scan_metrics(one)
    assert m_one["numPartitions"] == 1 and m_one["numFiles"] == 1, m_one


def test_write_training_shards_all_empty_token_arrays(spark, tmp_path):
    """ADVICE r9: sequence(1, 0) is [1, 0] in Spark, so an unguarded
    zip_with checksum over an EMPTY token_ids array is NULL — a shard
    whose every row is empty then sums to NULL and the manifest
    aggregation crashes on int(None).  Empty rows must contribute an
    explicit checksum of 0 and still be counted."""
    import json
    import os

    seqs = spark.range(8).selectExpr(
        "CAST(id AS STRING) AS seq_key",
        "CAST(array() AS ARRAY<INT>) AS token_ids",
    )
    path = str(tmp_path / "empty_shards")
    manifest = sinks.write_training_shards(seqs, path, 2, seed="e1")
    assert manifest["total_rows"] == 8
    for s in manifest["shards"].values():
        assert s["n_tokens"] == 0
        assert s["checksum"] == 0
    on_disk = json.load(open(os.path.join(path, "_manifest.json")))
    assert on_disk == json.loads(json.dumps(manifest))


def test_write_training_shards_null_token_arrays(spark, tmp_path):
    """Code-review r10: the NULL twin of the empty-array case — a shard
    whose rows carry token_ids = NULL must manifest as 0 tokens and
    checksum 0, not crash on int(None)."""
    import json
    import os

    seqs = spark.range(6).selectExpr(
        "CAST(id AS STRING) AS seq_key",
        "CAST(NULL AS ARRAY<INT>) AS token_ids",
    )
    path = str(tmp_path / "null_shards")
    manifest = sinks.write_training_shards(seqs, path, 2, seed="n1")
    assert manifest["total_rows"] == 6
    for s in manifest["shards"].values():
        assert s["n_tokens"] == 0 and s["checksum"] == 0
    on_disk = json.load(open(os.path.join(path, "_manifest.json")))
    assert on_disk == json.loads(json.dumps(manifest))
