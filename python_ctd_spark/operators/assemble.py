"""Dataset-assembly operators: domain mixture weighting and context
packing — the last mile of a training-data pipeline, after cleaning and
dedup.

Both are deterministic by construction (hash decisions / ordered
cumsums), so a re-run over 100 TB assembles the identical dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._util import WS_RE
from .sampling import hash_uniform


def domain_mix(
    df: DataFrame,
    targets: dict[str, float],
    key_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Downsample each domain toward a target document count.

    ``targets`` maps domain -> desired doc count; the keep rate is
    ``min(1, target / count(domain))``.  The mixture spec is exhaustive:
    domains absent from ``targets`` are dropped (rate 0), which is the
    contract a curated training mix wants — nothing rides in silently.

    Plan: one tiny per-domain counts aggregate, broadcast back onto the
    corpus, then a map-side md5-keyed Bernoulli decision per row (same
    determinism contract as :mod:`sampling` — retries, repartitioning,
    and the DuckDB oracle all select the identical subset).  The corpus
    itself never shuffles.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    tmap = F.create_map(
        *[x for kv in sorted(targets.items()) for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
    )
    # guard the missing-domain case explicitly: least() IGNORES nulls
    # (least(1.0, NULL) = 1.0 in both Spark and DuckDB), which would
    # silently keep unlisted domains at full rate
    target = tmap[F.col(domain_col)]
    rated = counts.withColumn(
        "__rate",
        F.when(
            target.isNotNull(),
            F.least(F.lit(1.0), target / F.col("__n").cast("double")),
        ),
    ).select(domain_col, "__rate")
    return (
        df.join(F.broadcast(rated), domain_col)
        .filter(hash_uniform(F.col(key_col)) < F.col("__rate"))
        .drop("__rate")
    )


def domain_mix_temperature(
    df: DataFrame,
    total: float,
    alpha: float = 0.7,
    key_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Temperature-based mixture (the multilingual-sampling rule of
    Conneau & Lample 2019 / mT5): sample domain ``d`` with probability
    ``p_d = n_d^alpha / sum(n^alpha)``, scaled to an expected ``total``
    documents — ``alpha < 1`` flattens the distribution toward the tail
    (upweights low-resource domains), ``alpha = 1`` is proportional,
    ``alpha = 0`` uniform across domains.  Unlike :func:`domain_mix`
    this needs no hand-written per-domain targets; the corpus itself
    sets them.

    Keep rate per domain is ``min(1, total * p_d / n_d)`` with the same
    md5-keyed deterministic Bernoulli as :func:`domain_mix`: one tiny
    counts aggregate + windowless normalization, broadcast back, then a
    map-side decision — the corpus never shuffles.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    # sum(n^alpha) over a handful of domain rows: a scalar agg joined
    # back cross-style (1-row broadcast), not a window — no partition of
    # the counts table ever holds more than the domain list
    powed = counts.withColumn("__w", F.pow(F.col("__n").cast("double"), F.lit(alpha)))
    denom = powed.agg(F.sum("__w").alias("__z"))
    rated = (
        powed.crossJoin(F.broadcast(denom))
        .withColumn(
            "__rate",
            F.least(
                F.lit(1.0),
                F.lit(float(total)) * (F.col("__w") / F.col("__z"))
                / F.col("__n").cast("double"),
            ),
        )
        .select(domain_col, "__rate")
    )
    return (
        df.join(F.broadcast(rated), domain_col)
        .filter(hash_uniform(F.col(key_col)) < F.col("__rate"))
        .drop("__rate")
    )


def pack_documents(
    df: DataFrame,
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "source",
    strategy: str = "fixed",
    num_buckets: int | None = None,
    greedy_chunk: int = 1 << 20,
    token_count_col: str | None = None,
) -> DataFrame:
    """Context packing: within each ``by`` stream (ordered by
    ``id_col``), assign every document a ``pack_id`` context window.

    ``strategy="fixed"`` (default) is concat-and-chunk: documents are
    laid end to end and the token stream is cut into ``max_tokens``-sized
    windows; a document belongs to the window its first token lands in.
    ``strategy="greedy"`` is first-fit: a window closes early when the
    next document would overflow it, so documents never straddle windows
    (see :func:`_greedy_pack_ids`).

    Fixed-strategy plan — a **two-level exclusive prefix sum**, never a
    single window partition per domain (which would funnel a dominant
    domain's entire running sum through one task at 100 TB):

    1. project ``(by, id, n_tokens)`` map-side and range-partition on
       ``(by, id)`` — each domain occupies a contiguous, *ordered* run of
       buckets, and every bucket is sized by the shuffle, not the domain;
    2. per-``(bucket, domain)`` token sums aggregate to a tiny table; an
       exclusive cumsum over buckets (per domain) turns them into bucket
       start offsets, broadcast back;
    3. the in-bucket exclusive cumsum runs in a ``(bucket, domain)``
       window whose partitions are bounded by bucket size, and the global
       start is ``bucket_offset + local_prefix``; ``pack_id`` is integer
       division by ``max_tokens``.

    The narrow projection is persisted between steps 2 and 3 so both
    consumers see the *same* sample-derived range boundaries (bucket ids
    must mean the same thing in the partial-sum and join branches; the
    values are boundary-invariant, the bucketing is not).  ``id_col``
    must be unique within a domain — the usual doc-id contract.

    ``token_count_col`` (optional): budget off a precomputed token-count
    column — e.g. real BPE counts from
    :func:`..text.bpe_token_count` — instead of the default whitespace
    count.  At training scale the tokenizer's counts are what the
    context window actually holds, so packing efficiency keys off them.
    """
    n_tok = (
        F.col(token_count_col).cast("bigint")
        if token_count_col is not None
        else F.size(F.split(F.trim(F.col(text_col)), WS_RE)).cast("bigint")
    )
    staged = df.select(
        F.col(by), F.col(id_col), n_tok.alias("n_tokens")
    )
    if strategy == "greedy":
        return _greedy_pack(staged, max_tokens, id_col, by, greedy_chunk)
    if strategy != "fixed":
        raise ValueError(f"unknown packing strategy: {strategy!r}")
    return _stream_offsets(staged, by, id_col, num_buckets).selectExpr(
        by, id_col, "n_tokens", f"__start div {int(max_tokens)} AS pack_id"
    )


def _stream_offsets(
    staged: DataFrame, by: str, id_col: str, num_buckets: int | None = None
) -> DataFrame:
    """Global exclusive token-prefix ``__start`` of every ``(by, id)``
    row within its id-ordered ``by`` stream — the two-level prefix sum
    documented in :func:`pack_documents` (range-partition so no domain
    funnels through one task; per-bucket sums cumsum'd into broadcast
    bucket offsets; bounded in-bucket window adds the local prefix).
    Input is the ``(by, id, n_tokens)`` projection — extra payload
    columns (e.g. the token-id arrays themselves) simply ride the range
    shuffle and come back with ``__start``, which saves the full-data
    join a separate offsets table would force (the aggregate branch
    column-prunes the persisted relation, so the payload never enters
    the bucket sums)."""
    from pyspark import StorageLevel

    spark = staged.sparkSession
    nb = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bucketed = (
        staged.repartitionByRange(nb, F.col(by), F.col(id_col))
        .withColumn("__bkt", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w_off = (
        Window.partitionBy(by)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("__bkt", by)
        .agg(F.sum("n_tokens").alias("__bkt_sum"))
        .withColumn(
            "__off",
            F.coalesce(F.sum("__bkt_sum").over(w_off), F.lit(0).cast("bigint")),
        )
        .select("__bkt", by, "__off")
    )
    w_local = (
        Window.partitionBy("__bkt", by)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0).cast("bigint"))
    return bucketed.join(F.broadcast(offsets), ["__bkt", by]).withColumn(
        "__start", F.col("__off") + local
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str = "token_ids",
    seq_len: int = 2048,
    id_col: str = "doc_id",
    by: str = "source",
    num_buckets: int | None = None,
    keep_partial: bool = False,
) -> DataFrame:
    """Assemble ACTUAL fixed-length training sequences from per-document
    token-id arrays: within each ``by`` stream (ordered by ``id_col``),
    documents' ids are laid end to end and the stream is cut into
    ``seq_len``-token windows — the materialization step
    :func:`pack_documents` only plans (it assigns pack_ids; this emits
    the packed ``token_ids`` rows a trainer reads).  Returns
    ``(by, seq_id, token_ids, n_tokens, n_docs, first_id,
    boundaries)`` where ``boundaries`` lists the 0-based in-sequence
    offsets at which a NEW document starts — exactly what a trainer
    needs to reset attention masks / position ids at document joins (a
    window fully inside one long document has an empty list; offset 0
    appears only when a document begins at the window edge).  The
    final partial window is dropped unless ``keep_partial`` (standard
    practice — a short tail sequence wastes a training slot).

    Scale shape — O(docs) shuffle rows, never a token-level explode:

    1. the narrow ``(by, id, n_tokens)`` projection gets its global
       stream offset from the same two-level prefix sum as
       :func:`pack_documents` (no per-domain funnel task);
    2. each document emits one ARRAY SLICE per sequence window it
       overlaps (``1 + n_tokens/seq_len`` rows, computed map-side with
       ``sequence``/``slice`` — a document's ids never unbundle into
       per-token rows);
    3. one hash shuffle on ``(by, seq_id)`` assembles windows:
       ``array_sort`` of ``(position, slice)`` structs then ``flatten``
       — deterministic regardless of arrival order, partitions bounded
       by ``seq_len`` tokens per window row.

    Empty documents are excluded from the stream (they would emit no
    tokens; excluding them keeps the offset math and the oracle's
    filter identical).  Pair with :func:`..text.bpe_tokenize` for the
    ids and :func:`shard_documents` on the output for the final
    shuffled sharded write."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    L = int(seq_len)
    staged = df.filter(F.size(F.col(tokens_col)) > 0).select(
        F.col(by), F.col(id_col),
        F.size(F.col(tokens_col)).cast("bigint").alias("n_tokens"),
        F.col(tokens_col),
    )
    joined = _stream_offsets(staged, by, id_col, num_buckets).select(
        by, id_col, "n_tokens", tokens_col, "__start"
    )
    first_w = F.expr(f"__start div {L}")
    last_w = F.expr(f"(__start + n_tokens - 1) div {L}")
    exploded = joined.withColumn(
        "seq_id", F.explode(F.sequence(first_w, last_w))
    )
    local0 = F.greatest(F.lit(0).cast("bigint"), F.col("seq_id") * L - F.col("__start"))
    take = (
        F.least(F.col("n_tokens"), (F.col("seq_id") + 1) * L - F.col("__start"))
        - local0
    )
    parts = exploded.select(
        by,
        "seq_id",
        F.col(id_col).alias("__pid"),
        F.struct(
            (F.col("__start") + local0).alias("p"),
            F.slice(
                F.col(tokens_col), (local0 + 1).cast("int"), take.cast("int")
            ).alias("s"),
            # a document STARTS inside this window iff its slice begins
            # at the document's first token; its in-sequence offset is
            # then p mod L — the attention-mask reset point
            F.when(local0 == 0, (F.col("__start") % L).cast("int")).alias("b"),
        ).alias("ps"),
    )
    out = (
        parts.groupBy(by, "seq_id")
        .agg(
            F.sort_array(F.collect_list("ps")).alias("__ps"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("__pid").alias("first_id"),
        )
        .select(
            by,
            "seq_id",
            F.flatten(F.transform(F.col("__ps"), lambda x: x["s"])).alias(
                tokens_col
            ),
            "n_docs",
            "first_id",
            F.filter(
                F.transform(F.col("__ps"), lambda x: x["b"]),
                lambda b: b.isNotNull(),
            ).alias("boundaries"),
        )
        .withColumn("n_tokens", F.size(F.col(tokens_col)))
        .select(
            by, "seq_id", tokens_col, "n_tokens", "n_docs", "first_id",
            "boundaries",
        )
    )
    if not keep_partial:
        out = out.filter(F.col("n_tokens") == L)
    return out


def _greedy_pack(
    staged: DataFrame, max_tokens: int, id_col: str, by: str, chunk: int
) -> DataFrame:
    """First-fit greedy packing within deterministic id-range chunks.

    Exact greedy is a sequential recurrence (each window's fill depends
    on every prior document), so a faithful distributed version scopes
    the recurrence: documents are grouped into chunks of ``chunk``
    consecutive ids per domain (``id div chunk`` — a pure function of the
    row, so the grouping is identical under any input partitioning), each
    chunk is packed greedily by an Arrow-batched grouped kernel, and a
    chunk boundary forces a pack break.  With ``chunk`` spanning the
    whole id range this IS exact greedy; at scale it is the standard
    shard-local greedy used by packing preprocessors, with deterministic
    shards instead of partition-dependent ones.

    ``pack_id = chunk_idx * chunk + local_pack`` — unique and monotone
    per domain because a chunk of ``chunk`` ids can open at most
    ``chunk`` packs.  Requires an integral ``id_col``.
    """
    import pandas as pd

    out_fields = [f for f in staged.schema.fields]
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(out_fields + [StructField("pack_id", LongType(), False)])
    cap = int(max_tokens)
    span = int(chunk)

    def pack_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        chunk_idx = int(pdf["__chunk"].iloc[0])
        fill, local = 0, -1
        packs = []
        for n in pdf["n_tokens"]:
            n = int(n)
            if local < 0 or fill + n > cap:
                local += 1
                fill = n
            else:
                fill += n
            packs.append(chunk_idx * span + local)
        pdf["pack_id"] = packs
        return pdf.drop(columns=["__chunk"])

    chunked = staged.withColumn(
        "__chunk", F.expr(f"CAST(`{id_col}` AS BIGINT) div {span}")
    )
    return (
        chunked.groupBy(by, "__chunk")
        .applyInPandas(pack_group, schema=schema)
        .select(by, id_col, "n_tokens", "pack_id")
    )


def shard_documents(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: str = "",
    rank: bool = True,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the final step
    of a training-data pipeline (mixture -> pack -> **shard**): give
    every document a pseudo-random position that is reproducible across
    runs, retries, partitionings, and engines, then cut the ordering
    into ``n_shards`` output shards.

    The position is :func:`~python_ctd_spark.operators.sampling.hash_uniform`
    of ``seed || '|' || key`` — md5-derived, so Spark and the DuckDB
    oracle compute the identical double from the identical bytes (a
    ``rand()``/``df.sample`` order would differ per partition layout).
    ``shard = floor(u * n_shards)``: shards are equi-probable bins of a
    uniform, so shard sizes concentrate tightly around ``n/n_shards``
    (binomial; ~±3·sqrt(n/n_shards) at 3 sigma) with NO balance pass.

    Scale shape: the assignment itself is a map-side row-local
    projection — zero shuffle, works at any corpus size.  With
    ``rank=True`` a ``shuffle_rank`` (the write order within the shard)
    is added via one window over the shard key: exactly the one
    hash-exchange + per-shard sort a sharded write performs anyway, with
    partitions balanced by the uniformity above.  At 100 TB pick
    ``n_shards`` so a shard fits an output file budget (e.g. 100k shards
    of ~1 GB); skew is impossible by construction, so no salting needed.
    Pair with ``repartition(n_shards, "shard")`` +
    ``sortWithinPartitions("shard", "shard_u")`` to materialize files.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    u = hash_uniform(
        F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string"))
    )
    out = df.withColumn("shard_u", u).withColumn(
        # u < 1.0 strictly (32 hash bits / 2^32), so floor is in range
        "shard", F.floor(F.col("shard_u") * n_shards).cast("int")
    )
    if rank:
        w = Window.partitionBy("shard").orderBy("shard_u", key_col)
        out = out.withColumn("shuffle_rank", F.row_number().over(w))
    return out


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Train/val/test assignment that CANNOT leak near-duplicates across
    splits: the split decision hashes the document's dedup CLUSTER id,
    not its own id, so every member of a near-duplicate cluster lands in
    the same split.  Splitting by row hash — the naive approach — puts
    ~(1 - Σf²) of every duplicate pair on opposite sides of the
    train/test boundary, which is exactly the train-on-test
    contamination an eval is supposed to rule out.

    ``clusters`` is :func:`..dedup.dedup_clusters` output (or any
    ``(doc_id, cluster_id)`` mapping — e.g. a stored table from the
    corpus's dedup pass, reused here for free); documents absent from it
    are their own singleton cluster.  ``fractions`` maps split name ->
    fraction, must sum to 1 (within 1e-9); split boundaries are cut on
    the md5 uniform of ``seed|cluster_id`` in SORTED split-name order,
    so assignment is deterministic across runs, retries, partitionings,
    and engines (the :func:`~..sampling.hash_uniform` contract).

    Returns ``df`` plus ``split``.  Scale shape: one id-keyed join
    against the cluster mapping (broadcast if it is the keeper-set
    sketch, hash join at corpus scale), then a map-side row-local
    decision — the corpus never shuffles for the decision itself.
    Fraction accuracy is binomial over CLUSTERS (the independence
    unit), so at corpus scale splits land within
    ±3·sqrt(n_clusters·f(1-f)) of the target — exact-count splits are
    impossible without breaking the cluster atomicity that is the
    point."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    cl = clusters.select(
        F.col(id_col).alias("__sid"), F.col("cluster_id").alias("__cl")
    )
    u = hash_uniform(
        F.concat(F.lit(f"{seed}|"),
                 F.coalesce(F.col("__cl"), F.col(id_col)).cast("string"))
    )
    expr = None
    acc = 0.0
    names = sorted(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return (
        df.join(cl, df[id_col] == cl["__sid"], "left")
        .withColumn("split", expr)
        .drop("__sid", "__cl")
    )
