"""Similarity search over embedding columns (array<float>).

Two tiers:

- **cosine_topk** — brute-force exact top-k: broadcast the (small) query
  set against the corpus; dot products as JVM higher-order functions
  (``zip_with`` + ``aggregate``), decimal-exact so rankings are
  bit-reproducible.  O(|queries| * |corpus|) — the baseline, and the
  right tool when the query set is small.
- **lsh_topk** — random-hyperplane LSH: deterministic pseudo-random
  planes (md5-seeded signs), signature prefix buckets, candidates =
  corpus rows sharing a bucket with the query, exact re-rank inside the
  bucket.  Sub-linear candidate sets at fleet scale; recall controlled
  by (n_planes, n_tables).

Norms are precomputed once per row (not per pair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _arr_lit(vals, typ: str = "DOUBLE") -> str:
    """A literal array as ONE parser token:
    ``CAST(split('v1,v2,...', ',') AS ARRAY<typ>)``.

    Catalyst constant-folds the whole expression to the identical
    ``Literal`` array the inline ``array(v1, v2, ...)`` form produced
    (verified on the optimized plan), so runtime per-row cost is
    byte-identical — but the parser sees one string token instead of
    ``len(vals)`` literal nodes, which cuts plan-construction time of
    the codebook/centroid-laden ANN probes ~5-8x (guide §7.3: planning
    time is driver-side, serial, and INSIDE every query's wall).  The
    string round-trip is exact: ``repr(float)`` is shortest-round-trip
    and both the SQL literal and the ANSI string cast parse through
    Java ``Double.parseDouble``.  Non-finite doubles (no registered
    corpus produces them) fall back to the inline form, whose ``'NaN'``
    / ``'Infinity'`` literal spellings Spark accepts."""
    import math

    if typ == "DOUBLE":
        xs = [float(x) for x in vals]
        if not all(math.isfinite(x) for x in xs):
            return "array(" + ", ".join(f"{x!r}D" for x in xs) + ")"
        body = ",".join(repr(x) for x in xs)
    elif typ == "BIGINT":
        body = ",".join(str(int(x)) for x in vals)
    else:  # DECIMAL(p,s) strings — already exact decimal text
        body = ",".join(str(v) for v in vals)
    return f"CAST(split('{body}', ',') AS ARRAY<{typ}>)"


# The array-fold kernels below are spelled as SQL TEXT and parsed with
# ONE F.expr() call each (the lambda-construction twin of _arr_lit):
# building the same fold through F.zip_with/F.aggregate Python lambdas
# costs a dozen-plus py4j round-trips per higher-order function — ~186ms
# per composed cosine on a loaded host vs ~35ms for the one-shot parse
# (measured, 20-rep micro-bench; the optimized plans are identical
# modulo lambda-variable names, values byte-identical).  Construction
# is inside every query's wall (guide §7.3), and the ANN family builds
# these kernels dozens of times per probe row.  Callers pass SQL
# fragments (column names); the composed helpers return Columns.

_DOT_EXACT_SQL = (
    "CAST(aggregate(zip_with({a}, {b}, (x, y) -> CAST(x * y AS DECIMAL(30,15))), "
    "CAST(0 AS DECIMAL(38,15)), (acc, x) -> CAST(acc + x AS DECIMAL(38,15))) "
    "AS DOUBLE)"
)
_NORM_EXACT_SQL = (
    "SQRT(CAST(aggregate(transform({a}, x -> CAST(x * x AS DECIMAL(30,15))), "
    "CAST(0 AS DECIMAL(38,15)), (acc, x) -> CAST(acc + x AS DECIMAL(38,15))) "
    "AS DOUBLE))"
)
_DOT_FAST_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
)
_NORM_FAST_SQL = (
    "SQRT(aggregate(transform({a}, x -> x * x), 0.0D, (acc, x) -> acc + x))"
)


def _dot_exact(a: str, b: str) -> Column:
    return F.expr(_DOT_EXACT_SQL.format(a=a, b=b))


def _norm_exact(a: str) -> Column:
    return F.expr(_NORM_EXACT_SQL.format(a=a))


def _cos_exact(a: str, b: str) -> Column:
    """Decimal-exact cosine as one parsed expression."""
    return F.expr(
        f"({_DOT_EXACT_SQL.format(a=a, b=b)}) / "
        f"(({_NORM_EXACT_SQL.format(a=a)}) * ({_NORM_EXACT_SQL.format(a=b)}))"
    )


def _as_double(col: str) -> Column:
    # Every call site passes a bare column NAME (the user-facing
    # ``vec_col`` or an internal alias) — backtick-quote it so names
    # that are not plain SQL identifiers (spaces, hyphens, reserved
    # words) keep working as they did under F.col (ADVICE r14).
    quoted = "`" + col.replace("`", "``") + "`"
    return F.expr(f"transform({quoted}, x -> CAST(x AS DOUBLE))")


def _dot_fast(a: str, b: str) -> Column:
    return F.expr(_DOT_FAST_SQL.format(a=a, b=b))


def _norm_fast(a: str) -> Column:
    return F.expr(_NORM_FAST_SQL.format(a=a))


def _cos_fast(a: str, b: str) -> Column:
    """Double-precision cosine as one parsed expression."""
    return F.expr(
        f"({_DOT_FAST_SQL.format(a=a, b=b)}) / "
        f"(({_NORM_FAST_SQL.format(a=a)}) * ({_NORM_FAST_SQL.format(a=b)}))"
    )


# Margin between the double-fold prefilter score and the decimal-exact
# score.  Both fold the same 64-element products left-to-right; the double
# path accumulates at most ~1e-13 relative error on unit-ish vectors, so
# any candidate whose exact cosine could reach the exact kth score sits
# within this band of the double kth score.
_RERANK_EPS = 1e-9


def _rerank_topk(
    scored: DataFrame, k: int, part: str = "qid", ident: str = "id"
) -> DataFrame:
    """Exact top-k from fast scores: keep every row whose double-precision
    cosine is within ``_RERANK_EPS`` of the per-partition kth fast score,
    then let the decimal-exact cosine (computed by the caller on this
    surviving sliver only) decide the final ranking.  Two window
    functions, one sort — the decimal arithmetic never touches the full
    candidate set."""
    w_ord = Window.partitionBy(part).orderBy(F.col("fcos").desc(), F.col(ident))
    w_all = Window.partitionBy(part)
    rn = F.row_number().over(w_ord)
    kth = F.max(F.when(rn == k, F.col("fcos"))).over(w_all)
    return scored.withColumn("__kth", kth).filter(
        F.col("__kth").isNull() | (F.col("fcos") >= F.col("__kth") - _RERANK_EPS)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors of each query vector.

    Returns (qid, id, cos, rk).  The query side is broadcast — at 100 TB
    the corpus never shuffles; each task scores its partition against the
    in-memory query block (classic block nested-loop with a broadcast
    build side, which is exactly what a brute-force ANN baseline should
    compile to).
    """
    qid = query_id_col or id_col
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    c = c.withColumn("fnorm", _norm_fast("e"))
    q = queries.select(F.col(qid).alias("qid"), _as_double(vec_col).alias("qe"))
    q = q.withColumn("fqnorm", _norm_fast("qe"))
    pairs = c.join(F.broadcast(q), F.col("id") != F.col("qid"))
    # phase 1: double-precision scores over every pair (JVM fold, cheap);
    # phase 2: decimal-exact cosine on the ~k survivors per query only —
    # the decimal fold is ~100x the double fold, so it must not see the
    # full |corpus| x |queries| cross product.
    fcos = _dot_fast("qe", "e") / (F.col("fqnorm") * F.col("fnorm"))
    scored = pairs.select("qid", "id", "qe", "e", fcos.alias("fcos"))
    survivors = _rerank_topk(scored, k)
    cos = _cos_exact("qe", "e")
    rescored = survivors.select("qid", "id", cos.alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "id", F.round("cos", 6).alias("cos"), F.col("rk").cast("int").alias("rk"))
    )


def quantize_vectors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric scalar quantization -> ``(id, qv, qscale,
    qnorm)`` with ``qv`` an ``array<tinyint>``.

    The 100 TB lever: the embedding column dominates corpus bytes, and
    int8 codes cut it 4x vs float32 (8x vs double) — smaller parquet
    scans, smaller shuffles, more of the index resident per executor.
    Quantization is per-row arithmetic (``qscale = max|x| / 127``,
    ``q_i = floor(x_i/qscale + 0.5)``) — map-side only, no shuffle, and
    the explicit half-up floor formula is engine-portable (Spark and
    DuckDB round() disagree on .5 ties; floor(x+0.5) does not).
    ``qnorm = sum(q_i^2)`` (exact BIGINT) is precomputed once per row so
    probes never rescan the codes for norms.
    """
    if bits != 8:
        raise ValueError("only 8-bit symmetric quantization is implemented")
    qmax = float(2 ** (bits - 1) - 1)
    base = (
        df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
        .withColumn("__amax", F.expr("array_max(transform(e, x -> abs(x)))"))
        .withColumn(
            "qscale",
            F.when(F.col("__amax") > 0.0, F.col("__amax") / qmax).otherwise(
                F.lit(1.0)
            ),
        )
    )
    qv = F.expr(
        "transform(e, x -> CAST(FLOOR((x / qscale) + 0.5) AS TINYINT))"
    )
    qnorm = F.expr(
        "aggregate(transform(qv, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return base.select("id", qv.alias("qv"), "qscale").withColumn("qnorm", qnorm)


def _sq8_cos() -> Column:
    """Quantized cosine from code columns ``qv``/``qnorm`` (corpus side)
    and ``qu``/``qunorm`` (query side): BIGINT-exact dot — the candidate
    cut this drives is bit-identical in any engine at any parallelism —
    over the exact integer norm product."""
    dot_int = F.expr(
        "aggregate(zip_with(qv, qu, (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return dot_int.cast("double") / F.sqrt(
        (F.col("qnorm") * F.col("qunorm")).cast("double")
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    margin: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors via int8-quantized candidate scoring +
    exact re-rank.  Returns ``(qid, id, qcos, cos, rk)``.

    Phase 1 scores every pair with PURE INTEGER arithmetic — ``dot_int =
    sum(qv_i * qu_i)`` (BIGINT-exact, order-independent, so the
    candidate cut is bit-identical in any engine and at any parallelism)
    — and keeps the ``margin * k`` best per query by
    ``dot_int / sqrt(qnorm_v * qnorm_q)``.  Phase 2 re-ranks only that
    sliver with the decimal-exact cosine on the original vectors.

    At 100 TB: store :func:`quantize_vectors` output once and the
    candidate scan reads only the int8 codes — measured 3.7-4.9x fewer
    parquet bytes than the raw vectors (tools/bench_scale.py probe-sq8)
    — the query side broadcasts, the corpus never shuffles, and the
    exact re-rank joins back to the raw vectors for
    ``margin*k*|queries|`` rows only.  This convenience form quantizes
    in-plan (so it still scans the raw column; the byte win needs the
    stored-codes serving shape), and the scan stays LINEAR in the
    corpus either way — the sub-linear dials are the LSH/IVF candidate
    cuts this composes with (quantize inside buckets to shrink the
    candidate fetch).
    """
    qid_col = query_id_col or id_col
    c = quantize_vectors(corpus, id_col, vec_col)
    q = quantize_vectors(queries, qid_col, vec_col).select(
        F.col("id").alias("qid"),
        F.col("qv").alias("qu"),
        F.col("qnorm").alias("qunorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("id") != F.col("qid"))
        .select("qid", "id", _sq8_cos().alias("qcos"))
    )
    w_q = Window.partitionBy("qid").orderBy(F.col("qcos").desc(), F.col("id"))
    cands = scored.withColumn("__rkq", F.row_number().over(w_q)).filter(
        F.col("__rkq") <= margin * k
    )
    # exact re-rank on the raw vectors, candidates only
    cv = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    qv_raw = queries.select(
        F.col(qid_col).alias("qid"), _as_double(vec_col).alias("qe")
    )
    cos = _cos_exact("qe", "e")
    rescored = (
        cands.join(cv, "id")
        .join(F.broadcast(qv_raw), "qid")
        .select("qid", "id", "qcos", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "qid",
            "id",
            F.round("qcos", 6).alias("qcos"),
            F.round("cos", 6).alias("cos"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def _plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 from md5(plane:dim) parity — a fixed pseudo-random
    hyperplane basis shared by every executor without broadcast state."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).digest()
    return 1 if h[0] % 2 == 0 else -1


def _plane_sum_sql(vec_sql: str, plane: int, dim: int) -> str:
    """Signed coordinate sum <v, plane> for one Rademacher plane, as a
    left-associated chain of adds/subtracts **built as a SQL string**.
    ``x + v*1.0`` ≡ ``x + v`` and ``x + v*-1.0`` ≡ ``x - v`` bit-for-bit
    in IEEE-754, so the chain is the same float sequence as the oracle
    SQL's literal-coefficient form at half the expression nodes.

    A string, not a Column: composing ``n_tables*n_planes*dim`` Column
    objects is 5-8k py4j round trips (~8s of driver time per signature
    table on local mode); one ``selectExpr`` parse is milliseconds."""
    parts = ["0.0"]
    for d in range(dim):
        op = "+" if _plane_sign(plane, d) > 0 else "-"
        parts.append(f"{op} {vec_sql}[{d}]")
    return " ".join(parts)


def signature_table(
    df: DataFrame,
    keep: list[str],
    vec_col: str,
    n_planes: int,
    n_tables: int,
    dim: int,
    persist: bool = True,
) -> DataFrame:
    """(keep..., tbl, bkt): one row per input row per LSH hash table.

    Physical shape matters more than arithmetic here:

    - The ``n_tables * n_planes`` signed sums are **flat top-level
      projection columns**, one expression each (~2*dim nodes).  Inlining
      them into the explode's array-of-structs builds a single
      1000+-node generator expression that blows the 64 KB codegen
      method limit — whole-stage codegen bails (interpreted eval) and
      every Catalyst/AQE pass re-walks the monster tree (measured: the
      sf0.1 LSH queries spent ~20s in driver-side planning on 2000
      rows).  Flat columns codegen-split per expression.
    - The bucket bits are combined **above** the projection and fed to
      ``explode`` as bound-attribute structs; the intervening Generate
      node keeps CollapseProject from re-inlining the sums.
    - The result is **persisted** (it is tiny: keys + two ints per row
      per table) so self-joins and AQE replans reference an
      InMemoryRelation instead of re-deriving the signature plan.
    """
    sums = [
        f"({_plane_sum_sql(f'`{vec_col}`', t * 1000 + p, dim)}) AS __s_{t}_{p}"
        for t in range(n_tables)
        for p in range(n_planes)
    ]
    flat = df.selectExpr(*[f"`{c}`" for c in keep], *sums)
    buckets = []
    for t in range(n_tables):
        bkt = " + ".join(
            f"(CAST(__s_{t}_{p} >= 0.0 AS INT) * {1 << p})" for p in range(n_planes)
        )
        buckets.append(f"named_struct('tbl', {t}, 'bkt', {bkt})")
    keep_exprs = [f"`{c}`" for c in keep]
    out = flat.selectExpr(
        *keep_exprs, f"explode(array({', '.join(buckets)})) AS __b"
    ).selectExpr(*keep_exprs, "__b.tbl AS tbl", "__b.bkt AS bkt")
    return out.persist() if persist else out


def probe_masks(n_planes: int, n_probe_bits: int) -> list[int]:
    """XOR masks for multiprobe LSH: the exact bucket plus every bucket
    within Hamming distance ``n_probe_bits`` of it (Lv et al. 2007,
    "Multi-Probe LSH").  Deterministic and tiny, shared with the SQL
    oracle builders."""
    import itertools

    masks = [0]
    for r in range(1, n_probe_bits + 1):
        for combo in itertools.combinations(range(n_planes), r):
            masks.append(sum(1 << p for p in combo))
    return masks


def _exact_rerank_pairs(
    cand: DataFrame, c: DataFrame, q: DataFrame, k: int
) -> DataFrame:
    """Shared exact-re-rank tail of every candidate-generating ANN path:
    ``cand`` is distinct (qid, id) pairs, ``c`` is (id, e, fnorm),
    ``q`` is (qid, qe, fqnorm).  Two-phase exactly as
    :func:`cosine_topk`: double fold scores all candidates, decimal
    decides only the per-query top-k sliver."""
    verified = cand.join(c, "id").join(F.broadcast(q), "qid")
    fcos = _dot_fast("qe", "e") / (F.col("fqnorm") * F.col("fnorm"))
    scored = verified.select("qid", "id", "qe", "e", fcos.alias("fcos"))
    survivors = _rerank_topk(scored, k)
    cos = _cos_exact("qe", "e")
    rescored = survivors.select("qid", "id", cos.alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "id", F.round("cos", 6).alias("cos"), F.col("rk").cast("int").alias("rk"))
    )


def lsh_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int = 64,
    persist: bool = False,
) -> DataFrame:
    """The STORABLE LSH index: ``(id, tbl, bkt)`` — one row per corpus
    vector per hash table.  This is the similarity twin of dedup's
    ``minhash_signatures`` stored-index path: write it once with
    ``io.sinks.write_bucketed(index, table, by=["tbl", "bkt"])`` and
    every later :func:`lsh_probe` answers queries from the stored
    buckets without re-hashing the corpus — the realistic serving shape,
    where the corpus is 100 TB and queries arrive forever.  The index is
    O(rows x n_tables) two-int rows; appends for new corpus shards are
    plain inserts (the hyperplane basis is deterministic,
    :func:`_plane_sign`, so no basis state needs storing)."""
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    return signature_table(c, ["id"], "e", n_planes, n_tables, dim, persist=persist)


def lsh_probe(
    index: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int = 64,
    n_probe_bits: int = 0,
) -> DataFrame:
    """Approximate cosine top-k answered from a STORED index: only the
    query side is hashed (|queries| rows — mapper work); candidates come
    from the (tbl, bkt) equi-join against ``index`` and their vectors
    are fetched from ``corpus`` by id for the exact re-rank.  The
    corpus-wide signature computation never reruns — when ``index`` is a
    bucketed table scan, the probe plan's only corpus-side work is that
    scan plus the candidate vector fetch (plan pinned in
    tests/test_sinks.py).

    ``(n_planes, n_tables, dim)`` MUST match the values the index was
    built with — the deterministic hyperplane basis is derived from
    them, so a mismatch probes foreign buckets and silently loses
    recall (same contract as dedup.incremental_dedup's index_banded).

    ``n_probe_bits > 0`` enables multiprobe (Lv et al. 2007): each query
    additionally probes every bucket within that Hamming distance of its
    own — query-side fan-out only; the stored index is untouched, which
    is the point: recall rises without rebuilding or widening the index.
    """
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    c = c.withColumn("fnorm", _norm_fast("e"))
    q = queries.select(F.col(id_col).alias("qid"), _as_double(vec_col).alias("qe"))
    q = q.withColumn("fqnorm", _norm_fast("qe"))

    qb = signature_table(q, ["qid"], "qe", n_planes, n_tables, dim)
    if n_probe_bits > 0:
        probes = F.array(
            *[
                F.col("bkt").bitwiseXOR(F.lit(m))
                for m in probe_masks(n_planes, n_probe_bits)
            ]
        )
        qb = qb.select("qid", "tbl", F.explode(probes).alias("bkt"))
    # bare id pairs through the dedup, vectors re-attached after (the
    # query side is small -> broadcast on both the bucket join and fetch)
    cand = (
        index.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id")
        .dropDuplicates(["qid", "id"])
    )
    return _exact_rerank_pairs(cand, c, q, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int = 64,
    n_probe_bits: int = 0,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket with the
    query in at least one hash table; exact cosine re-rank within the
    candidate set.  Shuffles only on (table, bucket) keys.

    One-shot form: derives the corpus index in-plan (persisted for the
    self-join) and probes it — exactly :func:`lsh_probe` over
    :func:`lsh_index`; repeated-query workloads should build the index
    once with :func:`lsh_index` + ``write_bucketed`` instead."""
    ix = lsh_index(
        corpus, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables, dim=dim, persist=True,
    )
    return lsh_probe(
        ix, corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_tables=n_tables, dim=dim,
        n_probe_bits=n_probe_bits,
    )


def _kmeans_centroids(
    c: DataFrame,
    seed_vecs: list[list[float]],
    dim: int,
    iters: int = 4,
    sample: float | None = None,
    exact: bool = False,
    cids: list[int] | None = None,
) -> list[list[float]]:
    """Spherical-ish Lloyd iterations as DataFrame aggregates.

    Assignment reuses the same literal-coefficient fold array as the IVF
    cell assignment (map-side argmax over cosine scores, corpus never
    shuffles); the update step is one ``groupBy(cell)`` over ``dim``
    column sums — partial aggregation makes the shuffled payload
    ``n_centroids x dim`` doubles, and the new centroids come back as a
    tiny collect (centroids are driver state in any IVF index).  Init is
    the deterministic seed set, so runs differ only by float-sum
    partition order (sub-ulp).  ``sample`` trains on a deterministic
    md5-keyed subset — the standard move when the corpus is 100 TB but
    the quantizer needs only a sketch of the distribution.
    """
    import math

    from .sampling import hash_uniform

    train = c if sample is None else c.filter(hash_uniform(F.col("id")) < sample)
    cvecs = [list(v) for v in seed_vecs]
    if exact:
        # ORACLE-EXACT Lloyd (VERDICT r7 item 4): every step is
        # order-independent and engine-portable, so an independent SQL
        # engine recomputes bit-identical centroids from the parquet:
        # - assignment runs the full :func:`_assign_cells` machinery
        #   (double argmax + decimal settle inside the epsilon band);
        # - the update step's new centroid is the vector of BIGINT sums
        #   ``sum(floor(x_i * 1e6 + 0.5))`` over the cell's members —
        #   integer-quantized coordinates summed exactly (no float-sum
        #   partition-order drift, no decimal->double cast, which
        #   DuckDB truncates rather than rounds), cast to double and
        #   divided by 2^30 — an EXACT binary scaling (mantissa
        #   untouched, identical in every IEEE engine) that keeps the
        #   scoring folds' decimal(30,15) casts from overflowing on
        #   norm products.  The ~1e-6 coordinate quantization is
        #   irrelevant to clustering, and cosine is scale-invariant so
        #   the un-normalized scaled sum is as good a centroid
        #   DIRECTION as the mean.
        if cids is None:
            raise ValueError("exact mode needs the seed cid list")
        for _ in range(int(iters)):
            assigned = _assign_cells(train, cids, cvecs)
            qsum = [
                F.sum(
                    F.floor(F.col("e")[i] * 1000000.0 + F.lit(0.5)).cast("bigint")
                ).alias(f"s{i}")
                for i in range(dim)
            ]
            stats = assigned.groupBy("cell").agg(*qsum).collect()
            by_cid = {int(r["cell"]): r for r in stats}
            for idx, cid in enumerate(cids):
                r = by_cid.get(cid)
                if r is not None:  # empty cells keep their centroid
                    cvecs[idx] = [
                        float(r[f"s{i}"]) / 1073741824.0 for i in range(dim)
                    ]
        return cvecs
    enorm_sql = "sqrt(aggregate(transform(e, x -> x * x), 0.0D, (acc, x) -> acc + x))"
    for _ in range(int(iters)):
        cnorms = [math.sqrt(sum(x * x for x in v)) or 1.0 for v in cvecs]
        dots = ", ".join(
            f"aggregate(zip_with(e, {_arr_lit(cv)}, "
            "(x, c) -> x * c), 0.0D, (acc, x) -> acc + x)"
            f" / (__enorm * {cn!r}D)"
            for cv, cn in zip(cvecs, cnorms)
        )
        assigned = (
            train.selectExpr("e", f"{enorm_sql} AS __enorm")
            .selectExpr("e", f"array({dots}) AS __farr")
            .selectExpr(
                "e",
                "CAST(array_position(__farr, array_max(__farr)) AS INT) AS __cell",
            )
        )
        stats = (
            assigned.groupBy("__cell")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[F.sum(F.col("e")[i]).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        for r in stats:
            idx = int(r["__cell"]) - 1
            n = float(r["__n"])
            cvecs[idx] = [float(r[f"s{i}"]) / n for i in range(dim)]
        # empty cells keep their previous centroid (classic Lloyd)
    return cvecs


def _centroid_df(spark, cids: list[int], cvecs: list[list[float]]) -> DataFrame:
    """A ``(cid, ce)`` centroid table from driver-state quantizer values."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    return spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in zip(cids, cvecs)],
        StructType(
            [
                StructField("cid", LongType(), False),
                StructField("ce", ArrayType(DoubleType(), False), False),
            ]
        ),
    )


def train_quantizer(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 4,
    sample: float | None = None,
    exact: bool = True,
) -> list[tuple[int, list[float]]]:
    """Train the IVF coarse quantizer OFFLINE and return it as plain
    driver values ``[(cid, centroid_vec), ...]`` — the storable artifact
    of the real IVF lifecycle (FAISS-style): train once on the corpus
    (or a deterministic ``sample`` of it — the standard move at 100 TB,
    where the quantizer needs only a sketch of the distribution), store
    the tiny centroid list, then pass it to every subsequent
    :func:`ivf_index` build and :func:`ivf_append` unchanged.  Training
    per index build would re-pay ``iters`` corpus folds every time and
    (worse) drift the basis between builds; a stored quantizer makes
    builds a single map-side assignment pass.

    ``exact=True`` runs the oracle-exact Lloyd loop (order-independent
    integer-quantized update steps — see :func:`_kmeans_centroids`), so
    an independent engine recomputes bit-identical centroids and the
    returned values are reproducible across sessions, partitionings,
    and engines — safe to persist and diff."""
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    seed = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("ce"))
    )
    rows = sorted(seed.collect(), key=lambda r: r["cid"])
    cids = [int(r["cid"]) for r in rows]
    cvecs = [[float(x) for x in r["ce"]] for r in rows]
    cvecs = _kmeans_centroids(
        c, cvecs, len(cvecs[0]), iters=iters, sample=sample, exact=exact,
        cids=cids,
    )
    return list(zip(cids, cvecs))


def _derive_centroids(
    corpus: DataFrame,
    c: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    centroids,
    kmeans_iters: int,
    kmeans_sample: float | None,
):
    """Coarse quantizer -> ``(cent_df, cids, cvecs)``.  The centroid list
    is driver state by design (tiny), as in any IVF index — collected
    once, inlined downstream as literal coefficients.

    ``centroids`` may be a mode string (``"seed"`` / ``"kmeans"`` /
    ``"kmeans_exact"``) or a PRETRAINED quantizer — the
    ``[(cid, vec), ...]`` list :func:`train_quantizer` returns — in
    which case no corpus pass runs here at all (the stored-quantizer
    build path)."""
    if not isinstance(centroids, str):
        pre = sorted(
            ((int(cid), [float(x) for x in vec]) for cid, vec in centroids),
        )
        cids = [cid for cid, _ in pre]
        cvecs = [vec for _, vec in pre]
        return _centroid_df(corpus.sparkSession, cids, cvecs), cids, cvecs
    cent = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("ce"))
    )
    # cids come back sorted ascending so "first CASE match" == "smallest cid"
    cent_rows = sorted(cent.collect(), key=lambda r: r["cid"])
    cids = [int(r["cid"]) for r in cent_rows]
    cvecs = [[float(x) for x in r["ce"]] for r in cent_rows]
    dim = len(cvecs[0])
    if centroids in ("kmeans", "kmeans_exact"):
        cvecs = _kmeans_centroids(
            c, cvecs, dim, iters=kmeans_iters, sample=kmeans_sample,
            exact=(centroids == "kmeans_exact"), cids=cids,
        )
        cent = _centroid_df(corpus.sparkSession, cids, cvecs)
    elif centroids != "seed":
        raise ValueError(f"unknown centroids mode: {centroids!r}")
    return cent, cids, cvecs


def _assign_cells(c: DataFrame, cids: list[int], cvecs: list[list[float]]) -> DataFrame:
    """Map-side argmax cell assignment -> ``(id, e, cell)``; the corpus
    never shuffles (a window/groupBy formulation would shuffle corpus x
    n_centroids rows).

    Fast scores: one compact fold per centroid, ALL funneled through ONE
    array column.  Two dead ends are documented here so they stay dead:
    (1) 16 separate straight-line chain columns are an optimizer bomb —
    the chains re-inline into every downstream reference (greatest /
    band count / argmax CASE, a 16x16 fan-out) and Catalyst's fixpoint
    batches walk a ~100k-node tree for minutes; (2) one array() of 16
    straight-line chains is a codegen bomb — a single non-splittable
    expression whose generated method "grows beyond 64 KB", and the
    slow Janino failure repeats for every stage that embeds it.
    aggregate/zip_with folds are CodegenFallback (interpreted) but ~10
    plan nodes each and the same left-to-right IEEE sequence — the
    per-row cost is n_centroids*dim multiply-adds either way.
    """
    import math

    def _fold_sq(v):  # left fold, same IEEE sequence as _norm_fast
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return acc

    cnorms = [math.sqrt(_fold_sq(v)) for v in cvecs]

    def _dlit(x: float) -> str:
        return f"{x!r}D"

    dots = ", ".join(
        f"aggregate(zip_with(e, {_arr_lit(cv)}, "
        "(x, c) -> x * c), 0.0D, (acc, x) -> acc + x)"
        f" / (__enorm * {_dlit(cn)})"
        for cv, cn in zip(cvecs, cnorms)
    )
    enorm_sql = "sqrt(aggregate(transform(e, x -> x * x), 0.0D, (acc, x) -> acc + x))"
    staged = c.selectExpr("id", "e", f"{enorm_sql} AS __enorm").selectExpr(
        "id", "e", f"array({dots}) AS __farr"
    )
    cids_arr = _arr_lit(cids, "BIGINT")
    flagged = staged.selectExpr(
        "id", "e", "__farr", "array_max(__farr) AS __fmax"
    ).selectExpr(
        "id",
        "e",
        f"size(filter(__farr, x -> x >= __fmax - {_RERANK_EPS!r})) AS __nband",
        f"element_at({cids_arr}, CAST(array_position(__farr, __fmax) AS INT)) AS __cfast",
    )

    # Epsilon-ambiguous rows (measure-zero in practice) are settled
    # in-row by the decimal-exact cosine, CASE-guarded so the decimal
    # folds evaluate only where needed.  NO filter ever touches a
    # computed column here: splitting ambiguous rows into a separate
    # branch plants a Filter(__nband > 1) that predicate pushdown
    # rewrites through the projections, re-inlining the whole fold array
    # into a per-row filter condition (measured 6s for a 0-row sliver).
    def _dec_dot(vec_sql: str, arr_sql: str) -> str:
        prods = f"zip_with({vec_sql}, {arr_sql}, (x, c) -> CAST(x * c AS DECIMAL(30,15)))"
        return (
            f"CAST(aggregate({prods}, CAST(0 AS DECIMAL(38,15)), "
            "(acc, x) -> CAST(acc + x AS DECIMAL(38,15))) AS DOUBLE)"
        )

    def _dec_norm(vec_sql: str) -> str:
        sq = f"transform({vec_sql}, x -> CAST(x * x AS DECIMAL(30,15)))"
        return (
            f"sqrt(CAST(aggregate({sq}, CAST(0 AS DECIMAL(38,15)), "
            "(acc, x) -> CAST(acc + x AS DECIMAL(38,15))) AS DOUBLE))"
        )

    dec_cosines = ", ".join(
        f"{_dec_dot('e', _arr_lit(cv))}"
        f" / (__dne * {_dec_norm(_arr_lit(cv))})"
        for cv in cvecs
    )
    return (
        flagged.selectExpr(
            "id", "e", "__nband", "__cfast",
            f"CASE WHEN __nband > 1 THEN {_dec_norm('e')} END AS __dne",
        )
        .selectExpr(
            "id", "e", "__cfast",
            f"CASE WHEN __nband > 1 THEN array({dec_cosines}) END AS __darr",
        )
        .selectExpr(
            "id",
            "e",
            # coalesce sentinel: cell is non-null by construction (both
            # CASE arms are element_at over a valid 1-based position),
            # but the _arr_lit split-cast arrays carry
            # containsNull=true (a CAST target type cannot declare
            # ARRAY<.. NOT NULL>), which would make this attribute
            # NULLABLE — and a nullable equi-join key gets an inferred
            # isnotnull(cell) constraint that predicate pushdown
            # rewrites through these projections, re-inlining the whole
            # fold tree into a per-row Filter above the scan (measured:
            # ivf_ann_topk 2.1s -> 24.6s, optimized plan 88 KB ->
            # 2.5 MB).  The -1 sentinel never fires and no cid is
            # negative, so values are unchanged.
            "coalesce(CASE WHEN __darr IS NULL THEN __cfast ELSE "
            f"element_at({cids_arr}, CAST(array_position(__darr, array_max(__darr)) AS INT)) "
            "END, -1L) AS cell",
            # non-deterministic barrier: keeps downstream inferred filters
            # (join-key pushdowns) from being rewritten through these
            # projections, which would clone the fold expressions into
            # per-row filter conditions
            "rand() AS __nd",
        )
        .select("id", "e", "cell")
    )


def _nearest_cells(
    side: DataFrame, key: str, vec: str, n: int, cent: DataFrame
) -> DataFrame:
    """Top-n centroids per (small) query row, two-phase: double-fold
    scores all ``n_centroids``, the decimal-exact cosine decides only
    the rows inside the epsilon band of the fast nth score."""
    fcos = _cos_fast(vec, "ce")
    scored = side.join(F.broadcast(cent), F.lit(True)).select(
        key, vec, "cid", "ce", fcos.alias("fcos")
    )
    band = _rerank_topk(scored, n, part=key, ident="cid")
    cos = _cos_exact(vec, "ce")
    w = Window.partitionBy(key).orderBy(F.col("__cos").desc(), F.col("cid"))
    return (
        band.withColumn("__cos", cos)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .select(key, vec, F.col("cid").alias("cell"))
    )


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    centroids="seed",
    kmeans_iters: int = 4,
    kmeans_sample: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The STORABLE IVF index: ``(assignments, centroids)`` — the IVF
    twin of :func:`lsh_index`.

    ``centroids`` is a quantizer mode string, or a PRETRAINED quantizer
    (:func:`train_quantizer`'s ``[(cid, vec), ...]``) — then the build
    is a single map-side assignment pass over the corpus, the shape a
    production rebuild actually runs (train once offline, reuse the
    stored quantizer across builds and :func:`ivf_append` shards).

    ``assignments`` is ``(id, cell)`` — one row per corpus vector; write
    it bucketed by ``cell`` (io.sinks.write_bucketed) so probes scan
    only the probed cells pre-clustered.  ``centroids`` is ``(cid, ce)``
    — n_centroids rows, plain parquet.  Repeated-query workloads then
    answer via :func:`ivf_probe` without re-running the corpus-wide
    assignment argmax, which is the entire corpus-sized cost of
    :func:`ivf_topk`.  Appending a new corpus shard = assign the shard
    against the STORED centroids (:func:`_assign_cells` with the stored
    cvecs) and insert — the quantizer stays fixed, as in any production
    IVF index (retrain on drift, not per shard)."""
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    cent, cids, cvecs = _derive_centroids(
        corpus, c, id_col, vec_col, n_centroids, centroids,
        kmeans_iters, kmeans_sample,
    )
    return _assign_cells(c, cids, cvecs).select("id", "cell"), cent


def ivf_append(
    shard: DataFrame,
    cent: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign a NEW corpus shard against the STORED centroid table —
    the IVF twin of dedup's rolling-ingest path
    (:func:`..dedup.incremental_dedup`): ``(id, cell)`` rows to insert
    into the stored assignments table, with the quantizer held FIXED.

    This is the operation a rolling 100 TB ingest actually runs per
    arriving shard.  Calling :func:`ivf_index` on the shard instead
    would silently re-derive centroids *from the shard* — a different
    quantizer per shard, which corrupts the index (probes against one
    basis, assignments from another).  Here the centroids come from the
    stored ``cent`` table (collected once — bounded driver state, as at
    build time) and the shard runs the same map-side argmax as the
    original build (:func:`_assign_cells`; shard never shuffles).
    Retrain on drift (rebuild via ``ivf_index(centroids="kmeans")``),
    not per shard — the standard IVF lifecycle."""
    c = shard.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    cent_rows = sorted(
        cent.select("cid", "ce").collect(), key=lambda r: r["cid"]
    )
    if not cent_rows:
        raise ValueError("empty centroid table — build ivf_index first")
    cids = [int(r["cid"]) for r in cent_rows]
    cvecs = [[float(x) for x in r["ce"]] for r in cent_rows]
    return _assign_cells(c, cids, cvecs).select("id", "cell")


def ivf_probe(
    assignments: DataFrame,
    cent: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k answered from a STORED IVF index: per-query
    work = scoring against the stored centroid table (broadcast, tiny)
    + fetching candidates from the probed cells of ``assignments`` +
    the shared exact re-rank.  The corpus-wide assignment never reruns;
    ``corpus`` is touched only to fetch candidate vectors by id."""
    qid = query_id_col or id_col
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    c = c.withColumn("fnorm", _norm_fast("e"))
    q = queries.select(F.col(qid).alias("qid"), _as_double(vec_col).alias("qe"))
    q = q.withColumn("fqnorm", _norm_fast("qe"))
    probes = _nearest_cells(
        q.select("qid", "qe"), "qid", "qe", n_probe, cent
    ).select("qid", "cell")
    cand = (
        assignments.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id")
        .dropDuplicates(["qid", "id"])
    )
    return _exact_rerank_pairs(cand, c, q, k)


def ivf_sq_probe(
    assignments: DataFrame,
    cent: DataFrame,
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    margin: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """The composed serving shape — "IVF,SQ8": STORED cell assignments
    prune the corpus, STORED int8 codes (:func:`quantize_vectors`
    output) score the surviving candidates with exact integer
    arithmetic, and only the ``margin * k`` best per query touch the
    raw vectors for the decimal-exact re-rank.  Returns
    ``(qid, id, qcos, cos, rk)``.

    Why this is the 100 TB answer: :func:`ivf_probe` fetches every
    candidate's RAW vector for re-ranking, so a hot cell still drags
    full-width floats through the join; here the candidate fetch reads
    the 4-8x-smaller code table and the raw-vector join is bounded at
    ``margin * k * |queries|`` rows regardless of cell occupancy.  All
    three stored artifacts (assignments bucketed by cell, the tiny
    centroid table, the codes keyed by id) are write-once /
    probe-forever; per-query cost = broadcast centroid scoring + probed
    cells' code rows + a constant-size exact join.

    **Snapshot contract**: ``assignments``, ``codes``, and ``corpus``
    MUST come from the same corpus snapshot — the candidate scoring
    inner-joins assignments to codes on ``id``, so an id present in the
    assignments but missing from the codes table (stale codes after an
    append that only updated assignments) is silently dropped and
    recall degrades with no error.  Same MUST-match discipline as
    :func:`lsh_probe`'s ``(n_planes, n_tables, dim)`` and
    ``incremental_dedup``'s ``(bands, k)``: refresh the three artifacts
    together (:func:`ivf_append` + a matching :func:`quantize_vectors`
    insert per shard).
    """
    qid = query_id_col or id_col
    q_raw = queries.select(F.col(qid).alias("qid"), _as_double(vec_col).alias("qe"))
    probes = _nearest_cells(
        q_raw.select("qid", "qe"), "qid", "qe", n_probe, cent
    ).select("qid", "cell")
    cand = (
        assignments.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id")
        .dropDuplicates(["qid", "id"])
    )
    qz_q = quantize_vectors(queries, qid, vec_col).select(
        F.col("id").alias("qid"),
        F.col("qv").alias("qu"),
        F.col("qnorm").alias("qunorm"),
    )
    scored = (
        cand.join(codes.select("id", "qv", "qnorm"), "id")
        .join(F.broadcast(qz_q), "qid")
        .select("qid", "id", _sq8_cos().alias("qcos"))
    )
    w_q = Window.partitionBy("qid").orderBy(F.col("qcos").desc(), F.col("id"))
    sliver = scored.withColumn("__rkq", F.row_number().over(w_q)).filter(
        F.col("__rkq") <= margin * k
    )
    c_raw = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    cos = _cos_exact("qe", "e")
    rescored = (
        sliver.join(c_raw, "id")
        .join(F.broadcast(q_raw), "qid")
        .select("qid", "id", "qcos", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "qid",
            "id",
            F.round("qcos", 6).alias("qcos"),
            F.round("cos", 6).alias("cos"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 3,
    query_id_col: str | None = None,
    centroids: str = "seed",
    kmeans_iters: int = 4,
    kmeans_sample: float | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` cells, probe the ``n_probe`` nearest cells per query,
    exact cosine re-rank within the probed cells.

    ``centroids="seed"`` (default): the centroids are **deterministic
    seeds** — the corpus rows with the ``n_centroids`` smallest ids — so
    the whole operator (assignment included) is closed-form and
    oracle-checkable.  ``centroids="kmeans"``: the seeds are refined by
    ``kmeans_iters`` Lloyd iterations (:func:`_kmeans_centroids`) for
    recall at scale; the plan shape downstream of the quantizer is
    identical, only the literal coefficients change.

    Plan shape at 100 TB: the coarse quantizer (centroid list) is driver
    state, as in any IVF index — collected once, inlined as literal
    coefficients (:func:`_derive_centroids`).  Cell assignment is a pure
    **map-side argmax** (:func:`_assign_cells`).  Probing and candidate
    scoring reuse the two-phase double-prefilter + decimal re-rank of
    :func:`cosine_topk`; the probed-cell candidate join broadcasts the
    (small) query side.  One-shot form — repeated-query workloads should
    store :func:`ivf_index` once and answer with :func:`ivf_probe`.
    """
    qid = query_id_col or id_col
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    cent, cids, cvecs = _derive_centroids(
        corpus, c, id_col, vec_col, n_centroids, centroids,
        kmeans_iters, kmeans_sample,
    )
    assigned = _assign_cells(c, cids, cvecs)
    q = queries.select(F.col(qid).alias("qid"), _as_double(vec_col).alias("qe"))
    probes = _nearest_cells(q, "qid", "qe", n_probe, cent)
    pairs = assigned.join(F.broadcast(probes), "cell").filter(F.col("id") != F.col("qid"))
    fcos = _cos_fast("qe", "e")
    scored = pairs.select("qid", "id", "qe", "e", fcos.alias("fcos")).dropDuplicates(
        ["qid", "id"]
    )
    survivors = _rerank_topk(scored, k)
    cos = _cos_exact("qe", "e")
    rescored = survivors.select("qid", "id", cos.alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "id", F.round("cos", 6).alias("cos"), F.col("rk").cast("int").alias("rk"))
    )




def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, LSH-blocked
    (same bucket in any table) with exact verification — the embedding
    analog of MinHash-LSH dedup."""
    c = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    c = c.withColumn("enorm", _norm_fast("e"))
    # dedupe bare id pairs first (a pair surfaces once per shared table),
    # then re-join the vectors for verification — don't shuffle the
    # embedding arrays through the dropDuplicates; the persisted
    # signature table is computed once and read by both join sides
    b = signature_table(c, ["id"], "e", n_planes, n_tables, dim)
    l = b.alias("l")
    r = b.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bkt") == F.col("r.bkt"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = c.select("id", "e", "enorm")
    verified = cand.join(
        vecs.select(F.col("id").alias("id_a"), F.col("e").alias("ea"), F.col("enorm").alias("na")),
        "id_a",
    ).join(
        vecs.select(F.col("id").alias("id_b"), F.col("e").alias("eb"), F.col("enorm").alias("nb")),
        "id_b",
    )
    # Two-phase verification: a plain-double dot over plain-double norms
    # prefilters the candidate set (fp error on unit-ish vectors is
    # ~1e-13, the margin is 1e-6, so no true pair is ever dropped); the
    # decimal-exact dot and norms — ~100x costlier — then decide only the
    # survivors, matching the oracle's decimal arithmetic bit-for-bit.
    fast_cos = _dot_fast("ea", "eb") / (F.col("na") * F.col("nb"))
    survivors = verified.filter(fast_cos >= F.lit(threshold - 1e-6))
    cos = _cos_exact("ea", "eb")
    return (
        survivors.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def semantic_cell_stats(assignments: DataFrame) -> DataFrame:
    """Per-cell occupancy audit for :func:`semantic_dedup` (VERDICT r7
    item 3): ``(cell, n_rows, n_pairs, occupancy_frac)`` — ``n_pairs``
    is the self-join pair count the cell would contribute
    (``n*(n-1)/2``), ``occupancy_frac`` the cell's share of corpus
    rows.  The decision input for ``max_cell_rows``: semantic dedup's
    cost is ``sum(n_pairs)``, and one crawl-burst hot cell dominates
    that sum long before it dominates row counts.  One aggregate over
    the (id, cell) table — run it on every stored IVF index refresh."""
    n = F.col("n_rows").cast("bigint")
    per_cell = (
        assignments.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("n_pairs", (n * (n - 1) / 2).cast("bigint"))
    )
    # corpus total via 1-row agg + broadcast cross-join, NOT an
    # empty-partition window (VERDICT r9 item 4): the window form
    # funnels the per-cell table through one partition and logs
    # "WindowExec: No Partition Defined" on every run; the broadcast
    # of the single total row keeps the per-cell side fully parallel
    total = per_cell.agg(F.sum("n_rows").cast("bigint").alias("__total"))
    return (
        per_cell.crossJoin(F.broadcast(total))
        .withColumn(
            "occupancy_frac",
            F.round(n / F.col("__total"), 6),
        )
        .drop("__total")
    )


def semantic_dedup(
    assignments: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = None,
    split_planes: int = 6,
    dim: int = 64,
    stats: dict | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster cells prune the pair space, exact cosine
    inside each cell decides, and a deterministic keep policy marks one
    survivor per duplicate relation.  Returns one row per corpus vector:
    ``(id, cell, keep, dup_of, dup_cos)`` — ``keep`` is false iff a
    LOWER-id vector in the SAME cell has cosine >= threshold;
    ``dup_of``/``dup_cos`` name the lowest such id and its cosine.

    Pair generation is a self-join keyed on ``cell`` — cost is
    sum(|cell|^2) over cells, never O(n^2); ``n_centroids`` (sqrt-ish of
    corpus size at fleet scale, the paper uses 50k clusters for LAION)
    is the dial that bounds cell occupancy, and ``assignments`` can be
    the STORED bucketed table from :func:`ivf_index` so the cluster
    step never reruns.  The paper keeps the member with the lowest
    centroid similarity; here the keep order is the id (first-seen wins
    — deterministic in any engine at any parallelism); swapping the
    window order to a centroid-distance column is the one-line variant.
    Scoring follows :func:`embedding_neardup_pairs`: a plain-double dot
    prefilters (error ~1e-13 against a 1e-6 margin), the decimal-exact
    cosine decides survivors only.

    **Hot-cell skew guard** (``max_cell_rows``, default off): a
    duplicate-heavy crawl burst can pile one cell to millions of rows —
    a quadratic pocket no cluster count fully prevents.  When set,
    cells above the cap are SPLIT by an extra LSH band: each row's
    sub-key is the low ``ceil(log2(n_cell / max_cell_rows))`` bits (at
    most ``split_planes``) of a deterministic random-hyperplane
    signature over the embedding (:func:`signature_table`'s basis), and
    the self-join key becomes ``(cell, subcell)``.  Pair cost for a hot
    cell of n rows drops from n^2/2 to ~``max_cell_rows * n / 2``
    (hash-balance permitting — measured on a planted burst in
    tools/bench_scale.py semantic).  Cold cells get sub-key 0 — their
    plan and output are UNCHANGED.  The trade, exactly as in SemDeDup's
    cluster-count sizing: near-dup pairs whose members land in
    different sub-buckets are missed (random hyperplanes are
    cosine-preserving, so P(split) per bit is angle/pi ~ 0.1 at
    threshold 0.95; EXACT duplicates share every bucket by construction
    and are never missed).  ``dim`` must match the embedding width when
    the guard is on.

    ``stats`` (optional dict) receives ``n_candidate_pairs`` (the
    self-join output size actually generated), ``n_cells`` and
    ``max_cell`` — the evidence a scale run asserts against
    (pair count <= max_cell_rows * n_rows on the planted-skew fixture).
    """
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    c = c.withColumn("fnorm", _norm_fast("e"))
    a = assignments.select("id", "cell").join(c, "id")
    join_key = ["cell"]
    if max_cell_rows is not None:
        occ = assignments.groupBy("cell").agg(F.count(F.lit(1)).alias("__occ"))
        bits = F.when(
            F.col("__occ") > max_cell_rows,
            F.ceil(F.log2(F.col("__occ") / F.lit(float(max_cell_rows)))),
        ).otherwise(F.lit(0))
        occ = occ.select(
            "cell", F.least(bits, F.lit(split_planes)).cast("int").alias("__bits")
        )
        sig = signature_table(
            a, ["id", "cell", "e", "fnorm"], "e",
            n_planes=split_planes, n_tables=1, dim=dim, persist=False,
        ).drop("tbl")
        a = sig.join(F.broadcast(occ), "cell").select(
            "id", "cell", "e", "fnorm",
            # PySpark's F.shiftleft only takes a literal bit count; the
            # SQL form accepts the per-cell column
            F.col("bkt").bitwiseAND(F.expr("shiftleft(1, __bits) - 1")).alias(
                "subcell"
            ),
        )
        join_key = ["cell", "subcell"]
    l = a.select(
        *join_key,
        F.col("id").alias("id_a"),
        F.col("e").alias("ea"),
        F.col("fnorm").alias("na"),
    )
    r = a.select(
        *join_key,
        F.col("id").alias("id_b"),
        F.col("e").alias("eb"),
        F.col("fnorm").alias("nb"),
    )
    pairs = l.join(r, join_key).filter(F.col("id_a") < F.col("id_b"))
    if stats is not None:
        occ_stats = (
            a.groupBy(*join_key).agg(F.count(F.lit(1)).alias("__n")).agg(
                F.sum(F.col("__n") * (F.col("__n") - 1) / 2).alias("p"),
                F.count(F.lit(1)).alias("k"),
                F.max("__n").alias("m"),
            ).first()
        )
        stats["n_candidate_pairs"] = int(occ_stats["p"] or 0)
        stats["n_cells"] = int(occ_stats["k"])
        stats["max_cell"] = int(occ_stats["m"] or 0)
    fast_cos = _dot_fast("ea", "eb") / (F.col("na") * F.col("nb"))
    survivors = pairs.filter(fast_cos >= F.lit(threshold - 1e-6))
    cos = _cos_exact("ea", "eb")
    dup_pairs = (
        survivors.withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .select("id_a", "id_b", "__cos")
    )
    w = Window.partitionBy("id_b").orderBy("id_a")
    first = (
        dup_pairs.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("id_b").alias("id"),
            F.col("id_a").alias("dup_of"),
            F.round("__cos", 6).alias("dup_cos"),
        )
    )
    return (
        assignments.select("id", "cell")
        .join(first, "id", "left")
        .select(
            "id",
            "cell",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
            "dup_cos",
        )
    )


def exact_ground_truth(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Brute-force exact top-k ground truth for an ANN recall audit,
    materialized as driver-state rows — the stored artifact the audit
    probes (VERDICT r8 item 6).  Same lifecycle as
    :func:`train_quantizer`: the exact scan is O(|queries| x |corpus|)
    and the corpus-identity-keyed result is |queries| x k ``(qid, id)``
    rows, so a deployment computes it ONCE per corpus version (over the
    sampled audit query set), stores it beside the serving indexes, and
    every subsequent recall sweep — new quantizer config, new probe
    width, new margin — reuses it for free.  The values are
    engine-portable by construction: :func:`cosine_topk`'s decimal-exact
    cosine + deterministic (score, id) tie-break mean any engine
    recomputes the identical row set, so storing it loses nothing."""
    return cosine_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("qid", "id").collect()


def ann_recall_report(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    methods: tuple = ("ivf", "lsh"),
    min_recall: float = 0.6,
    ivf_kwargs: dict | None = None,
    lsh_kwargs: dict | None = None,
    exact_rows: list | None = None,
    parallel: bool = False,
) -> DataFrame:
    """Recall@k audit of the approximate indexes against the exact
    brute-force ground truth — the ANN twin of
    :func:`..sketches.sketch_accuracy_report`: an approximate operator
    only earns its place in a pipeline if its error is *measured*, and
    this report makes that measurement a first-class, oracle-checkable
    query instead of a notebook afterthought.

    Emits one row per (method, query vector): ``(method, qid, n_exact,
    n_hits, recall, recall_ok)`` where ``n_hits`` counts approximate
    neighbors that appear in the exact top-k and ``recall_ok`` is the
    per-query verdict ``recall >= min_recall``.

    ``methods`` entries are either the built-in strings (``"ivf"``,
    ``"lsh"``) or ``(name, probe_fn)`` pairs where ``probe_fn(corpus,
    queries, k, id_col, vec_col) -> DataFrame(qid, id, ...)`` — the
    hook that puts STORED-index serving paths (a prebuilt
    :func:`lsh_index` answered by :func:`lsh_probe`, a prebuilt
    :func:`ivf_index` answered by :func:`ivf_probe`) under the same
    audit as the one-shot forms, so the config actually deployed is the
    config whose recall is measured.

    Scale shape: the exact side is the audit cost — O(|queries| x
    |corpus|) like :func:`cosine_topk` (broadcast queries, corpus never
    shuffles), so at fleet scale this runs over a *sampled* query set,
    which is exactly how ANN indexes are validated in practice.  The
    exact top-k is |queries| x k rows — bounded by the sampled audit
    set — so it is materialized ONCE to the driver and rebroadcast,
    which (a) avoids recomputing the brute-force scan per method branch
    and (b) leaves no persisted cache behind after the report is built.
    Better still, it is a STORED ARTIFACT in a real deployment (the
    same train-once lifecycle as :func:`train_quantizer`'s centroids —
    ground truth changes only when the corpus does): pass the rows back
    via ``exact_rows`` (``exact_ground_truth``'s output) and the
    brute-force scan is skipped entirely; recall serving-config sweeps
    then cost only the approximate probes.
    The report base is every qid in ``queries`` (left-joined against
    exact counts), so a query whose exact top-k is empty — filtered or
    degenerate vector — still appears, with ``n_exact = 0`` and null
    recall, instead of silently vanishing from the audit.
    """
    from pyspark.sql import functions as F

    spark = queries.sparkSession
    if exact_rows is None:
        exact_rows = exact_ground_truth(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col
        )

    def _branch(m):
        """(name, plan-thunk) for one method entry — the thunk BUILDS
        the branch plan, so in parallel mode plan construction itself
        runs inside the worker thread (see below)."""
        if m == "ivf":
            return m, lambda: ivf_topk(
                corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
                **(ivf_kwargs or {}),
            )
        if m == "lsh":
            return m, lambda: lsh_topk(
                corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
                **(lsh_kwargs or {}),
            )
        if isinstance(m, tuple) and len(m) == 2 and callable(m[1]):
            name, probe_fn = m
            return name, lambda: probe_fn(corpus, queries, k, id_col, vec_col)
        raise ValueError(f"unknown ANN method: {m!r}")

    branches = [_branch(m) for m in methods]
    method_names = [n for n, _ in branches]
    if parallel:
        # Concurrent branch materialization: every branch's result is
        # audit-sized by construction (<= |queries| x k (qid, id) rows
        # — the same bound as the stored ground truth), but each branch
        # is expensive to PLAN and to SCHEDULE: the probe plans carry
        # the unrolled projection/cosine expression trees (Catalyst
        # analysis is ~1s of driver CPU per branch, serial if built in
        # a loop) and their own chains of small exchanges (~1-2s of
        # stage overhead per branch at |corpus|=2k, serialized behind
        # the scheduler when executed as one 9-way union DAG).  Worker
        # threads therefore both BUILD and COLLECT each branch — plan
        # analysis runs concurrently in the JVM (py4j releases the GIL)
        # and the branches execute as concurrent Spark jobs (the
        # supported multi-action pattern), so wall cost is the max
        # branch, not the sum of either phase.  Persisted shared
        # artifacts (signature index, IVF assignments, PQ codes) must
        # be materialized BEFORE the fan-out or the threads race to
        # compute them redundantly.
        import os
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        _dbg = os.environ.get("SPARK_GRAFT_ANN_DEBUG")

        def _materialize(nb):
            name, build = nb
            t0 = _time.perf_counter()
            rows = build().select(
                F.lit(name).alias("method"), "qid", "id"
            ).collect()
            if _dbg:
                print(f"  [ann_recall] {name}: {_time.perf_counter() - t0:.2f}s")
            return rows

        with ThreadPoolExecutor(max_workers=len(branches)) as ex:
            parts = list(ex.map(_materialize, branches))
        # every input to the report is now in hand as bounded driver
        # rows (exact ground truth: |queries| x k; per-branch hits:
        # <= |queries| x k each) — assemble the |methods| x |queries|
        # report in plain Python instead of a cascade of broadcast
        # joins over 450-row DataFrames (the joins are correct but cost
        # ~2s of pure small-stage scheduling; the arithmetic is the
        # same).  All DISTRIBUTED work — the probes and the exact scan
        # — stays in Spark; this is report formatting, not compute.
        qids = sorted(
            r.qid
            for r in queries.select(
                F.col(id_col).alias("qid")
            ).distinct().collect()
        )
        exact_by_q: dict = {}
        for r in exact_rows:
            exact_by_q.setdefault(r.qid, set()).add(r.id)
        hit_counts: dict = {}
        for part in parts:
            for r in part:
                if r.id in exact_by_q.get(r.qid, ()):
                    hit_counts[(r.method, r.qid)] = (
                        hit_counts.get((r.method, r.qid), 0) + 1
                    )
        out_rows = []
        for name in method_names:
            for qid in qids:
                n_exact = len(exact_by_q.get(qid, ()))
                n_hits = hit_counts.get((name, qid), 0)
                # verdict on the UNROUNDED ratio (same contract as the
                # sequential path); round only the reported value
                ratio = n_hits / n_exact if n_exact > 0 else None
                out_rows.append((
                    name, qid, n_exact, n_hits,
                    None if ratio is None else round(ratio, 6),
                    None if ratio is None else ratio >= min_recall,
                ))
        qid_t = dict(queries.dtypes)[id_col]
        return spark.createDataFrame(
            out_rows,
            f"method string, qid {qid_t}, n_exact bigint, n_hits bigint, "
            "recall double, recall_ok boolean",
        )

    tagged = [
        build().select(F.lit(name).alias("method"), "qid", "id")
        for name, build in branches
    ]
    approxes = tagged[0]
    for t in tagged[1:]:
        approxes = approxes.unionByName(t)

    # explicit schema so an EMPTY ground truth (every query degenerate
    # or filtered) still builds — n_exact=0 rows, not an infer error
    qid_t = dict(queries.dtypes)[id_col]
    cid_t = dict(corpus.dtypes)[id_col]
    exact_ids = spark.createDataFrame(
        exact_rows, f"qid {qid_t}, id {cid_t}"
    )
    hits = (
        approxes.join(F.broadcast(exact_ids), ["qid", "id"], "left_semi")
        .groupBy("method", "qid")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    method_rows = approxes.sparkSession.createDataFrame(
        [(m,) for m in method_names], "method string"
    )
    exact_counts = exact_ids.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    base = (
        queries.select(F.col(id_col).alias("qid")).distinct()
        .join(F.broadcast(exact_counts), "qid", "left")
        .withColumn("n_exact", F.coalesce("n_exact", F.lit(0)))
        .crossJoin(F.broadcast(method_rows))
    )
    recall = F.when(
        F.col("n_exact") > 0,
        F.col("n_hits").cast("double") / F.col("n_exact").cast("double"),
    )
    return (
        base.join(hits, ["method", "qid"], "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .select(
            "method", "qid", "n_exact", "n_hits",
            F.round(recall, 6).alias("recall"),
            (recall >= F.lit(min_recall)).alias("recall_ok"),
        )
    )
