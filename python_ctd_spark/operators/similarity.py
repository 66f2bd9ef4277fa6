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


def _dot_exact(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: (x * y).cast("decimal(30,15)"))
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(38,15)"),
        lambda acc, x: (acc + x).cast("decimal(38,15)"),
    ).cast("double")


def _norm_exact(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("decimal(30,15)")),
            F.lit(0).cast("decimal(38,15)"),
            lambda acc, x: (acc + x).cast("decimal(38,15)"),
        ).cast("double")
    )


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot_fast(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm_fast(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


# Margin between the double-fold prefilter score and the decimal-exact
# score.  Both fold the same 64-element products left-to-right; the double
# path accumulates at most ~1e-13 relative error on unit-ish vectors, so
# any candidate whose exact cosine could reach the exact kth score sits
# within this band of the double kth score.
_RERANK_EPS = 1e-9


def _rerank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact top-k from fast scores: keep every row whose double-precision
    cosine is within ``_RERANK_EPS`` of the per-query kth fast score, then
    let the decimal-exact cosine (computed by the caller on this surviving
    sliver only) decide the final ranking.  Two window functions, one
    sort — the decimal arithmetic never touches the full candidate set."""
    w_ord = Window.partitionBy("qid").orderBy(F.col("fcos").desc(), F.col("id"))
    w_all = Window.partitionBy("qid")
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
    c = c.withColumn("fnorm", _norm_fast(F.col("e")))
    q = queries.select(F.col(qid).alias("qid"), _as_double(vec_col).alias("qe"))
    q = q.withColumn("fqnorm", _norm_fast(F.col("qe")))
    pairs = c.join(F.broadcast(q), F.col("id") != F.col("qid"))
    # phase 1: double-precision scores over every pair (JVM fold, cheap);
    # phase 2: decimal-exact cosine on the ~k survivors per query only —
    # the decimal fold is ~100x the double fold, so it must not see the
    # full |corpus| x |queries| cross product.
    fcos = _dot_fast(F.col("qe"), F.col("e")) / (F.col("fqnorm") * F.col("fnorm"))
    scored = pairs.select("qid", "id", "qe", "e", fcos.alias("fcos"))
    survivors = _rerank_topk(scored, k)
    cos = _dot_exact(F.col("qe"), F.col("e")) / (
        _norm_exact(F.col("qe")) * _norm_exact(F.col("e"))
    )
    rescored = survivors.select("qid", "id", cos.alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "id", F.round("cos", 6).alias("cos"), F.col("rk").cast("int").alias("rk"))
    )


def _plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 from md5(plane:dim) parity — a fixed pseudo-random
    hyperplane basis shared by every executor without broadcast state."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).digest()
    return 1 if h[0] % 2 == 0 else -1


def lsh_signature(vec_col: str, n_planes: int, dim: int, table: int = 0) -> Column:
    """Random-hyperplane signature: bit p = sign(<v, plane_p>) where the
    plane entries are deterministic ±1 (Rademacher planes).  The dot with
    a ±1 plane is a signed sum of coordinates — pure JVM arithmetic.

    ``vec_col`` must name an already-projected ``array<double>`` column:
    a bound attribute is referenced cheaply by all ``n_planes`` bit
    expressions, whereas an inline cast expression would be re-evaluated
    once per plane."""
    v = F.col(vec_col)
    bits = []
    for p in range(n_planes):
        # left-associated chain of getItem adds, NOT a zip_with/aggregate
        # fold: higher-order functions run interpreted (no whole-stage
        # codegen), and the 24-fold signature pass dominated the LSH
        # queries.  GetArrayItem arithmetic compiles to straight-line
        # codegen; the chain order (0.0 + x[0]*s0 + x[1]*s1 + ...) is the
        # same IEEE sequence as the fold and the oracle SQL.
        sdot = F.lit(0.0)
        for d in range(dim):
            s = _plane_sign(table * 1000 + p, d)
            sdot = sdot + v.getItem(d) * F.lit(float(s))
        bits.append((sdot >= 0).cast("int") * F.lit(1 << p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: candidates share an LSH bucket with the
    query in at least one hash table; exact cosine re-rank within the
    candidate set.  Shuffles only on (table, bucket) keys."""
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    c = c.withColumn("fnorm", _norm_fast(F.col("e")))
    q = queries.select(F.col(id_col).alias("qid"), _as_double(vec_col).alias("qe"))
    q = q.withColumn("fqnorm", _norm_fast(F.col("qe")))

    def bucketed(df, vc, out):
        rows = []
        for t in range(n_tables):
            rows.append(
                F.struct(
                    F.lit(t).alias("tbl"), lsh_signature(vc, n_planes, dim, t).alias("bkt")
                )
            )
        return df.withColumn(out, F.explode(F.array(*rows))).select(
            *df.columns, F.col(f"{out}.tbl").alias("tbl"), F.col(f"{out}.bkt").alias("bkt")
        )

    cb = bucketed(c, "e", "__b").select("id", "tbl", "bkt")
    qb = bucketed(q, "qe", "__b").select("qid", "tbl", "bkt")
    # bare id pairs through the dedup, vectors re-attached after (the
    # query side is small -> broadcast on both the bucket join and fetch)
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id")
        .dropDuplicates(["qid", "id"])
    )
    verified = cand.join(c, "id").join(F.broadcast(q), "qid")
    # two-phase exactly as cosine_topk: double fold scores all candidates,
    # decimal decides only the per-query top-k sliver
    fcos = _dot_fast(F.col("qe"), F.col("e")) / (F.col("fqnorm") * F.col("fnorm"))
    scored = verified.select("qid", "id", "qe", "e", fcos.alias("fcos"))
    survivors = _rerank_topk(scored, k)
    cos = _dot_exact(F.col("qe"), F.col("e")) / (
        _norm_exact(F.col("qe")) * _norm_exact(F.col("e"))
    )
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
    c = c.withColumn("enorm", _norm_fast(F.col("e")))
    rows = []
    for t in range(n_tables):
        rows.append(
            F.struct(F.lit(t).alias("tbl"), lsh_signature("e", n_planes, dim, t).alias("bkt"))
        )
    b = c.withColumn("__b", F.explode(F.array(*rows))).select(
        "id", "e", "enorm", F.col("__b.tbl").alias("tbl"), F.col("__b.bkt").alias("bkt")
    )
    # dedupe bare id pairs first (a pair surfaces once per shared table),
    # then re-join the vectors for verification — don't shuffle the
    # embedding arrays through the dropDuplicates
    l = b.select("id", "tbl", "bkt").alias("l")
    r = b.select("id", "tbl", "bkt").alias("r")
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
    fast_cos = _dot_fast(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    survivors = verified.filter(fast_cos >= F.lit(threshold - 1e-6))
    cos = _dot_exact(F.col("ea"), F.col("eb")) / (
        _norm_exact(F.col("ea")) * _norm_exact(F.col("eb"))
    )
    return (
        survivors.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
