"""Product quantization (PQ) with asymmetric-distance (ADC) scoring —
the memory-bound ANN serving path (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

Where scalar quantization (similarity.quantize_vectors) cuts the
embedding column 4-8x, PQ cuts it ``dim/m * sizeof(float)``-fold: the
vector is split into ``m`` subspaces, each sub-vector replaced by the
id of its nearest codebook centroid — one BYTE per subspace at
``ksub <= 256``.  A dim=64 float64 corpus column (512 B/row) becomes an
8-byte code at m=8: the whole candidate scan reads 64x fewer bytes, and
a 100 TB embedding corpus's codes fit in ~1.6 TB — executor-resident at
fleet scale.

Scoring is ADC: per query, a lookup table ``LUT[j][c] = <q_j, C[j][c]>``
is built ONCE (m*ksub decimal-exact dots against literal codebook
coefficients — map-side on the broadcast-sized query set), and each
corpus code then scores with ``m`` table lookups instead of ``dim``
multiplies.  Candidates are cut to ``margin*k`` per query on the ADC
score; only that sliver touches the raw vectors for the decimal-exact
cosine re-rank — the same two-phase shape as
:func:`..similarity.quantized_topk`.

Engine-portable determinism (the repo's oracle contract): the encode
argmin is INTEGER-exact (coordinates quantized at 1e-6, BIGINT scores
— see ``_pq_assign``), and every other ranking-relevant number is an
exact DECIMAL sum (order-independent, so Spark folds == SQL SUM) or a
double derived from one by the identical expression — LUT entries, ADC
totals, and the re-rank cosine are all bit-identical in Spark and
DuckDB at any parallelism.

Reference scope note: the reference library (pyoceans/python-ctd) has
no similarity surface at all — this module is part of the LLM-training-
data extension the engine adds on top of the reference's operator set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import _arr_lit, _as_double, _cos_exact


def _subspaces(dim: int, m: int) -> int:
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim={dim} not divisible into m={m} subspaces")
    return dim // m


def _dec_fold(prods: str) -> str:
    """Exact DECIMAL(38,15) left fold over a DECIMAL(30,15) array —
    exact addition is order-independent, so this equals SQL's SUM."""
    return (
        f"aggregate({prods}, CAST(0 AS DECIMAL(38,15)), "
        "(acc, x) -> CAST(acc + x AS DECIMAL(38,15)))"
    )


def _dec_norm2(vec_sql: str) -> str:
    return _dec_fold(f"transform({vec_sql}, x -> CAST(x * x AS DECIMAL(30,15)))")


def _dec_norm2_arr(cv) -> str:
    return _dec_norm2(_arr_lit(cv))


def pq_seed_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
) -> list[list[list[float]]]:
    """Deterministic seed codebooks: code ``c`` of subspace ``j`` is the
    j-th sub-vector of the (c+1)-th corpus row by id — the same
    closed-form seed rule as the IVF coarse quantizer, so a SQL oracle
    re-derives the identical codebooks from the parquet."""
    rows = sorted(
        corpus.orderBy(id_col)
        .limit(ksub)
        .select(F.col(id_col).alias("cid"), _as_double(vec_col).alias("ce"))
        .collect(),
        key=lambda r: r["cid"],
    )
    if len(rows) < ksub:
        raise ValueError(f"corpus has {len(rows)} rows < ksub={ksub}")
    dim = len(rows[0]["ce"])
    d = _subspaces(dim, m)
    return [
        [[float(x) for x in r["ce"][j * d : (j + 1) * d]] for r in rows]
        for j in range(m)
    ]


def _norm2_decimals(spark, codebooks: list[list[list[float]]]) -> list[list]:
    """The exact DECIMAL(38,15) squared norm of every codebook entry,
    evaluated ONCE through Spark's own decimal arithmetic (a single
    1-row driver-side query over pure literals) so the values embedded
    downstream are bit-identical to what an in-plan fold — and the SQL
    oracle's SUM(CAST(cv*cv AS DECIMAL(30,15))) — would produce."""
    exprs = [
        f"{_dec_norm2_arr(cv)} AS n_{j}_{ci}"
        for j, book in enumerate(codebooks)
        for ci, cv in enumerate(book)
    ]
    row = spark.range(1).selectExpr(*exprs).first()
    return [
        [row[f"n_{j}_{ci}"] for ci in range(len(book))]
        for j, book in enumerate(codebooks)
    ]


_QSCALE = 1000000.0  # 1e-6 coordinate quantization, as in exact Lloyd


def _qlit(x: float) -> int:
    """The same half-up integer quantization the SQL oracle's
    ``floor(v * 1e6 + 0.5)`` applies, precomputed for literals."""
    import math

    return int(math.floor(float(x) * _QSCALE + 0.5))


def _pq_assign(
    c: DataFrame, codebooks: list[list[list[float]]], with_norm: bool = True,
    keep: tuple = (),
) -> DataFrame:
    """Map-side per-subspace argmin -> ``(id, e, __codes)`` with
    ``__codes`` the 0-based code array.  The corpus never shuffles.

    Nearest-by-L2 maximizes ``2<x,c> - |c|^2`` (|x|^2 is constant
    within a subspace), and the assignment CONTRACT quantizes both
    sides at 1e-6 first — ``score = sum_i 2*q(c_i)*q(x_i) - sum_i
    q(c_i)^2`` in pure BIGINT, the exact-Lloyd move: integer scores
    are bit-identical in any engine at any parallelism (ties toward
    the smallest code by first-position-of-max), need no epsilon-band
    decimal settle, and codegen to straight-line arithmetic.  The
    1e-6 coordinate shift is irrelevant to clustering — it only moves
    code boundaries by ~1e-6, and PQ's reconstruction error is orders
    of magnitude larger by construction.  Domain bound: the BIGINT fold
    holds while ``dsub * 2 * (|x| * 1e6)^2 < 2^63``, i.e. coordinate
    magnitudes up to ~200 at dsub=8 — far above embedding-scale data
    (unit-norm vectors are ~1); beyond that ANSI mode fails loudly
    (BIGINT overflow error), never silently — normalize first.

    Three earlier designs are documented so they stay dead: pure
    DECIMAL(38,15) score folds (8.2s for 2000 rows at sf0.1 —
    BigDecimal folds are ~10x interpreted-double folds); double-fold
    scores with an epsilon-band decimal settle (the _assign_cells
    contract; still 2-3s — aggregate/zip_with are CodegenFallback, so
    the bulk path stays interpreted); and straight-line BIGINT chains
    (1024 fused terms make whole-stage codegen's ``processNext()``
    fail Janino compilation OUTRIGHT — silent fallback re-interprets
    the whole giant tree at ~1.3ms/row).  The winning shape: quantize
    each coordinate ONCE per row (one transform), then small integer
    zip_with folds per code — interpreted, but over cheap BIGINTs with
    64 (not 1024) floor() evaluations per row.  Scores funnel through
    one array column per subspace (per-code chain columns are an
    optimizer bomb — see _assign_cells)."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    d = len(codebooks[0][0])

    quant = c.selectExpr(
        "id", "e", *keep,
        f"transform(e, x -> CAST(floor(x * {_QSCALE!r}D + 0.5D) AS BIGINT)) AS xq",
    )
    score_arrays = []
    for j, book in enumerate(codebooks):
        o = j * d + 1
        scores = ", ".join(
            f"aggregate(zip_with(slice(xq, {o}, {d}), "
            f"{_arr_lit([2 * _qlit(x) for x in cv], 'BIGINT')}, "
            "(x, c) -> x * c), 0L, (acc, x) -> acc + x)"
            f" - {sum(_qlit(x) ** 2 for x in cv)}L"
            for cv in book
        )
        score_arrays.append(f"array({scores}) AS __s{j}")
    staged = quant.selectExpr("id", "e", *keep, *score_arrays)
    code_cols = [
        f"CAST(array_position(__s{j}, array_max(__s{j})) AS INT) - 1 AS __c{j}"
        for j in range(m)
    ]
    # rand() barrier BEFORE the final projection: codes and the pqnorm
    # lookup each reference every __c{j}, and CollapseProject would
    # otherwise re-inline the whole argmin chain once per reference
    coded = staged.selectExpr(
        "id", "e", *keep, *code_cols, "rand() AS __nd1"
    ).drop("__nd1")
    codes = "array(" + ", ".join(
        f"CAST(__c{j} AS TINYINT)" for j in range(m)
    ) + ")"
    if not with_norm:
        # training only needs the codes — skip the norm-literal driver
        # query (one 1-row Spark query per call otherwise)
        return coded.selectExpr(
            "id", "e", *keep, f"{codes} AS __codes", "rand() AS __nd"
        ).select("id", "e", *keep, "__codes")
    # reconstructed-norm^2 lookup: |recon(v)|^2 = sum_j |C[j][code_j]|^2.
    # The m*ksub code norms are evaluated ONCE (driver-side, through
    # Spark's own decimal semantics — _norm2_decimals) and embedded as
    # foldable decimal literals: inlining the decimal-fold EXPRESSIONS
    # here instead makes array() re-evaluate all 128 folds per corpus
    # row (measured: 3s of a 3.7s encode at sf0.1)
    n2 = _norm2_decimals(c.sparkSession, codebooks)
    n2_terms = " , ".join(
        f"element_at({_arr_lit(n2[j], 'DECIMAL(38,15)')}, __c{j} + 1)"
        for j in range(m)
    )
    pqnorm = (
        f"CAST({_dec_fold(f'array({n2_terms})')} AS DOUBLE)"
    )
    return coded.selectExpr(
        "id", "e", f"{codes} AS __codes", f"{pqnorm} AS pqnorm",
        # non-deterministic barrier (see _assign_cells): keeps inferred
        # filters from re-inlining the fold arrays downstream
        "rand() AS __nd",
    ).select("id", "e", "__codes", "pqnorm")


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The STORABLE PQ code table: ``(id, pq_codes array<tinyint>,
    pqnorm double)`` — one map-side pass, no shuffle, no training.

    Write it as plain parquet next to the corpus; at m=8 the code
    column is ~64x smaller than a float64 dim=64 vector column, so the
    ADC candidate scan of :func:`pq_topk` reads code-bytes, not
    vector-bytes.  ``pqnorm`` (the reconstructed vector's squared norm)
    is precomputed per row so probes never re-derive it.  Appending a
    new corpus shard = re-run this with the SAME stored codebooks
    (quantizer fixed, as in any production PQ index — retrain on
    drift, not per shard)."""
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    return _pq_assign(c, codebooks).select(
        "id", F.col("__codes").alias("pq_codes"), "pqnorm"
    )


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 4,
    sample: float | None = None,
) -> list[list[list[float]]]:
    """Train PQ codebooks OFFLINE with per-subspace Lloyd iterations and
    return them as plain driver values — the storable quantizer of the
    PQ lifecycle (train once, encode/append/probe forever), the PQ twin
    of :func:`..similarity.train_quantizer`.

    All m subspaces train in ONE pass per iteration: the per-subspace
    argmin is the same map-side fold array as encode, then one
    ``groupBy(subspace, code)`` over integer-quantized coordinate sums
    (``sum(floor(x*1e6 + 0.5))`` — exact BIGINTs, no float-sum
    partition-order drift) updates all m*ksub centroids from a single
    m*ksub-row collect.  New centroid = exact integer sum / n / 1e6 —
    the same two correctly-rounded IEEE divisions in any engine, so
    trained codebooks are bit-reproducible across sessions, partition
    layouts, and engines.  ``sample`` trains on a deterministic
    md5-keyed subset (the standard move at 100 TB — the codebooks need
    only a sketch of the per-subspace distribution); empty cells keep
    their previous centroid (classic Lloyd)."""
    from .sampling import hash_uniform

    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    train = c if sample is None else c.filter(hash_uniform(F.col("id")) < sample)
    books = pq_seed_codebooks(corpus, id_col, vec_col, m, ksub)
    d = len(books[0][0])
    for _ in range(int(iters)):
        assigned = _pq_assign(train, books, with_norm=False)
        parts = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.element_at("__codes", j + 1).cast("int").alias("code"),
                        F.expr(f"slice(e, {j * d + 1}, {d})").alias("sub"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("p")
        qsum = [
            F.sum(
                F.floor(F.col("p.sub").getItem(i) * 1000000.0 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias(f"s{i}")
            for i in range(d)
        ]
        stats = (
            assigned.select(parts)
            .groupBy("p.j", "p.code")
            .agg(F.count(F.lit(1)).alias("n"), *qsum)
            .collect()
        )
        for r in stats:
            n = float(r["n"])
            books[int(r["j"])][int(r["code"])] = [
                float(r[f"s{i}"]) / n / 1000000.0 for i in range(d)
            ]
    return books


def _query_lut(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    qid_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-query ADC lookup table -> ``(qid, qe, __lut, __qn)``: the
    m*ksub exact-decimal dots of the query's sub-vectors against the
    literal codebook coefficients, flat j-major, plus the exact query
    norm — built once per query row, broadcast with the query set."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    q = queries.select(
        F.col(qid_col).alias("qid"), _as_double(vec_col).alias("qe")
    )
    lut_entries = ", ".join(
        _dec_fold(
            f"zip_with(slice(qe, {j * d + 1}, {d}), "
            f"{_arr_lit(cv)}, "
            "(x, c) -> CAST(x * c AS DECIMAL(30,15)))"
        )
        for j, book in enumerate(codebooks)
        for cv in book
    )
    qn = f"sqrt(CAST({_dec_norm2('qe')} AS DOUBLE))"
    return q.selectExpr(
        "qid", "qe", f"array({lut_entries}) AS __lut", f"{qn} AS __qn"
    )


def _adc_qcos_sql(m: int, ksub: int) -> str:
    """The ADC cosine of a (code row x query-LUT) pair: the m chosen
    entries summed as exact decimals (order-independent -> engine-
    identical), normalized by the exact query norm and the stored
    reconstructed norm; degenerate norms pin to the -2.0 sentinel
    (below any cosine) instead of dividing by zero."""
    adc = (
        f"CAST(aggregate(sequence(0, {m - 1}), CAST(0 AS DECIMAL(38,15)), "
        f"(acc, j) -> CAST(acc + element_at(__lut, j * {ksub} + "
        "CAST(element_at(pq_codes, j + 1) AS INT) + 1) AS DECIMAL(38,15))) "
        "AS DOUBLE)"
    )
    return (
        f"CASE WHEN pqnorm > 0.0D AND __qn > 0.0D "
        f"THEN {adc} / (__qn * sqrt(pqnorm)) ELSE -2.0D END"
    )


def _exact_rerank(
    cands: DataFrame,
    corpus: DataFrame,
    q_raw: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Decimal-exact cosine re-rank of the bounded candidate sliver ->
    ``(qid, id, qcos, cos, rk)``."""
    cv = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    qv_raw = q_raw.select("qid", F.col("qe").alias("qe2"))
    cos = _cos_exact("qe2", "e")
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


def pq_topk(
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    margin: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors via ADC-scored PQ candidates + exact
    re-rank.  Returns ``(qid, id, qcos, cos, rk)``.

    Phase 1 (ADC): each query builds its m*ksub lookup table once —
    exact-decimal dots of its sub-vectors against the literal codebook
    coefficients — broadcast with the query set; every corpus CODE then
    scores with m table lookups summed as exact decimals (order-
    independent -> engine-identical), normalized by the stored
    reconstructed norm.  The scan reads only the code table: at 100 TB
    that is the ~64x-smaller column, the corpus never shuffles, and
    per-pair work is m lookups, not dim multiplies.  Phase 2 re-ranks
    the ``margin*k`` sliver per query with the decimal-exact cosine on
    the raw vectors (bounded join: margin*k*|queries| rows).

    Like IVF,SQ8: ``codes`` and ``corpus`` MUST come from the same
    snapshot built with these ``codebooks`` — a stale code table
    silently degrades recall (candidates drop at the inner join)."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    qid_col = query_id_col or id_col

    q2 = _query_lut(queries, codebooks, qid_col, vec_col)
    scored = (
        # LUT + norm only in the scan broadcast — the raw query vectors
        # ride along only into the bounded re-rank join
        codes.join(
            F.broadcast(q2.select("qid", "__lut", "__qn")),
            F.col("id") != F.col("qid"),
        )
        .selectExpr("qid", "id", f"{_adc_qcos_sql(m, ksub)} AS qcos")
    )
    w_q = Window.partitionBy("qid").orderBy(F.col("qcos").desc(), F.col("id"))
    cands = scored.withColumn("__rkq", F.row_number().over(w_q)).filter(
        F.col("__rkq") <= margin * k
    )
    return _exact_rerank(
        cands, corpus, q2.select("qid", "qe"), k, id_col, vec_col
    )


def ivf_pq_probe(
    assignments: DataFrame,
    cent: DataFrame,
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 2,
    margin: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """The canonical composed index — "IVF,PQ" (FAISS's workhorse):
    STORED cell assignments prune the corpus to ``n_probe`` cells per
    query, STORED 8-byte PQ codes ADC-score the surviving candidates
    (8 table lookups per pair), and only the ``margin * k`` best touch
    the raw vectors for the decimal-exact re-rank.  Returns
    ``(qid, id, qcos, cos, rk)``.

    vs :func:`..similarity.ivf_sq_probe` (IVF,SQ8): same candidate
    pruning, but the candidate fetch reads ~64x-smaller codes instead
    of 4-8x-smaller ones and scores with m lookups instead of dim
    integer multiplies — the configuration for corpora whose codes
    must stay executor-resident at 100 TB.  Recall trades accordingly
    (ADC is coarser than int8 dot; ``margin`` is the dial), and the
    audit (``ann_recall``) measures both side by side.

    **Snapshot contract** (same as ivf_sq_probe): ``assignments``,
    ``codes``, and ``corpus`` MUST come from the same corpus snapshot
    built with these ``codebooks`` — the scoring inner-joins
    assignments to codes on ``id``, so stale codes silently drop
    candidates and recall degrades with no error.  Refresh the
    artifacts together: per arriving shard, :func:`..similarity.
    ivf_append` + :func:`pq_encode` with the SAME stored quantizers.
    """
    from .similarity import _nearest_cells

    m = len(codebooks)
    ksub = len(codebooks[0])
    qid = query_id_col or id_col

    q2 = _query_lut(queries, codebooks, qid, vec_col)
    probes = _nearest_cells(
        q2.select("qid", "qe"), "qid", "qe", n_probe, cent
    ).select("qid", "cell")
    cand = (
        assignments.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("qid"))
        .select("qid", "id")
        .dropDuplicates(["qid", "id"])
    )
    scored = (
        cand.join(codes.select("id", "pq_codes", "pqnorm"), "id")
        .join(F.broadcast(q2.select("qid", "__lut", "__qn")), "qid")
        .selectExpr("qid", "id", f"{_adc_qcos_sql(m, ksub)} AS qcos")
    )
    w_q = Window.partitionBy("qid").orderBy(F.col("qcos").desc(), F.col("id"))
    cands = scored.withColumn("__rkq", F.row_number().over(w_q)).filter(
        F.col("__rkq") <= margin * k
    )
    return _exact_rerank(
        cands, corpus, q2.select("qid", "qe"), k, id_col, vec_col
    )


def _cell_centroid_expr(cent_rows: list[tuple[int, list[float]]]) -> str:
    """SQL expression mapping the in-frame ``cell`` id to its centroid
    as a literal double array — ``element_at(map(...), cell)``, bounded
    by n_centroids (the quantizer is driver state by contract)."""
    entries = ", ".join(
        f"{int(cid)}, {_arr_lit(ce)}"
        for cid, ce in cent_rows
    )
    return f"element_at(map({entries}), cell)"


def _recon_expr(codebooks: list[list[list[float]]], codes_col: str = "__codes") -> str:
    """SQL expression reconstructing the PQ decode of the in-frame code
    ARRAY column: concat of the m chosen sub-vectors, each an
    ``element_at`` over the literal codebook."""
    subs = []
    for j, book in enumerate(codebooks):
        arrays = ", ".join(_arr_lit(cv) for cv in book)
        subs.append(
            f"element_at(array({arrays}), "
            f"CAST(element_at({codes_col}, {j + 1}) AS INT) + 1)"
        )
    return "concat(" + ", ".join(subs) + ")"


def ivf_pq_residual_encode(
    assignments: DataFrame,
    cent: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]] | None = None,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """The RESIDUAL IVF,PQ code table — FAISS's actual IVF,PQ encoding
    (Jégou et al. 2011 §IV): each vector is PQ-encoded as its residual
    ``x - centroid(cell(x))`` rather than raw, because residuals have a
    fraction of the raw variance (the coarse quantizer absorbs the
    corpus's macro-structure), so the same 8-byte budget spends its
    codewords on the fine structure that actually separates neighbors
    within a cell.  Returns ``((id, cell, pq_codes, pqnorm), books)``
    where ``pqnorm`` is the squared norm of the RECONSTRUCTION
    ``centroid + decode(codes)`` (exact decimal fold — what the ADC
    cosine normalizes by) and ``books`` are the residual codebooks
    (seeded from the first-ksub residuals when not supplied — pass
    stored books for the production rebuild path, as
    :func:`pq_encode`).

    Keeping ``cell`` IN the code table makes it the whole serving
    index: bucketed by cell, a probe scans only the probed cells and
    reads codes from the same rows — no assignments join at query time.

    Scale shape: one id-keyed join (corpus x assignments — co-partition
    or bucket both by id at 100 TB), then everything is map-side: the
    residual subtraction against the literal centroid map, the
    integer-exact sub-space argmin, and the reconstruction-norm fold.
    """
    c = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("e"))
    cent_rows = sorted(
        ((int(r["cid"]), [float(x) for x in r["ce"]])
         for r in cent.select("cid", "ce").collect()),
        key=lambda t: t[0],
    )
    ce_expr = _cell_centroid_expr(cent_rows)
    res = (
        c.join(assignments.select("id", "cell"), "id")
        .selectExpr(
            "id", "cell",
            f"zip_with(e, {ce_expr}, (x, c) -> x - c) AS res",
        )
    )
    if codebooks is None:
        # seed from residuals of rows that are NOT the coarse centroids:
        # with the seed quantizer, the first-ksub rows ARE the centroids
        # and their residuals are identically zero — useless codewords
        seed_src = res.filter(
            ~F.col("id").isin([cid for cid, _ in cent_rows])
        )
        codebooks = pq_seed_codebooks(seed_src, id_col="id", vec_col="res",
                                      m=m, ksub=ksub)
    coded = _pq_assign(
        res.select("id", F.col("res").alias("e"), "cell"), codebooks,
        with_norm=False, keep=("cell",),
    )
    # |centroid + decode(codes)|^2, decimal-exact: double addition per
    # coordinate first (engine-identical), then the exact square fold
    recon_norm = _dec_norm2(
        f"zip_with({ce_expr}, {_recon_expr(codebooks)}, (c, r) -> c + r)"
    )
    out = coded.selectExpr(
        "id", "cell", "__codes AS pq_codes",
        f"CAST({recon_norm} AS DOUBLE) AS pqnorm",
        # non-deterministic barrier (see _pq_assign): keeps downstream
        # filters from re-inlining the argmin fold per reference
        "rand() AS __nd",
    ).select("id", "cell", "pq_codes", "pqnorm")
    return out, codebooks


def ivf_pq_residual_probe(
    cent: DataFrame,
    rcodes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 2,
    margin: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Probe the residual IVF,PQ index: ``cos(q, x̂)`` with
    ``x̂ = centroid(cell) + decode(codes)`` decomposes as
    ``(<q, centroid> + Σ_j LUT[j][code_j]) / (|q|·|x̂|)`` — the
    centroid dot is computed once per (query, probed cell) on the
    broadcast-sized probe set (exact decimal), the LUT is the standard
    per-query ADC table built against the RESIDUAL codebooks, and
    ``|x̂|`` is the stored reconstruction norm.  Candidates cut to
    ``margin*k`` on the ADC cosine; the sliver re-ranks decimal-exact
    on raw vectors.  Returns ``(qid, id, qcos, cos, rk)``.

    Same candidate-pruning/scan shape as :func:`ivf_pq_probe` (cells
    prune, 8-byte codes score), but the codes spend their precision on
    within-cell structure — the recall-per-byte upgrade the residual
    encoding exists for (measured side by side in ``ann_recall``).

    Snapshot contract: ``rcodes`` must be built by
    :func:`ivf_pq_residual_encode` against this ``cent`` and these
    ``codebooks``."""
    from .similarity import _nearest_cells

    mlen = len(codebooks)
    ksub = len(codebooks[0])
    qid = query_id_col or id_col

    q2 = _query_lut(queries, codebooks, qid, vec_col)
    cent_rows = sorted(
        ((int(r["cid"]), [float(x) for x in r["ce"]])
         for r in cent.select("cid", "ce").collect()),
        key=lambda t: t[0],
    )
    ce_expr = _cell_centroid_expr(cent_rows)
    qcdot = _dec_fold(
        f"zip_with(qe, {ce_expr}, (x, c) -> CAST(x * c AS DECIMAL(30,15)))"
    )
    probes = (
        _nearest_cells(q2.select("qid", "qe"), "qid", "qe", n_probe, cent)
        .selectExpr("qid", "cell", f"{qcdot} AS __qcdot")
    )
    adc = (
        f"CAST(aggregate(sequence(0, {mlen - 1}), __qcdot, "
        f"(acc, j) -> CAST(acc + element_at(__lut, j * {ksub} + "
        "CAST(element_at(pq_codes, j + 1) AS INT) + 1) AS DECIMAL(38,15))) "
        "AS DOUBLE)"
    )
    qcos = (
        f"CASE WHEN pqnorm > 0.0D AND __qn > 0.0D "
        f"THEN {adc} / (__qn * sqrt(pqnorm)) ELSE -2.0D END"
    )
    scored = (
        rcodes.join(F.broadcast(probes), "cell")
        .filter(F.col("id") != F.col("qid"))
        .join(F.broadcast(q2.select("qid", "__lut", "__qn")), "qid")
        .selectExpr("qid", "id", f"{qcos} AS qcos")
    )
    w_q = Window.partitionBy("qid").orderBy(F.col("qcos").desc(), F.col("id"))
    cands = scored.withColumn("__rkq", F.row_number().over(w_q)).filter(
        F.col("__rkq") <= margin * k
    )
    return _exact_rerank(
        cands, corpus, q2.select("qid", "qe"), k, id_col, vec_col
    )
