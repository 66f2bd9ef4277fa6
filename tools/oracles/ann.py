"""ANN/similarity family oracle SQL (exact cosine, LSH, IVF, SQ8,
PQ + trained variants, semantic dedup, the recall-report composition).

Moved verbatim from __spark_entry__.py (VERDICT r8 item 9); strings
are byte-identical to the pre-split registry (snapshot-verified)."""

from tools.oracles.params import (
    _EMB_DIM,
    _IVF_CENTROIDS,
    _IVF_PROBE,
    _IVF_TRAIN_ITERS,
    _NEARDUP_PLANES,
    _NEARDUP_TABLES,
    _PQ_KSUB,
    _PQ_M,
    _PQ_MARGIN,
    _PQ_TRAIN_ITERS,
    _SERVING_PROBE_BITS,
)

_EMBEDDING_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10
), prod AS (
  SELECT q.qid, e.vec_id,
         unnest(q.qe)::DOUBLE AS qv, unnest(e.embedding)::DOUBLE AS ev
  FROM q JOIN embeddings e ON e.vec_id <> q.qid
), dots AS (
  SELECT qid, vec_id,
         CAST(SUM(CAST(qv * ev AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(qv * qv AS DECIMAL(30,15))) AS DOUBLE) AS qq,
         CAST(SUM(CAST(ev * ev AS DECIMAL(30,15))) AS DOUBLE) AS ee
  FROM prod GROUP BY qid, vec_id
), scored AS (
  SELECT qid, vec_id, dot / (sqrt(qq) * sqrt(ee)) AS cos,
         row_number() OVER (PARTITION BY qid ORDER BY dot / (sqrt(qq) * sqrt(ee)) DESC, vec_id) AS rk
  FROM dots
)
SELECT qid, vec_id, ROUND(cos, 6) AS cos, CAST(rk AS INT) AS rk
FROM scored WHERE rk <= 5
"""

def _sq8_ann_sql(k: int = 5, margin: int = 4) -> str:
    """Closed-form oracle for the int8-quantized ANN path: replicate the
    half-up quantization (floor(x/s + 0.5) — round() tie behavior
    differs between engines, floor(x+0.5) does not), integer candidate
    scoring, and decimal-exact re-rank."""
    return f"""
WITH qbase AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
), qz0 AS (
  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS amax FROM qbase
), qz1 AS (
  SELECT vec_id, e, CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS qscale FROM qz0
), qz AS (
  SELECT vec_id, e,
         list_transform(e, x -> CAST(floor(x / qscale + 0.5) AS BIGINT)) AS qv
  FROM qz1
), qq AS (
  SELECT vec_id AS qid, e AS qe, qv AS qu FROM qz WHERE vec_id < 10
), iprod AS (
  SELECT qq.qid, c.vec_id AS id, unnest(qq.qu) AS a, unnest(c.qv) AS b
  FROM qq JOIN qz c ON c.vec_id <> qq.qid
), qdots AS (
  SELECT qid, id,
         CAST(SUM(a * b) AS DOUBLE)
           / sqrt(CAST(SUM(a * a) * SUM(b * b) AS DOUBLE)) AS qcos
  FROM iprod GROUP BY qid, id
), cands AS (
  SELECT qid, id, qcos,
         row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, id) AS rkq
  FROM qdots
), cprod AS (
  SELECT cd.qid, cd.id, cd.qcos,
         unnest(qq.qe) AS qv_el, unnest(b2.e) AS ev_el
  FROM cands cd
  JOIN qq ON qq.qid = cd.qid
  JOIN qbase b2 ON b2.vec_id = cd.id
  WHERE cd.rkq <= {margin * k}
), cdots AS (
  SELECT qid, id, any_value(qcos) AS qcos,
         CAST(SUM(CAST(qv_el * ev_el AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(qv_el * qv_el AS DECIMAL(30,15))) AS DOUBLE) AS nq,
         CAST(SUM(CAST(ev_el * ev_el AS DECIMAL(30,15))) AS DOUBLE) AS ne
  FROM cprod GROUP BY qid, id
), qscored AS (
  SELECT qid, id, qcos, dot / (sqrt(nq) * sqrt(ne)) AS cos,
         row_number() OVER (
           PARTITION BY qid ORDER BY dot / (sqrt(nq) * sqrt(ne)) DESC, id) AS rk
  FROM cdots
)
SELECT qid, id AS vec_id, ROUND(qcos, 6) AS qcos, ROUND(cos, 6) AS cos,
       CAST(rk AS INT) AS rk
FROM qscored WHERE rk <= {k}
"""

_QUANTIZED_ANN_SQL = _sq8_ann_sql()

def _pq_cb_sql(trained_iters: int | None = None) -> str:
    """CTE chain ``seedrows ... cb`` producing the PQ codebook relation
    ``(code, j, si, cv)``.  Seed form: first-ksub corpus rows sliced
    into subspaces (pq_seed_codebooks).  Trained form: the seed
    followed by ``trained_iters`` integer-exact Lloyd rounds — the same
    arithmetic as ``operators/pq.pq_train`` (1e-6-quantized BIGINT
    argmin assignment, ``sum(floor(x*1e6+0.5))`` coordinate updates,
    two correctly-rounded IEEE divisions per coordinate, empty cells
    keep their previous centroid), verified bit-identical to the books
    Spark collects."""
    dsub = _EMB_DIM // _PQ_M
    seed_inner = f"""  SELECT code,
         CAST(floor((pos - 1) / {dsub}) AS INT) AS j,
         CAST((pos - 1) % {dsub} AS INT) AS si,
         cv
  FROM (SELECT code, unnest(embedding)::DOUBLE AS cv,
               unnest(range(1, {_EMB_DIM} + 1)) AS pos
        FROM seedrows)"""
    head = f"""seedrows AS (
  SELECT vec_id, embedding,
         CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS code
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_PQ_KSUB})
), cb AS (
{seed_inner}
)"""
    if trained_iters is None:
        return head
    parts = [f"""seedrows AS (
  SELECT vec_id, embedding,
         CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS code
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {_PQ_KSUB})
), cb_t0 AS (
{seed_inner}
), tcoords AS (
  SELECT vec_id AS id,
         CAST(floor((pos - 1) / {dsub}) AS INT) AS j,
         CAST((pos - 1) % {dsub} AS INT) AS si,
         CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS vq
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
               unnest(range(1, {_EMB_DIM} + 1)) AS pos
        FROM embeddings)
)"""]
    for t in range(trained_iters):
        parts.append(f""", cbq_t{t} AS (
  SELECT code, j, si, CAST(floor(cv * 1000000.0 + 0.5) AS BIGINT) AS cq
  FROM cb_t{t}
), cbn2_t{t} AS (
  SELECT j, code, SUM(cq * cq) AS n2i FROM cbq_t{t} GROUP BY j, code
), sdots_t{t} AS (
  SELECT c.id, c.j, b.code, SUM(c.vq * b.cq * 2) AS d2
  FROM tcoords c JOIN cbq_t{t} b ON b.j = c.j AND b.si = c.si
  GROUP BY c.id, c.j, b.code
), asg_t{t} AS (
  SELECT id, j, code FROM (
    SELECT s.id, s.j, s.code,
           row_number() OVER (PARTITION BY s.id, s.j
                              ORDER BY (s.d2 - n.n2i) DESC, s.code) AS brk
    FROM sdots_t{t} s JOIN cbn2_t{t} n ON n.j = s.j AND n.code = s.code
  ) WHERE brk = 1
), upd_t{t} AS (
  SELECT a.j, a.code, c.si, COUNT(*) AS n, SUM(c.vq) AS s
  FROM asg_t{t} a JOIN tcoords c ON c.id = a.id AND c.j = a.j
  GROUP BY a.j, a.code, c.si
), cb_t{t + 1} AS (
  SELECT p.code, p.j, p.si,
         CASE WHEN u.n IS NOT NULL
              THEN CAST(u.s AS DOUBLE) / CAST(u.n AS DOUBLE) / 1000000.0
              ELSE p.cv END AS cv
  FROM cb_t{t} p
  LEFT JOIN upd_t{t} u ON u.j = p.j AND u.code = p.code AND u.si = p.si
)""")
    parts.append(
        f", cb AS (\n  SELECT code, j, si, cv FROM cb_t{trained_iters}\n)"
    )
    return "".join(parts)

def _pq_ann_sql(
    k: int = 5, margin: int | None = None, trained_iters: int | None = None
) -> str:
    """Closed-form oracle for the PQ/ADC path: re-derive the seed
    codebooks from the parquet (first-ksub rows, subspace slices),
    encode every corpus vector by the INTEGER-exact L2 argmin contract
    (coordinates quantized at 1e-6, maximize sum 2*q(c)*q(x) - q(c)^2
    in BIGINT; |x|^2 is constant per subspace), score query-corpus
    pairs by the decimal-exact LUT sum over the 8 chosen codes, cut to
    margin*k on the ADC cosine, and re-rank the sliver decimal-exact on
    the raw vectors — the same arithmetic the Spark operator runs."""
    dsub = _EMB_DIM // _PQ_M
    margin = _PQ_MARGIN if margin is None else margin
    return f"""
WITH {_pq_cb_sql(trained_iters)}, cbn AS (
  SELECT j, code, SUM(CAST(cv * cv AS DECIMAL(30,15))) AS n2
  FROM cb GROUP BY j, code
), cbq AS (
  SELECT code, j, si, CAST(floor(cv * 1000000.0 + 0.5) AS BIGINT) AS cq
  FROM cb
), cbn2 AS (
  SELECT j, code, SUM(cq * cq) AS n2i FROM cbq GROUP BY j, code
), coords AS (
  SELECT vec_id AS id,
         CAST(floor((pos - 1) / {dsub}) AS INT) AS j,
         CAST((pos - 1) % {dsub} AS INT) AS si,
         v
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
               unnest(range(1, {_EMB_DIM} + 1)) AS pos
        FROM embeddings)
), sdots AS (
  SELECT c.id, c.j, b.code,
         SUM(CAST(floor(c.v * 1000000.0 + 0.5) AS BIGINT) * b.cq * 2) AS d2
  FROM coords c JOIN cbq b ON b.j = c.j AND b.si = c.si
  GROUP BY c.id, c.j, b.code
), best AS (
  SELECT s.id, s.j, s.code,
         row_number() OVER (PARTITION BY s.id, s.j
                            ORDER BY (s.d2 - n.n2i) DESC, s.code) AS brk
  FROM sdots s JOIN cbn2 n ON n.j = s.j AND n.code = s.code
), codes AS (
  SELECT id, j, code FROM best WHERE brk = 1
), pqn AS (
  SELECT c.id, CAST(SUM(n.n2) AS DOUBLE) AS pqnorm
  FROM codes c JOIN cbn n ON n.j = c.j AND n.code = c.code
  GROUP BY c.id
), qlut AS (
  SELECT c.id AS qid, b.j, b.code,
         SUM(CAST(c.v * b.cv AS DECIMAL(30,15))) AS lut
  FROM coords c JOIN cb b ON b.j = c.j AND b.si = c.si
  WHERE c.id < 10
  GROUP BY c.id, b.j, b.code
), qnorm AS (
  SELECT id AS qid,
         sqrt(CAST(SUM(CAST(v * v AS DECIMAL(30,15))) AS DOUBLE)) AS qn
  FROM coords WHERE id < 10 GROUP BY id
), adc AS (
  SELECT l.qid, c.id, CAST(SUM(l.lut) AS DOUBLE) AS adc
  FROM codes c
  JOIN qlut l ON l.j = c.j AND l.code = c.code
  WHERE c.id <> l.qid
  GROUP BY l.qid, c.id
), qscored AS (
  SELECT a.qid, a.id,
         CASE WHEN p.pqnorm > 0 AND q.qn > 0
              THEN a.adc / (q.qn * sqrt(p.pqnorm)) ELSE -2.0 END AS qcos
  FROM adc a JOIN pqn p ON p.id = a.id JOIN qnorm q ON q.qid = a.qid
), cands AS (
  SELECT qid, id, qcos,
         row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, id) AS crk
  FROM qscored
), sliver AS (
  SELECT qid, id, qcos FROM cands WHERE crk <= {margin * k}
), rprod AS (
  SELECT s.qid, s.id, s.qcos,
         unnest(eq.embedding)::DOUBLE AS qv2, unnest(ec.embedding)::DOUBLE AS cv2
  FROM sliver s
  JOIN embeddings eq ON eq.vec_id = s.qid
  JOIN embeddings ec ON ec.vec_id = s.id
), rdots AS (
  SELECT qid, id, ANY_VALUE(qcos) AS qcos,
         CAST(SUM(CAST(qv2 * cv2 AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(qv2 * qv2 AS DECIMAL(30,15))) AS DOUBLE) AS qq,
         CAST(SUM(CAST(cv2 * cv2 AS DECIMAL(30,15))) AS DOUBLE) AS cc
  FROM rprod GROUP BY qid, id
), finals AS (
  SELECT qid, id, qcos, dot / (sqrt(qq) * sqrt(cc)) AS cos,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, id) AS rk
  FROM rdots
)
SELECT qid, id, ROUND(qcos, 6) AS qcos, ROUND(cos, 6) AS cos,
       CAST(rk AS INT) AS rk
FROM finals WHERE rk <= {k}
"""

def _ivf_pq_sql(
    k: int = 5, n_probe: int = 2, margin: int | None = None,
    trained_iters: int | None = None,
) -> str:
    """Oracle for the IVF,PQ composition: the _ivf_ann_sql candidate
    CTEs (seed centroids -> decimal-exact assignment -> probed cells)
    feed the _pq_ann_sql scoring CTEs (seed codebooks -> integer-exact
    encode -> decimal LUT/ADC on the candidate pairs only -> margin*k
    cut -> decimal-exact re-rank)."""
    dsub = _EMB_DIM // _PQ_M
    margin = _PQ_MARGIN if margin is None else margin
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {_IVF_CENTROIDS}
), cp AS (
  SELECT e.vec_id AS id, c.cid,
         unnest(e.embedding)::DOUBLE AS av, unnest(c.ce)::DOUBLE AS bv
  FROM embeddings e CROSS JOIN cent c
), cd AS (
  SELECT id, cid,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM cp GROUP BY id, cid
), cranked AS (
  SELECT id, cid, row_number() OVER (
    PARTITION BY id ORDER BY dot / (sqrt(aa) * sqrt(bb)) DESC, cid) AS rk
  FROM cd
), assigned AS (
  SELECT id, cid AS cell FROM cranked WHERE rk = 1
), cprobes AS (
  SELECT id AS qid, cid AS cell FROM cranked WHERE id < 10 AND rk <= {n_probe}
), cand AS (
  SELECT DISTINCT p.qid, a.id
  FROM assigned a JOIN cprobes p ON a.cell = p.cell AND a.id != p.qid
), {_pq_cb_sql(trained_iters)}, cbn AS (
  SELECT j, code, SUM(CAST(cv * cv AS DECIMAL(30,15))) AS n2
  FROM cb GROUP BY j, code
), cbq AS (
  SELECT code, j, si, CAST(floor(cv * 1000000.0 + 0.5) AS BIGINT) AS cq
  FROM cb
), cbn2 AS (
  SELECT j, code, SUM(cq * cq) AS n2i FROM cbq GROUP BY j, code
), coords AS (
  SELECT vec_id AS id,
         CAST(floor((pos - 1) / {dsub}) AS INT) AS j,
         CAST((pos - 1) % {dsub} AS INT) AS si,
         v
  FROM (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
               unnest(range(1, {_EMB_DIM} + 1)) AS pos
        FROM embeddings)
), sdots AS (
  SELECT c.id, c.j, b.code,
         SUM(CAST(floor(c.v * 1000000.0 + 0.5) AS BIGINT) * b.cq * 2) AS d2
  FROM coords c JOIN cbq b ON b.j = c.j AND b.si = c.si
  GROUP BY c.id, c.j, b.code
), best AS (
  SELECT s.id, s.j, s.code,
         row_number() OVER (PARTITION BY s.id, s.j
                            ORDER BY (s.d2 - n.n2i) DESC, s.code) AS brk
  FROM sdots s JOIN cbn2 n ON n.j = s.j AND n.code = s.code
), codes AS (
  SELECT id, j, code FROM best WHERE brk = 1
), pqn AS (
  SELECT c.id, CAST(SUM(n.n2) AS DOUBLE) AS pqnorm
  FROM codes c JOIN cbn n ON n.j = c.j AND n.code = c.code
  GROUP BY c.id
), qlut AS (
  SELECT c.id AS qid, b.j, b.code,
         SUM(CAST(c.v * b.cv AS DECIMAL(30,15))) AS lut
  FROM coords c JOIN cb b ON b.j = c.j AND b.si = c.si
  WHERE c.id < 10
  GROUP BY c.id, b.j, b.code
), qnorm AS (
  SELECT id AS qid,
         sqrt(CAST(SUM(CAST(v * v AS DECIMAL(30,15))) AS DOUBLE)) AS qn
  FROM coords WHERE id < 10 GROUP BY id
), adc AS (
  SELECT ca.qid, ca.id, CAST(SUM(l.lut) AS DOUBLE) AS adc
  FROM cand ca
  JOIN codes c ON c.id = ca.id
  JOIN qlut l ON l.qid = ca.qid AND l.j = c.j AND l.code = c.code
  GROUP BY ca.qid, ca.id
), qscored AS (
  SELECT a.qid, a.id,
         CASE WHEN p.pqnorm > 0 AND q.qn > 0
              THEN a.adc / (q.qn * sqrt(p.pqnorm)) ELSE -2.0 END AS qcos
  FROM adc a JOIN pqn p ON p.id = a.id JOIN qnorm q ON q.qid = a.qid
), cands AS (
  SELECT qid, id, qcos,
         row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, id) AS crk
  FROM qscored
), sliver AS (
  SELECT qid, id, qcos FROM cands WHERE crk <= {margin * k}
), rprod AS (
  SELECT s.qid, s.id, s.qcos,
         unnest(eq.embedding)::DOUBLE AS qv2, unnest(ec.embedding)::DOUBLE AS cv2
  FROM sliver s
  JOIN embeddings eq ON eq.vec_id = s.qid
  JOIN embeddings ec ON ec.vec_id = s.id
), rdots AS (
  SELECT qid, id, ANY_VALUE(qcos) AS qcos,
         CAST(SUM(CAST(qv2 * cv2 AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(qv2 * qv2 AS DECIMAL(30,15))) AS DOUBLE) AS qq,
         CAST(SUM(CAST(cv2 * cv2 AS DECIMAL(30,15))) AS DOUBLE) AS cc
  FROM rprod GROUP BY qid, id
), finals AS (
  SELECT qid, id, qcos, dot / (sqrt(qq) * sqrt(cc)) AS cos,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, id) AS rk
  FROM rdots
)
SELECT qid, id, ROUND(qcos, 6) AS qcos, ROUND(cos, 6) AS cos,
       CAST(rk AS INT) AS rk
FROM finals WHERE rk <= {k}
"""

def _plane_sig_expr(table: int) -> str:
    """Bucket-signature SQL for one LSH table: the deterministic
    Rademacher plane signs (same md5 parity as the Spark side) inlined as
    literal +-1 coefficients; the signed sums chain left-to-right exactly
    like F.aggregate."""
    from python_ctd_spark.operators.similarity import _plane_sign

    bits = []
    for p in range(_NEARDUP_PLANES):
        terms = "0.0"
        for d in range(_EMB_DIM):
            s = _plane_sign(table * 1000 + p, d)
            terms = f"({terms} + (embedding[{d + 1}]::DOUBLE * {float(s)!r}))"
        bits.append(f"(CASE WHEN {terms} >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)

def _neardup_sql(threshold: float = 0.45) -> str:
    sig_union = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {t} AS tbl, {_plane_sig_expr(t)} AS bkt FROM embeddings"
        for t in range(_NEARDUP_TABLES)
    )
    return f"""
WITH sigs AS (
{sig_union}
), cand AS (
  SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
  FROM sigs l JOIN sigs r
    ON l.tbl = r.tbl AND l.bkt = r.bkt AND l.vec_id < r.vec_id
), prod AS (
  SELECT c.id_a, c.id_b,
         unnest(ea.embedding)::DOUBLE AS av, unnest(eb.embedding)::DOUBLE AS bv
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
), dots AS (
  SELECT id_a, id_b,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM prod GROUP BY id_a, id_b
)
SELECT id_a, id_b, ROUND(dot / (sqrt(aa) * sqrt(bb)), 6) AS cos
FROM dots WHERE dot / (sqrt(aa) * sqrt(bb)) >= {threshold}
"""

def _lsh_ann_sql(k: int = 5, masks: list[int] | None = None) -> str:
    sig_union = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, {t} AS tbl, {_plane_sig_expr(t)} AS bkt FROM embeddings"
        for t in range(_NEARDUP_TABLES)
    )
    if masks:
        # multiprobe: each query probes its bucket plus every Hamming-
        # neighbor bucket given by the XOR masks (same list the Spark
        # operator derives from probe_masks())
        probe_list = ", ".join(f"xor(bkt, {m})" for m in masks)
        q_cte = (
            f"  SELECT vec_id AS qid, tbl, unnest([{probe_list}]) AS bkt\n"
            "  FROM sigs WHERE vec_id < 10"
        )
    else:
        q_cte = "  SELECT vec_id AS qid, tbl, bkt FROM sigs WHERE vec_id < 10"
    return f"""
WITH sigs AS (
{sig_union}
), q AS (
{q_cte}
), cand AS (
  SELECT DISTINCT q.qid, s.vec_id AS id
  FROM sigs s JOIN q ON s.tbl = q.tbl AND s.bkt = q.bkt AND s.vec_id != q.qid
), prod AS (
  SELECT c.qid, c.id,
         unnest(eq.embedding)::DOUBLE AS qv, unnest(ec.embedding)::DOUBLE AS cv
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings ec ON ec.vec_id = c.id
), dots AS (
  SELECT qid, id,
         CAST(SUM(CAST(qv * cv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(qv * qv AS DECIMAL(30,15))) AS DOUBLE) AS qq,
         CAST(SUM(CAST(cv * cv AS DECIMAL(30,15))) AS DOUBLE) AS cc
  FROM prod GROUP BY qid, id
), scored AS (
  SELECT qid, id, dot / (sqrt(qq) * sqrt(cc)) AS cos,
         row_number() OVER (PARTITION BY qid ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, id) AS rk
  FROM dots
)
SELECT qid, id, ROUND(cos, 6) AS cos, CAST(rk AS INT) AS rk
FROM scored WHERE rk <= {k}
"""

def _ann_index_probe_sql() -> str:
    from python_ctd_spark.operators.similarity import probe_masks as _pm

    return _lsh_ann_sql(5, _pm(_NEARDUP_PLANES, _SERVING_PROBE_BITS))

def _ivf_ann_sql(k: int = 5, n_probe: int | None = None) -> str:
    n_probe = _IVF_PROBE if n_probe is None else n_probe
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {_IVF_CENTROIDS}
), cp AS (
  SELECT e.vec_id AS id, c.cid,
         unnest(e.embedding)::DOUBLE AS av, unnest(c.ce)::DOUBLE AS bv
  FROM embeddings e CROSS JOIN cent c
), cd AS (
  SELECT id, cid,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM cp GROUP BY id, cid
), ranked AS (
  SELECT id, cid, row_number() OVER (
    PARTITION BY id ORDER BY dot / (sqrt(aa) * sqrt(bb)) DESC, cid) AS rk
  FROM cd
), assigned AS (
  SELECT id, cid AS cell FROM ranked WHERE rk = 1
), probes AS (
  SELECT id AS qid, cid AS cell FROM ranked WHERE id < 10 AND rk <= {n_probe}
), cand AS (
  SELECT DISTINCT p.qid, a.id
  FROM assigned a JOIN probes p ON a.cell = p.cell AND a.id != p.qid
), prod AS (
  SELECT c.qid, c.id,
         unnest(eq.embedding)::DOUBLE AS qv, unnest(ec.embedding)::DOUBLE AS cv
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings ec ON ec.vec_id = c.id
), dots AS (
  SELECT qid, id,
         CAST(SUM(CAST(qv * cv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(qv * qv AS DECIMAL(30,15))) AS DOUBLE) AS qq,
         CAST(SUM(CAST(cv * cv AS DECIMAL(30,15))) AS DOUBLE) AS cc
  FROM prod GROUP BY qid, id
), scored AS (
  SELECT qid, id, dot / (sqrt(qq) * sqrt(cc)) AS cos,
         row_number() OVER (PARTITION BY qid ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, id) AS rk
  FROM dots
)
SELECT qid, id, ROUND(cos, 6) AS cos, CAST(rk AS INT) AS rk
FROM scored WHERE rk <= {k}
"""

def _ivf_sq_sql(k: int = 5, n_probe: int = 2, margin: int = 4) -> str:
    """Oracle for the IVF,SQ8 composition: the _ivf_ann_sql candidate
    CTEs (seed centroids -> assignment -> probed cells) feed the
    _sq8_ann_sql scoring CTEs (half-up int8 quantization -> BIGINT dot
    cut -> decimal-exact re-rank of the margin*k sliver)."""
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {_IVF_CENTROIDS}
), cp AS (
  SELECT e.vec_id AS id, c.cid,
         unnest(e.embedding)::DOUBLE AS av, unnest(c.ce)::DOUBLE AS bv
  FROM embeddings e CROSS JOIN cent c
), cd AS (
  SELECT id, cid,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM cp GROUP BY id, cid
), ranked AS (
  SELECT id, cid, row_number() OVER (
    PARTITION BY id ORDER BY dot / (sqrt(aa) * sqrt(bb)) DESC, cid) AS rk
  FROM cd
), assigned AS (
  SELECT id, cid AS cell FROM ranked WHERE rk = 1
), probes AS (
  SELECT id AS qid, cid AS cell FROM ranked WHERE id < 10 AND rk <= {n_probe}
), cand AS (
  SELECT DISTINCT p.qid, a.id
  FROM assigned a JOIN probes p ON a.cell = p.cell AND a.id != p.qid
), sbase AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
), sqz0 AS (
  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS amax FROM sbase
), sqz1 AS (
  SELECT vec_id, e, CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS qscale FROM sqz0
), sqz AS (
  SELECT vec_id, e,
         list_transform(e, x -> CAST(floor(x / qscale + 0.5) AS BIGINT)) AS qv
  FROM sqz1
), iprod AS (
  SELECT cnd.qid, cnd.id, unnest(qc.qv) AS a, unnest(cc.qv) AS b
  FROM cand cnd
  JOIN sqz qc ON qc.vec_id = cnd.qid
  JOIN sqz cc ON cc.vec_id = cnd.id
), qdots AS (
  SELECT qid, id,
         CAST(SUM(a * b) AS DOUBLE)
           / sqrt(CAST(SUM(a * a) * SUM(b * b) AS DOUBLE)) AS qcos
  FROM iprod GROUP BY qid, id
), sliver AS (
  SELECT qid, id, qcos,
         row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, id) AS rkq
  FROM qdots
), cprod AS (
  SELECT s.qid, s.id, s.qcos,
         unnest(qb.e) AS qv_el, unnest(cb.e) AS ev_el
  FROM sliver s
  JOIN sbase qb ON qb.vec_id = s.qid
  JOIN sbase cb ON cb.vec_id = s.id
  WHERE s.rkq <= {margin * k}
), cdots AS (
  SELECT qid, id, any_value(qcos) AS qcos,
         CAST(SUM(CAST(qv_el * ev_el AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(qv_el * qv_el AS DECIMAL(30,15))) AS DOUBLE) AS nq,
         CAST(SUM(CAST(ev_el * ev_el AS DECIMAL(30,15))) AS DOUBLE) AS ne
  FROM cprod GROUP BY qid, id
), qscored AS (
  SELECT qid, id, qcos, dot / (sqrt(nq) * sqrt(ne)) AS cos,
         row_number() OVER (
           PARTITION BY qid ORDER BY dot / (sqrt(nq) * sqrt(ne)) DESC, id) AS rk
  FROM cdots
)
SELECT qid, id, ROUND(qcos, 6) AS qcos, ROUND(cos, 6) AS cos, CAST(rk AS INT) AS rk
FROM qscored WHERE rk <= {k}
"""

def _ivf_trained_sql(k: int = 5, n_probe: int = 2, iters: int | None = None) -> str:
    """Oracle for the TRAINED IVF path (VERDICT r7 item 4): DuckDB
    re-runs the oracle-exact Lloyd loop itself — per iteration, the
    decimal-exact cosine argmax assignment (same CTE shape as the seed
    oracle) followed by the engine-portable centroid update
    ``sum(floor(x*1e6 + 0.5))`` per coordinate, cast to double and
    scaled by the exact binary factor 2^-30
    (similarity._kmeans_centroids exact mode) — then probes the final
    centroids with the standard candidate/re-rank tail.  Every step is
    order-independent, so the recomputed centroids are bit-identical to
    the ones Spark collects and inlines as literals."""
    iters = _IVF_TRAIN_ITERS if iters is None else iters
    parts = [f"""cent0 AS (
  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
  FROM embeddings ORDER BY vec_id LIMIT {_IVF_CENTROIDS}
), eb AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), epos AS (
  SELECT id, unnest(e) AS v, unnest(range(1, {_EMB_DIM} + 1)) AS pos FROM eb
)"""]
    for t in range(iters):
        parts.append(f"""cp{t} AS (
  SELECT e.id, c.cid, unnest(e.e) AS av, unnest(c.ce) AS bv
  FROM eb e CROSS JOIN cent{t} c
), cd{t} AS (
  SELECT id, cid,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM cp{t} GROUP BY id, cid
), asg{t} AS (
  SELECT id, cid FROM (
    SELECT id, cid, row_number() OVER (
      PARTITION BY id ORDER BY dot / (sqrt(aa) * sqrt(bb)) DESC, cid) AS rk
    FROM cd{t}) WHERE rk = 1
), up{t} AS (
  SELECT a.cid, u.pos,
         SUM(CAST(floor(u.v * 1000000.0 + 0.5) AS BIGINT)) AS m
  FROM asg{t} a JOIN epos u ON u.id = a.id
  GROUP BY a.cid, u.pos
), cent{t + 1} AS (
  SELECT c.cid, COALESCE(u.ce, c.ce) AS ce
  FROM cent{t} c LEFT JOIN (
    SELECT cid, list(CAST(m AS DOUBLE) / 1073741824.0 ORDER BY pos) AS ce
    FROM up{t} GROUP BY cid) u USING (cid)
)""")
    parts.append(f"""cpF AS (
  SELECT e.id, c.cid, unnest(e.e) AS av, unnest(c.ce) AS bv
  FROM eb e CROSS JOIN cent{iters} c
), cdF AS (
  SELECT id, cid,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM cpF GROUP BY id, cid
), rankedF AS (
  SELECT id, cid, row_number() OVER (
    PARTITION BY id ORDER BY dot / (sqrt(aa) * sqrt(bb)) DESC, cid) AS rk
  FROM cdF
), assignedF AS (
  SELECT id, cid AS cell FROM rankedF WHERE rk = 1
), probesF AS (
  SELECT id AS qid, cid AS cell FROM rankedF WHERE id < 10 AND rk <= {n_probe}
), candF AS (
  SELECT DISTINCT p.qid, a.id
  FROM assignedF a JOIN probesF p ON a.cell = p.cell AND a.id != p.qid
), prodF AS (
  SELECT c.qid, c.id,
         unnest(eq.embedding)::DOUBLE AS qv, unnest(ec.embedding)::DOUBLE AS cv
  FROM candF c
  JOIN embeddings eq ON eq.vec_id = c.qid
  JOIN embeddings ec ON ec.vec_id = c.id
), dotsF AS (
  SELECT qid, id,
         CAST(SUM(CAST(qv * cv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(qv * qv AS DECIMAL(30,15))) AS DOUBLE) AS qq,
         CAST(SUM(CAST(cv * cv AS DECIMAL(30,15))) AS DOUBLE) AS cc
  FROM prodF GROUP BY qid, id
), scoredF AS (
  SELECT qid, id, dot / (sqrt(qq) * sqrt(cc)) AS cos,
         row_number() OVER (PARTITION BY qid ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, id) AS rk
  FROM dotsF
)
SELECT qid, id, ROUND(cos, 6) AS cos, CAST(rk AS INT) AS rk
FROM scoredF WHERE rk <= {k}""")
    return "WITH " + ",\n".join(parts)

def _semantic_cell_stats_sql() -> str:
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {_IVF_CENTROIDS}
), cp AS (
  SELECT e.vec_id AS id, c.cid,
         unnest(e.embedding)::DOUBLE AS av, unnest(c.ce)::DOUBLE AS bv
  FROM embeddings e CROSS JOIN cent c
), cd AS (
  SELECT id, cid,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM cp GROUP BY id, cid
), ranked AS (
  SELECT id, cid, row_number() OVER (
    PARTITION BY id ORDER BY dot / (sqrt(aa) * sqrt(bb)) DESC, cid) AS rk
  FROM cd
), assigned AS (
  SELECT id, cid AS cell FROM ranked WHERE rk = 1
), occ AS (
  SELECT cell, COUNT(*) AS n_rows FROM assigned GROUP BY cell
)
SELECT cell, n_rows,
       CAST(n_rows * (n_rows - 1) / 2 AS BIGINT) AS n_pairs,
       ROUND(n_rows::DOUBLE / SUM(n_rows) OVER (), 6) AS occupancy_frac
FROM occ
"""

def _diversity_sample_sql(per_cell: int = 3) -> str:
    """Oracle for cluster_balanced_sample: the seed-centroid argmax
    assignment CTEs (same as _semantic_cell_stats_sql) feed a
    per-cell row_number over deterministic md5-hash order — the exact
    hash-uniform the Spark sampler computes (operators/sampling.py:
    hash_uniform's integer numerator)."""
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {_IVF_CENTROIDS}
), cp AS (
  SELECT e.vec_id AS id, c.cid,
         unnest(e.embedding)::DOUBLE AS av, unnest(c.ce)::DOUBLE AS bv
  FROM embeddings e CROSS JOIN cent c
), cd AS (
  SELECT id, cid,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM cp GROUP BY id, cid
), ranked AS (
  SELECT id, cid, row_number() OVER (
    PARTITION BY id ORDER BY dot / (sqrt(aa) * sqrt(bb)) DESC, cid) AS rk
  FROM cd
), assigned AS (
  SELECT id, cid AS cell FROM ranked WHERE rk = 1
), hashed AS (
  SELECT id, cell,
         ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM assigned
)
SELECT id AS vec_id, cell, CAST(rk AS INT) AS rk FROM (
  SELECT id, cell, row_number() OVER (PARTITION BY cell ORDER BY h, id) AS rk
  FROM hashed
) WHERE rk <= {per_cell}
"""

def _semantic_dedup_sql(threshold: float = 0.45) -> str:
    """Oracle for semantic_dedup: the _ivf_ann_sql assignment CTEs
    (seed centroids -> per-vector argmax cell) feed a within-cell
    id_a < id_b pair join, decimal-exact cosines, and a keep-lowest-id
    left join."""
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {_IVF_CENTROIDS}
), cp AS (
  SELECT e.vec_id AS id, c.cid,
         unnest(e.embedding)::DOUBLE AS av, unnest(c.ce)::DOUBLE AS bv
  FROM embeddings e CROSS JOIN cent c
), cd AS (
  SELECT id, cid,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM cp GROUP BY id, cid
), ranked AS (
  SELECT id, cid, row_number() OVER (
    PARTITION BY id ORDER BY dot / (sqrt(aa) * sqrt(bb)) DESC, cid) AS rk
  FROM cd
), assigned AS (
  SELECT id, cid AS cell FROM ranked WHERE rk = 1
), sbase AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
), pairs AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.id < b.id
), prod AS (
  SELECT p.id_a, p.id_b, unnest(ea.e) AS x, unnest(eb.e) AS y
  FROM pairs p
  JOIN sbase ea ON ea.vec_id = p.id_a
  JOIN sbase eb ON eb.vec_id = p.id_b
), dots AS (
  SELECT id_a, id_b,
         CAST(SUM(CAST(x * y AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(x * x AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(y * y AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM prod GROUP BY id_a, id_b
), dup AS (
  SELECT id_b AS id, id_a AS dup_of, dot / (sqrt(aa) * sqrt(bb)) AS cosv,
         row_number() OVER (PARTITION BY id_b ORDER BY id_a) AS rkd
  FROM dots WHERE dot / (sqrt(aa) * sqrt(bb)) >= {threshold}
)
SELECT a.id, a.cell, d.dup_of IS NULL AS keep,
       d.dup_of, ROUND(d.cosv, 6) AS dup_cos
FROM assigned a LEFT JOIN (SELECT * FROM dup WHERE rkd = 1) d ON d.id = a.id
"""

def _ann_recall_sql() -> str:
    """Composes the already-verified ANN oracles (exact, IVF, LSH, and
    both stored-index serving configs) into the recall report — the
    oracle is the same joins/aggregates the Spark operator runs, over
    the same sub-results.  ``lsh_served`` probes a stored index at the
    serving multiprobe width (_SERVING_PROBE_BITS bits vs the one-shot
    ``lsh`` branch's 1); ``ivf_served`` narrows to n_probe=2;
    ``ivf_trained`` re-runs the oracle-exact Lloyd loop in SQL
    (_ivf_trained_sql)."""
    from python_ctd_spark.operators.similarity import probe_masks as _pm
    methods_cte = " UNION ALL ".join(
        f"SELECT '{m}' AS method"
        for m in ("ivf", "lsh", "lsh_served", "ivf_served", "sq8", "ivf_sq8",
                  "ivf_trained", "pq", "ivf_pq", "pq_trained",
                  "ivf_pq_trained", "ivf_pq_res")
    )
    return f"""
WITH exact AS (
  SELECT qid, vec_id AS id FROM ({_EMBEDDING_TOPK_SQL}) x
), ivf AS (
  SELECT qid, id FROM ({_ivf_ann_sql()}) x
), lsh AS (
  SELECT qid, id FROM ({_lsh_ann_sql(5, _pm(_NEARDUP_PLANES, 1))}) x
), lshp AS (
  SELECT qid, id FROM ({_lsh_ann_sql(5, _pm(_NEARDUP_PLANES, _SERVING_PROBE_BITS))}) x
), ivfp AS (
  SELECT qid, id FROM ({_ivf_ann_sql(5, n_probe=2)}) x
), sq8 AS (
  SELECT qid, vec_id AS id FROM ({_sq8_ann_sql()}) x
), ivfsq AS (
  SELECT qid, id FROM ({_ivf_sq_sql()}) x
), ivftr AS (
  SELECT qid, id FROM ({_ivf_trained_sql()}) x
), pqm AS (
  SELECT qid, id FROM ({_pq_ann_sql(5, margin=16)}) x
), ivfpq AS (
  SELECT qid, id FROM ({_ivf_pq_sql()}) x
), pqtr AS (
  SELECT qid, id FROM ({_pq_ann_sql(5, margin=16, trained_iters=_PQ_TRAIN_ITERS)}) x
), ivfpqtr AS (
  SELECT qid, id FROM ({_ivf_pq_sql(trained_iters=_PQ_TRAIN_ITERS)}) x
), ivfpqres AS (
  SELECT qid, id FROM ({_ivf_pq_residual_sql()}) x
), approx AS (
  SELECT 'ivf' AS method, qid, id FROM ivf
  UNION ALL
  SELECT 'lsh' AS method, qid, id FROM lsh
  UNION ALL
  SELECT 'lsh_served' AS method, qid, id FROM lshp
  UNION ALL
  SELECT 'ivf_served' AS method, qid, id FROM ivfp
  UNION ALL
  SELECT 'sq8' AS method, qid, id FROM sq8
  UNION ALL
  SELECT 'ivf_sq8' AS method, qid, id FROM ivfsq
  UNION ALL
  SELECT 'ivf_trained' AS method, qid, id FROM ivftr
  UNION ALL
  SELECT 'pq' AS method, qid, id FROM pqm
  UNION ALL
  SELECT 'ivf_pq' AS method, qid, id FROM ivfpq
  UNION ALL
  SELECT 'pq_trained' AS method, qid, id FROM pqtr
  UNION ALL
  SELECT 'ivf_pq_trained' AS method, qid, id FROM ivfpqtr
  UNION ALL
  SELECT 'ivf_pq_res' AS method, qid, id FROM ivfpqres
), hits AS (
  SELECT a.method, a.qid, COUNT(*) AS n_hits
  FROM approx a JOIN exact e ON e.qid = a.qid AND e.id = a.id
  GROUP BY a.method, a.qid
), base AS (
  SELECT m.method, e.qid, COUNT(*) AS n_exact
  FROM exact e CROSS JOIN ({methods_cte}) m
  GROUP BY m.method, e.qid
)
SELECT b.method, b.qid, b.n_exact,
       COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0)::DOUBLE / b.n_exact::DOUBLE, 6) AS recall,
       COALESCE(h.n_hits, 0)::DOUBLE / b.n_exact::DOUBLE >= 0.6 AS recall_ok
FROM base b LEFT JOIN hits h ON h.method = b.method AND h.qid = b.qid
"""



def _ivf_pq_residual_sql(
    k: int = 5, n_probe: int = 2, margin: int | None = None
) -> str:
    """Oracle for the RESIDUAL IVF,PQ composition (operators/pq.py:
    ivf_pq_residual_encode/_probe — FAISS's actual IVF,PQ form): the
    seed-centroid assignment CTEs feed a residual computation (IEEE
    double subtraction, engine-identical), seed codebooks come from the
    first-ksub NON-CENTROID residual rows (centroid rows' residuals are
    identically zero), the integer-exact argmin encodes residuals, the
    stored norm is |centroid + decode(codes)|^2 (decimal-exact), and
    scoring decomposes as (q·centroid + ADC LUT sum) / (|q|·|recon|)
    with every ranking-relevant number an exact decimal."""
    dsub = _EMB_DIM // _PQ_M
    margin = _PQ_MARGIN if margin is None else margin
    return f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings ORDER BY vec_id LIMIT {_IVF_CENTROIDS}
), cp AS (
  SELECT e.vec_id AS id, c.cid,
         unnest(e.embedding)::DOUBLE AS av, unnest(c.ce)::DOUBLE AS bv
  FROM embeddings e CROSS JOIN cent c
), cd AS (
  SELECT id, cid,
         CAST(SUM(CAST(av * bv AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(av * av AS DECIMAL(30,15))) AS DOUBLE) AS aa,
         CAST(SUM(CAST(bv * bv AS DECIMAL(30,15))) AS DOUBLE) AS bb
  FROM cp GROUP BY id, cid
), cranked AS (
  SELECT id, cid, row_number() OVER (
    PARTITION BY id ORDER BY dot / (sqrt(aa) * sqrt(bb)) DESC, cid) AS rk
  FROM cd
), assigned AS (
  SELECT id, cid AS cell FROM cranked WHERE rk = 1
), centpos AS (
  SELECT cid, unnest(ce)::DOUBLE AS cev, unnest(range(1, {_EMB_DIM} + 1)) AS pos
  FROM cent
), rescoords AS (
  -- residual = x - centroid(cell(x)), per coordinate (IEEE double)
  SELECT a.id, a.cell,
         CAST(floor((x.pos - 1) / {dsub}) AS INT) AS j,
         CAST((x.pos - 1) % {dsub} AS INT) AS si,
         x.v - cp2.cev AS rv
  FROM assigned a
  JOIN (SELECT vec_id AS id, unnest(embedding)::DOUBLE AS v,
               unnest(range(1, {_EMB_DIM} + 1)) AS pos
        FROM embeddings) x ON x.id = a.id
  JOIN centpos cp2 ON cp2.cid = a.cell AND cp2.pos = x.pos
), seedids AS (
  SELECT vec_id FROM embeddings
  WHERE vec_id NOT IN (SELECT cid FROM cent)
  ORDER BY vec_id LIMIT {_PQ_KSUB}
), cb AS (
  -- residual codebooks seeded from the first-ksub non-centroid rows
  SELECT s.code, r.j, r.si, r.rv AS cv
  FROM (SELECT vec_id,
               CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS code
        FROM seedids) s
  JOIN rescoords r ON r.id = s.vec_id
), cbq AS (
  SELECT code, j, si, CAST(floor(cv * 1000000.0 + 0.5) AS BIGINT) AS cq
  FROM cb
), cbn2 AS (
  SELECT j, code, SUM(cq * cq) AS n2i FROM cbq GROUP BY j, code
), sdots AS (
  SELECT c.id, c.j, b.code,
         SUM(CAST(floor(c.rv * 1000000.0 + 0.5) AS BIGINT) * b.cq * 2) AS d2
  FROM rescoords c JOIN cbq b ON b.j = c.j AND b.si = c.si
  GROUP BY c.id, c.j, b.code
), best AS (
  SELECT s.id, s.j, s.code,
         row_number() OVER (PARTITION BY s.id, s.j
                            ORDER BY (s.d2 - n.n2i) DESC, s.code) AS brk
  FROM sdots s JOIN cbn2 n ON n.j = s.j AND n.code = s.code
), codes AS (
  SELECT id, j, code FROM best WHERE brk = 1
), reconpos AS (
  -- x_hat coordinate = centroid + decode(code), per position
  SELECT a.id, cp2.pos, cp2.cev + b.cv AS xv
  FROM assigned a
  JOIN centpos cp2 ON cp2.cid = a.cell
  JOIN codes c ON c.id = a.id
   AND c.j = CAST(floor((cp2.pos - 1) / {dsub}) AS INT)
  JOIN cb b ON b.j = c.j AND b.code = c.code
   AND b.si = CAST((cp2.pos - 1) % {dsub} AS INT)
), pqn AS (
  SELECT id, CAST(SUM(CAST(xv * xv AS DECIMAL(30,15))) AS DOUBLE) AS pqnorm
  FROM reconpos GROUP BY id
), qcoords AS (
  SELECT vec_id AS qid, unnest(embedding)::DOUBLE AS v,
         unnest(range(1, {_EMB_DIM} + 1)) AS pos
  FROM embeddings WHERE vec_id < 10
), qlut AS (
  SELECT q.qid, b.j, b.code,
         SUM(CAST(q.v * b.cv AS DECIMAL(30,15))) AS lut
  FROM (SELECT qid, v,
               CAST(floor((pos - 1) / {dsub}) AS INT) AS j,
               CAST((pos - 1) % {dsub} AS INT) AS si
        FROM qcoords) q
  JOIN cb b ON b.j = q.j AND b.si = q.si
  GROUP BY q.qid, b.j, b.code
), qnorm AS (
  SELECT qid, sqrt(CAST(SUM(CAST(v * v AS DECIMAL(30,15))) AS DOUBLE)) AS qn
  FROM qcoords GROUP BY qid
), cprobes AS (
  SELECT id AS qid, cid AS cell FROM cranked WHERE id < 10 AND rk <= {n_probe}
), qcdot AS (
  -- q . centroid, exact decimal, per probed (query, cell)
  SELECT p.qid, p.cell,
         SUM(CAST(q.v * cp2.cev AS DECIMAL(30,15))) AS qcd
  FROM cprobes p
  JOIN qcoords q ON q.qid = p.qid
  JOIN centpos cp2 ON cp2.cid = p.cell AND cp2.pos = q.pos
  GROUP BY p.qid, p.cell
), cand AS (
  SELECT p.qid, a.id, p.cell
  FROM assigned a JOIN cprobes p ON a.cell = p.cell AND a.id != p.qid
), adc AS (
  SELECT ca.qid, ca.id,
         CAST(ANY_VALUE(d.qcd) + SUM(l.lut) AS DOUBLE) AS adc
  FROM cand ca
  JOIN qcdot d ON d.qid = ca.qid AND d.cell = ca.cell
  JOIN codes c ON c.id = ca.id
  JOIN qlut l ON l.qid = ca.qid AND l.j = c.j AND l.code = c.code
  GROUP BY ca.qid, ca.id
), qscored AS (
  SELECT a.qid, a.id,
         CASE WHEN p.pqnorm > 0 AND q.qn > 0
              THEN a.adc / (q.qn * sqrt(p.pqnorm)) ELSE -2.0 END AS qcos
  FROM adc a JOIN pqn p ON p.id = a.id JOIN qnorm q ON q.qid = a.qid
), cands AS (
  SELECT qid, id, qcos,
         row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, id) AS crk
  FROM qscored
), sliver AS (
  SELECT qid, id, qcos FROM cands WHERE crk <= {margin * k}
), rprod AS (
  SELECT s.qid, s.id, s.qcos,
         unnest(eq.embedding)::DOUBLE AS qv2, unnest(ec.embedding)::DOUBLE AS cv2
  FROM sliver s
  JOIN embeddings eq ON eq.vec_id = s.qid
  JOIN embeddings ec ON ec.vec_id = s.id
), rdots AS (
  SELECT qid, id, ANY_VALUE(qcos) AS qcos,
         CAST(SUM(CAST(qv2 * cv2 AS DECIMAL(30,15))) AS DOUBLE) AS dot,
         CAST(SUM(CAST(qv2 * qv2 AS DECIMAL(30,15))) AS DOUBLE) AS qq,
         CAST(SUM(CAST(cv2 * cv2 AS DECIMAL(30,15))) AS DOUBLE) AS cc
  FROM rprod GROUP BY qid, id
), finals AS (
  SELECT qid, id, qcos, dot / (sqrt(qq) * sqrt(cc)) AS cos,
         row_number() OVER (
           PARTITION BY qid
           ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, id) AS rk
  FROM rdots
)
SELECT qid, id, ROUND(qcos, 6) AS qcos, ROUND(cos, 6) AS cos,
       CAST(rk AS INT) AS rk
FROM finals WHERE rk <= {k}
"""
