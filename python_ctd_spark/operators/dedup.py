"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions (no Python workers) built
for the shape of a 100 TB corpus:

- **exact_dedup** — hash-groupBy on a content digest; map-side partial
  aggregation, one shuffle on the digest.
- **minhash_lsh_pairs** — shingle -> k minhashes -> banded LSH buckets ->
  bucket-join for candidates -> exact Jaccard verification.  The only
  shuffles are the band-bucket self-join (keys are (band, signature),
  which LSH makes selective) and the final distinct; no O(n^2) stage.
- **simhash_pairs** — 64-bit simhash + banded equality blocking.
- **ngram_jaccard_pairs** — exact sparse similarity join via shared-
  shingle inverted index (explode + join + count), the classic
  "documents sharing >= 1 shingle" candidate generation.  Exact but
  heavier than LSH; the oracle-checkable baseline.
- **embedding_neardup_pairs** — cosine-over-threshold pairs on an
  embedding column (see similarity.py for the shared kernel).

Hashes are engine-deterministic (md5-derived integers), so results are
reproducible across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._util import WS_RE, WS_SQL


def _md5_long(col: Column) -> Column:
    """Deterministic 60-bit integer from md5 (portable across engines —
    DuckDB computes the identical value from the same bytes)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


#: modulus for the affine MinHash permutation family (2^31 - 1, prime).
MH_PRIME = 2147483647


def _sh_md5(col: str = "sh") -> Column:
    """60-bit md5 hash of every staged shingle (the ``col`` column,
    default the ``with_shingles`` output), as one parsed expression —
    the per-element twin of :func:`_md5_long` (same bytes, same value
    in DuckDB); see the ``with_shingles`` note on expr-vs-lambda
    construction cost."""
    quoted = "`" + col.replace("`", "``") + "`"
    return F.expr(
        f"transform({quoted}, s -> "
        "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))"
    )


def mh_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the affine permutation family
    ``h_i(x) = (a_i * x + b_i) mod MH_PRIME``.  ``a`` is forced odd (so
    nonzero); all arithmetic stays below 2^62, overflow-free in the int64
    of both Spark and the DuckDB oracle."""
    return [
        (((i * 2654435761 + 40503) % MH_PRIME) | 1, (i * 1103515245 + 12345) % MH_PRIME)
        for i in range(k)
    ]


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), WS_RE)


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out: str = "sh"
) -> DataFrame:
    """Add a distinct word-``n``-gram shingle column via a **two-stage
    projection**: tokens land in a concrete column before the gram lambda
    references them.  ``element_at`` over a bound attribute is O(1); over
    an inline ``split(...)`` expression Spark re-evaluates the split on
    every lambda call (~20x slower on 100-token docs — measured 8.3s vs
    0.36s for 5k docs)."""
    # try_element_at, not element_at: Spark 4 runs ANSI mode by default, so
    # an index past the end (any doc shorter than n tokens) would abort the
    # whole job with INVALID_ARRAY_INDEX_IN_ELEMENT_AT.  try_element_at
    # yields NULL there and concat_ws skips it, so a short doc produces a
    # single shingle of all its tokens.
    # One expr() parse instead of a Python-lambda transform with n
    # try_element_at subtrees: the lambda form costs dozens of py4j
    # round-trips per build (same finding as similarity's kernel SQL —
    # identical optimized plan, construction ~5x cheaper).
    elems = ", ".join(
        f"try_element_at(__toks, CAST(i + {j + 1} AS INT))" for j in range(n)
    )
    grams = F.expr(
        f"transform(sequence(0, greatest(size(__toks) - {n}, 0)), "
        f"i -> concat_ws(' ', {elems}))"
    )
    return (
        df.withColumn("__toks", _tokens(text_col))
        .withColumn(out, F.array_distinct(grams))
        .drop("__toks")
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by content digest: returns one row per
    distinct content with the keeper (min id) and the duplicate count."""
    return df.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies")
    )


def shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), WS_RE)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


def minhash_signature(shingle_col: Column, k: int = 16) -> Column:
    """k-permutation MinHash signature (array<bigint>) from a shingle
    array: one md5 per shingle reduced mod :data:`MH_PRIME`, then ``k``
    affine permutations (:func:`mh_coeffs`).  Prefer the staged
    :func:`minhash_sig_from_hashes` inside operators — pass it a
    *projected* base-hash column so the md5 pass runs once, not ``k``
    times."""
    hm = F.transform(shingle_col, lambda s: _md5_long(s) % MH_PRIME)
    return minhash_sig_from_hashes(hm, k)


def minhash_sig_from_hashes(hash_col: Column | str, k: int = 16) -> Column:
    """MinHash signature from pre-reduced base hashes (values in
    ``[0, MH_PRIME)``): ``sig[i] = min over h of (a_i*h + b_i) % MH_PRIME``.

    Pass the hash array as a SQL fragment (str) to get the whole
    k-permutation array as ONE parsed expression — the Column form
    builds k higher-order functions through py4j (~16 ms each on a
    loaded driver), the str form one parse; optimized plans identical
    modulo lambda-variable names."""
    if isinstance(hash_col, str):
        mins = ", ".join(
            f"array_min(transform({hash_col}, "
            f"x -> (({a} * x + {b}) % {MH_PRIME})))"
            for a, b in mh_coeffs(k)
        )
        return F.expr(f"array({mins})")

    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MH_PRIME)

    return F.array(
        *[F.array_min(F.transform(hash_col, perm(a, b))) for a, b in mh_coeffs(k)]
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def optimal_band_shape(
    k: int,
    threshold: float,
    fp_weight: float = 0.3,
    min_recall: float = 0.85,
    recall_margin: float = 0.1,
) -> tuple[int, int]:
    """Pick ``(bands, r)`` with ``bands * r == k`` minimizing the
    weighted false-positive + false-negative area of the LSH S-curve
    around ``threshold`` (the standard banding optimization; candidate
    probability at Jaccard s is ``1 - (1 - s^r)^bands``), subject to a
    **recall floor**: the shape must catch at least ``min_recall`` of
    pairs sitting ``recall_margin`` above the threshold.

    The floor is the contract that makes "auto" safe: the unconstrained
    area optimum drifts precision-heavy as the threshold rises (at
    k=16, t=0.6 it picks (4,4), which catches only 67% of J=0.7 pairs;
    t=0.8 picks (2,8), 68% at J=0.9) — silently trading away exactly
    the near-duplicates the caller asked for.  False positives only
    cost verification time (verification is exact), so recall is the
    side that must be guaranteed.  If no shape meets the floor the
    most recall-biased shape (bands=k, r=1) is returned.

    Numeric integration on a fixed grid — deterministic, driver-side,
    O(k * grid).  The default floor reproduces the package default
    (8, 2) at (k=16, threshold=0.5).
    """
    best, best_err = None, None
    probe = min(threshold + recall_margin, 1.0)
    for bands in range(1, k + 1):
        if k % bands:
            continue
        r = k // bands
        if 1.0 - (1.0 - probe**r) ** bands < min_recall:
            continue
        fp = fn = 0.0
        steps = 500
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s**r) ** bands
            if s < threshold:
                fp += p / steps
            else:
                fn += (1.0 - p) / steps
        err = fp_weight * fp + (1.0 - fp_weight) * fn
        if best_err is None or err < best_err:
            best, best_err = (bands, r), err
    return best if best is not None else (k, 1)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
) -> DataFrame:
    """The storable LSH index of a corpus: ``(id, hsh, sig)`` — the
    60-bit shingle-hash array (doubles as the exact-verification set;
    long-array intersect beats string arrays ~4x) and the k-permutation
    MinHash signature.  Write THIS table once per corpus snapshot; both
    :func:`minhash_lsh_pairs` (full self-dedup) and
    :func:`incremental_dedup` (new shard vs existing corpus) consume it,
    so signatures for the existing 100 TB never recompute when a new
    shard arrives."""
    return (
        with_shingles(df.select(F.col(id_col).alias("id"), text_col), text_col, n)
        .withColumn("hsh", _sh_md5())
        .withColumn("sig", minhash_sig_from_hashes(
            f"transform(hsh, h -> h % {MH_PRIME})", k
        ))
        .select("id", "hsh", "sig")
    )


def band_rows(
    sigs: DataFrame, bands: int, r: int, keep: tuple = ("id",)
) -> DataFrame:
    """Explode a signature table into ``(*keep, band, bsig)`` LSH
    band-key rows (``bands`` rows per doc).  Probes and self-joins are
    equi-joins on (band, bsig); bucket the stored form by these keys to
    make repeated probes exchange-free.  ``keep`` defaults to the bare
    id (the stored-index shape); streaming probes pass extra columns
    (event_time, the hsh verification array) to ride along."""
    # one expr() parse for the bands x r band-key structs (the Column
    # form costs ~10 py4j round-trips per band to build; see the
    # with_shingles note on expr-vs-lambda construction cost)
    structs = ", ".join(
        "named_struct('band', {b}, 'bsig', concat_ws(',', {cells}))".format(
            b=b,
            cells=", ".join(
                f"CAST(sig[{b * r + j}] AS STRING)" for j in range(r)
            ),
        )
        for b in range(bands)
    )
    return sigs.select(
        *keep,
        F.expr(f"explode(array({structs}))").alias("bk"),
    ).select(
        *keep, F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
    bands: int | str = 8,
    threshold: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact verification.

    Plan: per doc compute shingles + k minhashes once; explode into
    ``bands`` rows keyed by (band_id, band_signature); self-join on the
    band key with ``id_a < id_b`` (each candidate pair surfaces at most
    ``bands`` times, de-duplicated); verify with Jaccard over the
    60-bit shingle-hash arrays (collision odds ~1e-50 per pair; the
    long-array intersect is ~4x faster than string arrays) and keep
    pairs >= threshold.

    Default band shape is k=16 split into bands=8 rows of r=2: candidate
    recall at Jaccard J is ``1 - (1 - J^r)^bands``, so J=0.5 -> ~90% and
    J=0.6 -> ~97%.  (The old r=4/bands=4 shape caught only ~43% at J=0.6
    — same signature cost, far worse recall near the default threshold.)
    Verification is exact, so extra candidates cost time, never
    precision.

    At fleet scale the band join is the only wide stage and its keys are
    ~uniform (md5-derived), so AQE's skew handling has nothing to split.

    ``bands="auto"`` derives the shape from the threshold via
    :func:`optimal_band_shape` (higher thresholds earn more rows per
    band — fewer false candidates at the same recall).
    """
    if bands == "auto":
        bands, _ = optimal_band_shape(k, threshold)
    r = k // bands
    base = minhash_signatures(df, text_col, id_col, n=n, k=k)
    if materialize:
        # the signature table has three consumers (band self-join l/r and
        # the verification fetch); without persist each one recomputes the
        # full shingle+hash lineage.  One doc-count-sized table, spills to
        # disk if needed — the standard LSH signature materialization.
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    banded = band_rows(base, bands, r)

    # Candidates as bare id pairs: a pair surfaces up to ``bands`` times,
    # so dedupe BEFORE attaching the shingle-hash arrays — shuffling two
    # doc-length arrays per duplicate surfacing is the dominant cost on
    # dup-heavy corpora.
    left, right = banded.alias("l"), banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bsig") == F.col("r.bsig"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hs = base.select("id", "hsh", F.size("hsh").alias("nsh"))
    verified = cand.join(
        hs.select(F.col("id").alias("id_a"), F.col("hsh").alias("h_a"), F.col("nsh").alias("na")),
        "id_a",
    ).join(
        hs.select(F.col("id").alias("id_b"), F.col("hsh").alias("h_b"), F.col("nsh").alias("nb")),
        "id_b",
    )
    inter = F.size(F.array_intersect(F.col("h_a"), F.col("h_b"))).cast("double")
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    index_banded: DataFrame | None = None,
) -> DataFrame:
    """Dedup a NEW shard against an EXISTING corpus without touching the
    corpus text: ``index`` is the stored :func:`minhash_signatures`
    table of everything ingested so far.  This is the shape a rolling
    100 TB ingest actually runs — re-shingling the historical corpus per
    arriving shard is the naive O(corpus) cost this avoids; the index is
    O(docs) small rows, appended per shard (union the new shard's
    signatures after the verdicts land).

    Per new document: candidates share >= 1 LSH band with an indexed
    doc, verified by exact Jaccard over the stored shingle-hash sets.
    Returns every new doc id with ``(doc_id, is_dup, n_dups,
    matched_id, best_jaccard)`` where ``matched_id`` is the smallest
    indexed id among verified matches (deterministic keeper contract)
    and ``best_jaccard`` the highest verified similarity.

    Plan: the only wide stage is the (band, bsig) equi-join of the new
    shard's band rows against the index — pass ``index_banded`` (the
    :func:`band_rows` table written bucketed by (band, bsig) via
    io.sinks.write_bucketed) and the probe side alone shuffles: the
    stored index scans its buckets pre-clustered
    (tests/test_sinks.py pins the plan).  When omitted, the band rows
    are derived from ``index`` in-plan.  Verification joins fetch hsh
    arrays for candidates only.

    ``index_banded`` MUST have been built with these same ``(bands,
    k)`` — its band keys hash ``r = k // bands`` signature values per
    band, so a mismatched table probes wrong keys and silently loses
    recall; that cannot be detected from the table itself, so the
    contract is documented here and the divisibility half enforced.
    """
    if k % bands != 0:
        raise ValueError(
            f"k ({k}) must be divisible by bands ({bands}); a remainder "
            "silently drops the signature tail from every band key"
        )
    r = k // bands
    from pyspark import StorageLevel

    new_sigs = minhash_signatures(new_docs, text_col, id_col, n=n, k=k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ix_banded = (
        index_banded if index_banded is not None else band_rows(index, bands, r)
    )
    cand = (
        band_rows(new_sigs, bands, r)
        .alias("nw")
        .join(
            ix_banded.alias("ix"),
            (F.col("nw.band") == F.col("ix.band"))
            & (F.col("nw.bsig") == F.col("ix.bsig")),
        )
        .select(F.col("nw.id").alias("new_id"), F.col("ix.id").alias("old_id"))
        .dropDuplicates(["new_id", "old_id"])
    )
    verified = (
        cand.join(
            new_sigs.select(F.col("id").alias("new_id"), F.col("hsh").alias("h_n")),
            "new_id",
        )
        .join(
            index.select(F.col("id").alias("old_id"), F.col("hsh").alias("h_o")),
            "old_id",
        )
    )
    inter = F.size(F.array_intersect(F.col("h_n"), F.col("h_o"))).cast("double")
    jac = inter / (
        F.size("h_n").cast("double") + F.size("h_o").cast("double") - inter
    )
    matches = (
        verified.withColumn("j", jac)
        .filter(F.col("j") >= threshold)
        .groupBy("new_id")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("old_id").alias("matched_id"),
            F.round(F.max("j"), 6).alias("best_jaccard"),
        )
    )
    return (
        new_sigs.select(F.col("id").alias("new_id"))
        .join(matches, "new_id", "left")
        .select(
            F.col("new_id").alias(id_col),
            F.col("n_dups").isNotNull().alias("is_dup"),
            F.coalesce("n_dups", F.lit(0).cast("bigint")).alias("n_dups"),
            "matched_id",
            "best_jaccard",
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 4096,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via an inverted shingle index
    with stop-shingle pruning.

    A shingle appearing in ``d`` documents generates ``d*(d-1)/2``
    candidate rows — one hot phrase in a near-dup-heavy 100 TB corpus is
    a quadratic blowup.  Standard fix (the prefix-filter family): drop
    shingles with document frequency > ``max_df`` from *candidate
    generation only*; verification recomputes the exact intersection from
    the full arrays, so every reported jaccard is exact.  The only loss is
    a pair whose shared shingles are ALL stop-shingles — at any useful
    threshold such a pair is boilerplate overlap, not near-duplication.
    When no shingle exceeds ``max_df`` (e.g. any corpus with fewer than
    ``max_df`` docs) the result is identical to the unpruned join —
    property-tested in tests/test_llm_ops.py.

    ``max_df=None`` restores the single-phase unpruned plan (explode ->
    equi-join -> per-pair count), which avoids shipping the arrays but has
    no guard against hot shingles.
    """
    ids = df.select(F.col(id_col).alias("id"), text_col)
    # 60-bit hashes instead of shingle strings: long-array intersect is
    # ~4x faster and the exploded index rows are fixed-width.
    base = (
        with_shingles(ids, text_col, n)
        .withColumn("hsh", _sh_md5())
        .select("id", "hsh")
    )
    # explode_outer, not explode: shingle arrays are never empty (>=1 gram
    # even for short docs), so the semantics are identical — but plain
    # explode triggers InferFiltersFromGenerate, which pushes a size(sh)>0
    # filter below the token projection and re-inlines the whole shingle
    # expression into a per-row filter (~20x slower; verified in the
    # physical plan).
    inv = base.select("id", F.explode_outer("hsh").alias("g"))

    if max_df is None:
        sizes = base.select("id", F.size("hsh").alias("nsh"))
        l, r = inv.alias("l"), inv.alias("r")
        shared = (
            l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
            .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sa = sizes.select(F.col("id").alias("id_a"), F.col("nsh").alias("na"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("nsh").alias("nb"))
        return (
            shared.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "jaccard",
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )

    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    # document frequency via a partition-only window: one shuffle on the
    # shingle hash, and the band self-join below reuses that partitioning.
    w_g = Window.partitionBy("g")
    pruned = inv.withColumn("__df", F.count(F.lit(1)).over(w_g)).filter(
        F.col("__df") <= int(max_df)
    )
    l, r = pruned.alias("l"), pruned.alias("r")
    cand = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hs = base.select("id", "hsh")
    verified = cand.join(
        hs.select(F.col("id").alias("id_a"), F.col("hsh").alias("h_a")), "id_a"
    ).join(hs.select(F.col("id").alias("id_b"), F.col("hsh").alias("h_b")), "id_b")
    inter = F.size(F.array_intersect(F.col("h_a"), F.col("h_b"))).cast("double")
    jac = inter / (F.size("h_a") + F.size("h_b") - inter).cast("double")
    return (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
    max_df: int | None = 4096,
) -> DataFrame:
    """Near-containment pairs: ``|A ∩ B| / min(|A|, |B|)`` over distinct
    word-``n``-gram shingles.  Catches the asymmetric duplicates
    symmetric Jaccard misses — a document embedded in a larger page
    (boilerplate wrapper, quoted article, concatenated shard) scores
    containment ~1 while its Jaccard can be arbitrarily low.

    Same physical shape as :func:`ngram_jaccard_pairs`: inverted shingle
    index with stop-shingle pruning for candidates, exact verification
    over the full hash arrays — reported containment is always exact.
    Returns ``(id_a, id_b, containment)`` with ``id_a < id_b``.
    """
    ids = df.select(F.col(id_col).alias("id"), text_col)
    base = (
        with_shingles(ids, text_col, n)
        .withColumn("hsh", _sh_md5())
        .select("id", "hsh")
    )
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    inv = base.select("id", F.explode_outer("hsh").alias("g"))
    if max_df is not None:
        w_g = Window.partitionBy("g")
        inv = inv.withColumn("__df", F.count(F.lit(1)).over(w_g)).filter(
            F.col("__df") <= int(max_df)
        )
    l, r = inv.alias("l"), inv.alias("r")
    cand = (
        l.join(r, (F.col("l.g") == F.col("r.g")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hs = base.select("id", "hsh")
    verified = cand.join(
        hs.select(F.col("id").alias("id_a"), F.col("hsh").alias("h_a")), "id_a"
    ).join(hs.select(F.col("id").alias("id_b"), F.col("hsh").alias("h_b")), "id_b")
    inter = F.size(F.array_intersect(F.col("h_a"), F.col("h_b"))).cast("double")
    containment = inter / F.least(F.size("h_a"), F.size("h_b")).cast("double")
    return (
        verified.withColumn("containment", containment)
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
    )


def contamination_report(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Benchmark decontamination scan: per corpus document, how many of
    its distinct word-``n``-grams appear in ANY benchmark document.

    Standard training-data hygiene (13-gram overlap is the conventional
    width): a doc sharing even one long n-gram with an eval benchmark is
    suspect.  Plan: the benchmark's distinct shingle hashes are a small
    table -> broadcast; the corpus's exploded shingle index joins it
    map-side and aggregates per doc.  The corpus never shuffles for the
    probe — only the per-doc count aggregate is wide.  Returns
    ``(id_col, n_contaminated)`` for contaminated docs only.
    """
    corp = (
        with_shingles(df.select(F.col(id_col).alias("id"), text_col), text_col, n)
        .select("id", F.explode_outer(
            _sh_md5()
        ).alias("g"))
    )
    bench_g = (
        with_shingles(benchmark.select(text_col), text_col, n)
        .select(F.explode_outer(
            _sh_md5()
        ).alias("g"))
        .distinct()
    )
    return (
        corp.join(F.broadcast(bench_g), "g")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .select(F.col("id").alias(id_col), "n_contaminated")
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Drop every corpus document sharing at least one ``n``-gram with
    the benchmark set (anti-join against :func:`contamination_report`)."""
    hits = contamination_report(df, benchmark, text_col, id_col, n).select(id_col)
    return df.join(hits, id_col, "left_anti")


def simhash64(text_col: str) -> Column:
    """64-bit SimHash of whitespace tokens.

    Each token contributes ±1 per bit position (sign from its md5-derived
    integer); the fingerprint takes the sign of each bit-sum.  Expressed
    as 64 aggregate-free array ops: tokens -> per-token 60-bit hash ->
    per-bit contribution sums via filter+size (no UDF).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), WS_RE)
    md5s = F.transform(toks, lambda t: F.md5(t))
    hashes = F.transform(md5s, lambda h: F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"))
    # second 60-bit stream from the high hex half of the same md5
    hashes_hi = F.transform(md5s, lambda h: F.conv(F.substring(h, 17, 15), 16, 10).cast("bigint"))
    total = F.size(hashes)

    def bit_sum(b: int) -> Column:
        stream = hashes if b < 60 else hashes_hi
        mask = 1 << (b % 60)
        ones = F.size(F.filter(stream, lambda h: h.bitwiseAND(F.lit(mask)) != 0))
        bit = (ones * 2 > total).cast("bigint")
        return bit * F.lit(1 << b if b < 63 else -(1 << 63))

    bits = [bit_sum(b) for b in range(64)]
    out = bits[0]
    for c in bits[1:]:
        out = out + c
    return out


def with_simhash(df: DataFrame, text_col: str = "text", out: str = "sh") -> DataFrame:
    """Staged SimHash: token array, then both md5 hash streams, land in
    concrete columns **once**; the 64 per-bit majority counts then
    reference bound attributes.  Same fingerprint values as
    :func:`simhash64`, ~10x faster (the pure-Column form re-evaluates the
    token/hash transforms inside each of the 64 bit expressions).

    The 64 bit expressions are built as **one SQL string** — composing
    them as Column objects is ~3s of py4j round trips per plan build on
    local mode; one ``selectExpr`` parse is milliseconds.  The
    aggregate-count fold (not ``size(filter(...))``) avoids allocating a
    filtered array per bit (measured ~2x across the 64 bits)."""
    staged = (
        df.selectExpr("*", f"split(trim(lower(`{text_col}`)), '{WS_SQL}') AS __toks")
        # one md5 per token; both 60-bit streams come from its low/high
        # hex halves (md5 is the expensive part — conv is cheap)
        .selectExpr("*", "transform(__toks, t -> md5(t)) AS __h")
        .selectExpr(
            "*",
            "transform(__h, h -> CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT)) AS __hl",
            "transform(__h, h -> CAST(conv(substring(h, 17, 15), 16, 10) AS BIGINT)) AS __hh",
            "size(__toks) AS __n",
        )
    )

    def bit_sql(b: int) -> str:
        stream = "__hl" if b < 60 else "__hh"
        mask = 1 << (b % 60)
        ones = f"aggregate({stream}, 0, (acc, x) -> acc + IF((x & {mask}) != 0, 1, 0))"
        # 1L << 63 wraps to Long.MIN_VALUE in JVM shiftleft — same value
        # as the Python literal -(1 << 63)
        val = "shiftleft(CAST(1 AS BIGINT), 63)" if b == 63 else str(1 << b)
        return f"(CAST(({ones}) * 2 > __n AS BIGINT) * {val})"

    sh = " + ".join(bit_sql(b) for b in range(64))
    return staged.selectExpr("*", f"({sh}) AS `{out}`").drop(
        "__toks", "__h", "__hl", "__hh", "__n"
    )


def banded_hamming_pairs(
    base: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs ``(id_a, id_b, hamming)`` from a 64-bit
    fingerprint table ``base`` with columns ``(id, sh)`` — the shared
    banding core behind :func:`simhash_pairs` (text) and
    ``media_dedup.ahash_pairs`` (images).

    Split the fingerprint into ``bands`` equal blocks; candidates must
    agree on at least one block, and true Hamming distance is verified
    with ``bit_count``.  For ``max_hamming < bands`` the pigeonhole
    principle makes the equi-join LOSSLESS for the threshold; above
    that (e.g. the registered ``simhash_dedup`` row's 6-bit band at 4
    blocks) it is deliberately best-effort recall — callers that need
    the losslessness contract enforce ``max_hamming < bands``
    themselves (``media_dedup.ahash_pairs`` does, and its all-pairs
    oracle proves it).  The join key space is (block index, block
    value): candidate volume scales with hash collisions, never
    corpus^2."""
    if not 1 <= bands <= 64 or 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    width = 64 // bands
    # width == 64 (bands=1, the exact-dup config): (1<<64)-1 overflows a
    # LongType literal; -1 is the same all-ones mask in two's complement
    mask = -1 if width == 64 else (1 << width) - 1
    if materialize:
        # two self-join branches consume the fingerprint table; persist
        # so the fingerprint computes once per row
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    blocks = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("sh"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.blk").alias("blk"), F.col("bk.bval").alias("bval"))
    l, r = blocks.alias("l"), blocks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: the text fingerprint
    (:func:`with_simhash`) fed through the shared
    :func:`banded_hamming_pairs` core."""
    base = with_simhash(
        df.select(F.col(id_col).alias("id"), text_col), text_col, out="sh"
    ).select("id", "sh")
    return banded_hamming_pairs(base, max_hamming, bands, materialize)


def _alternating_star(
    pairs: DataFrame, max_rounds: int
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star connected components (Kiveris
    et al. 2014, "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds on ANY graph shape, where plain
    min-label propagation needs O(diameter) rounds and degrades
    linearly on chain-shaped duplicate graphs (templated spam with
    drifting headers).

    ``pairs`` is an undirected edge list ``(a, b)`` with ``a != b``
    (either orientation).  Returns ``(labels, rounds)`` where labels is
    ``(node, label)`` for every node in ``pairs`` and the label is the
    component minimum.

    Each round is two star operations, every stage a keyed
    aggregate/join (no driver-side data):

    - **large-star**: for each node u, every STRICTLY LARGER neighbor v
      re-attaches to ``m = min(N(u) + {u})`` — emit ``(v, m)``;
    - **small-star**: orient edges child>parent; for each node u, its
      smaller neighbors and u itself attach to ``m = min(N<=(u) + {u})``.

    The fixpoint (edge multiset stops changing, checked with one
    count + xxhash64-sum aggregate per round) is a forest of stars
    rooted at each component's minimum node.

    Every round's edge set is ``localCheckpoint``-ed, not merely
    persisted: each round references the previous round's frame more
    than once, so without lineage truncation the LOGICAL plan doubles
    per round and the analyzer's plan-string generation goes
    exponential long before the data does.  (On a multi-executor
    cluster, pair this with a reliable checkpoint dir if executor loss
    must be survivable mid-computation — the standard GraphFrames-style
    iterative-CC tradeoff.)
    """
    cur = pairs.filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)
    prev_sig = None
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # large-star: symmetrize, group on u, attach larger neighbors to min
        symd = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).select(F.col("a").alias("u"), F.col("b").alias("v"))
        mins = symd.groupBy("u").agg(F.min("v").alias("__mn"))
        big = (
            symd.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("a"),
                F.least(F.col("u"), F.col("__mn")).alias("b"),
            )
            .distinct()
            .persist()
        )
        # small-star: every large-star edge already satisfies a > b
        mins2 = big.groupBy(F.col("a").alias("u")).agg(F.min("b").alias("__mn"))
        attach_children = (
            big.join(mins2, big["a"] == mins2["u"])
            .filter(F.col("b") != F.col("__mn"))
            .select(F.col("b").alias("a"), F.col("__mn").alias("b"))
        )
        attach_self = mins2.select(F.col("u").alias("a"), F.col("__mn").alias("b"))
        nxt = (
            attach_children.unionByName(attach_self)
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig = tuple(
            nxt.agg(
                F.count(F.lit(1)),
                # decimal accumulator: a bigint sum of 64-bit hashes
                # overflows under ANSI mode
                F.sum(F.xxhash64(F.col("a"), F.col("b")).cast("decimal(38,0)")),
            ).first()
        )
        cur.unpersist()
        big.unpersist()
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    labels = (
        cur.select(F.col("a").alias("node"), F.col("b").alias("label"))
        .unionByName(cur.select(F.col("b").alias("node"), F.col("b").alias("label")))
        .distinct()
    )
    return labels, rounds


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
    algorithm: str = "auto",
    switch_after: int = 4,
) -> DataFrame:
    """Connected components over an undirected edge list.  Returns
    (node, label) for every node that appears in an edge; the label is
    the smallest node id in the component (so it is the canonical
    cluster id).

    ``algorithm``:

    - ``"label"`` — min-label propagation: every node repeatedly adopts
      the smallest label among itself and its neighbors until fixpoint.
      Each round is one join + one min-aggregate, both keyed on the
      node — on a cluster the rounds reuse a single hash partitioning.
      Convergence takes the GRAPH DIAMETER rounds: the right tool for
      the clique-ish graphs near-dup pair generation produces (tiny
      diameters), linear-degrading on chains.
    - ``"star"`` — alternating large-star/small-star
      (:func:`_alternating_star`): O(log n) rounds on any shape, at
      ~2x the per-round shuffle count.
    - ``"auto"`` (default) — label propagation for up to
      ``switch_after`` rounds (the fast path — clique-ish dup graphs
      converge in 2-3), then, if still unconverged, hand the current
      labels to the star phase as shortcut edges ``(node, label)``
      unioned with the original edges (the label rounds' progress is
      kept; every shortcut stays in-component, so the result is
      unchanged).  Worst case O(log n) total, clique case identical to
      ``"label"``.

    Output is algorithm-independent: the label is always the component
    minimum.  Each round's result is persisted and the previous round
    unpersisted, so lineage stays O(1) deep instead of O(iterations).

    ``stats`` (optional dict) receives ``{"iterations": total_rounds,
    "label_rounds": n, "star_rounds": m, "algorithm": used}`` so scale
    runs can assert round counts (flat at 10x for cliques; ~log n on a
    planted chain — tools/bench_scale.py cc-chain; PLANS.md).
    """
    if algorithm not in ("label", "star", "auto"):
        raise ValueError(f"unknown cc algorithm: {algorithm!r}")
    pairs = edges.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    if algorithm == "star":
        labels, star_rounds = _alternating_star(pairs, max_iter)
        if stats is not None:
            stats.update(
                iterations=star_rounds, label_rounds=0,
                star_rounds=star_rounds, algorithm="star",
            )
        return labels

    # no distinct(): label propagation only ever MIN-aggregates over the
    # neighbor list, and a min is idempotent under duplicate edges — the
    # dedupe would cost a full extra shuffle of the edge list for zero
    # semantic effect (the LSH pair generators already emit unique
    # pairs; a caller with pathologically duplicated edges pays in join
    # width, not correctness, and can pre-distinct itself)
    # symmetrize with ONE pass over the edge lineage: a union of the two
    # orientations evaluates the whole upstream pair-generation pipeline
    # once PER BRANCH (Catalyst shares no subtrees across union arms —
    # measured on dedup_clusters' LSH edges: 6 joins / 16 parquet scans
    # in the union plan vs 3 / 8 with the explode, r14-opt), while the
    # explode duplicates each edge map-side for free.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
                    F.struct(F.col(id_b).alias("src"), F.col(id_a).alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .persist()
    )
    # seed labels at the one-hop minimum (this IS round 1, fused into the
    # init aggregate); each loop round then carries the previous label
    # in-frame so the convergence check is a filter on the round's own
    # output, not an extra self-join
    labels = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("__mn"))
        .select("node", F.least(F.col("node"), F.col("__mn")).alias("label"))
        .persist()
    )
    label_budget = max_iter if algorithm == "label" else min(switch_after, max_iter)
    rounds = 0
    converged = False
    for _ in range(label_budget):
        rounds += 1
        neigh = (
            sym.join(
                labels.select(F.col("node").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("nl").alias("min_nl"))
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("min_nl", "label")).alias("label"),
                F.col("label").alias("__old"),
            )
            .persist()
        )
        changed = new_labels.filter(F.col("label") != F.col("__old")).limit(1).count()
        labels.unpersist()
        labels = new_labels.select("node", "label")
        if changed == 0:
            converged = True
            break
        # persist() truncates execution, not the LOGICAL plan — and each
        # round references the previous labels frame twice, so a long
        # label run (deep graphs under algorithm="label") accretes a
        # plan tree that DOUBLES per round until the analyzer chokes on
        # the plan string.  Cut the lineage every few rounds (2^4 = 16x
        # max string blow-up between cuts); auto mode rarely gets here
        # (switch_after bounds the loop).
        if rounds % 4 == 0:
            labels = labels.localCheckpoint(eager=True)
    star_rounds = 0
    if algorithm == "auto" and not converged:
        # hand off to the log-round phase, keeping the label rounds'
        # progress as in-component shortcut edges
        shortcuts = labels.filter(F.col("node") != F.col("label")).select(
            F.col("node").alias("a"), F.col("label").alias("b")
        )
        seed = pairs.unionByName(shortcuts).persist()
        seed.count()  # materialize through the persisted label frame
        labels.unpersist()
        labels, star_rounds = _alternating_star(seed, max_iter)
        seed.unpersist()
    if stats is not None:
        stats.update(
            iterations=rounds + star_rounds,
            label_rounds=rounds,
            star_rounds=star_rounds,
            algorithm=("auto:star" if star_rounds else algorithm),
        )
    sym.unpersist()
    return labels


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    stats: dict | None = None,
) -> DataFrame:
    """Fuzzy duplicate *clusters*: MinHash-LSH near-dup pairs grouped into
    connected components; every document gets a cluster id (the smallest
    doc id in its component — singletons are their own cluster) and a
    keeper flag.  This is the full "which rows do I drop" answer a
    training-data dedup pass needs, not just the pairs."""
    edges = minhash_lsh_pairs(
        df, text_col=text_col, id_col=id_col, n=n, k=k, bands=bands, threshold=threshold
    ).select("id_a", "id_b")
    cc = connected_components(edges, stats=stats)
    out = df.select(F.col(id_col).alias("doc_id")).join(
        cc.select(F.col("node").alias("doc_id"), "label"), "doc_id", "left"
    )
    cluster = F.coalesce("label", "doc_id")
    return out.select(
        "doc_id",
        cluster.alias("cluster_id"),
        (cluster == F.col("doc_id")).alias("is_keeper"),
    )


def cross_doc_ngram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Duplicated-passage detection: for every document, the fraction of
    its positional token ``n``-grams that also occur in at least
    ``min_docs`` distinct documents (ExactSubstr-lite — the aggregate
    signal of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", computed at n-gram granularity instead of
    suffix arrays).  Doc-level MinHash misses a boilerplate paragraph
    pasted into thousands of otherwise-distinct pages; this operator is
    the passage-level complement.

    Returns ``(doc_id, n_ngrams, dup_ngram_frac, max_ngram_df)`` for
    every document with at least ``n`` tokens.  ``max_ngram_df`` is the
    widest spread of any single n-gram in the doc (how many documents
    share its most-shared passage).

    Scale shape: the n-gram stream is hashed to 64-bit before it ever
    shuffles (8-byte keys, not 30-byte strings; xxhash64 collisions at
    corpus scale are ~|grams|^2 / 2^65 — immaterial for counting).  Plan
    is aggregate-first: ONE explicit hash exchange on the gram key
    feeds both the per-(gram, doc) count (HashPartitioning(h) satisfies
    the (h, doc) clustered distribution, so the aggregate inserts no
    second exchange) and the gram->doc-frequency COUNT window over the
    same partitioning.  The window spelling replaces the old
    ``per_doc_gram.groupBy(h)`` + join-back, which — because Catalyst
    does not share common subtrees across join branches — re-ran the
    whole scan -> tokenize -> gram-explode -> aggregate chain a second
    time just to build the doc-frequency table (guide §7.2 "duplicated
    subtrees"; 2 full text scans in the r14 plan dump, now 1).  No
    O(n^2) stage, no driver state; partial aggregation combines
    map-side before the one full-stream wire.
    """
    toks = F.col("__toks")
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        F.col("__idx"),
        lambda i: F.xxhash64(
            F.concat_ws(
                " ", *[F.try_element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            )
        ),
    )
    pos = (
        df.withColumn("__toks", _tokens(text_col))
        .withColumn("__idx", idx)
        .select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("h"))
    )
    per_doc_gram = (
        pos.repartition(F.col("h"))
        .groupBy("h", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # doc frequency per gram: one row per (h, doc) above, so a COUNT
    # window over h IS the distinct-doc count — same integer the old
    # groupBy(h) + join computed, without re-reading the gram lineage
    n_docs_w = F.count(F.lit(1)).over(Window.partitionBy("h"))
    shared = F.when(F.col("n_docs") >= min_docs, F.col("c")).otherwise(F.lit(0))
    return (
        per_doc_gram.withColumn("n_docs", n_docs_w)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.round(
                F.sum(shared).cast("double") / F.sum("c").cast("double"), 6
            ).alias("dup_ngram_frac"),
            F.max("n_docs").alias("max_ngram_df"),
        )
    )


def remove_dup_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    out_col: str = "text_clean",
) -> DataFrame:
    """Duplicated-span REMOVAL (ExactSubstr-lite, the removal step of
    Lee et al. 2022 that :func:`cross_doc_ngram_stats` only detects):
    every token covered by at least one positional ``n``-gram that
    occurs in >= ``min_docs`` DISTINCT documents is dropped from every
    document; the survivors are re-joined in order.  This removes the
    shared passage itself — the complement of
    :func:`~..text.strip_boilerplate`'s line rule for chrome that does
    not respect line boundaries (inlined disclaimers, pasted paragraphs,
    quoted templates).

    Emits ``out_col`` (space-joined surviving tokens — token-level
    removal necessarily normalizes whitespace) plus audit columns
    ``n_tokens`` and ``n_dup_tokens`` (tokens removed).  Gram identity
    is case-insensitive (same canonicalization as the detection pass);
    the rebuilt text keeps original token casing.  Rows never disappear:
    the rebuild joins back LEFT, and a NULL ``id_col`` row passes
    through unprocessed (original text, trivial audits) — same policy as
    ``strip_boilerplate``.  For exact audits ``id_col`` should be
    unique.

    Plan shape (the 100 TB shape; no driver state, no O(n^2) stage):
    positional gram hashes (xxhash64, 8-byte shuffle keys) -> two-level
    distinct doc-frequency aggregate -> semi join flags duplicated gram
    STARTS -> explode each start into its ``n`` covered positions,
    distinct -> (doc, pos) join onto the exploded tokens -> one
    order-preserving per-doc rebuild (``array_sort(collect_list)``).
    Every exchange is keyed on uniform hashes, (doc, pos) pairs, or the
    doc id; partial aggregation runs before each wire.

    CLEAN-DOC FAST PATH (VERDICT r11 item 4): only documents owning at
    least one duplicated-gram start enter the token-level explode +
    rebuild — everything else flows through the LEFT-join fallback
    with the identical output (``concat_ws`` over its own tokens, the
    whitespace normalization the rebuild applies anyway).  In a real
    post-dedup corpus most docs are clean, so the two token-granular
    shuffles shrink proportionally to the dup fraction instead of
    running corpus-wide.  The gram side is unchanged and the dirty-doc
    set reuses its exchanges (AQE ReusedExchange).  With duplicate
    ``id_col`` values a clean row no longer merges into its dirty
    twin's rebuild — exact audits need unique ids (documented above)."""
    if out_col == text_col:
        # the NULL-id fallback must read the original text AFTER base
        # drops out_col — in-place replacement would reference a dropped
        # column; chain Corpus.remove_dup_passages for in-place semantics
        raise ValueError(
            "out_col must differ from text_col (use "
            "Corpus.remove_dup_passages for in-place replacement)"
        )
    text_safe = F.coalesce(F.col(text_col), F.lit(""))
    toks_raw = F.split(F.trim(text_safe), WS_RE)
    toks_low = F.split(F.trim(F.lower(text_safe)), WS_RE)
    staged = df.select(
        F.col(id_col).alias("__doc"),
        toks_raw.alias("__t"),
        toks_low.alias("__tl"),
    )
    tl = F.col("__tl")
    idx = F.when(
        F.size(tl) >= n, F.sequence(F.lit(0), F.size(tl) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        F.col("__idx"),
        lambda i: F.struct(
            i.cast("int").alias("s"),
            F.xxhash64(
                F.concat_ws(
                    " ",
                    *[F.try_element_at(tl, (i + j + 1).cast("int"))
                      for j in range(n)],
                )
            ).alias("h"),
        ),
    )
    pos = (
        staged.withColumn("__idx", idx)
        .select("__doc", F.explode(grams).alias("g"))
        .select("__doc", F.col("g.s").alias("s"), F.col("g.h").alias("h"))
    )
    # NOTE (r14 optimization round, measured dead end kept on purpose):
    # the doc-frequency side below re-runs pos's scan -> tokenize ->
    # gram-explode lineage (Catalyst shares no subtrees across join
    # branches), and two rewrites that "fix" the duplicate scan were
    # BOTH slower — (a) repartition(h) + reused exchange feeding both
    # sides (interleaved A/B at sf0.1: old 1.5-1.8s vs 1.7-2.4s) and
    # (b) collect_list + COUNT window (1.34s -> ~2s).  First-principles
    # reason: this shape never shuffles ``pos`` at all — only the
    # map-side-combined (h, doc) distinct crosses the wire (~16 B/gram)
    # and the duplicated-gram keys broadcast back; both rewrites traded
    # a cheap embarrassingly-parallel text re-scan for an extra
    # full-gram-stream exchange (~20 B/gram) read once or twice.  At
    # 100 TB text bytes/token (~6 B) < gram metadata bytes/token, so
    # the trade is wrong at scale too (guide §2.3: the shuffle is the
    # expensive currency, the scan is not).
    dup = (
        pos.select("h", "__doc")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    starts = pos.join(dup, "h", "left_semi")
    covered = (
        starts.select(
            "__doc",
            F.explode(F.sequence(F.col("s"), F.col("s") + (n - 1))).alias("p"),
        )
        .distinct()
    )
    # docs owning >= 1 duplicated-gram start: only these pay the
    # token-level explode + rebuild; clean docs take the fallback.
    # Derived FROM covered (not from starts) so the expensive gram
    # lineage appears twice BYTE-IDENTICALLY and Spark's ReuseExchange
    # computes it once — a separate starts.select(__doc) projection
    # would re-aggregate the whole gram stream a second time.
    dirty = covered.select("__doc").distinct()
    tokpos = (
        staged.join(dirty, "__doc", "left_semi")
        .select("__doc", F.posexplode("__t"))
        .withColumnRenamed("pos", "p")
        .withColumnRenamed("col", "__tok")
    )
    flagged = tokpos.join(
        covered.withColumn("__cov", F.lit(True)), ["__doc", "p"], "left"
    ).withColumn("__cov", F.coalesce("__cov", F.lit(False)))
    rebuilt = flagged.groupBy("__doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("__cov").cast("bigint")).alias("n_dup_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__cov"),
                            F.struct("p", F.col("__tok").alias("t")),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
        ).alias(out_col),
    )
    base = df.drop(out_col, "n_tokens", "n_dup_tokens")
    joined = base.join(
        rebuilt.select(
            F.col("__doc").alias(id_col), out_col, "n_tokens", "n_dup_tokens"
        ),
        id_col,
        "left",
    )
    # fallback output: CLEAN docs (excluded from the rebuild by the
    # fast path) get the same whitespace normalization the rebuild
    # would have produced — concat_ws over their own tokens; NULL-id
    # rows keep the documented pass-through (original text)
    clean_text = F.when(
        F.col(id_col).isNotNull(), F.concat_ws(" ", toks_raw)
    ).otherwise(F.coalesce(F.col(text_col), F.lit("")))
    return (
        joined
        .withColumn(out_col, F.coalesce(out_col, clean_text))
        .withColumn(
            "n_tokens",
            F.coalesce("n_tokens", F.size(toks_raw).cast("bigint")),
        )
        .withColumn(
            "n_dup_tokens", F.coalesce("n_dup_tokens", F.lit(0).cast("bigint"))
        )
    )
