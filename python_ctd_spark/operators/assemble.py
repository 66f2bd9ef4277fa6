"""Dataset-assembly operators: domain mixture weighting and context
packing — the last mile of a training-data pipeline, after cleaning and
dedup.

Both are deterministic by construction (hash decisions / ordered
cumsums), so a re-run over 100 TB assembles the identical dataset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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


def pack_documents(
    df: DataFrame,
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "source",
) -> DataFrame:
    """Concat-and-chunk context packing: within each ``by`` stream
    (ordered by ``id_col``), documents are laid end to end and the token
    stream is cut into ``max_tokens``-sized context windows; a document
    is assigned the window its first token lands in.

    This is the fixed-boundary packing used by concat-then-chunk
    pretraining preprocessors.  (First-fit *greedy* packing — close each
    window early when the next doc doesn't fit — is a sequential
    decision per stream; if needed, run it per-domain with the bounded
    buffering pattern of streaming.stateful_despike.)

    Plan: token counts are a map-side projection; the start offset is an
    exclusive-prefix running sum on the (domain, id) window — one
    exchange, one sort, then the window assignment is integer division.
    """
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    w = Window.partitionBy(by).orderBy(id_col)
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("__start", start)
        .selectExpr(
            by, id_col, "n_tokens", f"__start div {int(max_tokens)} AS pack_id"
        )
    )
