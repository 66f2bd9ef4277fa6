"""Subset-curation operators: carving a *deliberately shaped* subset
out of a corpus, as opposed to the statistical samplers in
:mod:`.sampling` (which preserve the corpus's own density profile).

The first member is cluster-balanced diversity sampling — the
coverage-first complement of ``similarity.semantic_dedup``: dedup
removes redundancy while keeping the density profile; a balanced
sample *flattens* the density profile so every region of the
embedding space gets equal representation (eval-set carving, labeling
budgets, density-debiased seed sets — the cluster-based data-pruning
recipe).

Like every sampler in this repo, decisions are pure functions of
md5(row key): reproducible under retries, repartitionings, and
engines (the DuckDB oracle computes the identical integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cluster_balanced_sample(
    assignments: DataFrame,
    per_cell: int,
    id_col: str = "id",
    cell_col: str = "cell",
) -> DataFrame:
    """EXACTLY ``min(per_cell, cell size)`` rows from every cluster of
    a stored assignment table (:func:`..similarity.ivf_index`'s
    ``(id, cell)`` output), selected in deterministic hash order of the
    row id.

    A crawl-burst topic holding 40% of the corpus gets the same budget
    as a rare one, so the subset spans the embedding space instead of
    mirroring its density.  Use :func:`..similarity.semantic_dedup`
    when the goal is removing near-duplicates while keeping the
    density profile; use this when the goal is coverage.

    Output: ``(id_col, cell_col, rk)`` with ``rk`` in ``1..per_cell``
    — the rank is kept so a downstream consumer can carve a smaller
    budget (``rk <= b``) without re-running the sample, and sub-budgets
    are guaranteed prefixes of larger ones.

    Plan shape (same as ``sampling.exact_sample`` with ``by=``): one
    exchange on the cell key, then a rank window — Spark inserts a
    partial WindowGroupLimit *below* the exchange for this frame, so
    at most ``per_cell`` rows per cell per input partition cross the
    wire regardless of corpus size.  The skew ceiling is the hottest
    cell, and even that cell only ships ``per_cell x n_partitions``
    rows.
    """
    if per_cell < 1:
        raise ValueError(f"per_cell must be >= 1, got {per_cell}")
    from pyspark.sql import Window

    from .sampling import hash_uniform

    # hash_uniform is the repo's ONE deterministic-hash contract (the
    # DuckDB oracles compute the same integer numerator); ordering by
    # the uniform is identical to ordering by the numerator — the
    # division by 2^32 is exact in float64 (32-bit numerator, 53-bit
    # mantissa), a monotone bijection
    w = Window.partitionBy(cell_col).orderBy(
        hash_uniform(F.col(id_col)), F.col(id_col)
    )
    return (
        assignments.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_cell)
        .select(id_col, cell_col, "rk")
    )
