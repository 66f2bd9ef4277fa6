"""Fluent corpus pipeline — the training-data analog of ``CtdFrame``.

``Corpus`` wraps a document DataFrame (``doc_id``, ``text``, optional
``source``) and chains the cleaning -> dedup -> mix -> pack stages a
large-scale pipeline actually runs, each step lazily extending the
Catalyst plan:

    clean = (Corpus(docs)
             .normalize()                   # FIRST: hashes must compare
             .gopher_filter()               # hard quality rules
             .quality_score().filter("quality > 0.5")
             .redact_numbers()
             .decontaminate(benchmark_docs, n=13)
             .dedup()                       # fuzzy, cluster keepers
             .domain_mix({"web": 1e9, "code": 2e8})
             .pack(max_tokens=2048))
    clean.df.write.parquet("out/")          # still lazy until here

``normalize()`` belongs at the head of the chain: every downstream
signature (exact hash, shingle minhash, simhash) only compares across
sources after control-char/whitespace/case canonicalization — two
crawls of one page differing in \\r\\n vs \\n must dedup together.

Chainable steps return a new ``Corpus``; point analyses that produce a
different row shape (pair tables, reports, top-k) return plain
DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from python_ctd_spark.operators import assemble, dedup, sampling, text
from python_ctd_spark.operators._util import WS_RE


class Corpus:
    """Chainable, lazy view over a document-table DataFrame."""

    def __init__(self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 domain_col: str = "source"):
        self.df = df
        self.id_col = id_col
        self.text_col = text_col
        self.domain_col = domain_col

    def _wrap(self, df: DataFrame) -> "Corpus":
        return Corpus(df, self.id_col, self.text_col, self.domain_col)

    @classmethod
    def from_jsonl(cls, spark, path: str, schema=None, **kw) -> "Corpus":
        """Corpus over JSONL shards: explicit-schema read, malformed
        lines quarantined and dropped (archive them separately via
        io.corrupt_records if needed)."""
        from python_ctd_spark.io import read_documents_jsonl, valid_records

        return cls(valid_records(read_documents_jsonl(spark, path, schema)), **kw)

    @classmethod
    def from_csv(cls, spark, path: str, schema=None, **kw) -> "Corpus":
        """Corpus over CSV shards (multiline-quoted documents), same
        quarantine contract as :meth:`from_jsonl`."""
        from python_ctd_spark.io import read_documents_csv, valid_records

        return cls(valid_records(read_documents_csv(spark, path, schema)), **kw)

    # -- chainable pipeline stages --------------------------------------
    def filter(self, condition) -> "Corpus":
        return self._wrap(self.df.filter(condition))

    def normalize(self, lowercase: bool = True) -> "Corpus":
        """Control-char strip + whitespace collapse + trim (+ lower),
        REPLACING the text column — run first so downstream hashes and
        features are comparable across sources."""
        out = text.normalize_text(
            self.df, self.text_col, out_col="__norm", lowercase=lowercase
        ).drop(self.text_col).withColumnRenamed("__norm", self.text_col)
        return self._wrap(out)

    def strip_boilerplate(self, min_docs: int = 5,
                          min_line_chars: int = 4) -> "Corpus":
        """Remove lines appearing in >= min_docs DISTINCT documents
        (:func:`..operators.text.strip_boilerplate` — the C4/RefinedWeb
        template-chrome rule), REPLACING the text column; the
        n_lines/n_boiler audit columns ride along."""
        out = text.strip_boilerplate(
            self.df, self.text_col, id_col=self.id_col,
            min_docs=min_docs, min_line_chars=min_line_chars,
            out_col="__clean",
        ).drop(self.text_col).withColumnRenamed("__clean", self.text_col)
        return self._wrap(out)

    def strip_markup(self) -> "Corpus":
        """HTML -> plain text (:func:`..operators.markup.strip_markup`):
        script/style content, comments, tags, entities, whitespace —
        the extraction stage that belongs BEFORE :meth:`normalize` on a
        web-crawl corpus, REPLACING the text column; the per-step audit
        counts (n_script/n_style/n_comment/n_tag/n_entities) ride
        along."""
        from python_ctd_spark.operators import markup

        out = (
            markup.strip_markup(self.df, self.text_col, out_col="__plain")
            .drop(self.text_col)
            .withColumnRenamed("__plain", self.text_col)
        )
        return self._wrap(out)

    def extract_links(self, base_col: str | None = None) -> DataFrame:
        """Per-link URL table (:func:`..operators.markup.extract_links`):
        one row per URL-bearing tag (``a``/``img``/``link``/``script``)
        with the normalized domain and blocklist flag; pass ``base_col``
        (the page-URI column, e.g. the WARC target URI) to resolve
        relative references before domain analysis.  A point analysis
        (different row shape), so a plain DataFrame, run BEFORE
        :meth:`strip_markup` removes the tags."""
        from python_ctd_spark.operators import markup

        return markup.extract_links(
            self.df, self.text_col, id_col=self.id_col, base_col=base_col
        )

    def robots_rules(self, domain_col: str | None = None) -> DataFrame:
        """Parse robots.txt payloads held in this corpus into the
        per-(agent, directive) rules table
        (:func:`..operators.robots.robots_rules`) — feed it to
        ``apply_robots`` over an :meth:`extract_links` result to flag
        disallowed URLs.  A point analysis (different row shape), so a
        plain DataFrame."""
        from python_ctd_spark.operators import robots

        return robots.robots_rules(
            self.df,
            text_col=self.text_col,
            domain_col=domain_col or self.domain_col,
        )

    def sitemap_urls(self, domain_col: str | None = None) -> DataFrame:
        """Parse sitemap XML payloads held in this corpus into the
        ``(domain, kind, url, lastmod)`` entry table
        (:func:`..operators.robots.sitemap_urls`; ``sitemap`` rows are
        nested index entries a frontier builder recurses on).  A point
        analysis (different row shape), so a plain DataFrame."""
        from python_ctd_spark.operators import robots

        return robots.sitemap_urls(
            self.df,
            text_col=self.text_col,
            domain_col=domain_col or self.domain_col,
        )

    def extract_meta_refresh(self, base_col: str | None = None) -> DataFrame:
        """Client-side redirect edges
        (:func:`..operators.markup.extract_meta_refresh`): one row per
        ``<meta http-equiv=refresh>`` tag carrying a target, resolved
        against ``base_col`` (the page-URI column) when given.  Run
        BEFORE :meth:`strip_markup` removes the tags."""
        from python_ctd_spark.operators import markup

        return markup.extract_meta_refresh(
            self.df, self.text_col, id_col=self.id_col, base_col=base_col
        )

    def extract_link_rels(self, base_col: str | None = None) -> DataFrame:
        """Typed ``<link rel=...>`` relations
        (:func:`..operators.markup.extract_link_rels`):
        canonical/alternate/amphtml/prev/next edges resolved against
        ``base_col`` (the page-URI column) when given.  Run BEFORE
        :meth:`strip_markup` removes the tags."""
        from python_ctd_spark.operators import markup

        return markup.extract_link_rels(
            self.df, self.text_col, id_col=self.id_col, base_col=base_col
        )

    def diversity_sample(self, assignments: DataFrame, per_cell: int) -> "Corpus":
        """Cluster-balanced subset
        (:func:`..operators.curation.cluster_balanced_sample`): an equal
        deterministic-hash budget from every cell of a stored embedding
        assignment table (``(id, cell)`` keyed by this corpus's doc
        ids), left-semi-joined back so every corpus column survives —
        the coverage complement of embedding-level dedup."""
        from pyspark.sql import functions as F

        from python_ctd_spark.operators.curation import cluster_balanced_sample

        kept = cluster_balanced_sample(
            assignments, per_cell, id_col="id"
        ).select(F.col("id").alias(self.id_col))
        return self._wrap(self.df.join(kept, self.id_col, "left_semi"))

    def dedup_lines(self) -> "Corpus":
        """Collapse repeated lines inside each document (first occurrence
        kept, order preserved), REPLACING the text column; the
        n_lines/n_removed audit columns ride along."""
        out = (
            text.dedup_lines(self.df, self.text_col, out_col="__dl")
            .drop(self.text_col)
            .withColumnRenamed("__dl", self.text_col)
        )
        return self._wrap(out)

    def quantile_filter(self, value_col: str, q_lo: float = 0.01,
                        q_hi: float = 0.99, per_domain: bool = True) -> "Corpus":
        """Trim rows outside the [q_lo, q_hi] band of ``value_col``
        (per domain by default) — the outlier cut that usually follows
        quality_score / text_stats."""
        from python_ctd_spark.operators.sampling import quantile_band_filter

        return self._wrap(
            quantile_band_filter(
                self.df, value_col, q_lo, q_hi,
                by=self.domain_col if per_domain else None,
            )
        )

    def quality_score(self) -> "Corpus":
        return self._wrap(text.quality_score(self.df, self.text_col))

    def lang_id(self, out_col: str = "pred_lang") -> "Corpus":
        return self._wrap(text.lang_id(self.df, self.text_col, out_col))

    def filter_lang(self, lang: str) -> "Corpus":
        """Keep documents the heuristic identifies as ``lang`` (runs
        lang_id if the prediction column is absent, drops it after)."""
        from pyspark.sql import functions as F

        scored = (
            self.df
            if "pred_lang" in self.df.columns
            else text.lang_id(self.df, self.text_col, "pred_lang")
        )
        kept = scored.filter(F.col("pred_lang") == lang)
        if "pred_lang" not in self.df.columns:
            kept = kept.drop(
                "pred_lang", *[c for c in kept.columns if c.startswith("hits_")]
            )
        return self._wrap(kept)

    def redact_numbers(self, out: str = "redacted", marker: str = "#") -> "Corpus":
        return self._wrap(text.redact_numbers(self.df, self.text_col, out, marker))

    def redact_pii(self, out: str = "redacted") -> "Corpus":
        """Breadth PII scrub (:func:`..operators.text.redact_pii`):
        emails/UUIDs/IPv4/phones/digit runs to typed markers with
        per-pattern audit counts."""
        return self._wrap(text.redact_pii(self.df, self.text_col, out))

    def sample(self, rate: float) -> "Corpus":
        return self._wrap(sampling.bernoulli_sample(self.df, self.id_col, rate))

    def exact_sample(self, k: int, per_domain: bool = True) -> "Corpus":
        """Exactly min(k, group size) docs (per domain by default) in
        deterministic hash order — fixed budgets, not expected values."""
        return self._wrap(
            sampling.exact_sample(
                self.df, k, self.id_col,
                by=self.domain_col if per_domain else None,
            )
        )

    def unigram_logprob(self) -> DataFrame:
        """Per-doc average unigram log-likelihood under the corpus's own
        distribution (cheap perplexity proxy; rank-filter on it)."""
        return text.unigram_logprob(self.df, self.text_col, self.id_col)

    def bigram_logprob(self, ref: DataFrame | None = None,
                       ref_text_col: str | None = None) -> DataFrame:
        """Per-doc average bigram log-likelihood — under this corpus's
        own LM, or a trusted REFERENCE corpus's (the CCNet usage; pass
        ``ref``).  Catches repeated-token salad a unigram model ranks
        above prose."""
        aligned = None if ref is None else self._bench_aligned(ref, ref_text_col)
        return text.bigram_logprob(
            self.df, self.text_col, self.id_col, ref=aligned
        )

    def stratified_sample(self, rates: dict, default_rate: float = 0.0) -> "Corpus":
        return self._wrap(
            sampling.stratified_sample(
                self.df, self.id_col, self.domain_col, rates, default_rate
            )
        )

    def _bench_aligned(self, benchmark: DataFrame,
                       bench_text_col: str | None) -> DataFrame:
        """The dedup operators read ONE text_col name from both frames;
        benchmarks usually arrive with their own schema ("text"), so
        align the caller-named (or conventionally-named) column to this
        corpus's text_col before probing."""
        src = bench_text_col
        if src is None:
            src = self.text_col if self.text_col in benchmark.columns else "text"
        if src == self.text_col:
            return benchmark
        return benchmark.withColumnRenamed(src, self.text_col)

    def decontaminate(self, benchmark: DataFrame, n: int = 13,
                      bench_text_col: str | None = None) -> "Corpus":
        return self._wrap(
            dedup.decontaminate(
                self.df, self._bench_aligned(benchmark, bench_text_col),
                self.text_col, self.id_col, n,
            )
        )

    def dedup_exact(self) -> "Corpus":
        """Keep one document per exact content hash (the min-id keeper)."""
        keepers = dedup.exact_dedup(self.df, self.text_col, self.id_col).select(
            "keeper_id"
        )
        return self._wrap(
            self.df.join(
                keepers.withColumnRenamed("keeper_id", self.id_col), self.id_col, "semi"
            )
        )

    def dedup(self, threshold: float = 0.5) -> "Corpus":
        """Fuzzy dedup: MinHash-LSH pairs -> connected components -> keep
        one representative per cluster."""
        from pyspark.sql import functions as F

        # dedup_clusters normalizes its id column to the literal name
        # "doc_id" (same contract as in split()); alias it back so any
        # caller-chosen id_col works
        clusters = dedup.dedup_clusters(
            self.df, text_col=self.text_col, id_col=self.id_col, threshold=threshold
        )
        keepers = clusters.filter("is_keeper").select(
            F.col("doc_id").alias(self.id_col)
        )
        return self._wrap(self.df.join(keepers, self.id_col, "semi"))

    def chunk(self, window: int = 512, stride: int | None = None) -> DataFrame:
        """Token-window chunks (overlapping when stride < window) —
        the RAG / fixed-context prep fan-out; returns the chunk table
        (different row shape, so a plain DataFrame)."""
        return text.chunk_documents(
            self.df, window=window, stride=stride,
            text_col=self.text_col, id_col=self.id_col,
        )

    def signatures(self) -> DataFrame:
        """The storable MinHash signature index of this corpus —
        persist it once per snapshot and feed it to
        :meth:`dedup_against` for each arriving shard."""
        return dedup.minhash_signatures(self.df, self.text_col, self.id_col)

    def dedup_against(self, index: DataFrame, threshold: float = 0.5) -> "Corpus":
        """Rolling-ingest dedup: drop documents that near-duplicate the
        existing corpus, probing its stored signature ``index`` (from
        :meth:`signatures`) — the historical text is never re-read."""
        verdicts = dedup.incremental_dedup(
            self.df, index, self.text_col, self.id_col, threshold=threshold
        )
        keep = verdicts.filter("NOT is_dup").select(self.id_col)
        return self._wrap(self.df.join(keep, self.id_col, "semi"))

    def domain_mix(self, targets: dict) -> "Corpus":
        return self._wrap(
            assemble.domain_mix(self.df, targets, self.id_col, self.domain_col)
        )

    def domain_mix_temperature(self, total: float, alpha: float = 0.7) -> "Corpus":
        """Temperature mixture: sample domains with p ~ n^alpha scaled
        to an expected ``total`` docs — no hand-written targets; alpha<1
        upweights the low-resource tail."""
        return self._wrap(
            assemble.domain_mix_temperature(
                self.df, total, alpha, self.id_col, self.domain_col
            )
        )

    def pack(self, max_tokens: int = 2048, strategy: str = "fixed",
             **kw) -> "Corpus":
        """Context packing; ``strategy="greedy"`` + ``greedy_chunk=...``
        and ``num_buckets=...`` pass through to
        :func:`..operators.assemble.pack_documents`.

        The operator returns a compact ASSIGNMENT table (id, n_tokens,
        pack_id) so the prefix-sum shuffle never carries text; the
        fluent form joins the assignment back onto the corpus (id-keyed
        equi-join) so the chain keeps every column — a packed corpus you
        cannot write shards from would dead-end the pipeline."""
        asg = assemble.pack_documents(
            self.df, max_tokens, self.text_col, self.id_col, self.domain_col,
            strategy=strategy, **kw,
        ).select(self.id_col, "n_tokens", "pack_id")
        # LEFT join: a NULL id can never equi-join, and the fluent chain
        # must not delete rows (such a row keeps NULL assignment columns)
        return self._wrap(
            self.df.drop("n_tokens", "pack_id").join(asg, self.id_col, "left")
        )

    def train_tokenizer(
        self,
        save_path: str | None = None,
        n_merges: int = 512,
        min_word_freq: int = 2,
        max_vocab: int | None = 500_000,
    ) -> list[tuple[str, str]]:
        """Train a byte-level BPE merge table ON this corpus
        (:func:`..operators.text.bpe_train`: one distributed counting
        pass with driver-state caps on by default, then the shared
        merge loop) and optionally persist it in the GPT-2 merges
        format (:func:`..functions.bpe.save_merges`) so later sessions
        :meth:`tokenize` with ``merges_path=save_path`` — the complete
        train-once/store/tokenize-forever lifecycle as one fluent
        surface."""
        from .functions.bpe import save_merges
        from .operators.text import bpe_train

        merges = bpe_train(
            self.df, self.text_col, n_merges=n_merges,
            min_word_freq=min_word_freq, max_vocab=max_vocab,
        )
        if save_path is not None:
            save_merges(
                merges, save_path,
                header=f"byte-level BPE merges ({len(merges)} merges)",
            )
        return merges

    def train_quality_classifier(
        self,
        seed_good: DataFrame,
        seed_bad: DataFrame,
        iters: int = 3,
        lr: float = 5.0,
        seed_text_col: str | None = None,
    ) -> list[float]:
        """Train logistic-regression quality weights on labeled seed
        frames (:func:`..operators.classify.train_quality_classifier`:
        quantized features, exact BIGINT gradient sums, rational fast
        sigmoid — engine-portable and partition-invariant).  Seeds may
        carry their own text column name (``seed_text_col``, defaulting
        to this corpus's) — the CCNet pattern is good = a reference
        corpus, bad = a crawl sample.  Returns the weight vector (tiny
        driver state); feed it to :meth:`score_quality`."""
        from python_ctd_spark.operators.classify import train_quality_classifier

        return train_quality_classifier(
            self._bench_aligned(seed_good, seed_text_col),
            self._bench_aligned(seed_bad, seed_text_col),
            text_col=self.text_col, iters=iters, lr=lr,
        )

    def score_quality(self, weights: list[float],
                      out_col: str = "quality_prob") -> "Corpus":
        """Map-side scoring under trained classifier weights
        (:func:`..operators.classify.score_quality_classifier`); filter
        on ``out_col`` downstream."""
        from python_ctd_spark.operators.classify import score_quality_classifier

        return self._wrap(
            score_quality_classifier(self.df, weights, self.text_col, out_col)
        )

    def tokenize(self, merges_path: str | None = None,
                 out_col: str = "token_ids") -> "Corpus":
        """Real byte-level BPE token IDS
        (:func:`..operators.text.bpe_tokenize`): map-side, broadcast
        merge table, rank-derived canonical vocabulary."""
        return self._wrap(
            text.bpe_tokenize(self.df, self.text_col, merges_path, out_col)
        )

    def pack_sequences(self, seq_len: int = 2048,
                       tokens_col: str = "token_ids", **kw) -> DataFrame:
        """Fixed-length training sequences from :meth:`tokenize` output
        (:func:`..operators.assemble.pack_sequences`) — different row
        shape, so a plain DataFrame: one row per ``seq_len``-token
        window with document-boundary offsets."""
        return assemble.pack_sequences(
            self.df, tokens_col, seq_len, self.id_col, self.domain_col, **kw
        )

    def shard(self, n_shards: int, seed: str = "") -> "Corpus":
        """Deterministic global shuffle + balanced shard assignment
        (:func:`..operators.assemble.shard_documents`): vary ``seed``
        per epoch for a reproducible per-epoch re-deal."""
        return self._wrap(
            assemble.shard_documents(self.df, n_shards, self.id_col, seed)
        )

    def split(self, fractions: dict, threshold: float = 0.5,
              seed: str = "") -> "Corpus":
        """Leakage-safe train/val/test assignment
        (:func:`..operators.assemble.leakage_safe_split`): the split
        decision hashes the document's fuzzy-dedup CLUSTER id, so
        near-duplicates never straddle the train/test boundary."""
        from pyspark.sql import functions as F

        # dedup_clusters normalizes its id column to the literal name
        # "doc_id"; alias it back so any caller-chosen id_col works
        clusters = dedup.dedup_clusters(
            self.df, text_col=self.text_col, id_col=self.id_col,
            threshold=threshold,
        ).select(F.col("doc_id").alias(self.id_col), "cluster_id")
        return self._wrap(
            assemble.leakage_safe_split(
                self.df, clusters, fractions, self.id_col, seed
            )
        )

    def gopher_filter(self, min_words: int = 50,
                      max_words: int = 100_000) -> "Corpus":
        """Chainable form of :meth:`gopher_rules`: keep only documents
        passing every hard rule (the audit sidecar stays available via
        ``gopher_rules()``).  Semi join on the verdict conjunction."""
        from pyspark.sql import functions as F

        keep = self.gopher_rules(min_words, max_words).filter("keep").select(
            self.id_col
        )
        return self._wrap(self.df.join(keep, self.id_col, "semi"))

    # -- point analyses (different row shape -> plain DataFrames) --------
    def duplicate_pairs(self, threshold: float = 0.5) -> DataFrame:
        return dedup.minhash_lsh_pairs(
            self.df, self.text_col, self.id_col, threshold=threshold
        )

    def containment_pairs(self, threshold: float = 0.9) -> DataFrame:
        return dedup.containment_pairs(
            self.df, self.text_col, self.id_col, threshold=threshold
        )

    def contamination_report(self, benchmark: DataFrame, n: int = 13,
                             bench_text_col: str | None = None) -> DataFrame:
        return dedup.contamination_report(
            self.df, self._bench_aligned(benchmark, bench_text_col),
            self.text_col, self.id_col, n,
        )

    def tfidf_top_terms(self, k: int = 3) -> DataFrame:
        return text.tfidf_top_terms(self.df, self.text_col, self.id_col, k)

    def repetition_stats(self) -> DataFrame:
        return text.repetition_stats(self.df, self.text_col, self.id_col)

    def drop_duplicated_passages(
        self, max_dup_frac: float = 0.5, n: int = 5, min_docs: int = 2
    ) -> "Corpus":
        """Drop documents whose shared-passage fraction exceeds
        ``max_dup_frac`` (boilerplate-heavy pages that doc-level dedup
        keeps because the page as a whole is unique).  Left-anti join on
        the flagged ids — documents shorter than ``n`` tokens have no
        passages and always survive."""
        from pyspark.sql import functions as F

        flagged = self.dup_passage_stats(n=n, min_docs=min_docs).filter(
            F.col("dup_ngram_frac") > max_dup_frac
        ).select(F.col("doc_id").alias(self.id_col))
        return self._wrap(self.df.join(flagged, self.id_col, "left_anti"))

    def remove_dup_passages(self, n: int = 5, min_docs: int = 2) -> "Corpus":
        """Strip duplicated SPANS (tokens covered by cross-document
        n-grams, :func:`..operators.dedup.remove_dup_passages`) from
        every document, REPLACING the text column; n_tokens/n_dup_tokens
        audit columns ride along.  The removal complement of
        :meth:`drop_duplicated_passages` (which drops whole documents)."""
        out = dedup.remove_dup_passages(
            self.df, self.text_col, id_col=self.id_col,
            n=n, min_docs=min_docs, out_col="__rp",
        ).drop(self.text_col).withColumnRenamed("__rp", self.text_col)
        return self._wrap(out)

    def gopher_rules(self, min_words: int = 50, max_words: int = 100_000) -> DataFrame:
        """Gopher-style hard quality rules: named boolean verdicts per
        rule plus the conjunction (filter + audit in one pass)."""
        return text.gopher_rules(
            self.df, self.text_col, self.id_col,
            min_words=min_words, max_words=max_words,
        )

    def dup_passage_stats(self, n: int = 5, min_docs: int = 2) -> DataFrame:
        """Cross-document duplicated-passage fractions (passage-level
        complement of doc-level dedup): per doc, the share of positional
        token n-grams shared with >= min_docs documents."""
        return dedup.cross_doc_ngram_stats(
            self.df, self.text_col, self.id_col, n=n, min_docs=min_docs
        )

    def approx_domain_stats(self, rsd: float = 0.05, accuracy: int = 1000) -> DataFrame:
        """The 100 TB form of :meth:`domain_stats`: HLL++ distinct
        estimate + approximate percentiles, constant-size mergeable
        state per group (see operators/sketches.py for the
        accuracy-report twin)."""
        from python_ctd_spark.operators.sketches import approx_corpus_stats

        return approx_corpus_stats(
            self.df, self.domain_col, self.text_col, rsd=rsd, accuracy=accuracy
        )

    def sketch_accuracy(self, rsd: float = 0.05, accuracy: int = 1000) -> DataFrame:
        """Per-domain verdicts of the sketches against their exact
        twins (HLL++ within 3*rsd, percentile ranks within n/accuracy) —
        run on a sample before trusting :meth:`approx_domain_stats` at
        fleet scale."""
        from python_ctd_spark.operators.sketches import sketch_accuracy_report

        return sketch_accuracy_report(
            self.df, self.domain_col, self.text_col, rsd=rsd, accuracy=accuracy
        )

    def frequent_tokens(self, threshold_frac: float = 0.01,
                        capacity: int | None = None) -> DataFrame:
        """Exact tokens at >= threshold_frac of all token instances
        (:func:`..operators.sketches.heavy_hitters` over the exploded
        whitespace tokens): the vocabulary never shuffles, only the
        Misra-Gries candidate superset does."""
        from pyspark.sql import functions as F

        from python_ctd_spark.operators.sketches import heavy_hitters
        from python_ctd_spark.operators.text import tokens

        toks = self.df.select(F.explode(tokens(self.text_col)).alias("tok"))
        return heavy_hitters(toks, "tok", threshold_frac, capacity)

    def frequent_ngrams(self, n: int = 3, threshold_frac: float = 0.0002,
                        capacity: int | None = None) -> DataFrame:
        """Boilerplate-phrase mining: exact token ``n``-grams above
        threshold (:func:`..operators.text.frequent_ngrams`) — the
        discovery step before :meth:`strip_boilerplate`."""
        from python_ctd_spark.operators.text import frequent_ngrams

        return frequent_ngrams(
            self.df, self.text_col, n=n,
            threshold_frac=threshold_frac, capacity=capacity,
        )

    def domain_stats(self) -> DataFrame:
        """Per-domain doc/char totals, decimal-summed mean tokens, and
        exact token percentiles (swap percentile_approx at scale)."""
        from pyspark.sql import functions as F

        nt = F.size(F.split(F.trim(F.col(self.text_col)), WS_RE)).cast("double")
        staged = self.df.select(
            self.domain_col, nt.alias("nt"),
            F.length(self.text_col).cast("bigint").alias("nc"),
        )
        return staged.groupBy(self.domain_col).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nc").alias("total_chars"),
            (F.sum(F.col("nt").cast("decimal(25,6)")).cast("double")
             / F.count(F.lit(1))).alias("mean_tokens"),
            F.percentile("nt", F.array(F.lit(0.5), F.lit(0.9))).alias("token_pcts"),
        )

    # -- escape hatch ----------------------------------------------------
    def transform(self, fn, *args, **kwargs) -> "Corpus":
        return self._wrap(fn(self.df, *args, **kwargs))
