"""Shared registry parameters (corpus geometry, serving-config
dials, mixture targets) used by BOTH the Spark-side queries in
__spark_entry__.py and the oracle SQL modules here.  Moved
verbatim from __spark_entry__.py (VERDICT r8 item 9)."""

_PQ_M = 8

_PQ_KSUB = 16

_PQ_MARGIN = 8

_NEARDUP_PLANES = 6

_NEARDUP_TABLES = 4

_EMB_DIM = 64

#: multiprobe width of the STORED-index serving config (ann_index_probe
#: + the lsh_served branch of the ann_recall audit).  Raised 1 -> 2 in
#: r7 after the audit measured mean recall 0.70 with 3/10 queries under
#: the 0.6 gate at 1 bit vs 0.98 with 10/10 passing at 2 bits, at no
#: measurable wall cost (probe fan-out is query-side only: 7 -> 22
#: buckets per (query, table); the stored index is untouched).  Trade
#: table in PLANS.md r7.
_SERVING_PROBE_BITS = 2

_SEQ_LEN = 128

_SMOOTH_WINDOW_LEN = 11

_IVF_CENTROIDS = 16

_IVF_PROBE = 3

_IVF_TRAIN_ITERS = 4

#: trained PQ codebooks (VERDICT r8 item 3): same train-once/store
#: lifecycle as _QUANTIZER_CACHE — pq_train's Lloyd loop is
#: integer-exact and order-independent, so the books are corpus-version
#: driver state, trained offline and reused by every encode/probe
_PQ_TRAIN_ITERS = 2

#: epoch micros of 2024-01-01 00:00:00 UTC — the single 1-day window all
#: driver-built stream rows land in (shared with the SQL oracles)
_STREAM_WINDOW_US = 1_704_067_200_000_000

#: new-shard bound for the streaming dedup row (keeps every new doc at
#: sf<=0.01; caps the per-round drain cost at larger SFs)
_STREAM_SHARD_BOUND = 2000

#: per-event-type keep rates: drop most views/clicks, keep every error —
#: the classic class-rebalancing shape of a training-data sampler.
_SAMPLE_RATES = {"view": 0.1, "click": 0.25, "error": 1.0}

#: domain-mix targets (docs per source): downsample two sources hard,
#: keep one whole (target above its count), drop every unlisted source.
_MIX_TARGETS = {"src0": 10.0, "src1": 40.0, "src2": 1e6, "src3": 12.0}

# the end-to-end training-dataset composition (VERDICT r8 item 1):
# clean -> dedup -> mix -> tokenize -> pack -> shard, one driver row.
# Mixture: ten sources kept whole, two downsampled, the other eight
# dropped — exercises all three domain_mix rate regimes in the tail.
_TD_TARGETS = {f"src{i}": 1e6 for i in range(10)} | {"src10": 8.0, "src11": 15.0}

_TD_SEQ_LEN = 128

_TD_SHARDS = 4

_TD_SEED = "r9"


_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}

#: bpe_train driver row: merge-table length — bounded so the shared
#: merge loop (O(n_merges x vocab) driver arithmetic, identical on both
#: sides) stays a small constant next to the distributed counting pass
#: the row actually audits.
_BPE_TRAIN_MERGES = 160
