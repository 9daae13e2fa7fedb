"""Frozen configuration — the "same config ⇒ same clusters" contract.

Semantic constants are taken from the reference (OTMT) so that cluster
assignments are comparable at the same shingle/signature config:

- Simhash: f=64 bits, width-4 lowercase character shingles, md5 feature
  hash, majority bit vote with strict ``> 0`` rule — the library-default
  semantics of the ``simhash`` package the reference calls at
  ``otmt/metadata_calcluations.py:56-58`` and
  ``otmt/timemap_measures.py:235-247``.
- Chain-scan suppression: hamming/64 > 0.2 keeps a row, initial anchor is
  Simhash(0) (``bin/exclude_duplicates:27-29,84-103``).
- Exact-cluster rule: groups of >= 2 identical simhash values per slice;
  everything else is noise (-1) — the degenerate DBSCAN at
  ``bin/cluster_by_simhash:82-86``.
- Measure thresholds: ``otmt/timemap_measures.py:895-970``.

MinHash/LSH parameters are new-engine additions (the scale path that the
reference's exact per-pair Jaccard measure cannot take); b=16 bands x r=4
rows over K=64 permutations gives pair recall >= 0.99 at Jaccard 0.8
(1 - (1 - 0.8^4)^16 ≈ 0.9998) at half the signature bandwidth of K=128 —
the memory-bandwidth of the (shingles x K) min-reduction is the measured
signature-stage bottleneck under full task concurrency.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


# Measure thresholds and comparison directions, verbatim from the reference
# registry (otmt/timemap_measures.py:895-970). A memento/turn is OFF-topic
# when  score <direction> threshold  holds.
DEFAULT_THRESHOLDS: dict[str, tuple[str, float]] = {
    "cosine": ("<", 0.12),
    "bytecount": ("<", -0.43),
    "wordcount": ("<", -0.70),
    "tfintersection": (">", 0.0),
    "jaccard": (">", 0.96),
    "sorensen": (">", 0.93),
    "levenshtein": (">", 0.05),
    "nlevenshtein": (">", 0.05),
    "raw_simhash": (">", 38),
    "tf_simhash": (">", 34),
    "gensim_lsi": ("<", 0.07),
    "gensim_lda": ("<", 0.15),
    # collection-wide measures (otmt/collection_measures.py:195-214)
    "collection_jaccard": (">", 0.96),
    "collection_sorensen": (">", 0.96),
}


@dataclass(frozen=True)
class DedupConfig:
    """All knobs that affect signatures / candidate generation / clustering.

    Identical config ⇒ byte-identical signatures ⇒ reproducible clusters.
    Broadcast once (``ray.put``) and read inside every actor; never rebuilt
    per batch.
    """

    # --- Simhash (reference parity; see module docstring) ---
    simhash_f: int = 64
    simhash_shingle_width: int = 4
    # seeded bit permutation applied before pigeonhole block split in
    # simhash-near search (hamming-invariant; scatters correlated bit
    # positions across blocks — see stages/simhash_near.py)
    simhash_block_seed: int = 1337

    # --- MinHash over w-word shingles of the normalized token stream ---
    minhash_num_perms: int = 64
    minhash_shingle_words: int = 3
    minhash_seed: int = 4242
    # signature kernel: "oph" (default) = one-permutation hashing with
    # rotation densification (Li/Owen/Zhang 2012 + Shrivastava/Li 2014)
    # — ONE scatter-min per shingle instead of K multiply-adds; "kperm"
    # = K independent permutations. Both produce (n, K) minwise
    # sketches with the same banding math; candidate sets may differ
    # per pair but verification is exact either way, so verified-pair
    # output matches the brute-force truth under both. OPH measured
    # strictly faster at every parallelism (BASELINE.md session-10:
    # 2→8 legs 100.8/27.6 s vs k-perm's 115.3/30.2; 8→32 efficiency
    # 0.673 vs 0.641) because the (shingles × K) DRAM traffic — the
    # single-socket scaling ceiling — disappears. MinHash/LSH is an
    # engine addition (no reference counterpart), so the kernel choice
    # does not touch reference parity, which lives in the simhash and
    # measure contracts above.
    minhash_kernel: str = "oph"

    # --- LSH banding: bands * rows == num_perms ---
    lsh_bands: int = 16
    lsh_rows: int = 4
    # hot-bucket handling: a bucket whose member count exceeds this is
    # SALTED into s = ceil(n / limit) classes and every (i, j) salt-pair
    # becomes its own bounded group — exact coverage, no recall loss
    # (stages/lsh.py module docstring). pair_cap only bounds the
    # simhash-near pigeonhole stage (stages/simhash_near.py).
    lsh_bucket_salt_above: int = 256
    lsh_bucket_pair_cap: int = 100_000
    # lsh_verified_pairs auto path pick: driver ref-shuffle at or below
    # this many representatives, co-partitioned Dataset path above
    lsh_driver_max_rows: int = 5_000_000

    # --- Duplicate decision thresholds ---
    jaccard_dup_threshold: float = 0.8   # verified shingle-set Jaccard ≥ t ⇒ dup pair
    simhash_dup_hamming: int = 12        # Hamming ≤ h ⇒ simhash-near pair (FIXTURES §1.3)
    chain_scan_threshold: float = 0.2    # hamming/64 > t keeps row (bin/exclude_duplicates:27)

    # --- Tokenization (deterministic re-spec of otmt full_tokenize) ---
    stemming: bool = True
    remove_stopwords: bool = True

    # --- Suffix-array long-span pass ---
    min_span_chars: int = 200
    # hot-fingerprint pair budget: at most this many members per
    # fingerprint enter candidate pairing (per-fp rotation sampling keeps
    # boilerplate families connected; stages/suffix_span.py docstring)
    suffix_fp_member_cap: int = 64

    # --- Execution knobs (do not affect results, only performance) ---
    # 1024 keeps the signature kernel's temporaries (bit-vote and min-hash
    # matrices) cache-friendly under 32-way task concurrency; 4096 was
    # measured 3-5x slower from DRAM-bandwidth contention
    batch_size: int = 1024
    signature_concurrency: int | None = None  # None → let Ray size the task pool

    # --- Off-topic thresholds (overridable per measure like OTMT's -tm) ---
    thresholds: dict[str, tuple[str, float]] = field(
        default_factory=lambda: dict(DEFAULT_THRESHOLDS)
    )

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows != self.minhash_num_perms:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"must equal minhash_num_perms ({self.minhash_num_perms})"
            )
        if self.minhash_kernel not in ("kperm", "oph"):
            raise ValueError(
                f"minhash_kernel must be 'kperm' or 'oph', "
                f"got {self.minhash_kernel!r}"
            )

    def with_overrides(self, **kw) -> "DedupConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = DedupConfig()
