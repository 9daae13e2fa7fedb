"""Pure vectorized kernels (no Ray imports): simhash, minhash, set measures.

These are the numeric core of every ``map_batches`` stage; they take plain
Python/numpy inputs so they are unit-testable against single-process oracles
without a Ray session.
"""

from raydedup.functions.simhash import (
    simhash64,
    simhash64_batch,
    hamming_distance,
    hamming_batch,
)
from raydedup.functions.minhash import MinHasher
from raydedup.functions.setsim import (
    jaccard_distance,
    sorensen_distance,
    levenshtein_tokens,
    nlevenshtein_tokens,
    tfintersection,
)

__all__ = [
    "simhash64", "simhash64_batch", "hamming_distance", "hamming_batch",
    "MinHasher",
    "jaccard_distance", "sorensen_distance", "levenshtein_tokens",
    "nlevenshtein_tokens", "tfintersection",
]
