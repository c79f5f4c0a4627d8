"""MinHash-LSH primitives, numpy-vectorized over Arrow batches.

Replaces the reference's FAISS ANN retrieval (entity_candidate/indexer/
faiss_indexer.py:47-136) and Solr BM25 retrieval with a shuffle-friendly
banding scheme: token k-shingles -> 64-permutation MinHash signature ->
b bands of r rows -> equi-join on (band_idx, band_hash). Candidate pairs
are then re-scored exactly (operators/scoring.py), mirroring the
reference's retrieve-then-rerank lifecycle (SURVEY.md §3.1).

All hashing is seed-pinned and process-independent (crc32-based, never
Python ``hash``), so signatures are deterministic across executors —
the FIXTURES.md determinism rule.

Scale notes: the signature computation is a narrow map; the only shuffle
is the band equi-join. Band hashes distribute uniformly, and hot bands
(boilerplate-heavy shingle sets) are handled by the block-size cap in
operators/blocking.py rather than by skewing the join.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_K = 3
_SEED = 42
_EMPTY_SENTINEL = (1 << 64) - 1

_rng = np.random.RandomState(_SEED)
# one 64-bit mixing key per permutation (splitmix64 scheme, see below)
_KEYS = _rng.randint(0, 1 << 63, size=N_PERM, dtype=np.uint64) * np.uint64(2) + np.uint64(1)

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Vigna 2015) over uint64 arrays.

    All arithmetic intentionally wraps mod 2^64 (numpy uint64 semantics) —
    unlike the round-1 (a*h+b) mod p scheme, wrap-around is part of the
    algorithm here, not a silent overflow bug.
    """
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


def shingle_hashes(tokens: list[str], k: int = SHINGLE_K) -> np.ndarray:
    """Distinct k-shingle hashes of a token list, 64-bit.

    Two genuinely independent crc32s (forward bytes vs reversed bytes +
    terminator — distinct inputs, not just distinct seeds) fill the high
    and low words. A seeded-crc32 low word would NOT work: CRC32 is affine
    in its seed, so for equal-length inputs crc32(b, salt) ==
    crc32(b) ^ C(len) and the effective entropy collapses to ~32 bits per
    length class — same-length shingles would collide at the 32-bit
    birthday rate, inflating estimated Jaccard at 10^12-doc scale.
    Reversal breaks that affinity: the two words come from different byte
    streams, giving a true 2^64 shingle space.
    """
    if len(tokens) < k:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hs = {
        (zlib.crc32(b) << 32) | zlib.crc32(b[::-1] + b"\x01")
        for b in (s.encode("utf-8") for s in joined)
    }
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def minhash_signature(tokens: list[str]) -> np.ndarray:
    """64-perm MinHash signature: sig[i] = min(splitmix64(h ^ key_i))."""
    hs = shingle_hashes(tokens)
    if hs.size == 0:
        return np.full(N_PERM, _EMPTY_SENTINEL, dtype=np.uint64)
    # [n_perm, n_shingles] — vectorized permutation evaluation
    vals = _splitmix64(hs[None, :] ^ _KEYS[:, None])
    return vals.min(axis=1)


def band_hashes(sig: np.ndarray, n_bands: int = N_BANDS) -> list[int]:
    """Fold the signature into n_bands band hashes (int64 for Spark).

    More bands of fewer rows = higher candidate recall at lower Jaccard
    (P(candidate) = 1-(1-j^rows)^bands); size to the target threshold."""
    rows = N_PERM // n_bands
    out = []
    for b in range(n_bands):
        chunk = sig[b * rows : (b + 1) * rows]
        h = zlib.crc32(chunk.tobytes()) ^ (b << 32)
        out.append(int(np.int64(np.uint64(h))))
    return out


def make_bands_udf(n_bands: int = N_BANDS):
    """Factory: tokens array -> n_bands LSH band hashes, Arrow-batched."""

    @pandas_udf(ArrayType(LongType()))
    def bands_udf(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda t: band_hashes(minhash_signature(list(t)), n_bands)
            if t is not None
            else None
        )

    return bands_udf


minhash_bands_udf = make_bands_udf(N_BANDS)


@pandas_udf(ArrayType(LongType()))
def minhash_signature_udf(tokens: pd.Series) -> pd.Series:
    """Full 64-perm signature (for exact MinHash-Jaccard estimation).

    uint64 -> int64 goes through a two's-complement .view, NOT int(np.int64(x)):
    numpy >= 2.0 raises OverflowError converting uint64 values >= 2^63 (half
    of all splitmix64 outputs, and the empty-doc sentinel).
    """
    return tokens.map(
        lambda t: minhash_signature(list(t)).view(np.int64).tolist()
        if t is not None
        else None
    )


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))
