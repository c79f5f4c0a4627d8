"""MinHash-LSH primitives, numpy-vectorized over Arrow batches.

Replaces the reference's FAISS ANN retrieval (entity_candidate/indexer/
faiss_indexer.py:47-136) and Solr BM25 retrieval with a shuffle-friendly
banding scheme: token k-shingles -> 64-bin densified one-permutation
MinHash signature -> b bands of r rows -> equi-join on
(band_idx, band_hash). Candidate pairs
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
_EMPTY_SENTINEL = (1 << 64) - 1

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


_POLY = np.uint64(0xFF51AFD7ED558CCD)  # odd => wrapping multiply bijective


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """64-bit hash per token: two genuinely independent crc32s (forward
    bytes vs reversed bytes + terminator — distinct INPUTS, not distinct
    seeds) fill the high and low words. A seeded-crc32 low word would
    NOT work: CRC32 is affine in its seed, so for equal-length inputs
    crc32(b, salt) == crc32(b) ^ C(len) and the entropy collapses to
    ~32 bits per length class — same-length tokens would collide at the
    32-bit birthday rate. Reversal breaks that affinity."""
    return np.fromiter(
        (
            (zlib.crc32(b) << 32) | zlib.crc32(b[::-1] + b"\x01")
            for b in (t.encode("utf-8") for t in tokens)
        ),
        dtype=np.uint64,
        count=len(tokens),
    )


def shingle_hashes(tokens: list[str], k: int = SHINGLE_K) -> np.ndarray:
    """Distinct k-shingle hashes of a token list, 64-bit.

    A shingle hash is a positional polynomial fold of the window's TOKEN
    hashes (h_0*P^(k-1)-style: comb = comb*P ^ h_next, splitmix64
    finalized) — hashing per-token once and combining with three
    vectorized numpy ops replaced building every " ".join(window) string
    (which was ~98% of signature time: n_tokens slice+join+encode+crc32
    per document). Fewer-than-k-token docs fold ALL tokens into one
    whole-doc shingle, matching the joined-string semantics.
    """
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    h = _token_hashes(tokens)
    if n < k:
        comb = h[:1].copy()
        for i in range(1, n):
            comb = comb * _POLY ^ h[i : i + 1]
        return _splitmix64(comb)
    m = n - k + 1
    comb = h[:m].copy()
    for j in range(1, k):
        comb = comb * _POLY ^ h[j : j + m]
    return np.unique(_splitmix64(comb))


# densification offset constant (odd => wrapping multiply is a bijection)
_DENSIFY_C = np.uint64(0x9E3779B97F4A7C15)


def minhash_signatures_batch(
    token_lists: list[list[str] | None],
) -> list[np.ndarray | None]:
    """64-bin signatures for a whole Arrow batch via densified
    ONE-permutation hashing — the batch form is the primary API.

    Classic k-perm MinHash evaluates k hashes per shingle — a
    [64, n_shingles] matrix per document that dominated the fused
    featurization pass (~50% of s1 at 1M docs). One-permutation hashing
    (Li, Owen, Zhang, NIPS'12) computes ONE mixed hash per shingle,
    partitions the hash space into 64 bins (top 6 bits), and takes the
    min within each bin; empty bins borrow from the nearest non-empty
    bin to the right (circularly), offset by distance*C — the
    "densification" of Shrivastava & Li (ICML'14), which restores the
    LSH collision property E[sig_a[i]==sig_b[i]] ~= J(a,b) for banding
    and estimation. Batching amortizes the numpy dispatch: one
    minimum.at scatter and one vectorized suffix-min densification for
    the entire batch. Same signature shape and downstream banding as
    the classic scheme, ~3x less featurization time per batch.
    """
    k = SHINGLE_K
    n = len(token_lists)
    out: list[np.ndarray | None] = [None] * n
    # split docs: >=k tokens ride the fully-vectorized corpus path;
    # 1..k-1-token docs fold to one whole-doc shingle (rare, cheap loop)
    big_idx: list[int] = []
    big_counts: list[int] = []
    big_toks: list[str] = []
    small: list[int] = []
    for i, t in enumerate(token_lists):
        if t is None:
            continue
        if len(t) == 0:
            out[i] = np.full(N_PERM, _EMPTY_SENTINEL, dtype=np.uint64)
        elif len(t) < k:
            small.append(i)
        else:
            big_idx.append(i)
            big_counts.append(len(t))
            big_toks.extend(t)
    eff_idx = big_idx + small
    if not eff_idx:
        return out
    sh_parts: list[np.ndarray] = []
    doc_parts: list[np.ndarray] = []
    if big_idx:
        # token hashing is the hot loop: factorize the whole batch's
        # tokens (C-speed string hashing), crc-hash only the UNIQUE
        # tokens (web text is Zipfian — heavy reuse), then gather + combine
        # k-windows with k-1 vectorized ops over the concatenated corpus.
        # Windows crossing a document boundary are masked out.
        codes, uniques = pd.factorize(np.asarray(big_toks, dtype=object))
        h = _token_hashes(list(uniques))[codes]
        doc = np.repeat(
            np.arange(len(big_idx), dtype=np.int64),
            np.asarray(big_counts, dtype=np.int64),
        )
        m = h.size - (k - 1)
        comb = h[:m].copy()
        for j in range(1, k):
            comb = comb * _POLY ^ h[j : j + m]
        valid = doc[:m] == doc[k - 1 :]
        sh_parts.append(_splitmix64(comb[valid]))
        doc_parts.append(doc[:m][valid])
    for s_off, i in enumerate(small):
        sh_parts.append(shingle_hashes(token_lists[i], k))
        doc_parts.append(np.array([len(big_idx) + s_off], dtype=np.int64))
    sh = np.concatenate(sh_parts)
    doc = np.concatenate(doc_parts)
    # duplicates within a doc are NOT removed: min over a multiset equals
    # min over the set, so dedup would only cost time here
    v = _splitmix64(sh)
    bins = (v >> np.uint64(58)).astype(np.int64)  # top 6 bits -> 64 bins
    flat = np.full(len(eff_idx) * N_PERM, _EMPTY_SENTINEL, dtype=np.uint64)
    np.minimum.at(flat, doc * N_PERM + bins, v)
    sig = flat.reshape(len(eff_idx), N_PERM)
    empty = sig == _EMPTY_SENTINEL
    need = empty.any(axis=1)
    if need.any():
        E = empty[need]  # [R, 64]
        S = sig[need]
        col2 = np.arange(2 * N_PERM, dtype=np.int64)
        # doubled columns + suffix-min => nearest non-empty bin at or
        # right of each j, with circular wrap via the second copy
        idx2 = np.where(np.tile(~E, (1, 2)), col2[None, :], 4 * N_PERM)
        nxt = np.minimum.accumulate(idx2[:, ::-1], axis=1)[:, ::-1][:, :N_PERM]
        src = nxt % N_PERM
        d = ((src - col2[None, :N_PERM]) % N_PERM).astype(np.uint64)
        rowi = np.arange(S.shape[0])[:, None]
        sig[need] = np.where(E, S[rowi, src] + d * _DENSIFY_C, S)
    for j, i in enumerate(eff_idx):
        out[i] = sig[j]
    return out


def minhash_signature(tokens: list[str]) -> np.ndarray:
    """Single-document signature — thin wrapper over the batch path so
    both forms are bit-identical by construction."""
    return minhash_signatures_batch([tokens])[0]


def band_hashes_matrix(sigs: np.ndarray, n_bands: int = N_BANDS) -> np.ndarray:
    """[D, N_PERM] signatures -> [D, n_bands] int64 band hashes, fully
    vectorized (polynomial fold of each band's rows + splitmix64, the
    band index xor'd in so identical chunks in different bands never
    collide). Replaces a 16-crc32-per-document Python loop."""
    rows = N_PERM // n_bands
    c = sigs.reshape(sigs.shape[0], n_bands, rows)
    comb = c[:, :, 0].copy()
    for j in range(1, rows):
        comb = comb * _POLY ^ c[:, :, j]
    comb = comb ^ (np.arange(n_bands, dtype=np.uint64) << np.uint64(32))[None, :]
    return _splitmix64(comb).view(np.int64)


def band_hashes(sig: np.ndarray, n_bands: int = N_BANDS) -> list[int]:
    """Fold one signature into n_bands band hashes (int64 for Spark).

    More bands of fewer rows = higher candidate recall at lower Jaccard
    (P(candidate) = 1-(1-j^rows)^bands); size to the target threshold."""
    return band_hashes_matrix(sig[None, :], n_bands)[0].tolist()


def bands_from_signatures(
    sigs: list[np.ndarray | None], n_bands: int = N_BANDS
) -> list[list[int] | None]:
    """Band hashes for a whole batch of signatures in one matrix call."""
    out: list[list[int] | None] = [None] * len(sigs)
    idx = [i for i, s in enumerate(sigs) if s is not None]
    if idx:
        mat = band_hashes_matrix(np.stack([sigs[i] for i in idx]), n_bands)
        for j, i in enumerate(idx):
            out[i] = mat[j].tolist()
    return out


def make_bands_udf(n_bands: int = N_BANDS):
    """Factory: tokens array -> n_bands LSH band hashes, Arrow-batched."""

    @pandas_udf(ArrayType(LongType()))
    def bands_udf(tokens: pd.Series) -> pd.Series:
        sigs = minhash_signatures_batch(
            [list(t) if t is not None else None for t in tokens]
        )
        return pd.Series(bands_from_signatures(sigs, n_bands))

    return bands_udf


minhash_bands_udf = make_bands_udf(N_BANDS)


@pandas_udf(ArrayType(LongType()))
def minhash_signature_udf(tokens: pd.Series) -> pd.Series:
    """Full 64-perm signature (for exact MinHash-Jaccard estimation).

    uint64 -> int64 goes through a two's-complement .view, NOT int(np.int64(x)):
    numpy >= 2.0 raises OverflowError converting uint64 values >= 2^63 (half
    of all splitmix64 outputs, and the empty-doc sentinel).
    """
    sigs = minhash_signatures_batch(
        [list(t) if t is not None else None for t in tokens]
    )
    return pd.Series(
        [s.view(np.int64).tolist() if s is not None else None for s in sigs]
    )


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))
