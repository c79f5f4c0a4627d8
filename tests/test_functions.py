"""Unit tests for similarity functions: minhash, vectors, strings."""

from __future__ import annotations

import numpy as np

from entity_linking_spark.functions.minhash import (
    band_hashes,
    est_jaccard,
    minhash_signature,
)
from entity_linking_spark.functions.strings import (
    jaro,
    jaro_winkler,
    levenshtein,
    levenshtein_sim,
)
from entity_linking_spark.functions.vectors import hash_embed_matrix


def test_minhash_deterministic():
    toks = "a b c d e f g".split()
    assert list(minhash_signature(toks)) == list(minhash_signature(toks))
    assert band_hashes(minhash_signature(toks)) == band_hashes(minhash_signature(toks))


def test_minhash_estimates_jaccard():
    a = [f"w{i}" for i in range(100)]
    b = [f"w{i}" for i in range(50, 150)]  # true 3-shingle overlap ~ 1/3
    est = est_jaccard(minhash_signature(a), minhash_signature(b))
    assert 0.15 <= est <= 0.55


def test_minhash_identical_and_disjoint():
    a = "x y z w v u t s".split()
    assert est_jaccard(minhash_signature(a), minhash_signature(a)) == 1.0
    b = "p q r m n o k l".split()
    assert est_jaccard(minhash_signature(a), minhash_signature(b)) < 0.2


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein_sim("abc", "abc") == 1.0
    assert levenshtein_sim("", "") == 1.0


def test_jaro_winkler_known_values():
    # public reference values
    assert abs(jaro("martha", "marhta") - 0.9444) < 1e-3
    assert abs(jaro_winkler("martha", "marhta") - 0.9611) < 1e-3
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("", "abc") == 0.0
    assert jaro("abc", "xyz") == 0.0


def test_hash_embed_normalized_and_deterministic():
    m = hash_embed_matrix([["a", "b", "c"], ["a", "b", "c"], []])
    assert np.allclose(np.linalg.norm(m[0]), 1.0)
    assert np.allclose(m[0], m[1])
    assert np.allclose(m[2], 0.0)
    # similar token lists -> higher cosine than dissimilar
    m2 = hash_embed_matrix([["a", "b", "c", "d"], ["x", "y", "z", "w"]])
    cos_sim = float(m[0] @ m2[0])
    cos_dis = float(m[0] @ m2[1])
    assert cos_sim > cos_dis


def test_minhash_batch_matches_single_and_handles_edges():
    """Batch OPH path is bit-identical to the single-doc wrapper for
    every doc class: >=k tokens, short (densified from one bin), empty,
    and None."""
    from entity_linking_spark.functions.minhash import (
        bands_from_signatures,
        minhash_signatures_batch,
    )

    docs = [
        [f"w{i}" for i in range(40)],
        ["solo"],
        ["two", "tokens"],
        [],
        None,
        [f"v{i}" for i in range(5)],
    ]
    bat = minhash_signatures_batch(docs)
    for d, s in zip(docs, bat):
        if d is None:
            assert s is None
        else:
            assert np.array_equal(s, minhash_signature(d))
    bands = bands_from_signatures(bat)
    assert bands[4] is None
    assert bands[0] == band_hashes(bat[0])
    # short docs densify deterministically and still produce full bands
    assert len(bat[1]) == 64 and len(bands[1]) == 16
    assert list(bat[1]) != list(bat[2])


def test_minhash_banding_recall_on_near_dups():
    """A j~0.97 pair must share at least one LSH band (the blocking
    guarantee the near-dup pipeline rests on)."""
    base = [f"tok{i}" for i in range(100)]
    near = base[:97] + ["x1", "x2", "x3"]
    ba = band_hashes(minhash_signature(base))
    bb = band_hashes(minhash_signature(near))
    assert any(x == y for x, y in zip(ba, bb))
    # and a disjoint pair must share none
    other = [f"z{i}" for i in range(100)]
    bc = band_hashes(minhash_signature(other))
    assert not any(x == y for x, y in zip(ba, bc))


def test_cosine_udf_tolerates_null_and_ragged_rows(spark):
    """A NULL (or wrong-dim) vector in a batch must score 0.0 for that
    row, not crash the task: the batched np.stack path raises on mixed
    None rows and the per-row fallback used `x or []`, whose numpy-array
    truth value raises for >1 element — one poison row killed the whole
    scoring stage."""
    from pyspark.sql import Row

    from entity_linking_spark.functions.vectors import cosine_udf

    rows = [
        Row(a=[1.0, 0.0], b=[1.0, 0.0]),   # cos 1
        Row(a=None, b=[0.0, 1.0]),          # null side -> 0
        Row(a=[1.0, 0.0], b=None),          # other side -> 0
        Row(a=[1.0], b=[0.0, 1.0]),         # ragged dims -> 0
    ]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    got = [r.c for r in df.coalesce(1).select(cosine_udf("a", "b").alias("c")).collect()]
    assert got[0] == 1.0 and got[1:] == [0.0, 0.0, 0.0]
