"""Repetition-signal quality operator + URL canonicalization tests."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from entity_linking_spark.functions.web import canonical_url, url_dedup
from entity_linking_spark.operators.quality import repetition_signals


# ----------------------------------------------------- repetition signals


def _replay_signals(text, top_ns=(2, 3), dup_n=5, min_repeats=2):
    """From-first-principles replay of repetition_signals for one doc."""
    toks = text.lower().split(" ")
    out = {"n_tokens": len(toks)}
    for n in top_ns:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        out[f"top{n}_count"] = (
            max(grams.count(g) for g in set(grams)) if grams else 0
        )
    grams = [" ".join(toks[i : i + dup_n]) for i in range(len(toks) - dup_n + 1)]
    counts = {}
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    covered = set()
    for i, g in enumerate(grams):
        if counts[g] >= min_repeats:
            covered.update(range(i, i + dup_n))
    out[f"dup{dup_n}_covered_tokens"] = len(covered)
    return out


def test_repetition_signals_hand_cases(spark):
    docs = [
        (1, "a b a b a b c d e f g h i j"),  # 'a b' x3
        (2, "x y z x y z x y z q w e r t y u i o p a s d f"),
        (3, "unique tokens only here now"),
        (4, "t"),  # shorter than every n: all signals 0
        (5, "p q p q p q p q p q"),  # fully periodic: dup5 covers all
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in repetition_signals(df).collect()}
    for did, text in docs:
        want = _replay_signals(text)
        for k, v in want.items():
            assert got[did][k] == v, (did, k, got[did], want)
    # spot-check the worked example: windows {0,3} and {1,4} merge to [0,9)
    assert got[2]["dup5_covered_tokens"] == 9
    assert got[5]["dup5_covered_tokens"] == 10
    assert got[5]["dup5_frac"] == 1.0
    assert got[4]["top2_count"] == 0 and got[4]["dup5_covered_tokens"] == 0


def test_repetition_signals_randomized_replay(spark):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> heavy repetition
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60))))
        for d in range(25)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in repetition_signals(df).collect()}
    for did, text in docs:
        want = _replay_signals(text)
        for k, v in want.items():
            assert got[did][k] == v, (did, k)
        # invariants: coverage bounded by doc length, fracs in [0, 1]
        assert 0 <= got[did]["dup5_covered_tokens"] <= want["n_tokens"]
        assert 0.0 <= got[did]["top2_frac"] <= 1.0


# ------------------------------------------------------- URL canonical form


def _canon(spark, pairs):
    df = spark.createDataFrame(pairs, "url string")
    return [
        r.c for r in df.select(canonical_url("url").alias("c")).collect()
    ]


def test_canonical_url_cases(spark):
    cases = [
        # case folding: scheme+host lowered, path case preserved
        ("HTTPS://WWW.Example.COM/Path", "https://example.com/Path"),
        # default ports stripped only for the matching scheme
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:80/a", "https://example.com:80/a"),
        ("ftp://example.com:443/a", "ftp://example.com:443/a"),
        # trailing slash + root path
        ("http://example.com/", "http://example.com"),
        ("http://example.com/a//", "http://example.com/a"),
        # fragment dropped, even when it contains a '?'
        ("http://example.com/a#frag?x=1", "http://example.com/a"),
        # tracking params dropped, survivors byte-sorted
        (
            "https://example.com/p?b=2&utm_source=x&a=1&fbclid=z",
            "https://example.com/p?a=1&b=2",
        ),
        # all params tracking -> no '?'
        ("https://example.com/p?utm_a=1&gclid=2", "https://example.com/p"),
        # empty query
        ("https://example.com/p?", "https://example.com/p"),
        # non-URL strings pass through untouched
        ("not a url", "not a url"),
        ("", ""),
        # userinfo/unusual authority stays inside the lowered authority
        ("HTTP://User@Host.COM/x", "http://user@host.com/x"),
    ]
    got = _canon(spark, [(u,) for u, _ in cases])
    for (raw, want), g in zip(cases, got):
        assert g == want, (raw, g, want)


def test_canonical_url_idempotent(spark):
    """Canonicalizing a canonical URL is a no-op (fixpoint)."""
    raws = [
        ("HTTPS://WWW.Site1.COM:443/A/B/?b=2&utm_x=9&a=1#f",),
        ("http://x.org/only/path",),
        ("https://h.net/p?z=1&y=2&x=3",),
    ]
    once = _canon(spark, raws)
    twice = _canon(spark, [(u,) for u in once])
    assert once == twice


def test_url_dedup_keeps_min_id(spark):
    rows = [
        (3, "https://example.com/a?x=1&utm_s=1"),
        (1, "HTTPS://WWW.EXAMPLE.COM:443/a/?x=1"),
        (2, "https://example.com/a?x=1#frag"),
        (9, "https://other.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = url_dedup(df, "url", "doc_id").orderBy("doc_id").collect()
    assert [(r.doc_id, r.canonical_url) for r in kept] == [
        (1, "https://example.com/a?x=1"),
        (9, "https://other.com/b"),
    ]
    # id-less variant: one row per canonical key, arbitrary representative
    assert url_dedup(df, "url").select("canonical_url").distinct().count() == 2
    assert url_dedup(df, "url").count() == 2
