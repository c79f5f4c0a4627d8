"""Blocking: mention detection, candidate join, keys, caps."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from entity_linking_spark.operators import blocking


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, text=t) for u, t in rows], "url string, text string"
    )


def test_detect_mentions_longest_wins(spark):
    # 'acme corp' and 'acme' both aliases: longest must win (reference
    # el_process.py:65 ordering)
    docs = _docs(spark, [("u1", "we met Acme Corp yesterday")])
    out = blocking.detect_mentions(docs, ["acme", "acme corp"]).collect()
    assert [(r.mention) for r in out] == ["acme corp"]


def test_detect_mentions_word_boundaries(spark):
    docs = _docs(spark, [("u1", "acme 10 is not acme 1")])
    out = blocking.detect_mentions(docs, ["acme 1"]).collect()
    assert len(out) == 1  # must not fire inside 'acme 10'


def test_detect_mentions_positions_in_normalized_text(spark):
    from entity_linking_spark.functions.normalize import normalize_text

    text = "Hello, ACME-Corp!"
    docs = _docs(spark, [("u1", text)])
    out = blocking.detect_mentions(docs, ["acme-corp"]).collect()
    assert len(out) == 1
    norm = normalize_text(text)
    m = out[0]
    assert norm[m.start_pos : m.end_pos] == m.mention == "acme - corp"


def test_candidate_entities_ambiguity(spark):
    mentions = spark.createDataFrame(
        [Row(url="u1", mention="foo", start_pos=0, end_pos=3)]
    )
    aliases = spark.createDataFrame(
        [Row(alias="foo", subject_id="e1"), Row(alias="foo", subject_id="e2"),
         Row(alias="bar", subject_id="e3")]
    )
    out = blocking.candidate_entities(mentions, aliases).collect()
    assert sorted((r.subject_id, r.n_ids) for r in out) == [("e1", 2), ("e2", 2)]


def test_candidate_pairs_cap_drops_stop_keys(spark):
    rows = [Row(url=f"u{i}", key="hot") for i in range(10)]
    rows += [Row(url="a", key="cold"), Row(url="b", key="cold")]
    keys = spark.createDataFrame(rows)
    out = blocking.candidate_pairs(keys, max_block_size=5).collect()
    assert [(r.url_a, r.url_b) for r in out] == [("a", "b")]


def test_candidate_pairs_dedup_across_keys(spark):
    keys = spark.createDataFrame(
        [Row(url="a", key="k1"), Row(url="b", key="k1"),
         Row(url="a", key="k2"), Row(url="b", key="k2")]
    )
    out = blocking.candidate_pairs(keys, max_block_size=5).collect()
    assert len(out) == 1


def test_minhash_bands_identical_texts_collide(spark):
    toks = "the quick brown fox jumps over the lazy dog".split()
    df = spark.createDataFrame([Row(url="a", tokens=toks), Row(url="b", tokens=toks)])
    keys = blocking.blocking_keys(
        df.withColumnRenamed("tokens", "tokens"),
        candidates=None,
        use_host=False,
        use_entity=False,
        use_minhash=True,
    )
    pairs = blocking.candidate_pairs(keys).collect()
    assert [(r.url_a, r.url_b) for r in pairs] == [("a", "b")]


def test_blocking_keys_drop_null_host_keys(spark):
    """P2 analog (candidate_generators.py:112-116): docs whose url has no
    parseable host yield NO host: key (parse_url -> NULL, dropped by the
    isNotNull filter) instead of a null-key block that would union every
    malformed-url doc into one giant bogus blocking group."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(url="https://a.example.org/x", tokens=["t1", "t2", "t3"]),
            Row(url="not a url at all", tokens=["t4", "t5", "t6"]),
        ]
    )
    keys = blocking.blocking_keys(
        docs, candidates=None, use_host=True, use_entity=False, use_minhash=True
    ).collect()
    host_keys = [r for r in keys if r.key.startswith("host:")]
    assert [r.url for r in host_keys] == ["https://a.example.org/x"]
    assert all(r.key is not None for r in keys)
    # the malformed-url doc still blocks via its minhash bands
    assert any(r.url == "not a url at all" and r.key.startswith("mh:") for r in keys)


def _aliases(spark, pairs):
    return spark.createDataFrame(
        [Row(alias=a, subject_id=s) for a, s in pairs],
        "alias string, subject_id string",
    )


def test_detect_mentions_join_identical_to_trie(spark):
    """The beyond-broadcast join path must reproduce the trie path's
    output byte-identically (same rows; row ORDER is unspecified on both
    sides) — including longest-match-wins, greedy non-overlap jumps,
    shared-first-token aliases, repeats, and empty/None docs."""
    docs = _docs(
        spark,
        [
            ("d1", "I visited New York City and new york is big"),
            ("d2", "the new york city marathon and york minster"),
            ("d3", "nothing matching here at all"),
            ("d4", "acme corp acme acme corp industries"),
            ("d5", ""),
            ("d6", None),
            ("d7", "overlap a b c overlap test: a b then b c then c"),
            ("d8", "Hyphen-Case ACME-Corp matches too"),
        ],
    )
    aliases = _aliases(
        spark,
        [
            ("New York", "e1"),
            ("New York City", "e2"),
            ("york", "e3"),
            ("acme corp", "e4"),
            ("acme corp industries", "e5"),
            ("acme", "e6"),
            ("a b", "e7"),
            ("b c", "e8"),
            ("c", "e9"),
            ("acme-corp", "e10"),  # normalizes to multi-token 'acme - corp'
        ],
    )
    alias_list = [r.alias for r in aliases.select("alias").collect()]
    trie = sorted(map(tuple, blocking.detect_mentions(docs, alias_list).collect()))
    join = sorted(map(tuple, blocking.detect_mentions_join(docs, aliases).collect()))
    assert trie == join
    assert len(trie) > 10  # corpus actually exercises the matcher
    # the alias-token broadcast prefilter is a pure plan optimization:
    # both settings must emit the identical row set
    for pf in (True, False):
        got = sorted(
            map(
                tuple,
                blocking.detect_mentions_join(
                    docs, aliases, anchor_prefilter=pf
                ).collect(),
            )
        )
        assert got == trie, pf


def test_detect_mentions_join_precomputed_tokens(spark):
    """tokens_col path (the pipeline's fused-s1 output) agrees too."""
    from entity_linking_spark.functions.normalize import tokenize_udf

    docs = _docs(spark, [("u1", "we met Acme Corp and ACME yesterday")])
    toked = docs.withColumn("tokens", tokenize_udf(F.col("text")))
    aliases = _aliases(spark, [("acme corp", "e1"), ("acme", "e2")])
    out = sorted(
        map(
            tuple,
            blocking.detect_mentions_join(toked, aliases, tokens_col="tokens").collect(),
        )
    )
    trie = sorted(
        map(
            tuple,
            blocking.detect_mentions(toked, ["acme corp", "acme"], tokens_col="tokens").collect(),
        )
    )
    assert out == trie == [("u1", "acme", 21, 25), ("u1", "acme corp", 7, 16)]


def test_alias_row_estimate_parquet_footer(spark, tmp_path):
    p = str(tmp_path / "aliases_pq")
    _aliases(spark, [(f"alias {i}", f"e{i}") for i in range(37)]).write.parquet(p)
    assert blocking.alias_row_estimate(spark.read.parquet(p)) == 37
    # in-memory fallback
    assert blocking.alias_row_estimate(_aliases(spark, [("x", "e1")])) == 1
    # metadata-only variant: exact on parquet, None (NO count job) on
    # in-memory plans — the prefilter auto-gate's "unknown means small"
    assert blocking.footer_row_estimate(spark.read.parquet(p)) == 37
    assert blocking.footer_row_estimate(_aliases(spark, [("x", "e1")])) is None


def test_detect_mentions_join_randomized_equivalence(spark):
    """Seeded randomized corpora x alias sets: the join path must equal
    the trie path on every draw — multi-token aliases built FROM corpus
    vocabulary (so anchors collide), plus aliases with corpus-absent
    tokens (join path drops them outright; trie simply never matches)."""
    import random

    rng = random.Random(404)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        docs_rows = []
        for d in range(40):
            n = rng.randint(0, 25)
            docs_rows.append(
                (f"d{trial}_{d}", " ".join(rng.choice(vocab) for _ in range(n)))
            )
        alias_set = set()
        for _ in range(25):
            k = rng.randint(1, 4)
            alias_set.add(" ".join(rng.choice(vocab) for _ in range(k)))
        alias_set.add("w0 neverintext")  # corpus-absent token
        alias_set.add("")  # degenerate
        docs = _docs(spark, docs_rows)
        aliases = _aliases(spark, [(a, f"e{i}") for i, a in enumerate(alias_set)])
        trie = sorted(
            map(tuple, blocking.detect_mentions(docs, sorted(alias_set)).collect())
        )
        join = sorted(
            map(tuple, blocking.detect_mentions_join(docs, aliases).collect())
        )
        assert trie == join, f"trial {trial}: {len(trie)} vs {len(join)}"
        assert len(trie) > 0


def test_p2_malformed_url_drops_from_host_keys_only(spark):
    """P2 isNotNull gate: a malformed crawl url must not kill the
    blocking stage (Spark 4 parse_url THROWS; we use try_parse_url) —
    the row silently loses its host: key but still blocks via its other
    keys."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(url="https://ok.example.org/p/1", tokens=["alpha", "beta"]),
            Row(url="http://bad url with spaces", tokens=["alpha", "beta"]),
        ]
    )
    keys = blocking.blocking_keys(
        docs, candidates=None, use_host=True, use_entity=False, use_minhash=True
    ).collect()
    host_keys = {r.url for r in keys if r.key.startswith("host:")}
    mh_keys = {r.url for r in keys if r.key.startswith("mh:")}
    assert host_keys == {"https://ok.example.org/p/1"}
    assert mh_keys == {"https://ok.example.org/p/1", "http://bad url with spaces"}


def test_candidate_pairs_overflow_split(spark):
    """overflow='split': a mid-size over-cap block is re-blocked into
    deterministic sub-blocks (bounded per-key pair output, partial
    recall) instead of dropped; mega blocks past split_max still drop;
    under-cap blocks are untouched; default 'drop' behavior unchanged."""
    from pyspark.sql import Row

    rows = (
        [Row(url=f"m{i:03d}", key="mid") for i in range(12)]      # over cap
        + [Row(url=f"g{i:04d}", key="mega") for i in range(300)]  # over split_max
        + [Row(url=f"s{i}", key="small") for i in range(3)]       # under cap
    )
    keys = spark.createDataFrame(rows)
    cap, smax = 4, 100

    dropped = blocking.candidate_pairs(keys, max_block_size=cap, cache_keys=False)
    got_drop = {(r.url_a, r.url_b) for r in dropped.collect()}
    assert got_drop == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}

    split = blocking.candidate_pairs(
        keys, max_block_size=cap, cache_keys=False, overflow="split", split_max=smax
    )
    got_split = {(r.url_a, r.url_b) for r in split.collect()}
    # small block intact; mega block gone; mid block contributes SOME
    # pairs (sub-clique sample), strictly fewer than the full clique
    assert {("s0", "s1"), ("s0", "s2"), ("s1", "s2")} <= got_split
    assert not any(u.startswith("g") for u, _ in got_split)
    mid_pairs = {p for p in got_split if p[0].startswith("m")}
    assert 0 < len(mid_pairs) < 12 * 11 // 2
    # deterministic across invocations
    again = {
        (r.url_a, r.url_b)
        for r in blocking.candidate_pairs(
            keys, max_block_size=cap, cache_keys=False, overflow="split", split_max=smax
        ).collect()
    }
    assert again == got_split
