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
