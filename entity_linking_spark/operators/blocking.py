"""Candidate generation: mention detection + multi-key blocking.

Re-expresses the reference's three candidate generators as one blocking
stage producing (url_a, url_b) candidate pairs:

  1. alias-dictionary mentions (reference: jieba user-dict cut + alias
     lookup, entity_sort/service_main.py:110-127, dict built at
     el_process.py:19-43, longest-alias-wins ordering el_process.py:65)
     -> here a broadcast longest-match-first dictionary matcher run as a
     dictionary-driven UDTF (mapInPandas, one doc row -> many mention
     rows), then an equi hash join mentions.alias == aliases.alias.
  2. normalized-URL-host key (SURVEY §2.7 F11 analog for web pages).
  3. MinHash-LSH bands over text shingles (replaces Solr BM25 J5 and
     FAISS ANN J7: candidates by similarity, re-scored exactly later).

Skew handling (the reference has none — SURVEY §4 "hot-key behavior"):
  - blocking keys whose document frequency exceeds ``max_block_size`` are
    dropped entirely (stop-key removal: a key shared by thousands of docs
    carries no linkage information, exactly like the reference's
    stop-word filter el_main.py:534-537);
  - pair generation within a block is a salted self-join: blocks are
    first capped, so the join's per-key fan-out is bounded by
    max_block_size², and AQE skew-join splitting handles residual skew.

Scale notes (100 TB): mention detection is a narrow map over the corpus;
the alias table is broadcast (reference KBs are ~10^6 rows of short
strings ⇒ low-MB compressed — beyond broadcast size you bucket both
sides on alias instead). The only wide exchanges are the key-explode
repartition and the within-block self-join, both bounded by the cap.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from entity_linking_spark.functions.minhash import minhash_bands_udf
from entity_linking_spark.functions.normalize import normalize_text

MAX_BLOCK_SIZE = 64
MAX_ALIAS_AMBIGUITY = 8  # aliases shared by more entities don't emit ent: keys

MENTIONS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("mention", StringType(), False),
        StructField("start_pos", IntegerType(), False),
        StructField("end_pos", IntegerType(), False),
    ]
)


def _compile_matcher(aliases: list[str]) -> re.Pattern:
    """Longest-match-first alternation over normalized alias strings.

    Sorting by length desc reproduces the reference's longest-alias-wins
    contract (el_process.py:65). Word-boundary anchored so 'acme 1' does
    not fire inside 'acme 10'. At KB scale this becomes an Aho-Corasick
    automaton built once per executor; the regex form is the test-scale
    equivalent with identical match semantics.
    """
    ordered = sorted({a for a in aliases if a}, key=len, reverse=True)
    pattern = "|".join(re.escape(a) for a in ordered)
    return re.compile(rf"(?<![0-9a-z一-鿿])({pattern})(?![0-9a-z一-鿿])")


def detect_mentions(
    docs: DataFrame,
    alias_list: list[str],
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """Dictionary-driven UDTF: one doc row -> many mention rows.

    Positions are char offsets into the *normalized* text (the reference
    computes offsets in lowercased text, service_main.py:128-134).
    """
    norm_aliases = sorted({normalize_text(a) for a in alias_list if a})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = _compile_matcher(norm_aliases)
        for pdf in batches:
            urls, mentions, starts, ends = [], [], [], []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                if text is None:
                    continue
                norm = normalize_text(text)
                for m in matcher.finditer(norm):
                    urls.append(url)
                    mentions.append(m.group(1))
                    starts.append(m.start(1))
                    ends.append(m.end(1))
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype="string"),
                    "mention": pd.Series(mentions, dtype="string"),
                    "start_pos": pd.Series(starts, dtype="int32"),
                    "end_pos": pd.Series(ends, dtype="int32"),
                }
            )

    return docs.select(url_col, text_col).mapInPandas(run, schema=MENTIONS_SCHEMA)


def candidate_entities(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """J1: equi hash join mention -> candidate subject_ids, with per-alias
    ambiguity (how many entities share the alias — the disambiguation
    prior, analog of the reference's entity_to_ids fan-out)."""
    # normalize the alias side with the SAME frozen normalizer that
    # produced the mention strings, or hyphen/punct variants never join
    from entity_linking_spark.functions.normalize import normalize_udf

    alias_norm = aliases.select(
        normalize_udf(F.col("alias")).alias("alias"), F.col("subject_id")
    ).where(F.col("alias") != "")
    ambiguity = alias_norm.groupBy("alias").agg(
        F.countDistinct("subject_id").alias("n_ids")
    )
    alias_b = F.broadcast(alias_norm.join(ambiguity, "alias"))
    return (
        mentions.join(alias_b, mentions.mention == alias_b["alias"])
        .select("url", "mention", "subject_id", "n_ids")
    )


def blocking_keys(
    docs: DataFrame,
    candidates: DataFrame,
    text_tokens_col: str = "tokens",
    use_host: bool = True,
    use_entity: bool = True,
    use_minhash: bool = True,
    max_alias_ambiguity: int = MAX_ALIAS_AMBIGUITY,
) -> DataFrame:
    """Union of blocking keys: (url, key) rows.

    key spaces are prefixed (host:/ent:/mh:<band>) so they never collide.

    ent: keys are emitted only for candidates supported by a low-ambiguity
    alias (n_ids <= max_alias_ambiguity). A hot alias shared by dozens of
    entities (the reference's stop-word problem, el_main.py:534-537) would
    otherwise inject every doc mentioning it into every one of those
    entities' blocks, blowing them past the size cap and destroying the
    discriminative pairs inside — the skew would also dominate the
    self-join at scale.
    """
    parts = []
    if use_host:
        parts.append(
            docs.select(
                "url",
                F.concat(F.lit("host:"), F.parse_url("url", F.lit("HOST"))).alias("key"),
            ).where(F.col("key").isNotNull())
        )
    if use_entity:
        parts.append(
            candidates.where(F.col("n_ids") <= max_alias_ambiguity)
            .select("url", F.concat(F.lit("ent:"), F.col("subject_id")).alias("key"))
            .distinct()
        )
    if use_minhash:
        bands = docs.select("url", minhash_bands_udf(F.col(text_tokens_col)).alias("bands"))
        parts.append(
            bands.select("url", F.posexplode("bands").alias("band_idx", "band_hash"))
            .select(
                "url",
                F.concat_ws(":", F.lit("mh"), "band_idx", "band_hash").alias("key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def candidate_pairs(
    keys: DataFrame, max_block_size: int = MAX_BLOCK_SIZE
) -> DataFrame:
    """Within-block pair generation with stop-key removal.

    Blocks larger than ``max_block_size`` are dropped (non-discriminative
    keys: hot aliases, boilerplate LSH bands, mega-hosts). The self-join
    is an equi join on the key; with capped blocks the per-key output is
    bounded, and the final distinct dedups pairs that co-occur under
    several keys.
    """
    sizes = keys.groupBy("key").agg(F.count("*").alias("block_size"))
    kept = keys.join(
        sizes.where(F.col("block_size") <= max_block_size).select("key"), "key"
    )
    a = kept.select(F.col("key"), F.col("url").alias("url_a"))
    b = kept.select(F.col("key"), F.col("url").alias("url_b"))
    return (
        a.join(b, "key")
        .where(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b")
        .distinct()
    )
