"""Deterministic HTML -> text extraction over Arrow batches.

Our analog of the reference's WikiExtractor <doc>-stream scan
(process_wiki_extractor_output.py:51-91, *_full.py:52-91): one pure
function ``extract_text(html: bytes) -> str`` applied via ``mapInPandas``
so each task processes whole Arrow record batches (never per-row Python
UDFs — the reference's per-line ElementTree parse at
process_wiki_extractor_output.py:58-60 becomes a vectorized map).

The extractor is a small deterministic state machine, not a heavyweight
HTML library: it drops <script>/<style> blocks, keeps only content inside
<article>/<p>, strips all other tags, and decodes the HTML entities our
corpus uses. Byte-identity per url — extract_text(make_html(t, u)) == t —
is the BASELINE.json invariant, property-tested in tests/test_extract.py.

At 100 TB scale this stage is a narrow map: no shuffle, filter/column
pruning reach the Iceberg/Parquet scan untouched, and throughput is bound
by scan + regex, both embarrassingly parallel.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCRIPT_RE = re.compile(rb"<script\b.*?</script>", re.DOTALL | re.IGNORECASE)
_STYLE_RE = re.compile(rb"<style\b.*?</style>", re.DOTALL | re.IGNORECASE)
_ARTICLE_RE = re.compile(rb"<article\b[^>]*>(.*?)</article>", re.DOTALL | re.IGNORECASE)
_P_RE = re.compile(rb"<p\b[^>]*>(.*?)</p>", re.DOTALL | re.IGNORECASE)
_TAG_RE = re.compile(rb"<[^>]+>")


def _unescape(s: str) -> str:
    # Order matters: &amp; last so "&amp;lt;" round-trips as "&lt;".
    return (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&#39;", "'")
        .replace("&nbsp;", " ")
        .replace("&amp;", "&")
    )


def extract_text(html: bytes | None) -> str | None:
    """Pure, deterministic HTML -> text. See module docstring."""
    if html is None:
        return None
    body = _SCRIPT_RE.sub(b"", html)
    body = _STYLE_RE.sub(b"", body)
    m = _ARTICLE_RE.search(body)
    scope = m.group(1) if m else body
    paras = _P_RE.findall(scope)
    if not paras:
        # fallback: strip all tags in scope
        raw = _TAG_RE.sub(b" ", scope).decode("utf-8", errors="replace")
        return _unescape(" ".join(raw.split()))
    decoded = [_unescape(p.decode("utf-8", errors="replace")) for p in paras]
    return "\n".join(decoded)


def with_extracted_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text_extracted"
) -> DataFrame:
    """Append extracted text via mapInPandas (Arrow-batched, narrow)."""
    out_schema = StructType(df.schema.fields + [StructField(out_col, StringType(), True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[html_col].map(extract_text)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_and_tokenize(
    df: DataFrame,
    html_col: str = "html",
    keep: tuple[str, ...] = ("url", "warc_ts", "lang"),
) -> DataFrame:
    """Fused extract + tokenize + MinHash bands + hash-embedding in ONE
    Python pass.

    Chaining mapInPandas(extract) into per-column pandas UDFs costs a
    JVM<->Python Arrow round-trip per stage, with the multi-KB html
    binary column riding through the first (measured 5x slower at 200k
    docs) and the token array re-crossing for every downstream per-doc
    feature. Fusing computes every per-document feature the pipeline
    needs while the tokens are already in Python memory, and emits only
    the projected columns — the moral equivalent of whole-stage codegen
    for the Python segment of the plan. Downstream stages (blocking keys,
    scoring) then run entirely JVM-side on the precomputed columns.
    """
    from entity_linking_spark.functions.minhash import (
        bands_from_signatures,
        minhash_signatures_batch,
    )
    from entity_linking_spark.functions.normalize import tokenize_batch
    from entity_linking_spark.functions.vectors import hash_embed_matrix

    fields = [f for f in df.schema.fields if f.name in keep]
    out_schema = StructType(
        fields
        + [
            StructField("text", StringType(), True),
            StructField("tokens", ArrayType(StringType()), True),
            StructField("bands", ArrayType(LongType()), True),
            StructField("vec", ArrayType(FloatType()), True),
        ]
    )
    keep_cols = [f.name for f in fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[html_col].map(extract_text)
            token_lists = tokenize_batch(list(texts))
            sigs = minhash_signatures_batch(token_lists)
            bands = bands_from_signatures(sigs)
            emb = hash_embed_matrix([t or [] for t in token_lists])
            out = pdf[keep_cols].copy()
            out["text"] = texts
            out["tokens"] = token_lists
            out["bands"] = bands
            out["vec"] = list(emb)
            yield out

    return df.select(*keep_cols, html_col).mapInPandas(run, schema=out_schema)


def tokenize_and_featurize(
    df: DataFrame, text_col: str = "text", id_col: str = "url"
) -> DataFrame:
    """Fused tokenize + MinHash bands + hash-embedding for ALREADY-extracted
    text (the no-html sibling of extract_and_tokenize — same rationale:
    tokens cross JVM<->Python once, every per-doc feature is computed while
    they're in Python memory)."""
    from entity_linking_spark.functions.minhash import bands_from_signatures, minhash_signatures_batch
    from entity_linking_spark.functions.normalize import tokenize_batch
    from entity_linking_spark.functions.vectors import hash_embed_matrix

    out_schema = StructType(
        [
            StructField(id_col, StringType(), True),
            StructField("tokens", ArrayType(StringType()), True),
            StructField("bands", ArrayType(LongType()), True),
            StructField("vec", ArrayType(FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            token_lists = tokenize_batch(list(pdf[text_col]))
            sigs = minhash_signatures_batch(token_lists)
            bands = bands_from_signatures(sigs)
            emb = hash_embed_matrix([t or [] for t in token_lists])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": token_lists,
                    "bands": bands,
                    "vec": list(emb),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
