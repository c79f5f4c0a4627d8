"""Extraction byte-identity: extract_text(make_html(t, u)) == t.

This is the BASELINE.json per-url invariant (SURVEY.md §2.7 F1/F22).
Property-tested with hypothesis plus a full-corpus Spark check.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_linking_spark.operators.extract import extract_text, with_extracted_text
from entity_linking_spark.schema import make_html, synth_documents, DOCUMENTS_SCHEMA

# any unicode text without control chars other than \n (real extracted text)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFFF),
    max_size=400,
).map(lambda s: s)


@given(_text)
@settings(max_examples=300, deadline=None)
def test_roundtrip_property(t):
    assert extract_text(make_html(t, "https://x.example/p")) == t


def test_roundtrip_entities_and_tags():
    tricky = [
        "a & b < c > d",
        "&amp;lt; literal entity strings &quot; &nbsp; &#39;",
        "multi\nline\n\ntext\n",
        "中文内容 & <标签>",
        "",
        "\n",
        "ends with newline\n",
    ]
    for t in tricky:
        assert extract_text(make_html(t, "u")) == t, repr(t)


def test_extract_none():
    assert extract_text(None) is None


def test_fallback_strips_tags():
    html = b"<html><body><div>hello <b>world</b></div></body></html>"
    assert extract_text(html) == "hello world"


def test_spark_full_corpus_byte_identity(spark):
    pdf = synth_documents(n_docs=200, n_entities=50)
    df = spark.createDataFrame(pdf, schema=DOCUMENTS_SCHEMA)
    out = with_extracted_text(df)
    mismatches = out.where("text_extracted <> text OR text_extracted IS NULL").count()
    assert mismatches == 0
    assert out.count() == len(pdf)  # base docs + near-dup copies
