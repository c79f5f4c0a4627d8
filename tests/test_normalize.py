"""Golden tests for the frozen normalization core.

Expected values were produced by the public BERT BasicTokenizer
algorithm (semantics of reference entity_candidate/utils/
tokenization.py:147-248) and are embedded as literals so tests have
no dependency on the read-only reference tree. Byte-identity here IS
the per-url extraction invariant of BASELINE.json.
"""

from entity_linking_spark.functions.normalize import (
    basic_tokenize,
    clean_text,
    normalize_text,
)

GOLDENS = [
    ('Hello, World! This is   a TEST.', ['hello', ',', 'world', '!', 'this', 'is', 'a', 'test', '.']),
    ('naïve café résumé — ÅBÇ', ['naive', 'cafe', 'resume', '—', 'abc']),
    ('南京南站 is a railway station in 南京', ['南', '京', '南', '站', 'is', 'a', 'railway', 'station', 'in', '南', '京']),
    ('mix 中文 and english, 标点。也有！', ['mix', '中', '文', 'and', 'english', ',', '标', '点', '。', '也', '有', '！']),
    ('tabs\tand\nnewlines\r\nhere', ['tabs', 'and', 'newlines', 'here']),
    ('control\x00chars\x7fdropped�yes', ['controlcharsdroppedyes']),
    ('ASCII punct: a-b_c~d`e^f$g#h@i!j?k', ['ascii', 'punct', ':', 'a', '-', 'b', '_', 'c', '~', 'd', '`', 'e', '^', 'f', '$', 'g', '#', 'h', '@', 'i', '!', 'j', '?', 'k']),
    ('digits 123-456.789', ['digits', '123', '-', '456', '.', '789']),
    ('ＦＵＬＬｗｉｄｔｈ\u3000ｔｅｘｔ', ['ｆｕｌｌｗｉｄｔｈ', 'ｔｅｘｔ']),
    ('combining: é à ô', ['combining', ':', 'e', 'a', 'o']),
    ('ʼn ǅ ǈ special casing', ['ʼn', 'ǆ', 'ǉ', 'special', 'casing']),
    ('Ｑｕｏｔｅｓ «guillemets» „low” ‚single’', ['ｑｕｏｔｅｓ', '«', 'guillemets', '»', '„', 'low', '”', '‚', 'single', '’']),
    ('emoji 😀 and ♥ symbols', ['emoji', '😀', 'and', '♥', 'symbols']),
    ('Ⅻ roman ① circled ㊣', ['ⅻ', 'roman', '①', 'circled', '㊣']),
    ('zero\u200bwidth\u200dspace\u2060chars', ['zerowidthspacechars']),
    ('nbsp and thin\u3000ideographic', ['nbsp', 'and', 'thin', 'ideographic']),
    ('ÆØÞß ligatures ﬁﬂ', ['æøþß', 'ligatures', 'ﬁﬂ']),
    ('Ellipsis… and – dashes — em', ['ellipsis', '…', 'and', '–', 'dashes', '—', 'em']),
    ('日本語のテキストとカタカナ', ['日', '本', '語', 'のテキストとカタカナ']),
    ('한국어 텍스트 테스트', ['한국어', '텍스트', '테스트']),
    ('русский текст Тест', ['русскии', 'текст', 'тест']),
    ('ελληνικά Κείμενο', ['ελληνικα', 'κειμενο']),
    ('العربية نص', ['العربية', 'نص']),
    ('עברית טקסט', ['עברית', 'טקסט']),
    ('ça va? ÊTRE élève', ['ca', 'va', '?', 'etre', 'eleve']),
    ('', []),
    ('   ', []),
    ('\t\n\r', []),
    ('a', ['a']),
    ('。', ['。']),
    ('𠀀𪛕 ext-B ideographs', ['𠀀', '𪛕', 'ext', '-', 'b', 'ideographs']),
    ('\ufeffBOM start', ['bom', 'start']),
]


def test_basic_tokenize_goldens():
    for text, expected in GOLDENS:
        assert basic_tokenize(text) == expected, repr(text)


def test_normalize_text_is_joined_tokens():
    for text, expected in GOLDENS:
        assert normalize_text(text) == " ".join(expected)


def test_ascii_fast_path_equals_general_path():
    # force the general path by prefixing a non-ASCII char, then strip it
    for text, _ in GOLDENS:
        if text.isascii():
            general = basic_tokenize("\u00e9 " + text)[1:]
            assert basic_tokenize(text) == general, repr(text)


def test_clean_text_drops_controls_keeps_ws():
    assert clean_text("a\x00b\x7fc\ufffdd") == "abcd"
    assert clean_text("a\tb\nc\rd") == "a b c d"
    assert clean_text("a\u00a0b\u3000c") == "a b c"



def test_tokenize_batch_identical_to_per_doc():
    """The megastring ASCII batch path is basic_tokenize, exactly —
    including NULs in input (dropped by translate, so the separator is
    safe), controls, mixed scripts, empties, and None."""
    from entity_linking_spark.functions.normalize import (
        basic_tokenize,
        tokenize_batch,
    )

    cases = [
        None,
        "",
        "plain ascii text here",
        "Punct-mix!! (a,b); c:d",
        "a\x00b with a real NUL",
        "tab\tsep\nnewline\rcr",
        "héllo accentéd wörld",
        "中文 mixed with ascii",
        "  leading  and   trailing   ",
    ]
    got = tokenize_batch(cases)
    for t, g in zip(cases, got):
        assert g == (basic_tokenize(t) if t is not None else None), t


# --- hypothesis property tests (frozen-normalizer invariants) ------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_tokenize_is_idempotent(t):
    """Re-normalizing already-normalized text is a no-op: mention strings
    normalized on different paths (alias side vs mention side) must land
    on the same key, however many times the normalizer ran."""
    once = basic_tokenize(t)
    assert basic_tokenize(" ".join(once)) == once


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=80)), max_size=6))
def test_tokenize_batch_property(batch):
    """The megastring ASCII batch path equals per-doc basic_tokenize for
    ARBITRARY unicode batches (hypothesis-generated), not just the
    hand-picked cases above — NULs, controls, surrogata-adjacent chars,
    mixed scripts, empties, None."""
    from entity_linking_spark.functions.normalize import tokenize_batch

    got = tokenize_batch(batch)
    assert got == [basic_tokenize(t) if t is not None else None for t in batch]
