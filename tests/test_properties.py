"""Hypothesis property tests (SURVEY.md §5 item 4 — mirrors the
reference's randomized tests, TestLangIdV3.java:80-112)."""

import hypothesis.strategies as st
from hypothesis import given, settings

from language_detection_spark.functions.ngram import (
    extract_gram_keys,
    extract_ngrams_scanner,
    pack_gram,
    unpack_gram,
)
from language_detection_spark.functions.normalize import (
    normalize_vi,
    prepare_text,
)
from language_detection_spark.models.profile import LangProfile

# text strategy: all planes incl. surrogate-pair-producing chars,
# combining marks, spaces
_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0x300, max_codepoint=0x36F),
        st.characters(min_codepoint=0x3040, max_codepoint=0x30FF),
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4FFF),
        st.characters(min_codepoint=0x1F600, max_codepoint=0x1F64F),
        st.just(" "),
    ),
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_vectorized_extractor_equals_scanner(text):
    want = sorted(pack_gram(g) for g in extract_ngrams_scanner(text))
    got = sorted(int(k) for k in extract_gram_keys(text))
    assert got == want


@settings(max_examples=200, deadline=None)
@given(_text)
def test_pack_unpack_roundtrip(text):
    """Round-trip preserves the UTF-16 unit sequence.  (A gram holding an
    adjacent surrogate pair decodes back to the astral char — the same
    canonicalization JSON applies — so compare units, not str identity.)"""

    def units(s: str) -> bytes:
        return s.encode("utf-16-le", "surrogatepass")

    for g in extract_ngrams_scanner(text):
        assert units(unpack_gram(pack_gram(g))) == units(g)


@settings(max_examples=100, deadline=None)
@given(_text)
def test_prepare_text_idempotent_on_spaces(text):
    """prepare_text never leaves a double space and never grows the text."""
    out = prepare_text(text)
    assert "  " not in out
    assert len(out) <= len(text)


@settings(max_examples=100, deadline=None)
@given(_text)
def test_normalize_vi_length_preserved_or_shrunk(text):
    # composition only ever replaces a (base, dmark) pair with one char
    assert len(normalize_vi(text)) <= len(text)


@settings(max_examples=60, deadline=None)
@given(st.lists(_text, max_size=8), st.lists(_text, max_size=8))
def test_profile_merge_is_update_order_free(texts_a, texts_b):
    """Training on A then B == training on A and B merged (T2 semantics)."""
    both = LangProfile("x")
    for t in texts_a + texts_b:
        both.update(t)
    a = LangProfile("x")
    for t in texts_a:
        a.update(t)
    b = LangProfile("x")
    for t in texts_b:
        b.update(t)
    a.merge(b)
    assert a.freq == both.freq
    assert a.n_words == both.n_words


@settings(max_examples=60, deadline=None)
@given(st.lists(_text, min_size=1, max_size=6))
def test_profile_json_roundtrip(texts):
    p = LangProfile("zz")
    for t in texts:
        p.update(t)
    q = LangProfile.from_json(p.to_json())
    assert q.freq == p.freq and q.n_words == p.n_words and q.name == p.name


@given(
    h=st.integers(min_value=0, max_value=(1 << 60) - 1),
    a=st.integers(min_value=1, max_value=(1 << 31) - 1),
    b=st.integers(min_value=0, max_value=(1 << 61) - 2),
)
@settings(max_examples=500, deadline=None)
def test_affine_perm_fold_congruent_and_int64_safe(h, a, b):
    """The MinHash affine permutation's Mersenne-61 fold: (1) every
    intermediate of the shift/mask formula stays below 2^63 (the int64
    bound both Spark and DuckDB require — DuckDB errors on overflow,
    Spark would silently wrap), and (2) the result is congruent to
    a*h + b mod 2^61-1, evaluated with exact Python bigints."""
    P = (1 << 61) - 1
    M30 = (1 << 30) - 1
    M31 = (1 << 31) - 1
    h_hi = h >> 31
    h_lo = h & M31
    t1 = a * h_hi
    t2 = a * h_lo
    t1m = (t1 >> 30) + ((t1 & M30) << 31)
    s = t1m + t2 + b
    out = (s >> 61) + (s & P)
    for name, v in [("t1", t1), ("t2", t2), ("t1m", t1m), ("s", s), ("out", out)]:
        assert 0 <= v < (1 << 63), f"{name} overflows int64: {v}"
    assert out % P == (a * h + b) % P
