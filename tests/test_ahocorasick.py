"""Aho-Corasick behavior tests — the 9 reference behaviors
(/root/reference/src/ahocorasick.zig:127-234, reimplemented as specs, not
copied) plus automaton ≡ regex equivalence properties."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datachecker_spark.ahocorasick import AhoCorasick


def ac(*patterns):
    return AhoCorasick(list(patterns))


def test_basic_contains():
    a = ac("he", "she", "his", "hers")
    assert a.contains("ushers")
    assert a.contains("his book")
    assert not a.contains("xyz")


def test_suffix_match_through_failure_links():
    # matching "she" must also register "he" (end-flag propagation):
    # a text reaching the 'she' state is accepting even if only "he" is a pattern
    a = ac("he")
    assert a.contains("she")
    b = ac("she", "he")
    assert b.contains("ushe")  # 'she' completes mid-stream


def test_overlapping_patterns():
    a = ac("ab", "bc")
    assert a.contains("abc")
    assert a.contains("xbc")
    assert not a.contains("ac")


def test_nested_patterns():
    a = ac("a", "aa", "aaa")
    assert a.contains("a")
    assert a.contains("baab")
    assert not a.contains("bbb")


def test_empty_pattern_list():
    a = ac()
    assert not a.contains("anything")
    assert not a.contains("")


def test_empty_pattern_ignored():
    a = ac("", "x")
    assert a.contains("axb")
    assert not a.contains("ab")


def test_single_char_patterns():
    a = ac("x", "y")
    assert a.contains("abcx")
    assert a.contains("yabc")
    assert not a.contains("abc")


def test_anchoring_start_and_end():
    a = ac("start", "end")
    assert a.contains("start of text")
    assert a.contains("text at the end")
    assert not a.contains("sta rt en d")


def test_mid_stream_suffix():
    a = ac("issip")
    assert a.contains("mississippi")
    assert not a.contains("missisipi")


def test_streaming_feed_across_chunks():
    """State carried across chunk boundaries — the reference's
    cross-chunk match semantics (confidential.zig:66-88)."""
    a = ac("secret")
    hit, state = a.feed("this is sec")
    assert not hit
    hit, _ = a.feed("ret stuff", state)
    assert hit
    # fresh state must NOT match the second chunk alone
    assert not a.contains("ret stuff")


def test_unicode_patterns():
    a = ac("héllo", "日本語")
    assert a.contains("say héllo!")
    assert a.contains("これは日本語です")
    assert not a.contains("hello")


@given(
    patterns=st.lists(st.text(alphabet="abc", min_size=1, max_size=4), min_size=1, max_size=6),
    text=st.text(alphabet="abc", max_size=40),
)
@settings(max_examples=300, deadline=None)
def test_automaton_equals_regex_and_python_in(patterns, text):
    a = AhoCorasick(patterns)
    expected = any(p in text for p in patterns)
    assert a.contains(text) == expected
    assert bool(a.regex().search(text)) == expected


@given(
    pattern=st.text(alphabet="ab", min_size=2, max_size=6),
    text=st.text(alphabet="ab", min_size=0, max_size=60),
    split=st.integers(min_value=0, max_value=60),
)
@settings(max_examples=200, deadline=None)
def test_feed_chunking_invariance(pattern, text, split):
    """Splitting the text at any point and feeding both halves must equal a
    single-shot scan."""
    a = AhoCorasick([pattern])
    k = min(split, len(text))
    hit1, state = a.feed(text[:k])
    hit2, _ = a.feed(text[k:], state)
    assert (hit1 or hit2) == a.contains(text)
