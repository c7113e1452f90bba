"""Text front-end for matchers (tsdb/selector.py): parse/format round-trip,
PromQL-shape acceptance, loud rejection of malformed input, and parse-time
regex-subset validation."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tagtree_spark.tsdb.matchers import LabelMatcher, MatchOp
from tagtree_spark.tsdb.selector import (
    SelectorParseError,
    format_selector,
    parse_selector,
)


def test_parses_the_promql_shapes():
    got = parse_selector('{name=~"v.*", b!="y"}')
    assert got == [
        LabelMatcher(MatchOp.EQL_REGEX, "name", "v.*"),
        LabelMatcher(MatchOp.NEQ, "b", "y"),
    ]
    assert parse_selector("{}") == []
    assert parse_selector('{ a = "x" , }') == [LabelMatcher(MatchOp.EQL, "a", "x")]
    # ordering extensions (M5-M8) + all three quote styles + escapes
    got = parse_selector(
        "{lo<'m', hi>=`raw\\no-escape`, q=\"a\\\"b\\n\", u=\"\\x41\\u00e9\"}"
    )
    assert got == [
        LabelMatcher(MatchOp.LSS, "lo", "m"),
        LabelMatcher(MatchOp.GTE, "hi", "raw\\no-escape"),
        LabelMatcher(MatchOp.EQL, "q", 'a"b\n'),
        LabelMatcher(MatchOp.EQL, "u", "Aé"),
    ]
    # duplicate names conjoin (a range)
    assert [m.op for m in parse_selector('{x>"a", x<"f"}')] == [
        MatchOp.GTR,
        MatchOp.LSS,
    ]


def test_rejects_malformed_with_position():
    for bad, frag in [
        ('a="x"}', "start with"),
        ('{a="x"', "',' or '}'"),
        ('{1a="x"}', "label name"),
        ('{a=="x"}', "quoted string"),
        ('{a~"x"}', "matcher op"),
        ('{a="x}', "unterminated"),
        ('{a="\\q"}', "unknown escape"),
        ('{a="x"} trailing', "trailing"),
        ('{a="x" b="y"}', "',' or '}'"),
        ('{a="\\xZZ"}', "malformed"),
    ]:
        with pytest.raises(SelectorParseError, match=frag):
            parse_selector(bad)


def test_regex_subset_validated_at_parse_time():
    """A selector can't smuggle an engine-divergent pattern past the
    construction-time check (lookahead is Java-only)."""
    with pytest.raises(ValueError, match="RE2"):
        parse_selector('{a=~"x(?=y)"}')
    with pytest.raises(ValueError, match="backreference"):
        parse_selector('{a!~"(x)\\\\1"}')
    # plain ops take any value — no regex check
    parse_selector('{a="x(?=y)"}')


_names = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,10}", fullmatch=True)
_plain_values = st.text(
    st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=20
)
_plain_ops = st.sampled_from(
    [MatchOp.EQL, MatchOp.NEQ, MatchOp.LSS, MatchOp.GTR, MatchOp.LTE, MatchOp.GTE]
)
# regex ops need subset-valid patterns; build from safe fragments
_regex_values = st.lists(
    st.sampled_from(["a", "b+", "[xy]", "c*", "(d|e)", "f?", ".", "g{1,3}"]),
    min_size=1,
    max_size=5,
).map("".join)


@st.composite
def _matchers(draw):
    if draw(st.booleans()):
        return LabelMatcher(draw(_plain_ops), draw(_names), draw(_plain_values))
    op = draw(st.sampled_from([MatchOp.EQL_REGEX, MatchOp.NEQ_REGEX]))
    return LabelMatcher(op, draw(_names), draw(_regex_values))


@settings(max_examples=200, deadline=None)
@given(st.lists(_matchers(), min_size=0, max_size=6))
def test_format_parse_roundtrip(ms):
    assert parse_selector(format_selector(ms)) == ms
