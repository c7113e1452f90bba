"""PromQL expression front-end (VERDICT r11 #6): recursive-descent
parser/formatter round-trips (hypothesis-pinned on random ASTs) plus
evaluator semantics against hand-built frames."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tagtree_spark.tsdb.exprlang import (
    _AGG_OPS,
    AggExpr,
    At,
    BinOp,
    Call,
    ExprParseError,
    MatrixSelector,
    Number,
    Str,
    Subquery,
    VectorSelector,
    evaluate,
    format_duration,
    format_expr,
    parse_expr,
)
from tagtree_spark.tsdb.matchers import LabelMatcher, MatchOp

# --- parser basics ---------------------------------------------------------


def test_parse_judge_exemplar():
    e = parse_expr(
        'max_over_time(rate(events_total{event_type="click"}[1d])[7d:1d])'
    )
    assert isinstance(e, Call) and e.func == "max_over_time"
    (sq,) = e.args
    assert isinstance(sq, Subquery)
    assert sq.range_ms == 7 * 86400_000 and sq.step_ms == 86400_000
    inner = sq.inner
    assert isinstance(inner, Call) and inner.func == "rate"
    (m,) = inner.args
    assert isinstance(m, MatrixSelector) and m.range_ms == 86400_000
    assert m.inner.name == "events_total"
    assert m.inner.matchers == (
        LabelMatcher(MatchOp.EQL, "event_type", "click"),
    )


def test_parse_unbounded_subquery_and_arith():
    e = parse_expr("max_over_time(rate(events_total[1d])[:1d]) * 100")
    assert isinstance(e, BinOp) and e.op == "*"
    assert isinstance(e.right, Number) and e.right.value == 100.0
    assert isinstance(e.left.args[0], Subquery)
    assert e.left.args[0].range_ms is None


@pytest.mark.parametrize(
    "bad",
    [
        "rate(events_total[1d]",  # unbalanced paren
        "events_total{",  # unterminated selector
        "rate(events_total[0s])",  # zero duration
        "x[1m1h]",  # ascending units
        "rate(events_total[1d]) 5",  # trailing input
        "",  # empty
        "rate(events_total[1d1d])",  # repeated unit
    ],
)
def test_parse_errors_are_loud(bad):
    with pytest.raises(ExprParseError):
        parse_expr(bad)


def test_parse_selector_value_with_braces():
    """ADVICE r12 #2: the selector-brace scan must honor quoted strings
    — a matcher value containing '}' or '{' used to mis-slice."""
    e = parse_expr('rate(m{a="x}y", b="{q"}[1d])')
    (m,) = e.args
    assert m.inner.matchers == (
        LabelMatcher(MatchOp.EQL, "a", "x}y"),
        LabelMatcher(MatchOp.EQL, "b", "{q"),
    )
    # escaped quote inside the value, then a brace
    e2 = parse_expr('rate(m{a="x\\"}"}[1d])')
    assert e2.args[0].inner.matchers == (LabelMatcher(MatchOp.EQL, "a", 'x"}'),)
    with pytest.raises(ExprParseError):
        parse_expr('rate(m{a="unterminated}[1d])')


def test_parse_negative_number_literals():
    """ADVICE r12 #4: unary minus on number literals (constant-folded
    BinOps can produce negative Number nodes; format emits '-2')."""
    assert parse_expr("-2") == Number(-2.0)
    assert parse_expr(format_expr(Number(-2.0))) == Number(-2.0)
    e = parse_expr("rate(events_total[1d]) * -0.5")
    assert isinstance(e, BinOp) and e.right == Number(-0.5)
    assert parse_expr("3 - -2") == BinOp("-", Number(3.0), Number(-2.0))
    with pytest.raises(ExprParseError):
        parse_expr("-rate(events_total[1d])")  # unary minus on vectors: loud


def test_parse_agg_by():
    e = parse_expr("sum by (event_type, user_bucket) (rate(events_total[1d]))")
    assert isinstance(e, AggExpr)
    assert e.op == "sum" and e.by == ("event_type", "user_bucket")
    assert isinstance(e.expr, Call) and e.expr.func == "rate"
    # global form, and `by` as a word boundary (bygone is a selector name)
    assert isinstance(parse_expr("max(rate(events_total[1h]))"), AggExpr)
    g = parse_expr("count(increase(events_total[1d]))")
    assert isinstance(g, AggExpr) and g.by == ()
    with pytest.raises(ExprParseError):
        parse_expr("sum bygone (rate(events_total[1d]))")


def test_duration_compound():
    assert parse_expr("f(x[1h30m])").args[0].range_ms == 5400_000
    assert format_duration(5400_000) == "1h30m"
    assert format_duration(90061_500) == "1d1h1m1s500ms"
    assert format_duration(7 * 86400_000) == "1w"


# --- hypothesis round-trip: parse(format(ast)) == ast ----------------------

_idents = st.from_regex(r"[a-z_][a-z0-9_]{0,8}", fullmatch=True)
_durations = st.integers(min_value=1, max_value=10**10)
_numbers = st.one_of(
    st.integers(min_value=-(10**9), max_value=10**9).map(float),
    st.floats(
        min_value=-1e12,
        max_value=1e12,
        allow_nan=False,
        allow_infinity=False,
    ),
).map(Number)
_matchers = st.lists(
    st.builds(
        LabelMatcher,
        st.sampled_from([MatchOp.EQL, MatchOp.NEQ, MatchOp.GTR, MatchOp.LTE]),
        st.from_regex(r"[a-z_][a-z0-9_]{0,6}", fullmatch=True),
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .*[]()^$\\\"'\n\t",
            max_size=8,
        ),
    ),
    max_size=3,
).map(tuple)
_selectors = st.builds(VectorSelector, _idents, _matchers)
_strs = st.builds(
    Str,
    st.text(
        alphabet='abcdefghijklmnopqrstuvwxyz0123456789 .*$|\\"\n\t', max_size=8
    ),
)
# @ timestamps: µs up to ~2096 (< 2^53, so seconds round-trip exactly)
_ats = st.builds(At, _selectors, st.integers(min_value=0, max_value=4 * 10**15))
_leaves = st.one_of(_numbers, _selectors, _strs, _ats)


# "on" after an arithmetic operator is the matching clause, so a CALL
# named on there is genuinely ambiguous — reserved, like PromQL keywords
_RESERVED = {"on", "and", "or", "unless", "by", "without"}
_call_idents = _idents.filter(lambda n: n not in _AGG_OPS and n not in _RESERVED)
_agg_labels = st.from_regex(r"[a-z_][a-z0-9_]{0,6}", fullmatch=True)
_agg_by = st.lists(_agg_labels, max_size=2).map(tuple)
_on_labels = st.lists(_agg_labels, min_size=1, max_size=2).map(tuple)
_all_binops = list("+-*/") + [">=", "<=", "==", "!=", ">", "<", "and", "or", "unless"]


def _extend(children):
    return st.one_of(
        st.builds(
            MatrixSelector,
            _selectors,
            _durations,
            st.one_of(st.just(0), _durations),
        ),
        st.builds(Subquery, children, st.one_of(st.none(), _durations), _durations),
        st.builds(
            Call, _call_idents, st.lists(children, min_size=1, max_size=2).map(tuple)
        ),
        st.builds(AggExpr, st.sampled_from(sorted(_AGG_OPS)), _agg_by, children),
        st.builds(
            AggExpr,
            st.sampled_from(sorted(_AGG_OPS)),
            st.lists(_agg_labels, min_size=1, max_size=2).map(tuple),
            children,
            st.just(True),  # without-grouping (needs a nonempty label list)
        ),
        st.builds(BinOp, st.sampled_from(_all_binops), children, children),
        st.builds(
            BinOp, st.sampled_from("+-*/"), children, children, _on_labels
        ),
        st.builds(  # comparison with the bool modifier
            BinOp,
            st.sampled_from([">=", "<=", "==", "!=", ">", "<"]),
            children,
            children,
            st.just(()),
            st.just(True),
        ),
        st.builds(  # on(...) group_left
            BinOp,
            st.sampled_from("+-*/"),
            children,
            children,
            _on_labels,
            st.just(False),
            st.just(True),
        ),
    )


_asts = st.recursive(_leaves, _extend, max_leaves=8)


@settings(max_examples=300, deadline=None)
@given(_asts)
def test_format_parse_roundtrip(ast):
    assert parse_expr(format_expr(ast)) == ast


# --- evaluator -------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_samples(spark):
    # one series: counter 0,5,3,9 over 4 hours of one day + day2 10,11
    rows = [
        (1, "2024-01-01 00:00:00", 0.0),
        (1, "2024-01-01 01:00:00", 5.0),
        (1, "2024-01-01 02:00:00", 3.0),  # reset
        (1, "2024-01-01 03:00:00", 9.0),
        (1, "2024-01-02 00:00:00", 10.0),
        (1, "2024-01-02 06:00:00", 11.0),
        (2, "2024-01-01 00:00:00", 7.0),
        (2, "2024-01-01 12:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "tsid bigint, ts string, value double")
    return df.selectExpr("tsid", "CAST(ts AS TIMESTAMP) AS ts", "value")


def test_eval_rate_and_max_over_time(tiny_samples):
    out = {
        r["tsid"]: r["value"]
        for r in evaluate(
            "max_over_time(rate(events_total[1d])[:1d])", tiny_samples
        ).collect()
    }
    # day1 inc = 5 + 6 = 11 over 3h span; day2 inc = 1 over 6h span
    assert out[1] == pytest.approx(11.0 / (3 * 3600), rel=1e-12)
    assert out[2] == 0.0


def test_eval_bounded_subquery_keeps_trailing_buckets(tiny_samples):
    # 1d bound → only the LAST rate bucket (day2 for tsid 1)
    out = {
        r["tsid"]: r["value"]
        for r in evaluate(
            "max_over_time(rate(events_total[1d])[1d:1d])", tiny_samples
        ).collect()
    }
    assert out[1] == pytest.approx(1.0 / (6 * 3600), rel=1e-12)
    assert 2 not in out  # tsid 2's only bucket is outside the window


def test_eval_scalar_arithmetic(tiny_samples):
    out = {
        r["tsid"]: r["value"]
        for r in evaluate(
            "max_over_time(increase(events_total[1d])[:1d]) * 2 + 1",
            tiny_samples,
        ).collect()
    }
    assert out[1] == pytest.approx(11.0 * 2 + 1)


def test_eval_count_and_changes(tiny_samples):
    out = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("changes(events_total[1d])", tiny_samples).collect()
    }
    day1 = 19723  # 2024-01-01 in day buckets
    assert out[(1, day1)] == 3.0
    assert out[(2, day1)] == 0.0


@pytest.fixture(scope="module")
def tiny_series(spark):
    rows = [(1, "click"), (2, "view")]
    return spark.createDataFrame(rows, "tsid bigint, event_type string")


def test_eval_agg_by(tiny_samples, tiny_series):
    out = {
        (r["event_type"], r["bucket"]): r["value"]
        for r in evaluate(
            "sum by (event_type) (increase(events_total[1d]))",
            tiny_samples,
            series=tiny_series,
        ).collect()
    }
    day1 = 19723
    assert out[("click", day1)] == pytest.approx(11.0)
    assert out[("view", day1)] == 0.0


def test_eval_agg_global(tiny_samples):
    out = {
        r["bucket"]: r["value"]
        for r in evaluate("count(increase(events_total[1d]))", tiny_samples).collect()
    }
    day1 = 19723
    assert out[day1] == 2.0  # both series have a day-1 bucket
    assert out[day1 + 1] == 1.0


def test_eval_agg_errors(tiny_samples, tiny_series):
    with pytest.raises(ValueError):
        evaluate(
            "sum by (event_type) (rate(events_total[1d]))", tiny_samples
        )  # no series frame
    with pytest.raises(ValueError):
        evaluate(
            "sum by (nope) (rate(events_total[1d]))",
            tiny_samples,
            series=tiny_series,
        )


def test_eval_delta_and_endpoints(tiny_samples):
    day1 = 19723
    d = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("delta(events_total[1d])", tiny_samples).collect()
    }
    assert d[(1, day1)] == 9.0  # 9 - 0
    assert d[(1, day1 + 1)] == 1.0  # 11 - 10
    assert d[(2, day1)] == 0.0
    last = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("last_over_time(events_total[1d])", tiny_samples).collect()
    }
    assert last[(1, day1)] == 9.0 and last[(1, day1 + 1)] == 11.0
    first = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("first_over_time(events_total[1d])", tiny_samples).collect()
    }
    assert first[(1, day1)] == 0.0


def test_eval_topk(tiny_samples):
    day1 = 19723
    rows = evaluate("topk(1, increase(events_total[1d]))", tiny_samples).collect()
    got = {(r["tsid"], r["bucket"]) for r in rows}
    # day1: tsid 1 has increase 11 vs tsid 2's 0 → tsid 1 wins
    assert (1, day1) in got and (2, day1) not in got
    bot = evaluate("bottomk(1, increase(events_total[1d]))", tiny_samples).collect()
    assert (2, day1) in {(r["tsid"], r["bucket"]) for r in bot}


def test_eval_vector_vector_binop(tiny_samples):
    day1 = 19723
    out = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "increase(events_total[1d]) / count_over_time(events_total[1d])",
            tiny_samples,
        ).collect()
    }
    assert out[(1, day1)] == pytest.approx(11.0 / 4)
    assert out[(2, day1)] == 0.0
    # subtraction: increase - delta = recovered reset loss
    sub = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "increase(events_total[1d]) - delta(events_total[1d])", tiny_samples
        ).collect()
    }
    assert sub[(1, day1)] == pytest.approx(2.0)  # reset 5→3 lost 2
    # division drops zero denominators instead of Inf/throw
    z = evaluate(
        "increase(events_total[1d]) / resets(events_total[1d])", tiny_samples
    ).collect()
    assert {(r["tsid"], r["bucket"]) for r in z} == {(1, day1)}  # only 1 reset row
    with pytest.raises(NotImplementedError):
        evaluate(
            "rate(events_total[1d]) / rate(events_total[2d])", tiny_samples
        )  # mismatched bucket widths


def test_parse_and_eval_offset(tiny_samples):
    e = parse_expr("increase(events_total[1d] offset 7d)")
    m = e.args[0]
    assert isinstance(m, MatrixSelector) and m.offset_ms == 7 * 86400_000
    assert format_expr(m) == "events_total[1d] offset 1w"
    # offsetko is a selector name, not the modifier (word boundary)
    with pytest.raises(ExprParseError):
        parse_expr("increase(events_total[1d] offsetko)")
    day1 = 19723
    out = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "increase(events_total[1d] offset 7d)", tiny_samples
        ).collect()
    }
    # relabeled forward: day1's increase surfaces at day1+7
    assert out[(1, day1 + 7)] == pytest.approx(11.0)
    wow = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "increase(events_total[1d]) - increase(events_total[1d] offset 1d)",
            tiny_samples,
        ).collect()
    }
    assert wow[(1, day1 + 1)] == pytest.approx(1.0 - 11.0)
    with pytest.raises(NotImplementedError):
        evaluate("increase(events_total[1d] offset 36h)", tiny_samples)


def test_eval_refusals(tiny_samples):
    with pytest.raises(NotImplementedError):
        # step != inner range: overlapping-lookback instant model
        evaluate("max_over_time(rate(events_total[1d])[7d:2d])", tiny_samples)
    with pytest.raises(NotImplementedError):
        evaluate("quantile_over_time(rate(events_total[1d])[:1d])", tiny_samples)
    with pytest.raises(ValueError):
        # matchers without a postings frame
        evaluate('rate(events_total{event_type="x"}[1d])', tiny_samples)


def test_expression_matches_streamed_rollup(spark):
    """Three-way agreement on one dashboard question (q358): the
    expression layer on the BATCH model vs the STREAM-fed RollupSink
    store. Counts match bit-for-bit; sums agree within the fold-order
    fp band (per-series rounded decimals folded vs one exact total)."""
    sf = "/root/testdata/sf0.001"
    from tagtree_spark.queries import _model
    from tagtree_spark.queries_ext import _rollup_daily

    series, _, samples = _model(spark, sf)
    expr_n = {
        (r["event_type"], r["bucket"]): r["value"]
        for r in evaluate(
            "sum by (event_type) (count_over_time(events_total[1d]))",
            samples,
            series=series,
        ).collect()
    }
    expr_s = {
        (r["event_type"], r["bucket"]): r["value"]
        for r in evaluate(
            "sum by (event_type) (sum_over_time(events_total[1d]))",
            samples,
            series=series,
        ).collect()
    }
    stream = {
        (r["event_type"], r["day"]): (int(r["n"]), float(r["v_sum"]))
        for r in _rollup_daily(spark, sf).collect()
    }
    assert set(expr_n) == set(stream)
    for k, (n, v_sum_centi) in stream.items():
        assert expr_n[k] == float(n)  # integer counts: bit-exact
        assert expr_s[k] == pytest.approx(v_sum_centi / 100.0, abs=1e-9)


def test_eval_quantile_over_time(tiny_samples):
    day1 = 19723
    q = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "quantile_over_time(0.5, events_total[1d])", tiny_samples
        ).collect()
    }
    # tsid 1 day1 sorted values: 0,3,5,9 → rank ceil(0.5*4)=2 → 3
    assert q[(1, day1)] == 3.0
    assert q[(2, day1)] == 7.0
    hi = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "quantile_over_time(1, events_total[1d])", tiny_samples
        ).collect()
    }
    assert hi[(1, day1)] == 9.0
    with pytest.raises(ExprParseError):
        evaluate("quantile_over_time(1.5, events_total[1d])", tiny_samples)
    # the integer-rank guard: n=10 at phi=0.9 must pick rank 9, not 10
    import pyspark.sql.functions as SF

    ten = tiny_samples.sparkSession.createDataFrame(
        [(5, f"2024-01-01 0{i}:00:00", float(i)) for i in range(10)],
        "tsid bigint, ts string, value double",
    ).selectExpr("tsid", "CAST(ts AS TIMESTAMP) AS ts", "value")
    v = {
        r["tsid"]: r["value"]
        for r in evaluate("quantile_over_time(0.9, events_total[1d])", ten).collect()
    }
    assert v[5] == 8.0  # rank 9 of 0..9, NOT rank 10


# --- r13: strings, @, registry, new function families ----------------------


def test_parse_string_literals_and_label_fns():
    e = parse_expr(
        'label_replace(rate(m[1d]), "dst", "a\\"b\\\\c", "src", "(x.*)")'
    )
    assert isinstance(e, Call) and e.func == "label_replace"
    assert e.args[1:] == (Str("dst"), Str('a"b\\c'), Str("src"), Str("(x.*)"))
    assert parse_expr(format_expr(e)) == e
    with pytest.raises(ExprParseError):
        parse_expr('label_replace(rate(m[1d]), "unterminated)')


def test_parse_at_modifier():
    e = parse_expr('events_total{event_type="click"} @ 1705536000')
    assert isinstance(e, At) and e.at_us == 1705536000 * 1_000_000
    assert e.inner.matchers == (LabelMatcher(MatchOp.EQL, "event_type", "click"),)
    assert parse_expr(format_expr(e)) == e
    # fractional seconds round-trip exactly (µs grid)
    e2 = parse_expr("m @ 1705536000.5")
    assert e2.at_us == 1705536000_500_000
    assert parse_expr(format_expr(e2)) == e2
    # composes with aggregation and arithmetic
    a = parse_expr("sum by (l) (m @ 5)")
    assert isinstance(a, AggExpr) and isinstance(a.expr, At)
    b = parse_expr("m @ 5 - m @ 3")
    assert isinstance(b, BinOp) and isinstance(b.right, At)


@pytest.fixture(scope="module")
def tiny_registry(tiny_samples, tiny_series):
    return {"m2": (tiny_samples, None, tiny_series)}


def test_metric_registry(tiny_samples, tiny_registry):
    out = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "last_over_time(m2[1d])", metrics=tiny_registry
        ).collect()
    }
    day1 = 19723
    assert out[(1, day1)] == 9.0
    # unknown names error loudly, listing the registry
    with pytest.raises(ExprParseError, match="m2"):
        evaluate("rate(nope[1d])", metrics=tiny_registry)
    # positional samples registers the default events_total alongside
    both = evaluate(
        "increase(events_total[1d]) - increase(m2[1d])",
        tiny_samples,
        metrics=tiny_registry,
    ).collect()
    assert all(r["value"] == 0.0 for r in both) and both


def test_eval_at_instant(tiny_samples):
    # 2024-01-02 00:00:00 UTC, 1d staleness lookback
    t = 1704153600
    out = {
        r["tsid"]: (r["bucket"], r["value"])
        for r in evaluate(
            f"events_total @ {t}", tiny_samples, lookback_ms=86_400_000
        ).collect()
    }
    assert out[1] == (t * 1_000_000, 10.0)  # ts == eval is inclusive
    assert out[2] == (t * 1_000_000, 7.0)  # 01-01 12:00 inside lookback
    # a 6h lookback excludes tsid 2's noon sample
    short = {
        r["tsid"]
        for r in evaluate(
            f"events_total @ {t}", tiny_samples, lookback_ms=6 * 3600_000
        ).collect()
    }
    assert short == {1}
    # instant vectors aggregate like any bucketed vector
    agg = evaluate(
        f"count(events_total @ {t})", tiny_samples, lookback_ms=86_400_000
    ).collect()
    assert [(r["bucket"], r["value"]) for r in agg] == [(t * 1_000_000, 2.0)]


def test_eval_irate_idelta(tiny_samples):
    day1 = 19723
    ir = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("irate(events_total[1d])", tiny_samples).collect()
    }
    assert ir[(1, day1)] == pytest.approx((9.0 - 3.0) / 3600)
    assert ir[(1, day1 + 1)] == pytest.approx(1.0 / (6 * 3600))
    assert ir[(2, day1)] == 0.0
    idl = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("idelta(events_total[1d])", tiny_samples).collect()
    }
    assert idl[(1, day1)] == 6.0 and idl[(1, day1 + 1)] == 1.0


def test_eval_stddev_mad(tiny_samples):
    day1 = 19723
    sd = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("stddev_over_time(events_total[1d])", tiny_samples).collect()
    }
    assert sd[(1, day1)] == pytest.approx(10.6875**0.5)
    assert sd[(2, day1)] == 0.0
    sv = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("stdvar_over_time(events_total[1d])", tiny_samples).collect()
    }
    assert sv[(1, day1)] == pytest.approx(10.6875)
    mad = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("mad_over_time(events_total[1d])", tiny_samples).collect()
    }
    # sorted 0,3,5,9 → med=3 (rank 2); devs sorted 0,2,3,6 → mad=2
    assert mad[(1, day1)] == 2.0 and mad[(2, day1)] == 0.0


def test_eval_deriv_predict(tiny_samples):
    import numpy as np

    day1 = 19723
    dv = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("deriv(events_total[1d])", tiny_samples).collect()
    }
    x = np.array([0.0, 3600, 7200, 10800])
    slope_ref = np.polyfit(x, [0.0, 5.0, 3.0, 9.0], 1)[0]
    assert dv[(1, day1)] == pytest.approx(slope_ref, rel=1e-9)
    assert dv[(2, day1)] == 0.0
    pl = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "predict_linear(events_total[1d], 3600)", tiny_samples
        ).collect()
    }
    icept_ref = np.polyfit(x, [0.0, 5.0, 3.0, 9.0], 1)[1]
    assert pl[(1, day1)] == pytest.approx(
        icept_ref + slope_ref * (10800 + 3600), rel=1e-9
    )
    # single-sample groups drop (zero variance), like PromQL
    one = tiny_samples.sparkSession.createDataFrame(
        [(9, "2024-01-01 00:00:00", 4.0)], "tsid bigint, ts string, value double"
    ).selectExpr("tsid", "CAST(ts AS TIMESTAMP) AS ts", "value")
    assert evaluate("deriv(events_total[1d])", one).count() == 0


def test_eval_holt_winters(tiny_samples):
    day1 = 19723
    hw = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "holt_winters(events_total[1d], 0.5, 0.25)", tiny_samples
        ).collect()
    }
    # fold [0,5,3,9]: s=0 → 5 → 6.5 → 9.8125 (hand-computed)
    assert hw[(1, day1)] == pytest.approx(9.8125)
    with pytest.raises(ExprParseError):
        evaluate("holt_winters(events_total[1d], 0, 0.25)", tiny_samples)


def test_eval_vec_math_and_clamp(tiny_samples):
    day1 = 19723
    cl = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "clamp(last_over_time(events_total[1d]), 2, 8)", tiny_samples
        ).collect()
    }
    assert cl[(1, day1)] == 8.0 and cl[(2, day1)] == 7.0
    lo = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "clamp_min(delta(events_total[1d]), 0.5)", tiny_samples
        ).collect()
    }
    assert lo[(2, day1)] == 0.5  # delta 0 clamped up
    sq = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "sqrt(abs(delta(events_total[1d])))", tiny_samples
        ).collect()
    }
    assert sq[(1, day1)] == 3.0  # sqrt(|9|)
    fl = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "floor(avg_over_time(events_total[1d]))", tiny_samples
        ).collect()
    }
    assert fl[(1, day1)] == 4.0  # avg 4.25
    ce = evaluate("ceil(avg_over_time(events_total[1d]))", tiny_samples).collect()
    assert {(r["tsid"], r["bucket"]): r["value"] for r in ce}[(1, day1)] == 5.0
    sg = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "sgn(delta(events_total[1d]) - 1)", tiny_samples
        ).collect()
    }
    assert sg[(1, day1)] == 1.0 and sg[(2, day1)] == -1.0
    with pytest.raises(ExprParseError):
        evaluate("clamp(last_over_time(events_total[1d]), 2)", tiny_samples)


def test_eval_label_fns_compose_with_agg(tiny_samples, spark):
    # series frame with a labels map (the model's shape)
    series = spark.createDataFrame(
        [(1, {"event_type": "click"}), (2, {"event_type": "view"})],
        "tsid bigint, labels map<string,string>",
    )
    day1 = 19723
    out = {
        (r["svc"], r["bucket"]): r["value"]
        for r in evaluate(
            'count by (svc) (label_replace(increase(events_total[1d]), '
            '"svc", "web_$1", "event_type", "(c.*)"))',
            tiny_samples,
            series=series,
        ).collect()
    }
    assert out[("web_click", day1)] == 1.0 and out[("", day1)] == 1.0
    j = {
        (r["k"], r["bucket"]): r["value"]
        for r in evaluate(
            'count by (k) (label_join(increase(events_total[1d]), '
            '"k", "-", "event_type", "event_type"))',
            tiny_samples,
            series=series,
        ).collect()
    }
    assert ("click-click", day1) in j
    with pytest.raises(NotImplementedError):
        evaluate(
            'label_replace(increase(events_total[1d]), "a", "b", "c", 5)',
            tiny_samples,
            series=series,
        )
    with pytest.raises(ValueError):  # no series frame carried
        evaluate(
            'label_replace(increase(events_total[1d]), "a", "b", "c", "d")',
            tiny_samples,
        )


def test_eval_absent_and_count_values(tiny_samples):
    # present metric, no matchers → empty
    assert evaluate("absent(events_total)", tiny_samples).count() == 0
    # unregistered name IS absent (PromQL semantics)
    got = evaluate("absent(nosuch)", tiny_samples).collect()
    assert [(r["name"], r["value"]) for r in got] == [("nosuch", 1.0)]
    cv = {
        r["vbucket"]: r["value"]
        for r in evaluate(
            "count_values(last_over_time(events_total[1d]))", tiny_samples
        ).collect()
    }
    assert cv == {9: 1.0, 11: 1.0, 7: 1.0}


def test_eval_histogram_quantile_grammar(tiny_samples, spark):
    day1 = 19723
    hq = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "histogram_quantile(0.9, events_total[1d])", tiny_samples
        ).collect()
    }
    # all fixture values < 100 → one implicit bucket, target=n → 100.0
    assert hq[(1, day1)] == 100.0
    # two-bucket case: values 50 and 150 → p50 hits bucket 0 at rank 1
    two = spark.createDataFrame(
        [(3, "2024-01-01 00:00:00", 50.0), (3, "2024-01-01 01:00:00", 150.0)],
        "tsid bigint, ts string, value double",
    ).selectExpr("tsid", "CAST(ts AS TIMESTAMP) AS ts", "value")
    v = evaluate("histogram_quantile(0.5, events_total[1d])", two).collect()
    assert v[0]["value"] == 100.0  # bucket 0 full → interpolates to its top


# --- r13 second wave: comparisons, set ops, without, agg operators ---------


def test_parse_second_wave_precedence():
    # cmp binds looser than arithmetic; and/unless looser; or loosest
    e = parse_expr("rate(m[1d]) * 2 > 0.1 and f(m[1d]) or g(m[1d])")
    assert isinstance(e, BinOp) and e.op == "or"
    assert e.left.op == "and" and e.left.left.op == ">"
    assert e.left.left.left.op == "*"
    w = parse_expr("sum without (a, b) (rate(m[1d]))")
    assert isinstance(w, AggExpr) and w.without and w.by == ("a", "b")
    o = parse_expr("sum by (l) (f(m[1d])) / on(l) sum by (l) (g(m[1d]))")
    assert isinstance(o, BinOp) and o.op == "/" and o.on == ("l",)
    # a selector merely NAMED on is not the clause
    assert parse_expr("x / on_total").right == VectorSelector("on_total")
    assert parse_expr("x / on").right == VectorSelector("on")


def test_eval_cmp_filter(tiny_samples):
    day1 = 19723
    out = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("increase(events_total[1d]) > 1", tiny_samples).collect()
    }
    assert out == {(1, day1): 11.0}  # 11 and 1 and 0 → only > 1 survives
    # scalar on the left, value passes through unchanged
    lo = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate("5 >= increase(events_total[1d])", tiny_samples).collect()
    }
    assert lo == {(1, day1 + 1): 1.0, (2, day1): 0.0}
    # vector-vector: delta != increase flags reset days
    vv = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "increase(events_total[1d]) != delta(events_total[1d])", tiny_samples
        ).collect()
    }
    assert vv == {(1, day1): 11.0}  # keeps the LEFT value
    with pytest.raises(NotImplementedError):
        evaluate("1 > 2", tiny_samples)  # scalar-scalar needs bool


def test_eval_set_ops(tiny_samples):
    day1 = 19723
    a = {
        (r["tsid"], r["bucket"])
        for r in evaluate(
            "increase(events_total[1d]) and (resets(events_total[1d]) > 0)",
            tiny_samples,
        ).collect()
    }
    assert a == {(1, day1)}  # only the reset day
    u = {
        (r["tsid"], r["bucket"])
        for r in evaluate(
            "increase(events_total[1d]) unless (resets(events_total[1d]) > 0)",
            tiny_samples,
        ).collect()
    }
    assert u == {(1, day1 + 1), (2, day1)}
    # or dedups overlapping keys (preferring-left union)
    o = evaluate(
        "(increase(events_total[1d]) > 0) or (increase(events_total[1d]) >= 0)",
        tiny_samples,
    ).collect()
    assert len(o) == 3  # NOT 5: the two >0 rows appear once
    with pytest.raises(NotImplementedError):
        evaluate(
            "increase(events_total[1d]) and rate(events_total[2d])", tiny_samples
        )  # mismatched widths


def test_eval_without_grouping(tiny_samples, spark):
    series = spark.createDataFrame(
        [(1, "click", "u1"), (2, "view", "u2")],
        "tsid bigint, event_type string, user_bucket string",
    )
    day1 = 19723
    out = {
        (r["event_type"], r["bucket"]): r["value"]
        for r in evaluate(
            "sum without (user_bucket) (increase(events_total[1d]))",
            tiny_samples,
            series=series,
        ).collect()
    }
    assert out[("click", day1)] == 11.0 and out[("view", day1)] == 0.0
    # unknown names in without are ignored (PromQL); dropping everything
    # falls back to global (bucket-only) grouping
    g = evaluate(
        "count without (event_type, user_bucket, nope) "
        "(increase(events_total[1d]))",
        tiny_samples,
        series=series,
    ).collect()
    assert {r["bucket"]: r["value"] for r in g}[day1] == 2.0
    with pytest.raises(ValueError):
        evaluate(
            "sum without (x) (increase(events_total[1d]))", tiny_samples
        )  # no series frame


def test_eval_stddev_stdvar_agg(tiny_samples):
    day1 = 19723
    # day-1 increases: tsid1 → 11, tsid2 → 0; pop var = 30.25
    sv = {
        r["bucket"]: r["value"]
        for r in evaluate(
            "stdvar(increase(events_total[1d]))", tiny_samples
        ).collect()
    }
    assert sv[day1] == pytest.approx(30.25)
    sd = {
        r["bucket"]: r["value"]
        for r in evaluate(
            "stddev(increase(events_total[1d]))", tiny_samples
        ).collect()
    }
    assert sd[day1] == pytest.approx(5.5)


def test_eval_quantile_agg(tiny_samples):
    day1 = 19723
    q = {
        r["bucket"]: r["value"]
        for r in evaluate(
            "quantile(0.5, last_over_time(events_total[1d]))", tiny_samples
        ).collect()
    }
    # day-1 last values across series: 9, 7 → rank ceil(0.5·2)=1 → 7
    assert q[day1] == 7.0 and q[day1 + 1] == 11.0


def test_eval_on_matching(tiny_samples, tiny_series):
    day1 = 19723
    out = {
        (r["event_type"], r["bucket"]): r["value"]
        for r in evaluate(
            "sum by (event_type) (count_over_time(events_total[1d]))"
            " + on(event_type) "
            "sum by (event_type) (increase(events_total[1d]))",
            tiny_samples,
            series=tiny_series,
        ).collect()
    }
    assert out[("click", day1)] == 4.0 + 11.0
    assert out[("view", day1)] == 2.0 + 0.0
    with pytest.raises(ValueError, match="absent from"):
        evaluate(
            "sum by (event_type) (increase(events_total[1d]))"
            " / on(nope) "
            "sum by (event_type) (increase(events_total[1d]))",
            tiny_samples,
            series=tiny_series,
        )


def test_eval_bool_modifier(tiny_samples):
    day1 = 19723
    out = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "increase(events_total[1d]) > bool 1", tiny_samples
        ).collect()
    }
    # ALL elements kept, 0/1 values
    assert out == {(1, day1): 1.0, (1, day1 + 1): 0.0, (2, day1): 0.0}
    # scalar-scalar bool folds to a 0/1 scalar, composable in arithmetic
    sc = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "increase(events_total[1d]) + (3 > bool 2) * 100", tiny_samples
        ).collect()
    }
    assert sc[(1, day1)] == 111.0
    with pytest.raises(NotImplementedError):
        evaluate("3 > bool 2", tiny_samples)  # a bare scalar is not a frame


def test_eval_group_left(tiny_samples, tiny_series):
    day1 = 19723
    out = {
        (r["tsid"], r["bucket"]): r["value"]
        for r in evaluate(
            "count_over_time(events_total[1d]) * on(event_type) group_left "
            "sum by (event_type) (increase(events_total[1d]))",
            tiny_samples,
            series=tiny_series,
        ).collect()
    }
    # tsid1 day1: count 4 × group-sum 11; tsid2: 2 × 0
    assert out[(1, day1)] == 44.0 and out[(2, day1)] == 0.0
    # division drops zero-denominator groups
    shares = evaluate(
        "increase(events_total[1d]) / on(event_type) group_left "
        "sum by (event_type) (increase(events_total[1d]))",
        tiny_samples,
        series=tiny_series,
    ).collect()
    vals = {(r["tsid"], r["bucket"]): r["value"] for r in shares}
    assert vals[(1, day1)] == 1.0 and (2, day1) not in vals
    with pytest.raises(ValueError, match="absent from the series"):
        evaluate(
            "increase(events_total[1d]) / on(nope) group_left "
            "sum by (event_type) (increase(events_total[1d]))",
            tiny_samples,
            series=tiny_series,
        )
