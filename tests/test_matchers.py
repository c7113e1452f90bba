"""Property tests for the matcher algebra (SURVEY.md §5): the identities the
reference guarantees by construction of its bitmap algebra
(/root/reference/src/index/mem_index.cpp:136-232)."""

from __future__ import annotations

import datetime as dt

from tagtree_spark.tsdb.matchers import LabelMatcher, MatchOp, resolve_label_matchers

E = MatchOp.EQL
NE = MatchOp.NEQ
RE = MatchOp.EQL_REGEX
NRE = MatchOp.NEQ_REGEX


def tsids(postings, matchers, **kw):
    return {
        r.tsid for r in resolve_label_matchers(postings, matchers, **kw).collect()
    }


def test_eql_and_neq_same_value_is_empty(model):
    _, postings, _ = model
    out = tsids(
        postings,
        [LabelMatcher(E, "event_type", "click"), LabelMatcher(NE, "event_type", "click")],
    )
    assert out == set()


def test_anchored_regex_equals_eql(model):
    """EQL_REGEX('^v$') == EQL(v)."""
    _, postings, _ = model
    assert tsids(postings, [LabelMatcher(RE, "event_type", "^click$")]) == tsids(
        postings, [LabelMatcher(E, "event_type", "click")]
    )


def test_unanchored_regex_equals_eql(model):
    """promql full-anchor semantics: EQL_REGEX('v') == EQL(v) even without
    explicit anchors — 'click' must NOT substring-match 'clickstream'."""
    _, postings, _ = model
    assert tsids(postings, [LabelMatcher(RE, "event_type", "click")]) == tsids(
        postings, [LabelMatcher(E, "event_type", "click")]
    )


def test_substring_regex_does_not_match(model):
    """'lick' is a substring of 'click' but must match nothing."""
    _, postings, _ = model
    assert tsids(postings, [LabelMatcher(RE, "event_type", "lick")]) == set()


def test_regex_union_equals_eql_union(model):
    _, postings, _ = model
    union = tsids(postings, [LabelMatcher(RE, "event_type", "click|view")])
    parts = tsids(postings, [LabelMatcher(E, "event_type", "click")]) | tsids(
        postings, [LabelMatcher(E, "event_type", "view")]
    )
    assert union == parts


def test_ordering_partition(model):
    """LSS(v) ∪ GTE(v) = all series carrying the name; LSS ∩ GTE = ∅."""
    _, postings, _ = model
    lss = tsids(postings, [LabelMatcher(MatchOp.LSS, "event_type", "login")])
    gte = tsids(postings, [LabelMatcher(MatchOp.GTE, "event_type", "login")])
    allof = tsids(postings, [LabelMatcher(RE, "event_type", ".*")])
    assert lss | gte == allof
    assert lss & gte == set()


def test_lte_is_lss_union_eql(model):
    _, postings, _ = model
    lte = tsids(postings, [LabelMatcher(MatchOp.LTE, "event_type", "login")])
    lss = tsids(postings, [LabelMatcher(MatchOp.LSS, "event_type", "login")])
    eql = tsids(postings, [LabelMatcher(E, "event_type", "login")])
    assert lte == lss | eql


def test_conjunction_is_monotone_decreasing(model):
    """Adding a matcher can only shrink the result (bitmap AND)."""
    _, postings, _ = model
    base = tsids(postings, [LabelMatcher(E, "user_bucket", "u1")])
    narrowed = tsids(
        postings,
        [LabelMatcher(E, "user_bucket", "u1"), LabelMatcher(E, "event_type", "click")],
    )
    assert narrowed <= base


def test_neq_exclude_semantics(model):
    """pos + NEQ == pos - EQL(same) (deferred exclude-set,
    /root/reference/src/index/mem_index.cpp:149-171)."""
    _, postings, _ = model
    pos = tsids(postings, [LabelMatcher(E, "event_type", "click")])
    eql_u1 = tsids(postings, [LabelMatcher(E, "user_bucket", "u1")])
    mixed = tsids(
        postings,
        [LabelMatcher(E, "event_type", "click"), LabelMatcher(NE, "user_bucket", "u1")],
    )
    assert mixed == pos - eql_u1


def test_all_negative_form_requires_name(model):
    """All-NEQ: candidates are series carrying the name with a non-matching
    value (/root/reference/src/index/mem_index.cpp:199-220)."""
    _, postings, _ = model
    out = tsids(postings, [LabelMatcher(NE, "event_type", "click")])
    carriers = tsids(postings, [LabelMatcher(RE, "event_type", ".*")])
    clicks = tsids(postings, [LabelMatcher(E, "event_type", "click")])
    assert out == carriers - clicks


def test_neq_regex_on_series_lacking_the_label(spark):
    """Pins the documented deviation (SURVEY.md §7.4.2, ADVICE r1): the
    reference's mem path treats only NEQ as negative — NEQ_REGEX there is a
    positive intersect requiring the name to EXIST with a non-matching
    value. We standardize BOTH NEQ and NEQ_REGEX to Prometheus semantics:
    with a positive matcher present, a series LACKING the name survives a
    negative matcher on it."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    rows = [
        # tsid 1 carries env; tsid 2 does NOT carry env
        ("event_type", "click", 1, t, t),
        ("env", "prod", 1, t, t),
        ("event_type", "click", 2, t, t),
    ]
    postings = spark.createDataFrame(
        rows, ["name", "value", "tsid", "first_seen", "last_seen"]
    )
    out = tsids(
        postings,
        [LabelMatcher(E, "event_type", "click"), LabelMatcher(NRE, "env", "prod")],
    )
    # Prometheus semantics: tsid 2 (no env label) survives; tsid 1 excluded.
    assert out == {2}
    # same shape with NEQ — identical by our standardization
    out2 = tsids(
        postings,
        [LabelMatcher(E, "event_type", "click"), LabelMatcher(NE, "env", "prod")],
    )
    assert out2 == {2}


def test_time_pruning_boundary(model):
    """Interval-overlap boundary: a series qualifies iff
    last_seen >= start AND first_seen < end
    (/root/reference/src/index/index_tree.cpp:213-216,263-267)."""
    series, postings, _ = model
    row = series.orderBy("tsid").limit(1).collect()[0]
    m = [LabelMatcher(E, "event_type", row.event_type)]
    # start exactly at last_seen → still matches (>=)
    assert row.tsid in tsids(postings, m, start=row.last_seen)
    # end exactly at first_seen → excluded (strict <)
    assert row.tsid not in tsids(postings, m, end=row.first_seen)
    # end just above first_seen → matches
    assert row.tsid in tsids(
        postings, m, end=row.first_seen + dt.timedelta(microseconds=1)
    )


def test_regex_dialect_guard():
    """Patterns outside the RE2∩Java subset are rejected at construction
    (SURVEY.md §7.4.3) — silently divergent semantics must not reach the
    engine."""
    import pytest

    from tagtree_spark.tsdb.matchers import LabelMatcher, MatchOp

    # common-subset patterns construct fine
    LabelMatcher(MatchOp.EQL_REGEX, "l", "^(click|view)$")
    LabelMatcher(MatchOp.NEQ_REGEX, "l", "p.*[0-9]+")
    LabelMatcher(MatchOp.EQL_REGEX, "l", r"a\++")  # escaped plus, one-or-more

    for bad in [
        "(?=foo)bar",      # lookahead (Java-only)
        "(?<=a)b",         # lookbehind (Java-only)
        r"(a)\1",          # backreference (Java-only)
        "a*+b",            # possessive quantifier (Java-only)
        "(?>atomic)",      # atomic group
        "(?P<n>x)",        # named group (syntax diverges)
        "(?<n>x)",         # named group, Java syntax
        "(unclosed",       # plain syntax error
    ]:
        with pytest.raises(ValueError):
            LabelMatcher(MatchOp.EQL_REGEX, "l", bad)

    # non-regex ops are not validated (value is a literal, not a pattern)
    LabelMatcher(MatchOp.EQL, "l", "(?=not-a-regex)")


def test_label_replace_updates_map_and_flat_col(spark):
    from tagtree_spark.tsdb.promql import label_replace

    series = spark.createDataFrame(
        [(1, {"event_type": "click"}), (2, {"event_type": "error"})],
        "tsid long, labels map<string,string>",
    )
    out = {r.tsid: (r.labels, r.service) for r in
           label_replace(series, "service", "web_$1", "event_type", "(c.*)").collect()}
    assert out[1] == ({"event_type": "click", "service": "web_click"}, "web_click")
    # non-match: labels untouched, flat col is the PromQL absent-label ""
    assert out[2] == ({"event_type": "error"}, "")


def test_label_replace_overwrites_existing_dst(spark):
    from tagtree_spark.tsdb.promql import label_replace

    series = spark.createDataFrame(
        [(1, {"event_type": "click", "service": "old"})],
        "tsid long, labels map<string,string>",
    )
    r = label_replace(series, "service", "new", "event_type", "click").collect()[0]
    assert r.labels["service"] == "new" and r.service == "new"


def test_label_replace_rejects_java_only_regex(spark):
    import pytest

    from tagtree_spark.tsdb.promql import label_replace

    series = spark.createDataFrame([(1, {"a": "b"})], "tsid long, labels map<string,string>")
    with pytest.raises(ValueError):
        label_replace(series, "d", "x", "a", "(?=lookahead)")


def test_histogram_quantile_interpolation(spark):
    from tagtree_spark.tsdb.promql import histogram_quantile

    series = spark.createDataFrame([(1, "a"), (2, "a")], "tsid long, event_type string")
    # 10 samples in bucket 0 ([0,100)), 10 in bucket 1 → p90 target rank 18
    # falls in bucket 1 at fraction (18-10)/10 → 100 + 0.8*100 = 180.0
    import datetime as dt

    T = dt.datetime(2024, 1, 1)
    rows = [(1, T, float(v)) for v in range(0, 100, 10)]
    rows += [(2, T, float(v)) for v in range(100, 200, 10)]
    samples = spark.createDataFrame(rows, "tsid long, ts timestamp, value double")
    r = histogram_quantile(series, samples, "event_type", q_pct=90).collect()[0]
    assert (r.n_total, r.q_bucket, r.q_value) == (20, 1, 180.0)


def test_stddev_over_time_exact(spark):
    import datetime as dt

    from tagtree_spark.tsdb.promql import stddev_over_time

    T = dt.datetime(2024, 1, 1)
    samples = spark.createDataFrame(
        [(1, T, 2.0), (1, T, 4.0), (1, T, 4.0), (1, T, 4.0), (1, T, 5.0),
         (1, T, 5.0), (1, T, 7.0), (1, T, 9.0)],
        "tsid long, ts timestamp, value double",
    )
    r = stddev_over_time(samples).collect()[0]
    assert (r.n, r.v_sum, r.stddev_pop) == (8, 40.0, 2.0)


def test_counter_stats_increase_and_resets(spark):
    import datetime as dt

    from tagtree_spark.tsdb.promql import counter_stats

    T = dt.datetime
    # series 1: 10 → 13 → 4 (reset) → 9: increase = 3 + 5 = 8, resets = 1
    samples = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0), 10.0),
            (1, T(2024, 1, 1, 1), 13.0),
            (1, T(2024, 1, 1, 2), 4.0),
            (1, T(2024, 1, 1, 3), 9.0),
        ],
        "tsid long, ts timestamp, value double",
    )
    r = counter_stats(samples).collect()[0]
    assert (r.n_samples, r.increase, r.n_resets) == (4, 8.0, 1)


def test_deriv_exact_slope(spark):
    import datetime as dt

    from tagtree_spark.tsdb.promql import deriv

    T = dt.datetime
    # series 1: y = 2x + 1 over x = 0, 60, 120 s → slope exactly 2/60
    samples = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0, 0, 0), 1.0),
            (1, T(2024, 1, 1, 0, 1, 0), 3.0),
            (1, T(2024, 1, 1, 0, 2, 0), 5.0),
            (2, T(2024, 1, 1), 7.0),  # single sample → NULL slope
        ],
        "tsid long, ts timestamp, value double",
    )
    out = {r.tsid: r for r in deriv(samples).collect()}
    assert out[1].slope_per_sec == 2.0 / 60.0
    assert out[1].dt_span_s == 120
    assert out[2].slope_per_sec is None


def test_changes_over_time_counts_flaps(spark):
    import datetime as dt

    from tagtree_spark.tsdb.promql import changes_over_time

    T = dt.datetime
    # series 1: 1 → 1 → 2 → 2 → 1 : changes at samples 3 and 5 → 2
    # series 2: constant → 0 changes
    samples = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 0), 1.0),
            (1, T(2024, 1, 1, 1), 1.0),
            (1, T(2024, 1, 1, 2), 2.0),
            (1, T(2024, 1, 1, 3), 2.0),
            (1, T(2024, 1, 1, 4), 1.0),
            (2, T(2024, 1, 1, 0), 5.0),
            (2, T(2024, 1, 1, 1), 5.0),
        ],
        "tsid long, ts timestamp, value double",
    )
    out = {r.tsid: r for r in changes_over_time(samples).collect()}
    assert (out[1].n_samples, out[1].n_changes) == (5, 2)
    assert (out[2].n_samples, out[2].n_changes) == (2, 0)
    # lookback bound drops the first two samples of series 1: 2→2→1 → 1
    bounded = changes_over_time(
        samples, eval_ts=T(2024, 1, 1, 4), lookback=dt.timedelta(hours=3)
    )
    out = {r.tsid: r for r in bounded.collect()}
    assert (out[1].n_samples, out[1].n_changes) == (3, 1)


def test_mad_over_time_discrete_picks(spark):
    import datetime as dt

    from tagtree_spark.tsdb.promql import mad_over_time

    T = dt.datetime
    # series 1 values {1, 3, 7, 20, 21}: n=5, k = floor(0.5*4)+1 = 3 →
    # med = 7; deviations {6, 4, 0, 13, 14} sorted {0,4,6,13,14} → mad = 6
    rows = [(1, T(2024, 1, 1, i), v) for i, v in enumerate([20.0, 3.0, 7.0, 1.0, 21.0])]
    samples = spark.createDataFrame(rows, "tsid long, ts timestamp, value double")
    r = mad_over_time(samples).collect()[0]
    assert (r.n_samples, r.med, r.mad) == (5, 7.0, 6.0)
