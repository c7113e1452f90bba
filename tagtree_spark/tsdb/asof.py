"""As-of (instant-vector) evaluation over the samples table.

The reference's users evaluate PromQL instant vectors downstream of the
index: "the value of each series AS OF time t" = the latest sample at or
before t, within a staleness lookback (prometheus uses 5m). The reference
itself only serves the select() scan (/root/reference/src/adapters/prom/
querier.cpp:13-21); this operator is the Spark-native in-engine evaluation
— a point-in-time join, the same primitive a feature-store backfill needs
("feature values as of each training timestamp").

Plan shape (the 100 TB path): the eval-time grid is tiny and broadcast;
samples join it with a range predicate (one narrow pass — the lookback
bound keeps the fan-out per sample ≤ |grid window overlaps|), then ONE
shuffle groups (tsid, eval_ts) for the argmax. No window-over-everything,
no per-eval-time rescan of the samples table.

Determinism: the winner is (max ts, then max value) — both engines break
the same-timestamp tie identically, and the value passes through
untouched (no summation), so parity is bit-exact.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_agg(
    samples: DataFrame,
    eval_times: list[_dt.datetime],
    lookback: _dt.timedelta,
) -> DataFrame:
    """Range-vector aggregation — the ``<agg>_over_time`` PromQL family:
    per series and eval time, aggregate every sample in
    ``(eval_ts - lookback, eval_ts]`` → ``(tsid, eval_us, n_samples,
    v_min, v_max, v_avg)``.

    Same plan as :func:`asof_instant` minus the argmax join-back: broadcast
    grid, lookback-bounded range join, ONE (tsid, eval_ts) shuffle. Cross-
    engine determinism: min/max are order-independent; the avg is a
    DECIMAL(18,4) sum (exact, order-independent) with one final IEEE
    division (CLAUDE.md rules 1-2).
    """
    spark = samples.sparkSession
    grid = spark.createDataFrame([(t,) for t in eval_times], "eval_ts timestamp")
    cand = samples.join(
        F.broadcast(grid),
        (F.col("ts") <= F.col("eval_ts"))
        & (F.col("ts") > F.col("eval_ts") - F.lit(lookback)),
    )
    dec = F.col("value").cast("decimal(18,4)")
    return (
        cand.groupBy("tsid", "eval_ts")
        .agg(
            F.count("*").cast("bigint").alias("n_samples"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.sum(dec).alias("_vsum"),
        )
        .select(
            F.col("tsid").cast("bigint").alias("tsid"),
            F.unix_micros("eval_ts").cast("bigint").alias("eval_us"),
            "n_samples",
            "v_min",
            "v_max",
            (F.col("_vsum").cast("double") / F.col("n_samples")).alias("v_avg"),
        )
    )


def asof_instant(
    samples: DataFrame,
    eval_times: list[_dt.datetime],
    lookback: _dt.timedelta,
) -> DataFrame:
    """→ (tsid, eval_us, last_ts_us, value): per series and eval time, the
    latest sample in (eval_ts - lookback, eval_ts]."""
    spark = samples.sparkSession
    grid = spark.createDataFrame([(t,) for t in eval_times], "eval_ts timestamp")
    cand = samples.join(
        F.broadcast(grid),
        (F.col("ts") <= F.col("eval_ts"))
        & (F.col("ts") > F.col("eval_ts") - F.lit(lookback)),
    )
    # Single-pass argmax: max over struct(ts, value) orders by ts first,
    # value second — the same deterministic (latest ts, then max value)
    # winner as a two-pass join-back, in ONE shuffle and one evaluation of
    # the range join instead of two.
    winner = cand.groupBy("tsid", "eval_ts").agg(
        F.max(F.struct(F.col("ts"), F.col("value"))).alias("m")
    )
    return winner.select(
        F.col("tsid").cast("bigint").alias("tsid"),
        F.unix_micros("eval_ts").cast("bigint").alias("eval_us"),
        F.unix_micros(F.col("m.ts")).cast("bigint").alias("last_ts_us"),
        F.col("m.value").alias("value"),
    )


def instant_offset(
    samples: DataFrame,
    eval_times: list[_dt.datetime],
    lookback: _dt.timedelta,
    offset: _dt.timedelta,
) -> DataFrame:
    """PromQL ``offset`` modifier: the instant vector evaluated at
    ``t - offset`` but REPORTED at ``t`` (``metric offset 1d`` — yesterday's
    value on today's timeline, the shape of day-over-day comparisons).
    Same broadcast-grid plan as :func:`asof_instant` over the shifted
    grid; only the reported eval timestamp moves back."""
    shifted = asof_instant(samples, [t - offset for t in eval_times], lookback)
    off_us = int(offset.total_seconds() * 1_000_000)
    return shifted.select(
        "tsid",
        (F.col("eval_us") + F.lit(off_us)).cast("bigint").alias("eval_us"),
        "last_ts_us",
        "value",
    )
