"""Hierarchical time rollups — the hypertable "continuous aggregate"
pattern: aggregate samples once at a fine resolution, then answer every
coarser resolution FROM the fine rollup instead of rescanning raw samples.

The reference stores raw samples only (its index serves series selection;
downsampling lives downstream in Prometheus). At 100 TB the rollup ladder
is the difference between a dashboard query scanning 100 TB of raw points
and scanning a few GB of 5-minute aggregates — this is the Spark-native
form of that ladder.

Cross-engine discipline: every aggregate kept in the ladder is
re-aggregatable (count/sum/min/max — sum as DECIMAL so coarsening is
order-independent); avg is derived at the end as one sum/count division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_samples(samples: DataFrame, minutes: int) -> DataFrame:
    """Fine-grained rollup: ``(tsid, bucket_start, n, v_sum DECIMAL,
    v_min, v_max)`` with ``bucket_start`` = epoch-seconds floor of the
    bucket. One groupBy with map-side partial aggregation; at scale the
    output is partitioned by time bucket (natural partition pruning for
    range queries)."""
    secs = int(minutes) * 60
    bucket = (F.unix_timestamp("ts") - F.unix_timestamp("ts") % secs).cast("bigint")
    return (
        samples.select("tsid", bucket.alias("bucket_start"), "value")
        .groupBy("tsid", "bucket_start")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("v_sum"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
    )


def coarsen_rollup(fine: DataFrame, fine_minutes: int, coarse_minutes: int) -> DataFrame:
    """Re-aggregate a fine rollup to a coarser resolution WITHOUT touching
    raw samples — count/sum/min/max compose exactly (sum is DECIMAL, so
    the regrouping is order-independent and bit-identical to aggregating
    the raw points directly)."""
    if coarse_minutes % fine_minutes != 0:
        raise ValueError("coarse resolution must be a multiple of the fine one")
    secs = int(coarse_minutes) * 60
    bucket = (F.col("bucket_start") - F.col("bucket_start") % secs).cast("bigint")
    return (
        fine.select(
            "tsid", bucket.alias("bucket_start"), "n", "v_sum", "v_min", "v_max"
        )
        .groupBy("tsid", "bucket_start")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("v_sum").alias("v_sum"),
            F.min("v_min").alias("v_min"),
            F.max("v_max").alias("v_max"),
        )
    )


def interpolate_grid(samples: DataFrame, step: str = "1 hour") -> DataFrame:
    """Gap-fill + linear interpolation onto a regular time grid — the
    hypertable ``time_bucket_gapfill(...) + interpolate()`` shape
    (TimescaleDB/InfluxDB), absent from both Prometheus (which only
    carries values forward) and the reference (index-only). Joins of
    irregular series onto a common grid are how downstream models consume
    a TSDB at scale.

    Grid: hourly instants from ``date_trunc(step0, min(ts))`` to
    ``max(ts)`` per series; each grid instant gets the linear
    interpolation of the nearest enclosing samples, computed with ONE
    union + two frame windows (no grid×samples join): grid rows and
    sample rows interleave ordered by (ts, is_grid), ``last(ignorenulls)``
    carries the previous sample's (value, ts) forward, ``first(
    ignorenulls)`` pulls the next sample's back. Partitioned by tsid —
    series count is the parallelism, state is one row.

    Exactness: epoch MICROSECOND integers for all time math; the
    interpolated value is ``pv + (nv − pv) · ((g−pe)/(ne−pe))`` — exact
    int→double conversions and three IEEE ops, bit-identical cross-engine;
    a grid instant exactly on a sample returns that sample's value via the
    ``pe = g`` guard (no 0/0). Grid instants before the first or after the
    last sample are dropped (no extrapolation).

    → ``(tsid, bucket_s BIGINT epoch-seconds, v_interp DOUBLE)``.
    """
    from pyspark.sql import Window

    b = samples.groupBy("tsid").agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    grid = b.select(
        "tsid",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "mn"), F.col("mx"), F.expr(f"INTERVAL {step}")
            )
        ).alias("gts"),
    )
    g = grid.select(
        "tsid",
        F.unix_micros("gts").alias("us"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    sm = samples.select(
        "tsid", F.unix_micros("ts").alias("us"), "value", F.lit(0).alias("is_grid")
    )
    u = sm.unionByName(g)
    # Both lookups are GROWING frames (unbounded preceding .. current):
    # "next sample" runs over the REVERSED sort order instead of a
    # current-row..unbounded-following frame — Spark evaluates shrinking
    # frames by re-scanning the frame per row (O(n²) per series), while
    # growing frames are incremental O(n). Tie order reverses with the
    # sort, so the frame membership (and thus the picked sample) is
    # exactly the asc first-over-following row.
    wp = (
        Window.partitionBy("tsid")
        .orderBy(F.col("us"), F.col("is_grid"), F.col("value"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("tsid")
        .orderBy(F.col("us").desc(), F.col("is_grid").desc(), F.col("value").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sample_us = F.when(F.col("is_grid") == 0, F.col("us"))
    d = (
        u.withColumn("pv", F.last("value", ignorenulls=True).over(wp))
        .withColumn("pe", F.last(sample_us, ignorenulls=True).over(wp))
        .withColumn("nv", F.last("value", ignorenulls=True).over(wn))
        .withColumn("ne", F.last(sample_us, ignorenulls=True).over(wn))
    )
    ge = F.col("us")
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (ge - F.col("pe")).cast("double") / (F.col("ne") - F.col("pe")).cast("double")
    )
    return (
        d.where(F.col("is_grid") == 1)
        .where(
            F.col("pe").isNotNull()
            & ((F.col("pe") == ge) | F.col("ne").isNotNull())
        )
        .select(
            "tsid",
            F.expr("us div 1000000").cast("bigint").alias("bucket_s"),
            F.when(F.col("pe") == ge, F.col("pv")).otherwise(interp).alias("v_interp"),
        )
    )


def lagged_xcorr(
    a_samples: DataFrame,
    b_samples: DataFrame,
    lags: tuple = (-2, -1, 0, 1, 2),
) -> DataFrame:
    """Cross-series analytics: Pearson correlation between two sample
    streams' HOURLY rollups at several hour lags → ``(lag, n, r)`` —
    the "does metric A lead metric B?" question PromQL cannot ask (its
    binary ops only align at lag 0). Each input is any ``(ts, value)``
    frame — a single series, or every series of a matcher resolved
    through the index and summed.

    Exactness: hourly values are 10⁴-scaled integer sums
    (DECIMAL(38,0) ≡ DuckDB HUGEINT); all six correlation sums (n, Σa,
    Σb, Σab, Σa², Σb²) stay exact integers, and r is ONE final IEEE
    chain over their correctly-rounded double casts — deterministic
    cross-engine. Lags with zero variance in the overlap are dropped
    BEFORE the division (exact integer predicate). Shape: one hourly
    agg per side, a |lags|-way explode of side A's (tiny) hour list,
    one equi-join per lagged hour key."""

    def hourly(df, out):
        return (
            df.select(
                F.expr("unix_micros(ts) div 3600000000").alias("hour"),
                (F.col("value").cast("decimal(18,4)") * 10000)
                .cast("decimal(38,0)")
                .alias("vi"),
            )
            .groupBy("hour")
            .agg(F.sum("vi").cast("decimal(38,0)").alias(out))
        )

    a = hourly(a_samples, "va").select(F.col("hour").alias("ha"), "va")
    b = hourly(b_samples, "vb").select(F.col("hour").alias("hb"), "vb")
    al = a.select(
        "ha", "va", F.explode(F.array(*[F.lit(int(L)) for L in lags])).alias("lag")
    )
    j = al.join(b, al.ha + al.lag == b.hb)
    sums = j.groupBy("lag").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("va").cast("decimal(38,0)").alias("sa"),
        F.sum("vb").cast("decimal(38,0)").alias("sb"),
        F.sum(F.col("va") * F.col("vb")).cast("decimal(38,0)").alias("sab"),
        F.sum(F.col("va") * F.col("va")).cast("decimal(38,0)").alias("saa"),
        F.sum(F.col("vb") * F.col("vb")).cast("decimal(38,0)").alias("sbb"),
    )
    v1 = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    v2 = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    return (
        sums.where((v1 > 0) & (v2 > 0))
        .select(
            F.col("lag").cast("bigint").alias("lag"),
            F.col("n").cast("bigint").alias("n"),
            (num / (F.sqrt(v1.cast("double")) * F.sqrt(v2.cast("double")))).alias("r"),
        )
    )


def routed_rollup_read(
    samples: DataFrame,
    boundary_s: int,
    fine_minutes: int = 60,
    coarse_minutes: int = 360,
) -> DataFrame:
    """The continuous-aggregate READ path: answer a full-history rollup
    query from TWO resolutions — fine buckets for time ≥ ``boundary_s``
    (recent data), coarse buckets for older time — the TimescaleDB
    real-time-aggregate routing rule, → ``(tsid, bucket_start,
    resolution_min, n, v_sum, v_min, v_max)``.

    ``boundary_s`` must sit on a coarse bucket edge (validated) so the
    two regions tile without overlap. Here both resolutions derive from
    the samples; in production they are the PRE-materialized ladder
    (q63 / streaming RollupSink segments) and this union reads two
    pruned partition ranges instead of any raw data. Decimal sums keep
    the coarse side bit-identical to aggregating raw points."""
    if boundary_s % (coarse_minutes * 60) != 0:
        raise ValueError("boundary must align with a coarse bucket edge")
    fine = rollup_samples(samples, fine_minutes)
    recent = fine.where(F.col("bucket_start") >= boundary_s).select(
        "tsid", "bucket_start",
        F.lit(fine_minutes).cast("bigint").alias("resolution_min"),
        "n", "v_sum", "v_min", "v_max",
    )
    old = (
        coarsen_rollup(fine, fine_minutes, coarse_minutes)
        .where(F.col("bucket_start") < boundary_s)
        .select(
            "tsid", "bucket_start",
            F.lit(coarse_minutes).cast("bigint").alias("resolution_min"),
            "n", "v_sum", "v_min", "v_max",
        )
    )
    return old.unionByName(recent)
