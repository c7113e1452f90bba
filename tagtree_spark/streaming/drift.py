"""Streaming distribution-drift monitor — continuous EXACT two-sample
statistics over a micro-batch stream.

Each batch contributes its per-``(key, grp, value)`` COUNT partial as a
tiny segment; the live distribution is a merge-on-read SUM over segments.
Counts are the mergeable sufficient statistic of every cdf-shaped test,
so the accumulated state reproduces the batch-computed statistic
BIT-FOR-BIT regardless of micro-batch boundaries: q299 reads this store
and answers q295's Kolmogorov-Smirnov oracle exactly (the stream≡batch
proof pattern of the postings/clusters/CEP sinks). Mann-Whitney's
doubled-U (q294) is computable from the same state — both tests only
need the per-value group counts.

State is O(distinct (key, grp, value)) regardless of stream volume — at
100 TB the value summary IS the compressed form the batch plans already
aggregate to first (see q294/q295's scale-shape notes). The per-batch
write is O(|batch distinct|); replay is idempotent by segment naming;
compaction re-aggregates losslessly (sums compose) with the same
crash-safe base-then-delete order as the sibling sinks.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment


class DistributionSink:
    """foreachBatch sink maintaining per-(key, grp, value) count segments."""

    def __init__(
        self,
        store_path: str,
        key_col: str = "event_type",
        grp_col: str = "grp",
        val_col: str = "value",
        compact_every: int | None = 8,
    ):
        self.store_path = store_path
        self.key_col = key_col
        self.grp_col = grp_col
        self.val_col = val_col
        self.compact_every = compact_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_distribution(spark, self.store_path, batch_id)
        part = batch_df.groupBy(
            F.col(self.key_col).alias("key"),
            F.col(self.grp_col).alias("grp"),
            F.col(self.val_col).alias("value"),
        ).agg(F.count("*").cast("bigint").alias("n"))
        # non-partitioned write: a zero-row batch still emits a schema-only
        # part file, so later reads never hit UNABLE_TO_INFER_SCHEMA
        part.write.mode("overwrite").parquet(
            os.path.join(self.store_path, f"seg-{batch_id:010d}-delta")
        )


def read_distribution(
    spark: SparkSession, store_path: str, before_batch: int | None = None
) -> DataFrame | None:
    """Merge-on-read: SUM counts over all completed segments →
    ``(key, grp, value, n)`` — the exact accumulated distribution."""
    segs = _list_segments(store_path, before_batch)
    if not segs:
        return None
    raw = reduce(lambda a, b: a.unionByName(b), (spark.read.parquet(s) for s in segs))
    # r13: ONE user-sized (key, value) exchange feeds the whole downstream
    # chain — hash(key, value) satisfies this merge's (key, grp, value)
    # grouping, regroup_distribution's (key, grp%m, value) AND the test
    # functions' (key, value) fold (clustered-distribution subset rule),
    # so three chained aggregates run with no further shuffle; being
    # user-specified, AQE does not coalesce the tiny-byte distribution to
    # one partition either (sweep log: the per-key rank work serialized).
    # The rows shipped are per-segment count partials, already tiny.
    n_part = spark.sparkContext.defaultParallelism
    return (
        raw.repartition(n_part, "key", "value")
        .groupBy("key", "grp", "value")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def ks_from_distribution(dist: DataFrame) -> DataFrame:
    """Exact two-sample KS per key from the accumulated summary —
    identical integer algebra to q295 (numerator max|cum_a·n_b −
    cum_b·n_a| over the value-ordered growing cumulative frames), so a
    stream-fed store answers the same oracle bit-for-bit. Output columns
    match q295's: (event_type, n_a, n_b, ks_num)."""
    from pyspark.sql import Window

    g = dist.groupBy("key", "value").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("n")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == 1, F.col("n")).otherwise(0)).alias("cb"),
    )
    wcum = (
        Window.partitionBy("key")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("key")
    c = g.select(
        "key",
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    return (
        c.groupBy(F.col("key").alias("event_type"))
        .agg(
            F.max("na").cast("bigint").alias("n_a"),
            F.max("nb").cast("bigint").alias("n_b"),
            F.max(F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")))
            .cast("bigint")
            .alias("ks_num"),
        )
    )


def compact_distribution(
    spark: SparkSession, store_path: str, before_batch: int
) -> None:
    """Fold count segments < before_batch into one base via sum-merge —
    re-aggregating compaction (counts compose losslessly)."""
    import glob as _glob
    import shutil as _shutil

    base = os.path.join(store_path, f"seg-{before_batch - 1:010d}-base")
    if not _complete(base):
        if len(_list_segments(store_path, before_batch)) <= 1:
            return
        merged = read_distribution(spark, store_path, before_batch=before_batch)
        if merged is None:
            return
        merged.write.mode("overwrite").parquet(base)
        if not _complete(base):
            return
    for d in _glob.glob(os.path.join(store_path, "seg-*")):
        if d == base:
            continue
        meta = _parse_segment(d)
        if meta is not None and meta[0] < before_batch:
            _shutil.rmtree(d, ignore_errors=True)


def regroup_distribution(dist: DataFrame, mod: int) -> DataFrame:
    """Collapse a fine-grained group key to ``grp % mod`` (counts merge
    losslessly). The store can therefore carry ONE group column at the
    lcm granularity (e.g. ``user_id % 6``) and serve every coarser test
    family — the %2 Mann-Whitney/KS split and the %3 Kruskal-Wallis
    split — from the same accumulated state (CRT: ``u % 6`` determines
    both ``u % 2`` and ``u % 3``)."""
    return dist.groupBy("key", (F.col("grp") % mod).alias("grp"), "value").agg(
        F.sum("n").cast("bigint").alias("n")
    )


def kw_h_expr(big: str, groups: int = 3) -> str:
    """Tie-corrected Kruskal-Wallis H as ONE SQL expression over the
    integer building blocks (columns ``two_r_g``, ``n_g``, ``n``,
    ``tie_cubed``), with every bracket explicit so Spark and DuckDB
    evaluate the identical IEEE operation sequence (CLAUDE.md rule 12).
    ``big`` is the engine's wide-exact-integer type — ``DECIMAL(38,0)``
    for Spark, ``HUGEINT`` for DuckDB (rule 11): the doubled rank sums
    2R_g reach n(n+1) so their squares exceed int64, and the
    exact-integer → DOUBLE casts are correctly rounded and bit-identical
    in both engines (rule 16). H = 12/(n(n+1))·ΣR_g²/n_g − 3(n+1) with
    R = 2R/2 becomes 3·Σ(2R_g)²/n_g/(n(n+1)) − 3(n+1); the tie
    correction divides by 1 − Σ(c³−c)/(n³−n)."""

    def sq(g: int) -> str:
        return (
            f"CAST(CAST(two_r_{g} AS {big}) * two_r_{g} AS DOUBLE)"
            f" / CAST(n_{g} AS DOUBLE)"
        )

    s = sq(0)
    for g in range(1, groups):
        s = f"({s} + {sq(g)})"
    nd = "CAST(n AS DOUBLE)"
    h_raw = f"((3.0 * {s}) / ({nd} * ({nd} + 1.0)) - 3.0 * ({nd} + 1.0))"
    nnn = f"CAST(CAST(n AS {big}) * n * n - n AS DOUBLE)"
    # Guard the degenerate shapes (an empty group, or every value tied →
    # tie_cubed = n³−n) with NULL: ANSI Spark THROWS on double division
    # by zero, so the guard must live inside the shared expression.
    ok = " AND ".join([f"n_{g} > 0" for g in range(groups)])
    ok = f"({ok} AND tie_cubed < {nnn})"
    return f"(CASE WHEN {ok} THEN ({h_raw} / (1.0 - tie_cubed / {nnn})) ELSE NULL END)"


def kruskal_wallis_from_distribution(dist: DataFrame, groups: int = 3) -> DataFrame:
    """Exact Kruskal-Wallis per key from the accumulated summary — the
    K-group extension of the Mann-Whitney doubled-U algebra (same
    value-level midranks: 2R_g = Σ_v c_g(v)·(2·cum_before(v)+c(v)+1)),
    proving the sink's per-(key, grp, value) counts serve the whole
    rank-test family, not just two-sample splits. Emits the exact
    integer building blocks (n, n_g, two_r_g, tie term Σc³−c) plus the
    tie-corrected H as a rule-12/16 deterministic double; the
    Σ_g 2R_g = n(n+1) rank identity is a loud WHERE (a ranking bug
    drops rows and fails the driver row count instead of shipping a
    wrong statistic). Every group must be non-empty per key (guaranteed
    for modulus splits of dense user ids)."""
    from pyspark.sql import Window

    aggs = [F.sum("n").alias("c")]
    for g in range(groups):
        aggs.append(
            F.sum(F.when(F.col("grp") == g, F.col("n")).otherwise(0)).alias(f"c{g}")
        )
    per_v = dist.groupBy("key", "value").agg(*aggs)
    wb = (
        Window.partitionBy("key")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_v = per_v.withColumn("cum_before", F.coalesce(F.sum("c").over(wb), F.lit(0)))
    mid2 = 2 * F.col("cum_before") + F.col("c") + 1
    c_dec = F.col("c").cast("decimal(38,0)")
    out_aggs = [
        F.sum("c").cast("bigint").alias("n"),
        F.sum(c_dec * c_dec * c_dec - c_dec).alias("tie_dec"),
    ]
    for g in range(groups):
        out_aggs.append(F.sum(f"c{g}").cast("bigint").alias(f"n_{g}"))
        out_aggs.append(F.sum(F.col(f"c{g}") * mid2).cast("bigint").alias(f"two_r_{g}"))
    s = per_v.groupBy(F.col("key").alias("event_type")).agg(*out_aggs)
    ident = reduce(
        lambda a, g: a + F.col(f"two_r_{g}"), range(1, groups), F.col("two_r_0")
    )
    s = s.where(ident == F.col("n") * (F.col("n") + 1)).withColumn(
        "tie_cubed", F.col("tie_dec").cast("double")
    )
    cols = (
        ["event_type", "n"]
        + [f"n_{g}" for g in range(groups)]
        + [f"two_r_{g}" for g in range(groups)]
        + ["tie_cubed"]
    )
    return s.select(*cols).withColumn(
        "h_adj", F.expr(kw_h_expr("DECIMAL(38,0)", groups))
    )


def mann_whitney_from_distribution(dist: DataFrame) -> DataFrame:
    """Exact Mann-Whitney doubled-U per key from the accumulated summary
    — identical integer algebra to q294 (value-level midranks: 2U =
    Σc_grp(v)·(2·cum_before(v)+c(v)+1) − n(n+1)), proving the sink's
    state is the shared sufficient statistic of the whole cdf-test
    family, not just KS. Output columns match q294's."""
    from pyspark.sql import Window

    g = dist.groupBy("key", "value").agg(
        F.sum("n").alias("c"),
        F.sum(F.when(F.col("grp") == 0, F.col("n")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == 1, F.col("n")).otherwise(0)).alias("cb"),
    )
    wb = (
        Window.partitionBy("key")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = g.withColumn("cum_before", F.coalesce(F.sum("c").over(wb), F.lit(0)))
    mid2 = 2 * F.col("cum_before") + F.col("c") + 1
    s = g.groupBy(F.col("key").alias("event_type")).agg(
        F.sum(F.col("ca") * mid2).alias("r2a"),
        F.sum("ca").alias("na"),
        F.sum(F.col("cb") * mid2).alias("r2b"),
        F.sum("cb").alias("nb"),
    )
    two_u_a = F.col("r2a") - F.col("na") * (F.col("na") + 1)
    two_u_b = F.col("r2b") - F.col("nb") * (F.col("nb") + 1)
    return s.where(two_u_a + two_u_b == 2 * F.col("na") * F.col("nb")).select(
        "event_type",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        two_u_a.cast("bigint").alias("two_u_a"),
        two_u_b.cast("bigint").alias("two_u_b"),
    )
