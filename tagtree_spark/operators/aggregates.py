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

    → one row: ``(n_full, n_samp, exact_p50.., samp_p50..)``.
    """
    from tagtree_spark.functions.hashing import h60

    keep = (h60(F.expr(key_expr)) % 100) < rate_pct

    def picks(prefix: str):
        return [
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {value_expr})"
            )
            .cast("double")
            .alias(f"{prefix}_p{int(p * 100)}")
            for p in percentiles
        ]

    full = df.agg(
        F.count("*").cast("bigint").alias("n_full"), *picks("exact")
    )
    samp = df.where(keep).agg(
        F.count("*").cast("bigint").alias("n_samp"), *picks("samp")
    )
    return full.join(F.broadcast(samp))
