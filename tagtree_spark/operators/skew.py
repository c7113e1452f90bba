"""Skew mitigation: salted joins for hot keys (SURVEY.md §7.4.6).

AQE's skew-join handling (enabled in session.tune) splits oversized
sort-merge-join partitions at runtime — that covers most cases for free.
``salted_join`` is the manual fallback for shapes AQE does not rebalance
(e.g. a broadcast-ineligible dimension joined on a power-law key where one
key owns >> one partition's worth of rows):

  * the skewed (large) side gets a deterministic salt in [0, n_salt) —
    derived by hashing a high-cardinality disambiguator column, NOT
    rand(), so retries/replays of a task produce identical output;
  * the other side is exploded n_salt× (one copy per salt value);
  * the join key becomes (key, salt), spreading each hot key across
    n_salt shuffle partitions.

Cost: n_salt× duplication of the small side — use only for genuinely hot
keys (at scale: split the input into hot/cold by a key-frequency sketch,
salt the hot slice only, union the results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salt: int = 8,
    disambiguator: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` with ``other`` on ``on`` with each hot key spread
    over ``n_salt`` shuffle partitions. Result equals the plain join.

    ``disambiguator``: a column of the skewed side with per-row variation
    (defaults to the first non-key column) — its hash picks the salt.

    Only ``inner`` and ``left``(-outer) are supported: in a right/full
    join every UNMATCHED row of the exploded side would surface once per
    salt value — n_salt duplicates. (A correct right/full variant needs a
    post-join dedupe of the null-extended rows; not implemented.)
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    if disambiguator is None:
        candidates = [c for c in skewed.columns if c not in on]
        if not candidates:
            raise ValueError("skewed side needs a non-key column to derive the salt")
        disambiguator = candidates[0]
    s = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(disambiguator), F.lit(n_salt)).cast("int")
    )
    o = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return s.join(o, on=[*on, SALT_COL], how=how).drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, "F.Column"],
    n_salt: int = 16,
    disambiguator: str | None = None,
) -> DataFrame:
    """Skew-safe two-phase aggregation: ``groupBy(keys)`` where one key
    value may own far more rows than fit one shuffle partition.

    Phase 1 groups by ``(keys, salt)`` — the hot key's rows spread over
    ``n_salt`` shuffle partitions, each producing a partial (count, sums)
    row. Phase 2 re-aggregates the ≤ |keys|·n_salt partials by ``keys``
    alone — a trivially small shuffle. Result ≡ plain
    ``df.groupBy(keys).agg(count, sums)`` EXACTLY, provided every summed
    column is an integer/decimal type (re-aggregable, order-independent —
    CLAUDE.md rule 2; pass doubles through ``.cast("decimal(18,4)")``).

    Spark's own hash aggregate already does map-side partial aggregation,
    which covers skew for single-stage aggs; ``salted_agg`` is for the
    shapes where partials can't stay map-side (high-cardinality composite
    keys spilling the hash map, or agg immediately after a wide
    transformation repartitioned on the hot key). Mirrors the hot-key
    strategy of :func:`salted_join`.

    ``sums`` maps output column name → column expression to sum.
    → one row per distinct ``keys`` with ``n_rows`` + the summed columns.
    """
    if disambiguator is None:
        candidates = [c for c in df.columns if c not in keys]
        if not candidates:
            raise ValueError("need a non-key column to derive the salt")
        disambiguator = candidates[0]
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(disambiguator), F.lit(n_salt)).cast("int")
    )
    partial = salted.groupBy(*keys, SALT_COL).agg(
        F.count("*").alias("_n"),
        *[F.sum(c).alias(f"_s_{name}") for name, c in sums.items()],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        *[F.sum(f"_s_{name}").alias(name) for name in sums],
    )


def join_hotspots(
    a: DataFrame, b: DataFrame, key_a: str, key_b: str, topk: int = 20
) -> DataFrame:
    """Join-amplification diagnosis → the ``topk`` keys by output-row
    contribution ``n_a · n_b`` → ``(key, n_a, n_b, n_pairs)``. THE
    pre-flight check before any large join: one hot key with 10⁵ rows
    on each side emits 10¹⁰ pairs and stalls a single reducer at 100 TB
    — this report (two key-counted aggs + a key join + TakeOrdered)
    names those keys first, so the caller can salt (salted_agg), cap, or
    pre-aggregate them."""
    ca = a.groupBy(F.col(key_a).alias("key")).agg(
        F.count("*").cast("bigint").alias("n_a")
    )
    cb = b.groupBy(F.col(key_b).alias("key")).agg(
        F.count("*").cast("bigint").alias("n_b")
    )
    return (
        ca.join(cb, "key")
        .select("key", "n_a", "n_b", (F.col("n_a") * F.col("n_b")).alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "key")
        .limit(topk)
    )
