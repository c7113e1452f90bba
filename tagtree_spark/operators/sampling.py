"""Deterministic sampling for training-data pipelines (SURVEY.md §2.11).

``df.sample()`` is seed-dependent per partition split — re-running a
pipeline after a repartition silently yields a DIFFERENT sample. Hash
sampling decides membership from the ROW's identity alone:

    keep  ⇔  h60(stratum ':' id) % 100 < pct

so the sample is reproducible across runs, engines (the DuckDB oracle
computes the identical predicate), cluster layouts, and incremental
re-ingests (a document's membership never changes when the corpus around
it grows — the property that makes held-out splits stable over time).

Stratification: the hash is salted with the stratum value, so each
stratum is sampled at the target rate independently — a skewed corpus
(90% one language) still yields pct% of EVERY stratum, and strata can be
resampled independently. Pure narrow filter — pushes to the scan, no
shuffle, trivially 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import h60


def hash_bucket(id_col: str | Column, stratum_col: str | Column | None = None) -> Column:
    """Deterministic [0, 100) bucket for a row: h60 of ``stratum:id``."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    key = idc.cast("string")
    if stratum_col is not None:
        s = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
        key = F.concat_ws(":", s, key)
    return h60(key) % F.lit(100)


def stratified_sample(
    df: DataFrame,
    pct: int,
    id_col: str = "doc_id",
    stratum_col: str | None = "lang",
) -> DataFrame:
    """Keep ~pct% of every stratum, deterministically (see module doc)."""
    return df.where(hash_bucket(id_col, stratum_col) < F.lit(pct))


def weighted_mixture(
    df: DataFrame,
    rates: dict[str, int],
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    default_pct: int = 0,
) -> DataFrame:
    """Data-mixture sampling: keep a DIFFERENT deterministic percentage of
    each stratum (e.g. upweight rare languages, downweight boilerplate
    sources) — the "mixing weights" step of a training-data pipeline.

    ``rates`` maps stratum value → keep percentage (0-100); strata not
    listed keep ``default_pct``. Same h60 hash-bucket rule as
    :func:`stratified_sample`, so the choice of kept ids is reproducible
    across runs, engines, and partitionings, and a document's fate never
    depends on which executor saw it. Map-only — the rate lookup is a
    CASE expression, no join, no shuffle.
    """
    for k, v in {**rates, "<default>": default_pct}.items():
        if not 0 <= int(v) <= 100:
            raise ValueError(f"rate for {k!r} must be 0-100, got {v}")
    rate = F.lit(int(default_pct))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(int(v))).otherwise(rate)
    return df.where(hash_bucket(id_col, stratum_col) < rate)


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle: every row gets a
    ``(shard, pos)`` address that is a pure function of (epoch, id).

    A training job reads shard s in pos order; different epochs get
    statistically independent orders (the hash is salted with the epoch),
    and re-running an epoch — on any cluster layout — reproduces the
    identical order. This replaces ``ORDER BY rand()`` (seed- and
    partitioning-dependent) and a single global ``row_number`` (one
    executor sorts the world). The rank window partitions by shard, so
    parallelism = n_shards and each sort is 1/n_shards of the data; at
    100 TB set n_shards ≈ cluster cores and let each shard stream to its
    own output file.

    → ``(id_col, shard, pos)``, one row per input row.
    """
    idc = F.col(id_col)
    key = h60(F.concat_ws(":", F.lit(f"e{epoch}"), idc.cast("string")))
    shard = (key % F.lit(n_shards)).cast("bigint")
    w = Window.partitionBy(shard).orderBy(key, idc)
    return df.select(
        idc,
        shard.alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def dsir_importance(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights from hashed bigram features (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling" — public method): score every document by how target-like
    its hashed n-gram profile is, to importance-resample a raw corpus
    toward a target domain.

    Each adjacent-token bigram hashes (h60) into one of ``n_buckets``
    feature buckets. The TARGET distribution is the bucket histogram of
    the rows matching ``target_pred`` (e.g. ``F.col('lang') == 'en'`` or a
    quality flag); the RAW distribution is the whole corpus' histogram. A
    document's weight is the ratio of exact integer sums

        importance = Σ_b target_count[b] / Σ_b raw_count[b]

    over its own bigram occurrences — a ratio-of-sums surrogate for the
    DSIR log-likelihood ratio that stays integer-exact until ONE final
    IEEE division (cross-engine hashable; a log-space score would
    accumulate fp error engine-differently). Sums are DECIMAL(38,0): each
    term is a corpus-wide bucket count, so bigint sums could overflow at
    extreme scale (CLAUDE.md rule 7).

    Scale shape: ONE corpus pass. Bigrams reduce to a per-(doc, bucket)
    count frame first; both the ``n_buckets``-row histogram and the
    per-doc scoring consume that SAME aggregate, so the bigram explode is
    computed once and the second consumer rides the reused shuffle
    (ReusedExchange in the plan). The histogram is broadcast back; the
    doc-side weight is ``Σ_b k_db·count[b]`` — no shuffle of document
    bodies, no join bigger than (doc×bucket rows vs 64 rows).
    → ``(doc_id, n_bigrams, t_sum, r_sum, importance)``.
    """
    from tagtree_spark.session import spread

    words = F.split(F.col(text_col), " ")
    # spread BEFORE the bigram explode + h60: a one-row-group parquet scan
    # is one partition, and the explode+hash partial aggregate otherwise
    # serializes on a single core (r13 event log: 1.05 s on one task)
    base = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        target_pred.cast("boolean").alias("_is_target"),
        words.alias("_w"),
    )
    big = base.select(
        "doc_id",
        "_is_target",
        F.explode(
            F.when(
                F.size("_w") >= 2,
                F.expr(
                    "transform(slice(_w, 1, size(_w) - 1), "
                    "(x, i) -> concat(x, ' ', _w[i + 1]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    ).withColumn("bucket", h60("bigram") % F.lit(n_buckets))
    dbk = big.groupBy("doc_id", "_is_target", "bucket").agg(
        F.count("*").cast("bigint").alias("k")
    )
    hist = dbk.groupBy("bucket").agg(
        F.sum("k").cast("bigint").alias("raw_n"),
        F.sum(F.when(F.col("_is_target"), F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("target_n"),
    )
    scored = dbk.join(F.broadcast(hist), "bucket").groupBy("doc_id").agg(
        F.sum("k").cast("bigint").alias("n_bigrams"),
        F.sum(
            F.col("k").cast("decimal(38,0)") * F.col("target_n").cast("decimal(38,0)")
        ).alias("_t"),
        F.sum(
            F.col("k").cast("decimal(38,0)") * F.col("raw_n").cast("decimal(38,0)")
        ).alias("_r"),
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        F.col("_t").cast("bigint").alias("t_sum"),
        F.col("_r").cast("bigint").alias("r_sum"),
        (F.col("_t").cast("double") / F.col("_r").cast("double")).alias("importance"),
    )


def bottomk_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Fixed-SIZE deterministic sample per group: the k rows with the
    smallest ``h60(id)`` in each group — the mergeable alternative to a
    rate-based sample when the contract is "exactly k rows per stratum"
    (eval sets, human-review batches, per-source probes).

    Mergeability (the KMV property): the bottom-k of a union is the
    bottom-k of the per-shard bottom-k's — shards sample independently,
    a coordinator merges, nothing is order-sensitive. Spark's plan is
    exactly that shape: per-partition partial TakeOrdered under the
    group window. Deterministic: h60 is a pure function of the id.

    → ``(group, id, rk)`` with rk = 1..k by hash order.
    """
    from pyspark.sql import Window

    from tagtree_spark.functions.hashing import h60

    w = Window.partitionBy(group_col).orderBy(
        h60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.select(F.col(group_col), F.col(id_col))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= k)
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: every row gains a
    ``split`` column from ``h60(salt '#' id) % 100`` — <train_pct →
    'train', <train_pct+val_pct → 'val', else 'test'. The id (never the
    content) decides, so re-deriving the corpus, re-partitioning, or
    re-running NEVER migrates a document across splits — the leakage
    guarantee an rng-based splitter cannot give. Map-only."""
    b = h60(F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string"))) % 100
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)


def curriculum_order(
    docs: DataFrame,
    n_bands: int = 8,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum manifest: per stratum, documents are split into
    ``n_bands`` equi-depth difficulty bands (difficulty = token count,
    the standard short-to-long curriculum proxy), then deterministically
    shuffled WITHIN each band — training reads bands in order and sees
    easy-to-hard progression with an unbiased order inside each stage.

    → ``(doc_id, stratum, n_words, band, pos)``: ``band`` is the 1-based
    ntile over (n_words, doc_id) within the stratum; ``pos`` is the
    h60-shuffled 1-based rank within (stratum, band). Everything is a
    pure function of (id, content length) — reruns, repartitions, and
    engines agree (the DuckDB oracle replays both windows).

    Scale: both windows partition by stratum (and (stratum, band)) — no
    global sort; stratum count × n_bands is the parallelism, and each
    per-partition sort is a fraction of the corpus. For a low-cardinality
    stratum column at 100 TB, pre-split strata like pack_sequences'
    ``n_subshards`` dial.
    """
    if n_bands <= 0:
        raise ValueError("n_bands must be positive")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).cast("string").alias("stratum"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_words"),
    )
    wband = Window.partitionBy("stratum").orderBy("n_words", "doc_id")
    banded = d.withColumn("band", F.ntile(n_bands).over(wband).cast("bigint"))
    hkey = h60(F.concat_ws(":", F.lit("cur"), F.col("doc_id").cast("string")))
    wpos = Window.partitionBy("stratum", "band").orderBy(hkey, "doc_id")
    return banded.withColumn("pos", F.row_number().over(wpos).cast("bigint"))


def token_budget_allocation(
    docs: DataFrame,
    budget_pct: int = 50,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Largest-remainder token-budget split: given a global training
    budget of ``budget_pct``% of the corpus's tokens, allocate each
    stratum an integer token quota proportional to its share — the
    "how many tokens of each source does this run get" planning step of
    a data-mixture pipeline.

    Hamilton's method, all-integer: ``alloc_i = B*t_i DIV T`` plus one
    extra token to the ``B - Σalloc`` strata with the largest remainder
    (``B*t_i MOD T``; ties broken on stratum name) — Σalloc == B exactly,
    every stratum within 1 token of its exact proportional share, and
    the result is a pure function of the corpus (no floats, so engines
    agree bit-for-bit). Products run in DECIMAL(38,0): B and T can both
    be ~1e15 at 100 TB, so B*t_i overflows int64 (CLAUDE.md rule 7).

    → ``(stratum, tokens, alloc)``, one row per stratum. Scale: one
    partial-aggregating groupBy to stratum granularity; the rank window
    and the 1-row totals broadcast act on the per-stratum frame, whose
    size is the stratum cardinality, not the corpus.
    """
    if not 0 <= int(budget_pct) <= 100:
        raise ValueError(f"budget_pct must be 0-100, got {budget_pct}")
    t = docs.groupBy(F.col(stratum_col).cast("string").alias("stratum")).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).cast("bigint").alias("tokens")
    )
    tot = t.agg(
        F.sum("tokens").cast("decimal(38,0)").alias("t_total"),
        # widen BEFORE the multiply: sum(tokens) * pct in int64 overflows
        # on a large-enough corpus while the oracle's HUGEINT path does
        # not — the shape-dependent rule-7 class (review r7)
        F.expr(
            f"CAST(CAST(sum(tokens) AS DECIMAL(38,0)) * {int(budget_pct)} "
            "DIV 100 AS DECIMAL(38,0))"
        ).alias("budget"),
    )
    a = t.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "tokens",
        F.expr("CAST(CAST(budget AS DECIMAL(38,0)) * tokens DIV t_total AS DECIMAL(38,0))").alias("base"),
        F.expr("CAST(CAST(budget AS DECIMAL(38,0)) * tokens % t_total AS DECIMAL(38,0))").alias("rem"),
        F.col("budget"),
    )
    wrank = Window.orderBy(F.col("rem").desc(), "stratum")
    wall = Window.partitionBy(F.lit(1))
    return (
        a.withColumn("rnk", F.row_number().over(wrank))
        .withColumn("leftover", F.col("budget") - F.sum("base").over(wall))
        .select(
            "stratum",
            "tokens",
            (
                F.col("base")
                + F.when(F.col("rnk") <= F.col("leftover"), F.lit(1)).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc"),
        )
    )
