"""Deterministic, exactly-verifiable sketches (Flajolet et al. 2007's
HyperLogLog, public) — the 100 TB path for distinct counting is a sketch
merge, not a COUNT(DISTINCT) shuffle, but builtin sketches
(approx_count_distinct) differ between engines and cannot be
oracle-checked. This HLL is built from the cross-engine h60 hash with
INTEGER register math, so the whole sketch — every register, the scaled
harmonic sum, and the final estimate (one fixed IEEE expression) — is
bit-identical in Spark and DuckDB while still being a real HLL:

  * bucket j = h60(x) mod m (m = 2^p buckets);
  * rank    = leading zeros of the remaining 54 bits + 1
              (= 55 - bit_length(rem), via length(bin(rem)) — identical
              minimal-length binary rendering in both engines);
  * register M[j] = max rank in bucket; empty buckets contribute rank 0;
  * Σ 2^-M[j] is kept EXACT by scaling with 2^60: present buckets sum
    shiftleft(1, 60-M) cast to DECIMAL(38,0) per term (M ≥ 1 → ≤ 2^59
    each, but ≥16 rank-1 buckets overflow an int64 SUM), empty buckets
    add (m - hit) · 2^60 in DECIMAL(38,0);
  * estimate = α_m·m²·2^60 / S — literally the same arithmetic expression
    in both engines (decimal→double casts are correctly rounded and
    bit-identical; one final IEEE multiply-divide chain).

This is the raw HLL estimator (no small/large-range correction): the
point is the sketch pipeline shape — map-side register partials, a
64-row merge, O(1) driver result — with hash-checkable output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import duck_h60, h60

#: HLL parameters: p=6 → m=64 buckets, α_64 = 0.709 (Flajolet et al. 2007,
#: Fig. 3 — exact published constant for m = 64).
HLL_P = 6
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.709


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """Global HLL distinct estimate of a string-castable column →
    one row ``(n_exact, buckets_hit, s_scaled, hll_estimate)``.

    ``n_exact`` (an exact COUNT(DISTINCT)) rides along so the estimate's
    error is visible in the result itself; at 100 TB you would drop it and
    keep only the sketch (map-side partial registers → 64-row merge).
    """
    h = h60(F.col(col).cast("string"))
    keyed = df.select(
        F.col(col).cast("string").alias("_x"),
        # integer bit ops only — a double division of a 60-bit int would
        # round before the cast
        h.bitwiseAND(F.lit(HLL_M - 1)).cast("bigint").alias("_b"),
        F.shiftright(h, HLL_P).cast("bigint").alias("_rem"),
    ).withColumn(
        "_rank",
        F.when(F.col("_rem") > 0, F.lit(55) - F.length(F.bin(F.col("_rem"))))
        .otherwise(F.lit(55))
        .cast("bigint"),
    )
    regs = keyed.groupBy("_b").agg(F.max("_rank").alias("_m"))
    agg = regs.agg(
        F.count("*").cast("bigint").alias("buckets_hit"),
        # SUM in DECIMAL(38,0), not bigint: sparse data fills registers with
        # rank 1 (term 2^59) and ≥16 such buckets overflow int64 under ANSI
        # mode. DuckDB never hit this because its sum(BIGINT) widens to
        # HUGEINT; decimal sums are exact in both engines.
        F.sum(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(60 - _m AS INT)) AS DECIMAL(38,0))"
            )
        )
        .cast("decimal(38,0)")
        .alias("_s_hit"),
    )
    exact = df.agg(F.countDistinct(F.col(col).cast("string")).alias("n_exact"))
    s = (
        F.col("_s_hit")
        + (F.lit(HLL_M).cast("decimal(38,0)") - F.col("buckets_hit").cast("decimal(38,0)"))
        * F.lit(1 << 60).cast("decimal(38,0)")
    ).cast("double")
    return (
        exact.join(F.broadcast(agg))
        .select(
            "n_exact",
            "buckets_hit",
            s.alias("s_scaled"),
            (
                F.lit(HLL_ALPHA)
                * F.lit(float(HLL_M * HLL_M))
                * F.lit(float(1 << 60))
                / s
            ).alias("hll_estimate"),
        )
    )


def duck_hll_distinct_sql(table: str, col: str) -> str:
    """DuckDB SQL computing the identical sketch over ``table.col``."""
    h = duck_h60(f"CAST({col} AS VARCHAR)")
    return f"""
WITH k AS (
  SELECT {h} AS h FROM {table}
), r AS (
  SELECT h % {HLL_M} AS b, h // {HLL_M} AS rem FROM k
), ranked AS (
  SELECT b, CASE WHEN rem > 0 THEN 55 - length(bin(rem)) ELSE 55 END AS rank FROM r
), regs AS (
  SELECT b, max(rank) AS m FROM ranked GROUP BY b
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS buckets_hit,
         CAST(sum(CAST(1 AS BIGINT) << CAST(60 - m AS INT)) AS DECIMAL(38,0)) AS s_hit
  FROM regs
), exact AS (
  SELECT CAST(count(DISTINCT CAST({col} AS VARCHAR)) AS BIGINT) AS n_exact FROM {table}
)
SELECT n_exact, buckets_hit,
       CAST(s_hit + (CAST({HLL_M} AS DECIMAL(38,0)) - CAST(buckets_hit AS DECIMAL(38,0)))
                    * CAST({1 << 60} AS DECIMAL(38,0)) AS DOUBLE) AS s_scaled,
       {HLL_ALPHA} * {float(HLL_M * HLL_M)} * {float(1 << 60)}
         / CAST(s_hit + (CAST({HLL_M} AS DECIMAL(38,0)) - CAST(buckets_hit AS DECIMAL(38,0)))
                        * CAST({1 << 60} AS DECIMAL(38,0)) AS DOUBLE) AS hll_estimate
FROM exact CROSS JOIN agg"""


def hll_registers(df: DataFrame, col: str, group_cols: list[str] | None = None) -> DataFrame:
    """Per-group HLL registers ``(*group_cols, _b, _m)`` — the MERGEABLE
    form: registers from disjoint partitions/corpora/days merge by
    ``groupBy(_b).max(_m)`` (associative + commutative + idempotent), which
    is what makes sketch distinct-counting a map-side partial at 100 TB.
    """
    h = h60(F.col(col).cast("string"))
    keyed = df.select(
        *(group_cols or []),
        h.bitwiseAND(F.lit(HLL_M - 1)).cast("bigint").alias("_b"),
        F.shiftright(h, HLL_P).cast("bigint").alias("_rem"),
    ).withColumn(
        "_rank",
        F.when(F.col("_rem") > 0, F.lit(55) - F.length(F.bin(F.col("_rem"))))
        .otherwise(F.lit(55))
        .cast("bigint"),
    )
    return keyed.groupBy(*(group_cols or []), "_b").agg(F.max("_rank").alias("_m"))


def merge_registers(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union two register sets and re-max — sketch merge (lossless)."""
    return (
        a.unionByName(b)
        .groupBy(*(group_cols or []), "_b")
        .agg(F.max("_m").alias("_m"))
    )


def hll_estimate_from_registers(regs: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Finish a register set into ``(*group_cols, buckets_hit, s_scaled,
    hll_estimate)`` — same exact-arithmetic finish as :func:`hll_distinct`."""
    agg = regs.groupBy(*(group_cols or [])).agg(
        F.count("*").cast("bigint").alias("buckets_hit"),
        # SUM in DECIMAL(38,0), not bigint: sparse data fills registers with
        # rank 1 (term 2^59) and ≥16 such buckets overflow int64 under ANSI
        # mode. DuckDB never hit this because its sum(BIGINT) widens to
        # HUGEINT; decimal sums are exact in both engines.
        F.sum(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(60 - _m AS INT)) AS DECIMAL(38,0))"
            )
        )
        .cast("decimal(38,0)")
        .alias("_s_hit"),
    )
    s = (
        F.col("_s_hit")
        + (F.lit(HLL_M).cast("decimal(38,0)") - F.col("buckets_hit").cast("decimal(38,0)"))
        * F.lit(1 << 60).cast("decimal(38,0)")
    ).cast("double")
    return agg.select(
        *(group_cols or []),
        "buckets_hit",
        s.alias("s_scaled"),
        (
            F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) * F.lit(float(1 << 60)) / s
        ).alias("hll_estimate"),
    )


def duck_hll_grouped_sql(table: str, col: str, group_col: str) -> str:
    """DuckDB SQL for the per-group sketch + exact count, one row per group."""
    h = duck_h60(f"CAST({col} AS VARCHAR)")
    return f"""
WITH k AS (
  SELECT {group_col} AS g, {h} AS h FROM {table}
), r AS (
  SELECT g, h % {HLL_M} AS b, h // {HLL_M} AS rem FROM k
), ranked AS (
  SELECT g, b, CASE WHEN rem > 0 THEN 55 - length(bin(rem)) ELSE 55 END AS rank FROM r
), regs AS (
  SELECT g, b, max(rank) AS m FROM ranked GROUP BY g, b
), agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS buckets_hit,
         CAST(sum(CAST(1 AS BIGINT) << CAST(60 - m AS INT)) AS DECIMAL(38,0)) AS s_hit
  FROM regs GROUP BY g
), exact AS (
  SELECT {group_col} AS g, CAST(count(DISTINCT CAST({col} AS VARCHAR)) AS BIGINT) AS n_exact
  FROM {table} GROUP BY {group_col}
)
SELECT exact.g AS {group_col}, n_exact, buckets_hit,
       CAST(s_hit + (CAST({HLL_M} AS DECIMAL(38,0)) - CAST(buckets_hit AS DECIMAL(38,0)))
                    * CAST({1 << 60} AS DECIMAL(38,0)) AS DOUBLE) AS s_scaled,
       {HLL_ALPHA} * {float(HLL_M * HLL_M)} * {float(1 << 60)}
         / CAST(s_hit + (CAST({HLL_M} AS DECIMAL(38,0)) - CAST(buckets_hit AS DECIMAL(38,0)))
                        * CAST({1 << 60} AS DECIMAL(38,0)) AS DOUBLE) AS hll_estimate
FROM exact JOIN agg USING (g) ORDER BY {group_col}"""


# --------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, public) — the frequency
# twin of the HLL above: d seeded hash rows × w counting buckets, estimate
# = min over rows. Same exact-verifiability trick: seeded h60 buckets and
# integer register sums are bit-identical in Spark/DuckDB, so the WHOLE
# sketch (every register and every estimate) is oracle-checkable while
# keeping the real CMS shape — registers are mergeable by (row, bucket)
# SUM (map-side partial at 100 TB; state is d×w integers regardless of
# stream volume), and estimates never undercount (est ≥ exact, with
# equality when a token's d buckets are all collision-free).
# --------------------------------------------------------------------------

from tagtree_spark.functions.hashing import duck_h60_seeded, h60_seeded  # noqa: E402

CMS_D = 4  #: hash rows (depth) — error probability ~ e^-d
CMS_W = 256  #: buckets per row (width) — overcount ~ total/w per collision


def cms_registers(
    items: DataFrame,
    col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    weight_col: str | None = None,
) -> DataFrame:
    """CMS registers ``(row, bucket, cnt)``. ``items`` is one row per
    occurrence, or — with ``weight_col`` — one row per distinct value with
    its count (feeding the sketch from an upstream aggregate instead of
    re-shuffling occurrences). One d-way narrow fan-out + ONE
    (row, bucket) aggregate — the shuffle carries at most d×w groups after
    map-side partials."""
    keyed = items.select(
        *( [F.col(weight_col).alias("_wt")] if weight_col else [] ),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("row"),
                        F.pmod(h60_seeded(F.col(col).cast("string"), r), F.lit(w))
                        .cast("bigint")
                        .alias("bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rb"),
    )
    agg = F.sum("_wt") if weight_col else F.count("*")
    return keyed.groupBy("rb.row", "rb.bucket").agg(agg.cast("bigint").alias("cnt"))


def merge_cms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Register merge: union + (row, bucket) SUM — linear sketch, lossless
    for counts."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimates(
    tokens: DataFrame, registers: DataFrame, col: str, d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """Point-query the sketch for each DISTINCT value of ``tokens.col`` →
    ``(col, cms_est)``: d register lookups per token (broadcast the d×w
    register table), min across rows."""
    probes = tokens.select(F.col(col)).distinct().select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("bigint").alias("row"),
                        F.pmod(h60_seeded(F.col(col).cast("string"), r), F.lit(w))
                        .cast("bigint")
                        .alias("bucket"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rb"),
    ).select(col, "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(registers), ["row", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
    )


def duck_cms_heavy_hitters_sql(
    table: str, split_col: str, k: int = 20, d: int = CMS_D, w: int = CMS_W
) -> str:
    """DuckDB SQL computing the identical sketch over whitespace tokens of
    ``table.split_col``: exact top-k with their CMS estimates riding along
    (the estimator error made visible, like the HLL's n_exact)."""
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT token, n, {r} AS row, "
        f"{duck_h60_seeded('token', r)} % {w} AS bucket FROM counts"
        for r in range(d)
    )
    return f"""
WITH words AS (
  SELECT unnest(string_split({split_col}, ' ')) AS token FROM {table}
), counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM words GROUP BY token
), probes AS (
  {probe_rows}
), regs AS (
  SELECT row, bucket, CAST(sum(n) AS BIGINT) AS cnt
  FROM probes GROUP BY row, bucket
), est AS (
  SELECT p.token, min(r.cnt) AS cms_est
  FROM (SELECT DISTINCT token, row, bucket FROM probes) p
  JOIN regs r USING (row, bucket)
  GROUP BY p.token
)
SELECT c.token, c.n, CAST(e.cms_est AS BIGINT) AS cms_est
FROM counts c JOIN est e ON c.token = e.token
ORDER BY c.n DESC, c.token LIMIT {k}"""


# --------------------------------------------------------------------------
# KMV / theta sketch (Bar-Yossef et al. 2002; Beyer et al. 2007 — public
# k-minimum-values estimator, the basis of the DataSketches theta sketch).
# Distinct-count with SET OPERATIONS the HLL above cannot do: two sketches
# union by re-ranking the merged k smallest hashes, and |A∩B| follows by
# inclusion–exclusion. Same exact-verifiability trick as the HLL/CMS: the
# k smallest DISTINCT h60 values per group are a deterministic set, and
# the estimate (k−1)·2^60 / h_k is one decimal-exact product cast to
# double and ONE IEEE division — bit-identical cross-engine.
# --------------------------------------------------------------------------

KMV_K = 16  #: register count — relative error ~ 1/sqrt(k-2)
H60_SPACE = 1 << 60  #: h60 hash space size (hashes are uniform in [0, 2^60))


def kmv_registers(df: DataFrame, col: str, group_col: str) -> DataFrame:
    """Per-group KMV registers: the ``KMV_K`` smallest distinct h60 values
    of ``col``. One distinct + one rank window, both keyed by the group —
    a sketch of ≤k rows per group regardless of group size (the 100 TB
    state bound), SUM/union-mergeable by re-ranking.

    → ``(group, rn, hash)`` with rn 1-based ascending.
    """
    from pyspark.sql import Window

    # r13 note: spread() before the md5+distinct was MEASURED NET
    # NEGATIVE (q123 0.66 -> 1.30 s full-bench) — the round-robin
    # exchange costs more than the ~0.3 s of warm serialized hashing
    # it parallelizes
    h = df.select(
        F.col(group_col).alias("group"),
        h60(F.col(col).cast("string")).alias("hash"),
    ).distinct()
    w = Window.partitionBy("group").orderBy("hash")
    return (
        h.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= KMV_K)
        .select("group", "rn", "hash")
    )


def kmv_union(regs: DataFrame) -> DataFrame:
    """Union all groups' registers into one sketch (scope '__union__'):
    distinct hashes re-ranked, k smallest kept — the mergeability that
    makes KMV a DISTRIBUTED sketch (shards sketch locally; the combiner
    unions ≤k rows per shard)."""
    from pyspark.sql import Window

    w = Window.orderBy("hash")
    return (
        regs.select("hash")
        .distinct()
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= KMV_K)
        .select(F.lit("__union__").alias("group"), "rn", "hash")
    )


def kmv_estimates(regs: DataFrame, exact: DataFrame) -> DataFrame:
    """Estimates from register sets: exact count when the group never
    filled its k registers, else ``(k−1)·2^60 / h_k``. ``exact`` maps
    group → true distinct count (rides along like q101's n_exact, making
    the estimator's error VISIBLE and the whole sketch oracle-checked).

    → ``(group, n_regs, n_exact, est)``.
    """
    per = regs.groupBy("group").agg(
        F.count("*").cast("bigint").alias("n_regs"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("hash"))).alias("kth"),
    )
    num = (F.lit(KMV_K - 1).cast("decimal(38,0)") * F.lit(H60_SPACE).cast("decimal(38,0)")).cast(
        "double"
    )
    return (
        per.join(exact, "group", "left")
        .select(
            "group",
            "n_regs",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.when(F.col("n_regs") < KMV_K, F.col("n_regs").cast("double"))
            .otherwise(num / F.col("kth").cast("double"))
            .alias("est"),
        )
    )


def kmv_overlap(
    a: DataFrame, b: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Theta-sketch set-overlap estimate next to its exact answer → ONE
    row ``(n_a_exact, n_b_exact, n_inter_exact, n_common, theta,
    est_inter)`` — the join-size / corpus-overlap estimator: how many
    distinct keys do two tables share, WITHOUT joining the tables.

    Each side is sketched by its :func:`kmv_registers` (≤k rows); theta
    = the smaller side's k-th min (or the full hash space when a sketch
    never filled — then the estimate IS exact); ``n_common`` = shared
    register hashes below theta; ``est_inter = n_common · 2^60 / theta``
    (one IEEE division of exact integers). At 100 TB the sketches are
    built shard-locally and merged (k rows per shard move), while the
    exact columns here ride along to make the estimator's error visible
    — the same audit-first pattern as q101's HLL and q123's KMV counts.
    """
    tagged = a.select(
        F.lit("a").alias("g"), F.col(col_a).cast("string").alias("key")
    ).unionByName(
        b.select(F.lit("b").alias("g"), F.col(col_b).cast("string").alias("key"))
    )
    regs = kmv_registers(tagged, "key", "g")
    per = regs.groupBy("group").agg(
        F.max(F.when(F.col("rn") == KMV_K, F.col("hash"))).alias("kth")
    )
    row = per.agg(
        F.least(
            F.coalesce(F.max(F.when(F.col("group") == "a", F.col("kth"))), F.lit(H60_SPACE)),
            F.coalesce(F.max(F.when(F.col("group") == "b", F.col("kth"))), F.lit(H60_SPACE)),
        ).cast("bigint").alias("theta")
    )
    ra = regs.where(F.col("group") == "a").select("hash")
    rb = regs.where(F.col("group") == "b").select("hash")
    common = ra.join(rb, "hash").join(F.broadcast(row)).where(
        F.col("hash") < F.col("theta")
    ).agg(F.count("*").cast("bigint").alias("n_common"))
    na = a.select(F.col(col_a).alias("key")).distinct().agg(
        F.count("*").cast("bigint").alias("n_a_exact")
    )
    nb = b.select(F.col(col_b).alias("key")).distinct().agg(
        F.count("*").cast("bigint").alias("n_b_exact")
    )
    ia = a.select(F.col(col_a).alias("key")).distinct()
    ib = b.select(F.col(col_b).alias("key")).distinct()
    ni = ia.join(ib, "key").agg(F.count("*").cast("bigint").alias("n_inter_exact"))
    # n_common <= k and 2^60 is a power of two: the double product is EXACT,
    # so est is one IEEE division of exact values (identical cross-engine;
    # decimal(38,0) products would exceed DuckDB's width cap).
    est = (
        F.col("n_common").cast("double")
        * F.lit(H60_SPACE).cast("double")
        / F.col("theta").cast("double")
    )
    return (
        na.join(F.broadcast(nb))
        .join(F.broadcast(ni))
        .join(F.broadcast(common))
        .join(F.broadcast(row))
        .select(
            "n_a_exact", "n_b_exact", "n_inter_exact", "n_common", "theta",
            est.alias("est_inter"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic log-histogram quantile sketch — the QUANTILE member of
# the mergeable-sketch family (HLL distinct / CMS heavy hitters / KMV
# overlap above). Values are rule-8 power-of-two scaled to integers,
# then bucketed exactly below 64 and by (octave, 6-bit mantissa) above:
# bucket counts are a deterministic pure function of the VALUE, so
# partial sketches from disjoint partitions/days/streams merge by plain
# count addition (no randomness, no merge-order sensitivity), state is
# O(64 + 64·octaves) per key regardless of volume, and every quantile
# answered from the sketch carries a guaranteed relative error ≤ 2^-6
# per coordinate (the bucket's [lo, hi) straddles the true order
# statistic — certified loudly by q309's containment WHERE). The same
# integer algebra is emitted for DuckDB so the sketch is cross-engine
# hash-verifiable, like the HLL above.
# --------------------------------------------------------------------------

LOGQ_SCALE_BITS = 10  # s = round(v · 2^10): exact exponent-shift multiply
LOGQ_MANTISSA = 6  # mantissa bits kept per octave → rel. error ≤ 1/64


def logq_exprs(s: str, engine: str) -> tuple[str, str, str]:
    """(bucket, lo, hi) SQL over a non-negative scaled bigint expression
    ``s`` — ONE generated spelling per engine (the kw_h_expr pattern) so
    Spark and DuckDB bucket bit-identically. Width via length(bin(s))
    (minimal binary rendering, identical in both engines — the HLL rank
    trick); only the shift and integer-divide operators differ."""
    e = f"length(bin({s}))"
    if engine == "spark":
        p2 = f"shiftleft(CAST(1 AS BIGINT), CAST({e} - 7 AS INT))"
        m = f"({s} DIV {p2})"
    elif engine == "duckdb":
        p2 = f"(CAST(1 AS BIGINT) << CAST({e} - 7 AS INT))"
        m = f"({s} // {p2})"
    else:
        raise ValueError(f"unknown engine {engine!r}")
    small = f"{s} < 64"
    bucket = f"(CASE WHEN {small} THEN {s} ELSE 64 * {e} + {m} END)"
    lo = f"(CASE WHEN {small} THEN {s} ELSE {m} * {p2} END)"
    hi = f"(CASE WHEN {small} THEN {s} + 1 ELSE ({m} + 1) * {p2} END)"
    return bucket, lo, hi


def log_histogram(
    df: DataFrame, key_col: str, s_col: str, weight_col: str | None = None
) -> DataFrame:
    """Build the sketch → ``(key, bucket, lo, hi, n)``. ``s_col`` must be
    a non-negative scaled bigint (round(v · 2^LOGQ_SCALE_BITS)). One
    map-side-combining groupBy; merging sketches is the SAME groupBy-sum
    over their union (counts compose). With ``weight_col`` the input is
    itself a count summary (e.g. a distinct-value frame or the streamed
    DistributionSink state) and buckets sum the weights."""
    bucket, lo, hi = logq_exprs(s_col, "spark")
    cols = [
        F.col(key_col).alias("key"),
        F.expr(bucket).cast("bigint").alias("bucket"),
        F.expr(lo).cast("bigint").alias("lo"),
        F.expr(hi).cast("bigint").alias("hi"),
    ]
    agg = F.count("*")
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("_w"))
        agg = F.sum("_w")
    return (
        df.select(*cols)
        .groupBy("key", "bucket", "lo", "hi")
        .agg(agg.cast("bigint").alias("n"))
    )


def merge_log_histograms(parts: DataFrame) -> DataFrame:
    """Merge partial sketches (any union of ``log_histogram`` outputs,
    e.g. per-day partials) by bucket-count addition."""
    return parts.groupBy("key", "bucket", "lo", "hi").agg(
        F.sum("n").cast("bigint").alias("n")
    )


def logq_quantile_report(dist: DataFrame) -> DataFrame:
    """p50/p90/p99 from the sketch WITH the containment certificate —
    shared by the batch (q309) and stream-state (q311) paths so both
    answer the same oracle bit-for-bit. ``dist`` is a count summary
    ``(key, s, c)`` (s = scaled bigint value). Output: (event_type, p,
    r, n, q_lo, q_hi, q_true); rows DROP if the chosen bucket fails to
    straddle the true rank-r order statistic — the sketch's ≤2^-6
    relative-error guarantee enforced as a loud WHERE. Rank targets
    ceil(p·n) are exact DECIMAL arithmetic (no float rank)."""
    from pyspark.sql import Window

    sk = log_histogram(dist, "key", "s", weight_col="c")
    wb = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cums = sk.withColumn("cum", F.sum("n").over(wb))
    nt = sk.groupBy("key").agg(F.sum("n").cast("bigint").alias("n"))
    tg = nt.select(
        "key",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(p)).alias("p"),
                        F.expr(f"CAST(ceil({lit} * n) AS BIGINT)").alias("r"),
                    )
                    for p, lit in [(0.5, "0.50"), (0.9, "0.90"), (0.99, "0.99")]
                ]
            )
        ).alias("t"),
    ).select("key", "n", F.col("t.p").alias("p"), F.col("t.r").alias("r"))
    qb = (
        tg.join(cums.select("key", "bucket", "lo", "hi", "cum"), "key")
        .where(F.col("cum") >= F.col("r"))
        .groupBy("key", "p", "r", "n")
        .agg(F.min(F.struct("bucket", "lo", "hi")).alias("qb"))
        .select(
            "key",
            "p",
            "r",
            "n",
            F.col("qb.lo").alias("q_lo"),
            F.col("qb.hi").alias("q_hi"),
        )
    )
    ws = (
        Window.partitionBy("key")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dc = dist.withColumn("cum", F.sum("c").over(ws))
    tru = (
        tg.join(dc.select("key", "s", "cum"), "key")
        .where(F.col("cum") >= F.col("r"))
        .groupBy("key", "p")
        .agg(F.min("s").alias("q_true"))
    )
    return (
        qb.join(tru, ["key", "p"])
        .where((F.col("q_lo") <= F.col("q_true")) & (F.col("q_true") < F.col("q_hi")))
        .select(
            F.col("key").alias("event_type"),
            "p",
            "r",
            "n",
            F.col("q_lo").cast("bigint"),
            F.col("q_hi").cast("bigint"),
            F.col("q_true").cast("bigint"),
        )
    )
