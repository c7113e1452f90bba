"""Similarity search over embedding columns (E3, SURVEY.md §2.11).

Two paths, both JVM-native (zip_with/aggregate — no Python in the hot loop):
  * ``cosine_topk`` — brute-force exact top-k against one query vector.
    The correctness baseline; O(N·d) per query, one TakeOrdered, fine for
    a single query even at scale (it is a scan, not a join).
  * ``lsh_bucket_topk`` — hyperplane-LSH bucketed variant: vectors are
    bucketed by the sign pattern of dot products with deterministic
    pseudo-random hyperplanes; the query probes only its own bucket. This
    is the 100 TB path: the bucket id is a partitionable key, so a real
    deployment partitions the table by bucket and a query touches O(N/2^p)
    rows. Recall is probabilistic (standard SimHash-LSH tradeoff).

Floating point discipline: every dot product folds left-to-right over
index order with a 0.0 init — both Spark's ``aggregate`` and DuckDB's
``list_reduce`` use the same sequential bracketing, so scores are
bit-identical across engines (float32 values promoted to float64 before
multiply; each product is exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import h60
from tagtree_spark.operators.dedup import MAX_BUCKET, _bucket_pairs
from tagtree_spark.session import persist_tracked, spread

#: Hyperplane weights are integers in [-1000, 1000] derived from h60 so the
#: DuckDB oracle regenerates the exact same planes: w[j][i] = h60(j#i) % 2001 - 1000.
PLANE_MOD = 2001
PLANE_OFF = 1000


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential double-precision dot product of two array<float> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    emb: DataFrame, query_id: int, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k cosine neighbours of ``query_id`` → (vec_id, score).

    The single query row is broadcast (one row — a legitimate hint), then
    one narrow pass computes scores and TakeOrderedAndProject picks k.
    """
    emb = spread(emb)
    q = emb.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    scored = (
        emb.where(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            cosine(vec_col, "qv").alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), "vec_id").limit(k)


#: Target AVERAGE hyperplane-LSH bucket occupancy for the auto-derived
#: plane count: comfortably under dedup.MAX_BUCKET (200) so ordinary
#: bucket-size skew doesn't push buckets past the cap, and sized so every
#: in-repo test scale (500 / 500 / 2000 vectors) derives the historical
#: n_planes=4 — the static 4-plane oracles stay valid up to 16*150=2400
#: vectors, while a 10x corpus derives 8 planes and a 100x corpus 11
#: (VERDICT r11 #1: q151 returned 0 rows at 10x because a hand-set
#: n_planes=4 pushed every bucket past MAX_BUCKET).
TARGET_BUCKET = 150


def derive_n_planes(
    n_vectors: int,
    target_bucket: int = TARGET_BUCKET,
    floor: int = 4,
    cap: int = 32,
) -> int:
    """Corpus-count-derived hyperplane count: the smallest n with
    N / 2^n <= target_bucket, floored at the historical default (so
    small corpora keep the oracle-pinned 4 planes) and capped at 32
    (bucket ids stay well inside bigint). Monotone in ``n_vectors`` —
    the "raise n_planes with corpus size" contract made automatic."""
    import math

    if n_vectors <= 0:
        return floor
    need = math.ceil(math.log2(max(1, math.ceil(n_vectors / target_bucket))))
    return max(floor, min(cap, need))


def plane_weights(n_planes: int, dim: int) -> list[list[int]]:
    """Driver-side constant: integer hyperplane weights w[j][i] =
    h60(f"{j}#{i}") % 2001 - 1000, reproduced in SQL by the oracle. Computed
    in Python (hashlib md5 == Spark md5 == DuckDB md5)."""
    import hashlib

    out = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{j}#{i}".encode()).hexdigest()[:15], 16)
            row.append(h % PLANE_MOD - PLANE_OFF)
        out.append(row)
    return out


def lsh_bucket(vec_col: str | Column, planes: list[list[int]]) -> Column:
    """Bucket id = sum over planes of (dot(v, plane) >= 0) << j."""
    bucket = None
    for j, w in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in w]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        term = F.when(d >= 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bucket = term if bucket is None else bucket + term
    return bucket


def bucketed_embeddings(
    emb, n_planes: int | None = None, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    label_col: str | None = None,
):
    """Shared (vec_id, v[, lbl], bucket) frame for the whole LSH family —
    q33/q39/q148/q151/q162 all consume the same hyperplane buckets, so a
    session caches ONE persisted copy (queries_ext._wb) instead of each
    query re-folding 4 plane dot products per vector. The materialized
    "bucket column" a production vector store keeps next to its vectors.

    ``n_planes=None`` (the default since r12) derives the plane count
    from the corpus size via :func:`derive_n_planes` — one cheap
    metadata-backed count per build, paid only at fixture-construction
    time."""
    if n_planes is None:
        n_planes = derive_n_planes(emb.count())
    planes = plane_weights(n_planes, dim)
    cols = [
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    ]
    if label_col is not None:
        cols.insert(2, F.col(label_col).alias("lbl"))
    return spread(emb).select(*cols)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = MAX_BUCKET,
    wb: DataFrame | None = None,
) -> DataFrame:
    """E2 embedding-cosine near-dup → (vec_a, vec_b, score) for pairs in
    the SAME hyperplane-LSH bucket with cosine > threshold.

    The bucket join bounds candidate generation (never |N|² pairs); recall
    is the standard LSH tradeoff — raise by unioning several plane sets.
    The oracle reproduces the identical buckets and fold order, so the
    result matches bit-for-bit despite being an approximate operator.

    ``max_bucket`` (default ``dedup.MAX_BUCKET``) drops degenerate hot
    buckets before the pair explosion — with 2^n_planes coarse buckets a
    single bucket holding the whole corpus is the O(N²) failure mode; at
    scale raise ``n_planes`` with corpus size and monitor drops via
    ``dedup.dropped_bucket_stats``.
    """
    if wb is None:
        wb = persist_tracked(bucketed_embeddings(emb, n_planes, dim, id_col, vec_col))
    with_bucket = wb.select(F.col("vec_id").alias("doc_id"), "v", "bucket")
    cand = _bucket_pairs(with_bucket.select("bucket", "doc_id"), "bucket", max_bucket=max_bucket)
    va = with_bucket.select(F.col("doc_id").alias("doc_a"), F.col("v").alias("va"))
    vb = with_bucket.select(F.col("doc_id").alias("doc_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            F.col("doc_a").alias("vec_a"),
            F.col("doc_b").alias("vec_b"),
            cosine("va", "vb").alias("score"),
        )
        .where(F.col("score") > threshold)
    )


def kmeans_codebook(
    emb: DataFrame,
    n_cells: int = 8,
    n_iters: int = 5,
    train_sample: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd k-means codebook, trained driver-side on a
    bounded sample — the "train offline, assign at scale" split real IVF
    uses (the ASSIGNMENT pass is the 100 TB path; training touches
    ``train_sample`` vectors regardless of corpus size).

    Determinism (reproducible run-to-run and machine-to-machine):
      * the training sample is the ``train_sample`` lowest-id vectors
        (a stable rule, not an RNG), collected once — bounded driver cost;
      * initial centroids are the first ``n_cells`` sample vectors (the
        same seed the first-n stand-in used);
      * a fixed ``n_iters`` Lloyd iterations with cosine assignment,
        lowest-cid tie-break, and empty cells keeping their previous
        centroid.
    Returns plain Python float lists, ready to broadcast into
    :func:`ivf_assignments`/:func:`ivf_topk` as ``codebook=``.
    """
    import numpy as np

    sample = (
        emb.orderBy(id_col)
        .limit(train_sample)
        .select(vec_col)
        .collect()
    )
    x = np.asarray([list(r[0]) for r in sample], dtype=np.float64)
    cents = x[:n_cells].copy()
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    for _ in range(n_iters):
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
        sims = xn @ cn.T
        # argmax with lowest-cid tie-break (np.argmax takes the first max)
        assign = np.argmax(sims, axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [[float(v) for v in row] for row in cents]


def _centroids(
    emb: DataFrame,
    n_cells: int,
    codebook: list[list[float]] | None,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(cid, cv) codebook frame: an explicit (e.g. k-means) codebook when
    given, else the first-n-vectors stand-in (the oracle-checked default —
    q42's SQL reproduces it; a trained codebook is the production path and
    is pinned by the recall test instead)."""
    if codebook is not None:
        spark = emb.sparkSession
        return spark.createDataFrame(
            [(i, [float(v) for v in row]) for i, row in enumerate(codebook)],
            f"cid BIGINT, cv {emb.schema[vec_col].dataType.simpleString()}",
        )
    return emb.where(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )


def ivf_assignments(
    emb: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF coarse quantization → (vec_id, cid, cscore): each vector
    assigned to its nearest centroid by cosine (ties → lowest cid).

    The codebook is either an explicit trained one (:func:`kmeans_codebook`)
    or the first ``n_cells`` vectors (deterministic stand-in, oracle form).
    Shape: broadcast the tiny codebook, score each vector against all cells
    (n_cells× fan-out, map-side), keep the argmin with one window — at
    100 TB the assignment is a narrow pass and the cell id becomes the
    table's partition key.
    """
    from pyspark.sql import Window

    cents = _centroids(emb, n_cells, codebook, id_col, vec_col)
    scored = spread(emb).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).join(F.broadcast(cents))
    w = Window.partitionBy("vec_id").orderBy(F.col("cscore").desc(), F.col("cid"))
    return (
        scored.select("vec_id", "v", "cid", cosine("v", "cv").alias("cscore"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _probe_cells(cents: DataFrame, qv_df: DataFrame, nprobe: int) -> DataFrame:
    """The ``nprobe`` cell ids nearest the query → DataFrame['cid'] —
    the ONE probe-selection fold shared by every IVF read path: top-nprobe
    by query-centroid cosine, folded to one array row (sort_array over
    n_cells structs, no unpartitioned window — VERDICT r3 #8). nanvl maps
    a NaN cosine (degenerate zero centroid) to +inf BEFORE negating so it
    still sorts first — Spark ranks NaN greatest under DESC, and plain
    negation would flip a NaN cell from probed-first to never-probed
    (ADVICE r4 low)."""
    return (
        cents.join(F.broadcast(qv_df))
        .select("cid", cosine("cv", "qv").alias("cscore"))
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.nanvl(F.col("cscore"), F.lit(float("inf")))).alias("_n"),
                            F.col("cid"),
                        )
                    )
                ),
                1,
                nprobe,
            ).alias("_top")
        )
        .select(F.explode("_top").alias("_t"))
        .select(F.col("_t.cid").alias("cid"))
    )


def ivf_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 8,
    n_cells: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """E3 IVF-style ANN: probe the ``nprobe`` cells nearest to the query →
    (vec_id, cid, score). Recall/cost is the standard IVF dial: nprobe=1 is
    the cheapest probe; nprobe=n_cells degenerates to exact brute force
    (pinned by test_ivf_full_probe_equals_brute_force). Pass a trained
    ``codebook`` (:func:`kmeans_codebook`) for production-shaped cells —
    recall vs brute force is pinned by test_ivf_kmeans_recall."""
    assigned = persist_tracked(
        ivf_assignments(
            emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col, codebook=codebook
        )
    )
    qv_df = emb.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    # the nprobe centroids closest to the QUERY VECTOR (not just its own cell)
    cents = _centroids(emb, n_cells, codebook, id_col, vec_col)
    probe = _probe_cells(cents, qv_df, nprobe).select(F.col("cid").alias("qcid"))
    q = qv_df.crossJoin(F.broadcast(probe))
    return (
        assigned.join(F.broadcast(q), F.col("cid") == F.col("qcid"))
        .where(F.col("vec_id") != query_id)
        .select("vec_id", "cid", cosine("v", "qv").alias("score"))
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(k)
    )


def lsh_bucket_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    wb: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane-LSH bucket →
    (vec_id, bucket, score). At scale the bucket column is the partition
    key, so this prunes the scan to one partition of 2^n_planes."""
    with_bucket = (
        bucketed_embeddings(emb, n_planes, dim, id_col, vec_col) if wb is None else wb
    )
    q = with_bucket.where(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    scored = (
        with_bucket.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != query_id)
        .select("vec_id", "bucket", cosine("v", "qv").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), "vec_id").limit(k)


def semantic_dedup(
    emb: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: list[list[float]] | None = None,
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """SemDeDup-style semantic deduplication → surviving
    ``(vec_id, cid)`` rows: coarse-cluster every embedding (IVF
    assignment), then inside each cell drop any vector whose cosine to a
    LOWER-id cell-mate exceeds ``threshold`` (keep-the-minimum, the same
    survivor rule as the MinHash keep-one path).

    Shape mirrors the other bucketed near-dup operators: candidate pairs
    come only from within a cell (``_bucket_pairs`` on cid — never |N|²),
    hot degenerate cells are dropped by ``max_bucket``, and the verify
    joins carry the vectors back by id. At 100 TB the assignment is a
    broadcast-codebook map pass and cid is the table's partition key, so
    the pair generation is per-partition local.
    """
    assigned = persist_tracked(
        ivf_assignments(
            emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col, codebook=codebook
        )
    )
    pairs = _bucket_pairs(
        assigned.select("cid", F.col("vec_id").alias("doc_id")),
        "cid",
        max_bucket=max_bucket,
    )
    va = assigned.select(F.col("vec_id").alias("doc_a"), F.col("v").alias("va"))
    vb = assigned.select(F.col("vec_id").alias("doc_b"), F.col("v").alias("vb"))
    dropped = (
        pairs.join(va, "doc_a")
        .join(vb, "doc_b")
        .where(cosine("va", "vb") > threshold)
        .select(F.col("doc_b").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dropped, "vec_id", "left_anti")
        .select("vec_id", F.col("cid").cast("bigint").alias("cid"))
    )


# --------------------------------------------------------------------------
# Persisted IVF layout: the claim "the cell id becomes the table's partition
# key at 100 TB" (ivf_assignments docstring) made REAL — vectors land in
# cid=N partition directories, the codebook is a tiny sibling table, and a
# probe reads ONLY the nprobe cell directories (PartitionFilters in the
# scan; pinned by plan test).
# --------------------------------------------------------------------------


def materialize_ivf(
    emb: DataFrame,
    out_dir: str,
    n_cells: int = 8,
    codebook: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF index: ``vectors/`` partitioned by cell id,
    ``codebook/`` (cid, cv). One assignment pass; at scale this is the
    build step of a vector store and the partitioning IS the index."""
    import os

    assigned = ivf_assignments(
        emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col, codebook=codebook
    ).drop("cscore")
    # refuse a zero-row dynamic-partitioned write (CLAUDE.md rule 13):
    # _SUCCESS-only output poisons every later read with
    # UNABLE_TO_INFER_SCHEMA; an explicit error beats a broken store
    if assigned.isEmpty():
        raise ValueError("materialize_ivf: no vectors to index")
    assigned.repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(out_dir, "vectors")
    )
    _centroids(emb, n_cells, codebook, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "codebook"))


def ivf_store_topk(
    spark,
    store_dir: str,
    query_id: int,
    k: int = 8,
    nprobe: int = 1,
) -> DataFrame:
    """ANN top-k over the PERSISTED IVF layout: pick the ``nprobe`` cells
    nearest the query (tiny codebook scan), then read ONLY those cell
    directories (partition pruning via a literal isin — the probe list is
    nprobe ints, a metadata-sized driver decision like the streaming
    sinks' pruned store reads). Scores are the same cosine fold as
    :func:`ivf_topk`, so results match the in-memory path bit-for-bit."""
    import os

    vec_path = os.path.join(store_dir, "vectors")
    cents = spark.read.parquet(os.path.join(store_dir, "codebook"))
    qv_df = (
        spark.read.parquet(vec_path)
        .where(F.col("vec_id") == query_id)
        .select(F.col("v").alias("qv"))
    )
    probe = _probe_cells(cents, qv_df, nprobe)
    cids = [int(r.cid) for r in probe.collect()]
    pruned = (
        spark.read.option("basePath", vec_path)
        .parquet(vec_path)
        .where(F.col("cid").isin(cids))
    )
    return (
        pruned.join(F.broadcast(qv_df))
        .where(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            F.col("cid").cast("bigint").alias("cid"),
            cosine("v", "qv").alias("score"),
        )
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(k)
    )


def int8_quantize_report(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Scalar int8 quantization of an embedding column — the 4× storage
    compressor every 100 TB embedding pipeline applies before indexing
    (cf. faiss ScalarQuantizer QT_8bit: per-dimension affine grid).

    Pass 1 learns the grid: per-dimension global ``[min, max]`` via
    posexplode + hash agg (map-side partial combine; the final state is
    exactly ``n_dims`` rows), folded into ONE row of ``lo[]/hi[]`` arrays
    and broadcast — no driver collect, no second scan barrier beyond the
    grid's own agg. Pass 2 is map-only: each vector folds once
    (house single-fold style — code, dequantized value, squared error and
    running stats all inside one ``aggregate`` step, so the code
    subexpression is never re-evaluated across projections).

    Exactness (cross-engine): codes are
    ``round(((x - lo) * 255) / (hi - lo))`` — IEEE sub/mul/div on doubles
    are bit-deterministic, the scaled value is ≥ 0 so Spark HALF_UP ≡
    DuckDB half-away-from-zero, and faithful shortest-repr rounding cannot
    flip a .5 boundary. ``code_sum`` is an integer sum (order-free);
    ``sse`` is a sequential left fold in dimension order with a 0.0 init
    (≡ DuckDB ``list_reduce`` — every term ≥ 0, so the leading 0.0 + e1
    is exact).

    → ``(vec_id, n_dims, code_sum, max_code, sse)``.
    """
    emb = spread(emb)
    st = (
        emb.select(F.posexplode(vec_col).alias("p", "x"))
        .groupBy("p")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    grid = (
        st.agg(F.array_sort(F.collect_list(F.struct("p", "mn", "mx"))).alias("s"))
        .select(
            F.transform("s", lambda s: s.mn.cast("double")).alias("lo"),
            F.transform("s", lambda s: s.mx.cast("double")).alias("hi"),
        )
    )

    def step(stt, x):
        lo = F.get("lo", stt.i)
        hi = F.get("hi", stt.i)
        xd = x.cast("double")
        code = (
            F.when(hi == lo, F.lit(0).cast("bigint"))
            .otherwise(
                F.round(((xd - lo) * F.lit(255.0)) / (hi - lo)).cast("bigint")
            )
        )
        dq = lo + (code.cast("double") * (hi - lo)) / F.lit(255.0)
        e = (xd - dq) * (xd - dq)
        return F.struct(
            (stt.i + F.lit(1)).alias("i"),
            (stt.cs + code).alias("cs"),
            F.greatest(stt.mc, code).alias("mc"),
            (stt.sse + e).alias("sse"),
        )

    init = F.struct(
        F.lit(0).alias("i"),
        F.lit(0).cast("bigint").alias("cs"),
        F.lit(0).cast("bigint").alias("mc"),
        F.lit(0.0).alias("sse"),
    )
    folded = emb.join(F.broadcast(grid)).withColumn(
        "_q", F.aggregate(F.col(vec_col), init, step)
    )
    return folded.select(
        F.col(id_col).alias("vec_id"),
        F.size(vec_col).cast("bigint").alias("n_dims"),
        F.col("_q.cs").alias("code_sum"),
        F.col("_q.mc").alias("max_code"),
        F.col("_q.sse").alias("sse"),
    )


def _sq8_grid(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One-row ``(lo[], hi[])`` per-dimension min/max grid (the SQ8
    codebook) — posexplode + hash agg, broadcast by callers."""
    st = (
        emb.select(F.posexplode(vec_col).alias("p", "x"))
        .groupBy("p")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    return st.agg(
        F.array_sort(F.collect_list(F.struct("p", "mn", "mx"))).alias("s")
    ).select(
        F.transform("s", lambda s: s.mn.cast("double")).alias("lo"),
        F.transform("s", lambda s: s.mx.cast("double")).alias("hi"),
    )


def sq8_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine search over the int8-QUANTIZED vectors — the
    compressed-scan ANN path: at corpus scale the engine stores 1 byte per
    dimension (4× less IO than float32) and scans codes, reconstructing
    values on the fly; this operator scores against the dequantized
    vectors so the result is exactly what an SQ8 index would return
    (faiss IndexScalarQuantizer semantics).

    Dequantization is the same affine grid as
    :func:`int8_quantize_report` (round-trip through the code), applied
    in ONE transform per row against the broadcast one-row grid; scores
    are sequential double folds (cross-engine exact). The top-k is
    TakeOrdered on (score desc, vec_id).

    → ``(vec_id, score)`` — SQ8's answer; diff against
    :func:`cosine_topk` to measure quantization recall.
    """
    emb = spread(emb)
    grid = _sq8_grid(emb, vec_col)

    def dq_arr(col):
        def one(x, i):
            lo = F.get("lo", i)
            hi = F.get("hi", i)
            xd = x.cast("double")
            code = F.round(((xd - lo) * F.lit(255.0)) / (hi - lo)).cast("bigint")
            return F.when(hi == lo, lo).otherwise(
                lo + (code.cast("double") * (hi - lo)) / F.lit(255.0)
            )

        return F.transform(col, one)

    dq = emb.join(F.broadcast(grid)).select(
        id_col, dq_arr(F.col(vec_col)).alias("dq")
    )
    q = dq.where(F.col(id_col) == query_id).select(F.col("dq").alias("qv"))
    scored = (
        dq.where(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(F.col(id_col).alias("vec_id"), cosine("dq", "qv").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), "vec_id").limit(k)


def jl_weights(n_proj: int, dim: int) -> list[list[int]]:
    """Driver-side constant: integer JL projection weights
    w[j][i] = h60("jl{j}#{i}") % 2001 - 1000 — deterministic md5, so the
    SQL oracle regenerates the identical matrix (same family as
    :func:`plane_weights`, distinct salt)."""
    import hashlib

    out = []
    for j in range(n_proj):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"jl{j}#{i}".encode()).hexdigest()[:15], 16)
            row.append(h % PLANE_MOD - PLANE_OFF)
        out.append(row)
    return out


def jl_project(
    emb: DataFrame,
    n_proj: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection of the embedding column to
    ``n_proj`` coordinates — the dimensionality reducer run BEFORE ANN
    indexing at corpus scale (64→8 dims = 8× less distance arithmetic per
    probe, with JL's distance-preservation guarantee in expectation).

    Map-only: each output coordinate is one sequential double fold of
    vector × integer plane (the house exact-dot discipline — Spark
    ``aggregate`` ≡ DuckDB ``list_reduce`` bracketing, so every projected
    value is bit-identical cross-engine). No shuffle, no state; the plan
    is a single projection over the scan.

    → ``(vec_id, p0..p{n_proj-1})``.
    """
    planes = jl_weights(n_proj, dim)
    cols = [F.col(id_col).alias("vec_id")]
    for j, w in enumerate(planes):
        cols.append(
            dot(vec_col, F.array(*[F.lit(float(x)) for x in w])).alias(f"p{j}")
        )
    return spread(emb).select(*cols)


#: Fixed-point scale for cross-engine-exact embedding sums: 2^40. A
#: power of two, so ``x * SCALE`` is an EXACT double (exponent shift);
#: rounding it to an integer quantizes each coordinate at 2^-40 — far
#: below float32 noise for unit-range embeddings — and integer sums are
#: order-free. (A decimal cast is NOT safe here: Spark casts fp→decimal
#: through the shortest string repr while DuckDB rounds the exact binary
#: value, so arbitrary floats round differently — found by this
#: operator's own parity run.)
MOMENT_SCALE = 1 << 40


def embedding_moments(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension corpus moments of the embedding column — the
    calibration statistics a quantizer/whitener reads before choosing
    grids (mean/variance per coordinate, plus the exact min/max the SQ8
    grid uses). Moments are computed over the 2^-40-quantized values
    (see MOMENT_SCALE) so every sum is an integer — order-independent
    and bit-identical cross-engine; mean/variance are ONE fixed IEEE
    chain over the exact totals. Each scaled term is summed as
    DECIMAL(38,0) (a raw bigint sum would overflow at corpus scale:
    2^40-scaled terms × 10^9 rows > int64). min/max are picks.

    Shape: posexplode + hash agg with map-side partial combine; final
    state is one row per dimension. → ``(d, n, mean, var, mn, mx)``.
    """
    ex = emb.select(F.posexplode(vec_col).alias("p", "x")).select(
        (F.col("p") + 1).cast("bigint").alias("d"),
        F.round(F.col("x").cast("double") * F.lit(float(MOMENT_SCALE)))
        .cast("bigint")
        .alias("v"),
        F.col("x").cast("double").alias("x"),
    )
    agg = ex.groupBy("d").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("_s"),
        F.sum(
            (F.col("v").cast("decimal(38,0)") * F.col("v").cast("decimal(38,0)"))
        ).alias("_s2"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    nD = F.col("n").cast("double")
    sc = float(MOMENT_SCALE)
    mean = F.col("_s").cast("double") / F.lit(sc) / nD
    ex2 = F.col("_s2").cast("double") / F.lit(sc * sc) / nD
    return agg.select(
        "d",
        "n",
        mean.alias("mean"),
        (ex2 - mean * mean).alias("var"),
        "mn",
        "mx",
    )


#: Salt for the recall audit's deterministic query sample — the oracle
#: spells the identical h60('annq#' || vec_id) ordering.
ANN_AUDIT_SALT = "annq#"


def ann_recall_audit(
    emb: DataFrame,
    budget: int = 20,
    k: int = 10,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    wb: DataFrame | None = None,
) -> DataFrame:
    """Recall@k audit of the hyperplane-LSH ANN path against exact cosine
    → ``(qid, n_exact, n_ann, n_hit, recall)`` for a deterministic
    FIXED-SIZE query sample: the ``budget`` vec_ids with the smallest
    ``h60('annq#' || vec_id)`` (ties by vec_id) — a pseudorandom but
    engine-reproducible draw whose size does NOT grow with the corpus.

    VERDICT r11 #2: the pre-r12 ``vec_id % every == 0`` FRACTION made the
    audit O(N²/every) — superlinear by contract (17.5x wall at 10x data).
    A constant probe budget makes it O(budget·N): the exact side is a
    broadcast nested-loop probe of ``budget`` query rows over the corpus
    (the brute-force baseline the index is judged against), the ANN side
    is the production bucket equi-join. Both feed one per-qid top-k
    window; the hit count is an inner join of the two id sets. The number
    every approximate index must report before it is trusted at 100 TB.
    """
    from pyspark.sql import Window

    from tagtree_spark.functions.hashing import h60

    if wb is None:
        wb = bucketed_embeddings(emb, n_planes, dim, id_col, vec_col)
    qs = (
        wb.select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            "bucket",
            h60(F.concat(F.lit(ANN_AUDIT_SALT), F.col("vec_id").cast("string"))).alias(
                "_hq"
            ),
        )
        .orderBy("_hq", "qid")
        .limit(budget)
        .drop("_hq")
    )
    base = wb.select("vec_id", "v")
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), "vec_id")

    def topk(scored):
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("qid", "vec_id")
        )

    exact = topk(
        base.join(F.broadcast(qs.select("qid", "qv")))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine("v", "qv").alias("score"))
    )
    wbk = wb.select("vec_id", "v", "bucket")
    ann = topk(
        wbk.join(F.broadcast(qs), "bucket")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine("v", "qv").alias("score"))
    )
    ec = exact.groupBy("qid").agg(F.count("*").cast("bigint").alias("n_exact"))
    ac = ann.groupBy("qid").agg(F.count("*").cast("bigint").alias("n_ann"))
    hc = (
        exact.join(ann, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    return (
        ec.join(ac, "qid", "left")
        .join(hc, "qid", "left")
        .select(
            F.col("qid").cast("bigint").alias("qid"),
            "n_exact",
            F.coalesce("n_ann", F.lit(0)).cast("bigint").alias("n_ann"),
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)).cast("double") / k).alias("recall"),
        )
    )


def hard_negatives(
    emb: DataFrame,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_bucket: int | None = MAX_BUCKET,
    wb: DataFrame | None = None,
) -> DataFrame:
    """Contrastive hard-negative mining → ``(vec_id, label_a, neg_id,
    label_b, score)``: for every anchor, the most-similar vector with a
    DIFFERENT label among its hyperplane-LSH bucket peers — the
    embedding-training data loader's "hardest wrong answer" primitive.

    Same capped bucket-equi-join scale shape as
    :func:`embedding_near_dup_pairs`, but DIRECTIONAL (each anchor keeps
    its own top-1, so the join is a.bucket = b.bucket with a per-anchor
    window, not the a<b pair lattice). Never all-pairs; at 100 TB raise
    ``n_planes`` with corpus size so buckets stay bounded. ``max_bucket``
    follows the family convention (default ``dedup.MAX_BUCKET``; ``None``
    = uncapped).

    .. note:: changed in r5 — an explicit ``max_bucket=None`` used to
       mean "apply the default cap" and now means UNCAPPED (the family
       convention). External callers that passed ``None`` for the old
       default should pass nothing (or ``MAX_BUCKET``) and audit any
       remaining explicit ``None`` for skewed-bucket blowup (ADVICE r6
       low).

    A caller-supplied ``wb`` must include the label (built via
    ``bucketed_embeddings(..., label_col=...)`` — the shared
    queries_ext._wb cache does).
    """
    from pyspark.sql import Window

    if wb is None:
        wb = persist_tracked(
            bucketed_embeddings(emb, n_planes, dim, id_col, vec_col, label_col)
        )
    a = wb
    if max_bucket is not None:
        keep = wb.groupBy("bucket").agg(F.count("*").alias("_n")).where(
            F.col("_n") <= max_bucket
        ).select("bucket")
        a = wb.join(keep, "bucket")
    a = a.select(
        "bucket", F.col("vec_id").alias("a_id"), F.col("v").alias("va"),
        F.col("lbl").alias("label_a"),
    )
    b = wb.select(
        "bucket", F.col("vec_id").alias("b_id"), F.col("v").alias("vb"),
        F.col("lbl").alias("label_b"),
    )
    scored = (
        a.join(b, "bucket")
        .where((F.col("a_id") != F.col("b_id")) & (F.col("label_a") != F.col("label_b")))
        .select(
            F.col("a_id").alias("vec_id"), "label_a",
            F.col("b_id").alias("neg_id"), "label_b",
            cosine("va", "vb").alias("score"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("score").desc(), "neg_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def lsh_multiprobe_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    n_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    wb: DataFrame | None = None,
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. 2007): probe the query's bucket AND
    every bucket at Hamming distance 1 (one hyperplane flipped — the
    most-likely-miss neighbours), trading ``n_planes`` extra bucket reads
    for the recall a single-probe LSH loses at the margins → (vec_id,
    bucket, score) top-k.

    Same scan shape as :func:`lsh_bucket_topk` — at scale the bucket
    column is the partition key and this reads 1 + n_planes of the
    2^n_planes partitions; the probe set is computed from the ONE query
    row (broadcast). Unlike the rest of the family this USES the plane
    count even when ``wb`` is given (the flip loop) — a caller handing a
    pre-built ``wb`` should pass the count it was built with
    (queries_ext._wb_planes); ``None`` derives it from ``emb``'s size,
    which matches a ``wb`` that was itself auto-derived from ``emb``."""
    if n_planes is None:
        n_planes = derive_n_planes(emb.count())
    with_bucket = (
        bucketed_embeddings(emb, n_planes, dim, id_col, vec_col) if wb is None else wb
    )
    q = with_bucket.where(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cond = F.col("bucket") == F.col("qbucket")
    for j in range(n_planes):
        cond = cond | (F.col("bucket") == F.col("qbucket").bitwiseXOR(F.lit(1 << j)))
    scored = (
        with_bucket.join(F.broadcast(q), cond)
        .where(F.col("vec_id") != query_id)
        .select("vec_id", "bucket", cosine("v", "qv").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), "vec_id").limit(k)


def class_prototypes(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
) -> DataFrame:
    """Embedding-space health check → ``(label_a, label_b, cos)`` for
    every unordered label pair: cosine between the CLASS PROTOTYPES
    (per-label centroid vectors). Collapsed prototypes (cos → 1) mean
    the embedding can't separate those classes — the report to read
    before trusting label-conditioned retrieval or hard-negative mining
    (q151) on a space.

    Exactness: centroids come from 2^-40-quantized per-dim integer sums
    (order-free, DECIMAL(38,0) — q134's machinery) divided once; the
    pair cosine is a sequential fold. |labels| centroids → the pair join
    is |L|²/2 rows of 64 floats — broadcast scale regardless of corpus
    size; the corpus itself is touched by ONE posexplode + hash agg."""
    ex = emb.select(
        F.col(label_col).alias("lbl"), F.posexplode(vec_col).alias("p", "x")
    ).select(
        "lbl",
        F.col("p").alias("d"),
        F.round(F.col("x").cast("double") * F.lit(float(MOMENT_SCALE)))
        .cast("bigint")
        .alias("v"),
    )
    cent = ex.groupBy("lbl", "d").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s"),
    )
    mean = (
        F.col("s").cast("double") / F.lit(float(MOMENT_SCALE)) / F.col("n").cast("double")
    )
    arrs = (
        cent.select("lbl", "d", mean.alias("m"))
        .groupBy("lbl")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "m"))), lambda t: t["m"]
            ).alias("c")
        )
    )
    a = arrs.select(F.col("lbl").alias("label_a"), F.col("c").alias("ca"))
    b = arrs.select(F.col("lbl").alias("label_b"), F.col("c").alias("cb"))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select("label_a", "label_b", cosine("ca", "cb").alias("cos"))
    )


#: PQ integer grid: embeddings are quantized to round(x * 2^20) before any
#: distance math, so every sub-distance and ADC total is an EXACT bigint —
#: order-independent sums, bit-identical across engines (CLAUDE.md rule 8;
#: |x| < 1 ⇒ scaled < 2^21, squared < 2^42, and a 64-dim total < 2^48 —
#: far inside int64).
PQ_SCALE = 1 << 20


def _pq_dims(dim: int, n_sub: int) -> int:
    """Validate the subspace split — a non-dividing dim would SILENTLY
    drop the trailing ``dim % n_sub`` coordinates from every distance
    (review r7); loud beats truncated."""
    if n_sub <= 0 or dim % n_sub != 0:
        raise ValueError(
            f"pq: dim={dim} must split evenly into n_sub={n_sub} subspaces "
            f"({0 if n_sub <= 0 else dim % n_sub} trailing dimensions would "
            "be silently dropped from every distance)"
        )
    return dim // n_sub


def _pq_scaled_subvectors(
    emb: DataFrame, n_sub: int, d_sub: int, id_col: str, vec_col: str
) -> DataFrame:
    """(vec_id, m, sv): each vector cut into ``n_sub`` contiguous
    sub-vectors of ``d_sub`` dims, every coordinate on the PQ integer
    grid. One map-only pass; the n_sub-way explode is the PQ fan-out.
    A vector whose ACTUAL length differs from n_sub*d_sub raises at scan
    time — a silent mismatch would either drop trailing coordinates or
    yield NULL distances with nondeterministic argmins (review r7)."""
    total = n_sub * d_sub
    return (
        spread(emb)
        .select(F.col(id_col).alias("vec_id"), _grid(vec_col).alias("iv"))
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
            F.col("iv"),
        )
        .select(
            "vec_id",
            "m",
            F.expr(
                f"CASE WHEN size(iv) = {total} "
                f"THEN slice(iv, m * {d_sub} + 1, {d_sub}) "
                f"ELSE raise_error('pq: vector length ' || size(iv) || "
                f"' != expected dim {total}') END"
            ).alias("sv"),
        )
    )


def _pq_sqdist(a: str, b: str) -> Column:
    """Exact integer squared L2 between two grid sub-vectors."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def pq_codebooks(
    emb: DataFrame,
    n_sub: int = 8,
    ks: int = 16,
    n_iters: int = 5,
    train_sample: int = 1024,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace k-means codebooks for PQ (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search") — driver-side on
    the same bounded lowest-id sample rule as :func:`kmeans_codebook`
    (train offline on O(train_sample), encode at scale). Deterministic:
    first-``ks`` init, fixed iterations, L2 assignment with lowest-code
    tie-break. → ``codebooks[m][c]`` = centroid c of subspace m."""
    import numpy as np

    d_sub = _pq_dims(dim, n_sub)
    sample = emb.orderBy(id_col).limit(train_sample).select(vec_col).collect()
    x = np.asarray([list(r[0]) for r in sample], dtype=np.float64)
    if len(x) < ks:
        # loud beats silently training a truncated codebook (matches _pq_dims)
        raise ValueError(
            f"pq_codebooks: training sample has {len(x)} vectors but ks={ks} "
            f"centroids per subspace were requested; provide >= ks vectors"
        )
    out = []
    for m in range(n_sub):
        xs = x[:, m * d_sub : (m + 1) * d_sub]
        cents = xs[:ks].copy()
        for _ in range(n_iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # first (lowest) min index
            for c in range(ks):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        out.append([[float(v) for v in row] for row in cents])
    return out


def _pq_codebook_frame(
    emb: DataFrame,
    n_sub: int,
    ks: int,
    d_sub: int,
    codebooks: list[list[list[float]]] | None,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(m, c, cv) grid-quantized codebook frame: an explicit trained
    codebook when given, else the deterministic stand-in — sub-vectors of
    the first ``ks`` vectors (the oracle-checked form, like
    :func:`_centroids`; centroids land on the SAME integer grid as the
    data so either path is exact)."""
    if codebooks is not None:
        spark = emb.sparkSession
        rows = [
            (m, c, [float(v) for v in cb])
            for m, book in enumerate(codebooks)
            for c, cb in enumerate(book)
        ]
        raw = spark.createDataFrame(rows, "m BIGINT, c BIGINT, cvf ARRAY<DOUBLE>")
        return raw.select("m", "c", _grid("cvf").alias("cv"))
    return _pq_scaled_subvectors(
        emb.where(F.col(id_col) < ks), n_sub, d_sub, id_col, vec_col
    ).select("m", F.col("vec_id").alias("c"), F.col("sv").alias("cv"))


def pq_codes(
    emb: DataFrame,
    n_sub: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ encoding → ``(vec_id, m, code, qerr)``: each vector's subspace
    ``m`` mapped to its nearest codebook centroid (exact integer L2,
    ties → lowest code) with the residual squared error. ``n_sub`` codes
    of ``log2(ks)`` bits replace ``dim`` floats — 32 B → 8 B per vector
    at the defaults; the 100 TB corpus stores only codes + one tiny
    codebook broadcast.

    Shape: n_sub-way explode (map-only), broadcast codebook join
    (n_sub·ks rows), then ONE partial-aggregating groupBy argmin via
    min(struct) — no window, no extra shuffle beyond the (vec_id, m)
    hash agg."""
    d_sub = _pq_dims(dim, n_sub)
    sub = _pq_scaled_subvectors(emb, n_sub, d_sub, id_col, vec_col)
    cb = _pq_codebook_frame(emb, n_sub, ks, d_sub, codebooks, id_col, vec_col)
    scored = sub.join(F.broadcast(cb), "m").select(
        "vec_id", "m", _pq_sqdist("sv", "cv").alias("dist"), "c"
    )
    best = scored.groupBy("vec_id", "m").agg(
        F.min(F.struct("dist", "c")).alias("_b")
    )
    return best.select(
        "vec_id",
        "m",
        F.col("_b.c").alias("code"),
        F.col("_b.dist").alias("qerr"),
    )


def pq_adc_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_sub: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """E3 PQ asymmetric-distance top-k (ADC): approximate the query→vector
    squared L2 as the sum over subspaces of the EXACT distance from the
    query's sub-vector to the vector's assigned centroid, looked up from
    an ``n_sub × ks`` table computed once per query.

    → ``(vec_id, adist)``, ascending (nearest first), exact bigints.
    This is the memory-bound ANN regime PQ exists for: the scan side
    touches only the n_sub-byte codes, never the raw vectors — at 100 TB
    the codes table is ~1/32 the corpus and the per-row work is n_sub
    integer adds. Trained ``codebooks`` (:func:`pq_codebooks`) tighten
    cells; recall vs brute force is pinned by test, the stand-in form by
    the q201 oracle. Pass a shared persisted ``codes=`` frame
    (queries_ext._pqc caches one per session/sf — the _sh/_wb pattern)
    when several queries read the same encoding."""
    d_sub = _pq_dims(dim, n_sub)
    if codes is None:
        codes = pq_codes(emb, n_sub, ks, dim, id_col, vec_col, codebooks)
    qsub = _pq_scaled_subvectors(
        emb.where(F.col(id_col) == query_id), n_sub, d_sub, id_col, vec_col
    ).select("m", F.col("sv").alias("qv"))
    cb = _pq_codebook_frame(emb, n_sub, ks, d_sub, codebooks, id_col, vec_col)
    table = cb.join(F.broadcast(qsub), "m").select(
        "m", F.col("c").alias("code"), _pq_sqdist("cv", "qv").alias("qd")
    )
    return (
        codes.where(F.col("vec_id") != query_id)
        .join(F.broadcast(table), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.sum("qd").cast("bigint").alias("adist"))
        .orderBy("adist", "vec_id")
        .limit(k)
    )


def pq_rerank_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    shortlist: int = 40,
    n_sub: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ ADC shortlist + exact rerank — the standard two-stage production
    shape: the codes-only ADC scan picks ``shortlist`` candidates, then
    ONLY those rows' full vectors are fetched and scored exactly (cosine).
    → ``(vec_id, score)`` descending. Quantization error now only costs
    recall when a true neighbour falls outside the shortlist, so recall
    climbs with ``shortlist`` at fixed code size; the full-vector reads
    stay O(shortlist) regardless of corpus size."""
    short = pq_adc_topk(
        emb, query_id, shortlist, n_sub, ks, dim, id_col, vec_col, codebooks, codes
    ).select("vec_id")
    qv = emb.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    return (
        spread(emb)
        .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
        .join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qv))
        .select("vec_id", cosine("v", "qv").alias("score"))
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(k)
    )


def materialize_ivfpq(
    emb: DataFrame,
    out_dir: str,
    n_cells: int = 8,
    n_sub: int = 8,
    ks: int = 16,
    dim: int = 64,
    codebook: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF+PQ index (the faiss IVFPQ layout): ``codes/``
    holds each vector's n_sub PQ codes PARTITIONED BY its coarse cell id
    — a probe reads nprobe cell directories of n_sub-byte codes, never a
    raw vector — plus the two tiny codebooks (``codebook/`` coarse
    centroids, ``pq_codebook/`` grid-int sub-centroids). One assignment
    pass + one encode pass over the corpus; the partitioning is the
    coarse index and the codes are the 32x-compressed payload.

    Codes quantize the RAW vectors (sharing q201's codebook form and
    oracle); classical residual encoding (PQ on x - centroid) is the
    accuracy refinement a production build would add — same plan shape,
    one extra zip_with before encoding."""
    import os

    assigned = ivf_assignments(
        emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col, codebook=codebook
    ).select("vec_id", "cid")
    codes = pq_codes(emb, n_sub, ks, dim, id_col, vec_col, codebooks)
    joined = codes.join(assigned, "vec_id").select("vec_id", "m", "code", "cid")
    # refuse a zero-row dynamic-partitioned write (CLAUDE.md rule 13)
    if joined.isEmpty():
        raise ValueError("materialize_ivfpq: no vectors to index")
    joined.repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(out_dir, "codes")
    )
    _centroids(emb, n_cells, codebook, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "codebook"))
    _pq_codebook_frame(
        emb, n_sub, ks, _pq_dims(dim, n_sub), codebooks, id_col, vec_col
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "pq_codebook"))


def ivfpq_store_topk(
    spark,
    store_dir: str,
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    nprobe: int = 2,
    n_sub: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k over the PERSISTED IVF+PQ layout → ``(vec_id, cid,
    adist)`` ascending: pick the ``nprobe`` cells nearest the query
    (tiny codebook scan, same fold as :func:`ivf_store_topk`), read ONLY
    those cell directories of the codes table (partition pruning via a
    literal isin — a metadata-sized driver decision), and rank by the
    exact-integer ADC sum from an n_sub x ks lookup table. The query's
    raw vector comes from ``emb`` (the store holds no vectors — that is
    the point of PQ)."""
    import os

    codes_path = os.path.join(store_dir, "codes")
    cents = spark.read.parquet(os.path.join(store_dir, "codebook"))
    pqcb = spark.read.parquet(os.path.join(store_dir, "pq_codebook"))
    qv_df = emb.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    probe = _probe_cells(cents, qv_df, nprobe)
    cids = [int(r.cid) for r in probe.collect()]
    pruned = (
        spark.read.option("basePath", codes_path)
        .parquet(codes_path)
        .where(F.col("cid").isin(cids))
    )
    qsub = _pq_scaled_subvectors(
        emb.where(F.col(id_col) == query_id), n_sub, _pq_dims(dim, n_sub), id_col, vec_col
    ).select("m", F.col("sv").alias("qsv"))
    table = pqcb.join(F.broadcast(qsub), "m").select(
        "m", F.col("c").alias("code"), _pq_sqdist("cv", "qsv").alias("qd")
    )
    return (
        pruned.where(F.col("vec_id") != query_id)
        .join(F.broadcast(table), ["m", "code"])
        .groupBy("vec_id")
        .agg(
            F.max("cid").cast("bigint").alias("cid"),
            F.sum("qd").cast("bigint").alias("adist"),
        )
        .orderBy("adist", "vec_id")
        .limit(k)
    )


def _grid(col: Column | str) -> Column:
    """PQ integer grid quantization of a float vector column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.round(x.cast("double") * F.lit(float(PQ_SCALE))).cast("bigint")
    )


def ivfpq_residual_adc_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 8,
    n_sub: int = 8,
    ks: int = 16,
    dim: int = 64,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """Classical RESIDUAL IVF+PQ (the faiss IVFPQ encoding proper): PQ
    quantizes ``x - centroid(cell(x))`` instead of the raw vector, so
    codes only need to span the within-cell spread — the accuracy
    refinement over :func:`pq_adc_topk`'s raw-vector codes at identical
    code size. ADC becomes per-cell: the query gets ONE n_sub x ks lookup
    table per probed cell (its residual differs per cell), nprobe tables
    total — still metadata-sized.

    Everything stays on the PQ integer grid (residual = grid(x) -
    grid(centroid), exact bigints end-to-end) and the stand-in codebook
    is the residual of the first ``ks`` vectors, so the full chain is
    oracle-checkable. → ``(vec_id, cid, adist)`` ascending."""
    d_sub = _pq_dims(dim, n_sub)
    # (vec_id, cid) coarse assignment + grid residual sub-vectors
    assigned = ivf_assignments(
        emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col, codebook=codebook
    )
    cents = _centroids(emb, n_cells, codebook, id_col, vec_col)
    resid = assigned.join(F.broadcast(cents), "cid").select(
        "vec_id",
        "cid",
        F.zip_with(_grid("v"), _grid("cv"), lambda a, b: a - b).alias("rv"),
    )
    rsub = resid.select(
        "vec_id",
        "cid",
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
        F.col("rv"),
    ).select(
        "vec_id", "cid", "m", F.expr(f"slice(rv, m * {d_sub} + 1, {d_sub})").alias("sv")
    )
    rsub = persist_tracked(rsub)
    # stand-in residual codebook: residual sub-vectors of the first ks ids
    cb = rsub.where(F.col("vec_id") < ks).select(
        "m", F.col("vec_id").alias("c"), F.col("sv").alias("cv")
    )
    # probe cells nearest the query (same fold as ivf_topk)
    qv_df = emb.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    probe = _probe_cells(cents, qv_df, nprobe).select(
        F.col("cid").alias("pcid")
    )
    # Only codes inside the nprobe probed cells survive the final ADC
    # join, so pre-filter the corpus side BEFORE the ks-way
    # code-assignment join (nprobe/n_cells of the work at identical
    # output) — the codebook above still derives from ALL cells'
    # residuals, exactly as before.
    rsub_p = rsub.join(
        F.broadcast(probe.withColumnRenamed("pcid", "cid")), "cid", "left_semi"
    )
    scored = rsub_p.join(F.broadcast(cb), "m").select(
        "vec_id", "cid", "m", _pq_sqdist("sv", "cv").alias("dist"), "c"
    )
    codes = (
        scored.groupBy("vec_id", "cid", "m")
        .agg(F.min(F.struct("dist", "c")).alias("_b"))
        .select("vec_id", "cid", "m", F.col("_b.c").alias("code"))
    )
    # one ADC table PER PROBED CELL: the query's residual against that cell
    qres = (
        cents.join(F.broadcast(probe), F.col("cid") == F.col("pcid"))
        .join(F.broadcast(qv_df))
        .select(
            "pcid",
            F.zip_with(_grid("qv"), _grid("cv"), lambda a, b: a - b).alias("qrv"),
        )
    )
    qsub = qres.select(
        "pcid",
        F.explode(F.sequence(F.lit(0), F.lit(n_sub - 1))).alias("m"),
        F.col("qrv"),
    ).select(
        "pcid", "m", F.expr(f"slice(qrv, m * {d_sub} + 1, {d_sub})").alias("qsv")
    )
    table = cb.join(F.broadcast(qsub), "m").select(
        F.col("pcid"),
        F.col("m").alias("tm"),
        F.col("c").alias("tcode"),
        _pq_sqdist("cv", "qsv").alias("qd"),
    )
    return (
        codes.where(F.col("vec_id") != query_id)
        .join(
            F.broadcast(table),
            (F.col("cid") == F.col("pcid"))
            & (F.col("m") == F.col("tm"))
            & (F.col("code") == F.col("tcode")),
        )
        .groupBy("vec_id")
        .agg(
            F.max("cid").cast("bigint").alias("cid"),
            F.sum("qd").cast("bigint").alias("adist"),
        )
        .orderBy("adist", "vec_id")
        .limit(k)
    )


def pq_adc_batch_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_sub: int = 8,
    ks: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """BATCHED PQ ADC — many queries against the codes table in ONE plan
    (the retrieval-serving / hard-negative-mining shape: per-query jobs
    would pay a scan each; the batch pays one). ``queries`` is any
    ``(vec_id, embedding)`` frame; → ``(qid, vec_id, adist, rn)`` with
    ``rn`` the 1-based rank (ties → lowest vec_id), ``rn <= k`` rows per
    query, self-matches excluded.

    Shape: the lookup tables for ALL queries form one
    |Q|·n_sub·ks-row broadcast; the codes scan joins it once and a
    (qid)-partitioned window ranks — so the corpus-sized side is still
    touched exactly once regardless of |Q|. At 100 TB batch queries in
    groups sized so |Q|·n_sub·ks stays broadcastable (a few thousand
    queries per wave at the defaults)."""
    d_sub = _pq_dims(dim, n_sub)
    if codes is None:
        codes = pq_codes(emb, n_sub, ks, dim, id_col, vec_col, codebooks)
    qsub = _pq_scaled_subvectors(queries, n_sub, d_sub, id_col, vec_col).select(
        F.col("vec_id").alias("qid"), "m", F.col("sv").alias("qsv")
    )
    cb = _pq_codebook_frame(emb, n_sub, ks, d_sub, codebooks, id_col, vec_col)
    table = cb.join(F.broadcast(qsub), "m").select(
        "qid", "m", F.col("c").alias("code"), _pq_sqdist("cv", "qsv").alias("qd")
    )
    from pyspark.sql import Window

    scored = (
        codes.join(F.broadcast(table), ["m", "code"])
        .where(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("qd").cast("bigint").alias("adist"))
    )
    w = Window.partitionBy("qid").orderBy("adist", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
        .select("qid", "vec_id", "adist", "rn")
    )


def cell_distortion(
    emb: DataFrame,
    n_cells: int = 8,
    codebook: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 20,
) -> DataFrame:
    """Per-cell quantization distortion of the IVF coarse codebook →
    ``(cid, n_vecs, avg_sse, max_sse_fp)`` — the codebook-retrain
    trigger: a cell whose average squared reconstruction error creeps up
    (data drifted away from its centroid) or whose population skews is
    where recall degrades first; production ANN deployments watch exactly
    this before re-running kmeans.

    Exactness (CLAUDE.md rule 8 pattern): each vector's SSE to its
    centroid is a sequential fp fold (deterministic, rule 3), then scaled
    by 2^scale_bits with round() — an exact exponent-shift multiply with
    identical half-away-from-zero rounding in both engines — and summed
    as DECIMAL(38,0) (order-free). The average divides back by the same
    power of two (exact) and by n (one IEEE division).

    Shape: broadcast codebook, one narrow assignment pass (argmax
    window per vector), one n_cells-row groupBy — at 100 TB this is a
    map-side-partial aggregation keyed by the table's own partition key.
    """
    cents = _centroids(emb, n_cells, codebook, id_col, vec_col)
    assigned = ivf_assignments(
        emb, n_cells, id_col=id_col, vec_col=vec_col, codebook=codebook
    )
    sq = F.aggregate(
        F.zip_with(
            "v",
            "cv",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    scale = float(1 << scale_bits)
    return (
        assigned.join(F.broadcast(cents), "cid")
        .withColumn("_sse_fp", F.round(sq * F.lit(scale)).cast("decimal(38,0)"))
        .groupBy(F.col("cid").cast("bigint").alias("cid"))
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum("_sse_fp").alias("_sum"),
            F.max("_sse_fp").cast("bigint").alias("max_sse_fp"),
        )
        .select(
            "cid",
            "n_vecs",
            (
                F.col("_sum").cast("double")
                / F.lit(scale)
                / F.col("n_vecs").cast("double")
            ).alias("avg_sse"),
            "max_sse_fp",
        )
    )


def mmr_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    shortlist_n: int = 16,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k → ``(rank, vec_id,
    rel, max_sim, mmr)``: greedily pick ``k`` results from the cosine
    top-``shortlist_n`` shortlist, each round maximizing ``lam·rel −
    (1−lam)·max_sim_to_already_picked`` (ties → lowest id). The
    diversified-retrieval primitive: a near-dup-heavy corpus floods a
    plain top-k with one duplicate family; MMR's redundancy penalty
    surfaces distinct items — the same selection rule used to pick
    DIVERSE training examples from a candidate pool.

    Shape: relevance scan is the only corpus-sized pass (broadcast query
    → narrow cosine → TakeOrdered shortlist); the greedy rounds run on
    the persisted shortlist_n-row frame (bounded, broadcast-joined), one
    tiny round per pick — the standard rerank-after-retrieve split, so
    corpus scale never touches the quadratic part. First pick = highest
    relevance (its max_sim is 0 by convention). All doubles come from
    sequential folds and fixed-bracket arithmetic (lam exactly binary) —
    deterministic cross-engine."""
    from tagtree_spark.session import persist_tracked

    q = emb.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    sl = persist_tracked(
        spread(emb)
        .where(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            cosine(vec_col, "qv").alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(shortlist_n)
    )
    picked = sl.orderBy(F.col("rel").desc(), "vec_id").limit(1).select(
        F.lit(1).cast("bigint").alias("rank"),
        "vec_id",
        "v",
        "rel",
        F.lit(0.0).alias("max_sim"),
        (F.lit(lam) * F.col("rel")).alias("mmr"),
    )
    out = picked
    for r in range(2, k + 1):
        sel = out.select("vec_id", F.col("v").alias("sv"))
        cand = sl.join(sel.select("vec_id"), "vec_id", "left_anti")
        nxt = (
            cand.join(F.broadcast(sel.select(F.col("sv"))))
            .select("vec_id", "v", "rel", cosine("v", "sv").alias("_s"))
            .groupBy("vec_id")
            .agg(
                F.first("v", ignorenulls=True).alias("v"),
                F.first("rel", ignorenulls=True).alias("rel"),
                F.max("_s").alias("max_sim"),
            )
            .select(
                F.lit(r).cast("bigint").alias("rank"),
                "vec_id",
                "v",
                "rel",
                "max_sim",
                (
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("max_sim")
                ).alias("mmr"),
            )
            .orderBy(F.col("mmr").desc(), "vec_id")
            .limit(1)
        )
        # lineage cut per round (kcore/pagerank pattern): without it each
        # round re-executes every previous round's one-row pick subtree
        out = out.unionByName(nxt).localCheckpoint(eager=False)
    return out.select("rank", "vec_id", "rel", "max_sim", "mmr")


def bucket_store_topk(spark, store_dir: str, query_id: int, k: int = 5) -> DataFrame:
    """ANN top-k over the PERSISTED hyperplane-LSH bucket table — the
    versioned, bucket-PARTITIONED twin of :func:`bucketed_embeddings`
    (VERDICT r10 #4, the third cache→table migration after the shingle
    and CC stores): resolve the committed version, read the query's
    bucket id (one bounded row, the control-plane read class), then scan
    ONLY that bucket's partition directory — PartitionFilters pinned in
    test_plans. Same cosine fold as :func:`lsh_bucket_topk`, so scores
    are bit-identical to the in-memory path and q33's oracle."""
    from tagtree_spark.tsdb.store import versioned_read

    t = versioned_read(spark, store_dir)
    qb = int(
        t.where(F.col("vec_id") == query_id).select("bucket").collect()[0][0]
    )
    qv_df = t.where(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    pruned = t.where(F.col("bucket") == qb).where(F.col("vec_id") != query_id)
    return (
        pruned.join(F.broadcast(qv_df))
        .select(
            "vec_id",
            F.col("bucket").cast("bigint").alias("bucket"),
            cosine("v", "qv").alias("score"),
        )
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(k)
    )
