"""Streaming ANN-index maintenance — incremental build of the persisted
IVF+PQ index (operators/similarity.py materialize_ivfpq) from a vector
micro-batch stream: each batch is coarse-assigned and PQ-encoded against
the FIXED offline-trained codebooks and appended as a cid-partitioned
codes segment; the live index is the union of segments and answers ADC
probes identically to the batch-built store.

This is the "insert into the vector index" path of a production pipeline:
codebooks are trained once offline (pq_codebooks / kmeans_codebook — the
standard contract: re-training online would silently re-shuffle every
existing code), the per-batch work is one broadcast-join encode of O(batch)
rows, and replay is idempotent by segment naming (overwrite-by-batch-id).
Compaction folds code segments into one cid-partitioned base so a probe's
partition pruning touches nprobe directories, not nprobe x n_batches.

Stream == batch proof: test_streaming_ann asserts the streamed store's
codes and its ADC top-k equal materialize_ivfpq / pq_adc_topk on the same
corpus with the same codebooks, bit-for-bit (everything on the PQ integer
grid).
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.operators.similarity import (
    _centroids,
    _pq_codebook_frame,
    _pq_dims,
    _pq_scaled_subvectors,
    _pq_sqdist,
    _probe_cells,
    ivf_assignments,
    pq_codes,
)
from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment


def _emb_key(vec_col: str) -> F.Column:
    """Content hash of an embedding used as the deterministic intra-batch
    dedup tiebreak. to_json renders null array elements EXPLICITLY, so two
    embeddings differing only in a null element's position hash
    differently — a concat_ws encoding silently dropped nulls, collided
    such vectors, and made the max_by winner nondeterministic across
    replays, breaking segment-overwrite idempotence (ADVICE r8)."""
    return F.xxhash64(F.to_json(F.struct(F.col(vec_col).alias("v"))))


class AnnIndexSink:
    """foreachBatch sink appending PQ codes segments to an IVF+PQ store.

    ``codebook`` (coarse centroids) and ``codebooks`` (per-subspace PQ
    centroids) are REQUIRED: an online index must encode every batch
    against the same frozen codebooks or earlier codes become garbage.
    Both are persisted under the store on first call so the read path is
    self-contained."""

    def __init__(
        self,
        store_path: str,
        codebook: list[list[float]],
        codebooks: list[list[list[float]]],
        n_sub: int = 8,
        ks: int = 16,
        dim: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        compact_every: int | None = 8,
    ):
        if codebook is None or codebooks is None:
            raise ValueError(
                "AnnIndexSink requires frozen offline-trained codebook= and "
                "codebooks= (online re-training would invalidate existing codes)"
            )
        self.store_path = store_path
        self.codebook = codebook
        self.codebooks = codebooks
        self.n_cells = len(codebook)
        self.n_sub = n_sub
        self.ks = ks
        self.dim = dim
        self.id_col = id_col
        self.vec_col = vec_col
        self.compact_every = compact_every

    def _ensure_codebooks(self, spark: SparkSession, like: DataFrame) -> None:
        cb_path = os.path.join(self.store_path, "codebook")
        if not _complete(cb_path):
            _centroids(
                like, self.n_cells, self.codebook, self.id_col, self.vec_col
            ).write.mode("overwrite").parquet(cb_path)
        pq_path = os.path.join(self.store_path, "pq_codebook")
        if not _complete(pq_path):
            _pq_codebook_frame(
                like,
                self.n_sub,
                self.ks,
                _pq_dims(self.dim, self.n_sub),
                self.codebooks,
                self.id_col,
                self.vec_col,
            ).write.mode("overwrite").parquet(pq_path)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # One row per vector per batch: a duplicate vec_id inside a single
        # micro-batch would otherwise BLEND — pq_codes' groupBy(vec_id, m)
        # argmin picks per-subspace codes across both embeddings, encoding
        # neither (review r7). Deterministic winner: the embedding whose
        # 60-bit content hash is greatest (no intra-batch ordering exists).
        batch_df = (
            batch_df.select(self.id_col, self.vec_col)
            .withColumn("_embkey", _emb_key(self.vec_col))
            .groupBy(self.id_col)
            .agg(F.max_by(F.col(self.vec_col), F.col("_embkey")).alias(self.vec_col))
        )
        self._ensure_codebooks(spark, batch_df)
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_codes(spark, self.store_path, batch_id)
        assigned = ivf_assignments(
            batch_df,
            n_cells=self.n_cells,
            id_col=self.id_col,
            vec_col=self.vec_col,
            codebook=self.codebook,
        ).select("vec_id", "cid")
        codes = (
            pq_codes(
                batch_df,
                self.n_sub,
                self.ks,
                self.dim,
                self.id_col,
                self.vec_col,
                self.codebooks,
            )
            .join(assigned, "vec_id")
            .select(
                "vec_id",
                "m",
                "code",
                F.lit(batch_id).cast("bigint").alias("batch_id"),
                "cid",
            )
        )
        codes = codes.persist()
        # a zero-row cid-partitioned delta would leave a dataless segment
        # that poisons later reads (CLAUDE.md rule 13); an absent segment
        # is the replay-idempotent equivalent
        if codes.count() == 0:
            codes.unpersist()
            return
        codes.write.mode("overwrite").partitionBy("cid").parquet(
            os.path.join(self.store_path, f"seg-{batch_id:010d}-delta")
        )
        codes.unpersist()


def read_codes(
    spark: SparkSession,
    store_path: str,
    before_batch: int | None = None,
    cids: list[int] | None = None,
) -> DataFrame | None:
    """Union of completed code segments (each a cid-partitioned parquet
    root); a ``cids`` filter prunes partition directories per segment.

    Cost note: with >1 segment every call pays a latest-wins groupBy over
    the (vec_id, batch_id) columns of the FULL segment union — probe cost
    grows with store history between compactions (review r7). Compaction
    collapses history so the common post-compaction case is ONE segment,
    where the dedup is skipped entirely and a probe is a pure pruned scan:
    a single delta holds one deduped batch (sink dedupes per batch) and a
    single base is already latest-wins-merged."""
    segs = _list_segments(store_path, before_batch)
    if not segs:
        return None
    parts = [
        spark.read.option("basePath", seg)
        .parquet(seg)
        .select("vec_id", "m", "code", "batch_id", "cid")
        for seg in segs
    ]
    out = reduce(lambda a, b: a.unionByName(b), parts)
    if len(segs) == 1:
        if cids is not None:
            out = out.where(F.col("cid").isin([int(c) for c in cids]))
        return out
    # UPSERT semantics: a vector re-ingested in a later batch (re-embedded,
    # duplicate delivery) must contribute only its LATEST encoding — a
    # plain union would hand ADC both code sets and the per-vector sum
    # would silently double (review r7). Latest-wins per vec_id, computed
    # over ALL cells BEFORE any cid pruning: a re-embedded vector can move
    # cells, and deduping only the probed subset would resurrect its stale
    # encoding. The global pass reads just two slim columns (column
    # pruning); the probed cells' full code rows are the only wide read,
    # and compaction collapses history so the lookup stays segment-sized.
    latest = out.groupBy("vec_id").agg(F.max("batch_id").alias("batch_id"))
    if cids is not None:
        out = out.where(F.col("cid").isin([int(c) for c in cids]))
    return out.join(latest, ["vec_id", "batch_id"])


def compact_codes(spark: SparkSession, store_path: str, before_batch: int) -> None:
    """Fold code segments < before_batch into one cid-partitioned base.
    The merge reads through read_codes, so superseded encodings of
    re-ingested vectors are DROPPED here — compaction is re-layout plus
    history collapse (latest-wins), with the same crash-safe
    base-then-delete order as the sibling sinks."""
    import glob as _glob
    import shutil as _shutil

    base = os.path.join(store_path, f"seg-{before_batch - 1:010d}-base")
    if not _complete(base):
        if len(_list_segments(store_path, before_batch)) <= 1:
            return
        merged = read_codes(spark, store_path, before_batch=before_batch)
        if merged is None or merged.isEmpty():
            return
        merged.repartition("cid").write.mode("overwrite").partitionBy("cid").parquet(
            base
        )
        if not _complete(base):
            return
    for d in _glob.glob(os.path.join(store_path, "seg-*")):
        if d == base:
            continue
        meta = _parse_segment(d)
        if meta is not None and meta[0] < before_batch:
            _shutil.rmtree(d, ignore_errors=True)


def ann_store_topk(
    spark: SparkSession,
    store_path: str,
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    nprobe: int = 2,
    n_sub: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over the STREAMED store → ``(vec_id, cid, adist)``
    ascending — the ivfpq_store_topk read path over segment-unioned codes:
    probe the nprobe cells nearest the query (tiny codebook scan), read
    only those cid partitions of each segment, rank by the exact-integer
    ADC sum. The query's raw vector comes from ``emb`` (the store holds
    codes only)."""
    cents = spark.read.parquet(os.path.join(store_path, "codebook"))
    pqcb = spark.read.parquet(os.path.join(store_path, "pq_codebook"))
    qv_df = emb.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    probe = _probe_cells(cents, qv_df, nprobe)
    cids = [int(r.cid) for r in probe.collect()]
    pruned = read_codes(spark, store_path, cids=cids)
    if pruned is None:
        raise ValueError(f"ann_store_topk: no code segments under {store_path!r}")
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
