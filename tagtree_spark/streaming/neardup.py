"""Streaming near-duplicate detection — the online form of MinHash+LSH
dedup: each micro-batch of documents is checked against the ACCUMULATED
corpus signature store, then its own signatures join the store.

This is the capability a crawl-ingest pipeline actually needs (batch
near-dup assumes the corpus is at rest): "is this incoming document a
near-dup of ANYTHING seen so far?" — answered per batch with bounded
work:

  * the store holds one row per seen document: ``(doc_id, sig, band)``
    exploded band keys, physically partitioned by ``band_pfx``
    (``band mod N_BAND_PARTS``) so a batch's store read prunes to the
    band partitions the batch actually touches;
  * a batch computes its own signatures (narrow), then ONE band-key join
    against the pruned store + signature verification — never a full
    corpus scan;
  * a degenerate hot band (constant boilerplate shared by everything)
    cannot pair every batch doc against the whole band: bands whose
    candidate population exceeds ``max_band`` are dropped, exactly the
    batch paths' ``MAX_BUCKET`` policy (operators/dedup.py:189-196),
    and the drop is COUNTED — a per-batch ``_hot_stats`` segment records
    (n_hot_bands, dropped_rows), the number a 100 TB pipeline alarms on
    (a rising count means the banding scheme is too coarse, not silent
    data loss);
  * flagged pairs land in a results segment; the batch's signatures are
    APPENDED to the store (O(batch) write, same segment protocol as
    ingest: overwrite-by-batch-id = idempotent replay — hot-band
    decisions replay deterministically because the store read excludes
    the batch's own and later segments).

Within-batch duplicates are also caught (the batch joins store ∪ itself).
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.operators.dedup import (
    MAX_BUCKET,
    N_BANDS,
    N_PERM,
    ROWS_PER_BAND,
    lsh_band_keys,
    minhash_signature,
    shingle_hashes,
    word_shingles,
)
from tagtree_spark.session import spread
from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment

#: Physical store partition fan-out. Bounded (one directory per value per
#: segment); pruning wins when a batch's bands touch a subset — small
#: batches and compacted stores skip most of the store's files.
N_BAND_PARTS = 64


def batch_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig, band, band_pfx) — one row per band key per doc (narrow)."""
    sigs = (
        word_shingles(
            spread(docs).where(F.size(F.split(F.col(text_col), " ")) >= 3),
            text_col=text_col,
        )
        .withColumn("hs", shingle_hashes("shingles"))
        .select(
            F.col(id_col).alias("doc_id"),
            minhash_signature("hs", n_perm=N_PERM).alias("sig"),
        )
    )
    return sigs.select(
        "doc_id",
        "sig",
        F.explode(lsh_band_keys("sig", N_BANDS, ROWS_PER_BAND)).alias("band"),
    ).withColumn("band_pfx", F.pmod(F.col("band"), F.lit(N_BAND_PARTS)))


def read_signature_store(
    spark: SparkSession,
    store_path: str,
    before_batch: int | None = None,
    band_pfx: list[int] | None = None,
) -> DataFrame | None:
    """Union of completed store segments. Each segment is its own
    partitioned parquet root (``seg-*/band_pfx=N/``), read with its own
    basePath so the partition column survives the multi-segment union;
    a ``band_pfx`` filter then prunes partition directories per segment
    (filters push through Union). Pre-partitioning segments are
    backfilled with a computed ``band_pfx``."""
    segs = _list_segments(store_path, before_batch)
    if not segs:
        return None
    parts = []
    for seg in segs:
        df = spark.read.option("basePath", seg).parquet(seg)
        if "band_pfx" not in df.columns:
            df = df.withColumn("band_pfx", F.pmod(F.col("band"), F.lit(N_BAND_PARTS)))
        parts.append(df.select("doc_id", "sig", "band", "band_pfx"))
    out = reduce(lambda a, b: a.unionByName(b), parts)
    if band_pfx is not None:
        out = out.where(F.col("band_pfx").isin([int(p) for p in band_pfx]))
    return out


def compact_store(spark: SparkSession, store_path: str, before_batch: int) -> None:
    """X1 for the signature store: fold segments with id < before_batch
    into one base, PRESERVING the band_pfx partitioning (the generic
    streaming.ingest.compact_segments would flatten it and lose the
    per-batch partition pruning). Same crash-safe order: complete base
    first, then delete shadowed segments; replays converge."""
    import glob as _glob
    import shutil as _shutil

    base = os.path.join(store_path, f"seg-{before_batch - 1:010d}-base")
    if not _complete(base):
        if len(_list_segments(store_path, before_batch)) <= 1:
            return
        merged = read_signature_store(spark, store_path, before_batch=before_batch)
        # zero-row dynamic-partitioned write would create a dataless base
        # segment that breaks every later read (ADVICE r4 high)
        if merged is None or merged.isEmpty():
            return
        merged.write.mode("overwrite").partitionBy("band_pfx").parquet(base)
        if not _complete(base):
            return
    for d in _glob.glob(os.path.join(store_path, "seg-*")):
        if d == base:
            continue
        meta = _parse_segment(d)
        if meta is not None and meta[0] < before_batch:
            _shutil.rmtree(d, ignore_errors=True)


class NearDupSink:
    """foreachBatch sink: flag near-dups of the accumulated corpus, then
    absorb the batch. ``matches_path`` receives one segment per batch with
    ``(new_doc, seen_doc, n_match)`` (seen_doc < new_doc for within-batch
    hits, seen_doc from an earlier batch otherwise). ``max_band`` caps the
    per-band candidate population (hot-band drop, counted in
    ``<store>/_hot_stats``); ``None`` disables the cap."""

    def __init__(
        self,
        store_path: str,
        matches_path: str,
        min_match: int = 6,
        max_band: int | None = MAX_BUCKET,
        compact_every: int | None = 8,
    ):
        self.store_path = store_path
        self.matches_path = matches_path
        self.min_match = min_match
        self.max_band = max_band
        self.compact_every = compact_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_store(spark, self.store_path, batch_id)
        batch = batch_signatures(batch_df).persist()
        # An all-filtered batch (every doc <3 words) yields ZERO signature
        # rows; a zero-row dynamic-partitioned write would leave a segment
        # with only _SUCCESS and no data files, which poisons every later
        # store read (UNABLE_TO_INFER_SCHEMA). An absent segment is the
        # replay-idempotent equivalent, so skip the batch entirely
        # (ADVICE r4 high).
        if batch.count() == 0:
            batch.unpersist()
            return
        # store read pruned to the band partitions this batch touches —
        # ≤ N_BAND_PARTS scalar values, a metadata-sized collect
        pfx = [r[0] for r in batch.select("band_pfx").distinct().collect()]
        seen = read_signature_store(
            spark, self.store_path, before_batch=batch_id, band_pfx=pfx
        )
        # candidates sharing a band key: against the store ANY id order
        # counts (an earlier doc may carry a higher id); within the batch
        # the lower id is the "seen" side (each pair reported once)
        prev_side = batch.select(
            F.col("doc_id").alias("seen_doc"),
            F.col("sig").alias("sig_b"),
            "band",
            F.lit(True).alias("_in_batch"),
        )
        if seen is not None:
            prev_side = prev_side.unionByName(
                seen.select(
                    F.col("doc_id").alias("seen_doc"),
                    F.col("sig").alias("sig_b"),
                    "band",
                    F.lit(False).alias("_in_batch"),
                )
            )
        # hot-band cap: band sizes via a band-only aggregate (column-pruned
        # scan, no sig arrays in the shuffle), hot set broadcast anti-joined
        # out of the candidate side before the wide band join
        if self.max_band is not None:
            sizes = prev_side.groupBy("band").agg(F.count("*").alias("_bn"))
            hot = sizes.where(F.col("_bn") > self.max_band).persist()
            stats = hot.agg(
                F.count("*").cast("bigint").alias("n_hot_bands"),
                F.coalesce(F.sum("_bn"), F.lit(0)).cast("bigint").alias("dropped_rows"),
            ).withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            stats.write.mode("overwrite").parquet(
                os.path.join(self.store_path, "_hot_stats", f"seg-{batch_id:010d}")
            )
            prev_side = prev_side.join(
                F.broadcast(hot.select("band")), "band", "left_anti"
            )
        cand = (
            batch.select(F.col("doc_id").alias("new_doc"), F.col("sig").alias("sig_a"), "band")
            .join(prev_side, "band")
            .where(
                (~F.col("_in_batch") & (F.col("seen_doc") != F.col("new_doc")))
                | (F.col("_in_batch") & (F.col("seen_doc") < F.col("new_doc")))
            )
            .drop("band", "_in_batch")
            .distinct()
        )
        n_match = F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        matches = (
            cand.select("new_doc", "seen_doc", n_match.cast("bigint").alias("n_match"))
            .where(F.col("n_match") >= self.min_match)
        )
        matches.write.mode("overwrite").parquet(
            os.path.join(self.matches_path, f"seg-{batch_id:010d}")
        )
        batch.select("doc_id", "sig", "band", "band_pfx").write.mode(
            "overwrite"
        ).partitionBy("band_pfx").parquet(
            os.path.join(self.store_path, f"seg-{batch_id:010d}-delta")
        )
        if self.max_band is not None:
            hot.unpersist()
        batch.unpersist()


def read_hot_stats(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Per-batch hot-band drop telemetry:
    ``(n_hot_bands, dropped_rows, batch_id)``."""
    segs = _list_segments(os.path.join(store_path, "_hot_stats"))
    if not segs:
        return None
    return spark.read.parquet(*segs)


def read_matches(spark: SparkSession, matches_path: str) -> DataFrame | None:
    segs = _list_segments(matches_path)
    if not segs:
        return None
    return spark.read.parquet(*segs)
