"""Streaming near-duplicate detection — the online form of MinHash+LSH
dedup: each micro-batch of documents is checked against the ACCUMULATED
corpus signature store, then its own signatures join the store.

This is the capability a crawl-ingest pipeline actually needs (batch
near-dup assumes the corpus is at rest): "is this incoming document a
near-dup of ANYTHING seen so far?" — answered per batch with bounded
work:

  * the store holds one row per seen document: ``(doc_id, sig, band)``
    exploded band keys — O(n_docs × n_bands) rows, partitionable by band;
  * a batch computes its own signatures (narrow), then ONE band-key join
    against the store (at scale: the store is bucketed by band, so the
    join is co-located) + signature verification — never a corpus scan;
  * flagged pairs land in a results segment; the batch's signatures are
    APPENDED to the store (O(batch) write, same segment protocol as
    ingest: overwrite-by-batch-id = idempotent replay).

Within-batch duplicates are also caught (the batch joins store ∪ itself).
"""

from __future__ import annotations

import os

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
from tagtree_spark.streaming.ingest import _list_segments


def batch_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig, band) — one row per band key per doc (narrow)."""
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
        "doc_id", "sig", F.explode(lsh_band_keys("sig", N_BANDS, ROWS_PER_BAND)).alias("band")
    )


def read_signature_store(
    spark: SparkSession, store_path: str, before_batch: int | None = None
) -> DataFrame | None:
    segs = _list_segments(store_path, before_batch)
    if not segs:
        return None
    return spark.read.parquet(*segs)


class NearDupSink:
    """foreachBatch sink: flag near-dups of the accumulated corpus, then
    absorb the batch. ``matches_path`` receives one segment per batch with
    ``(new_doc, seen_doc, n_match)`` (seen_doc < new_doc for within-batch
    hits, seen_doc from an earlier batch otherwise)."""

    def __init__(self, store_path: str, matches_path: str, min_match: int = 6):
        self.store_path = store_path
        self.matches_path = matches_path
        self.min_match = min_match

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_signatures(batch_df).persist()
        batch.count()
        seen = read_signature_store(spark, self.store_path, before_batch=batch_id)
        # candidates sharing a band key: against the store ANY id order
        # counts (an earlier doc may carry a higher id); within the batch
        # the lower id is the "seen" side (each pair reported once)
        if seen is not None:
            prev_side = seen.select(
                F.col("doc_id").alias("seen_doc"),
                F.col("sig").alias("sig_b"),
                "band",
                F.lit(False).alias("_in_batch"),
            ).unionByName(
                batch.select(
                    F.col("doc_id").alias("seen_doc"),
                    F.col("sig").alias("sig_b"),
                    "band",
                    F.lit(True).alias("_in_batch"),
                )
            )
        else:
            prev_side = batch.select(
                F.col("doc_id").alias("seen_doc"),
                F.col("sig").alias("sig_b"),
                "band",
                F.lit(True).alias("_in_batch"),
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
        batch.select("doc_id", "sig", "band").write.mode("overwrite").parquet(
            os.path.join(self.store_path, f"seg-{batch_id:010d}-delta")
        )
        batch.unpersist()


def read_matches(spark: SparkSession, matches_path: str) -> DataFrame | None:
    segs = _list_segments(matches_path)
    if not segs:
        return None
    return spark.read.parquet(*segs)
