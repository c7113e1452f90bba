"""Streaming positional-postings index maintenance — the lexical twin of
streaming/ann.py: each document micro-batch is tokenized and appended as a
term-hash-partitioned postings segment plus a tiny per-doc version manifest;
the live index is the union of segments and answers phrase and BM25 queries
identically to the batch-built store (operators/text.materialize_postings).

This is the "insert into the search index" path of a production pipeline.
The upsert problem postings have that vector codes don't: a RE-INGESTED
document's new text can DROP terms, so pruning the scan to the queried
terms' partitions can never see that a doc's old posting was superseded.
The fix is a separate slim version manifest ``(doc_id, batch_id, dl)``
written with every batch — reads prune the wide postings by term partition,
then keep only rows whose (doc_id, batch_id) matches the manifest's latest
version. The manifest is also exactly the BM25 corpus-stats source (N, Σdl
per current versions), so document deletion-by-reingestion never skews idf.

Stream == batch proof: test_streaming_postings asserts the streamed store's
BM25 and phrase results equal operators/retrieval.bm25_scores and
operators/text.phrase_search on the same corpus, bit-for-bit.

Reference parity: the reference's WAL-append + compaction lifecycle
(/root/reference/src/index/index_server.cpp:30-60, tagtreego WAL) applied
to an inverted text index instead of label postings.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import h60, h60_py
from tagtree_spark.streaming.ingest import _complete, _list_segments, _parse_segment


class PostingsSink:
    """foreachBatch sink appending positional-postings segments.

    Layout under ``store_path``::

        post/seg-<batch>-delta/tp=<h60(term) % n_term_parts>/...  (doc_id, pos, term, batch_id)
        docs/seg-<batch>-delta/                                   (doc_id, batch_id, dl)

    Postings are written BEFORE the manifest: a manifest row implies its
    postings exist, so a crash between the two writes leaves orphan
    postings that every read drops via the version join (and the batch
    replay overwrites both segments — idempotent by segment naming).
    """

    def __init__(
        self,
        store_path: str,
        n_term_parts: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
        compact_every: int | None = 8,
    ):
        self.store_path = store_path
        self.n_term_parts = n_term_parts
        self.id_col = id_col
        self.text_col = text_col
        self.compact_every = compact_every

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            compact_postings(
                spark, self.store_path, batch_id, n_term_parts=self.n_term_parts
            )
        # one row per doc per batch (duplicate delivery inside a batch):
        # deterministic winner by content hash, same stance as AnnIndexSink
        # NULL text → '' (one empty token, dl=1) BEFORE aggregation: a raw
        # NULL would write a manifest row with dl=NULL and no postings,
        # skewing store_bm25's corpus stats for every doc (ADVICE r8).
        # bm25_scores/materialize_postings apply the same coalesce so the
        # stream==batch equality holds on null-text corpora too.
        docs = (
            batch_df.select(
                self.id_col,
                F.coalesce(F.col(self.text_col), F.lit("")).alias(self.text_col),
            )
            .groupBy(F.col(self.id_col).alias("doc_id"))
            .agg(
                F.max_by(
                    F.col(self.text_col), F.xxhash64(F.col(self.text_col))
                ).alias("text")
            )
        ).persist()
        if docs.count() == 0:
            docs.unpersist()
            return
        toks = docs.select(
            "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term")
        ).select(
            "doc_id",
            F.col("pos").cast("bigint").alias("pos"),
            "term",
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            (h60("term") % self.n_term_parts).cast("int").alias("tp"),
        )
        toks.write.mode("overwrite").partitionBy("tp").parquet(
            os.path.join(self.store_path, "post", f"seg-{batch_id:010d}-delta")
        )
        manifest = docs.select(
            "doc_id",
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            F.size(F.split(F.col("text"), " ")).cast("bigint").alias("dl"),
        )
        manifest.write.mode("overwrite").parquet(
            os.path.join(self.store_path, "docs", f"seg-{batch_id:010d}-delta")
        )
        docs.unpersist()


def read_doc_versions(
    spark: SparkSession, store_path: str, before_batch: int | None = None
) -> DataFrame | None:
    """Latest version of every ingested document → ``(doc_id, batch_id,
    dl)`` — the manifest union with latest-wins per doc. This frame IS the
    BM25 corpus statistics source (one slim row per live document)."""
    segs = _list_segments(os.path.join(store_path, "docs"), before_batch)
    if not segs:
        return None
    parts = [spark.read.parquet(s).select("doc_id", "batch_id", "dl") for s in segs]
    out = reduce(lambda a, b: a.unionByName(b), parts)
    if len(segs) == 1:
        return out
    return (
        out.groupBy("doc_id")
        .agg(F.max(F.struct("batch_id", "dl")).alias("_v"))
        .select("doc_id", F.col("_v.batch_id").alias("batch_id"), F.col("_v.dl").alias("dl"))
    )


def read_postings(
    spark: SparkSession,
    store_path: str,
    terms: list[str] | None = None,
    before_batch: int | None = None,
    n_term_parts: int = 64,
) -> DataFrame | None:
    """Current-version postings → ``(doc_id, pos, term, batch_id)``.

    ``terms`` prunes the scan to the queried terms' tp partitions
    (driver-side h60, PartitionFilters — k terms read k of
    ``n_term_parts`` directories per segment regardless of corpus size).
    With >1 segment the pruned rows join the version manifest so a
    re-ingested doc's superseded postings drop even when its new text no
    longer contains the queried terms; the single-segment case (post-
    compaction, or a single batch — both already latest-wins) skips the
    join and is a pure pruned scan."""
    segs = _list_segments(os.path.join(store_path, "post"), before_batch)
    if not segs:
        return None
    parts = [
        spark.read.option("basePath", s)
        .parquet(s)
        .select("doc_id", "pos", "term", "batch_id", "tp")
        for s in segs
    ]
    out = reduce(lambda a, b: a.unionByName(b), parts)
    if terms is not None:
        # h60_py is the ONE driver-side definition bit-identical to the
        # sink's h60 layout hash — never re-derive it inline (ADVICE r8:
        # drift would silently prune to the wrong partitions and return
        # empty, because the term.isin filter masks the mismatch)
        tps = sorted({h60_py(t) % n_term_parts for t in terms})
        out = out.where(F.col("tp").isin(tps) & F.col("term").isin(list(terms)))
    out = out.select("doc_id", "pos", "term", "batch_id")
    doc_segs = _list_segments(os.path.join(store_path, "docs"), before_batch)
    if not doc_segs:
        # postings with no committed manifest = a crash between the two
        # writes of the first batch; no document version was ever
        # committed, so the store is empty — orphan postings must never
        # surface (review r8)
        return None
    if (
        len(segs) == 1
        and len(doc_segs) == 1
        and _parse_segment(segs[0]) == _parse_segment(doc_segs[0])
    ):
        # matching lone segments (post-compaction or single-batch): both
        # already latest-wins, the version join would be a no-op
        return out
    latest = read_doc_versions(spark, store_path, before_batch).select(
        "doc_id", "batch_id"
    )
    return out.join(latest, ["doc_id", "batch_id"])


def compact_postings(
    spark: SparkSession,
    store_path: str,
    before_batch: int,
    n_term_parts: int = 64,
) -> None:
    """Fold segments < before_batch into one base per tree (postings
    re-partitioned by tp, manifest latest-wins) — superseded doc versions
    are DROPPED here, so reads after compaction are single-segment pure
    pruned scans. Same crash-safe base-then-delete order as the sibling
    sinks. ``n_term_parts`` MUST match the sink's (tp is recomputed
    during the re-layout; a mismatch would silently re-home terms away
    from where pruned reads look for them — the sink passes its own)."""
    import glob as _glob
    import shutil as _shutil

    post_base = os.path.join(store_path, "post", f"seg-{before_batch - 1:010d}-base")
    docs_base = os.path.join(store_path, "docs", f"seg-{before_batch - 1:010d}-base")
    if not _complete(post_base):
        if len(_list_segments(os.path.join(store_path, "post"), before_batch)) <= 1:
            return
        merged = read_postings(spark, store_path, before_batch=before_batch)
        if merged is None or merged.isEmpty():
            return
        merged.withColumn(
            "tp", (h60("term") % n_term_parts).cast("int")
        ).repartition("tp").write.mode("overwrite").partitionBy("tp").parquet(
            post_base
        )
        if not _complete(post_base):
            return
    if not _complete(docs_base):
        vers = read_doc_versions(spark, store_path, before_batch=before_batch)
        if vers is not None and not vers.isEmpty():
            vers.write.mode("overwrite").parquet(docs_base)
        if not _complete(docs_base):
            return
    for tree, base in (("post", post_base), ("docs", docs_base)):
        for d in _glob.glob(os.path.join(store_path, tree, "seg-*")):
            if d == base:
                continue
            meta = _parse_segment(d)
            if meta is not None and meta[0] < before_batch:
                _shutil.rmtree(d, ignore_errors=True)


def store_bm25(
    spark: SparkSession,
    store_path: str,
    terms: list[str],
    k1: float = 1.25,
    b: float = 0.75,
    n_term_parts: int = 64,
) -> DataFrame:
    """BM25 answered from the STREAMED store → same output (bit-for-bit)
    as ``operators.retrieval.bm25_scores`` on the live document set: the
    scan reads only the query terms' tp partitions for tf/df; N and Σdl
    come from the slim version manifest — corpus bodies are never
    re-scanned. The score expression chain mirrors bm25_scores exactly
    (integer idf surrogate, fixed sorted-term bracketing — see that
    docstring for the determinism argument); keep the two in lockstep."""
    from tagtree_spark.session import persist_tracked

    ts = sorted(set(terms))
    # r13: both slim frames feed TWO consumers each (tf → df stats + the
    # score join; vers → corpus stats + the dl join) — without the
    # persists the pruned many-small-file postings scan ran once per
    # consumer (sweep log: two identical 96-task scan stages)
    vers = read_doc_versions(spark, store_path)
    if vers is None:
        raise ValueError(f"store_bm25: no segments under {store_path!r}")
    vers = persist_tracked(vers)
    post = read_postings(spark, store_path, terms=ts, n_term_parts=n_term_parts)
    tf = persist_tracked(
        post.groupBy("doc_id").agg(
            *[
                F.sum(F.when(F.col("term") == t, 1).otherwise(0))
                .cast("bigint")
                .alias(f"c{i}")
                for i, t in enumerate(ts)
            ]
        )
    )
    stats_doc = vers.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    stats_df = tf.agg(
        *[
            F.sum(F.when(F.col(f"c{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(len(ts))
        ]
    )
    joined = (
        tf.join(vers.select("doc_id", "dl"), "doc_id")
        .join(F.broadcast(stats_doc))
        .join(F.broadcast(stats_df))
    )
    dl = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score = F.lit(0.0)
    hits = F.lit(0)
    for i in range(len(ts)):
        tfx = F.col(f"c{i}").cast("double")
        idf6 = F.expr(f"1000000 * n_docs div df{i}").cast("double")
        denom = tfx + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
        s_i = idf6 * (tfx * F.lit(k1 + 1.0)) / denom
        score = score + F.when(F.col(f"c{i}") > 0, s_i).otherwise(F.lit(0.0))
        hits = hits + F.when(F.col(f"c{i}") > 0, 1).otherwise(0)
    return joined.select(
        "doc_id",
        hits.cast("bigint").alias("n_terms_hit"),
        score.alias("score"),
    ).where(F.col("n_terms_hit") > 0)


def store_phrase(
    spark: SparkSession, store_path: str, phrase: str, n_term_parts: int = 64
) -> DataFrame:
    """Positional phrase search from the STREAMED store → same output as
    ``operators.text.phrase_search`` on the live document set (k−1
    adjacency equi-joins on (doc_id, pos+j)); the scan touches k of
    ``n_term_parts`` tp partitions per segment."""
    from tagtree_spark.session import persist_tracked

    terms = phrase.split(" ")
    if len(terms) < 2:
        raise ValueError("phrase needs >= 2 tokens")
    toks = read_postings(spark, store_path, terms=terms, n_term_parts=n_term_parts)
    if toks is None:
        raise ValueError(f"store_phrase: no segments under {store_path!r}")
    # r13: k per-term branches below — persist, or the pruned
    # many-small-file scan re-runs once per phrase position
    toks = persist_tracked(toks)
    m = toks.where(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for j, t in enumerate(terms[1:], start=1):
        tj = toks.where(F.col("term") == t).select(
            "doc_id", (F.col("pos") - j).alias("p0")
        )
        m = m.join(tj, ["doc_id", "p0"])
    return m.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_occ"),
        F.min("p0").cast("bigint").alias("first_pos"),
    )
