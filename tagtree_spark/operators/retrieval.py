"""Hybrid retrieval — ranking fusion and lexical scoring.

A corpus pipeline serves retrieval two ways at once: lexical (term
postings) and dense (embeddings). These operators are the pair that makes
them ONE ranking: BM25 (Robertson/Sparck Jones; the k1/b formulation of
Robertson et al., TREC-3) over the token inverted index, and reciprocal
rank fusion (Cormack et al. 2009) to merge any N rankings without score
calibration.

Determinism: BM25's idf uses the integer surrogate ``(10^6·N) div df``
(q54's convention — no ln, whose last ulp is libm-dependent); every fp
constant (k1=1.25, b=0.75) is exact binary; per-document term scores are
summed by an ORDERED fold (Spark ``aggregate`` over a term-sorted array ≡
DuckDB ``list_reduce`` over ``list(... ORDER BY term)``), so the sum has
ONE bracketing in both engines. RRF adds one explicitly-parenthesized
term per ranking.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tagtree_spark.session import spread


def rrf_fuse(rankings: list[DataFrame], k: int = 60) -> DataFrame:
    """Reciprocal rank fusion → ``(id, rrf)``: Σ_i 1/(k + rank_i) over
    the given rankings (each ``(id, rank)`` with rank 1-based; ids
    absent from a ranking contribute 0 from it). The additions happen in
    list order, explicitly bracketed — deterministic doubles.

    Rankings are per-query top-N lists (bounded), so every join here is
    broadcast-scale regardless of corpus size."""
    if not rankings:
        raise ValueError("no rankings")
    named = [
        r.select(F.col("id"), F.col("rank").alias(f"_r{i}"))
        for i, r in enumerate(rankings)
    ]
    j = reduce(lambda a, b: a.join(b, "id", "full_outer"), named)
    score = F.lit(0.0)
    for i in range(len(rankings)):
        term = F.coalesce(
            F.lit(1.0).cast("double") / (F.lit(k) + F.col(f"_r{i}")).cast("double"),
            F.lit(0.0),
        )
        score = score + term
    return j.select("id", score.alias("rrf"))


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.25,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 over whitespace tokens for a literal query → ``(doc_id,
    n_terms_hit, score)`` for documents matching ≥1 term.

    score = Σ_t idf6(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf6 = (10^6·N) div df(t) — integer idf surrogate, no ln (libm's
    last ulp is engine-dependent; integer div is not). Per-document
    term frequencies AND the doc length come from ONE ``aggregate``
    fold over the token array (a per-term ``filter`` would re-paste the
    split per reference — CLAUDE perf trap); corpus stats (N, Σdl,
    per-term df) are one tiny agg broadcast back; the term sum is added
    in sorted-term order with fixed bracketing — deterministic doubles.
    At 100 TB the persisted form reads the q160 postings partitions for
    df/tf instead of re-scanning bodies — same math."""
    ts = sorted(set(terms))  # dup terms would silently double their score
    zeros = F.struct(
        F.lit(0).cast("bigint").alias("n"),
        *[F.lit(0).cast("bigint").alias(f"c{i}") for i in range(len(ts))],
    )

    def step(acc, t):
        return F.struct(
            (acc["n"] + 1).alias("n"),
            *[
                (acc[f"c{i}"] + F.when(t == F.lit(term), 1).otherwise(0)).alias(f"c{i}")
                for i, term in enumerate(ts)
            ],
        )

    from tagtree_spark.session import persist_tracked

    tc = spread(docs).select(
        F.col(id_col),
        # NULL text counts as one empty token (dl=1, zero hits) — same
        # stance as PostingsSink's coalesce so the streamed-store BM25
        # stays bit-equal on null-text corpora (ADVICE r8)
        F.aggregate(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " "), zeros, step
        ).alias("_tc"),
    )
    # the per-doc fold feeds BOTH the corpus-stats broadcast and the
    # scoring path — without a persist it evaluates twice (r13 event
    # log: two near-identical fold stages per run); the cached frame is
    # narrow (id + one int struct), bodies never persist
    tc = persist_tracked(tc)
    stats = tc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("_tc.n")).cast("bigint").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"_tc.c{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(len(ts))
        ],
    )
    joined = tc.join(F.broadcast(stats))
    dl = F.col("_tc.n").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    score = F.lit(0.0)
    hits = F.lit(0)
    for i in range(len(ts)):
        tf = F.col(f"_tc.c{i}").cast("double")
        idf6 = F.expr(f"1000000 * n_docs div df{i}").cast("double")
        denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
        s_i = idf6 * (tf * F.lit(k1 + 1.0)) / denom
        score = score + F.when(F.col(f"_tc.c{i}") > 0, s_i).otherwise(F.lit(0.0))
        hits = hits + F.when(F.col(f"_tc.c{i}") > 0, 1).otherwise(0)
    return joined.select(
        F.col(id_col).alias("doc_id"),
        hits.cast("bigint").alias("n_terms_hit"),
        score.alias("score"),
    ).where(F.col("n_terms_hit") > 0)


def bm25_batch(
    docs: DataFrame,
    queries: dict[str, list[str]],
    top_k: int = 5,
    k1: float = 1.25,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BATCHED BM25 — many literal queries against ONE corpus scan (the
    lexical twin of similarity.pq_adc_batch_topk): term frequencies for
    the UNION of all queries' terms come from a single fold per document,
    corpus stats are one broadcast, and every query's score expression
    reads the shared counters — |Q| scans become one.

    → ``(qid, doc_id, n_terms_hit, score, rank)`` with ``rank`` 1-based
    per query (score desc, doc_id ties), ``rank <= top_k``; documents
    matching none of a query's terms don't rank for it. Same determinism
    discipline as :func:`bm25_scores`: integer idf surrogate, exact-binary
    constants, each query's term scores added in sorted-term order with
    fixed bracketing. At 100 TB batch queries in waves sized so the
    per-doc counter struct (|union terms| ints) stays narrow — a few
    hundred distinct terms per wave."""
    from pyspark.sql import Window

    if not queries:
        raise ValueError("no queries")
    ts = sorted({t for terms in queries.values() for t in terms})
    idx = {t: i for i, t in enumerate(ts)}
    zeros = F.struct(
        F.lit(0).cast("bigint").alias("n"),
        *[F.lit(0).cast("bigint").alias(f"c{i}") for i in range(len(ts))],
    )

    def step(acc, t):
        return F.struct(
            (acc["n"] + 1).alias("n"),
            *[
                (acc[f"c{i}"] + F.when(t == F.lit(term), 1).otherwise(0)).alias(f"c{i}")
                for i, term in enumerate(ts)
            ],
        )

    from tagtree_spark.session import persist_tracked

    tc = spread(docs).select(
        F.col(id_col),
        # NULL text counts as one empty token (dl=1, zero hits) — same
        # stance as PostingsSink's coalesce so the streamed-store BM25
        # stays bit-equal on null-text corpora (ADVICE r8)
        F.aggregate(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " "), zeros, step
        ).alias("_tc"),
    )
    # the per-doc fold feeds BOTH the corpus-stats broadcast and the
    # scoring path — without a persist it evaluates twice (r13 event
    # log: two near-identical fold stages per run); the cached frame is
    # narrow (id + one int struct), bodies never persist
    tc = persist_tracked(tc)
    stats = tc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("_tc.n")).cast("bigint").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"_tc.c{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(len(ts))
        ],
    )
    joined = tc.join(F.broadcast(stats))
    dl = F.col("_tc.n").cast("double")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    rows = []
    for qid in sorted(queries):
        score = F.lit(0.0)
        hits = F.lit(0)
        for term in sorted(set(queries[qid])):  # dedupe: match bm25_scores
            i = idx[term]
            tf = F.col(f"_tc.c{i}").cast("double")
            idf6 = F.expr(f"1000000 * n_docs div df{i}").cast("double")
            denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / avgdl)
            s_i = idf6 * (tf * F.lit(k1 + 1.0)) / denom
            score = score + F.when(F.col(f"_tc.c{i}") > 0, s_i).otherwise(F.lit(0.0))
            hits = hits + F.when(F.col(f"_tc.c{i}") > 0, 1).otherwise(0)
        rows.append(
            F.struct(
                F.lit(qid).alias("qid"),
                hits.cast("bigint").alias("n_terms_hit"),
                score.alias("score"),
            )
        )
    exploded = joined.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array(*rows)).alias("_q")
    ).select("doc_id", "_q.qid", "_q.n_terms_hit", "_q.score")
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), "doc_id")
    return (
        exploded.where(F.col("n_terms_hit") > 0)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= top_k)
        .select("qid", "doc_id", "n_terms_hit", "score", "rank")
    )
