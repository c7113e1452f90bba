"""Fuzzy record linkage (entity resolution): blocked candidate generation
+ edit-distance verification — the classic dedup-across-records pipeline
(Fellegi-Sunter blocking; same candidate-bounding discipline as the
document near-dup family, applied to short identifier strings).

Reference parity: none (the reference indexes label sets, not entities) —
this is part of the mandated pipeline surface: a 100 TB ingest of user /
account / vendor records needs duplicate-entity detection, and the scale
shape is identical to LSH dedup: NEVER all-pairs; block on cheap equality
keys, generate pairs per block (capped), verify with the exact metric.

Cross-engine exactness: Levenshtein distance is a fixed algorithm —
Spark ``levenshtein`` ≡ DuckDB ``levenshtein`` (verified) — and blocking
keys are plain string ops, so every pair and distance is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tagtree_spark.session import spread

#: Degenerate-block cap: a block key shared by B records yields O(B²)
#: pairs; real duplicates concentrate in small blocks (a shared rare
#: prefix), so oversized blocks carry no linkage signal — same rationale
#: as dedup.MAX_BUCKET. The oracle mirrors the cap exactly.
MAX_BLOCK = 500


def blocked_fuzzy_pairs(
    records: DataFrame,
    id_col: str,
    text_col: str,
    block_expr: str | Column,
    max_dist: int = 2,
    max_block: int | None = MAX_BLOCK,
) -> DataFrame:
    """Candidate pairs within each blocking-key group whose ``text_col``
    values are within ``max_dist`` Levenshtein edits →
    ``(id_a, id_b, dist)``.

    One shuffle (block groupBy); pairs are generated array-side per block
    (never a self-join re-reading the input), the distance filter runs in
    the same projection. Block cardinality is the parallelism; the cap
    bounds the quadratic.
    """
    blk = F.expr(block_expr) if isinstance(block_expr, str) else block_expr
    b = spread(records).select(
        blk.alias("blk"),
        F.struct(F.col(id_col).alias("id"), F.col(text_col).alias("s")).alias("r"),
    )
    buckets = b.groupBy("blk").agg(F.sort_array(F.collect_list("r")).alias("rs"))
    if max_block is not None:
        buckets = buckets.where(F.size("rs") <= max_block)
    pair_structs = F.explode(
        F.flatten(
            F.expr(
                "transform(rs, (x, i) -> "
                "transform(slice(rs, i + 2, size(rs)), "
                "y -> struct(x.id AS id_a, y.id AS id_b, "
                "levenshtein(x.s, y.s) AS dist)))"
            )
        )
    )
    return (
        buckets.where(F.size("rs") >= 2)
        .select(pair_structs.alias("p"))
        .select(
            F.col("p.id_a").cast("bigint").alias("id_a"),
            F.col("p.id_b").cast("bigint").alias("id_b"),
            F.col("p.dist").cast("bigint").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
