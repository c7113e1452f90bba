"""Corpus snapshot diff — the incremental-pipeline bookkeeping operator.

A training-data pipeline is rebuilt continuously; the first question after
every rebuild is "what changed vs the last snapshot?". ``snapshot_diff``
answers it from two ``(id, content-hash)`` views with ONE full-outer hash
join on the id — no content bytes move, so at 100 TB the shuffle carries
16 bytes/doc. (The reference has no versioning surface; this extends the
mandated pipeline operators — north-star E-family.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import h60


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ ``(doc_id, status, old_h60, new_h60)`` with status ∈
    ``added | dropped | changed | unchanged``; absent-side hashes are -1
    (never NULL, so downstream equality filters stay two-valued).

    Both inputs are reduced to ``(id, h60(text))`` BEFORE the join —
    column pruning pushes the 2-column read into the scans and the
    full-outer join shuffles only ids+hashes.
    """
    oh = old.select(F.col(id_col).alias("doc_id"), h60(text_col).alias("old_h60"))
    nh = new.select(F.col(id_col).alias("doc_id"), h60(text_col).alias("new_h60"))
    j = oh.join(nh, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_h60").isNull(), "added")
        .when(F.col("new_h60").isNull(), "dropped")
        .when(F.col("old_h60") != F.col("new_h60"), "changed")
        .otherwise("unchanged")
    )
    return j.select(
        "doc_id",
        status.alias("status"),
        F.coalesce("old_h60", F.lit(-1)).cast("bigint").alias("old_h60"),
        F.coalesce("new_h60", F.lit(-1)).cast("bigint").alias("new_h60"),
    )
