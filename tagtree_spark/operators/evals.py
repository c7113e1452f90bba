"""Classifier evaluation primitives — the pipeline's model-audit ops.

Any heuristic stage (lang-id, quality keep/drop, hashed classifier) is a
classifier; before its decisions gate a 100 TB corpus, its agreement with
a gold column is the first report to run. Pure integer counting — one
hash agg on (gold, pred) — so the matrix is exact and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(df: DataFrame, gold_col: str, pred_col: str) -> DataFrame:
    """→ ``(gold, pred, n)`` — one row per observed (gold, pred) cell."""
    return (
        df.groupBy(
            F.col(gold_col).alias("gold"), F.col(pred_col).alias("pred")
        ).agg(F.count("*").cast("bigint").alias("n"))
    )


def class_report(df: DataFrame, gold_col: str, pred_col: str) -> DataFrame:
    """Per-class counts → ``(label, n_gold, n_pred, n_correct)`` — the
    integer numerators/denominators of precision and recall (the ratios
    are one division away; kept as exact counts so the report is
    engine-independent and mergeable across shards)."""
    g = df.select(F.col(gold_col).alias("label")).groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_gold")
    )
    p = df.select(F.col(pred_col).alias("label")).groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_pred")
    )
    c = (
        df.where(F.col(gold_col) == F.col(pred_col))
        .select(F.col(gold_col).alias("label"))
        .groupBy("label")
        .agg(F.count("*").cast("bigint").alias("n_correct"))
    )
    return (
        g.join(p, "label", "full_outer")
        .join(c, "label", "full_outer")
        .select(
            "label",
            F.coalesce("n_gold", F.lit(0)).cast("bigint").alias("n_gold"),
            F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
            F.coalesce("n_correct", F.lit(0)).cast("bigint").alias("n_correct"),
        )
    )
