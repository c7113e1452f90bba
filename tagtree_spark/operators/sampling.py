"""Deterministic sampling for training-data pipelines (SURVEY.md §2.11).

``df.sample()`` is seed-dependent per partition split — re-running a
pipeline after a repartition silently yields a DIFFERENT sample. Hash
sampling decides membership from the ROW's identity alone:

    keep  ⇔  h60(stratum ':' id) % 100 < pct

so the sample is reproducible across runs, engines (the DuckDB oracle
computes the identical predicate), cluster layouts, and incremental
re-ingests (a document's membership never changes when the corpus around
it grows — the property that makes held-out splits stable over time).

Stratification: the hash is salted with the stratum value, so each
stratum is sampled at the target rate independently — a skewed corpus
(90% one language) still yields pct% of EVERY stratum, and strata can be
resampled independently. Pure narrow filter — pushes to the scan, no
shuffle, trivially 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tagtree_spark.functions.hashing import h60


def hash_bucket(id_col: str | Column, stratum_col: str | Column | None = None) -> Column:
    """Deterministic [0, 100) bucket for a row: h60 of ``stratum:id``."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    key = idc.cast("string")
    if stratum_col is not None:
        s = F.col(stratum_col) if isinstance(stratum_col, str) else stratum_col
        key = F.concat_ws(":", s, key)
    return h60(key) % F.lit(100)


def stratified_sample(
    df: DataFrame,
    pct: int,
    id_col: str = "doc_id",
    stratum_col: str | None = "lang",
) -> DataFrame:
    """Keep ~pct% of every stratum, deterministically (see module doc)."""
    return df.where(hash_bucket(id_col, stratum_col) < F.lit(pct))
