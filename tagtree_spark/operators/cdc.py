"""Change-data-capture semantics as plain DataFrame algebra — the
lakehouse MERGE / time-travel pair, re-expressed engine-side.

The reference's COW tree gives snapshot semantics to its index
(/root/reference/src/tree/cow_tree.h); a corpus pipeline needs the same
two verbs on TABLES: apply a change set to a snapshot (MERGE), and read
the table as of an earlier version (time travel). Both are joins/windows
— one shuffle each on the key — so they hold at 100 TB without any
storage-format magic (swap in Delta/Iceberg for the transactional form;
the PLAN is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_id",
    op_col: str = "op",
) -> DataFrame:
    """MERGE: apply a change set (``op`` ∈ 'I' insert / 'U' update /
    'D' delete; payload = every other column of ``changes``) to a base
    snapshot → the next snapshot, same schema as ``base``.

    One anti-join (drop keys being deleted or replaced) + one union of
    the I/U payloads. Upsert semantics: a 'U' for an absent key inserts,
    an 'I' for a present key replaces — last-writer-wins like MERGE."""
    touched = changes.select(F.col(key_col)).distinct()
    kept = base.join(touched, key_col, "left_anti")
    incoming = changes.where(F.col(op_col) != "D").drop(op_col)
    return kept.unionByName(incoming.select(*base.columns))


def snapshot_as_of(
    log: DataFrame,
    version: int,
    key_col: str = "doc_id",
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Time travel: reconstruct the table AS OF ``version`` from an
    append-only change log (every row = one key's state at one version,
    op 'D' = tombstone) → the latest ≤version row per key, tombstones
    dropped.

    One key-partitioned argmax window over the version-bounded log —
    the predicate ``version <= V`` is a scan-range prune when the log is
    version-partitioned on disk. Ties within one (key, version) resolve
    deterministically: op precedence (D shadows U shadows I) then a
    whole-row hash, so re-runs/replays reconstruct identical snapshots
    even from a log that violates one-row-per-key-per-version."""
    from pyspark.sql import Window

    prec = (
        F.when(F.col(op_col) == "D", F.lit(2))
        .when(F.col(op_col) == "U", F.lit(1))
        .otherwise(F.lit(0))
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(version_col).desc(),
        prec.desc(),
        F.xxhash64(*[F.col(c) for c in log.columns]).desc(),
    )
    latest = (
        log.where(F.col(version_col) <= version)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.where(F.col(op_col) != "D").drop(op_col)
