"""Custom Spark data source for the engine's segment stores.

Every streaming sink in this repo (ingest/rollup/neardup/embed/distinct/
topk/moments/cdc) persists state as ``seg-<batch>-delta`` / ``-base``
parquet directories with two read-protocol rules: a complete base SHADOWS
every segment with id ≤ its own, and ``before_batch`` excludes a replaying
batch's own (possibly half-written) segment. Those rules normally live in
Python helpers — this module packages them as a PySpark 4 **Python data
source** so ANY consumer, including plain SQL users, reads a store
correctly:

    spark.dataSource.register(SegmentDataSource)
    spark.read.format("tagtree_segments").option("path", store).load()

One input partition per data FILE (parallel scan); rows are served as
Arrow record batches straight from the parquet files — no pandas
round-trip. The merge step stays with the caller (sum/max/argmax depends
on the store family); this source guarantees WHICH files are visible.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _SegFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _visible_files(path: str, before_batch: int | None) -> list[str]:
    from tagtree_spark.streaming.ingest import _list_segments

    files: list[str] = []
    for seg in _list_segments(path, before_batch):
        files.extend(sorted(glob.glob(os.path.join(seg, "*.parquet"))))
    return files


class SegmentStoreReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tagtree_segments requires .option('path', ...)")
        bb = options.get("before_batch")
        self.before = int(bb) if bb is not None else None

    def partitions(self):
        return [_SegFile(f) for f in _visible_files(self.path, self.before)]

    def read(self, partition):
        import pyarrow.parquet as pq

        yield from pq.read_table(partition.path).to_batches()


class SegmentDataSource(DataSource):
    """``format("tagtree_segments")`` — options: ``path`` (store dir),
    ``before_batch`` (optional replay-exclusion bound)."""

    @classmethod
    def name(cls) -> str:
        return "tagtree_segments"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("tagtree_segments requires .option('path', ...)")
        bb = self.options.get("before_batch")
        files = _visible_files(path, int(bb) if bb is not None else None)
        if not files:
            raise ValueError(
                f"tagtree_segments: no complete segments under "
                f"{self.options.get('path')!r}"
            )
        return from_arrow_schema(pq.read_schema(files[0]))

    def reader(self, schema):
        return SegmentStoreReader(self.options)

    def streamReader(self, schema):
        return SegmentStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(SegmentDataSource)


def _delta_ids(path: str) -> list[int]:
    from tagtree_spark.streaming.ingest import _complete, _parse_segment

    ids = []
    for d in sorted(glob.glob(os.path.join(path, "seg-*-delta"))):
        meta = _parse_segment(d)
        if meta is not None and _complete(d):
            ids.append(meta[0])
    return ids


def _base_horizon(path: str) -> int | None:
    """Highest complete base-segment id, or None if the store has never
    compacted. Deltas with ids ≤ this horizon are folded into the base
    (and usually deleted) — a delta-only tail cannot reconstruct them."""
    from tagtree_spark.streaming.ingest import _complete, _parse_segment

    best: int | None = None
    for d in glob.glob(os.path.join(path, "seg-*-base")):
        meta = _parse_segment(d)
        if meta is not None and _complete(d):
            best = meta[0] if best is None else max(best, meta[0])
    return best


class SegmentStreamReader(DataSourceStreamReader):
    """Tail a segment store as a STREAM: each micro-batch serves the delta
    segments whose batch ids fall in [start, end) — the store's append
    log replayed in order. Deltas only, by contract: a compaction base is
    the BATCH readers' shortcut and would double-count here, so stores
    being tailed should compact behind the committed offset (or not at
    all). Offsets are ``{"batch": <next id>}``.

    A store that has ALREADY compacted cannot be tailed from 0 — the
    folded history lives only in the base segment, which a delta tail
    must not double-count. ``initialOffset`` fails loudly in that case
    unless ``.option("start_after_base", "true")`` opts into starting at
    base_horizon+1 (post-compaction deltas only). ``partitions`` likewise
    raises if compaction overruns the committed offset mid-stream, so a
    partial log is never served silently."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tagtree_segments requires .option('path', ...)")
        sab = options.get("start_after_base", "false")
        self.start_after_base = str(sab).lower() in ("true", "1", "yes")

    def initialOffset(self):
        horizon = _base_horizon(self.path)
        if horizon is None:
            return {"batch": 0}
        if self.start_after_base:
            return {"batch": horizon + 1}
        raise ValueError(
            f"tagtree_segments stream: store {self.path!r} has compacted "
            f"(base horizon {horizon}); deltas <= {horizon} are folded away, "
            "so tailing from 0 would silently drop history. Batch-read the "
            "store for a full snapshot, or .option('start_after_base', "
            "'true') to tail post-compaction deltas only."
        )

    def partitions(self, start, end):
        lo = start["batch"]
        horizon = _base_horizon(self.path)
        if horizon is not None and horizon >= lo:
            raise ValueError(
                f"tagtree_segments stream: compaction at base horizon "
                f"{horizon} overran the stream offset {lo} — deltas in "
                f"[{lo}, {horizon}] were folded away before this reader "
                "served them. Compact behind the committed offset "
                "(compact_every larger than the tail lag), or restart the "
                "stream with .option('start_after_base', 'true')."
            )
        return self._delta_partitions(lo, end["batch"])

    def latestOffset(self):
        """Monotone by construction: floored at base_horizon+1 when a base
        exists. Compaction rmtree's folded deltas, so a momentarily-empty
        delta log must NOT report 0 — a fresh start_after_base stream (or a
        caught-up tail whose consumed deltas were all just compacted) would
        see the offset regress, commit it (Spark only equality-checks
        offsets), and partitions() would then raise the spurious
        'compaction overran the stream offset' error on a stream that
        followed the documented contract (ADVICE r6 medium)."""
        ids = _delta_ids(self.path)
        hz = _base_horizon(self.path)
        return {
            "batch": max(
                (ids[-1] + 1) if ids else 0,
                (hz + 1) if hz is not None else 0,
            )
        }

    def _delta_partitions(self, lo, hi):
        files = []
        for i in _delta_ids(self.path):
            if lo <= i < hi:
                seg = os.path.join(self.path, f"seg-{i:010d}-delta")
                files.extend(sorted(glob.glob(os.path.join(seg, "*.parquet"))))
        return [_SegFile(f) for f in files]

    def read(self, partition):
        import pyarrow.parquet as pq

        yield from pq.read_table(partition.path).to_batches()

    def commit(self, end):
        pass
