"""TagTreeEngine — the user-facing facade, mirroring the reference's
``IndexServer`` public API 1:1 (/root/reference/include/tagtree/index/
index_server.h:28-52) plus the sample-select path of ``PromQuerier``
(/root/reference/src/adapters/prom/querier.cpp:13-21).

A user of the reference drives six entry points; each maps to one method:

| reference (index_server.h / querier) | here |
|---|---|
| resolve_label_matchers(matchers, start, end) → bitmap | resolve(...) → DataFrame[tsid] |
| add_series(t, labels) / commit(series)               | add_series_batch(events) / commit(path) |
| exists(labels) → tsids                               | exists(labels_df) |
| get_labels(tsid) → labels                            | get_labels([tsids]) |
| label_values(name) → set                             | label_values(name) |
| current_tsid()                                       | current_tsid() |
| Querier::select(tsids) (via storage)                 | select(matchers, start, end) → samples |

Construction: from raw events (model derived in memory) or from a
materialized store dir (tsdb.store layout, partition-pruned reads).
``register_views`` exposes the model as temp views so the whole surface is
also reachable from ``spark.sql``.
"""

from __future__ import annotations

import functools
import os
import time

from pyspark.sql import DataFrame, SparkSession

from tagtree_spark.tsdb import ingest as _ingest
from tagtree_spark.tsdb import matchers as _m
from tagtree_spark.tsdb.model import build_model
from tagtree_spark.tsdb.storage import (
    MemorySampleStorage,
    SampleStorage,
    open_storage,
)
from tagtree_spark.tsdb.store import load_model

#: Auto-compaction volume trigger: compact the store after this many NEW
#: series since the last compaction — the reference's policy of compacting
#: every 100k added series (/root/reference/src/index/index_server.cpp:199-203).
AUTO_COMPACT_SERIES = 100_000


def _tracked(fn):
    """Per-entry-point instrumentation — the counterpart of the reference's
    cumulative per-call timers (/root/reference/src/swig/wrapper.cpp:25-36:
    every SWIG entry wraps the call in a TimeCounter and ``PrintStats``
    dumps call count + cumulative wall). Records calls and wall seconds per
    method on the owning engine; for lazy read-path methods the wall is
    plan-construction time (execution happens in Spark when the caller
    acts — per-job wall lives in the Spark UI/event log at deployment)."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        t0 = time.perf_counter()
        try:
            return fn(self, *args, **kwargs)
        finally:
            c, w = self._stats.get(fn.__name__, (0, 0.0))
            self._stats[fn.__name__] = (c + 1, w + (time.perf_counter() - t0))

    return wrapper


class TagTreeEngine:
    def __init__(
        self,
        spark: SparkSession,
        events: DataFrame | None = None,
        store_dir: str | None = None,
        auto_compact_series: int | None = AUTO_COMPACT_SERIES,
        storage: SampleStorage | None = None,
    ):
        if (events is None) == (store_dir is None):
            raise ValueError("provide exactly one of events= or store_dir=")
        self.spark = spark
        self.store_dir = store_dir
        self.auto_compact_series = auto_compact_series
        self._new_since_compact = 0
        # entry-point metrics: {method: (n_calls, cumulative_wall_sec)}
        self._stats: dict[str, tuple[int, float]] = {}
        # row counters: {method: {"rows_in"/"rows_out": n}}, harvested
        # lazily from per-call Observations (see _observed)
        self._row_stats: dict[str, dict[str, int]] = {}
        self._pending_obs: list[tuple[str, str, object]] = []
        if store_dir is not None:
            self.series, self.postings, _ = load_model(spark, store_dir)
            self.storage: SampleStorage = storage or open_storage(spark, store_dir)
        else:
            self.series, self.postings, samples = build_model(events)
            # the pluggable seam: the index (series/postings) always comes
            # from the index layer; a caller-supplied SampleStorage binds
            # any sample backend behind it (reference storage.h:49-53)
            self.storage = storage or MemorySampleStorage(samples)

    @property
    def samples(self) -> DataFrame:
        """The sample frame, via the storage seam (reference
        storage.h:49-53 — the index layer never touches sample bytes
        directly; swap the storage to swap the backend)."""
        return self.storage.read()

    # -- row telemetry (reference wrapper.cpp:25-36 PrintStats) ------------

    def _observed(self, method: str, df: DataFrame, kind: str = "rows_out") -> DataFrame:
        """Attach a row-count Observation to an entry point's frame. The
        count is computed by Spark DURING the caller's own first action
        over the frame (no extra job, the reference's zero-cost
        cumulative-counter semantics) and folded into :meth:`stats` on
        the next read. Counts rows flowing through this plan node — a
        plan that re-reads the frame within one action counts each pass,
        so treat rows_in on write paths as capacity telemetry, not an
        exact ledger.

        MUST be attached to a frame consumed exactly ONCE per action: a
        CollectMetrics node duplicated into several branches of one
        executed plan can resolve from a pruned branch and report 0
        (ADVICE r6 high — the write paths observe the build_samples
        output, not the raw batch, for exactly this reason)."""
        from pyspark.sql import functions as F
        from pyspark.sql.observation import Observation

        obs = Observation()
        # Opportunistic harvest + cap so a long-lived engine whose caller
        # never reads stats() doesn't leak one Observation per call
        # (ADVICE r6 low): fold completed ones now, and above the cap drop
        # the OLDEST never-executed entries (their frames were likely
        # discarded unexecuted; dropping loses nothing but a maybe-count).
        if len(self._pending_obs) >= 64:
            self._harvest_obs()
        if len(self._pending_obs) >= 256:
            del self._pending_obs[: len(self._pending_obs) - 255]
        self._pending_obs.append((method, kind, obs))
        return df.observe(obs, F.count(F.lit(1)).alias("n"))

    def _bump_rows(self, method: str, kind: str, n: int) -> None:
        d = self._row_stats.setdefault(method, {})
        d[kind] = d.get(kind, 0) + n

    def _harvest_obs(self) -> None:
        """Fold completed Observations into _row_stats; keep the rest
        pending. Non-blocking: a frame the caller never executed stays
        pending forever and costs nothing."""
        still: list[tuple[str, str, object]] = []
        for method, kind, obs in self._pending_obs:
            jo = getattr(obs, "_jo", None)
            try:
                if jo is None or jo.getRowOrEmpty().isEmpty():
                    still.append((method, kind, obs))
                    continue
                n = int(dict(jo.getAsJava()).get("n", 0))
            except Exception:
                still.append((method, kind, obs))
                continue
            self._bump_rows(method, kind, n)
        self._pending_obs = still

    # -- read path (reference §3.1) ---------------------------------------

    @staticmethod
    def _matchers(m) -> list[_m.LabelMatcher]:
        """Accept both boundary forms: LabelMatcher structs (the reference's
        in-repo surface) or a selector STRING like '{a=~"v.*", b!="x"}'
        (tsdb/selector.py — the tagtreego/helper.go:38-67 text boundary
        brought in-engine, VERDICT r8 #6)."""
        if isinstance(m, str):
            from tagtree_spark.tsdb.selector import parse_selector

            return parse_selector(m)
        return m

    @_tracked
    def resolve(
        self, matchers: list[_m.LabelMatcher] | str, start=None, end=None
    ) -> DataFrame:
        """resolve_label_matchers → distributed DataFrame[tsid]."""
        return self._observed(
            "resolve",
            _m.resolve_label_matchers(
                self.postings, self._matchers(matchers), start, end
            ),
        )

    @_tracked
    def select(
        self, matchers: list[_m.LabelMatcher] | str, start=None, end=None
    ) -> DataFrame:
        """PromQuerier::select — samples of the matching series in range,
        through the storage seam (Queryable::querier → Querier::select)."""
        tsids = _m.resolve_label_matchers(
            self.postings, self._matchers(matchers), start, end
        )
        return self._observed("select", self.storage.select(tsids, start, end))

    def register_metric(
        self,
        name: str,
        samples: DataFrame,
        postings: DataFrame | None = None,
        series: DataFrame | None = None,
    ) -> "TagTreeEngine":
        """Register an additional metric name for :meth:`query`'s
        expression evaluation (VERDICT r12 #2 — the registry that
        replaced exprlang's hardcoded ``events_total``): ``name``
        resolves to the given (samples, postings, series) frames, e.g.
        a store-backed alias over a persisted layout (q377). The
        engine's own model keeps the default name ``events_total``."""
        if not hasattr(self, "_metric_registry"):
            self._metric_registry: dict = {}
        self._metric_registry[name] = (samples, postings, series)
        return self

    @_tracked
    def query(self, promql_expr: str, lookback_ms: int = 300_000) -> DataFrame:
        """Evaluate a PromQL-style EXPRESSION string against this
        engine's model (tsdb/exprlang.py, r12/r13) — the capstone over
        the selector-string boundary: selectors inside the expression
        resolve through this engine's postings index, aggregation `by`
        labels through its series table, extra metric names through
        :meth:`register_metric`, and ``@``-instant evaluation uses
        ``lookback_ms`` as the staleness window (PromQL's 5m default).
        The reference delegates this layer to external libpromql
        (README.org:11-24); here it is in-engine. Example::

            engine.query('sum by (event_type) (rate(events_total[1d]))')
        """
        from tagtree_spark.tsdb.exprlang import evaluate

        return self._observed(
            "query",
            evaluate(
                promql_expr,
                self.samples,
                self.postings,
                series=self.series,
                metrics=getattr(self, "_metric_registry", None),
                lookback_ms=lookback_ms,
            ),
        )

    @_tracked
    def label_values(self, name: str) -> DataFrame:
        return self._observed("label_values", _m.label_values(self.postings, name))

    @_tracked
    def get_labels(self, tsids: list[int]) -> DataFrame:
        return self._observed("get_labels", _m.get_labels(self.series, tsids))

    # -- write path (reference §3.2) --------------------------------------

    @_tracked
    def add_series_batch(self, batch_events: DataFrame) -> "TagTreeEngine":
        """MERGE a batch of events into the series table (L1/L3); returns
        self with the updated model (postings rebuilt, samples APPENDED).

        Sample storage accumulates across batches, as in the reference
        (/root/reference/src/adapters/prom/appender.cpp:14-23 — the appender
        only ever adds). Prior sample rows stay valid because the merge
        keeps existing TSIDs stable (tsid, created) semantics — only new
        label sets get ids above the watermark.

        Store-backed engines delegate to :meth:`ingest_batch`: there the
        storage append is DURABLE, so the merged series must be committed
        first — otherwise a crash leaves orphan sample files whose tsids a
        later ingest could reassign to different label sets (ADVICE r4
        medium). ingest_batch commits series before appending samples.
        """
        if self.store_dir is not None:
            return self.ingest_batch(batch_events)
        from tagtree_spark.tsdb.model import build_postings, build_samples

        self.series = _ingest.add_series_batch(self.series, batch_events)
        self.postings = build_postings(self.series)
        # rows_in rides the samples build (one row per batch event after the
        # series merge) — the ONE frame this path consumes exactly once per
        # action; observing batch_events directly duplicated the
        # CollectMetrics node across the merge's touch/anti-join branches
        # and resolved 0 from a pruned one (ADVICE r6 high). The count
        # fills when the appended samples first flow through a caller
        # action (lazy storage) or during the append write (parquet).
        self.storage.append(
            self._observed(
                "add_series_batch", build_samples(batch_events, self.series), "rows_in"
            )
        )
        return self

    @_tracked
    def exists(self, probe: DataFrame) -> DataFrame:
        return self._observed("exists", _ingest.exists(self.series, probe))

    @_tracked
    def current_tsid(self) -> int:
        self._bump_rows("current_tsid", "rows_out", 1)
        return _ingest.current_tsid(self.series).collect()[0].max_tsid

    @_tracked
    def commit(self, path: str) -> None:
        _ingest.commit(self._observed("commit", self.series, "rows_out"), path)

    @_tracked
    def ingest_batch(self, batch_events: DataFrame) -> "TagTreeEngine":
        """Store-backed batch ingest: merge the batch's series (L1/L3),
        commit the series table, APPEND the batch's samples as a new set of
        files under the store's date partitions, and auto-compact once the
        volume trigger fires — the reference's compact-every-100k-series
        policy (/root/reference/src/index/index_server.cpp:199-203), here a
        NEW-SERIES counter against ``auto_compact_series`` instead of the
        streaming sinks' every-N-batches cadence.

        The per-batch sample write is O(batch); between compactions the
        store's postings table goes stale (postings are derivable — the
        in-memory view stays correct) and small sample files accumulate;
        compaction rewrites postings from the committed series and folds
        sample files into right-sized partitions, so the store's file count
        stays bounded by the compaction cadence, not the batch count. In a
        real deployment the append+compact pair is a Delta/Iceberg
        transaction; locally the series commit rides atomic_overwrite and
        samples accept the append-crash window (SURVEY.md §4.2).
        """
        if self.store_dir is None:
            raise ValueError("ingest_batch() requires an engine built from store_dir=")
        from tagtree_spark.tsdb.model import build_postings, build_samples
        from tagtree_spark.tsdb.store import (
            versioned_compact,
            versioned_overwrite,
            versioned_read,
        )

        series_path = os.path.join(self.store_dir, "series")
        postings_path = os.path.join(self.store_dir, "postings")

        before = self.current_tsid()
        merged = _ingest.add_series_batch(self.series, batch_events)
        _ingest.commit(merged, series_path)
        # re-anchor on the committed version (the pre-commit plan would
        # re-read the store and re-apply the merge on recompute; the
        # versioned read pins the just-committed immutable dir)
        self.series = versioned_read(self.spark, series_path)
        self.postings = build_postings(self.series)
        # rows_in on the samples build, consumed once by the append write
        # (an action — the count fills immediately here); see
        # add_series_batch for why the raw batch must not carry it.
        self.storage.append(
            self._observed(
                "ingest_batch", build_samples(batch_events, self.series), "rows_in"
            )
        )
        after = self.current_tsid()
        self._new_since_compact += max(0, after - before)
        if (
            self.auto_compact_series is not None
            and self._new_since_compact >= self.auto_compact_series
        ):
            versioned_overwrite(
                build_postings(self.series).repartition("name"),
                postings_path,
                ["name"],
            )
            self.storage.compact()
            versioned_compact(self.spark, series_path)
            self.series, self.postings, _ = load_model(self.spark, self.store_dir)
            self._new_since_compact = 0
        return self

    @_tracked
    def compact(self) -> None:
        """Manual compaction of the materialized store — the reference's
        ``manual_compact`` (/root/reference/include/tagtree/index/
        index_server.h:48, src/index/index_server.cpp:199-203): rewrite
        each table into right-sized files, contents unchanged, then reload
        the model from the compacted layout. Only meaningful for engines
        over a store_dir; derived (in-memory) engines have nothing to
        compact."""
        if self.store_dir is None:
            raise ValueError("compact() requires an engine built from store_dir=")
        from tagtree_spark.tsdb.store import versioned_compact

        versioned_compact(self.spark, os.path.join(self.store_dir, "series"))
        versioned_compact(
            self.spark, os.path.join(self.store_dir, "postings"), ["name"]
        )
        self.storage.compact()
        self.series, self.postings, _ = load_model(self.spark, self.store_dir)

    @_tracked
    def retention(self, cutoff_date: str) -> int:
        """Apply the retention policy: drop samples partitions older than
        ``cutoff_date`` (ISO date). The index (series/postings) survives —
        matchers over expired ranges resolve to tsids with no samples,
        matching the reference's behaviour when its external storage
        expires data underneath the index. Store-backed engines only."""
        if self.store_dir is None:
            raise ValueError("retention() requires an engine built from store_dir=")
        from tagtree_spark.tsdb.store import retention_sweep

        return retention_sweep(self.spark, self.store_dir, cutoff_date)

    # -- metrics (reference wrapper.cpp:25-36 PrintStats) ------------------

    def stats(self) -> dict[str, dict[str, float]]:
        """Cumulative per-entry-point metrics since construction (or the
        last :meth:`reset_stats`): ``{method: {"calls": n, "wall_sec": s,
        "rows_out": r, "rows_in": r}}``. Pure driver-side counters —
        reading them costs nothing and triggers no job; row counters are
        harvested from Observations that Spark filled during the CALLER's
        actions (a returned frame the caller never executed reports no
        rows, matching the lazy read-path contract)."""
        self._harvest_obs()
        out: dict[str, dict[str, float]] = {}
        for name, (c, w) in self._stats.items():
            out[name] = {"calls": c, "wall_sec": w}
        for name, rows in self._row_stats.items():
            out.setdefault(name, {}).update(rows)
        return dict(sorted(out.items()))

    def print_stats(self) -> None:
        """The reference's ``PrintStats`` shape: one line per entry point,
        call count + cumulative wall + cumulative rows."""
        for name, m in self.stats().items():
            rows = " ".join(
                f"{k}={int(v)}" for k, v in m.items() if k.startswith("rows_")
            )
            print(
                f"{name:20s} calls={int(m.get('calls', 0)):<8d} "
                f"wall={m.get('wall_sec', 0.0):.6f}s {rows}"
            )

    def reset_stats(self) -> None:
        self._stats.clear()
        self._row_stats.clear()
        self._pending_obs.clear()

    # -- SQL surface -------------------------------------------------------

    def register_views(self, prefix: str = "") -> None:
        """Expose the model as temp views (``{prefix}series`` etc.) so the
        entire surface is reachable from spark.sql()."""
        self.series.createOrReplaceTempView(f"{prefix}series")
        self.postings.createOrReplaceTempView(f"{prefix}postings")
        self.samples.createOrReplaceTempView(f"{prefix}samples")
