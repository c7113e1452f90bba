"""TagTreeEngine facade: every reference IndexServer entry point through
one object, from both construction paths (derived and materialized)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tagtree_spark.engine import TagTreeEngine
from tagtree_spark.tsdb.matchers import LabelMatcher, MatchOp


def _engine(spark, events):
    return TagTreeEngine(spark, events=events)


def test_resolve_and_select(spark, events):
    eng = _engine(spark, events)
    m = [LabelMatcher(MatchOp.EQL, "event_type", "click")]
    tsids = {r.tsid for r in eng.resolve(m).collect()}
    assert tsids
    samples = eng.select(m)
    joined = samples.join(eng.series.where(F.col("event_type") != "click"), "tsid", "left_semi")
    assert joined.count() == 0  # only click-series samples selected


def test_label_values_and_get_labels(spark, events):
    eng = _engine(spark, events)
    vals = {r.value for r in eng.label_values("event_type").collect()}
    assert "click" in vals
    labels = eng.get_labels([1, 2]).collect()
    assert {r.tsid for r in labels} == {1, 2}


def test_write_path_roundtrip(spark, events):
    eng = TagTreeEngine(spark, events=events.where(F.col("event_id") % 2 == 0))
    before = eng.current_tsid()
    eng.add_series_batch(events.where(F.col("event_id") % 2 == 1))
    assert eng.current_tsid() >= before
    hits = eng.exists(eng.series.select("event_type", "user_bucket", "k_bucket"))
    assert hits.count() == eng.series.count()


def test_select_spans_batches(spark, events):
    """add_series_batch must APPEND samples (reference appender.cpp:14-23),
    not replace them: a select after a merge returns samples from BOTH the
    construction half and the merged half of the events split."""
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)
    eng = TagTreeEngine(spark, events=first)
    eng.add_series_batch(second)

    # every event lands in exactly one sample row → total must equal |events|
    assert eng.samples.count() == events.count()

    # a full select (no matchers beyond a tautology) spans both halves:
    # compare against samples built from the full event set in one shot
    full = TagTreeEngine(spark, events=events)
    merged_sum = eng.samples.agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("s"))
    full_sum = full.samples.agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("s"))
    assert merged_sum.collect()[0].s == full_sum.collect()[0].s

    # and the per-label-set sample counts agree with the one-shot model
    # (tsids differ between incremental and one-shot assignment — the merge
    # continues ids above the watermark — so compare via the label tuple)
    def by_labels(e):
        return {
            (r.event_type, r.user_bucket, r.k_bucket, r.n)
            for r in e.samples.join(e.series, "tsid")
            .groupBy("event_type", "user_bucket", "k_bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    assert by_labels(eng) == by_labels(full)


def test_sql_surface(spark, events):
    eng = _engine(spark, events)
    eng.register_views(prefix="tt_")
    n = spark.sql(
        "SELECT count(*) AS n FROM tt_postings WHERE name='event_type' AND value='click'"
    ).collect()[0].n
    assert n == eng.resolve([LabelMatcher(MatchOp.EQL, "event_type", "click")]).count()


def test_manual_compact(spark, events):
    """TagTreeEngine.compact() (reference manual_compact) rewrites the
    store tables without changing any query answer."""
    import shutil
    import tempfile

    import pytest

    from tagtree_spark.tsdb.store import materialize_model
    from tests.test_store import _tmp_root

    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-compact-eng-")
    try:
        materialize_model(spark, events, d)
        eng = TagTreeEngine(spark, store_dir=d)
        m = [LabelMatcher(MatchOp.EQL, "event_type", "click")]
        before_tsids = {r.tsid for r in eng.resolve(m).collect()}
        before_samples = eng.select(m).count()
        eng.compact()
        assert {r.tsid for r in eng.resolve(m).collect()} == before_tsids
        assert eng.select(m).count() == before_samples
    finally:
        shutil.rmtree(d, ignore_errors=True)

    with pytest.raises(ValueError):
        TagTreeEngine(spark, events=events).compact()


def test_store_construction(spark, events):
    import shutil
    import tempfile

    from tagtree_spark.tsdb.store import materialize_model
    from tests.test_store import _tmp_root

    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-engine-")
    try:
        materialize_model(spark, events, d)
        eng = TagTreeEngine(spark, store_dir=d)
        m = [LabelMatcher(MatchOp.EQL, "event_type", "click")]
        derived = TagTreeEngine(spark, events=events)
        assert {r.tsid for r in eng.resolve(m).collect()} == {
            r.tsid for r in derived.resolve(m).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ingest_batch_auto_compacts_bounded_files(spark, events):
    """Volume-triggered auto-compaction (reference: compact every 100k new
    series): across N store-backed batch ingests, the samples file count
    stays bounded by the compaction cadence, and contents equal the model
    derived from all events at once."""
    import glob
    import shutil
    import tempfile

    from tagtree_spark.tsdb.model import build_model
    from tagtree_spark.tsdb.store import materialize_model
    from tests.test_store import _tmp_root

    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-autocompact-")
    try:
        base = events.where(F.col("event_id") % 5 == 0)
        materialize_model(spark, base, d)
        # trigger on EVERY batch that adds >=1 series → file count must
        # stay flat instead of growing by ~n_partitions files per batch
        eng = TagTreeEngine(spark, store_dir=d, auto_compact_series=1)
        counts = []
        for k in range(1, 5):
            eng.ingest_batch(events.where(F.col("event_id") % 5 == k))
            counts.append(len(glob.glob(f"{d}/samples/ds=*/*.parquet")))
        assert counts[-1] <= counts[0] + 3, counts  # bounded, not linear
        # contents: identical to the all-at-once model
        _, _, samples_all = build_model(events)
        assert eng.samples.count() == samples_all.count()
        assert eng.series.count() == build_model(events)[0].count()
        # and the new series are queryable end-to-end
        m = [LabelMatcher(MatchOp.EQL, "event_type", "click")]
        derived = TagTreeEngine(spark, events=events)
        assert eng.select(m).count() == derived.select(m).count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ingest_batch_no_compact_accumulates_then_manual(spark, events):
    """With the trigger disabled, files accumulate per batch (the behavior
    the trigger exists to bound); a manual compact() folds them back."""
    import glob
    import shutil
    import tempfile

    from tagtree_spark.tsdb.store import materialize_model
    from tests.test_store import _tmp_root

    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-nocompact-")
    try:
        materialize_model(spark, events.where(F.col("event_id") % 3 == 0), d)
        eng = TagTreeEngine(spark, store_dir=d, auto_compact_series=None)
        n0 = len(glob.glob(f"{d}/samples/ds=*/*.parquet"))
        eng.ingest_batch(events.where(F.col("event_id") % 3 == 1))
        eng.ingest_batch(events.where(F.col("event_id") % 3 == 2))
        n2 = len(glob.glob(f"{d}/samples/ds=*/*.parquet"))
        assert n2 > n0
        # store-backed rows_in fills during the append write itself (the
        # parquet write is an action over the observed samples frame)
        exp = events.where(F.col("event_id") % 3 != 0).count()
        assert eng.stats()["ingest_batch"].get("rows_in", 0) == exp
        total = eng.samples.count()
        eng.compact()
        assert eng.samples.count() == total
        n3 = len(glob.glob(f"{d}/samples/ds=*/*.parquet"))
        assert n3 < n2
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pluggable_sample_storage_seam(spark, events):
    """The reference's abstract Storage (storage.h:49-53): the index layer
    talks to SampleStorage only — a caller-supplied backend sees every
    select/append, and swapping it never touches index code."""
    from tagtree_spark.tsdb.model import build_model
    from tagtree_spark.tsdb.storage import MemorySampleStorage

    calls = []

    class SpyStorage(MemorySampleStorage):
        def select(self, tsids, start=None, end=None):
            calls.append("select")
            return super().select(tsids, start, end)

        def append(self, samples):
            calls.append("append")
            return super().append(samples)

    _, _, samples = build_model(events)
    eng = TagTreeEngine(spark, events=events, storage=SpyStorage(samples))
    m = [LabelMatcher(MatchOp.EQL, "event_type", "click")]
    n = eng.select(m).count()
    assert n > 0 and calls == ["select"]
    eng.add_series_batch(events.limit(50))
    assert calls == ["select", "append"]
    # the engine's sample view IS the storage's view
    assert eng.samples is eng.storage.read() or eng.samples.count() == eng.storage.read().count()


def test_add_series_batch_store_backed_commits_series_first(spark, events):
    """On a store-backed engine, add_series_batch must not durably append
    samples while the merged series stays uncommitted — a crash would leave
    orphan sample files whose tsids a later ingest could reassign (ADVICE
    r4 medium). It delegates to ingest_batch, which commits series before
    appending samples; the committed series watermark must cover every tsid
    present in the durable sample store."""
    import shutil
    import tempfile

    from tagtree_spark.tsdb.store import materialize_model
    from tests.test_store import _tmp_root

    d = tempfile.mkdtemp(dir=_tmp_root(), prefix="tagtree-addbatch-store-")
    try:
        base = events.where(F.col("event_id") % 3 == 0)
        materialize_model(spark, base, d)
        eng = TagTreeEngine(spark, store_dir=d, auto_compact_series=None)
        eng.add_series_batch(events.where(F.col("event_id") % 3 == 1))
        # committed (reloaded) series must cover every durable sample tsid
        committed = TagTreeEngine(spark, store_dir=d)
        max_sample_tsid = eng.samples.agg(F.max("tsid").alias("m")).collect()[0].m
        assert committed.current_tsid() >= max_sample_tsid
        # and answers match the in-memory view
        assert committed.series.count() == eng.series.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_engine_stats_counters_advance(spark, events):
    """Per-entry-point metrics (the reference's PrintStats counterpart,
    wrapper.cpp:25-36): counters must advance across resolve/select/ingest
    calls, accumulate wall time, and reset cleanly."""
    eng = TagTreeEngine(spark, events=events)
    assert eng.stats() == {}
    m = [LabelMatcher(MatchOp.EQL, "event_type", "click")]
    eng.resolve(m)
    eng.resolve(m)
    eng.select(m).count()
    eng.label_values("event_type")
    eng.add_series_batch(events.limit(20))
    s = eng.stats()
    assert s["resolve"]["calls"] == 2
    assert s["select"]["calls"] == 1  # select does not double-count resolve
    assert s["label_values"]["calls"] == 1
    assert s["add_series_batch"]["calls"] == 1
    assert all(v["wall_sec"] >= 0 for v in s.values())
    assert sum(v["wall_sec"] for v in s.values()) > 0
    eng.reset_stats()
    assert eng.stats() == {}


def test_engine_stats_row_counters(spark, events):
    """Row telemetry (VERDICT r5 item 7): rows_out/rows_in accumulate via
    Observations filled during the CALLER's actions — no extra jobs, and
    an unexecuted lazy frame reports nothing."""
    eng = TagTreeEngine(spark, events=events)
    m = [LabelMatcher(MatchOp.EQL, "event_type", "click")]
    n1 = eng.resolve(m).count()
    s = eng.stats()
    assert s["resolve"]["rows_out"] == n1 > 0
    n2 = eng.resolve(m).count()  # second call accumulates
    assert eng.stats()["resolve"]["rows_out"] == n1 + n2
    # a never-executed frame contributes nothing (lazy contract)
    eng.label_values("event_type")
    assert "rows_out" not in eng.stats().get("label_values", {})
    # select rows ride the caller's count()
    k = eng.select(m).count()
    assert eng.stats()["select"]["rows_out"] == k > 0
    # write path records rows_in for the ingested batch; the count rides
    # the appended samples frame (the one consumed-once plan point —
    # ADVICE r6 high), so it fills when those samples first flow
    eng.add_series_batch(events.limit(20))
    eng.current_tsid()  # merged model executes; samples not yet read
    assert eng.stats()["add_series_batch"].get("rows_in", 0) == 0
    eng.samples.count()  # first action over the appended samples
    assert eng.stats()["add_series_batch"].get("rows_in", 0) >= 20
    assert eng.stats()["current_tsid"]["rows_out"] >= 1
    eng.reset_stats()
    assert eng.stats() == {}


def test_engine_retention_drops_old_samples_keeps_index(spark, events, tmpdir):
    from pyspark.sql import functions as F

    from tagtree_spark.engine import TagTreeEngine
    from tagtree_spark.tsdb.store import materialize_model

    d = f"{tmpdir}/eng-ret"
    materialize_model(spark, events, d)
    eng = TagTreeEngine(spark, store_dir=d)
    days = sorted(
        r.ds
        for r in eng.storage.read().select(F.to_date("ts").alias("ds")).distinct().collect()
    )
    n = eng.retention(str(days[1]))
    assert n >= 1
    left = sorted(
        r.ds
        for r in eng.storage.read().select(F.to_date("ts").alias("ds")).distinct().collect()
    )
    assert min(left) == days[1]
    # the index still answers matchers (possibly resolving to expired range)
    assert eng.series.count() > 0 and eng.postings.count() > 0
    assert eng.stats()["retention"]["calls"] == 1


def test_resolve_accepts_selector_strings(spark, events):
    """The text front-end is wired through the engine: resolve/select
    accept '{...}' selector strings and lower them to the same matcher
    structs (VERDICT r8 #6)."""
    eng = _engine(spark, events)
    structs = [
        LabelMatcher(MatchOp.EQL, "event_type", "click"),
        LabelMatcher(MatchOp.NEQ, "user_bucket", "u1"),
    ]
    text = '{event_type="click", user_bucket!="u1"}'
    a = {r.tsid for r in eng.resolve(structs).collect()}
    b = {r.tsid for r in eng.resolve(text).collect()}
    assert a == b and a
    assert eng.select(text).count() == eng.select(structs).count()
    import pytest

    from tagtree_spark.tsdb.selector import SelectorParseError

    with pytest.raises(SelectorParseError):
        eng.resolve('{event_type=click}')  # unquoted value


def test_readme_quickstart_selector_roundtrip(spark, events):
    """The README 'Quick start' flow, verbatim shape (VERDICT r9 #7):
    materialize the store, open the engine on it, and drive every entry
    point with SELECTOR STRINGS — string-in → DataFrame-out against the
    persisted store, no matcher objects in caller code."""
    import shutil
    import tempfile

    from tagtree_spark.tsdb.store import materialize_model

    d = tempfile.mkdtemp(prefix="tagtree-quickstart-")
    try:
        materialize_model(spark, events, d)
        eng = TagTreeEngine(spark, store_dir=d)

        sel = '{event_type="click", user_bucket=~"u[0-4]", k_bucket!="k9"}'
        tsids = eng.resolve(sel)
        got = {r.tsid for r in tsids.collect()}
        # string parse ≡ explicit matcher list
        want = {
            r.tsid
            for r in eng.resolve(
                [
                    LabelMatcher(MatchOp.EQL, "event_type", "click"),
                    LabelMatcher(MatchOp.EQL_REGEX, "user_bucket", "u[0-4]"),
                    LabelMatcher(MatchOp.NEQ, "k_bucket", "k9"),
                ]
            ).collect()
        }
        assert got == want and got

        samples = eng.select(sel)
        assert set(samples.columns) >= {"tsid", "ts", "value"}
        assert {r.tsid for r in samples.select("tsid").distinct().collect()} <= got

        assert "click" in {r.value for r in eng.label_values("event_type").collect()}
        assert {r.tsid for r in eng.get_labels([1, 2]).collect()} == {1, 2}
        # returned frames are plain lazy DataFrames — compose with Spark
        assert samples.groupBy("tsid").count().count() == len(got)
        stats = eng.stats()
        assert stats  # telemetry populated by the calls above
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_query_promql_expression(spark, events):
    """engine.query('<expr>') — the r12 expression front-end through the
    public facade: selector matchers resolve via THIS engine's postings,
    `by` labels via its series table."""
    eng = _engine(spark, events)
    rows = eng.query(
        'sum by (event_type) (increase(events_total{event_type="click"}[1d]))'
    ).collect()
    assert rows and {r.event_type for r in rows} == {"click"}
    assert set(rows[0].asDict()) == {"event_type", "bucket", "value"}
    # unfiltered count matches the engine's own series surface
    per_series = eng.query("count_over_time(events_total[1000d])").collect()
    n_series = eng.series.count()
    assert len(per_series) == n_series


def test_register_metric_and_at_eval(spark, events):
    """r13 facade surface: register_metric adds names to the expression
    registry (VERDICT r12 #2); @ instant eval honors the query-level
    lookback; unknown names error listing the registry."""
    import pytest as _pt

    from tagtree_spark.tsdb.exprlang import ExprParseError

    eng = _engine(spark, events)
    eng.register_metric(
        "events_alias", eng.samples, eng.postings, eng.series
    )
    a = eng.query("increase(events_total[1000d])").collect()
    b = eng.query("increase(events_alias[1000d])").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and a
    with _pt.raises(ExprParseError, match="events_alias"):
        eng.query("increase(nope[1000d])")
    # @ instant evaluation through the facade, wide lookback
    iv = eng.query(
        "events_total @ 1706227200", lookback_ms=30 * 86400 * 1000
    ).collect()
    # every series with a sample at-or-before the eval ts appears once
    import pyspark.sql.functions as SF

    expected = (
        eng.samples.where(SF.col("ts") <= SF.lit("2024-01-26 00:00:00"))
        .select("tsid")
        .distinct()
        .count()
    )
    assert len(iv) == expected and iv
    assert all(r.bucket == 1706227200 * 1_000_000 for r in iv)
