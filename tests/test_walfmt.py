"""Byte-level WAL format (tsdb/walfmt.py): golden-byte framing pins,
fragmentation across pages and segments, CRC/torn-write rejection,
checkpoint round-trip, record serializer round-trip (incl. unicode), a
hypothesis property over random record streams, and the distributed
Spark read."""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tagtree_spark.tsdb.walfmt import (
    PAGE_SIZE,
    RECORD_HEADER_SIZE,
    CheckpointStats,
    WalWriter,
    deserialize_series,
    last_checkpoint,
    read_segment_records,
    read_wal_records,
    read_wal_series,
    serialize_series,
)


@pytest.fixture()
def wal_dir():
    d = tempfile.mkdtemp(prefix="tagtree-walfmt-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_golden_bytes_single_full_chunk(wal_dir):
    """Pin the exact on-disk framing of one small record: type=FULL(1),
    u16 BIG-endian length, u32 LITTLE-endian zlib CRC, payload — the
    reference's chunk layout (wal.cpp:207-218)."""
    w = WalWriter(wal_dir)
    rec = b"hello wal"
    w.log_record(rec)
    w.close()
    raw = open(os.path.join(wal_dir, "00000001"), "rb").read()
    expect = b"\x01" + struct.pack(">H", len(rec)) + struct.pack(
        "<I", zlib.crc32(rec)
    ) + rec
    assert raw[: len(expect)] == expect
    assert list(read_segment_records(raw)) == [rec]


def test_fragmentation_first_middle_last(wal_dir):
    """A record spanning 3 pages fragments FIRST/MIDDLE/LAST with per-chunk
    CRCs; page boundaries carry fresh 7-byte headers."""
    w = WalWriter(wal_dir)
    rec = bytes(range(256)) * 40  # 10240 bytes > 2 pages
    w.log_record(rec)
    w.close()
    raw = open(os.path.join(wal_dir, "00000001"), "rb").read()
    types = [raw[p * PAGE_SIZE] for p in range(3)]
    assert types == [2, 3, 4]  # FIRST, MIDDLE, LAST
    assert list(read_segment_records(raw)) == [rec]


def test_page_tail_padding_and_many_records(wal_dir):
    """Records sized to leave < header-size tail bytes force type-0 zero
    padding; the reader skips to the next page (reader.cpp:63-66)."""
    w = WalWriter(wal_dir)
    recs = [bytes([i]) * (PAGE_SIZE - RECORD_HEADER_SIZE - 3) for i in range(5)]
    for r in recs:
        w.log_record(r)
    w.close()
    raw = open(os.path.join(wal_dir, "00000001"), "rb").read()
    assert list(read_segment_records(raw)) == recs


def test_segment_rollover(wal_dir):
    """With a tiny max_segment_size, records roll into new %08d segments
    and the multi-segment read returns everything in order."""
    w = WalWriter(wal_dir, max_segment_size=4 * PAGE_SIZE)
    recs = [bytes([i]) * 3000 for i in range(12)]
    for r in recs:
        w.log_record(r)
    w.close()
    assert len(WalWriter.segments(wal_dir)) > 1
    assert list(read_wal_records(wal_dir)) == recs


def test_crc_damage_interior_raises_tail_recovers(wal_dir):
    """Recovery semantics (review r9): a CRC-bad chunk followed by more
    (non-zero) chunks is real interior corruption and raises; the same
    damage followed only by zero padding is a writer crash tail — the
    torn record drops and the valid prefix is served; a truncated file
    tail likewise stops cleanly."""
    w = WalWriter(wal_dir)
    w.log_record(b"x" * 100)
    w.log_record(b"y" * 100)  # second chunk = non-zero tail after the first
    w.close()
    raw = bytearray(open(os.path.join(wal_dir, "00000001"), "rb").read())
    flipped = bytearray(raw)
    flipped[10] ^= 0xFF  # payload byte of record 1 → interior CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        list(read_segment_records(bytes(flipped)))
    # damage the SECOND record (zero tail after it): crash-tail recovery
    flipped2 = bytearray(raw)
    flipped2[RECORD_HEADER_SIZE + 100 + 10] ^= 0xFF
    assert list(read_segment_records(bytes(flipped2))) == [b"x" * 100]
    # truncated mid-chunk: clean stop after the valid prefix
    assert list(read_segment_records(bytes(raw[: RECORD_HEADER_SIZE + 100 + 50]))) == [
        b"x" * 100
    ]


def test_crash_reopen_recovers_and_resumes(wal_dir):
    """Crash mid-record, writer reopens (zero-pads the torn page, resumes
    next page): the torn record drops, every record before and AFTER the
    crash is served — the tear never poisons the segment (review r9)."""
    w1 = WalWriter(wal_dir)
    w1.log_record(b"a" * 50)
    w1.log_record(b"b" * 80)
    w1.close()
    seg = os.path.join(wal_dir, "00000001")
    # crash: the second record's payload is cut short on disk
    with open(seg, "r+b") as f:
        f.truncate(RECORD_HEADER_SIZE + 50 + RECORD_HEADER_SIZE + 30)
    w2 = WalWriter(wal_dir)  # pads the torn page, resumes page-aligned
    w2.log_record(b"c" * 60)
    w2.close()
    assert list(read_wal_records(wal_dir)) == [b"a" * 50, b"c" * 60]


def test_checkpoint_roundtrip_and_torn_rejection(wal_dir):
    w = WalWriter(wal_dir)
    w.write_checkpoint(watermark=12345, segment=7, max_timestamp=2**40 + 17)
    got = last_checkpoint(wal_dir)
    assert (got.last_segment, got.low_watermark, got.max_timestamp, got.valid) == (
        7,
        12345,
        2**40 + 17,
        True,
    )
    # torn/corrupt checkpoint rolls back to empty stats
    with open(os.path.join(wal_dir, "checkpoint.meta"), "r+b") as f:
        f.seek(3)
        f.write(b"\xff")
    assert last_checkpoint(wal_dir) == CheckpointStats()
    w.close()


def test_series_record_serializer_roundtrip():
    series = [
        (1, 1700000000000, [("__name__", "métrique"), ("job", "node")]),
        (2**40, 0, []),
        (7, 42, [("k", "v" * 300)]),
    ]
    buf = serialize_series(series)
    assert struct.unpack_from("<I", buf, 0)[0] == 1  # LRT_SERIES
    assert deserialize_series(buf) == series


@settings(max_examples=60, deadline=None)
@given(
    recs=st.lists(st.binary(min_size=1, max_size=3 * PAGE_SIZE), min_size=1, max_size=20),
    seg_pages=st.integers(min_value=2, max_value=8),
)
def test_wal_roundtrip_property(recs, seg_pages):
    d = tempfile.mkdtemp(prefix="tagtree-walprop-")
    try:
        w = WalWriter(d, max_segment_size=seg_pages * PAGE_SIZE)
        for r in recs:
            w.log_record(r)
        w.close()
        assert list(read_wal_records(d)) == recs
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_reopen_appends_after_existing_records(wal_dir):
    """A writer reopened over an existing log pads any torn tail page and
    appends; earlier records stay readable (wal.cpp open_write_segment)."""
    w1 = WalWriter(wal_dir)
    w1.log_record(b"first")
    w1.close()
    w2 = WalWriter(wal_dir)
    w2.log_record(b"second")
    w2.close()
    assert list(read_wal_records(wal_dir)) == [b"first", b"second"]


def test_distributed_spark_read(spark, wal_dir):
    """read_wal_series parses segments executor-side (one task per file)
    and returns the exact series rows written, across a rollover."""
    w = WalWriter(wal_dir, max_segment_size=4 * PAGE_SIZE)
    expect = []
    for batch in range(6):
        series = [
            (batch * 10 + i, 1000 + batch, [("job", f"j{batch}"), ("i", str(i))])
            for i in range(8)
        ]
        expect.extend(series)
        w.log_record(serialize_series(series))
    w.write_checkpoint(watermark=59, segment=w.last_segment, max_timestamp=1005)
    w.close()
    df = read_wal_series(spark, wal_dir)
    got = sorted(
        (r.tsid, r.ts, tuple(sorted(r.labels.items()))) for r in df.collect()
    )
    want = sorted((t, ts, tuple(sorted(ls))) for t, ts, ls in expect)
    assert got == want
    assert last_checkpoint(wal_dir).low_watermark == 59


def test_wal_data_source_batch_and_stream(spark, wal_dir):
    """The tagtree_wal Python data source: batch read covers every
    segment; the streaming tail serves flushed pages (here all pages —
    close_segment() padded and rolled over), so the drained stream
    equals the batch read."""
    from tagtree_spark.tsdb.walfmt import register_wal_source

    w = WalWriter(wal_dir, max_segment_size=4 * PAGE_SIZE)
    expect = []
    for batch in range(5):
        series = [
            (batch * 10 + i, 77, [("b", str(batch))]) for i in range(6)
        ]
        expect.extend(series)
        w.log_record(serialize_series(series))
    w.close_segment()  # close the head so every record is tail-visible
    w.close()

    register_wal_source(spark)
    got = sorted(
        (r.tsid, r.ts, tuple(sorted(r.labels.items())))
        for r in spark.read.format("tagtree_wal").option("path", wal_dir).load().collect()
    )
    want = sorted((t, ts, tuple(sorted(ls))) for t, ts, ls in expect)
    assert got == want

    q = (
        spark.readStream.format("tagtree_wal")
        .option("path", wal_dir)
        .load()
        .writeStream.format("memory")
        .queryName("wal_tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    tailed = sorted(
        (r.tsid, r.ts, tuple(sorted(r.labels.items())))
        for r in spark.sql("SELECT * FROM wal_tail").collect()
    )
    assert tailed == want  # the freshly-created empty head segment is excluded


def test_page_range_reader_attributes_records_to_final_chunk_page(wal_dir):
    """read_page_range_records: a record belongs to the page of its
    FULL/LAST chunk; a head fragment before the range is reassembled via
    backtrack; a record ending past the range is left for the next one."""
    from tagtree_spark.tsdb.walfmt import read_page_range_records

    w = WalWriter(wal_dir)
    small = b"s" * 100                       # FULL in page 0
    big = bytes(range(256)) * 24             # 6144 B: FIRST page 0 → LAST page 1
    tail = b"t" * 200                        # FULL in page 1
    w.log_record(small)
    w.log_record(big)
    w.log_record(tail)
    w.close()
    p = os.path.join(wal_dir, "00000001")
    n_pages = (os.path.getsize(p) + PAGE_SIZE - 1) // PAGE_SIZE  # close() leaves a partial tail page
    assert list(read_page_range_records(p, 0, 1)) == [small]
    # page 1 holds big's LAST chunk (backtrack reassembles its FIRST) + tail
    assert list(read_page_range_records(p, 1, n_pages)) == [big, tail]
    # union over any split == whole-segment read
    whole = list(read_segment_records(open(p, "rb").read()))
    for cut in range(n_pages + 1):
        parts = list(read_page_range_records(p, 0, cut)) + list(
            read_page_range_records(p, cut, n_pages)
        )
        assert parts == whole, cut


def test_stream_tails_live_segment_without_rollover(spark, wal_dir):
    """VERDICT r9 #2: records appended to the LIVE segment (no rollover
    ever happens) arrive through the streaming tail at flushed-page
    granularity, and a restart on the same checkpoint is idempotent."""
    import shutil as _sh
    import tempfile as _tf

    from tagtree_spark.tsdb.walfmt import register_wal_source

    register_wal_source(spark)
    out = _tf.mkdtemp(prefix="tagtree-livetail-")

    def drain():
        q = (
            spark.readStream.format("tagtree_wal")
            .option("path", wal_dir)
            .load()
            .writeStream.format("parquet")
            .option("path", f"{out}/log")
            .option("checkpointLocation", f"{out}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return sorted(
            (r.tsid, r.ts, tuple(sorted(r.labels.items())))
            for r in spark.read.parquet(f"{out}/log").collect()
        )

    try:
        w = WalWriter(wal_dir)  # 128 MiB cap — nothing ever rolls over
        first = [(i, 5, [("a", str(i))]) for i in range(40)]
        w.log_record(serialize_series(first))
        # flush-pad the tail page so the record is page-visible (the
        # durability point); the writer stays on the SAME segment
        w.flush_page()
        want = sorted((t, ts, (("a", str(t)),)) for t, ts, _ in first)
        assert drain() == want

        second = [(100 + i, 6, [("b", str(i))]) for i in range(40)]
        w.log_record(serialize_series(second))
        w.flush_page()
        w.close()
        want += sorted((100 + i, 6, (("b", str(i)),)) for i in range(40))
        assert drain() == sorted(want)
        # replay idempotence: a third drain with no new data adds nothing
        assert drain() == sorted(want)
    finally:
        _sh.rmtree(out, ignore_errors=True)


@settings(max_examples=40, deadline=None)
@given(
    recs=st.lists(
        st.binary(min_size=1, max_size=2 * PAGE_SIZE), min_size=1, max_size=12
    ),
    cut_seed=st.integers(min_value=0, max_value=10_000),
)
def test_page_range_union_property(recs, cut_seed):
    """For ANY record stream and ANY page split point, the two range
    reads concatenate to exactly the whole-segment read — the invariant
    that makes the streaming tail's batch boundaries safe wherever they
    land (records attributed to their FULL/LAST chunk's page, head
    fragments reassembled via backtrack)."""
    import tempfile

    from tagtree_spark.tsdb.walfmt import read_page_range_records

    d = tempfile.mkdtemp(prefix="tagtree-rangeprop-")
    try:
        w = WalWriter(d)
        for r in recs:
            w.log_record(r)
        w.close()
        p = os.path.join(d, "00000001")
        n_pages = (os.path.getsize(p) + PAGE_SIZE - 1) // PAGE_SIZE
        cut = cut_seed % (n_pages + 1)
        parts = list(read_page_range_records(p, 0, cut)) + list(
            read_page_range_records(p, cut, n_pages)
        )
        assert parts == recs, (cut, n_pages)
    finally:
        shutil.rmtree(d, ignore_errors=True)
