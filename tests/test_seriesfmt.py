"""Byte-level series-file + symbol-table formats (tsdb/seriesfmt.py):
golden-byte pins of the header/entry/symbol layouts, CRC rejection,
page-packing behavior, reopen-and-append, a hypothesis round-trip over
random stores, and the distributed Spark read."""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tagtree_spark.tsdb.seriesfmt import (
    MAX_LABELS_PER_ENTRY,
    PAGE_SIZE,
    SERIES_MAGIC,
    SYMTAB_MAGIC,
    SYMTAB_NAME,
    SeriesFile,
    SeriesStoreWriter,
    SymbolTableFile,
    header_size,
    iter_segment_postings,
    load_symbols,
    load_symbols_bytes,
    postings_from_series_files,
    series_seg_index,
    series_seg_path,
)


@pytest.fixture()
def sdir():
    d = tempfile.mkdtemp(prefix="tagtree-seriesfmt-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_symtab_golden_bytes(sdir):
    """Pin the exact on-disk symbol.tab layout: u32 LE magic 0x5453594D
    then [len u32 LE][bytes]* in insertion order (symbol_table.cpp:
    84-87 create, 153-169 append)."""
    t = SymbolTableFile(os.path.join(sdir, SYMTAB_NAME))
    assert t.add_symbol("job") == 0
    assert t.add_symbol("api") == 1
    assert t.add_symbol("job") == 0  # dedup returns the existing ref
    t.flush()
    raw = open(os.path.join(sdir, SYMTAB_NAME), "rb").read()
    assert raw == (
        struct.pack("<I", SYMTAB_MAGIC)
        + struct.pack("<I", 3) + b"job"
        + struct.pack("<I", 3) + b"api"
    )
    assert load_symbols_bytes(raw) == ["job", "api"]


def test_symtab_reopen_appends_and_unicode(sdir):
    p = os.path.join(sdir, SYMTAB_NAME)
    t = SymbolTableFile(p)
    t.add_symbol("naïve™")
    t.flush()
    t2 = SymbolTableFile(p)  # reload assigns the same refs
    assert t2.get_symbol(0) == "naïve™"
    assert t2.add_symbol("naïve™") == 0
    assert t2.add_symbol("new") == 1
    t2.flush()
    assert load_symbols(sdir) == ["naïve™", "new"]


def test_symtab_bad_magic_raises():
    with pytest.raises(ValueError, match="bad magic"):
        load_symbols_bytes(b"\x00\x00\x00\x00")


def test_series_file_golden_bytes(sdir):
    """Pin the series-file layout for one entry: header = magic +
    offset table + CRC padded to (3+segment_size)*4 → page multiple
    (series_file.cpp:34-41,216-227); entry = [n u16][(name_ref,
    value_ref) u32 pairs][crc u32] at the offset-table slot's absolute
    offset (series_file.cpp:91-123)."""
    seg_size = 8
    path = series_seg_path(sdir, 0)
    sf = SeriesFile(path, create=True, segment_size=seg_size)
    sf.write_entry(3, [(0, 1), (2, 3)])
    sf.flush()
    raw = open(path, "rb").read()
    hdr = header_size(seg_size)
    assert hdr == PAGE_SIZE  # (3+8)*4 = 44 → one page
    assert len(raw) == hdr + PAGE_SIZE  # header + one data page
    assert struct.unpack_from("<I", raw, 0)[0] == SERIES_MAGIC
    offsets = struct.unpack_from(f"<{seg_size}I", raw, 4)
    assert offsets == (0, 0, 0, hdr, 0, 0, 0, 0)
    table_raw = raw[4 : 4 + 4 * seg_size]
    assert struct.unpack_from("<I", raw, 4 + 4 * seg_size)[0] == zlib.crc32(
        table_raw
    )
    body = struct.pack("<H", 2) + struct.pack("<IIII", 0, 1, 2, 3)
    assert raw[hdr : hdr + len(body) + 4] == body + struct.pack(
        "<I", zlib.crc32(body)
    )
    assert sf.read_entry(3) == [(0, 1), (2, 3)]
    assert sf.read_entry(0) is None


def test_series_entry_crc_damage_raises(sdir):
    seg_size = 8
    path = series_seg_path(sdir, 0)
    sf = SeriesFile(path, create=True, segment_size=seg_size)
    sf.write_entry(1, [(7, 9)])
    sf.flush()
    hdr = header_size(seg_size)
    raw = bytearray(open(path, "rb").read())
    raw[hdr + 3] ^= 0xFF  # flip a ref byte
    open(path, "wb").write(bytes(raw))
    sf2 = SeriesFile(path, create=False, segment_size=seg_size)
    with pytest.raises(ValueError, match="bad checksum"):
        sf2.read_entry(1)
    # header damage is caught on open
    raw[5] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="bad checksum"):
        SeriesFile(path, create=False, segment_size=seg_size)


def test_entries_never_cross_pages(sdir):
    """Entries that would straddle a page boundary open a fresh page
    (series_file.cpp:100-103) — every stored offset satisfies
    off % PAGE_SIZE + entry_size <= PAGE_SIZE."""
    seg_size = 512
    path = series_seg_path(sdir, 0)
    sf = SeriesFile(path, create=True, segment_size=seg_size)
    n_labels = 60  # entry size 2 + 480 + 4 = 486 → 8 per page, 34 left over
    for i in range(20):
        sf.write_entry(i, [(i, k) for k in range(n_labels)])
    sf.flush()
    entry_size = 2 + 8 * n_labels + 4
    for i in range(20):
        off = sf.offset_table[i]
        assert off % PAGE_SIZE + entry_size <= PAGE_SIZE
        assert sf.read_entry(i) == [(i, k) for k in range(n_labels)]
    with pytest.raises(ValueError, match="exceeds one page"):
        sf.write_entry(0, [(0, 0)] * (MAX_LABELS_PER_ENTRY + 1))


def test_series_file_reopen_overwrite_and_append(sdir):
    """A reopened file serves existing entries, accepts new ones, and an
    index REWRITE points its offset-table slot at the new copy (the
    reference's LRU-evict rewrite path)."""
    seg_size = 16
    path = series_seg_path(sdir, 0)
    sf = SeriesFile(path, create=True, segment_size=seg_size)
    sf.write_entry(2, [(1, 2)])
    sf.flush()
    sf2 = SeriesFile(path, create=False, segment_size=seg_size)
    assert sf2.read_entry(2) == [(1, 2)]
    sf2.write_entry(5, [(3, 4)])
    sf2.write_entry(2, [(9, 9)])  # rewrite
    sf2.flush()
    sf3 = SeriesFile(path, create=False, segment_size=seg_size)
    assert sf3.read_entry(5) == [(3, 4)]
    assert sf3.read_entry(2) == [(9, 9)]


@settings(max_examples=25, deadline=None)
@given(
    entries=st.dictionaries(
        st.integers(min_value=0, max_value=95),  # tsids across 3 segments
        st.lists(
            st.tuples(
                st.text(min_size=1, max_size=8),
                st.text(min_size=0, max_size=8),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_store_roundtrip_property(entries):
    """Random stores round-trip through the byte formats: every written
    (tsid, labels) list is recovered ref-exactly via the store walk."""
    d = tempfile.mkdtemp(prefix="tagtree-seriesprop-")
    try:
        seg_size = 32
        w = SeriesStoreWriter(d, segment_size=seg_size)
        for tsid, labels in entries.items():
            w.add(tsid, labels)
        w.flush()
        syms = load_symbols(d)
        got = {}
        for seg in sorted(
            int(os.path.basename(p))
            for p in __import__("glob").glob(os.path.join(d, "[0-9]" * 8))
        ):
            content = open(series_seg_path(d, seg), "rb").read()
            for tsid, nref, vref in iter_segment_postings(
                content, seg, seg_size
            ):
                got.setdefault(tsid, []).append((syms[nref], syms[vref]))
        assert got == {t: list(ls) for t, ls in entries.items()}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_seg_index_mapping():
    assert series_seg_index(0, 4096) == (0, 0)
    assert series_seg_index(4095, 4096) == (0, 4095)
    assert series_seg_index(4096, 4096) == (1, 0)
    assert series_seg_path("/x", 7).endswith("/00000007")


def test_distributed_spark_read(spark, sdir):
    """postings_from_series_files: one binaryFile task per segment,
    refs resolved through the broadcast dictionary — matches the
    driver-side walk exactly."""
    seg_size = 64
    w = SeriesStoreWriter(sdir, segment_size=seg_size)
    expect = set()
    for tsid in range(0, 150, 7):  # spans 3 segments with gaps
        labels = [("job", f"j{tsid % 5}"), ("host", f"h{tsid % 3}")]
        w.add(tsid, labels)
        expect |= {(tsid, n, v) for n, v in labels}
    w.flush()
    got = {
        (r.tsid, r.name, r.value)
        for r in postings_from_series_files(spark, sdir, seg_size).collect()
    }
    assert got == expect


def test_truncated_header_raises_cleanly(sdir):
    """A file cut inside the header (or an empty page-aligned file) must
    raise the corruption ValueError, not a raw struct error."""
    seg_size = 8
    path = series_seg_path(sdir, 0)
    sf = SeriesFile(path, create=True, segment_size=seg_size)
    sf.write_entry(0, [(1, 2)])
    sf.flush()
    with open(path, "r+b") as f:
        f.truncate(10)  # mid-offset-table
    with pytest.raises(ValueError, match="short header|bad header|bad checksum"):
        SeriesFile(path, create=False, segment_size=seg_size)
    with pytest.raises(ValueError, match="short header|bad magic"):
        iter_segment_postings(open(path, "rb").read().ljust(4, b"\x00"), 0, seg_size).__next__()


def test_truncated_after_header_is_valueerror(tmp_path):
    """A segment file cut right after its CRC-valid header (offset table
    intact, data pages gone) must fail with the corruption taxonomy's
    ValueError, not a raw struct.error (review r10)."""
    import glob
    import os

    import pytest

    from tagtree_spark.tsdb import seriesfmt as sf

    d = str(tmp_path / "series")
    w = sf.SeriesStoreWriter(d, segment_size=64)
    for t in range(1, 9):
        w.add(t, [("job", f"j{t % 3}"), ("inst", f"i{t}")])
    w.flush()
    segf = [
        p
        for p in sorted(glob.glob(os.path.join(d, "*")))
        if "sym" not in os.path.basename(p)
    ][0]
    content = open(segf, "rb").read()
    assert len(list(sf.iter_segment_postings(content, 0, 64))) == 16
    with pytest.raises(ValueError, match="offset past end"):
        list(sf.iter_segment_postings(content[:4096], 0, 64))
    with pytest.raises(ValueError, match="truncated page"):
        sf.decode_entry(b"", 0)
