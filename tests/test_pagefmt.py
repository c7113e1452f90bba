"""Posting-page payload codec (VERDICT r10 #5): golden-byte pins,
hypothesis round-trips, the ItemPageView slotted layout, and the
density chooser — all against the in-repo specs
(/root/reference/src/index/index_tree.cpp:768-870,
/root/reference/src/tree/sorted_list_page_view.cpp:10-101,
/root/reference/src/tree/item_page_view.cpp)."""

from __future__ import annotations

import hashlib
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tagtree_spark.tsdb import pagefmt as pf


def test_constants_match_reference():
    # BITMAP_PAGE_OFFSET = 2*sizeof(Ref) + sizeof(u64) (index_tree.h:64)
    assert pf.BITMAP_PAGE_OFFSET == 16
    # postings_per_page = (page_size - offset) << 3 (index_tree.cpp:86)
    assert pf.postings_per_page(4096) == 32640
    assert pf.tsid_segsel(32639) == 0 and pf.tsid_segsel(32640) == 1
    # item = sizeof(Ref=u32) + sizeof(TSID=u64) (sorted_list_page_view.cpp:15)
    assert pf.ITEM_SIZE == 12
    assert pf.sorted_list_capacity(4096) == 254


def test_page_metadata_type_flag_in_bit63():
    meta = pf.encode_page_metadata(7, 9, 12345, pf.TYPE_SORTED_LIST)
    name_ref, value_ref, ts = struct.unpack("<IIQ", meta)
    assert (name_ref, value_ref) == (7, 9)
    assert ts == 12345 | (1 << 63)
    assert pf.decode_page_metadata(meta + b"\0" * 16) == (
        7,
        9,
        12345,
        "sorted_list",
    )
    with pytest.raises(ValueError):
        pf.encode_page_metadata(0, 0, 1 << 63, pf.TYPE_BITMAP)


def test_golden_bitmap_page_bytes():
    """Pin the exact image: metadata words, LSB-first bit placement in
    little-endian u64 words, zero fill."""
    pg = pf.encode_bitmap_page(7, 9, 12345, [0, 1, 63, 64, 100, 32639], 0)
    assert len(pg) == 4096
    assert hashlib.md5(pg).hexdigest() == "a2c80522ba9f38c0cf7688d6babd192a"
    # word 0 holds bits 0,1,63; word 1 bit 0 (tsid 64) and bit 36 (100)
    w0, w1 = struct.unpack_from("<QQ", pg, 16)
    assert w0 == (1 | 2 | (1 << 63))
    assert w1 == ((1 << 0) | (1 << 36))
    # last bit of the page (tsid 32639 = bit 32639 → top bit of last word)
    (wlast,) = struct.unpack_from("<Q", pg, 4096 - 8)
    assert wlast == 1 << 63


def test_golden_sorted_list_page_bytes():
    items = [(1, 5), (2, 7), (2, 99), (3, 10), (3, 11)]
    sp = pf.encode_sorted_list_page(4, 777, items)
    assert hashlib.md5(sp).hexdigest() == "f4225869a1dc2469d9ddb748d3b20476"
    # slotted header: lower = 4 + 5*4, upper = region - 5*12
    lower, upper = struct.unpack_from("<HH", sp, 16)
    assert lower == 4 + 5 * 4
    assert upper == (4096 - 16) - 5 * 12
    # metadata stamps the EMPTY value (index_tree.cpp:663) + type bit
    assert pf.decode_page_metadata(sp) == (4, 0, 777, "sorted_list")
    assert pf.decode_sorted_list_page(sp) == items


def test_bitmap_rejects_foreign_segment():
    with pytest.raises(ValueError):
        pf.encode_bitmap_page(1, 1, 0, [32640], 0)


@settings(max_examples=100, deadline=None)
@given(
    tsids=st.sets(st.integers(min_value=0, max_value=3 * 32640 - 1), max_size=200),
    name_ref=st.integers(min_value=0, max_value=2**32 - 1),
    end_ts=st.integers(min_value=0, max_value=2**63 - 1),
)
def test_bitmap_pages_roundtrip_property(tsids, name_ref, end_ts):
    pages = list(pf.build_bitmap_pages(name_ref, 5, end_ts, tsids))
    rec = []
    for segsel, pg in pages:
        assert pf.decode_page_metadata(pg) == (name_ref, 5, end_ts, "bitmap")
        rec.extend(pf.decode_bitmap_page(pg, segsel))
    assert rec == sorted(tsids)


@settings(max_examples=100, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**32 - 1),
            st.integers(min_value=0, max_value=2**64 - 1),
        ),
        unique=True,
        max_size=600,
    )
)
def test_sorted_list_pages_roundtrip_property(items):
    """Pagination + slotted layout recover every (value_ref, tsid) in
    sorted order, and per-page get_values matches a naive filter."""
    feed = sorted(items)
    pages = list(pf.build_sorted_list_pages(1, 0, feed))
    rec = []
    for _, pg in pages:
        got = pf.decode_sorted_list_page(pg)
        rec.extend(got)
        for ref in {k for k, _ in got}:
            assert pf.sorted_list_get_values(pg, ref) == [
                t for k, t in got if k == ref
            ]
    assert rec == feed
    assert all(len(pg) == 4096 for _, pg in pages)


@settings(max_examples=80, deadline=None)
@given(
    inserts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=1000),
        ),
        unique=True,
        max_size=254,
    )
)
def test_slotted_insert_any_order_yields_sorted_page(inserts):
    """SortedListPageView::insert binary-searches the position, so the
    page reads back sorted REGARDLESS of insertion order — the property
    the reference's updated-page path relies on."""
    page = pf.SortedListPage()
    for ref, tsid in inserts:
        assert page.insert(ref, tsid)
    buf = pf.encode_page_metadata(0, 0, 0, pf.TYPE_SORTED_LIST) + page.to_bytes()
    assert pf.decode_sorted_list_page(buf) == sorted(inserts)


def test_chooser_boundaries():
    # ties prefer SORTED_LIST (<=, index_tree.cpp:868)
    assert pf.choose_page_type(1, 341) == "sorted_list"  # 4092 ≤ 4096
    assert pf.choose_page_type(1, 342) == "bitmap"  # 4104 > 4096
    assert pf.choose_page_type(3, 1000) == "sorted_list"  # 12000→12288 ≤ 12288
    assert pf.choose_page_type(3, 1025) == "bitmap"  # 12300→16384 > 12288
    assert pf.choose_page_type(1, 341, bitmap_only=True) == "bitmap"


def test_page_capacity_is_exact():
    page = pf.SortedListPage()
    for i in range(pf.sorted_list_capacity()):
        assert page.insert(1, i)
    assert not page.insert(1, 10**6)  # the 255th insert fails
