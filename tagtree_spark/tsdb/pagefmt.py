"""Posting-page payload codec — the reference index tree's two page
payload formats, byte-faithful (VERDICT r10 #5).

The reference persists its inverted index in a COW B+-tree whose leaf
VALUES point at posting pages. The page *container* (node layout, page
allocation, file header) lives in the vendored ``bptree`` submodule,
which is an EMPTY directory in this checkout — so the full index FILE
stays out of scope (documented deviation, SURVEY §2). The page
*payloads*, however, are fully specified by in-repo sources, and this
module implements exactly those bytes:

* **Common page metadata** — ``IndexTree::write_page_metadata``
  (/root/reference/src/index/index_tree.cpp:884-906 and
  include/tagtree/index/index_tree.h:64): little-endian
  ``u32 name_ref | u32 value_ref | u64 end_timestamp``, with bit 63 of
  end_timestamp doubling as the SORTED_LIST type flag.
  ``BITMAP_PAGE_OFFSET = 2·sizeof(Ref) + sizeof(u64) = 16``.

* **Bitmap pages** — ``IndexTree::write_posting_page``
  (index_tree.cpp:768-846): the payload is a flat bitset of
  ``postings_per_page = (page_size − 16) · 8`` bits (index_tree.cpp:86;
  32,640 at the 4 KiB default). A page covers one TSID *segment*
  ``segsel = tsid // postings_per_page`` (index_tree.h:88-91) and sets
  bit ``tsid % postings_per_page`` as u64 word ``bitnum >> 6``, bit
  ``bitnum & 0x3f`` (index_tree.cpp:855-859) — little-endian words.

* **Sorted-list pages** — ``SortedListPageView`` over ``ItemPageView``
  (/root/reference/src/tree/sorted_list_page_view.cpp:10-101,
  src/tree/item_page_view.cpp): a PostgreSQL-style slotted page INSIDE
  the payload region. Header ``u16 lower | u16 upper`` (byte offsets
  relative to the payload region), line pointers of
  ``u16 item_offset | u16 item_length`` growing up from byte 4, item
  bodies growing down from the region end. Each item is
  ``u32 value_ref | u64 tsid`` (12 bytes, sorted_list_page_view.cpp:24-30);
  items are kept sorted by (value_ref, tsid) via binary-search insert.
  One page packs MANY label values of one name
  (``write_postings_sorted_list``, index_tree.cpp:608-707), so its
  metadata carries ``value_ref`` of the EMPTY string.

* **Density chooser** — ``IndexTree::choose_page_type``
  (index_tree.cpp:848-870): per label NAME, a sorted-list layout is
  chosen when ``ceil(total_postings · 12 / page_size) · page_size ≤
  n_values · page_size``, i.e. when one page per value (bitmap) would
  waste more than slotting every (value_ref, tsid) pair; ties prefer
  SORTED_LIST. ``bitmap_only`` forces BITMAP.

Everything here is plain ``struct``-module Python over ``bytes`` — the
payloads are small (one page) and encode/decode runs inside Arrow
batches on executors; no numpy needed.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

PAGE_SIZE = 4096
BITMAP_PAGE_OFFSET = 16  # 2 * sizeof(SymbolTable::Ref) + sizeof(uint64_t)
ITEM_SIZE = 12  # sizeof(SymbolTable::Ref=u32) + sizeof(TSID=u64)
_LINE_POINTER_SIZE = 4
_P_POINTERS = 4  # u16 lower + u16 upper
_SORTED_FLAG = 1 << 63

TYPE_BITMAP = "bitmap"
TYPE_SORTED_LIST = "sorted_list"


def postings_per_page(page_size: int = PAGE_SIZE) -> int:
    """index_tree.cpp:86 — bits available in a bitmap page payload."""
    return (page_size - BITMAP_PAGE_OFFSET) << 3


def tsid_segsel(tsid: int, page_size: int = PAGE_SIZE) -> int:
    """index_tree.h:88-91 — the TSID segment a bitmap page covers."""
    return tsid // postings_per_page(page_size)


def sorted_list_capacity(page_size: int = PAGE_SIZE) -> int:
    """Items one sorted-list page holds. Each item costs ITEM_SIZE body
    bytes + a 4-byte line pointer inside the (page_size − 16) region
    behind the 4-byte lower/upper header, and the ItemPageView
    free-space check reserves one extra line pointer
    (item_page_view.h:28-31): insert n+1 succeeds iff
    ITEM_SIZE ≤ region − 4 − 16n − 4 → 254 items at the 4 KiB default."""
    region = page_size - BITMAP_PAGE_OFFSET
    return (region - 2 * _P_POINTERS - ITEM_SIZE) // (
        ITEM_SIZE + _LINE_POINTER_SIZE
    ) + 1


def choose_page_type(
    n_values: int,
    total_postings: int,
    page_size: int = PAGE_SIZE,
    bitmap_only: bool = False,
) -> str:
    """index_tree.cpp:848-870, exact integer math."""
    if bitmap_only:
        return TYPE_BITMAP
    bitmap_size = n_values * page_size
    sorted_size = total_postings * ITEM_SIZE
    if sorted_size % page_size:
        sorted_size += page_size - (sorted_size % page_size)
    return TYPE_SORTED_LIST if sorted_size <= bitmap_size else TYPE_BITMAP


def encode_page_metadata(
    name_ref: int, value_ref: int, end_timestamp: int, page_type: str
) -> bytes:
    if end_timestamp & _SORTED_FLAG:
        raise ValueError("end_timestamp uses bit 63 (the type flag)")
    ts = end_timestamp | (_SORTED_FLAG if page_type == TYPE_SORTED_LIST else 0)
    return struct.pack("<IIQ", name_ref, value_ref, ts)


def decode_page_metadata(buf: bytes) -> tuple[int, int, int, str]:
    name_ref, value_ref, ts = struct.unpack_from("<IIQ", buf, 0)
    page_type = TYPE_SORTED_LIST if ts & _SORTED_FLAG else TYPE_BITMAP
    return name_ref, value_ref, ts & ~_SORTED_FLAG, page_type


# ---------------------------------------------------------------------------
# Bitmap pages
# ---------------------------------------------------------------------------


def encode_bitmap_page(
    name_ref: int,
    value_ref: int,
    end_timestamp: int,
    tsids,
    segsel: int,
    page_size: int = PAGE_SIZE,
) -> bytes:
    """One (name, value, segsel) bitmap page. Every tsid must fall in
    the page's segment (the writer asserts this, index_tree.cpp:855)."""
    ppp = postings_per_page(page_size)
    words = bytearray(page_size - BITMAP_PAGE_OFFSET)
    for tsid in tsids:
        if tsid // ppp != segsel:
            raise ValueError(f"tsid {tsid} outside segment {segsel}")
        bitnum = tsid % ppp
        words[bitnum >> 3] |= 1 << (bitnum & 0x7)
    return (
        encode_page_metadata(name_ref, value_ref, end_timestamp, TYPE_BITMAP)
        + bytes(words)
    )


def decode_bitmap_page(buf: bytes, segsel: int) -> list[int]:
    """All TSIDs set in the page, ascending. Byte-wise bit walk — the
    u64-word little-endian layout makes word order == byte order."""
    page_size = len(buf)
    ppp = postings_per_page(page_size)
    out = []
    base = segsel * ppp
    payload = buf[BITMAP_PAGE_OFFSET:]
    for byte_i, b in enumerate(payload):
        while b:
            low = b & (-b)
            out.append(base + (byte_i << 3) + low.bit_length() - 1)
            b ^= low
    return out


# ---------------------------------------------------------------------------
# Sorted-list pages (slotted ItemPageView region)
# ---------------------------------------------------------------------------


@dataclass
class SortedListPage:
    """In-memory twin of SortedListPageView for building/reading one
    page region (payload only, no metadata)."""

    page_size: int = PAGE_SIZE

    def __post_init__(self):
        self.region = self.page_size - BITMAP_PAGE_OFFSET
        self.lower = _P_POINTERS
        self.upper = self.region
        self.pointers: list[tuple[int, int]] = []  # (offset, length), sorted order
        self.body = bytearray(self.region)

    def free_space(self) -> int:
        size = self.upper - self.lower
        return 0 if size < _LINE_POINTER_SIZE else size - _LINE_POINTER_SIZE

    def insert(self, value_ref: int, tsid: int) -> bool:
        """binary-search insert (sorted_list_page_view.cpp:88-101);
        returns False when the page is full — the writer then rolls to a
        new page (index_tree.cpp:660-672)."""
        item = struct.pack("<IQ", value_ref, tsid)
        if len(item) > self.free_space():
            return False
        # leftmost position whose item >= (value_ref, tsid). DOCUMENTED
        # DEVIATION (ADVICE r11): the reference's binary_search_page
        # compares SGN((int32_t)key - (int32_t)mid_key)
        # (sorted_list_page_view.cpp), which WRAPS when two refs differ
        # by >= 2^31; we compare unsigned. Identical for every table this
        # repo emits (refs are dense small ints — tens of symbols), and
        # the reference's own writer never crosses 2^31 symbols either,
        # so the byte images agree on all representable inputs here.
        lo, hi = 0, len(self.pointers)
        while lo < hi:
            mid = (lo + hi) >> 1
            off, _ = self.pointers[mid]
            k, t = struct.unpack_from("<IQ", self.body, off)
            if (k, t) < (value_ref, tsid):
                lo = mid + 1
            else:
                hi = mid
        self.upper -= len(item)
        self.body[self.upper : self.upper + len(item)] = item
        self.pointers.insert(lo, (self.upper, len(item)))
        self.lower += _LINE_POINTER_SIZE
        return True

    def to_bytes(self) -> bytes:
        out = bytearray(self.region)
        struct.pack_into("<HH", out, 0, self.lower, self.upper)
        for i, (off, length) in enumerate(self.pointers):
            struct.pack_into(
                "<HH", out, _P_POINTERS + i * _LINE_POINTER_SIZE, off, length
            )
        out[self.upper :] = self.body[self.upper :]
        return bytes(out)


def encode_sorted_list_page(
    name_ref: int,
    end_timestamp: int,
    items,
    page_size: int = PAGE_SIZE,
    empty_value_ref: int = 0,
) -> bytes:
    """One sorted-list page holding (value_ref, tsid) items of ONE label
    name. Metadata value_ref is the empty-string symbol's ref — the
    writer stamps label {name, ""} (index_tree.cpp:663, :680); pass it as
    ``empty_value_ref`` when the symbol table does not assign '' ref 0
    (this repo's ``_symbol_refs`` sorts '' first, so the default holds
    and is asserted at the table's construction)."""
    page = SortedListPage(page_size)
    for value_ref, tsid in items:
        if not page.insert(value_ref, tsid):
            raise ValueError("sorted-list page overflow; paginate the items")
    return (
        encode_page_metadata(name_ref, empty_value_ref, end_timestamp, TYPE_SORTED_LIST)
        + page.to_bytes()
    )


def decode_sorted_list_page(buf: bytes) -> list[tuple[int, int]]:
    """All (value_ref, tsid) items in line-pointer order (== sorted
    order for pages built by the reference's binary-search insert)."""
    payload = memoryview(buf)[BITMAP_PAGE_OFFSET:]
    lower, _upper = struct.unpack_from("<HH", payload, 0)
    n = 0 if lower < _P_POINTERS else (lower - _P_POINTERS) // _LINE_POINTER_SIZE
    out = []
    for i in range(n):
        off, length = struct.unpack_from(
            "<HH", payload, _P_POINTERS + i * _LINE_POINTER_SIZE
        )
        if length != ITEM_SIZE:
            raise ValueError(f"sorted-list item {i} has length {length}")
        out.append(struct.unpack_from("<IQ", payload, off))
    return out


def sorted_list_get_values(buf: bytes, value_ref: int) -> list[int]:
    """SortedListPageView::get_values — TSIDs of one value_ref via the
    page's sorted order (binary search + forward scan; unsigned compare,
    same deviation note as SortedListPage.insert)."""
    items = decode_sorted_list_page(buf)
    lo, hi = 0, len(items)
    while lo < hi:
        mid = (lo + hi) >> 1
        if items[mid][0] < value_ref:
            lo = mid + 1
        else:
            hi = mid
    out = []
    for k, t in items[lo:]:
        if k != value_ref:
            break
        out.append(t)
    return out


# ---------------------------------------------------------------------------
# Paginated builders — the write_postings loop made pure
# ---------------------------------------------------------------------------


def build_bitmap_pages(
    name_ref: int,
    value_ref: int,
    end_timestamp: int,
    tsids,
    page_size: int = PAGE_SIZE,
):
    """Split one value's posting set into per-segment bitmap pages the
    way write_postings_bitmap does (one page per touched segsel).
    Yields (segsel, page_bytes)."""
    ppp = postings_per_page(page_size)
    by_seg: dict[int, list[int]] = {}
    for tsid in tsids:
        by_seg.setdefault(tsid // ppp, []).append(tsid)
    for segsel in sorted(by_seg):
        yield segsel, encode_bitmap_page(
            name_ref, value_ref, end_timestamp, by_seg[segsel], segsel, page_size
        )


def build_sorted_list_pages(
    name_ref: int,
    end_timestamp: int,
    items,
    page_size: int = PAGE_SIZE,
    empty_value_ref: int = 0,
):
    """Pack one name's (value_ref, tsid) items — pre-sorted by (value,
    tsid), exactly the order write_postings_sorted_list feeds them — into
    as few pages as fit, rolling to a new page on overflow
    (index_tree.cpp:653-690). Yields (page_index, page_bytes).
    ``empty_value_ref`` is the symbol table's ref for '' (see
    encode_sorted_list_page)."""
    page = SortedListPage(page_size)
    idx = 0
    any_item = False
    for value_ref, tsid in items:
        if not page.insert(value_ref, tsid):
            yield idx, (
                encode_page_metadata(
                    name_ref, empty_value_ref, end_timestamp, TYPE_SORTED_LIST
                )
                + page.to_bytes()
            )
            idx += 1
            page = SortedListPage(page_size)
            if not page.insert(value_ref, tsid):
                raise ValueError("item larger than an empty page")
        any_item = True
    if any_item:
        yield idx, (
            encode_page_metadata(
                name_ref, empty_value_ref, end_timestamp, TYPE_SORTED_LIST
            )
            + page.to_bytes()
        )
