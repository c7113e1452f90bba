"""COW tree node/meta byte formats + exact insert/split algorithm
(VERDICT r11 #7): golden-byte pins, CRC double-buffer recovery,
hypothesis insert-vs-scan ordering, and the reference's split geometry
on adversarial shapes."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tagtree_spark.tsdb import cowfmt as cf


def k(name: int, value: int, ts: int = 0, seg: int = 0) -> bytes:
    return cf.pack_key(
        name.to_bytes(6, "big"), value.to_bytes(8, "big"), ts, seg
    )


# --- key format ------------------------------------------------------------


def test_key_golden_bytes():
    key = cf.pack_key(b"NAMEXY", b"VALUEABC", 0x1122334455667788, 0xAABBCCDD)
    assert len(key) == 32
    assert key[:6] == b"NAMEXY"
    assert key[6:14] == b"VALUEABC"
    # timestamp u64 LE then segsel u32 LE (tuple_key.h buf layout)
    assert key[14:22] == bytes.fromhex("8877665544332211")
    assert key[22:26] == bytes.fromhex("ddccbbaa")
    assert key[26:] == b"\x00" * 6  # roundup(26,16)=32 zero pad
    assert cf.unpack_key(key) == (
        b"NAMEXY",
        b"VALUEABC",
        0x1122334455667788,
        0xAABBCCDD,
    )


def test_key_order_segsel_descends():
    """TupleKey::operator<: (name, value, ts) ascend, segsel DESCENDS."""
    assert cf.key_less(k(1, 1), k(2, 1))
    assert cf.key_less(k(1, 1), k(1, 2))
    assert cf.key_less(k(1, 1, ts=5), k(1, 1, ts=9))
    # same (name, value, ts): HIGHER segsel sorts FIRST
    assert cf.key_less(k(1, 1, seg=9), k(1, 1, seg=2))


# --- node images -----------------------------------------------------------


def test_leaf_page_golden_bytes():
    keys = [k(1, 10), k(2, 20)]
    page = cf.encode_leaf_page(keys, [(7, 100), (8, 200)], n=4)
    assert len(page) == cf.node_page_bytes(4, leaf=True) == 8 + 128 + 32
    tag, size = struct.unpack_from("<II", page, 0)
    assert (tag, size) == (cf.LEAF_TAG, 2)
    assert page[8:40] == keys[0] and page[40:72] == keys[1]
    assert page[72:136] == b"\x00" * 64  # zeroed slack key slots
    assert struct.unpack_from("<II", page, 136) == (7, 100)
    assert struct.unpack_from("<II", page, 144) == (8, 200)
    d = cf.decode_node_page(page, n=4)
    assert d == {"tag": "leaf", "keys": keys, "values": [(7, 100), (8, 200)]}


def test_inner_page_golden_bytes():
    keys = [k(5, 0)]
    page = cf.encode_inner_page(keys, [2, 3], n=4)
    assert len(page) == cf.node_page_bytes(4, leaf=False) == 8 + 128 + 20
    tag, size = struct.unpack_from("<II", page, 0)
    assert (tag, size) == (cf.INNER_TAG, 1)
    assert struct.unpack_from("<5I", page, 136) == (2, 3, 0, 0, 0)
    d = cf.decode_node_page(page, n=4)
    assert d == {"tag": "inner", "keys": keys, "children": [2, 3]}


def test_reference_fanout_image_sizes_fit_a_page():
    """At the reference's N=100: leaf 4008B, inner 3612B — both inside
    the 4 KiB page the tag+body are written into."""
    assert cf.node_page_bytes(100, leaf=True) == 4008 <= 4096
    assert cf.node_page_bytes(100, leaf=False) == 3612 <= 4096


def test_decoder_ignores_stale_slack():
    """The reference serializes the FULL array, leaving stale bytes in
    slots >= size after memmoves; decoding must ignore them."""
    page = bytearray(cf.encode_leaf_page([k(1, 1)], [(1, 2)], n=4))
    page[40:72] = b"\xff" * 32  # garbage in key slot 1 (>= size)
    page[144:152] = b"\xee" * 8  # garbage in value slot 1
    d = cf.decode_node_page(bytes(page), n=4)
    assert d["keys"] == [k(1, 1)] and d["values"] == [(1, 2)]


# --- meta page -------------------------------------------------------------


def test_meta_page_golden_and_double_buffer():
    page = cf.encode_meta_page([(2, 9), (1, 2)])
    assert len(page) == 4096
    assert struct.unpack_from("<I", page, 0)[0] == 0x00C0FFEE
    v, r, crc = struct.unpack_from("<III", page, 4)
    assert (v, r) == (2, 9)
    assert crc == zlib.crc32(struct.pack("<II", 2, 9))
    assert cf.decode_meta_page(page) == (2, 9)  # higher version wins
    # corrupt slot 0 → falls back to the CRC-valid slot 1
    broken = bytearray(page)
    broken[5] ^= 0xFF
    assert cf.decode_meta_page(bytes(broken)) == (1, 2)
    # both slots bad → loud
    broken[4 + 12 + 1] ^= 0xFF
    with pytest.raises(ValueError):
        cf.decode_meta_page(bytes(broken))
    with pytest.raises(ValueError):
        cf.decode_meta_page(b"\x00" * 4096)


# --- tree build / read -----------------------------------------------------


def test_fresh_single_leaf_tree():
    w = cf.COWTreeWriter(n=4)
    w.insert(k(3, 1), 7, 100)
    w.insert(k(1, 1), 5, 50)
    pages = w.commit()
    assert set(pages) == {1, 2}  # meta + the one leaf at FIRST_NODE_PAGE_ID
    r = cf.COWTreeReader(pages, n=4)
    assert (r.version, r.root_pid) == (2, 2)
    assert r.get_values(k(1, 1)) == [(5, 50)]
    assert r.get_values(k(3, 1)) == [(7, 100)]
    assert r.get_values(k(9, 9)) == []
    assert [kk for kk, _ in r.scan()] == [k(1, 1), k(3, 1)]


def test_leaf_split_geometry():
    """Insert 4 keys at N=4: split into N/2 | N-N/2 with keys[N/2] KEPT
    in the right leaf (cow_tree_node.h:429-441)."""
    w = cf.COWTreeWriter(n=4)
    for i in [1, 2, 3, 4]:
        w.insert(k(i, 0), i, i * 10)
    pages = w.commit()
    r = cf.COWTreeReader(pages, n=4)
    root = cf.decode_node_page(pages[r.root_pid], n=4)
    assert root["tag"] == "inner" and root["keys"] == [k(3, 0)]
    left = cf.decode_node_page(pages[root["children"][0]], n=4)
    right = cf.decode_node_page(pages[root["children"][1]], n=4)
    assert left["keys"] == [k(1, 0), k(2, 0)]
    assert right["keys"] == [k(3, 0), k(4, 0)]  # split key stays right


def test_inner_split_pushes_key_up():
    """Deep build at N=4: inner splits keep N/2 keys left, N-N/2-1
    right, with keys[N/2] pushed up (not duplicated)."""
    w = cf.COWTreeWriter(n=4)
    for i in range(1, 40):
        w.insert(k(i, 0), i, i)
    pages = w.commit()
    r = cf.COWTreeReader(pages, n=4)
    # every key readable, scan ordered, inner keys never duplicated in scan
    got = r.scan()
    assert [cf.unpack_key(kk)[0] for kk, _ in got] == [
        i.to_bytes(6, "big") for i in range(1, 40)
    ]
    for i in range(1, 40):
        assert r.get_values(k(i, 0)) == [(i, i)]
    # structural invariants: inner sizes < N, children = size+1, and all
    # leaves at one depth
    depths = []

    def check(pid, depth=0):
        d = cf.decode_node_page(pages[pid], n=4)
        if d["tag"] == "inner":
            assert 1 <= len(d["keys"]) < 4
            assert len(d["children"]) == len(d["keys"]) + 1
            for c in d["children"]:
                check(c, depth + 1)
        else:
            depths.append(depth)

    check(r.root_pid)
    assert len(set(depths)) == 1


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),
            st.integers(0, 5),
            st.integers(0, 3),
            st.integers(0, 3),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_insert_scan_roundtrip_property(items):
    """Any insert order → scan returns every item exactly once, sorted by
    the TupleKey order (segsel descending tiebreak included), and every
    distinct key's full duplicate-run is returned by get_values when the
    run stays within one leaf (the reference's leaf-local scan)."""
    w = cf.COWTreeWriter(n=4)
    for i, (name, value, ts, seg) in enumerate(items):
        w.insert(k(name, value, ts, seg), i, i)
    pages = w.commit()
    r = cf.COWTreeReader(pages, n=4)
    got = r.scan()
    assert len(got) == len(items)
    keys = [cf.key_sort_tuple(kk) for kk, _ in got]
    assert keys == sorted(keys)
    assert sorted(v for _, v in got) == sorted((i, i) for i in range(len(items)))


def test_get_values_equal_run_within_leaf():
    w = cf.COWTreeWriter(n=8)
    w.insert(k(1, 1, 0, 0), 1, 1)
    w.insert(k(1, 1, 0, 0), 2, 2)
    w.insert(k(2, 2, 0, 0), 3, 3)
    r = cf.COWTreeReader(w.commit(), n=8)
    assert sorted(r.get_values(k(1, 1, 0, 0))) == [(1, 1), (2, 2)]


# --- page-FILE container (VERDICT r12 #7: the ASSUMED flat layout) ---------


def test_page_file_requires_explicit_opt_in(tmp_path):
    w = cf.COWTreeWriter(n=4)
    w.insert(k(1, 1), 7, 1001)
    pages = w.commit()
    p = str(tmp_path / "tree.idx")
    with pytest.raises(NotImplementedError, match="bptree submodule"):
        cf.write_page_file(p, pages)
    cf.write_page_file(p, pages, assumed_layout=True)
    with pytest.raises(NotImplementedError, match="bptree submodule"):
        cf.read_page_file(p)


def test_page_file_golden_offsets(tmp_path):
    """The assumed layout pinned at the byte level: offset = pid * 4096,
    slot 0 zero-reserved, absent pids zero-filled, short pages padded."""
    w = cf.COWTreeWriter(n=4)
    for i in range(3):
        w.insert(k(i, i), i, 1000 + i)
    pages = w.commit()  # meta pid 1 + leaf pid 2
    p = str(tmp_path / "tree.idx")
    size = cf.write_page_file(p, pages, assumed_layout=True)
    raw = open(p, "rb").read()
    assert len(raw) == size == (max(pages) + 1) * cf.PAGE_SIZE
    assert raw[: cf.PAGE_SIZE] == b"\x00" * cf.PAGE_SIZE  # INVALID slot
    for pid, img in pages.items():
        off = pid * cf.PAGE_SIZE
        assert raw[off : off + len(img)] == img
        assert raw[off + len(img) : off + cf.PAGE_SIZE] == b"\x00" * (
            cf.PAGE_SIZE - len(img)
        )
    # meta magic sits exactly at offset META_PAGE_ID*4096
    assert (
        struct.unpack_from("<I", raw, cf.META_PAGE_ID * cf.PAGE_SIZE)[0]
        == cf.META_PAGE_MAGIC
    )


def test_page_file_roundtrip_and_walk(tmp_path):
    """Export → import → COWTreeReader walk equals the in-memory tree,
    including a multi-level split tree and a pid GAP (zero slot)."""
    w = cf.COWTreeWriter(n=4)
    for i in range(40):
        w.insert(k(i % 7, i), i, 2000 + i)
    pages = w.commit()
    before = cf.COWTreeReader(pages, n=4).scan()
    p = str(tmp_path / "tree.idx")
    cf.write_page_file(p, pages, assumed_layout=True)
    back = cf.read_page_file(p, assumed_layout=True)
    # the importer serves full 4 KiB slots; images round-trip bit-exact
    # modulo the slot's zero tail (decoders read the fixed prefix)
    assert set(back) == set(pages)
    for pid, img in pages.items():
        assert back[pid] == img + b"\x00" * (cf.PAGE_SIZE - len(img))
    assert cf.COWTreeReader(back, n=4).scan() == before
    # a gap: drop one non-root leaf pid and re-export; importer skips it
    gapped = dict(pages)
    victim = max(pid for pid in gapped if pid > 2)
    del gapped[victim]
    cf.write_page_file(p, gapped, assumed_layout=True)
    assert victim not in cf.read_page_file(p, assumed_layout=True)


def test_page_file_rejects_bad_shapes(tmp_path):
    p = str(tmp_path / "x.idx")
    with pytest.raises(ValueError, match="INVALID_PAGE_ID"):
        cf.write_page_file(p, {0: b"z"}, assumed_layout=True)
    with pytest.raises(ValueError, match="exceeds"):
        cf.write_page_file(
            p, {1: b"z" * (cf.PAGE_SIZE + 1)}, assumed_layout=True
        )
    with pytest.raises(ValueError, match="empty"):
        cf.write_page_file(p, {}, assumed_layout=True)
    open(p, "wb").write(b"\x01" * (cf.PAGE_SIZE + 3))
    with pytest.raises(ValueError, match="multiple"):
        cf.read_page_file(p, assumed_layout=True)
