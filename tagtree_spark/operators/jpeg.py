"""Baseline JPEG (ITU-T T.81) grayscale codec — pure stdlib + numpy.

Retires the last compressed-codec refusal flagged by the round-9 review:
``decode_jpeg`` is an honest BASELINE SEQUENTIAL decoder (marker walk,
DQT/DHT/SOF0/SOS parse, canonical Huffman entropy decode with byte
unstuffing and restart-marker handling, dequantization, dezigzag, real
2-D IDCT, level shift + clamp, MCU-padding crop), and
``encode_jpeg_gray`` the matching encoder (edge-replication pad, FDCT,
quantize, zigzag, DC-difference + AC run-length Huffman with the public
Annex K.3 tables, 0xFF byte stuffing, JFIF/DQT/SOF0/DHT/SOS framing).

Scope is the baseline sequential process for grayscale and 3-component
color at 4:4:4 or 4:2:0 sampling (interleaved MCUs, per-component quant
and Huffman tables, nearest-neighbour chroma upsample; color samples
are returned as the CODED components — YCbCr under the JFIF convention
— with no color transform, so the exactness guarantees below survive).
Everything else raises loudly with the same triage taxonomy the other
codecs use:

  * ``NotImplementedError`` — valid JPEG outside this scope: progressive
    (SOF2), extended 12-bit, lossless/hierarchical, arithmetic coding
    (SOF9+), 16-bit quant tables, component counts other than 1/3,
    samplings other than 4:4:4 / 4:2:0.
  * ``ValueError`` — corruption: bad magic, truncated segments or
    entropy data, a marker inside a scan, invalid Huffman symbols,
    out-of-sequence restart markers.

JPEG is lossy in general, so the driver oracle (q289) exercises the
codec in its provably-LOSSLESS regime: with an all-ones quantization
table, any 8x8 block of the form ``b + a*s(x)*s(y)`` (a DC level plus
the (4,4) checkerboard basis, ``s = sign(cos((2x+1)*pi/4))``) has
exactly two nonzero DCT coefficients, BOTH integers (``F(0,0) =
8*(b-128)``, ``F(4,4) = 8*a``), so quantization and coefficient
rounding introduce zero error and decode returns the input bytes
bit-exactly — while still driving the full DC *and* AC Huffman paths.
General lossy round-trips are property-tested with an error bound
instead (tests/test_multimodal.py).

Reference parity note: the reference repo has no media path at all —
this module belongs to the LLM-pipeline extension surface (SURVEY §2.11
E5), same as the WAV/PPM/PNG/Y4M codecs beside it.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# Zigzag scan: _ZIGZAG[i] = natural (row-major) index of the i-th
# zigzag-ordered coefficient (T.81 Figure 5).
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3.1/K.3.2 luminance Huffman specs: (BITS[1..16], HUFFVAL).
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal DCT-II basis M[u, x]: F = M @ (p-128) @ M.T,
    p = M.T @ F @ M + 128. With this scaling a constant block b has
    F(0,0) = 8*(b-128) and the (4,4) checkerboard amplitude a has
    F(4,4) = 8*a — the exact-integer regime the oracle rides."""
    m = np.empty((8, 8))
    for u in range(8):
        cu = math.sqrt(0.125) if u == 0 else math.sqrt(0.25)
        for x in range(8):
            m[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


_M = _dct_matrix()


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


#: 16-bit-lookahead decode tables cached per Huffman spec — the executor
#: decodes thousands of payloads sharing the same DHT, so the one-time
#: 65536-slot fill (C-speed slice assignment per symbol) amortizes to
#: nothing. lut[peek16] = (symbol, code_length) or None for invalid codes.
_LUT_CACHE: dict[tuple, list] = {}


def _decode_lut(bits: list[int], vals: list[int]) -> list:
    if len(bits) != 16 or sum(bits) != len(vals):
        raise ValueError("DHT: BITS/HUFFVAL length mismatch")
    key = (tuple(bits), tuple(vals))
    lut = _LUT_CACHE.get(key)
    if lut is None:
        lut = [None] * 65536
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                if hi > 65536:
                    raise ValueError("DHT: overlong Huffman code")
                lut[lo:hi] = [(vals[k], length)] * (hi - lo)
                k += 1
                code += 1
            code <<= 1
        _LUT_CACHE[key] = lut
    return lut


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude field."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _FastReader:
    """MSB-first reader over an unstuffed entropy chunk: an int
    accumulator refilled bytewise, symbols resolved with one 16-bit
    lookahead table probe. Reads past the chunk end borrow zero bits and
    bump ``over`` — the block loop turns a consumed borrow into the
    truncation error instead of paying a bounds check per bit."""

    __slots__ = ("buf", "blen", "pos", "acc", "nacc", "over")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.blen = len(buf)
        self.pos = 0
        self.acc = 0
        self.nacc = 0
        self.over = 0

    def _fill(self, n: int) -> None:
        while self.nacc < n:
            if self.pos < self.blen:
                self.acc = (self.acc << 8) | self.buf[self.pos]
                self.pos += 1
            else:
                self.acc <<= 8
                self.over += 8
            self.nacc += 8

    def sym(self, lut: list) -> int:
        self._fill(16)
        entry = lut[(self.acc >> (self.nacc - 16)) & 0xFFFF]
        if entry is None:
            raise ValueError("JPEG entropy data: invalid Huffman code")
        s, ln = entry
        self.nacc -= ln
        self.acc &= (1 << self.nacc) - 1
        return s

    def bits(self, n: int) -> int:
        self._fill(n)
        v = (self.acc >> (self.nacc - n)) & ((1 << n) - 1)
        self.nacc -= n
        self.acc &= (1 << self.nacc) - 1
        return v

    def borrowed(self) -> bool:
        """True iff any zero bits past the chunk end were CONSUMED."""
        return self.over > self.nacc

    def real_bits_left(self) -> int:
        pad_in_acc = self.over if self.over < self.nacc else self.nacc
        return (self.blen - self.pos) * 8 + (self.nacc - pad_in_acc)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _comp_zigzag(
    plane: np.ndarray, hi: int, vi: int, mcus_x: int, mcus_y: int, q: np.ndarray
) -> np.ndarray:
    """One component plane → quantized zigzag coefficients (nblocks, 64)
    in MCU raster order (mcu_y, mcu_x, vy, vx). Pads with edge
    replication to the MCU grid."""
    ph, pw = mcus_y * vi * 8, mcus_x * hi * 8
    plane = np.pad(
        plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge"
    )
    blocks = (
        plane.reshape(mcus_y, vi, 8, mcus_x, hi, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    # batched FDCT F = M @ B @ M.T (broadcast matmul: ~20x einsum here)
    coef = np.matmul(np.matmul(_M, blocks), _M.T)
    return np.rint(coef.reshape(-1, 64)[:, _ZIGZAG] / q[_ZIGZAG]).astype(np.int64)


def _encode_frame(
    width: int,
    height: int,
    planes: list[np.ndarray],
    samplings: list[tuple[int, int]],
    q: np.ndarray,
    restart_interval: int,
) -> bytes:
    """Shared baseline-sequential writer: FDCT/quantize each component
    plane, interleave blocks per MCU, Huffman-encode with the Annex K
    luminance tables (table ids 0 for every component), frame with
    JFIF/DQT/SOF0/DHT/SOS markers."""
    ncomp = len(planes)
    hmax = max(hi for hi, _ in samplings)
    vmax = max(vi for _, vi in samplings)
    mcus_x, mcus_y = -(-width // (8 * hmax)), -(-height // (8 * vmax))
    nmcus = mcus_x * mcus_y

    # per-comp coefficient streams + flat per-MCU schedule
    streams = []
    for plane, (hi, vi) in zip(planes, samplings):
        zz = _comp_zigzag(plane, hi, vi, mcus_x, mcus_y, q)
        zzl = zz.tolist()  # python ints: element access ~10x numpy scalars
        bi_arr, ki_arr = np.nonzero(zz[:, 1:])
        offs = np.concatenate(
            ([0], np.cumsum(np.bincount(bi_arr, minlength=len(zz))))
        ).tolist()
        streams.append((zzl, (ki_arr + 1).tolist(), offs))
    schedule = [
        ci for ci, (hi, vi) in enumerate(samplings) for _ in range(hi * vi)
    ]

    dc_codes = _build_codes(_DC_BITS, _DC_VALS)
    ac_codes = _build_codes(_AC_BITS, _AC_VALS)
    zrl_c, zrl_l = ac_codes[0xF0]
    eob_c, eob_l = ac_codes[0x00]

    # Entropy encode with a big-int bit accumulator flushed in byte-sized
    # slabs; 0xFF stuffing is one C-speed bytes.replace at the end — the
    # per-bit Python writer this replaced dominated the whole encode.
    out = bytearray()
    intervals: list[bytes] = []  # stuffed entropy bytes per restart interval
    acc, nacc = 0, 0

    def _flush_byte_aligned() -> None:
        nonlocal acc, nacc
        if nacc & 7:
            pad = 8 - (nacc & 7)
            acc = (acc << pad) | ((1 << pad) - 1)  # pad with 1-bits
            nacc += pad
        if nacc:
            out.extend(acc.to_bytes(nacc >> 3, "big"))
            acc, nacc = 0, 0

    preds = [0] * ncomp
    idx = [0] * ncomp  # next block per component stream
    for mi in range(nmcus):
        if restart_interval and mi and mi % restart_interval == 0:
            _flush_byte_aligned()
            intervals.append(bytes(out).replace(b"\xff", b"\xff\x00"))
            out.clear()
            preds = [0] * ncomp
        for ci in schedule:
            zzl, acs, offs = streams[ci]
            bi = idx[ci]
            idx[ci] = bi + 1
            row = zzl[bi]
            dc = row[0]
            diff = dc - preds[ci]
            preds[ci] = dc
            s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
            c, ln = dc_codes[s]
            acc = (acc << ln) | c
            nacc += ln
            if s:
                acc = (acc << s) | (
                    (diff if diff >= 0 else diff + (1 << s) - 1) & ((1 << s) - 1)
                )
                nacc += s
            prev = 0
            last = 0
            for k in acs[offs[bi] : offs[bi + 1]]:
                run = k - prev - 1
                while run >= 16:
                    acc = (acc << zrl_l) | zrl_c
                    nacc += zrl_l
                    run -= 16
                v = row[k]
                s = v.bit_length() if v >= 0 else (-v).bit_length()
                c, ln = ac_codes[(run << 4) | s]
                acc = (acc << (ln + s)) | (
                    (c << s) | ((v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1))
                )
                nacc += ln + s
                prev = k
                last = k
            if last < 63:
                acc = (acc << eob_l) | eob_c
                nacc += eob_l
            if nacc >= 2048:
                take = nacc & ~7
                out.extend((acc >> (nacc - take)).to_bytes(take >> 3, "big"))
                nacc -= take
                acc &= (1 << nacc) - 1
    _flush_byte_aligned()
    intervals.append(bytes(out).replace(b"\xff", b"\xff\x00"))
    entropy = intervals[0] if len(intervals) == 1 else b"".join(
        seg + (bytes([0xFF, 0xD0 + (i % 8)]) if i < len(intervals) - 1 else b"")
        for i, seg in enumerate(intervals)
    )

    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytes([0x00]) + bytes(int(q[_ZIGZAG[i]]) for i in range(64))
    sof = struct.pack(">BHHB", 8, height, width, ncomp) + b"".join(
        bytes([ci + 1, (hi << 4) | vi, 0])
        for ci, (hi, vi) in enumerate(samplings)
    )
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = bytes([ncomp]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp)) + bytes(
        [0, 63, 0]
    )
    head = b"\xff\xd8" + _seg(0xE0, jfif) + _seg(0xDB, dqt) + _seg(0xC0, sof)
    if restart_interval:
        head += _seg(0xDD, struct.pack(">H", restart_interval))
    return head + _seg(0xC4, dht) + _seg(0xDA, sos) + entropy + b"\xff\xd9"


def _check_quant(quant: list[int] | None, who: str) -> np.ndarray:
    q = np.ones(64, np.int64) if quant is None else np.asarray(quant, np.int64)
    if q.shape != (64,) or q.min() < 1 or q.max() > 255:
        raise ValueError(f"{who}: quant must be 64 values in 1..255")
    return q


def encode_jpeg_gray(
    width: int,
    height: int,
    pixels: bytes,
    quant: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential grayscale JPEG writer.

    ``pixels`` is ``width*height`` row-major gray bytes; dimensions need
    not be multiples of 8 (edge replication pads to full MCUs, the SOF0
    header carries the true size and decode crops back). ``quant`` is an
    optional 64-entry natural-order quantization table (default all
    ones — the lossless-regime table the q289 oracle relies on).
    ``restart_interval`` > 0 emits a DRI segment and byte-aligned RSTn
    markers every that-many MCUs (DC predictor reset per interval)."""
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError(f"encode_jpeg_gray: bad dimensions {width}x{height}")
    if len(pixels) != width * height:
        raise ValueError(
            f"encode_jpeg_gray: need {width * height} pixel bytes, got {len(pixels)}"
        )
    q = _check_quant(quant, "encode_jpeg_gray")
    img = np.frombuffer(pixels, np.uint8).reshape(height, width)
    return _encode_frame(width, height, [img], [(1, 1)], q, restart_interval)


def encode_jpeg_color(
    width: int,
    height: int,
    pixels: bytes,
    subsample: bool = False,
    quant: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential 3-component JPEG writer.

    ``pixels`` is ``width*height*3`` row-major interleaved component
    bytes, taken as the CODED components (YCbCr under the JFIF
    convention — no color transform happens here, mirroring the
    decoder's contract). ``subsample=False`` writes 4:4:4 (every
    component full resolution); ``subsample=True`` writes 4:2:0 (chroma
    box-averaged 2x2 — lossy for non-constant chroma by construction)."""
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError(f"encode_jpeg_color: bad dimensions {width}x{height}")
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"encode_jpeg_color: need {width * height * 3} bytes, got {len(pixels)}"
        )
    q = _check_quant(quant, "encode_jpeg_color")
    img = np.frombuffer(pixels, np.uint8).reshape(height, width, 3)
    if not subsample:
        return _encode_frame(
            width,
            height,
            [img[:, :, c] for c in range(3)],
            [(1, 1)] * 3,
            q,
            restart_interval,
        )
    # 4:2:0 — chroma planes box-averaged to half resolution (pad to even
    # dims by edge replication first so every 2x2 box is full)
    ph, pw = height + (height & 1), width + (width & 1)
    full = np.pad(img, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge")
    chroma = [
        np.rint(
            full[:, :, c]
            .reshape(ph // 2, 2, pw // 2, 2)
            .astype(np.float64)
            .mean(axis=(1, 3))
        ).astype(np.uint8)
        for c in (1, 2)
    ]
    return _encode_frame(
        width,
        height,
        [img[:, :, 0], chroma[0], chroma[1]],
        [(2, 2), (1, 1), (1, 1)],
        q,
        restart_interval,
    )


def _split_entropy(payload: bytes, pos: int) -> tuple[list[bytes], list[int], int]:
    """Walk the entropy-coded segment from ``pos``: unstuff 0xFF 0x00,
    split at RSTn markers → (chunks, rst sequence numbers, position of
    the terminating marker's 0xFF)."""
    chunks: list[bytes] = []
    rsts: list[int] = []
    cur = bytearray()
    i = pos
    n = len(payload)
    while True:
        j = payload.find(0xFF, i)  # skip plain data bytes at C speed
        if j < 0:
            raise ValueError("JPEG: entropy data ran past end of payload (no EOI)")
        cur += payload[i:j]
        if j + 1 >= n:
            raise ValueError("JPEG: truncated entropy data (dangling 0xFF)")
        m = payload[j + 1]
        if m == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif m == 0xFF:  # fill byte
            i = j + 1
        elif 0xD0 <= m <= 0xD7:
            chunks.append(bytes(cur))
            rsts.append(m - 0xD0)
            cur = bytearray()
            i = j + 2
        else:
            chunks.append(bytes(cur))
            return chunks, rsts, j


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a baseline sequential grayscale JPEG →
    ``(width, height, channels=1, gray_bytes)``.

    Full honest decode: marker walk, DQT/DHT table loads, SOF0/SOF1
    frame header, DRI/RSTn restart handling, canonical Huffman entropy
    decode with byte unstuffing, dequantize + dezigzag, batched 2-D
    IDCT, level shift, clamp, crop of MCU padding. ``ValueError`` on
    corruption, ``NotImplementedError`` for valid-but-out-of-scope
    processes (progressive, arithmetic, 12-bit, color/subsampled)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list] = {}  # (class, id) -> 16-bit decode LUT
    frame = None  # (height, width)
    dri = 0
    scan_tables = None  # (dc table id, ac table id)
    pos = 2
    n = len(payload)
    while True:
        if pos + 2 > n:
            raise ValueError("JPEG: truncated before SOS")
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}, got {payload[pos]:#x}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte
            pos -= 1
            continue
        if marker == 0xD9:
            raise ValueError("JPEG: EOI before any scan")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            raise ValueError(f"JPEG: unexpected standalone marker {marker:#x}")
        if pos + 2 > n:
            raise ValueError("JPEG: truncated segment length")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            raise ValueError(f"JPEG: segment {marker:#x} overruns payload")
        body = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq == 1:
                    raise NotImplementedError("JPEG: 16-bit quant tables (12-bit)")
                if pq != 0 or tq > 3 or i + 65 > len(body):
                    raise ValueError("JPEG: malformed DQT")
                t = np.empty(64, np.int64)
                for k in range(64):
                    t[_ZIGZAG[k]] = body[i + 1 + k]
                if t.min() < 1:
                    raise ValueError("JPEG: zero quantizer in DQT")
                qt[tq] = t
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                if tc > 1 or th > 3:
                    raise ValueError("JPEG: malformed DHT class/id")
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                if i + 17 + cnt > len(body):
                    raise ValueError("JPEG: DHT values truncated")
                huff[(tc, th)] = _decode_lut(bits, list(body[i + 17 : i + 17 + cnt]))
                i += 17 + cnt
            else:
                if i != len(body):
                    raise ValueError("JPEG: DHT trailing bytes")
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline/extended huffman
            if len(body) < 6:
                raise ValueError("JPEG: SOF too short")
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG: {prec}-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"JPEG: {ncomp}-component frames out of scope (grayscale "
                    "and 3-component color decode here)"
                )
            if len(body) != 6 + 3 * ncomp:
                raise ValueError("JPEG: SOF component list truncated")
            if h == 0 or w == 0:
                raise ValueError("JPEG: zero dimension in SOF")
            comps = []  # (comp_id, h_i, v_i, quant table id)
            for c in range(ncomp):
                cid, samp, ctq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 15, ctq))
            samplings = [(hi, vi) for _, hi, vi, _ in comps]
            if ncomp == 1:
                if samplings != [(1, 1)]:
                    raise NotImplementedError("JPEG: subsampled single component")
            elif samplings not in (
                [(1, 1), (1, 1), (1, 1)],  # 4:4:4
                [(2, 2), (1, 1), (1, 1)],  # 4:2:0
            ):
                raise NotImplementedError(
                    f"JPEG: sampling {samplings} out of scope (4:4:4 and "
                    "4:2:0 decode here)"
                )
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError("JPEG: progressive (SOF2) decode out of scope")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: SOF{marker - 0xC0} process (lossless/arithmetic/"
                "hierarchical) out of scope"
            )
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                raise ValueError("JPEG: malformed DRI")
            (dri,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            nsc = body[0] if body else 0
            if nsc != len(frame[2]) or len(body) != 1 + 2 * nsc + 3:
                raise ValueError("JPEG: malformed SOS header")
            for c in range(nsc):
                # the scan's component selector must name the SOF
                # components in frame order — a mismatched Cs would
                # silently route tables/planes to the wrong component
                # (review r10), so it is corruption, not a quiet remap
                if body[1 + 2 * c] != frame[2][c][0]:
                    raise ValueError(
                        "JPEG: SOS component selector does not match SOF order"
                    )
            scan_tables = [
                (body[2 + 2 * c] >> 4, body[2 + 2 * c] & 15) for c in range(nsc)
            ]
            break
        # APPn / COM / anything else with a length: skipped

    h, w, comps = frame
    ncomp = len(comps)
    hmax = max(hi for _, hi, _, _ in comps)
    vmax = max(vi for _, _, vi, _ in comps)
    per_comp = []  # (dc lut, ac lut, h_i, v_i, quant table)
    for (cid, hi, vi, ctq), (dc_id, ac_id) in zip(comps, scan_tables):
        if ctq not in qt:
            raise ValueError(f"JPEG: scan references missing quant table {ctq}")
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("JPEG: scan references missing Huffman table")
        per_comp.append((huff[(0, dc_id)], huff[(1, ac_id)], hi, vi, qt[ctq]))
    # flat per-MCU decode schedule: component index once per block
    schedule = [
        ci for ci, (_, _, hi, vi, _) in enumerate(per_comp) for _ in range(hi * vi)
    ]

    chunks, rsts, end = _split_entropy(payload, pos)
    if payload[end : end + 2] != b"\xff\xd9":
        raise ValueError("JPEG: scan not terminated by EOI")
    for i, r in enumerate(rsts):
        if r != i % 8:
            raise ValueError(f"JPEG: restart marker out of sequence (RST{r})")
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    nmcus = mcus_x * mcus_y
    if dri == 0 and len(chunks) != 1:
        raise ValueError("JPEG: restart markers present without DRI")
    if dri:
        want = -(-nmcus // dri)
        if len(chunks) != want:
            raise ValueError(
                f"JPEG: {len(chunks)} restart intervals, expected {want}"
            )

    rows: list[list[list[int]]] = [[] for _ in range(ncomp)]
    done = 0
    for chunk in chunks:
        rd = _FastReader(chunk)
        preds = [0] * ncomp
        todo = min(dri, nmcus - done) if dri else nmcus
        for _ in range(todo):
            for ci in schedule:
                dc, ac = per_comp[ci][0], per_comp[ci][1]
                blk = [0] * 64
                s = rd.sym(dc)
                if s > 11:
                    raise ValueError("JPEG: DC category out of range")
                if s:
                    preds[ci] += _extend(rd.bits(s), s)
                blk[0] = preds[ci]
                k = 1
                while k < 64:
                    symb = rd.sym(ac)
                    r, s = symb >> 4, symb & 15
                    if s == 0:
                        if symb == 0x00:  # EOB
                            break
                        if symb == 0xF0:  # ZRL
                            k += 16
                            continue
                        raise ValueError(f"JPEG: invalid AC symbol {symb:#x}")
                    k += r
                    if k > 63:
                        raise ValueError("JPEG: AC run past end of block")
                    blk[k] = _extend(rd.bits(s), s)
                    k += 1
                if rd.borrowed():
                    raise ValueError("JPEG entropy data: truncated mid-block")
                rows[ci].append(blk)
            done += 1
        # trailing pad bits in the chunk are 1s by spec; tolerate any pad
        if rd.real_bits_left() >= 8:
            raise ValueError("JPEG: extra bytes after last block in interval")
    if done != nmcus:
        raise ValueError(f"JPEG: decoded {done}/{nmcus} MCUs")

    planes = []
    for ci, (_, _, hi, vi, qtab) in enumerate(per_comp):
        zz = np.array(rows[ci], np.int64)
        deq = np.empty((len(zz), 64), np.float64)
        q = qtab.astype(np.float64)
        deq[:, _ZIGZAG] = zz * q[_ZIGZAG]
        # batched IDCT p = M.T @ F @ M (broadcast matmul: ~20x einsum here)
        spatial = np.matmul(np.matmul(_M.T, deq.reshape(-1, 8, 8)), _M)
        # blocks arrive in (mcu_y, mcu_x, v_i, h_i) raster order
        plane = (
            spatial.reshape(mcus_y, mcus_x, vi, hi, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcus_y * vi * 8, mcus_x * hi * 8)
            + 128.0
        )
        plane = np.clip(np.rint(plane), 0, 255).astype(np.uint8)
        if hi < hmax or vi < vmax:  # nearest-neighbour chroma upsample
            plane = np.repeat(np.repeat(plane, vmax // vi, 0), hmax // hi, 1)
        planes.append(plane[:h, :w])
    if ncomp == 1:
        return w, h, 1, planes[0].tobytes()
    # interleaved coded components (YCbCr under the JFIF convention) —
    # no color transform: T.81 decode ends at the component samples, and
    # staying in the coded space keeps the exactness guarantees intact
    return w, h, 3, np.stack(planes, axis=-1).tobytes()


def ycc_to_rgb_fixed(y, cb, cr):
    """Fixed-point JFIF/BT.601 YCbCr→RGB — the deterministic integer
    form of the float conversion the JPEG decoder deliberately does NOT
    apply (see module docstring): 8-bit-fraction coefficients
    (1.402→359/256, 0.344136→88/256, 0.714136→183/256, 1.772→454/256),
    round-half-up via the +128 bias, clamp to [0,255]. Division is
    written as a floor of a non-negative numerator (the +65536 offset)
    so numpy, Spark `div` and DuckDB `//` all agree bit-for-bit —
    cross-engine oracles can replay the exact arithmetic in SQL.

    Takes and returns int64 numpy arrays (any shape, elementwise)."""
    import numpy as np

    cb1 = cb.astype(np.int64) - 128
    cr1 = cr.astype(np.int64) - 128
    y64 = y.astype(np.int64)
    r = y64 + (359 * cr1 + 128 + 65536) // 256 - 256
    g = y64 - ((88 * cb1 + 183 * cr1 + 128 + 65536) // 256 - 256)
    b = y64 + (454 * cb1 + 128 + 65536) // 256 - 256
    clip = lambda a: np.clip(a, 0, 255)  # noqa: E731
    return clip(r), clip(g), clip(b)
