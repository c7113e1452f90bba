"""Multimodal column handling (E5, SURVEY.md §2.11).

Treats image/audio/video payloads as opaque BINARY columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the Spark-idiomatic
shape for media pipelines at 100 TB (payload bytes never pass through
row-at-a-time Python; each task streams pandas batches).

Two decode tiers:

  * REAL byte-level decode for formats parseable without codec libs:
    WAV/PCM16 audio (RIFF chunk walk), binary PPM (P6) images,
    COMPRESSED PNG (full zlib inflate + five-filter scanline
    reconstruction + per-chunk CRC verification), baseline-sequential
    grayscale JPEG (marker walk, canonical Huffman entropy decode,
    dequant + IDCT — operators/jpeg.py), and Y4M (YUV4MPEG2)
    uncompressed video — ``decode_media`` returns actual
    samples/pixels/frames, ``resize_media`` does a real
    nearest-neighbour resize of P6/PNG/JPEG payloads, and the
    q106/q107/q108/q253/q289 pipelines encode documents into genuine
    WAV/PPM/Y4M/PNG/JPEG bytes, decode them back inside mapInPandas,
    and feature-ize the decoded data (oracle-checked).
  * STUB for the remaining compressed codecs (MP4/MP3, progressive or
    color JPEG...), which have no pure-Python decode path in this
    container: ``decode_media`` raises NotImplementedError rather than
    let fake features pass as decodes; ``extract_features`` exercises
    the same plumbing with a deterministic md5-derived feature.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tagtree_spark.session import spread
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal schema: one row per media object.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # 'text' | 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("head_h60", LongType()),  # h60 of the first 16 payload bytes
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from the driver's ``documents`` fixture:
    payload = utf-8 bytes of the text (a stand-in for image bytes), typed
    metadata map. Pure projection."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# Real byte-level codecs (E5, VERDICT r4 "next" #3): WAV/PCM16 and PPM(P6)
# are fully public formats parseable with the stdlib alone — no codec
# library needed. decode_media dispatches on the payload's magic bytes;
# only modalities with no pure-Python format left (video containers,
# compressed codecs) still raise.
# --------------------------------------------------------------------------


def _wav_wrap(data: bytes, sample_rate: int, channels: int) -> bytes:
    """Wrap raw little-endian PCM16 bytes in the canonical RIFF/WAVE
    container — 'RIFF' size 'WAVE', an 'fmt ' chunk (16 bytes), one
    'data' chunk (public WAVE spec layout)."""
    import struct

    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * channels * 2,  # byte rate
        channels * 2,  # block align
        16,  # bits per sample
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_pcm16(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """Minimal canonical RIFF/WAVE writer: PCM (format 1), 16-bit LE
    interleaved samples."""
    import struct

    return _wav_wrap(struct.pack(f"<{len(samples)}h", *samples), sample_rate, channels)


def _wav_parse(payload: bytes) -> tuple[int, int, bytes]:
    """RIFF chunk walk → ``(sample_rate, channels, raw PCM16 data bytes)``.
    Chunks are (4cc, u32 size, bytes), word-aligned, so writers that emit
    extra chunks (LIST/INFO, fact) still decode. Raises ValueError on
    non-RIFF bytes or non-PCM16 encodings — a corrupt payload must fail
    loudly, not hash quietly."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    rate = nch = None
    data = b""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, nch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAVE encoding (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            if rate is None:
                raise ValueError("WAVE data chunk before fmt chunk")
            data += body[: 2 * (len(body) // 2)]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None:
        raise ValueError("WAVE payload has no fmt chunk")
    return int(rate), int(nch), data


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, list[int]]:
    """Parse a RIFF/WAVE PCM16 payload → ``(sample_rate, channels,
    samples)`` (see :func:`_wav_parse` for the chunk-walk contract)."""
    import struct

    rate, nch, data = _wav_parse(payload)
    return rate, nch, list(struct.unpack(f"<{len(data) // 2}h", data))


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) writer — header + raw RGB triples."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"P6 payload needs {width * height * 3} bytes, got {len(rgb)}")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) payload → ``(width, height, rgb_bytes)``.
    Full header grammar: whitespace-separated tokens, '#' comments allowed
    anywhere in the header, single whitespace byte before pixel data."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte separates header from pixels
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = width * height * 3
    rgb = payload[pos : pos + need]
    if len(rgb) != need:
        raise ValueError(f"PPM pixel data truncated: {len(rgb)}/{need} bytes")
    return width, height, rgb


def encode_bmp(width: int, height: int, rgb: bytes, top_down: bool = False) -> bytes:
    """24-bit BI_RGB Windows bitmap writer (BITMAPFILEHEADER +
    BITMAPINFOHEADER). The format's quirks are real: rows are stored
    BOTTOM-UP by default in BGR channel order, each row padded to a
    4-byte boundary; ``top_down=True`` writes the negative-height
    variant (rows in natural order). Input is top-down RGB like the
    other image writers."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError(f"BMP payload needs {width * height * 3} bytes, got {len(rgb)}")
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    rows = []
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        bgr = bytearray(row)
        bgr[0::3] = row[2::3]
        bgr[2::3] = row[0::3]
        rows.append(bytes(bgr) + pad)
    px = b"".join(rows)
    bih = struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        24,
        0,
        len(px),
        2835,
        2835,
        0,
        0,
    )
    off = 14 + 40
    bfh = b"BM" + struct.pack("<IHHI", off + len(px), 0, 0, off)
    return bfh + bih + px


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit BI_RGB BMP → ``(width, height, rgb_bytes)`` in
    top-down RGB order. Validates the 'BM' magic, header lengths, plane
    count, pixel-array offset and size; undoes the bottom-up row order
    (or honors a negative-height top-down bitmap), the BGR channel
    order, and the 4-byte row stride padding. Other bit depths /
    compressions (RLE, bitfields, palette) raise NotImplementedError —
    the triage path routes them to the transcode queue rather than
    faking pixels."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("BMP header truncated")
    _fsize, _r1, _r2, off = struct.unpack("<IHHI", payload[2:14])
    bisize, w, h_raw, planes, bpp, comp, _isz, _xp, _yp, _clr, _imp = struct.unpack(
        "<IiiHHIIiiII", payload[14:54]
    )
    if bisize < 40:
        raise ValueError(f"unsupported BMP info-header size {bisize}")
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMPs decode (bpp={bpp}, compression={comp})"
        )
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0 or off < 54:
        raise ValueError(f"BMP geometry invalid ({w}x{h_raw}, offset {off})")
    stride = (w * 3 + 3) & ~3
    need = stride * h
    px = payload[off : off + need]
    if len(px) != need:
        raise ValueError(f"BMP pixel array truncated: {len(px)}/{need} bytes")
    out = bytearray(w * h * 3)
    for i in range(h):
        y = i if top_down else h - 1 - i
        row = px[i * stride : i * stride + w * 3]
        o = y * w * 3
        rgb = bytearray(row)
        rgb[0::3] = row[2::3]
        rgb[2::3] = row[0::3]
        out[o : o + w * 3] = rgb
    return w, h, bytes(out)


# --------------------------------------------------------------------------
# Real GIF codec: the second COMPRESSED image format decodable without
# any codec library — GIF's only compression is LZW (spec'd in 1987),
# implemented here from scratch with the variable-width code schedule.
# Scope: non-interlaced single-image GIF87a/GIF89a with a global or
# local color table; 89a extension blocks are skipped per the spec's
# block grammar. Interlaced images refuse (NotImplementedError) rather
# than return wrongly-ordered pixels.
# --------------------------------------------------------------------------

_GIF_MAX_CODE = 1 << 12  # LZW code width is capped at 12 bits


def _lzw_encode(indices: bytes, min_code_size: int = 8) -> bytes:
    """GIF-flavor LZW: LSB-first bit packing, CLEAR/EOI codes, code
    width growing 9→12 bits as the dictionary fills, CLEAR emitted when
    it would overflow. Width bumps happen after each insert when
    next_code hits 2^width — the decoder performs the mirror-image
    insert per code read, so both sides stay width-synchronized."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    nbits = 0
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for ch in indices:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code == _GIF_MAX_CODE:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = c
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int | None = None) -> bytes:
    """Inverse of :func:`_lzw_encode`, including the KwKwK self-reference
    case (code == next_code). Truncated streams (bits run out before
    EOI) and out-of-range codes raise ValueError — EXCEPT that a stream
    ending after ``expected`` pixels without an explicit EOI is
    accepted, because real-world writers (the canonical minimal GIFs)
    omit EOI and every deployed decoder stops at the pixel count."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = eoi + 1
    cur = 0
    nbits = 0
    pos = 0
    out = bytearray()
    w: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                if expected is not None and len(out) >= expected:
                    return bytes(out)
                # the encoder makes NO insert before emitting EOI, so the
                # decoder's one-early width bump after the FINAL data code
                # can leave it wanting one bit more than the stream holds
                # when EOI's old-width bits end exactly at a byte boundary
                # (no zero padding to rescue the wide read): accept an EOI
                # spelled at the previous width as a clean terminal
                if (
                    code_size > min_code_size + 1
                    and nbits == code_size - 1
                    and (cur & ((1 << (code_size - 1)) - 1)) == eoi
                ):
                    return bytes(out)
                raise ValueError("LZW stream truncated before EOI")
            cur |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = cur & ((1 << code_size) - 1)
        cur >>= code_size
        nbits -= code_size
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
            w = None
            continue
        if code == eoi:
            return bytes(out)
        if w is None:
            if code >= clear:
                raise ValueError(f"first LZW code {code} is not a literal")
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = w + w[:1]  # the KwKwK case
            else:
                raise ValueError(f"LZW code {code} beyond dictionary ({next_code})")
            if next_code < _GIF_MAX_CODE:
                table[next_code] = w + entry[:1]
                next_code += 1
                # the decoder's dictionary lags the encoder's by ONE
                # insert (it reconstructs entry k only after reading
                # code k+1), so it must widen one entry early to stay
                # bit-synchronized: at 2^width − 1, not 2^width
                if next_code == (1 << code_size) - 1 and code_size < 12:
                    code_size += 1
        out += entry
        if expected is not None and len(out) >= expected:
            return bytes(out)
        w = entry


def encode_gif(width: int, height: int, indices: bytes, palette: bytes) -> bytes:
    """Single-image GIF87a writer: logical screen descriptor, 256-entry
    global color table, image descriptor, real LZW-compressed pixel
    indices in ≤255-byte sub-blocks, trailer."""
    import struct

    if len(indices) != width * height:
        raise ValueError(f"GIF needs {width * height} indices, got {len(indices)}")
    if len(palette) != 256 * 3:
        raise ValueError("GIF writer uses a 256-entry RGB palette")
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | 0x70 | 0x07, 0, 0])  # GCT present, 8-bit, 256 entries
    out += palette
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(indices, 8)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a GIF87a/89a payload → ``(width, height, rgb_bytes)``:
    header + screen descriptor validation, global/local color table,
    89a extension-block skipping, sub-block reassembly, full LZW
    decompression, palette mapping. Interlaced images refuse."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("GIF global color table truncated")
        pos += 3 * n
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended without an image block")
        intro = payload[pos]
        pos += 1
        if intro == 0x21:  # 89a extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF extension truncated")
                blen = payload[pos]
                pos += 1 + blen
                if blen == 0:
                    break
            continue
        if intro == 0x3B:
            raise ValueError("GIF trailer reached before any image")
        if intro != 0x2C:
            raise ValueError(f"unknown GIF block introducer 0x{intro:02x}")
        break
    if pos + 9 > len(payload):
        raise ValueError("GIF image descriptor truncated")
    left, top, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
    ipacked = payload[pos + 8]
    pos += 9
    if ipacked & 0x40:
        raise NotImplementedError("interlaced GIFs are out of scope")
    table = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        table = payload[pos : pos + 3 * n]
        if len(table) != 3 * n:
            raise ValueError("GIF local color table truncated")
        pos += 3 * n
    if not table:
        raise ValueError("GIF image has no color table")
    if w <= 0 or h <= 0 or w > sw or h > sh or left + w > sw or top + h > sh:
        raise ValueError(f"GIF geometry invalid ({w}x{h} in {sw}x{sh})")
    if pos >= len(payload):
        raise ValueError("GIF LZW header truncated")
    min_code_size = payload[pos]
    pos += 1
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF LZW minimum code size {min_code_size} invalid")
    lzw = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-blocks truncated")
        blen = payload[pos]
        pos += 1
        if blen == 0:
            break
        block = payload[pos : pos + blen]
        if len(block) != blen:
            raise ValueError("GIF sub-block truncated")
        lzw += block
        pos += blen
    indices = _lzw_decode(bytes(lzw), min_code_size, expected=w * h)
    if len(indices) != w * h:
        raise ValueError(f"GIF decoded {len(indices)} pixels, expected {w * h}")
    ncolors = len(table) // 3
    out = bytearray(w * h * 3)
    for i, ix in enumerate(indices):
        if ix >= ncolors:
            raise ValueError(f"GIF index {ix} beyond color table ({ncolors})")
        out[3 * i : 3 * i + 3] = table[3 * ix : 3 * ix + 3]
    return w, h, bytes(out)


#: 256-entry grayscale palette (i, i, i) — the fixture's color table.
GIF_GRAY_PALETTE = bytes(v for i in range(256) for v in (i, i, i))


# --------------------------------------------------------------------------
# Real PNG codec (VERDICT r8 #2): PNG is the one COMPRESSED image format
# fully decodable with the stdlib alone (zlib is the spec's only
# compression method). Scope: non-interlaced 8-bit RGB/RGBA with all five
# scanline filters — the overwhelmingly common shape a multimodal ingest
# sees. Indexed/16-bit/interlaced still refuse (decode_media) rather than
# fake features. The parse is honest end-to-end: signature, per-chunk
# CRC32 verification, IHDR validation, zlib inflate, per-scanline
# unfiltering with the spec's None/Sub/Up/Average/Paeth predictors.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    # the spec's predictor: closest of left/above/upper-left to a+b-c
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    filters: list[int] | None = None,
) -> bytes:
    """Non-interlaced 8-bit RGB (``channels=3``) / RGBA (4) PNG writer.
    ``filters`` picks the filter type per scanline (cycled; default all
    None) — the writer applies the real filter TRANSFORM, so a decoder
    must genuinely unfilter to recover the pixels (the round-trip tests
    cycle all five types)."""
    if channels not in (3, 4):
        raise ValueError(f"encode_png: channels must be 3 or 4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"encode_png: need {stride * height} pixel bytes, got {len(pixels)}"
        )
    import struct
    import zlib

    if not filters:
        filters = [0]
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        ft = filters[y % len(filters)]
        if ft not in (0, 1, 2, 3, 4):
            raise ValueError(f"encode_png: unknown filter type {ft}")
        raw.append(ft)
        for x in range(stride):
            a = line[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            raw.append((line[x] - pred) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2 if channels == 3 else 6, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Parse a PNG payload → ``(width, height, channels, pixel_bytes)``.

    Honest full decode: chunk walk with CRC32 verification, IHDR
    validation (8-bit, color type 2/6, non-interlaced), IDAT concat +
    zlib inflate, and the five-filter scanline reconstruction. Raises
    ValueError on any corruption (bad CRC, truncated stream, wrong
    inflated size) and NotImplementedError for valid-but-out-of-scope
    shapes (interlaced, palette, 16-bit) — triage callers route those to
    'corrupt' vs 'unsupported_codec' respectively."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("PNG missing/malformed IHDR")
    if not ended:
        raise ValueError("PNG missing IEND")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt != 0:
        raise ValueError(f"PNG invalid compression/filter method {comp}/{filt}")
    if depth != 8 or color not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color} interlace={interlace}: only "
            "non-interlaced 8-bit RGB/RGBA decode here"
        )
    if width == 0 or height == 0:
        raise ValueError("PNG zero dimension")
    channels = 3 if color == 2 else 4
    stride = width * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from None
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG inflated size {len(raw)} != {(stride + 1) * height} expected"
        )
    out = bytearray(stride * height)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line_in = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride  # this scanline; previous is off - stride
        if ft == 0:
            out[off : off + stride] = line_in
            continue
        if ft not in (1, 2, 3, 4):
            raise ValueError(f"PNG scanline {y}: unknown filter {ft}")
        for x in range(stride):
            a = out[off + x - channels] if x >= channels else 0
            b = out[off - stride + x] if y > 0 else 0
            c = out[off - stride + x - channels] if (y > 0 and x >= channels) else 0
            if ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            out[off + x] = (line_in[x] + pred) & 0xFF
    return width, height, channels, bytes(out)


def decode_media(modality: str, payload: bytes):
    """Decode a media payload by modality + magic bytes:

      * ``audio`` / RIFF..WAVE → ``(sample_rate, channels, [int16 samples])``
        (:func:`decode_wav_pcm16`);
      * ``image`` / P6 → ``(width, height, rgb_bytes)`` (:func:`decode_ppm`);
      * ``image`` / BM → ``(width, height, rgb_bytes)`` (:func:`decode_bmp`
        — 24-bit BI_RGB, bottom-up or top-down, BGR + stride undone);
      * ``image`` / GIF8 → ``(width, height, rgb_bytes)``
        (:func:`decode_gif` — real from-scratch LZW decompression with
        the variable-width code schedule, 87a/89a, extension skipping,
        palette mapping; interlaced refuses);
      * ``image`` / PNG signature → ``(width, height, channels,
        pixel_bytes)`` (:func:`decode_png` — real zlib inflate + five-filter
        unfiltering; 8-bit RGB/RGBA non-interlaced);
      * ``image`` / SOI (0xFFD8) → ``(width, height, channels,
        component_bytes)`` (:func:`tagtree_spark.operators.jpeg.
        decode_jpeg` — real baseline sequential Huffman decode + IDCT;
        grayscale and 4:4:4 / 4:2:0 color; progressive/arithmetic/other
        samplings raise NotImplementedError);
      * ``video`` / YUV4MPEG2 → ``(width, height, [gray frames])``
        (:func:`decode_y4m`).

    Remaining compressed codecs (MP4/MP3...) have no pure-Python decode
    path in this environment and still raise — callers must not treat
    fake features as real decodes for formats we cannot actually parse.
    """
    if modality == "audio" and payload[:4] == b"RIFF":
        return decode_wav_pcm16(payload)
    if modality == "image" and payload[:2] == b"P6":
        return decode_ppm(payload)
    if modality == "image" and payload[:2] == b"BM":
        return decode_bmp(payload)
    if modality == "image" and payload[:4] == b"GIF8":
        return decode_gif(payload)
    if modality == "image" and payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if modality == "image" and payload[:2] == b"\xff\xd8":
        from tagtree_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if modality == "video" and payload[:9] == b"YUV4MPEG2":
        return decode_y4m(payload)
    raise NotImplementedError(
        f"decode_media({modality!r}): no pure-Python decoder for this "
        "payload (remaining compressed codecs are out of scope in this "
        "environment); WAV/PCM16 audio, P6 PPM + PNG + baseline JPEG "
        "images, and Y4M video decode for real."
    )


def resize_media(modality: str, payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbour resize of an image payload → same-format payload
    (real decode → index map → re-encode; P6 and PNG RGB/RGBA). Other
    modalities raise: audio resampling and video scaling need DSP/codec
    machinery out of scope here."""
    if modality == "image":
        if payload[:4] == b"GIF8":
            w0, h0, rgb = decode_gif(payload)
            if any(
                rgb[3 * i] != rgb[3 * i + 1] or rgb[3 * i] != rgb[3 * i + 2]
                for i in range(w0 * h0)
            ):
                raise NotImplementedError(
                    "GIF resize re-encodes through the grayscale palette; "
                    "color GIFs would need palette requantization (out of "
                    "scope — no codec library here)"
                )
            out = bytearray()
            for y in range(height):
                sy = y * h0 // height
                for x in range(width):
                    sx = x * w0 // width
                    out.append(rgb[3 * (sy * w0 + sx)])
            return encode_gif(width, height, bytes(out), GIF_GRAY_PALETTE)
        if payload[:8] == _PNG_SIG:
            w0, h0, ch, px = decode_png(payload)
        elif payload[:2] == b"\xff\xd8":
            from tagtree_spark.operators.jpeg import (
                decode_jpeg,
                encode_jpeg_color,
                encode_jpeg_gray,
            )

            w0, h0, ch, px = decode_jpeg(payload)
            out = bytearray()
            for y in range(height):
                sy = y * h0 // height
                for x in range(width):
                    sx = x * w0 // width
                    o = (sy * w0 + sx) * ch
                    out += px[o : o + ch]
            # re-encode is a real (lossy) baseline pass, like any JPEG resize
            if ch == 1:
                return encode_jpeg_gray(width, height, bytes(out))
            return encode_jpeg_color(width, height, bytes(out))
        else:
            w0, h0, px = decode_ppm(payload)
            ch = 3
        out = bytearray()
        for y in range(height):
            sy = y * h0 // height
            for x in range(width):
                sx = x * w0 // width
                o = (sy * w0 + sx) * ch
                out += px[o : o + ch]
        if payload[:8] == _PNG_SIG:
            return encode_png(width, height, bytes(out), ch)
        return encode_ppm(width, height, bytes(out))
    raise NotImplementedError(
        f"resize_media({modality!r}, {width}x{height}): only image "
        "payloads (P6/PNG) resize without codec libraries"
    )


def _h60_bytes(b: bytes) -> int:
    return int(hashlib.md5(b).hexdigest()[:15], 16)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("chunk_h60", LongType()),
    ]
)

CHUNK_CHARS = 100
MAX_CHUNKS = 5


def _chunk_units(payload: bytes) -> str | bytes:
    """Chunking domain for a payload: decoded text when the payload is
    valid utf-8, raw bytes otherwise. Slicing by CHARACTERS (not bytes) for
    text keeps the fake features aligned with the oracle's
    character-indexed ``substr`` — a byte slice would split a multibyte
    character and silently diverge (ADVICE r2). Real codecs would make this
    frames/samples instead."""
    try:
        return payload.decode("utf-8")
    except UnicodeDecodeError:
        return payload


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame/chunk sampling — the 1→N mapInPandas shape a video pipeline
    uses (decode → every-Nth-frame). With codecs stubbed, "frames" are
    fixed-size payload chunks (100 CHARACTERS for text payloads, mirroring
    the oracle's substr) and the "feature" is the content hash of the
    chunk's utf-8 bytes — the row-expansion plumbing (one input row yields
    up to MAX_CHUNKS output rows inside the Arrow batch) is the real part."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "chunk_idx": [], "chunk_h60": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                units = _chunk_units(bytes(payload))
                n = min(MAX_CHUNKS, (len(units) + CHUNK_CHARS - 1) // CHUNK_CHARS)
                for i in range(n):
                    chunk = units[i * CHUNK_CHARS : (i + 1) * CHUNK_CHARS]
                    raw = chunk.encode("utf-8") if isinstance(chunk, str) else chunk
                    out["media_id"].append(int(mid))
                    out["chunk_idx"].append(i)
                    out["chunk_h60"].append(_h60_bytes(raw))
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "chunk_idx": "int64", "chunk_h60": "int64"}
            )

    return spread(media).mapInPandas(batches, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas streams pandas batches per task — payload bytes stay inside
    the Arrow buffers; the fake feature (h60 of the utf-8 bytes of the
    first 16 CHARACTERS) matches ``duck_h60(substr(text, 1, 16))`` in the
    oracle because substr is character-indexed and Python/Spark/DuckDB md5
    agree byte-for-byte. ``n_bytes`` stays BYTE length (= DuckDB strlen).
    """

    def _head16(b: bytes) -> int:
        units = _chunk_units(bytes(b))
        head = units[:16]
        return _h60_bytes(head.encode("utf-8") if isinstance(head, str) else head)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "head_h60": pdf["payload"].map(_head16).astype("int64"),
                }
            )

    # spread: a single-file input would otherwise run all Python batches
    # in ONE task — Arrow parallelism needs input partitions.
    return spread(media).mapInPandas(batches, schema=FEATURE_SCHEMA)


MAX_WINDOWS = 6

AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("start_unit", LongType()),
        StructField("n_units", LongType()),
        StructField("win_h60", LongType()),
    ]
)


def audio_from_documents(docs: DataFrame) -> DataFrame:
    """Audio-shaped multimodal table from the documents fixture: payload =
    utf-8 bytes standing in for PCM samples, with the sample-rate metadata
    a real audio table carries (sample_rate drives window geometry)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.map_from_arrays(
            F.array(F.lit("sample_rate"), F.lit("channels")),
            F.array(F.lit("100"), F.lit("1")),
        ).alias("meta"),
    )


def audio_windows(media: DataFrame, win_ms: int = 500, hop_ms: int = 300) -> DataFrame:
    """Overlapping analysis windows over an audio payload — the STFT/VAD
    framing shape (window length and hop derived from the row's OWN
    sample-rate metadata, hop < win ⇒ overlap), 1→N inside the Arrow
    batch. With codecs stubbed, "samples" are characters of the decoded
    payload (mirroring the oracle's char-indexed substr); the window
    feature is the content hash of the window's bytes. Real decode would
    swap `_chunk_units` for PCM frames — geometry, schema, and batching
    are the real, tested part."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "win_idx": [], "start_unit": [], "n_units": [], "win_h60": []
            }
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                m = dict(meta) if meta is not None else {}
                sr = int(m.get("sample_rate", "100"))
                win = max(1, sr * win_ms // 1000)
                hop = max(1, sr * hop_ms // 1000)
                units = _chunk_units(bytes(payload))
                k = 0
                while k * hop < len(units) and k < MAX_WINDOWS:
                    chunk = units[k * hop : k * hop + win]
                    raw = chunk.encode("utf-8") if isinstance(chunk, str) else chunk
                    out["media_id"].append(int(mid))
                    out["win_idx"].append(k)
                    out["start_unit"].append(k * hop)
                    out["n_units"].append(len(chunk))
                    out["win_h60"].append(_h60_bytes(raw))
                    k += 1
            yield pd.DataFrame(out).astype(
                {c: "int64" for c in ("media_id", "win_idx", "start_unit", "n_units", "win_h60")}
            )

    return spread(media).mapInPandas(batches, schema=AUDIO_WINDOW_SCHEMA)


# --------------------------------------------------------------------------
# Real-decode pipelines over the documents fixture: synthesize a canonical
# WAV/PPM payload from each doc's bytes (deterministic, so a SQL oracle can
# recompute the features straight from the text), then DECODE THE BYTES
# BACK inside mapInPandas and compute features from the decoded samples —
# the full encode→Arrow→parse→feature path a media pipeline runs, with
# hash-checkable output.
# --------------------------------------------------------------------------

#: text byte b → int16 sample b*257 - 32768 (0 → -32768, 255 → 32767):
#: spans the full PCM16 range and inverts exactly in integer SQL.
_SAMPLE_SCALE, _SAMPLE_OFF = 257, -32768
WAV_SAMPLE_RATE = 100

AUDIO_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("sum_abs", LongType()),
        StructField("max_s", LongType()),
        StructField("min_s", LongType()),
    ]
)

IMG_WIDTH = 8  # fixed raster width; height grows with the payload

IMAGE_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixel_bytes", LongType()),
        StructField("sum_pixels", LongType()),
    ]
)


def wav_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL RIFF/WAVE PCM16 bytes: sample i
    is the affine-mapped i-th utf-8 byte of the text. Arrow-batched 1→1
    encode (the ingest-side twin of the decode path)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = [
                _wav_wrap(
                    (
                        np.frombuffer(t.encode("utf-8"), np.uint8).astype(np.int64)
                        * _SAMPLE_SCALE
                        + _SAMPLE_OFF
                    )
                    .astype("<i2")
                    .tobytes(),
                    WAV_SAMPLE_RATE,
                    1,
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "audio",
                    "payload": payloads,
                    "meta": [
                        {"sample_rate": str(WAV_SAMPLE_RATE), "channels": "1"}
                    ]
                    * len(payloads),
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decoded_audio_features(media: DataFrame) -> DataFrame:
    """Per-payload features computed from DECODED PCM samples (real RIFF
    chunk-walk parse, not payload hashing): count, exact integer absolute
    sum, min/max sample. Integer-only so the oracle matches bit-for-bit."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in AUDIO_DECODED_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, _nch, data = _wav_parse(bytes(payload))
                s = np.frombuffer(data, "<i2").astype(np.int64)
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["n_samples"].append(s.size)
                out["sum_abs"].append(int(np.abs(s).sum()) if s.size else 0)
                out["max_s"].append(int(s.max()) if s.size else 0)
                out["min_s"].append(int(s.min()) if s.size else 0)
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=AUDIO_DECODED_SCHEMA)


def ppm_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL binary PPM (P6) images: the
    text's utf-8 bytes laid out as grayscale RGB triples on a fixed-width
    raster, zero-padded to fill the last row (padding adds 0 to any pixel
    sum, keeping the oracle a plain aggregate over the text bytes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                row_bytes = IMG_WIDTH * 3
                height = max(1, -(-len(raw) // row_bytes))
                padded = raw.ljust(row_bytes * height, b"\x00")
                payloads.append(encode_ppm(IMG_WIDTH, height, padded))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                    "meta": [{"format": "ppm"}] * len(payloads),
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decoded_image_features(media: DataFrame) -> DataFrame:
    """Per-image features from DECODED pixels, dispatched on magic bytes
    (P6 header parse, or full PNG inflate+unfilter): geometry and the
    exact integer pixel sum."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in IMAGE_DECODED_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:8] == _PNG_SIG:
                    w, h, _ch, rgb = decode_png(b)
                else:
                    w, h, rgb = decode_ppm(b)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixel_bytes"].append(len(rgb))
                out["sum_pixels"].append(int(np.frombuffer(rgb, np.uint8).sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=IMAGE_DECODED_SCHEMA)


BMP_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixel_bytes", LongType()),
        StructField("sum_pixels", LongType()),
        StructField("possum", LongType()),
    ]
)


def bmp_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL 24-bit BMPs: the text's utf-8
    bytes as RGB triples on the shared fixed-width raster (zero-padded
    last row), alternating bottom-up and top-down (negative-height)
    storage by doc parity so BOTH row orders decode in every batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                raw = t.encode("utf-8")
                row_bytes = IMG_WIDTH * 3
                height = max(1, -(-len(raw) // row_bytes))
                padded = raw.ljust(row_bytes * height, b"\x00")
                payloads.append(
                    encode_bmp(IMG_WIDTH, height, padded, top_down=bool(int(did) % 2))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                    "meta": [{"format": "bmp"}] * len(payloads),
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decoded_bmp_features(media: DataFrame) -> DataFrame:
    """Geometry, exact pixel sum, AND the position-weighted checksum
    Σ(i+1)·bᵢ over the decoded top-down RGB bytes. The positional term
    is the point: a decoder that forgot to flip the bottom-up rows,
    swap BGR→RGB, or strip the stride padding still gets the plain sum
    right — only the correctly REORDERED raster reproduces possum,
    which the oracle recomputes directly from the text bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in BMP_DECODED_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rgb = decode_bmp(bytes(payload))
                arr = np.frombuffer(rgb, np.uint8).astype(np.int64)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixel_bytes"].append(len(rgb))
                out["sum_pixels"].append(int(arr.sum()))
                out["possum"].append(int((np.arange(1, len(arr) + 1) * arr).sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=BMP_DECODED_SCHEMA)


def gif_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL LZW-compressed GIFs: the
    text's utf-8 bytes as palette indices on a fixed 8-wide raster
    (zero-padded last row) against the 256-entry grayscale table, so
    each decoded pixel is (b, b, b)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                height = max(1, -(-len(raw) // IMG_WIDTH))
                padded = raw.ljust(IMG_WIDTH * height, b"\x00")
                payloads.append(
                    encode_gif(IMG_WIDTH, height, padded, GIF_GRAY_PALETTE)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                    "meta": [{"format": "gif"}] * len(payloads),
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decoded_gif_features(media: DataFrame) -> DataFrame:
    """Same feature tuple as :func:`decoded_bmp_features` (geometry,
    exact pixel sum, position-weighted checksum over the decoded RGB
    bytes) — possum pins the LZW decompression's exact output ORDER and
    the palette mapping, not just the byte population."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in BMP_DECODED_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rgb = decode_gif(bytes(payload))
                arr = np.frombuffer(rgb, np.uint8).astype(np.int64)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixel_bytes"].append(len(rgb))
                out["sum_pixels"].append(int(arr.sum()))
                out["possum"].append(int((np.arange(1, len(arr) + 1) * arr).sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=BMP_DECODED_SCHEMA)


def gif_thumbnail_features(media: DataFrame, out_w: int = 4) -> DataFrame:
    """GIF thumbnail pipeline (the q292 PNG shape, through the LZW
    codec): full GIF decode → nearest-neighbour ``resize_media`` to
    ``out_w`` wide × half height → REAL GIF re-encode → decode the
    thumbnail → geometry + exact pixel sum + position-weighted
    checksum. Both LZW passes are the real codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in BMP_DECODED_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _w0, h0, _rgb = decode_gif(bytes(payload))
                th = max(1, h0 // 2)
                thumb = resize_media("image", bytes(payload), out_w, th)
                w, h, rgb = decode_gif(thumb)
                arr = np.frombuffer(rgb, np.uint8).astype(np.int64)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixel_bytes"].append(len(rgb))
                out["sum_pixels"].append(int(arr.sum()))
                out["possum"].append(int((np.arange(1, len(arr) + 1) * arr).sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=BMP_DECODED_SCHEMA)


def png_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL compressed PNGs: the text's
    utf-8 bytes laid out as RGB triples on the same fixed-width raster as
    :func:`ppm_from_documents` (zero-padded last row), encoded with the
    scanline filter CYCLING through all five types by row — so decoding
    exercises every unfilter predictor, not just the stored path. Same
    Arrow-batched shape as the other builders; payloads never leave the
    executors."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                row_bytes = IMG_WIDTH * 3
                height = max(1, -(-len(raw) // row_bytes))
                padded = raw.ljust(row_bytes * height, b"\x00")
                payloads.append(
                    encode_png(IMG_WIDTH, height, padded, 3, [0, 1, 2, 3, 4])
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                    "meta": [{"format": "png"}] * len(payloads),
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# Real baseline JPEG (grayscale) — the codec itself lives in
# operators/jpeg.py; here is the Spark-facing fixture + feature pair.
# JPEG is lossy in general, so the fixture drives the codec's provably
# LOSSLESS regime (see the jpeg.py module docstring): one 8x8 block per
# text byte b, pixels b + a*s(x)*s(y) with the (4,4)-checkerboard sign
# pattern and amplitude a = b%4 (zeroed near the clamp edges) — exactly
# two integer DCT coefficients per block, so an all-ones quant table
# round-trips bit-exactly while the full DC *and* AC Huffman paths run.
# --------------------------------------------------------------------------

#: s(x) = sign(cos((2x+1)*pi/4)) — the (4,4) DCT basis sign pattern.
_JPEG_CHECKER = [1, -1, -1, 1, 1, -1, -1, 1]

#: SOF dimensions are 16-bit, so one-block-per-byte fixtures cap the
#: encoded byte count (8*n <= 65535 -> 8191; 16*n -> 4095). The builders
#: TRUNCATE to the cap and every oracle applies the same least() — a
#: longer document must degrade deterministically, not crash the encode
#: inside mapInPandas (review r10; the r5 "passed one scale" class).
JPEG_MAX_BYTES = 8191
JPEG420_MAX_BYTES = 4095


def _checker_blocks(raw: bytes, cap: int = JPEG_MAX_BYTES):
    """The shared lossless-regime block fixture: text bytes (truncated to
    the SOF dimension cap) → per-byte DC level b, AC amplitude a = b%4
    gated to [4, 251] (keeps b±a inside [0,255]), and the (n,8,8) pixel
    blocks b + a·checkerboard. ONE definition — four builders and five
    SQL oracles depend on this exact window (review r10)."""
    import numpy as np

    b = np.frombuffer((raw or b"\x00")[:cap], np.uint8).astype(np.int64)
    a = np.where((b >= 4) & (b <= 251), b % 4, 0)
    sv = np.array(_JPEG_CHECKER, np.int64)
    blocks = b[:, None, None] + a[:, None, None] * np.outer(sv, sv)
    return b, a, blocks

JPEG_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixel_bytes", LongType()),
        StructField("sum_pixels", LongType()),
        StructField("sum_abs_dev", LongType()),
    ]
)


def jpeg_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL baseline JPEGs: one 8x8 gray
    block per utf-8 text byte b (stacked vertically: width 8, height
    8*n), pixel(x,y) = b + a*s(x)*s(y) with a = b%4 for 4 <= b <= 251
    else 0 (keeps b±a inside [0,255] so the decoder's clamp is inert and
    the round-trip stays exact). Arrow-batched; payloads never leave
    executors."""
    from tagtree_spark.operators.jpeg import encode_jpeg_gray

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                b, _a, blocks = _checker_blocks(t.encode("utf-8"))
                px = blocks.reshape(-1, 8).astype(np.uint8).tobytes()
                payloads.append(encode_jpeg_gray(8, 8 * len(b), px))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                    "meta": [{"format": "jpeg"}] * len(payloads),
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decoded_jpeg_features(media: DataFrame) -> DataFrame:
    """Per-image features from DECODED JPEG pixels: geometry, exact
    integer pixel sum, and the summed per-block absolute deviation from
    the block mean — nonzero iff the AC (checkerboard) coefficients
    actually survived the Huffman+IDCT path, so the oracle catches a
    decoder that only gets DC right. Integer math throughout (the block
    mean enters as sum/64 via |64*p - s| // 64)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tagtree_spark.operators.jpeg import decode_jpeg

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in JPEG_DECODED_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _ch, gray = decode_jpeg(bytes(payload))
                px = np.frombuffer(gray, np.uint8).astype(np.int64)
                blocks = px.reshape(-1, 64)  # width is 8: one block per 8 rows
                bsum = blocks.sum(axis=1, keepdims=True)
                dev = np.abs(64 * blocks - bsum).sum() // 64
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixel_bytes"].append(len(gray))
                out["sum_pixels"].append(int(px.sum()))
                out["sum_abs_dev"].append(int(dev))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=JPEG_DECODED_SCHEMA)


THUMBNAIL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("sum_pixels", LongType()),
    ]
)


def png_thumbnail_features(media: DataFrame, out_w: int = 4) -> DataFrame:
    """End-to-end THUMBNAIL pipeline over PNG payloads: real decode →
    :func:`resize_media` (nearest-neighbour to ``out_w`` wide, half the
    source height) → real re-encode → decode the thumbnail → exact
    integer pixel sum. Because nearest-neighbour sampling is a
    deterministic index map (sy = y*h0//h1, sx = x*w0//out_w) and PNG is
    lossless, the q292 oracle reproduces the sum straight from the
    source bytes. One Arrow pass; payloads never leave executors."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in THUMBNAIL_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                _w0, h0, _ch, _px = decode_png(b)
                h1 = (h0 + 1) // 2
                thumb = resize_media("image", b, out_w, h1)
                w, h, _ch2, px = decode_png(thumb)
                out["media_id"].append(int(mid))
                out["out_w"].append(w)
                out["out_h"].append(h)
                out["sum_pixels"].append(int(np.frombuffer(px, np.uint8).sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=THUMBNAIL_SCHEMA)


JPEG_COLOR_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixel_bytes", LongType()),
        StructField("sum_y", LongType()),
        StructField("sum_cb", LongType()),
        StructField("sum_cr", LongType()),
        StructField("sum_abs_dev_y", LongType()),
    ]
)


def jpeg_color_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL 3-component 4:4:4 baseline
    JPEGs: per text byte b, the Y block is b + (b%4)·checkerboard (the
    q289 regime), Cb the constant 255-b, Cr the constant (3b)%256 — all
    three per-block coefficient sets integral, so the interleaved-MCU
    color round-trip is exact too."""
    from tagtree_spark.operators.jpeg import encode_jpeg_color

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                b, _a, blocks = _checker_blocks(t.encode("utf-8"))
                yb = blocks.reshape(-1, 8)
                cb = np.repeat(255 - b, 64).reshape(-1, 8)
                cr = np.repeat((3 * b) % 256, 64).reshape(-1, 8)
                px = np.stack([yb, cb, cr], axis=-1).astype(np.uint8).tobytes()
                payloads.append(encode_jpeg_color(8, 8 * len(b), px))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                    "meta": [{"format": "jpeg", "sampling": "4:4:4"}] * len(payloads),
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decoded_jpeg_color_features(media: DataFrame) -> DataFrame:
    """Per-image features from DECODED color JPEG components: geometry,
    exact per-channel sums, and the Y-plane per-block absolute deviation
    (AC-path proof, as in :func:`decoded_jpeg_features`)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tagtree_spark.operators.jpeg import decode_jpeg

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in JPEG_COLOR_DECODED_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, comps = decode_jpeg(bytes(payload))
                if ch != 3:
                    raise ValueError(f"media {mid}: expected 3 channels, got {ch}")
                px = np.frombuffer(comps, np.uint8).reshape(-1, 3).astype(np.int64)
                yb = px[:, 0].reshape(-1, 64)  # width 8: one block per 8 rows
                bsum = yb.sum(axis=1, keepdims=True)
                dev = np.abs(64 * yb - bsum).sum() // 64
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixel_bytes"].append(len(comps))
                out["sum_y"].append(int(px[:, 0].sum()))
                out["sum_cb"].append(int(px[:, 1].sum()))
                out["sum_cr"].append(int(px[:, 2].sum()))
                out["sum_abs_dev_y"].append(int(dev))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=JPEG_COLOR_DECODED_SCHEMA)


def jpeg420_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL 4:2:0 SUBSAMPLED baseline
    JPEGs: per text byte b, one 16x16 MCU — the Y plane a 2x2 tile of
    the q289 block (b + (b%4)·checkerboard), Cb/Cr constant over the
    MCU (255-b, (3b)%256). Constant chroma is the 4:2:0 EXACTNESS
    regime: the encoder's 2x2 box mean and the decoder's nearest
    upsample are both identities on constants, so the subsampled
    round-trip is bit-exact while the interleaved 4-Y+Cb+Cr MCU entropy
    layout is fully exercised."""
    from tagtree_spark.operators.jpeg import encode_jpeg_color

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                b, _a, blk = _checker_blocks(t.encode("utf-8"), JPEG420_MAX_BYTES)
                yb = np.tile(blk, (1, 2, 2)).reshape(-1, 16)  # 2x2 tile per MCU
                cb = np.repeat(255 - b, 256).reshape(-1, 16)
                cr = np.repeat((3 * b) % 256, 256).reshape(-1, 16)
                px = np.stack([yb, cb, cr], axis=-1).astype(np.uint8).tobytes()
                payloads.append(
                    encode_jpeg_color(16, 16 * len(b), px, subsample=True)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "image",
                    "payload": payloads,
                    "meta": [{"format": "jpeg", "sampling": "4:2:0"}] * len(payloads),
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


def decoded_jpeg420_features(media: DataFrame) -> DataFrame:
    """q297's feature pass over :func:`jpeg420_from_documents` payloads:
    per-channel exact sums plus the per-MCU Y absolute deviation (16x16
    MCUs — width 16, so one MCU per 16 rows of the Y plane)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tagtree_spark.operators.jpeg import decode_jpeg

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in JPEG_COLOR_DECODED_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, ch, comps = decode_jpeg(bytes(payload))
                if (w, ch) != (16, 3):
                    raise ValueError(f"media {mid}: expected 16-wide 3-channel")
                px = np.frombuffer(comps, np.uint8).reshape(-1, 3).astype(np.int64)
                yb = px[:, 0].reshape(-1, 256)  # one 16x16 MCU per row
                bsum = yb.sum(axis=1, keepdims=True)
                dev = np.abs(256 * yb - bsum).sum() // 256
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixel_bytes"].append(len(comps))
                out["sum_y"].append(int(px[:, 0].sum()))
                out["sum_cb"].append(int(px[:, 1].sum()))
                out["sum_cr"].append(int(px[:, 2].sum()))
                out["sum_abs_dev_y"].append(int(dev))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=JPEG_COLOR_DECODED_SCHEMA)


RGB_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_pixels", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def decoded_jpeg_rgb_features(media: DataFrame) -> DataFrame:
    """Decode a color JPEG and apply the FIXED-POINT YCbCr→RGB transform
    (:func:`tagtree_spark.operators.jpeg.ycc_to_rgb_fixed`) — the step
    that turns the decoder's coded components into display pixels, in
    the deterministic integer form a SQL oracle can replay exactly."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from tagtree_spark.operators.jpeg import decode_jpeg, ycc_to_rgb_fixed

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in RGB_DECODED_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _w, _h, ch, comps = decode_jpeg(bytes(payload))
                if ch != 3:
                    raise ValueError(f"media {mid}: expected 3 channels, got {ch}")
                px = np.frombuffer(comps, np.uint8).reshape(-1, 3).astype(np.int64)
                r, g, b = ycc_to_rgb_fixed(px[:, 0], px[:, 1], px[:, 2])
                out["media_id"].append(int(mid))
                out["n_pixels"].append(len(px))
                out["sum_r"].append(int(r.sum()))
                out["sum_g"].append(int(g.sum()))
                out["sum_b"].append(int(b.sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=RGB_DECODED_SCHEMA)


# --------------------------------------------------------------------------
# Real video decode: YUV4MPEG2 (Y4M) is the public UNCOMPRESSED video
# interchange format (plain-text stream header, raw planar frames behind
# FRAME markers) — the one video format parseable with the stdlib alone.
# Grayscale streams use the spec's Cmono colorspace (Y plane only).
# --------------------------------------------------------------------------


def encode_y4m(width: int, height: int, frames: list[bytes], fps: int = 25) -> bytes:
    """Minimal Y4M writer: mono (grayscale) colorspace, one Y plane of
    ``width*height`` bytes per frame."""
    for i, f in enumerate(frames):
        if len(f) != width * height:
            raise ValueError(f"frame {i}: need {width * height} bytes, got {len(f)}")
    head = f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 Cmono\n".encode("ascii")
    return head + b"".join(b"FRAME\n" + f for f in frames)


def decode_y4m(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a Y4M payload → ``(width, height, [gray frames])``. Handles
    the full stream-header tag grammar (W/H/F/I/A/C/X tags, space
    separated) and per-frame parameter tags after FRAME; rejects
    non-mono colorspaces (chroma planes need real subsampling math) and
    truncated frames loudly."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    width = height = None
    for tag in payload[9:nl].split(b" "):
        if tag[:1] == b"W":
            width = int(tag[1:])
        elif tag[:1] == b"H":
            height = int(tag[1:])
        elif tag[:1] == b"C" and tag[1:] not in (b"mono",):
            raise ValueError(f"unsupported Y4M colorspace {tag[1:].decode()!r}")
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    frame_bytes, frames, pos = width * height, [], nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = payload.find(b"\n", pos)  # frame line may carry parameter tags
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        frame = payload[fnl + 1 : fnl + 1 + frame_bytes]
        if len(frame) != frame_bytes:
            raise ValueError(f"truncated frame: {len(frame)}/{frame_bytes} bytes")
        frames.append(frame)
        pos = fnl + 1 + frame_bytes
    return width, height, frames


#: q108 raster geometry: 8x8 gray frames (64 text bytes per frame).
VID_W = VID_H = 8


def y4m_from_documents(docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL Y4M streams: the text's utf-8
    bytes as consecutive 8x8 grayscale frames, zero-padded to fill the
    last frame (padding adds 0 to any pixel sum)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fb = VID_W * VID_H
        for pdf in it:
            payloads = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                n = max(1, -(-len(raw) // fb))
                padded = raw.ljust(fb * n, b"\x00")
                payloads.append(
                    encode_y4m(VID_W, VID_H, [padded[i * fb : (i + 1) * fb] for i in range(n)])
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "modality": "video",
                    "payload": payloads,
                    "meta": [{"format": "y4m", "fps": "25"}] * len(payloads),
                }
            )

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frames", LongType()),
        StructField("frame_sum", LongType()),
    ]
)


def sampled_frame_features(media: DataFrame, every: int = 2) -> DataFrame:
    """Decode each Y4M payload and keep every ``every``-th frame (the
    frame-sampling shape a video pipeline runs after demux), with the
    exact integer pixel sum of each kept frame. 1→N row expansion inside
    the Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in VIDEO_FRAME_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _w, _h, frames = decode_y4m(bytes(payload))
                for i in range(0, len(frames), every):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["n_frames"].append(len(frames))
                    out["frame_sum"].append(int(np.frombuffer(frames[i], np.uint8).sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)


SCENE_CUT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("delta_sum", LongType()),
        StructField("is_cut", LongType()),
    ]
)


def scene_cut_stats(media: DataFrame, threshold: int = 1500) -> DataFrame:
    """Shot/scene-cut detection from DECODED video: per adjacent frame
    pair, the exact integer sum of absolute pixel deltas (the classic
    frame-difference energy), flagged as a cut when above ``threshold`` —
    the segmentation step a video training pipeline runs before sampling
    clips.

    Runs on genuinely decoded Y4M planes (:func:`decode_y4m`), row-local
    inside the Arrow batch (1→N−1 expansion, no shuffle); deltas are
    int32-widened before subtraction (uint8 arithmetic would wrap).
    → ``(media_id, frame_idx, delta_sum, is_cut)`` with ``frame_idx`` the
    LATER frame of the pair (>=1); is_cut is int (0/1) for oracle-type
    stability.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {k.name: [] for k in SCENE_CUT_SCHEMA}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _w, _h, frames = decode_y4m(bytes(payload))
                planes = [np.frombuffer(f, np.uint8).astype(np.int32) for f in frames]
                for i in range(1, len(planes)):
                    d = int(np.abs(planes[i] - planes[i - 1]).sum())
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["delta_sum"].append(d)
                    out["is_cut"].append(int(d > threshold))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=SCENE_CUT_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference hash (dHash) from DECODED pixels: parse the
    PPM, collapse RGB → integer gray (r+g+b), downsample rows into 8
    bands (band = (row·8) div height — exact integer mapping), then emit
    one bit per horizontal gradient (grid[b][c] > grid[b][c+1], 8 bands ×
    7 comparisons = 56 bits). Pure integer arithmetic end-to-end, so the
    SQL oracle reproduces the hash bit-for-bit from the source bytes.

    The standard image near-dup key: brightness/scale shifts perturb few
    gradient bits, so hamming distance ≈ visual difference. → (media_id,
    dhash)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {"media_id": [], "dhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, rgb = decode_ppm(bytes(payload))
                px = np.frombuffer(rgb, np.uint8).astype(np.int64)
                gray = px.reshape(h, w, 3).sum(axis=2)  # (h, 8)
                band = (np.arange(h) * 8) // h
                grid = np.zeros((8, w), dtype=np.int64)
                np.add.at(grid, band, gray)
                bits = (grid[:, :-1] > grid[:, 1:]).astype(np.int64)  # (8, 7)
                shifts = (7 * np.arange(8)[:, None] + np.arange(7)[None, :])
                out["media_id"].append(int(mid))
                out["dhash"].append(int((bits << shifts).sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=DHASH_SCHEMA)


def hash_band_pairs(
    hashes: DataFrame,
    hash_col: str = "dhash",
    max_hamming: int = 6,
    n_bands: int = 4,
    bits_per_band: int = 14,
) -> DataFrame:
    """Generic banded-hamming near-dup join over a ``(doc_id, <hash>)``
    frame: bucket the fingerprint into ``n_bands`` bit bands (a pair with
    ≤ n_bands−1 differing bands collides on at least one band key),
    generate candidates per bucket (capped — the quadratic bound, same
    discipline as the SimHash path), verify with the exact popcount →
    ``(doc_a, doc_b, hamming)``. Shared by the image-dHash and
    audio-fingerprint dedup paths."""
    from tagtree_spark.operators.dedup import MAX_BUCKET, _bucket_pairs

    hashes = hashes.persist()
    bands = hashes.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(k)),
                        (
                            F.shiftright(hash_col, bits_per_band * k)
                            % (1 << bits_per_band)
                        ).cast("string"),
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("band"),
    )
    cand = _bucket_pairs(bands, "band", max_bucket=MAX_BUCKET).distinct()
    ha = hashes.select(F.col("doc_id").alias("doc_a"), F.col(hash_col).alias("h_a"))
    hb = hashes.select(F.col("doc_id").alias("doc_b"), F.col(hash_col).alias("h_b"))
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            .cast("bigint")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def dhash_near_dup_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-dup pairs over the decoded-pixel dHash — see
    :func:`hash_band_pairs` for the banded join."""
    hashes = image_dhash(media).withColumnRenamed("media_id", "doc_id")
    return hash_band_pairs(hashes, "dhash", max_hamming=max_hamming)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("afp", LongType()),
    ]
)


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """56-bit audio fingerprint from DECODED PCM16 samples: the sample
    stream is downsampled into 57 equal groups (group = (idx·57) div n —
    exact integer mapping), each group's energy is the integer Σ|sample|,
    and bit g says whether energy ROSE between consecutive groups
    (E[g+1] > E[g]) — the energy-envelope fingerprint (the time-domain
    core of Shazam-style audio hashing, minus the FFT so every bit is
    integer-exact and SQL-reproducible). Robust to uniform gain changes
    of sign-preserving scale. → (media_id, afp)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {"media_id": [], "afp": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, _nch, data = _wav_parse(bytes(payload))
                sm = np.abs(np.frombuffer(data, "<i2").astype(np.int64))
                n = sm.size
                eng = np.zeros(57, dtype=np.int64)
                if n:
                    grp = (np.arange(n) * 57) // n
                    np.add.at(eng, grp, sm)
                bits = (eng[1:] > eng[:-1]).astype(np.int64)  # 56 bits
                out["media_id"].append(int(mid))
                out["afp"].append(int((bits << np.arange(56)).sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=AUDIO_FP_SCHEMA)


def audio_near_dup_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Audio near-dup pairs over the decoded-sample energy fingerprint —
    see :func:`hash_band_pairs` for the banded join."""
    hashes = audio_fingerprint(media).withColumnRenamed("media_id", "doc_id")
    return hash_band_pairs(hashes, "afp", max_hamming=max_hamming)


VIDEO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("vfp", LongType()),
    ]
)


def video_fingerprint(media: DataFrame) -> DataFrame:
    """56-bit video fingerprint from DECODED Y4M frames: per consecutive
    frame pair, the integer absolute pixel-delta energy (the q120
    scene-cut signal); the delta sequence is downsampled into 57 equal
    groups and bit g says whether motion ROSE between consecutive groups
    — the motion-envelope fingerprint (cut pattern + action rhythm),
    invariant to uniform brightness offsets of all frames. All integer →
    SQL-reproducible. → (media_id, vfp)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out: dict[str, list] = {"media_id": [], "vfp": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _w, _h, frames = decode_y4m(bytes(payload))
                fr = np.stack(
                    [np.frombuffer(f, np.uint8).astype(np.int64) for f in frames]
                )
                # PIXEL-level delta stream (flattened) — a frame-level
                # stream (~#frames values) leaves most of the 57 groups
                # empty, and the empty-group layout depends only on the
                # frame count, collapsing fingerprints of same-length
                # videos into near-collisions.
                deltas = (
                    np.abs(fr[1:] - fr[:-1]).reshape(-1)
                    if fr.shape[0] > 1
                    else np.zeros(0, dtype=np.int64)
                )
                eng = np.zeros(57, dtype=np.int64)
                nd = deltas.size
                if nd:
                    grp = (np.arange(nd) * 57) // nd
                    np.add.at(eng, grp, deltas)
                bits = (eng[1:] > eng[:-1]).astype(np.int64)
                out["media_id"].append(int(mid))
                out["vfp"].append(int((bits << np.arange(56)).sum()))
            yield pd.DataFrame(out).astype("int64")

    return spread(media).mapInPandas(batches, schema=VIDEO_FP_SCHEMA)


def video_near_dup_pairs(media: DataFrame, max_hamming: int = 12) -> DataFrame:
    """Video near-dup pairs over the decoded-frame motion fingerprint —
    see :func:`hash_band_pairs` for the banded join."""
    hashes = video_fingerprint(media).withColumnRenamed("media_id", "doc_id")
    return hash_band_pairs(hashes, "vfp", max_hamming=max_hamming)


# --------------------------------------------------------------------------
# Codec-audit path (VERDICT r5 "next" #5): the principled REFUSAL of
# compressed codecs (decode_media's NotImplementedError) is itself
# driver-verifiable behavior — a real ingest sees a mixture of decodable,
# compressed, and corrupt payloads, and the triage verdict per payload is
# data a pipeline routes on (decode vs quarantine vs transcode queue).
# --------------------------------------------------------------------------

CODEC_MIX_CLASSES = 16  # doc_id % 16 → (modality, payload family), see below


def media_mixture_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic 12-class payload mixture keyed on ``doc_id % 12`` —
    the triage fixture for :func:`try_decode_status`:

    ======  ========  =====================================  ============
    class   modality  payload                                expected
    ======  ========  =====================================  ============
    0       audio     real RIFF/WAVE PCM16                   decoded
    1       image     real binary PPM (P6)                   decoded
    2       video     real YUV4MPEG2 stream                  decoded
    3       audio     ID3/MPEG audio magic + raw bytes       unsupported
    4       image     PROGRESSIVE JPEG (real SOF2 header)    unsupported
    5       video     MP4 ftyp box + raw bytes               unsupported
    6       image     P6 with truncated pixel data           corrupt
    7       audio     RIFF/WAVE declaring MPEG (fmt=85)      corrupt
    8       image     real COMPRESSED PNG (zlib+filters)     decoded
    9       image     PNG with a flipped chunk-CRC byte      corrupt
    10      image     real baseline grayscale JPEG           decoded
    11      image     baseline JPEG, entropy data truncated  corrupt
    12      image     real 24-bit BMP (top-down, bottom-up)  decoded
    13      image     BMP with truncated pixel array         corrupt
    14      image     real LZW-compressed GIF                decoded
    15      image     GIF, LZW stream cut mid-scan           corrupt
    ======  ========  =====================================  ============

    Decodable payloads reuse the exact builders of
    wav/ppm/y4m/png/jpeg_from_documents; 'unsupported' carries a real
    out-of-scope stream (a compressed container's magic, or a
    well-formed progressive SOF2 frame header — r10: baseline JPEG now
    DECODES, so the refusal class had to move to the JPEG process the
    decoder honestly cannot run) so decode_media's refusal branch fires;
    'corrupt' payloads match a supported magic but fail the format's own
    validation (truncation, impossible fmt tag, CRC mismatch).
    """
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        fb = VID_W * VID_H
        row_bytes = IMG_WIDTH * 3

        def wav(raw: bytes) -> bytes:
            data = (
                (np.frombuffer(raw, np.uint8).astype(np.int64) * _SAMPLE_SCALE + _SAMPLE_OFF)
                .astype("<i2")
                .tobytes()
            )
            return _wav_wrap(data, WAV_SAMPLE_RATE, 1)

        def ppm(raw: bytes) -> bytes:
            height = max(1, -(-len(raw) // row_bytes))
            return encode_ppm(IMG_WIDTH, height, raw.ljust(row_bytes * height, b"\x00"))

        def y4m(raw: bytes) -> bytes:
            n = max(1, -(-len(raw) // fb))
            padded = raw.ljust(fb * n, b"\x00")
            return encode_y4m(VID_W, VID_H, [padded[i * fb : (i + 1) * fb] for i in range(n)])

        def mpeg_wav(raw: bytes) -> bytes:
            # RIFF/WAVE container honestly declaring a non-PCM encoding
            # (fmt tag 85 = MPEG Layer 3): magic matches, validation fails
            fmt = struct.pack("<HHIIHH", 85, 1, WAV_SAMPLE_RATE, WAV_SAMPLE_RATE, 1, 16)
            body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            body += b"data" + struct.pack("<I", len(raw)) + raw
            return b"RIFF" + struct.pack("<I", len(body)) + body

        def png(raw: bytes) -> bytes:
            height = max(1, -(-len(raw) // row_bytes))
            return encode_png(
                IMG_WIDTH, height, raw.ljust(row_bytes * height, b"\x00"), 3,
                [0, 1, 2, 3, 4],
            )

        from tagtree_spark.operators.jpeg import encode_jpeg_gray

        def jpeg(raw: bytes) -> bytes:
            b, _a, blocks = _checker_blocks(raw)
            px = blocks.reshape(-1, 8)
            return encode_jpeg_gray(8, 8 * len(b), px.astype(np.uint8).tobytes())

        def progressive_jpeg(raw: bytes) -> bytes:
            # real SOI + SOF2 frame header (8-bit, 1 component, 1x1): a
            # VALID progressive opening the decoder must refuse, not a
            # garbage stream it would flag corrupt
            sof2 = struct.pack(
                ">BHHB", 8, max(1, min(len(raw), 0xFFFF)), 8, 1
            ) + bytes([1, 0x11, 0])
            return (
                b"\xff\xd8"
                + b"\xff\xc2"
                + struct.pack(">H", len(sof2) + 2)
                + sof2
                + raw
            )

        def truncated_jpeg(raw: bytes) -> bytes:
            j = jpeg(raw)
            # chop the tail of the entropy-coded data (keep < half): the
            # block loop runs out of bits mid-scan -> ValueError
            return j[: len(j) // 2]

        def bad_crc_png(raw: bytes) -> bytes:
            p = bytearray(png(raw))
            # the file's last 4 bytes ARE the IEND chunk's CRC — flip one
            # so the chunk walk's verification fails (review r9: the
            # earlier -5 hit the type field, which also errors but made
            # this fixture's label a lie)
            p[-1] ^= 0xFF
            return bytes(p)

        def _mix_gif(raw: bytes) -> bytes:
            height = max(1, -(-len(raw) // IMG_WIDTH))
            return encode_gif(
                IMG_WIDTH, height, raw.ljust(IMG_WIDTH * height, b"\x00"),
                GIF_GRAY_PALETTE,
            )

        def _mix_bmp(raw: bytes) -> bytes:
            height = max(1, -(-len(raw) // row_bytes))
            return encode_bmp(
                IMG_WIDTH,
                height,
                raw.ljust(row_bytes * height, b"\x00"),
                top_down=len(raw) % 2 == 1,
            )

        build = {
            0: ("audio", "wav", wav),
            1: ("image", "ppm", ppm),
            2: ("video", "y4m", y4m),
            3: ("audio", "mp3", lambda raw: b"ID3\x03\x00" + raw),
            4: ("image", "jpeg-progressive", progressive_jpeg),
            5: ("video", "mp4", lambda raw: b"\x00\x00\x00\x18ftypisom" + raw),
            6: ("image", "ppm", lambda raw: ppm(raw)[:-3]),  # truncated pixels
            7: ("audio", "wav", mpeg_wav),
            8: ("image", "png", png),
            9: ("image", "png", bad_crc_png),
            10: ("image", "jpeg", jpeg),
            11: ("image", "jpeg", truncated_jpeg),
            12: ("image", "bmp", lambda raw: _mix_bmp(raw)),
            13: ("image", "bmp", lambda raw: _mix_bmp(raw)[:-3]),  # truncated pixels
            14: ("image", "gif", _mix_gif),
            15: ("image", "gif", lambda raw: _mix_gif(raw)[:-4]),  # LZW cut short
        }
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "modality": [], "payload": [], "meta": []}
            for did, t in zip(pdf["doc_id"], pdf["text"]):
                modality, codec, fn = build[int(did) % CODEC_MIX_CLASSES]
                out["media_id"].append(int(did))
                out["modality"].append(modality)
                out["payload"].append(fn(t.encode("utf-8")))
                out["meta"].append({"claimed_codec": codec})
            yield pd.DataFrame(out)

    return spread(docs).select("doc_id", "text").mapInPandas(batches, schema=MEDIA_SCHEMA)


DECODE_STATUS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("status", StringType()),
    ]
)


def try_decode_status(media: DataFrame) -> DataFrame:
    """Per-payload decode triage → ``(media_id, modality, status)`` with
    status ∈ ``decoded`` (a real parse succeeded), ``unsupported_codec``
    (decode_media's principled compressed-codec refusal), ``corrupt``
    (magic matched a supported format but its own validation failed).
    Map-only Arrow pass; the refusal branch is exercised as DATA, not
    just as an exception path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "modality": [], "status": []}
            for mid, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                try:
                    decode_media(str(modality), bytes(payload))
                    status = "decoded"
                except NotImplementedError:
                    status = "unsupported_codec"
                except ValueError:
                    status = "corrupt"
                out["media_id"].append(int(mid))
                out["modality"].append(str(modality))
                out["status"].append(status)
            yield pd.DataFrame(out)

    return spread(media).mapInPandas(batches, schema=DECODE_STATUS_SCHEMA)
