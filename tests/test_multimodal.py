"""E5 multimodal plumbing: BINARY payload round-trip through Arrow-batched
mapInPandas; real WAV/PPM/Y4M byte-level codecs; compressed formats must
refuse to decode loudly."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tagtree_spark.operators.multimodal import (
    decode_media,
    extract_features,
    media_from_documents,
)


def test_decode_unsupported_formats_raise():
    """Formats with no pure-Python decoder must still raise (MP4,
    progressive JPEG); bare PNG/JPEG magic now reaches the REAL decoders
    and fails their own validation (ValueError — corrupt, not
    unsupported: the r10 JPEG decoder parses the truncated APP0)."""
    import struct

    with pytest.raises(ValueError):
        decode_media("image", b"\xff\xd8\xff\xe0\x00\x10JFIF")  # truncated APP0
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    with pytest.raises(NotImplementedError):
        decode_media(
            "image", b"\xff\xd8\xff\xc2" + struct.pack(">H", len(sof2) + 2) + sof2
        )
    with pytest.raises(NotImplementedError):
        decode_media("video", b"\x00\x00\x00\x18ftypmp42")
    with pytest.raises(ValueError):
        decode_media("image", b"\x89PNG\r\n\x1a\n")  # signature, no chunks


def test_wav_roundtrip_matches_stdlib_wave():
    """encode_wav_pcm16 bytes must be readable by the stdlib wave module,
    and decode_wav_pcm16 must invert both our writer and wave's."""
    import io
    import struct
    import wave

    from tagtree_spark.operators.multimodal import decode_wav_pcm16, encode_wav_pcm16

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    payload = encode_wav_pcm16(samples, 8000)
    with wave.open(io.BytesIO(payload)) as w:
        assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (8000, 1, 2)
        got = list(struct.unpack(f"<{w.getnframes()}h", w.readframes(w.getnframes())))
    assert got == samples
    # stdlib-written bytes decode identically through our chunk walk
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    rate, nch, got2 = decode_wav_pcm16(buf.getvalue())
    assert (rate, nch, got2) == (8000, 1, samples)
    assert decode_wav_pcm16(payload) == (8000, 1, samples)


def test_wav_decode_skips_foreign_chunks_and_rejects_corrupt():
    """The chunk walk must skip unknown chunks (LIST/INFO) including
    odd-sized ones (word alignment), and reject non-PCM16 or truncated
    payloads loudly."""
    import struct

    from tagtree_spark.operators.multimodal import decode_wav_pcm16, encode_wav_pcm16

    base = encode_wav_pcm16([5, -5, 7], 44100)
    # splice an odd-sized LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # 5 + pad
    spliced = base[:fmt_end] + foreign + base[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav_pcm16(spliced) == (44100, 1, [5, -5, 7])
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFXjunk")
    # 8-bit PCM must be rejected, not misparsed
    bad = bytearray(base)
    bits_off = 12 + 8 + 14  # bits-per-sample field inside fmt
    bad[bits_off : bits_off + 2] = struct.pack("<H", 8)
    with pytest.raises(ValueError):
        decode_wav_pcm16(bytes(bad))


def test_ppm_roundtrip_comments_and_truncation():
    from tagtree_spark.operators.multimodal import decode_ppm, encode_ppm

    rgb = bytes(range(2 * 3 * 3))
    payload = encode_ppm(3, 2, rgb)
    assert decode_ppm(payload) == (3, 2, rgb)
    # header comments are legal anywhere between tokens
    commented = b"P6\n# made by a test\n3 2\n# maxval next\n255\n" + rgb
    assert decode_ppm(commented) == (3, 2, rgb)
    with pytest.raises(ValueError):
        decode_ppm(payload[:-1])  # truncated pixels
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # PGM, not P6


def test_resize_ppm_nearest_neighbour():
    from tagtree_spark.operators.multimodal import decode_ppm, encode_ppm, resize_media

    # 2x1 image: left pixel red, right pixel blue
    src = encode_ppm(2, 1, bytes([255, 0, 0, 0, 0, 255]))
    out = resize_media("image", src, 4, 2)
    w, h, rgb = decode_ppm(out)
    assert (w, h) == (4, 2)
    pixels = [tuple(rgb[i : i + 3]) for i in range(0, len(rgb), 3)]
    assert pixels == [(255, 0, 0), (255, 0, 0), (0, 0, 255), (0, 0, 255)] * 2
    with pytest.raises(NotImplementedError):
        resize_media("audio", b"RIFF", 1, 1)


def test_media_schema(documents):
    m = media_from_documents(documents)
    assert dict(m.dtypes) == {
        "media_id": "bigint",
        "modality": "string",
        "payload": "binary",
        "meta": "map<string,string>",
    }


def test_extract_features_matches_python_md5(documents):
    docs = documents.orderBy("doc_id").limit(5).collect()
    feats = {
        r.media_id: r
        for r in extract_features(media_from_documents(documents))
        .orderBy("media_id")
        .limit(5)
        .collect()
    }
    for d in docs:
        f = feats[d.doc_id]
        assert f.n_bytes == len(d.text.encode())
        assert f.head_h60 == int(hashlib.md5(d.text.encode()[:16]).hexdigest()[:15], 16)


def test_wav_pipeline_decodes_real_payloads(documents):
    """wav_from_documents payloads are genuine RIFF/WAVE bytes; the decoded
    features must equal a driver-side Python decode of the same docs."""
    from tagtree_spark.operators.multimodal import (
        decode_wav_pcm16,
        decoded_audio_features,
        wav_from_documents,
    )

    docs = {r.doc_id: r.text for r in documents.orderBy("doc_id").limit(5).collect()}
    media = wav_from_documents(documents)
    rows = {
        r.media_id: r
        for r in decoded_audio_features(media).orderBy("media_id").limit(5).collect()
    }
    for did, text in docs.items():
        expect = [b * 257 - 32768 for b in text.encode()]
        got = rows[did]
        assert got.n_samples == len(expect)
        assert got.sum_abs == sum(abs(s) for s in expect)
        assert (got.max_s, got.min_s) == (max(expect), min(expect))
    # the payload itself is a decodable WAV container
    one = media.where(F.col("media_id") == min(docs)).first()
    rate, nch, samples = decode_wav_pcm16(bytes(one.payload))
    assert (rate, nch) == (100, 1)
    assert samples == [b * 257 - 32768 for b in docs[min(docs)].encode()]


def test_sample_frames_row_expansion(documents):
    from tagtree_spark.operators.multimodal import (
        CHUNK_CHARS,
        MAX_CHUNKS,
        sample_frames,
    )

    media = media_from_documents(documents)
    frames = sample_frames(media)
    per_doc = {r.media_id: r.n for r in frames.groupBy("media_id").agg(
        F.count("*").alias("n")).collect()}
    for d in documents.select("doc_id", "text").collect():
        # chunk domain is CHARACTERS of the decoded text payload
        expect = min(MAX_CHUNKS, (len(d.text) + CHUNK_CHARS - 1) // CHUNK_CHARS)
        assert per_doc[d.doc_id] == expect


def test_metadata_preserved(documents):
    m = media_from_documents(documents).limit(1).collect()[0]
    assert set(m.meta) == {"lang", "source"}


def test_multibyte_text_chunks_by_characters(spark):
    """The fake features must slice by CHARACTERS of the decoded payload —
    a byte slice would split multibyte characters and diverge from the
    oracle's character-indexed substr (ADVICE r2). Verified against DuckDB
    on a multibyte document."""
    import duckdb

    from tagtree_spark.functions.hashing import duck_h60
    from tagtree_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
        sample_frames,
    )

    # 2-byte chars: 150 'é' → 2 chunks of chars (100 + 50), 300 bytes
    text = "é" * 150
    docs = spark.createDataFrame(
        [(1, text, "fr", "s", len(text))], ["doc_id", "text", "lang", "source", "n_chars"]
    )
    media = media_from_documents(docs)

    feat = extract_features(media).collect()[0]
    assert feat.n_bytes == 300  # byte length (DuckDB strlen)

    frames = {r.chunk_idx: r.chunk_h60 for r in sample_frames(media).collect()}
    assert len(frames) == 2

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 1 AS doc_id, ? AS text", [text])
    d_head = con.execute(f"SELECT {duck_h60('substr(text, 1, 16)')} FROM documents").fetchone()[0]
    d_chunks = dict(
        con.execute(
            f"""SELECT i, {duck_h60("substr(text, CAST(i * 100 + 1 AS INT), 100)")}
            FROM documents, range(0, 5) t(i)
            WHERE i < least(5, CAST(ceil(length(text) / 100.0) AS BIGINT))"""
        ).fetchall()
    )
    assert feat.head_h60 == d_head
    assert frames == d_chunks


def test_audio_windows_geometry_and_overlap(spark):
    from tagtree_spark.operators.multimodal import audio_from_documents, audio_windows

    docs = spark.createDataFrame(
        [(1, "x" * 120, "en", "s", 120)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    # sr=100, win=50, hop=30 → starts 0,30,60,90 (120 chars); window 3 is
    # the 30-char tail
    rows = sorted(
        audio_windows(audio_from_documents(docs)).collect(), key=lambda r: r.win_idx
    )
    assert [r.start_unit for r in rows] == [0, 30, 60, 90]
    assert [r.n_units for r in rows] == [50, 50, 50, 30]
    # overlap: identical content ('x'*50) → identical window hashes
    assert rows[0].win_h60 == rows[1].win_h60 == rows[2].win_h60
    assert rows[3].win_h60 != rows[0].win_h60


def test_audio_windows_caps_window_count(spark):
    from tagtree_spark.operators.multimodal import (
        MAX_WINDOWS,
        audio_from_documents,
        audio_windows,
    )

    docs = spark.createDataFrame(
        [(1, "y" * 5000, "en", "s", 5000)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    assert audio_windows(audio_from_documents(docs)).count() == MAX_WINDOWS


def test_y4m_roundtrip_and_corrupt():
    from tagtree_spark.operators.multimodal import decode_y4m, encode_y4m

    frames = [bytes(range(64)), bytes(64), b"\xff" * 64]
    payload = encode_y4m(8, 8, frames)
    assert decode_y4m(payload) == (8, 8, frames)
    # frame-level parameter tags after FRAME are legal per the spec
    tagged = payload.replace(b"FRAME\n", b"FRAME Xtag\n", 1)
    assert decode_y4m(tagged) == (8, 8, frames)
    with pytest.raises(ValueError):
        decode_y4m(payload[:-1])  # truncated last frame
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W8 H8 F25:1 C420\n")  # chroma needs real codecs
    with pytest.raises(ValueError):
        decode_y4m(b"nonsense")
    # dispatch through decode_media
    assert decode_media("video", payload) == (8, 8, frames)


def test_y4m_frame_sampling_matches_python(documents):
    from tagtree_spark.operators.multimodal import (
        sampled_frame_features,
        y4m_from_documents,
    )

    docs = {r.doc_id: r.text for r in documents.orderBy("doc_id").limit(3).collect()}
    rows = [
        r
        for r in sampled_frame_features(y4m_from_documents(documents), every=2)
        .orderBy("media_id", "frame_idx")
        .collect()
        if r.media_id in docs
    ]
    for did, text in docs.items():
        raw = text.encode()
        n = max(1, -(-len(raw) // 64))
        padded = raw.ljust(64 * n, b"\x00")
        expect = [
            (i, n, sum(padded[i * 64 : (i + 1) * 64])) for i in range(0, n, 2)
        ]
        got = [
            (r.frame_idx, r.n_frames, r.frame_sum) for r in rows if r.media_id == did
        ]
        assert got == expect


def test_scene_cut_stats_exact_delta(spark):
    from tagtree_spark.operators.multimodal import encode_y4m, scene_cut_stats

    f0 = bytes([10] * 64)
    f1 = bytes([10] * 32 + [30] * 32)  # delta vs f0: 32 * 20 = 640
    f2 = bytes([0] * 64)               # delta vs f1: 32*10 + 32*30 = 1280
    payload = encode_y4m(8, 8, [f0, f1, f2])
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), {"format": "y4m"})],
        "media_id long, modality string, payload binary, meta map<string,string>",
    )
    out = {r.frame_idx: r for r in scene_cut_stats(media, threshold=1000).collect()}
    assert (out[1].delta_sum, out[1].is_cut) == (640, 0)
    assert (out[2].delta_sum, out[2].is_cut) == (1280, 1)
    assert set(out) == {1, 2}  # no pair row for the first frame


def test_image_dhash_identical_and_brightness_shift(spark):
    from tagtree_spark.operators.multimodal import (
        dhash_near_dup_pairs,
        encode_ppm,
        image_dhash,
    )

    # two identical images, one brightness-shifted copy (+10 per channel,
    # no clipping), one unrelated
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randint(30, 200, size=(16, 8, 3)).astype(np.uint8)
    shifted = (base.astype(np.int64) + 10).clip(0, 255).astype(np.uint8)
    other = rng.randint(0, 256, size=(16, 8, 3)).astype(np.uint8)
    rows = [
        (1, "image", bytearray(encode_ppm(8, 16, base.tobytes())), {}),
        (2, "image", bytearray(encode_ppm(8, 16, base.tobytes())), {}),
        (3, "image", bytearray(encode_ppm(8, 16, shifted.tobytes())), {}),
        (4, "image", bytearray(encode_ppm(8, 16, other.tobytes())), {}),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, modality string, payload binary, meta map<string,string>"
    )
    h = {r.media_id: r.dhash for r in image_dhash(media).collect()}
    assert h[1] == h[2]
    # uniform brightness shift preserves every gradient comparison exactly
    assert h[1] == h[3]
    assert h[1] != h[4]
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dhash_near_dup_pairs(media).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(2, 3)] == 0


def test_audio_fingerprint_gain_invariant_and_pairs(spark):
    from tagtree_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_dup_pairs,
        encode_wav_pcm16,
    )

    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randint(-8000, 8000, size=300).tolist()
    doubled = [2 * x for x in base]          # uniform gain: same envelope bits
    other = rng.randint(-8000, 8000, size=300).tolist()
    rows = [
        (1, "audio", bytearray(encode_wav_pcm16(base, 100)), {}),
        (2, "audio", bytearray(encode_wav_pcm16(base, 100)), {}),
        (3, "audio", bytearray(encode_wav_pcm16(doubled, 100)), {}),
        (4, "audio", bytearray(encode_wav_pcm16(other, 100)), {}),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, modality string, payload binary, meta map<string,string>"
    )
    h = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    assert h[1] == h[2] == h[3]  # identical + positive uniform gain
    assert h[1] != h[4]
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in audio_near_dup_pairs(media).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0


def test_video_fingerprint_identity_and_difference(spark):
    from tagtree_spark.operators.multimodal import (
        encode_y4m,
        video_fingerprint,
        video_near_dup_pairs,
    )

    import numpy as np

    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, 64).astype(np.uint8).tobytes() for _ in range(6)]
    other = [rng.randint(0, 256, 64).astype(np.uint8).tobytes() for _ in range(6)]
    rows = [
        (1, "video", bytearray(encode_y4m(8, 8, frames)), {}),
        (2, "video", bytearray(encode_y4m(8, 8, frames)), {}),
        (3, "video", bytearray(encode_y4m(8, 8, other)), {}),
    ]
    media = spark.createDataFrame(
        rows, "media_id bigint, modality string, payload binary, meta map<string,string>"
    )
    h = {r.media_id: r.vfp for r in video_fingerprint(media).collect()}
    assert h[1] == h[2] and h[1] != h[3]
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in video_near_dup_pairs(media).collect()}
    assert pairs[(1, 2)] == 0


def test_codec_triage_mixture(spark):
    """All 16 mixture classes produce the right triage verdict, including
    the out-of-scope refusal branch (MP3/MP4/progressive-JPEG), both
    r10 JPEG classes (real baseline decode, truncated-scan corrupt), the
    BMP pair and the LZW-GIF pair (real decode, truncated stream)."""
    from tagtree_spark.operators.multimodal import (
        CODEC_MIX_CLASSES,
        media_mixture_from_documents,
        try_decode_status,
    )

    assert CODEC_MIX_CLASSES == 16
    docs = spark.createDataFrame(
        [(i, f"payload text {i} " * 3) for i in range(32)],
        "doc_id long, text string",
    )
    media = media_mixture_from_documents(docs)
    got = {r.media_id: (r.modality, r.status) for r in try_decode_status(media).collect()}
    expect_mod = {0: "audio", 1: "image", 2: "video", 3: "audio",
                  4: "image", 5: "video", 6: "image", 7: "audio",
                  8: "image", 9: "image", 10: "image", 11: "image",
                  12: "image", 13: "image", 14: "image", 15: "image"}
    expect_st = {0: "decoded", 1: "decoded", 2: "decoded",
                 3: "unsupported_codec", 4: "unsupported_codec",
                 5: "unsupported_codec", 6: "corrupt", 7: "corrupt",
                 8: "decoded", 9: "corrupt", 10: "decoded", 11: "corrupt",
                 12: "decoded", 13: "corrupt",
                 14: "decoded", 15: "corrupt"}
    assert len(got) == 32
    for mid, (mod, st) in got.items():
        assert mod == expect_mod[mid % 16], mid
        assert st == expect_st[mid % 16], mid


def test_png_roundtrip_all_filters_and_rgba():
    """encode∘decode inverts for RGB and RGBA across all five scanline
    filter types, individually and cycled — the decoder genuinely
    unfilters (a stored-only decoder would fail every non-zero type)."""
    import random

    from tagtree_spark.operators.multimodal import decode_png, encode_png

    rng = random.Random(53)
    for w, h, ch in [(1, 1, 3), (8, 5, 3), (3, 7, 4), (16, 9, 4), (5, 1, 3)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 2]):
            payload = encode_png(w, h, px, ch, filters)
            assert decode_png(payload) == (w, h, ch, px), (w, h, ch, filters)


def test_png_validation_and_refusal_boundaries():
    """Corruption → ValueError (CRC flip, truncation, inflate garbage);
    valid-but-out-of-scope shapes (interlaced, 16-bit, palette) →
    NotImplementedError — the triage statuses depend on this split."""
    import struct
    import zlib

    from tagtree_spark.operators.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    good = encode_png(4, 3, bytes(range(36)), 3, [1, 3])
    # flip one CRC byte anywhere → chunk walk must catch it
    bad = bytearray(good)
    bad[-5] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[:-8])  # truncated
    # interlaced / 16-bit / palette IHDRs: well-formed, out of scope
    for depth, color, interlace in ((8, 2, 1), (16, 2, 0), (8, 3, 0)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        p = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            decode_png(p)
    # wrong inflated size
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    p = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflated size"):
        decode_png(p)


def test_png_resize_and_media_dispatch():
    from tagtree_spark.operators.multimodal import (
        decode_media,
        decode_png,
        encode_png,
        resize_media,
    )

    px = bytes((x * 7 + y * 3) % 256 for y in range(6) for x in range(6 * 3))
    payload = encode_png(6, 6, px, 3, [2, 4])
    assert decode_media("image", payload) == (6, 6, 3, px)
    small = resize_media("image", payload, 3, 3)
    w, h, ch, out = decode_png(small)
    assert (w, h, ch) == (3, 3, 3)
    # nearest-neighbour: pixel (0,0) survives
    assert out[:3] == px[:3]


def test_png_features_match_ppm_features(spark):
    """The PNG pipeline recovers the SAME features as the PPM pipeline on
    the same documents — compression is lossless end-to-end through the
    Spark plumbing."""
    from tagtree_spark.operators.multimodal import (
        decoded_image_features,
        png_from_documents,
        ppm_from_documents,
    )

    docs = spark.createDataFrame(
        [(i, f"döcument {i} payload " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    a = {tuple(r) for r in decoded_image_features(png_from_documents(docs)).collect()}
    b = {tuple(r) for r in decoded_image_features(ppm_from_documents(docs)).collect()}
    assert a == b and len(a) == 6


# ---------------------------------------------------------------------------
# Baseline JPEG codec (r10): the last compressed-codec refusal retired.
# ---------------------------------------------------------------------------


def test_jpeg_golden_bytes_pin():
    """Byte-level pin of the writer: a constant 8x8 block must produce
    the exact framing (SOI, APP0/JFIF, DQT, SOF0, DHT, SOS, EOI) and the
    exact entropy bits — any change to tables, marker order, or bit
    packing shows up here first."""
    from tagtree_spark.operators.jpeg import encode_jpeg_gray

    j = encode_jpeg_gray(8, 8, bytes([128] * 64))
    assert j[:2] == b"\xff\xd8" and j[-2:] == b"\xff\xd9"
    assert j[2:4] == b"\xff\xe0" and j[6:11] == b"JFIF\x00"
    assert hashlib.md5(j).hexdigest() == "633279f10bb244ad74db8b5d4ff9a7f2"


def test_jpeg_lossless_regime_exact():
    """Constant blocks and DC+checkerboard blocks (the q289 fixture
    shape) round-trip BIT-EXACTLY with the all-ones quant table — both
    DCT coefficients are integers, so nothing rounds."""
    import math

    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    s = [1 if math.cos((2 * x + 1) * math.pi / 4) > 0 else -1 for x in range(8)]
    for b, a in [(0, 0), (255, 0), (128, 0), (100, 3), (7, 3), (251, 0), (4, 0)]:
        blk = bytes(b + a * s[y] * s[x] for y in range(8) for x in range(8))
        w, h, ch, out = decode_jpeg(encode_jpeg_gray(8, 8, blk))
        assert (w, h, ch) == (8, 8, 1) and out == blk, (b, a)
    # many stacked blocks (DC differential coding across blocks)
    blocks = b"".join(
        bytes(b + (b % 4 if 4 <= b <= 251 else 0) * s[y] * s[x] for y in range(8) for x in range(8))
        for b in range(0, 256, 7)
    )
    n = len(blocks) // 64
    w, h, ch, out = decode_jpeg(encode_jpeg_gray(8, 8 * n, blocks))
    assert out == blocks


def test_jpeg_general_roundtrip_bounded_error():
    """Arbitrary pixels with quant=1: the only loss is FDCT coefficient
    rounding, so the round-trip error is bounded by 1 gray level — across
    odd dimensions (MCU padding+crop) and restart intervals."""
    import random

    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    rng = random.Random(53)
    for w0, h0 in [(1, 1), (8, 8), (19, 13), (5, 24), (64, 48)]:
        px = bytes(rng.randrange(256) for _ in range(w0 * h0))
        for ri in (0, 1, 3):
            w, h, ch, out = decode_jpeg(encode_jpeg_gray(w0, h0, px, restart_interval=ri))
            assert (w, h, ch) == (w0, h0, 1)
            assert max(abs(a - b) for a, b in zip(out, px)) <= 1, (w0, h0, ri)


def test_jpeg_lossy_quant_decodes():
    """A real quality quant table (lossy) still decodes to the right
    geometry, deterministically."""
    import random

    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    q = [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
         14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
         18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
         49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
    rng = random.Random(7)
    px = bytes(rng.randrange(256) for _ in range(24 * 16))
    j = encode_jpeg_gray(24, 16, px, quant=q)
    one = decode_jpeg(j)
    assert one == decode_jpeg(j)
    assert one[:3] == (24, 16, 1) and len(one[3]) == 24 * 16


def test_jpeg_corruption_raises():
    """Truncation anywhere (header, tables, entropy data, lost EOI) and
    out-of-sequence restart markers are ValueError — corrupt, never a
    silent partial decode."""
    import random

    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    rng = random.Random(11)
    px = bytes(rng.randrange(256) for _ in range(48 * 40))
    j = encode_jpeg_gray(48, 40, px)
    for cut in (2, 6, 25, 120, len(j) // 2, len(j) - 20, len(j) - 3, len(j) - 1):
        with pytest.raises(ValueError):
            decode_jpeg(j[:cut])
    with pytest.raises(ValueError):
        decode_jpeg(b"notajpeg")
    # swap two restart markers -> sequence check fires
    jr = bytearray(encode_jpeg_gray(48, 40, px, restart_interval=3))
    idx = [i for i in range(len(jr) - 1) if jr[i] == 0xFF and 0xD0 <= jr[i + 1] <= 0xD7]
    assert len(idx) >= 2
    jr[idx[0] + 1], jr[idx[1] + 1] = jr[idx[1] + 1], jr[idx[0] + 1]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(jr))


def test_jpeg_out_of_scope_raises_not_implemented():
    """Valid-but-out-of-scope processes refuse with NotImplementedError
    (the triage 'unsupported_codec' class): progressive SOF2, 16-bit
    quant tables, multi-component color, subsampled components."""
    import struct

    from tagtree_spark.operators.jpeg import decode_jpeg

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(b"\xff\xd8" + seg(0xC2, sof2))
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(b"\xff\xd8" + seg(0xDB, bytes([0x10]) + bytes(128)))
    sof_cmyk = struct.pack(">BHHB", 8, 8, 8, 4) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]
    )
    with pytest.raises(NotImplementedError, match="4-component"):
        decode_jpeg(b"\xff\xd8" + seg(0xC0, sof_cmyk))
    sof_422 = struct.pack(">BHHB", 8, 8, 8, 3) + bytes(
        [1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0]  # 4:2:2 — not 4:4:4 / 4:2:0
    )
    with pytest.raises(NotImplementedError, match="sampling"):
        decode_jpeg(b"\xff\xd8" + seg(0xC0, sof_422))
    sof_sub = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x22, 0])
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg(b"\xff\xd8" + seg(0xC0, sof_sub))


def test_jpeg_resize_and_media_dispatch():
    """decode_media dispatches SOI-magic payloads to the real decoder;
    resize_media does decode -> nearest-neighbour -> re-encode."""
    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray
    from tagtree_spark.operators.multimodal import decode_media, resize_media

    px = bytes((x * 31 + y * 7) % 256 for y in range(16) for x in range(16))
    payload = encode_jpeg_gray(16, 16, px)
    w, h, ch, out = decode_media("image", payload)
    assert (w, h, ch) == (16, 16, 1)
    small = resize_media("image", payload, 8, 8)
    w2, h2, ch2, out2 = decode_jpeg(small)
    assert (w2, h2, ch2) == (8, 8, 1) and len(out2) == 64


def test_jpeg_fixture_features(spark):
    """jpeg_from_documents -> decoded_jpeg_features computes the exact
    per-doc sums the q289 oracle derives from the raw text bytes —
    including sum_abs_dev, which is zero unless the AC path decoded."""
    from tagtree_spark.operators.multimodal import (
        decoded_jpeg_features,
        jpeg_from_documents,
    )

    texts = ["abc", "", "z" * 100, "Hello, World!"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    feats = {
        r.media_id: r
        for r in decoded_jpeg_features(jpeg_from_documents(docs)).collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode() or b"\x00"
        r = feats[i]
        assert r.width == 8 and r.height == 8 * len(raw)
        assert r.sum_pixels == 64 * sum(raw)
        assert r.sum_abs_dev == 64 * sum(
            (b % 4 if 4 <= b <= 251 else 0) for b in raw
        )
        assert ("z" not in t) or r.sum_abs_dev > 0  # 'z'=122 -> a=2: AC proven


def test_jpeg_color_roundtrips():
    """4:4:4: any input round-trips within 1 gray level per component;
    4:2:0: Y within 1 everywhere, chroma exact when constant per 2x2
    (the box average is then the identity)."""
    import random

    import numpy as np

    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_color

    rng = random.Random(31)
    for w0, h0 in [(8, 8), (19, 13), (32, 24)]:
        px = bytes(rng.randrange(256) for _ in range(w0 * h0 * 3))
        for ri in (0, 2):
            w, h, ch, out = decode_jpeg(encode_jpeg_color(w0, h0, px, restart_interval=ri))
            assert (w, h, ch) == (w0, h0, 3)
            assert max(abs(a - b) for a, b in zip(out, px)) <= 1, (w0, h0, ri)
    nprng = np.random.default_rng(5)
    for w0, h0 in [(16, 16), (19, 13)]:
        y = nprng.integers(0, 256, (h0, w0), dtype=np.uint8)
        cb = np.repeat(np.repeat(
            nprng.integers(0, 256, ((h0 + 1) // 2, (w0 + 1) // 2), dtype=np.uint8), 2, 0), 2, 1)[:h0, :w0]
        cr = np.repeat(np.repeat(
            nprng.integers(0, 256, ((h0 + 1) // 2, (w0 + 1) // 2), dtype=np.uint8), 2, 0), 2, 1)[:h0, :w0]
        src = np.stack([y, cb, cr], axis=-1)
        w, h, ch, out = decode_jpeg(encode_jpeg_color(w0, h0, src.tobytes(), subsample=True))
        got = np.frombuffer(out, np.uint8).reshape(h0, w0, 3).astype(int)
        assert np.abs(got - src.astype(int)).max() <= 1


def test_jpeg_color_lossless_regime_exact():
    """The q291 fixture regime (Y checkerboard + constant chroma) is
    bit-exact through the interleaved 4:4:4 path."""
    import math

    import numpy as np

    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_color

    s = np.array(
        [1 if math.cos((2 * x + 1) * math.pi / 4) > 0 else -1 for x in range(8)],
        np.int64,
    )
    checker = np.outer(s, s)
    b = np.array(list(range(0, 256, 5)), np.int64)
    a = np.where((b >= 4) & (b <= 251), b % 4, 0)
    yb = (b[:, None, None] + a[:, None, None] * checker).reshape(-1, 8)
    cb = np.repeat(255 - b, 64).reshape(-1, 8)
    cr = np.repeat((3 * b) % 256, 64).reshape(-1, 8)
    px = np.stack([yb, cb, cr], axis=-1).astype(np.uint8).tobytes()
    w, h, ch, out = decode_jpeg(encode_jpeg_color(8, 8 * len(b), px))
    assert (w, h, ch) == (8, 8 * len(b), 3) and out == px


def test_jpeg_color_fixture_features(spark):
    """jpeg_color_from_documents -> decoded_jpeg_color_features computes
    the exact per-channel sums the q291 oracle derives from text bytes."""
    from tagtree_spark.operators.multimodal import (
        decoded_jpeg_color_features,
        jpeg_color_from_documents,
    )

    texts = ["abc", "", "Mixed Case 123!"]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    feats = {
        r.media_id: r
        for r in decoded_jpeg_color_features(jpeg_color_from_documents(docs)).collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode() or b"\x00"
        r = feats[i]
        assert (r.width, r.height, r.n_pixel_bytes) == (8, 8 * len(raw), 192 * len(raw))
        assert r.sum_y == 64 * sum(raw)
        assert r.sum_cb == 64 * sum(255 - b for b in raw)
        assert r.sum_cr == 64 * sum((3 * b) % 256 for b in raw)
        assert r.sum_abs_dev_y == 64 * sum(
            (b % 4 if 4 <= b <= 251 else 0) for b in raw
        )


def test_jpeg420_fixture_exact_and_rgb_transform(spark):
    """The 4:2:0 fixture (2x2-tiled Y checkerboard + constant chroma)
    decodes to exact per-channel sums through the subsampling pair, and
    the fixed-point RGB transform matches a per-pixel Python replay."""
    import numpy as np

    from tagtree_spark.operators.jpeg import ycc_to_rgb_fixed
    from tagtree_spark.operators.multimodal import (
        decoded_jpeg420_features,
        decoded_jpeg_rgb_features,
        jpeg420_from_documents,
        jpeg_color_from_documents,
    )

    texts = ["abz", "Q" * 40]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    f420 = {
        r.media_id: r
        for r in decoded_jpeg420_features(jpeg420_from_documents(docs)).collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode()
        r = f420[i]
        assert (r.width, r.height) == (16, 16 * len(raw))
        assert r.sum_y == 256 * sum(raw)
        assert r.sum_cb == 256 * sum(255 - b for b in raw)
        assert r.sum_cr == 256 * sum((3 * b) % 256 for b in raw)
        assert r.sum_abs_dev_y == 256 * sum(
            (b % 4 if 4 <= b <= 251 else 0) for b in raw
        )
    rgb = {
        r.media_id: r
        for r in decoded_jpeg_rgb_features(jpeg_color_from_documents(docs)).collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode()
        b = np.frombuffer(raw, np.uint8).astype(np.int64)
        a = np.where((b >= 4) & (b <= 251), b % 4, 0)
        sr = sg = sb = 0
        for yv, w in [(b + a, 32), (b - a, 32)]:
            rr, gg, bb = ycc_to_rgb_fixed(yv, 255 - b, (3 * b) % 256)
            sr += w * rr.sum(); sg += w * gg.sum(); sb += w * bb.sum()
        got = rgb[i]
        assert got.n_pixels == 64 * len(raw)
        assert (got.sum_r, got.sum_g, got.sum_b) == (int(sr), int(sg), int(sb))


def test_jpeg_sos_component_mismatch_raises():
    """A scan whose SOS component selectors don't match the SOF order
    must fail loudly, not silently swap planes/tables (review r10)."""
    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_color

    j = bytearray(encode_jpeg_color(8, 8, bytes(range(192))))
    # SOS layout: FF DA len Ns (Cs Td/Ta)*3 ... — swap Cs1 and Cs2
    i = j.find(b"\xff\xda")
    assert i > 0
    cs1, cs2 = i + 5, i + 7
    assert j[cs1] == 1 and j[cs2] == 2
    j[cs1], j[cs2] = j[cs2], j[cs1]
    import pytest

    with pytest.raises(ValueError, match="component selector"):
        decode_jpeg(bytes(j))


def test_jpeg_fixture_truncates_long_docs(spark):
    """Documents beyond the 16-bit SOF dimension cap must DEGRADE
    deterministically (truncate to JPEG_MAX_BYTES) instead of crashing
    the encode inside mapInPandas (review r10)."""
    from tagtree_spark.operators.multimodal import (
        JPEG_MAX_BYTES,
        decoded_jpeg_features,
        jpeg_from_documents,
    )

    long_text = "a" * (JPEG_MAX_BYTES + 500)
    docs = spark.createDataFrame([(1, long_text)], "doc_id long, text string")
    r = decoded_jpeg_features(jpeg_from_documents(docs)).collect()[0]
    assert r.height == 8 * JPEG_MAX_BYTES
    assert r.sum_pixels == 64 * ord("a") * JPEG_MAX_BYTES


def test_decode_oracles_keep_empty_docs(spark):
    """A zero-length text must yield the SAME zero row from both
    engines: the fixture encoders emit a 1-row zero raster (sum=0,
    possum=0) while the pre-r11 oracles INNER JOINed documents to a
    per-character aggregate, which has no row for an empty text — the
    doc silently dropped from the oracle only (ADVICE r10). Pins the
    LEFT JOIN + coalesce form of q107/q253/q307/q308 on the corpus
    shape the generator never produces."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from tagtree_spark.operators.multimodal import (
        bmp_from_documents,
        decoded_bmp_features,
        decoded_gif_features,
        decoded_image_features,
        gif_from_documents,
        png_from_documents,
        ppm_from_documents,
    )

    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["", "hello world"]})
    docs = spark.createDataFrame(pdf)
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    con.register("documents", pdf)
    pairs = [
        ("q107_ppm_decode", decoded_image_features(ppm_from_documents(docs))),
        ("q253_png_decode", decoded_image_features(png_from_documents(docs))),
        ("q307_bmp_decode", decoded_bmp_features(bmp_from_documents(docs))),
        ("q308_gif_decode", decoded_gif_features(gif_from_documents(docs))),
    ]
    for qname, sdf in pairs:
        got = {tuple(r) for r in sdf.collect()}
        want = {tuple(r) for r in con.execute(oracles[qname]).fetchall()}
        assert got == want, qname
        assert len(got) == 2, qname  # the empty doc is present
