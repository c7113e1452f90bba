"""Property tests for the pure-Python media codecs (hypothesis): encode∘
decode must be identity for every valid input, and decode must never
accept a payload whose geometry lies about its data."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tagtree_spark.operators.multimodal import (
    decode_ppm,
    decode_wav_pcm16,
    decode_y4m,
    encode_ppm,
    encode_wav_pcm16,
    encode_y4m,
)

_int16 = st.integers(min_value=-32768, max_value=32767)


@settings(max_examples=200, deadline=None)
@given(
    samples=st.lists(_int16, max_size=300),
    rate=st.integers(min_value=1, max_value=384_000),
)
def test_wav_roundtrip_property(samples, rate):
    assert decode_wav_pcm16(encode_wav_pcm16(samples, rate)) == (rate, 1, samples)


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    data=st.data(),
)
def test_ppm_roundtrip_property(w, h, data):
    rgb = data.draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3), label="rgb"
    )
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=8),
    n_frames=st.integers(min_value=0, max_value=5),
    data=st.data(),
)
def test_y4m_roundtrip_property(w, h, n_frames, data):
    frames = [
        data.draw(st.binary(min_size=w * h, max_size=w * h), label=f"f{i}")
        for i in range(n_frames)
    ]
    assert decode_y4m(encode_y4m(w, h, frames)) == (w, h, frames)


@settings(max_examples=100, deadline=None)
@given(samples=st.lists(_int16, min_size=1, max_size=50))
def test_wav_truncation_always_detected_or_shorter(samples):
    """Chopping bytes off the data chunk must never yield MORE samples,
    and chopping an odd number of bytes drops the partial sample."""
    payload = encode_wav_pcm16(samples, 8000)
    for cut in (1, 2, 3):
        if len(payload) - cut < 46:  # below the minimal container
            continue
        _r, _c, got = decode_wav_pcm16(payload[:-cut])
        assert len(got) <= len(samples)
        assert got == samples[: len(got)]


@settings(max_examples=150, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    channels=st.sampled_from([3, 4]),
    filters=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=6),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, channels, filters, data):
    """encode∘decode identity for every geometry × channel count × filter
    schedule — the five unfilter predictors are each hit by random
    schedules, and the inflated-size check must reject any truncation."""
    from tagtree_spark.operators.multimodal import decode_png, encode_png

    px = data.draw(
        st.binary(min_size=w * h * channels, max_size=w * h * channels), label="px"
    )
    payload = encode_png(w, h, px, channels, filters)
    assert decode_png(payload) == (w, h, channels, px)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    ri=st.integers(min_value=0, max_value=4),
    data=st.data(),
)
def test_jpeg_roundtrip_error_bound_property(w, h, ri, data):
    """Baseline JPEG with the all-ones quant table: the only loss is
    FDCT coefficient rounding, so |decode(encode(p)) - p| <= 1 per pixel
    for EVERY input, any dimensions (MCU pad+crop), any restart
    interval."""
    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    px = data.draw(st.binary(min_size=w * h, max_size=w * h), label="px")
    w2, h2, ch, out = decode_jpeg(encode_jpeg_gray(w, h, px, restart_interval=ri))
    assert (w2, h2, ch) == (w, h, 1)
    assert max((abs(a - b) for a, b in zip(out, px)), default=0) <= 1


@settings(max_examples=100, deadline=None)
@given(
    blocks=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=32,
    )
)
def test_jpeg_lossless_regime_property(blocks):
    """The q289 fixture regime is exactly lossless for every (b, a) with
    b±a inside [0,255]: DC level b plus (4,4)-checkerboard amplitude a."""
    import math

    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    s = [1 if math.cos((2 * x + 1) * math.pi / 4) > 0 else -1 for x in range(8)]
    px = b"".join(
        bytes(
            b + (a if a <= b <= 255 - a else 0) * s[y] * s[x]
            for y in range(8)
            for x in range(8)
        )
        for b, a in blocks
    )
    w, h, ch, out = decode_jpeg(encode_jpeg_gray(8, 8 * len(blocks), px))
    assert out == px


@settings(max_examples=100, deadline=None)
@given(data=st.data())
def test_jpeg_truncation_always_detected(data):
    """Any prefix of a valid JPEG must raise ValueError or
    NotImplementedError — never return pixels from a truncated stream."""
    import random

    import pytest

    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    px = bytes(random.Random(3).randrange(256) for _ in range(16 * 16))
    j = encode_jpeg_gray(16, 16, px)
    cut = data.draw(st.integers(min_value=0, max_value=len(j) - 1), label="cut")
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(j[:cut])


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    ri=st.integers(min_value=0, max_value=3),
    data=st.data(),
)
def test_jpeg_color_444_roundtrip_property(w, h, ri, data):
    """4:4:4 color with the all-ones quant table: every component of
    every pixel round-trips within 2 — the interleaved-MCU twin of the
    grayscale property. The color bound is 2, not grayscale's 1: the
    path stacks THREE roundings (RGB→YCbCr integer rounding, the DCT
    round-trip's ±1, YCbCr→RGB rounding) and adversarial inputs
    legitimately compose two of them the same way (r12: hypothesis
    found px=...0014 0000 1200 at 2x2 reaching exactly 2; pinned
    below)."""
    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_color

    px = data.draw(st.binary(min_size=w * h * 3, max_size=w * h * 3), label="px")
    w2, h2, ch, out = decode_jpeg(encode_jpeg_color(w, h, px, restart_interval=ri))
    assert (w2, h2, ch) == (w, h, 3)
    assert max((abs(a - b) for a, b in zip(out, px)), default=0) <= 2


def test_jpeg_color_444_adversarial_rounding_regression():
    """The exact 2x2 input hypothesis found in r12 whose component error
    reaches 2 (two stacked roundings), plus the assertion that it never
    exceeds it."""
    from tagtree_spark.operators.jpeg import decode_jpeg, encode_jpeg_color

    px = b"\x00\x00\x00\x00\x00\x00\x00\x14\x00\x00\x12\x00"
    _, _, _, out = decode_jpeg(encode_jpeg_color(2, 2, px, restart_interval=0))
    err = max(abs(a - b) for a, b in zip(out, px))
    assert err == 2


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    top_down=st.booleans(),
    data=st.data(),
)
def test_bmp_roundtrip_property(w, h, top_down, data):
    """Both storage orders round-trip to the SAME top-down RGB raster —
    widths cover every stride-padding residue (w*3 mod 4)."""
    from tagtree_spark.operators.multimodal import decode_bmp, encode_bmp

    rgb = data.draw(st.binary(min_size=w * h * 3, max_size=w * h * 3), label="rgb")
    assert decode_bmp(encode_bmp(w, h, rgb, top_down=top_down)) == (w, h, rgb)


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=48, max_size=96))
def test_bmp_corruption_always_detected(data):
    """Truncating the pixel array, breaking the magic, or declaring an
    undecodable depth must raise — never return wrong pixels."""
    import struct

    import pytest

    from tagtree_spark.operators.multimodal import decode_bmp, encode_bmp

    w, h = 4, max(1, len(data) // 12)
    rgb = data[: w * h * 3].ljust(w * h * 3, b"\x00")
    good = encode_bmp(w, h, rgb)
    with pytest.raises(ValueError):
        decode_bmp(good[:-1])
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + good[2:])
    bad_depth = bytearray(good)
    bad_depth[28:30] = struct.pack("<H", 8)  # 8bpp palette form
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad_depth))


@settings(max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=3000))
def test_gif_lzw_roundtrip_property(data):
    """LZW encode∘decode is identity across repetitive and random
    content — inputs large enough to grow the code width past 9 bits."""
    from tagtree_spark.operators.multimodal import _lzw_decode, _lzw_encode

    assert _lzw_decode(_lzw_encode(data), 8) == data
    rep = (data or b"x") * 4
    assert _lzw_decode(_lzw_encode(rep), 8) == rep


def test_gif_lzw_byte_aligned_eoi_after_width_bump():
    """The decoder widens ONE insert early, but the encoder makes no
    insert before EOI — so when the decoder's post-insert next_code
    lands exactly on 2^width−1 after the FINAL data code, the encoder
    wrote EOI at the old width. 254 distinct-literal codes at
    min_code_size=8 hit that boundary with EOI ending exactly on a byte
    (288 bytes, zero padding bits): the pre-fix decoder raised
    'LZW stream truncated before EOI' when expected=None."""
    from tagtree_spark.operators.multimodal import _lzw_decode, _lzw_encode

    data = bytes(range(254))
    enc = _lzw_encode(data, 8)
    assert len(enc) == 288  # the byte-aligned-EOI shape this test pins
    assert _lzw_decode(enc, 8) == data  # no `expected` rescue available


def test_gif_lzw_dictionary_overflow_clear():
    """A stream with >4096 dictionary inserts crosses the 12-bit cap:
    the encoder must emit CLEAR and both sides must resynchronize."""
    import random

    from tagtree_spark.operators.multimodal import _lzw_decode, _lzw_encode

    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(30000))
    assert _lzw_decode(_lzw_encode(data), 8) == data


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_gif_container_roundtrip_property(w, h, data):
    from tagtree_spark.operators.multimodal import (
        GIF_GRAY_PALETTE,
        decode_gif,
        encode_gif,
    )

    idx = data.draw(st.binary(min_size=w * h, max_size=w * h), label="idx")
    want = bytes(v for i in idx for v in (i, i, i))
    assert decode_gif(encode_gif(w, h, idx, GIF_GRAY_PALETTE)) == (w, h, want)


def test_gif_validation_boundaries():
    """Truncation anywhere → ValueError; interlace flag → the honest
    NotImplementedError refusal; a canonical EXTERNAL 1x1 GIF89a (with
    a graphic-control extension and no explicit EOI) decodes."""
    import base64

    import pytest

    from tagtree_spark.operators.multimodal import (
        GIF_GRAY_PALETTE,
        decode_gif,
        encode_gif,
    )

    good = encode_gif(4, 3, bytes(range(12)), GIF_GRAY_PALETTE)
    with pytest.raises(ValueError):
        decode_gif(good[:-4])
    with pytest.raises(ValueError):
        decode_gif(b"GIF90a" + good[6:])
    interlaced = bytearray(good)
    # image descriptor starts after 6+7+768 bytes: intro + 8 = packed
    ipk = 6 + 7 + 768 + 9
    interlaced[ipk] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(interlaced))
    ext = base64.b64decode("R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    assert decode_gif(ext) == (1, 1, b"\x00\x00\x00")
