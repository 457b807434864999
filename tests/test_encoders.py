"""spiderspark.encoders — the engine-side forward encoders that make the
real decoder tier driver-checkable. Each encoder must be the exact
spec-inverse of the corresponding from-scratch decoder on ARBITRARY
content (not just the driver fixture's checkerboards), and the padding
machinery must hit requested byte lengths exactly while staying
spec-skippable."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from spiderspark.encoders import (
    encode_bmp,
    encode_gif,
    encode_jpeg_const_gray,
    encode_png,
    gif_lzw_encode,
)
from spiderspark.multimodal import (
    _gif_lzw_decode,
    decode_image_real,
    image_header_meta,
    synthetic_real_media_df,
)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    mode=st.sampled_from(["gray", "rgb", "palette"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_encoder_is_decoder_inverse(h, w, mode, seed):
    rng = np.random.default_rng(seed)
    if mode == "gray":
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        blob, want, ch = encode_png(px, pad_to=4096), px[:, :, None], 1
    elif mode == "rgb":
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob, want, ch = encode_png(px, pad_to=4096), px, 3
    else:
        pal = rng.integers(0, 256, (int(rng.integers(1, 9)), 3), dtype=np.uint8)
        idx = rng.integers(0, len(pal), (h, w)).astype(np.uint8)
        blob, want, ch = encode_png(idx, palette=pal, pad_to=4096), pal[idx], 3
    assert len(blob) == 4096
    W, H, C, out, ok = decode_image_real(blob)
    assert ok and (W, H, C) == (w, h, ch)
    np.testing.assert_array_equal(out, want)
    assert image_header_meta(blob) == (w, h, ch, True)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_pal=st.integers(2, 16),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_encoder_is_decoder_inverse(h, w, n_pal, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_pal, 3), dtype=np.uint8)
    idx = rng.integers(0, n_pal, (h, w)).astype(np.uint8)
    blob = encode_gif(idx, pal, interlace=interlace, pad_to=4096)
    assert len(blob) == 4096
    W, H, C, out, ok = decode_image_real(blob)
    assert ok and (W, H, C) == (w, h, 3)
    np.testing.assert_array_equal(out, pal[idx])
    assert image_header_meta(blob) == (w, h, 3, True)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    n=st.integers(1, 4000),
    alphabet=st.integers(2, 16),
    mcs=st.integers(2, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_lzw_roundtrip_arbitrary_streams(n, alphabet, mcs, seed):
    """The LZW pair directly, past the image-sized cases: long streams
    cross code-width growth boundaries (and with a small alphabet + long
    input, many of them)."""
    if alphabet > (1 << mcs):
        alphabet = 1 << mcs
    rng = np.random.default_rng(seed)
    data = rng.integers(0, alphabet, n).astype(np.uint8).tobytes()
    enc = gif_lzw_encode(data, mcs)
    out = _gif_lzw_decode(enc, mcs, n)
    np.testing.assert_array_equal(out, np.frombuffer(data, np.uint8))


def test_gif_lzw_dictionary_reset_at_4096():
    """A stream long and diverse enough to fill the 4096-entry dictionary
    must still roundtrip (encoder emits Clear and resets both sides)."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 200_000).astype(np.uint8).tobytes()
    enc = gif_lzw_encode(data, 8)
    out = _gif_lzw_decode(enc, 8, len(data))
    np.testing.assert_array_equal(out, np.frombuffer(data, np.uint8))


@settings(max_examples=30, deadline=None, derandomize=True)
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
def test_bmp_encoder_is_decoder_inverse(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob = encode_bmp(px, pad_to=4096)
    assert len(blob) == 4096
    W, H, C, out, ok = decode_image_real(blob)
    assert ok and (W, H, C) == (w, h, 3)
    np.testing.assert_array_equal(out, px)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(h=st.integers(1, 30), w=st.integers(1, 30), v=st.integers(0, 255))
def test_jpeg_const_encoder_roundtrips_bit_exact(h, w, v):
    """Constant images with an all-ones quant table survive baseline JPEG
    EXACTLY — decoded pixels are v everywhere, for every v incl. the
    clamp edges and the zero-category v=128."""
    blob = encode_jpeg_const_gray(w, h, v, pad_to=2048)
    assert len(blob) == 2048
    W, H, C, out, ok = decode_image_real(blob)
    assert ok and (W, H, C) == (w, h, 1)
    assert out.min() == out.max() == v
    assert image_header_meta(blob) == (w, h, 1, True)


def test_pad_to_too_small_raises():
    px = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_png(px, pad_to=10)
    with pytest.raises(ValueError):
        encode_gif(px, np.zeros((2, 3), np.uint8), pad_to=10)
    with pytest.raises(ValueError):
        encode_bmp(np.zeros((8, 8, 3), np.uint8), pad_to=10)
    with pytest.raises(ValueError):
        encode_jpeg_const_gray(8, 8, 0, pad_to=10)


def test_synthetic_real_media_fixture_contract(spark):
    """The driver-leg fixture: every valid blob is exactly 1024 bytes of
    REAL wire format whose full decode matches the closed-form dims and
    checkerboard/constant stats the oracle states."""
    rows = {
        r["item_id"]: r["img"]
        for r in synthetic_real_media_df(spark, 64).collect()
    }
    assert len(rows) == 64
    for i, blob in rows.items():
        if i % 11 == 10:
            assert blob is None
            continue
        if i % 13 == 12:
            assert len(blob) == 24
            assert decode_image_real(blob)[4] is False
            continue
        assert len(blob) == 1024
        fmt = i % 6
        w, h, v = 6 + 2 * (i % 5), 4 + i % 9, 30 + (i * 7) % 190
        W, H, C, px, ok = decode_image_real(bytes(blob))
        assert ok and (W, H) == (w, h)
        assert C == (1 if fmt in (0, 5) else 3)
        f = px.astype(np.float64)
        if fmt == 5:
            assert f.min() == f.max() == v
        else:
            assert f.min() == v and f.max() == v + 17
            # even pixel count per image → exact half-and-half
            assert f.mean() == v + 8.5 and f.std() == 8.5


# --- WAV encoder ↔ decoder ---------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    ch=st.integers(1, 3),
    rate=st.integers(1, 96000),
    n=st.integers(1, 200),
    seed=st.integers(0, 2**31 - 1),
    codec=st.sampled_from(["pcm16", "pcm8", "f32", "f64", "alaw", "ulaw"]),
    lst=st.booleans(),
)
def test_wav_encoder_is_decoder_inverse(ch, rate, n, seed, codec, lst):
    from spiderspark.encoders import encode_wav
    from spiderspark.multimodal import _ALAW_LUT, _ULAW_LUT, decode_wav

    rng = np.random.default_rng(seed)
    if codec == "pcm16":
        raw = rng.integers(-32768, 32768, size=n * ch).astype("<i2")
        blob = encode_wav(1, ch, rate, 16, raw.tobytes(), with_list_chunk=lst)
        want = raw.astype(np.float64).reshape(n, ch) / 32768.0
    elif codec == "pcm8":
        raw = rng.integers(0, 256, size=n * ch).astype(np.uint8)
        blob = encode_wav(1, ch, rate, 8, raw.tobytes(), with_list_chunk=lst)
        want = (raw.astype(np.float64).reshape(n, ch) - 128.0) / 128.0
    elif codec == "f32":
        raw = rng.standard_normal(n * ch).astype("<f4")
        blob = encode_wav(3, ch, rate, 32, raw.tobytes(), with_list_chunk=lst)
        want = raw.astype(np.float64).reshape(n, ch)
    elif codec == "f64":
        raw = rng.standard_normal(n * ch).astype("<f8")
        blob = encode_wav(3, ch, rate, 64, raw.tobytes(), with_list_chunk=lst)
        want = raw.reshape(n, ch)
    else:
        raw = rng.integers(0, 256, size=n * ch).astype(np.uint8)
        fmt = 6 if codec == "alaw" else 7
        lut = _ALAW_LUT if codec == "alaw" else _ULAW_LUT
        blob = encode_wav(fmt, ch, rate, 8, raw.tobytes(), with_list_chunk=lst)
        want = lut[raw].astype(np.float64).reshape(n, ch) / 32768.0
    r, c, m, s, ok = decode_wav(blob)
    assert ok and (r, c, m) == (rate, ch, n)
    np.testing.assert_array_equal(s, want)


def test_wav_encoder_adpcm_truncation_paths():
    """wSamplesPerBlock below block capacity AND a fact chunk below that:
    both truncations must land in n_samples (all-zero nibbles at step index
    0 keep the predictor constant, so content is closed-form)."""
    import struct

    from spiderspark.encoders import encode_wav
    from spiderspark.multimodal import decode_wav

    ch, words, nblocks, pred = 2, 3, 2, -777
    block_align = 4 * ch * (1 + words)
    spb_cap = 1 + 8 * words
    spb_decl = spb_cap - 3
    fact_n = nblocks * spb_decl - 4
    block = b"".join(
        struct.pack("<hBB", pred, 0, 0) for _ in range(ch)
    ) + b"\x00" * (4 * ch * words)
    blob = encode_wav(
        0x11, ch, 11025, 4, block * nblocks, block_align=block_align,
        fmt_ext=struct.pack("<H", spb_decl), fact_n=fact_n,
    )
    r, c, m, s, ok = decode_wav(blob)
    assert ok and (r, c, m) == (11025, ch, fact_n)
    np.testing.assert_array_equal(s, np.full((fact_n, ch), pred / 32768.0))


def test_synthetic_wav_fixture_contract(spark):
    """Every fixture row decodes to its closed-form stats (the same facts
    the driver oracle states in SQL) — run through the fixture generator,
    not the UDF, so a failure localizes to construction vs decode."""
    from spiderspark.multimodal import _ALAW_LUT, _ULAW_LUT, decode_wav, synthetic_wav_df

    rows = {
        r["item_id"]: r["audio"]
        for r in synthetic_wav_df(spark, 60).collect()
    }
    for i in range(60):
        blob = rows[i]
        if i % 11 == 10:
            assert blob is None
            continue
        if i % 13 == 12:
            assert decode_wav(bytes(blob))[4] is False
            continue
        codec, ch = i % 6, 1 + i % 2
        rate, length = 8000 + 400 * (i % 5), 48 + (i % 29)
        j = np.arange(length, dtype=np.int64)
        r, c, m, s, ok = decode_wav(bytes(blob))
        assert ok and (r, c) == (rate, ch)
        mono = s.mean(axis=1)
        if codec == 0:
            want = (((i * 37 + j * 97) % 4001) - 2000) / 32768.0
        elif codec == 1:
            want = (((i * 13 + j * 29) % 256) - 128.0) / 128.0
        elif codec == 2:
            want = (((i + j) % 17) - 8) / 8.0
        elif codec == 3:
            want = _ALAW_LUT[(i * 11 + j * 23) % 256] / 32768.0
        elif codec == 4:
            want = _ULAW_LUT[(i * 7 + j * 31) % 256] / 32768.0
        else:
            words, nblocks = 2 + i % 3, 1 + i % 3
            fact_n = nblocks * (1 + 8 * words - (i % 4)) - (i % 5)
            want = np.full(fact_n, (((i * 41) % 3000) - 1500) / 32768.0)
        assert m == len(want)
        np.testing.assert_array_equal(mono, want)
