"""Baseline-JPEG decoder tests (spiderspark/jpeg.py) against an
INDEPENDENTLY-CONSTRUCTED minimal encoder (T.81 forward path built here
from the public spec: FDCT → quantize → zigzag → huffman + byte stuffing
+ restart markers). The decoder is validated as the spec-inverse of wire
bytes this test assembles — not against any library's output (none is
available in this container, which is the point of the from-scratch tier).

The encoder's huffman tables are NOT the Annex K defaults but trivially
valid canonical tables (fixed-length codes) written into DHT — the decoder
is table-driven, so this also proves it reads tables from the stream
rather than assuming the defaults.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from spiderspark.jpeg import decode_jpeg, jpeg_header_meta
from spiderspark.multimodal import (
    decode_image_batch,
    decode_image_real,
    image_header_meta,
    mean_pixel_features,
)

# --- independent forward DCT / zigzag (derived separately from the spec) --

_T = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# zigzag via sort key, not a walk (different construction than the decoder)
_ZZ = sorted(
    range(64),
    key=lambda i: (
        i // 8 + i % 8,
        (i // 8) if (i // 8 + i % 8) % 2 else -(i // 8),
    ),
)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


# --- fixed-length canonical huffman tables (valid, non-Annex-K) ----------

# DC: symbols 0..11 all at code length 4 (codes 0..11)
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = bytes(range(12))
# AC: symbols 0x00..0xFE at length 9, 0xFF at length 10
_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_AC_SYMBOLS = bytes(range(256))


def _huff_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _huff_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _huff_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)  # 1-fill per spec


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _encode_block(bw, block, qtab, pred):
    """block: (8,8) float (centered). Returns new DC predictor."""
    coef = np.round(_fdct(block) / qtab).astype(np.int64).reshape(64)
    zz = coef[_ZZ]
    diff = int(zz[0]) - pred
    t = int(abs(diff)).bit_length()
    code, length = _DC_CODES[t]
    bw.put(code, length)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    run = 0
    while k < 64:
        v = int(zz[k])
        if v == 0:
            run += 1
        else:
            while run > 15:
                c, ln = _AC_CODES[0xF0]  # ZRL
                bw.put(c, ln)
                run -= 16
            s = int(abs(v)).bit_length()
            c, ln = _AC_CODES[(run << 4) | s]
            bw.put(c, ln)
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        k += 1
    if run:
        c, ln = _AC_CODES[0x00]  # EOB
        bw.put(c, ln)
    return int(zz[0])


def _pad_to(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """Edge-replicate to (bh*8, bw_*8)."""
    h, w = plane.shape
    out = np.empty((bh * 8, bw_ * 8))
    out[:h, :w] = plane
    out[h:, :w] = plane[-1:, :]
    out[:h, w:] = plane[:, -1:]
    out[h:, w:] = plane[-1, -1]
    return out


def make_jpeg(
    px: np.ndarray,
    subsampling: str = "444",
    quant: int = 1,
    restart_interval: int = 0,
    dqt_16bit: bool = False,
) -> bytes:
    """px: (h, w) grayscale or (h, w, 3) RGB uint8 → baseline JFIF bytes."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qtab = np.full((8, 8), float(quant))
    if gray:
        planes = [px.astype(np.float64) - 128.0]
        sampling = [(1, 1)]
    else:
        f = px.astype(np.float64)
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        hf, vf = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
        sampling = [(hf, vf), (1, 1), (1, 1)]

        def sub(p):
            if hf == 1 and vf == 1:
                return p
            hh = -(-h // vf) * vf
            ww = -(-w // hf) * hf
            pp = _pad_to(p, -(-hh // 8), -(-ww // 8))[:hh, :ww]
            return pp.reshape(hh // vf, vf, ww // hf, hf).mean(axis=(1, 3))

        planes = [y - 128.0, sub(cb) - 128.0, sub(cr) - 128.0]
    nf = len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = [
        _pad_to(p, mcus_y * sampling[i][1], mcus_x * sampling[i][0])
        for i, p in enumerate(planes)
    ]

    # headers
    if dqt_16bit:
        zz_q = np.round(qtab.reshape(64)[_ZZ]).astype(int)
        dqt = _seg(
            0xDB,
            bytes([0x10]) + b"".join(struct.pack(">H", v) for v in zz_q),
        )
    else:
        zz_q = np.round(qtab.reshape(64)[_ZZ]).astype(int)
        dqt = _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in zz_q))
    sof_comps = b"".join(
        bytes([i + 1, (sampling[i][0] << 4) | sampling[i][1], 0])
        for i in range(nf)
    )
    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, w, nf) + sof_comps)
    # one DHT segment with DC0 and AC0 (multi-table segment)
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS
        + bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS,
    )
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _seg(
        0xDA,
        bytes([nf])
        + b"".join(bytes([i + 1, 0x00]) for i in range(nf))
        + bytes([0, 63, 0]),
    )

    bw = _BitWriter()
    entropy = bytearray()
    preds = [0] * nf
    total = mcus_x * mcus_y
    rst = 0
    for m in range(total):
        if restart_interval and m and m % restart_interval == 0:
            bw.align()
            entropy += bw.out
            entropy += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * nf
        my, mx = divmod(m, mcus_x)
        for i in range(nf):
            hf, vf = sampling[i]
            for v in range(vf):
                for hh in range(hf):
                    r0 = (my * vf + v) * 8
                    c0 = (mx * hf + hh) * 8
                    block = padded[i][r0 : r0 + 8, c0 : c0 + 8]
                    preds[i] = _encode_block(bw, block, qtab, preds[i])
    bw.align()
    entropy += bw.out
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + dqt + sof + dht + dri + sos + bytes(entropy) + b"\xff\xd9"
    )


def _gradient(h, w, c=None):
    if c is None:
        return ((np.arange(h)[:, None] * 5 + np.arange(w) * 3) % 256).astype(
            np.uint8
        )
    return (
        (np.arange(h)[:, None, None] * 5 + np.arange(w)[None, :, None] * 3
         + np.arange(c) * 40) % 256
    ).astype(np.uint8)


# --- roundtrips -----------------------------------------------------------


def test_gray_flat_blocks_exact():
    """Per-8x8-constant grayscale with unit quant: FDCT is exact on flat
    blocks (only DC nonzero, integral), so the roundtrip is bit-exact."""
    vals = (np.arange(12, dtype=np.uint8).reshape(3, 4) * 20 + 7).astype(np.uint8)
    px = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    w, h, c, got = decode_jpeg(make_jpeg(px))
    assert (w, h, c) == (32, 24, 1)
    np.testing.assert_array_equal(got[:, :, 0], px)


def test_gray_gradient_tolerance():
    px = _gradient(24, 40)
    w, h, c, got = decode_jpeg(make_jpeg(px))
    assert (w, h, c) == (40, 24, 1)
    assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 3


def test_gray_non_multiple_of_8_dims():
    """19x13: MCU padding must be cropped to the SOF dims."""
    px = _gradient(19, 13)
    w, h, c, got = decode_jpeg(make_jpeg(px))
    assert (w, h, c) == (13, 19, 1)
    assert got.shape == (19, 13, 1)
    assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 3


def _smooth(h, w, c):
    """Non-wrapping linear ramp: chroma is globally linear, so box-average
    subsampling + replication upsampling stays within a few LSB (a mod-256
    wrapping gradient would put a 256-jump edge under the chroma box
    filter and the error would be the image's, not the codec's)."""
    return (
        np.arange(h)[:, None, None] * 3
        + np.arange(w)[None, :, None] * 2
        + np.arange(c) * 10
    ).astype(np.uint8)


@pytest.mark.parametrize("subsampling", ["444", "422", "420"])
def test_rgb_roundtrip(subsampling):
    px = _gradient(24, 32, 3) if subsampling == "444" else _smooth(24, 32, 3)
    w, h, c, got = decode_jpeg(make_jpeg(px, subsampling=subsampling))
    assert (w, h, c) == (32, 24, 3)
    err = np.abs(got.astype(int) - px.astype(int)).max()
    assert err <= (3 if subsampling == "444" else 12), err


def test_rgb_420_chroma_constant_tight():
    """Constant-chroma image: subsampling is lossless, so 4:2:0 must hit
    the same tolerance as 4:4:4."""
    base = _gradient(16, 16)
    px = np.stack([base, base, base], axis=-1)  # gray in RGB: Cb=Cr=128
    _w, _h, _c, got = decode_jpeg(make_jpeg(px, subsampling="420"))
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 3


def test_restart_markers_match_unrestarted():
    px = _gradient(32, 48)
    plain = decode_jpeg(make_jpeg(px))[3]
    restarted = decode_jpeg(make_jpeg(px, restart_interval=2))[3]
    np.testing.assert_array_equal(plain, restarted)


def test_16bit_dqt_and_coarse_quant():
    px = _gradient(16, 16)
    a = decode_jpeg(make_jpeg(px, quant=4, dqt_16bit=False))[3]
    b = decode_jpeg(make_jpeg(px, quant=4, dqt_16bit=True))[3]
    np.testing.assert_array_equal(a, b)
    # coarse quant is lossy but must stay in the right neighborhood
    assert np.abs(a[:, :, 0].astype(int) - px.astype(int)).max() <= 16


# --- rejections (data, not crashes) ---------------------------------------


def _sof2_progressive_blob() -> bytes:
    sof2 = _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    return b"\xff\xd8" + sof2 + b"\xff\xd9"


def test_progressive_rejected():
    blob = _sof2_progressive_blob()
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(blob)
    assert decode_image_real(blob)[4] is False
    assert jpeg_header_meta(blob)[3] is False


def test_malformed_rejected():
    good = make_jpeg(_gradient(16, 16))
    assert decode_image_real(good[: len(good) // 2])[4] is False  # truncated
    assert decode_image_real(b"\xff\xd8\xff\xd9")[4] is False  # no SOF/SOS
    # 12-bit precision
    sof12 = _seg(0xC0, struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0]))
    assert decode_image_real(b"\xff\xd8" + sof12 + b"\xff\xd9")[4] is False
    # dims past the pixel budget → rejected before allocation
    sof_huge = _seg(
        0xC0, struct.pack(">BHHB", 8, 60000, 60000, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    hdr = jpeg_header_meta(b"\xff\xd8" + sof_huge + b"\xff\xd9")
    assert hdr[3] is False


# --- integration with the multimodal surface ------------------------------


def test_jpeg_through_metadata_and_batch_paths():
    px = _gradient(24, 32, 3)
    blob = make_jpeg(px, subsampling="420")
    assert image_header_meta(blob) == (32, 24, 3, True)
    meta = decode_image_batch(pd.Series([blob, None]), decoder="real")
    assert list(meta["valid"]) == [True, False]
    assert list(meta["width"]) == [32, 0]
    assert list(meta["height"]) == [24, 0]


def test_jpeg_through_spark_features(spark):
    """End-to-end: JPEG blobs through the SAME mapInPandas feature plumbing
    as PNG/BMP — stats must match numpy on the decoded pixels."""
    px = _gradient(24, 32, 3)
    blob = make_jpeg(px)
    decoded = decode_jpeg(blob)[3].astype(np.float64)
    df = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(_sof2_progressive_blob()))],
        "item_id long, img binary",
    )
    feats = {
        r["item_id"]: r["feat"]
        for r in mean_pixel_features(df, decoder="real").collect()
    }
    np.testing.assert_allclose(
        feats[0],
        [decoded.mean(), decoded.std(), decoded.min(), decoded.max()],
        rtol=1e-12,
    )
    assert feats[1] == [0.0, 0.0, 0.0, 0.0]  # progressive → invalid → zeros
