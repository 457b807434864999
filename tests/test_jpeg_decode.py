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


def _arithmetic_blob() -> bytes:
    # SOF9: arithmetic-coded extended sequential — outside the huffman subset
    sof9 = _seg(0xC9, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    return b"\xff\xd8" + sof9 + b"\xff\xd9"


def test_arithmetic_rejected():
    blob = _arithmetic_blob()
    with pytest.raises(ValueError, match="SOF family"):
        decode_jpeg(blob)
    assert decode_image_real(blob)[4] is False
    assert jpeg_header_meta(blob)[3] is False
    # SOF2 with no scan data is structurally header-valid but must fail
    # the pixel path (missing SOS), not crash
    sof2 = _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    no_scan = b"\xff\xd8" + sof2 + b"\xff\xd9"
    with pytest.raises(ValueError, match="SOF/SOS"):
        decode_jpeg(no_scan)
    assert decode_image_real(no_scan)[4] is False


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
        [(0, bytearray(blob)), (1, bytearray(_arithmetic_blob()))],
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
    assert feats[1] == [0.0, 0.0, 0.0, 0.0]  # arithmetic → invalid → zeros


# --- progressive (SOF2) — spec-forward encoder + equality tests -----------
#
# The progressive encoder below follows T.81 Annex G forward: spectral
# selection splits the zigzag band across scans, successive approximation
# splits each coefficient's bits (magnitude shift for AC, arithmetic shift
# for DC), EOBn codes run-length-encode all-insignificant blocks, and
# refinement scans interleave newly-significant coefficients with
# correction bits for history. Baseline and progressive encodings share
# ONE forward quantization (_quantized_zz), so the decoder must produce
# BIT-IDENTICAL pixels from both — entropy coding is lossless.


def _quantized_zz(px, subsampling="444", quant=1):
    """Per-component quantized coefficients in ZIGZAG order
    [(by*bx, 64) int64] + geometry. Same color transform, padding, FDCT
    and rounding as make_jpeg."""
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
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    zzs = []
    for i, p in enumerate(planes):
        hf, vf = sampling[i]
        bx, by = mcus_x * hf, mcus_y * vf
        padded = _pad_to(p, by, bx)
        blocks = (
            padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        # per-block _fdct, same call and float-accumulation order as
        # make_jpeg's _encode_block — the two encoders must quantize
        # BIT-identically for the equality tests to be meaningful
        coef = np.stack(
            [
                np.round(_fdct(b) / qtab).astype(np.int64).reshape(64)
                for b in blocks
            ]
        )
        zzs.append(coef[:, _ZZ])
    return zzs, sampling, mcus_x, mcus_y, qtab


def _emit_eobrun(bw, st):
    """Flush a pending EOB run + the correction bits deferred behind it."""
    run = st["run"]
    if run:
        n = run.bit_length() - 1
        c, ln = _AC_CODES[n << 4]
        bw.put(c, ln)
        if n:
            bw.put(run - (1 << n), n)
        st["run"] = 0
    for b in st["pending"]:
        bw.put(b, 1)
    st["pending"] = []


def _enc_dc_unit(bw, dc, pred, ah, al):
    """One data unit of a DC scan. First scans (Ah=0) huffman-code the
    diff of the ARITHMETICALLY shifted DC; refinement sends one raw bit."""
    if ah == 0:
        v = int(dc) >> al  # arithmetic shift per G.1.2.1
        diff = v - pred[0]
        pred[0] = v
        t = int(abs(diff)).bit_length()
        code, length = _DC_CODES[t]
        bw.put(code, length)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    else:
        bw.put((int(dc) >> al) & 1, 1)


def _enc_ac_first_block(bw, zz, ss, se, al, st):
    """AC first scan (Ah=0): magnitude-shift point transform, EOBn runs."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        if a == 0:
            r += 1
            continue
        _emit_eobrun(bw, st)
        while r > 15:
            c, ln = _AC_CODES[0xF0]
            bw.put(c, ln)
            r -= 16
        s = a.bit_length()
        t = a if v >= 0 else -a
        c, ln = _AC_CODES[(r << 4) | s]
        bw.put(c, ln)
        bw.put(t if t >= 0 else t + (1 << s) - 1, s)
        r = 0
    if r:
        st["run"] += 1
        if st["run"] == 0x7FFF:
            _emit_eobrun(bw, st)


def _enc_ac_refine_block(bw, zz, ss, se, al, st):
    """AC refinement scan (Ah=Al+1): newly-significant coefficients carry
    sign bits; already-nonzero history contributes deferred correction
    bits; EOBn covers the all-insignificant tail."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = -1
    for idx, a in enumerate(absv):
        if a == 1:
            eob = ss + idx
    r = 0
    cur = []  # this block's correction bits, not yet attached to a run
    for k in range(ss, se + 1):
        a = absv[k - ss]
        if a == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _emit_eobrun(bw, st)
            c, ln = _AC_CODES[0xF0]
            bw.put(c, ln)
            r -= 16
            for b in cur:
                bw.put(b, 1)
            cur = []
        if a > 1:
            cur.append(a & 1)
            continue
        _emit_eobrun(bw, st)
        c, ln = _AC_CODES[(r << 4) | 1]
        bw.put(c, ln)
        bw.put(1 if int(zz[k]) >= 0 else 0, 1)
        for b in cur:
            bw.put(b, 1)
        cur = []
        r = 0
    if r > 0 or cur:
        st["run"] += 1
        st["pending"].extend(cur)
        if st["run"] == 0x7FFF:
            _emit_eobrun(bw, st)


def make_progressive_jpeg(
    px,
    subsampling="444",
    quant=1,
    restart_interval=0,
    scans=None,
):
    """px → progressive JFIF bytes, quantization identical to make_jpeg.

    ``scans``: list of ("dc", [comp...], ah, al) and
    ("ac", comp, ss, se, ah, al) entries; the default script exercises
    interleaved DC first+refine, split spectral bands, Al>0 first scans
    and two successive AC refinement passes."""
    zzs, sampling, mcus_x, mcus_y, qtab = _quantized_zz(px, subsampling, quant)
    h, w = px.shape[:2]
    nf = len(zzs)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    if scans is None:
        if nf == 1:
            scans = [
                ("dc", [0], 0, 1),
                ("ac", 0, 1, 5, 0, 2),
                ("ac", 0, 6, 63, 0, 2),
                ("dc", [0], 1, 0),
                ("ac", 0, 1, 63, 2, 1),
                ("ac", 0, 1, 63, 1, 0),
            ]
        else:
            scans = [
                ("dc", [0, 1, 2], 0, 1),
                ("ac", 0, 1, 5, 0, 2),
                ("ac", 0, 6, 63, 0, 2),
                ("ac", 1, 1, 63, 0, 1),
                ("ac", 2, 1, 63, 0, 1),
                ("dc", [0, 1, 2], 1, 0),
                ("ac", 0, 1, 5, 2, 1),
                ("ac", 0, 6, 63, 2, 1),
                ("ac", 0, 1, 63, 1, 0),
                ("ac", 1, 1, 63, 1, 0),
                ("ac", 2, 1, 63, 1, 0),
            ]

    zz_q = np.round(qtab.reshape(64)[_ZZ]).astype(int)
    dqt = _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in zz_q))
    sof_comps = b"".join(
        bytes([i + 1, (sampling[i][0] << 4) | sampling[i][1], 0])
        for i in range(nf)
    )
    sof = _seg(0xC2, struct.pack(">BHHB", 8, h, w, nf) + sof_comps)
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS
        + bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS,
    )
    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )

    def eff_dims(ci):
        hf, vf = sampling[ci]
        cw = -(-(w * hf) // hmax)
        ch = -(-(h * vf) // vmax)
        return -(-cw // 8), -(-ch // 8)

    out = bytearray(
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + dqt + sof + dht + dri
    )
    for entry in scans:
        bw = _BitWriter()
        entropy = bytearray()
        rst = 0

        def _restart():
            nonlocal bw, rst
            bw.align()
            entropy.extend(bw.out)
            entropy.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            bw = _BitWriter()

        if entry[0] == "dc":
            _tag, comp_ids, ah, al = entry
            sos_comps = b"".join(bytes([ci + 1, 0x00]) for ci in comp_ids)
            sos = _seg(
                0xDA,
                bytes([len(comp_ids)]) + sos_comps
                + bytes([0, 0, (ah << 4) | al]),
            )
            if len(comp_ids) > 1:
                total = mcus_x * mcus_y
                preds = {ci: [0] for ci in comp_ids}
                for m in range(total):
                    if restart_interval and m and m % restart_interval == 0:
                        _restart()
                        preds = {ci: [0] for ci in comp_ids}
                    my, mx = divmod(m, mcus_x)
                    for ci in comp_ids:
                        hf, vf = sampling[ci]
                        bx = mcus_x * hf
                        for v in range(vf):
                            for hh in range(hf):
                                blk = zzs[ci][(my * vf + v) * bx + mx * hf + hh]
                                _enc_dc_unit(bw, blk[0], preds[ci], ah, al)
            else:
                ci = comp_ids[0]
                ex, ey = eff_dims(ci)
                bx = mcus_x * sampling[ci][0]
                pred = [0]
                for b in range(ex * ey):
                    if restart_interval and b and b % restart_interval == 0:
                        _restart()
                        pred = [0]
                    r_, c_ = divmod(b, ex)
                    _enc_dc_unit(bw, zzs[ci][r_ * bx + c_][0], pred, ah, al)
        else:
            _tag, ci, ss, se, ah, al = entry
            sos = _seg(
                0xDA,
                bytes([1, ci + 1, 0x00])
                + bytes([ss, se, (ah << 4) | al]),
            )
            ex, ey = eff_dims(ci)
            bx = mcus_x * sampling[ci][0]
            st = {"run": 0, "pending": []}
            fn = _enc_ac_first_block if ah == 0 else _enc_ac_refine_block
            for b in range(ex * ey):
                if restart_interval and b and b % restart_interval == 0:
                    _emit_eobrun(bw, st)
                    _restart()
                    st = {"run": 0, "pending": []}
                r_, c_ = divmod(b, ex)
                fn(bw, zzs[ci][r_ * bx + c_], ss, se, al, st)
            _emit_eobrun(bw, st)
        bw.align()
        entropy.extend(bw.out)
        out += sos + bytes(entropy)
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("subsampling", ["444", "422", "420"])
def test_progressive_equals_baseline_rgb(subsampling):
    """Identical quantized coefficients → progressive and baseline decode
    to BIT-IDENTICAL pixels (entropy coding is lossless)."""
    px = _gradient(24, 32, 3) if subsampling == "444" else _smooth(24, 32, 3)
    base = decode_jpeg(make_jpeg(px, subsampling=subsampling))
    prog = decode_jpeg(make_progressive_jpeg(px, subsampling=subsampling))
    assert base[:3] == prog[:3]
    np.testing.assert_array_equal(base[3], prog[3])


def test_progressive_equals_baseline_gray_odd_dims():
    """19x13 grayscale: effective block grid == MCU grid for 1-component,
    crop path shared with baseline."""
    px = _gradient(19, 13)
    base = decode_jpeg(make_jpeg(px))
    prog = decode_jpeg(make_progressive_jpeg(px))
    np.testing.assert_array_equal(base[3], prog[3])


def test_progressive_420_odd_dims_effective_grid():
    """23x21 at 4:2:0: luma effective grid (3x3) is SMALLER than the
    MCU-padded grid (4x4, mcus 2x2 of 2x2 blocks) — non-interleaved AC
    scans must walk only effective blocks while the interleaved DC scan
    covers the padded grid."""
    px = _smooth(21, 23, 3)
    base = decode_jpeg(make_jpeg(px, subsampling="420"))
    prog = decode_jpeg(make_progressive_jpeg(px, subsampling="420"))
    np.testing.assert_array_equal(base[3], prog[3])


def test_progressive_spectral_only_no_sa():
    """Spectral selection without successive approximation (Al=0
    everywhere): exercises EOBn runs + band splits in isolation."""
    px = _gradient(24, 32, 3)
    scans = [
        ("dc", [0, 1, 2], 0, 0),
        ("ac", 0, 1, 2, 0, 0),
        ("ac", 0, 3, 63, 0, 0),
        ("ac", 1, 1, 63, 0, 0),
        ("ac", 2, 1, 63, 0, 0),
    ]
    base = decode_jpeg(make_jpeg(px))
    prog = decode_jpeg(make_progressive_jpeg(px, scans=scans))
    np.testing.assert_array_equal(base[3], prog[3])


def test_progressive_eobrun_heavy():
    """Mostly-flat image with one spike: nearly every block's AC band is
    insignificant, so the scan is dominated by multi-block EOBn runs
    (r > 0 with extra bits)."""
    px = np.full((48, 48), 120, dtype=np.uint8)
    px[20, 30] = 200
    base = decode_jpeg(make_jpeg(px))
    prog = decode_jpeg(make_progressive_jpeg(px))
    np.testing.assert_array_equal(base[3], prog[3])


def test_progressive_restart_markers():
    """RSTn inside progressive scans: DC predictors and EOB runs reset at
    segment boundaries in every scan kind (DC first/refine, AC
    first/refine)."""
    px = _gradient(32, 48)
    plain = decode_jpeg(make_progressive_jpeg(px))[3]
    restarted = decode_jpeg(make_progressive_jpeg(px, restart_interval=2))[3]
    np.testing.assert_array_equal(plain, restarted)


def test_progressive_coarse_quant_roundtrip():
    """Coarse quant shrinks magnitudes to the 1-2 bit regime where the
    refinement scans carry most of the value — the equality still must be
    exact."""
    px = _gradient(16, 24)
    base = decode_jpeg(make_jpeg(px, quant=8))
    prog = decode_jpeg(make_progressive_jpeg(px, quant=8))
    np.testing.assert_array_equal(base[3], prog[3])


def test_progressive_header_and_seam():
    """SOF2 is now a first-class citizen of the metadata + pixel paths."""
    px = _smooth(24, 32, 3)
    blob = make_progressive_jpeg(px, subsampling="420")
    assert jpeg_header_meta(blob) == (32, 24, 3, True)
    assert image_header_meta(blob) == (32, 24, 3, True)
    w, h, c, pixels, valid = decode_image_real(blob)
    assert (w, h, c, valid) == (32, 24, 3, True)
    # truncated progressive → data, not a crash
    assert decode_image_real(blob[: len(blob) * 2 // 3])[4] is False


# --- property: random images/quant/subsampling, progressive == baseline ---

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    gray=st.booleans(),
    quant=st.sampled_from([1, 2, 4, 8]),
    subsampling=st.sampled_from(["444", "422", "420"]),
    restart=st.sampled_from([0, 0, 2, 5]),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_property_random(h, w, gray, quant, subsampling, restart, seed):
    rng = np.random.default_rng(seed)
    if gray:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        subsampling = "444"
    else:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base = decode_jpeg(
        make_jpeg(px, subsampling=subsampling, quant=quant,
                  restart_interval=restart)
    )
    prog = decode_jpeg(
        make_progressive_jpeg(px, subsampling=subsampling, quant=quant,
                              restart_interval=restart)
    )
    assert base[:3] == prog[:3]
    np.testing.assert_array_equal(base[3], prog[3])


def _patch_sof_sampling(blob: bytes, hv_per_comp: list) -> bytes:
    """Rewrite the Hi/Vi nibbles of each component in the first SOF0
    segment (component k's hv byte sits 11 + 3k past the 0xFFC0)."""
    i = blob.index(b"\xff\xc0")
    out = bytearray(blob)
    for k, (h_i, v_i) in enumerate(hv_per_comp):
        out[i + 11 + 3 * k] = (h_i << 4) | v_i
    return bytes(out)


def test_fractional_chroma_sampling_rejected():
    """Spec-legal but fractional-ratio sampling (Y 3x1 over chroma 2x1 →
    ratio 1.5) must be REJECTED, not floor-stretched into silently wrong
    pixels: both the pixel decoder and the header-only path refuse it,
    while an integer-ratio patch of the same stream still passes the
    header path (proves the guard is the ratio, not the patching)."""
    px = _gradient(16, 24, 3)
    blob = make_jpeg(px, subsampling="444")
    frac = _patch_sof_sampling(blob, [(3, 1), (2, 1), (1, 1)])
    with pytest.raises(ValueError):
        decode_jpeg(frac)
    assert jpeg_header_meta(frac) == (0, 0, 0, False)
    # vertical fractional ratio too (3x? over ?x2)
    fracv = _patch_sof_sampling(blob, [(1, 3), (1, 2), (1, 1)])
    with pytest.raises(ValueError):
        decode_jpeg(fracv)
    assert jpeg_header_meta(fracv) == (0, 0, 0, False)
    # integer ratios through the SAME patcher stay header-valid
    ok = _patch_sof_sampling(blob, [(4, 2), (2, 1), (1, 2)])
    assert jpeg_header_meta(ok)[3] is np.True_ or jpeg_header_meta(ok)[3] is True
