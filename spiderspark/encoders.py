"""Deterministic from-scratch ENCODERS for the wire formats the decoders in
:mod:`spiderspark.multimodal` / :mod:`spiderspark.jpeg` accept — PNG (W3C
PNG spec), GIF89a (GIF89a spec Appendix F LZW), BMP (BITMAPINFOHEADER),
and baseline JPEG (ITU-T T.81). No image library anywhere.

Two jobs:

1. **Spec-inverse validation surface**: each decoder is checked as the
   inverse of an independently written forward encoder (tests/ carries its
   own copies for PNG filters / progressive JPEG; these are the engine-side
   baseline encoders used by the DRIVER-checked queries).
2. **Closed-form driver fixtures**: ``synthetic_real_media_df`` emits real
   PNG/GIF/BMP/JPEG wire bytes as a PURE FUNCTION of ``item_id``, padded to
   an exact byte length via spec-skippable elements (PNG ancillary chunk,
   GIF trailing bytes, BMP trailing bytes, JPEG COM segment) — so the
   DuckDB oracle can state every decoded property (dims, channels, n_bytes,
   validity, pixel statistics) in plain SQL over ``range(n)``, and the
   from-scratch decoders are VALUE-checked by the external driver, not just
   by pytest.

Pixel content is a two-value checkerboard ``v / v+17`` with an EVEN pixel
count per image (width is always even), so mean = v+8.5 and std = 8.5 are
EXACT in float64 (all intermediate sums are multiples of 1/4 far below
2^53) — the oracle comparison is exact-rational, not tolerance-based. JPEG
rows use a CONSTANT ``v`` instead (DC-only blocks with an all-ones quant
table round-trip bit-exactly; a checkerboard would not survive quantization
rounding).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --- PNG -------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_filter_rows(px: np.ndarray) -> bytes:
    """Apply PNG scanline filters, cycling None/Sub/Up by row (y % 3) so the
    decoder's per-filter inverses all run. px: (h, w, spp) uint8."""
    h, w, spp = px.shape
    rows = px.reshape(h, w * spp).astype(np.int16)
    out = bytearray()
    prev = np.zeros(w * spp, dtype=np.int16)
    for y in range(h):
        row = rows[y]
        ftype = y % 3
        if ftype == 0:  # None
            filt = row
        elif ftype == 1:  # Sub: subtract left neighbour (per sample lane)
            left = np.concatenate([np.zeros(spp, dtype=np.int16), row[:-spp]])
            filt = row - left
        else:  # Up: subtract the row above
            filt = row - prev
        out.append(ftype)
        out += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


def encode_png(
    px: np.ndarray,
    palette: np.ndarray | None = None,
    pad_to: int | None = None,
) -> bytes:
    """(h, w) gray / (h, w, 2) gray+alpha / (h, w, 3) RGB / (h, w, 4) RGBA
    uint8 → PNG bytes; with ``palette`` ((n, 3) uint8), px must be (h, w)
    palette indices → indexed-color PNG. ``pad_to`` inserts an ancillary
    private 'spAd' chunk before IEND so the total file length is exactly
    ``pad_to`` (decoders must skip it)."""
    if palette is not None:
        ctype, spp = 3, 1
        body = px[:, :, None]
    elif px.ndim == 2:
        ctype, spp = 0, 1
        body = px[:, :, None]
    else:
        # sample count → PNG color type (W3C PNG §11.2.2)
        ctype = {2: 4, 3: 2, 4: 6}[px.shape[2]]
        spp = px.shape[2]
        body = px
    h, w = px.shape[:2]
    ihdr = _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    )
    plte = _png_chunk(b"PLTE", palette.tobytes()) if palette is not None else b""
    idat = _png_chunk(b"IDAT", zlib.compress(_png_filter_rows(body), 6))
    iend = _png_chunk(b"IEND", b"")
    base = len(_PNG_MAGIC) + len(ihdr) + len(plte) + len(idat) + len(iend)
    pad = b""
    if pad_to is not None:
        need = pad_to - base - 12  # 12 = chunk framing overhead
        if need < 0:
            raise ValueError("pad_to smaller than natural PNG size")
        pad = _png_chunk(b"spAd", b"\x00" * need)
    return _PNG_MAGIC + ihdr + plte + pad + idat + iend


# --- GIF (LZW per GIF89a Appendix F) ----------------------------------------


def gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Greedy LZW with GIF semantics: LITTLE-endian bit packing, variable
    code width min+1..12, width growth synchronized to the DECODER's table
    size (it appends one entry per code after the first and widens when its
    size hits 2^width), dictionary reset via Clear at 4096."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, clear + 2

    table, next_code = fresh()
    width = min_code_size + 1
    dec_size = clear + 2  # decoder's table size (roots + 2 specials)
    n_emitted = 0

    def emit(code: int):
        nonlocal n_emitted, dec_size, width
        put(code, width)
        n_emitted += 1
        # the decoder appends an entry after every read except the first
        # post-clear one, then widens when its table reaches 2^width
        if n_emitted >= 2 and dec_size < 4096:
            dec_size += 1
            if dec_size == (1 << width) and width < 12:
                width += 1

    put(clear, width)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        else:
            # table full: reset both sides
            put(clear, width)
            table, next_code = fresh()
            width = min_code_size + 1
            dec_size = clear + 2
            n_emitted = 0
        cur = bytes([b])
    if cur:
        emit(table[cur])
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    pad_to: int | None = None,
) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 palette → GIF89a bytes.
    Palette is stored as the global color table (padded to a power of two);
    ``pad_to`` appends raw bytes after the trailer (decoders stop at the
    first frame's terminator / trailer)."""
    h, w = indices.shape
    n_pal = len(palette)
    bits = max(1, (n_pal - 1).bit_length())
    gct = np.zeros(((1 << bits), 3), dtype=np.uint8)
    gct[:n_pal] = palette
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    body = indices
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        body = indices[order]
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    mcs = max(2, bits)
    lzw = gif_lzw_encode(body.astype(np.uint8).tobytes(), mcs)
    blocks = bytearray([mcs])
    for off in range(0, len(lzw), 255):
        part = lzw[off : off + 255]
        blocks.append(len(part))
        blocks += part
    blocks.append(0)
    out = hdr + gct.tobytes() + desc + bytes(blocks) + b"\x3b"
    if pad_to is not None:
        if len(out) > pad_to:
            raise ValueError("pad_to smaller than natural GIF size")
        out += b"\x00" * (pad_to - len(out))
    return out


def _gif_color_table(palette: np.ndarray) -> tuple[bytes, int]:
    """→ (table bytes padded to a power of two, size-field bits-1)."""
    n_pal = len(palette)
    bits = max(1, (n_pal - 1).bit_length())
    tbl = np.zeros(((1 << bits), 3), dtype=np.uint8)
    tbl[:n_pal] = palette
    return tbl.tobytes(), bits


def _gif_image_blocks(indices: np.ndarray, n_colors: int) -> bytes:
    """LZW-encode one frame's (h, w) indices → min-code byte + sub-blocks."""
    mcs = max(2, max(1, (n_colors - 1).bit_length()))
    lzw = gif_lzw_encode(indices.astype(np.uint8).tobytes(), mcs)
    blocks = bytearray([mcs])
    for off in range(0, len(lzw), 255):
        part = lzw[off : off + 255]
        blocks.append(len(part))
        blocks += part
    blocks.append(0)
    return bytes(blocks)


def encode_gif_animation(
    frames: list[dict],
    palette: np.ndarray,
    screen: tuple[int, int] | None = None,
) -> bytes:
    """Multi-frame GIF89a with per-frame Graphic Control Extensions — the
    spec-inverse forward encoder for the animation decoder
    (:func:`spiderspark.multimodal.gif_frames`).

    ``palette``: (n, 3) uint8 global color table. ``screen``: logical
    screen (w, h); defaults to the bounding box of all frame rects.
    Each frame dict:

    - ``indices``: (h, w) uint8 palette indices (required)
    - ``left``/``top``: frame rect offset (default 0)
    - ``disposal``: GCE disposal method 0..3 (default 0)
    - ``delay_cs``: GCE delay in centiseconds (default 4)
    - ``transparent``: transparent palette index or None (default)
    - ``interlace``: store rows in 4-pass interlaced order (default False)
    - ``palette``: (n, 3) uint8 LOCAL color table overriding the global
      one for this frame (default None)
    """
    if screen is None:
        sw = max(f.get("left", 0) + f["indices"].shape[1] for f in frames)
        sh = max(f.get("top", 0) + f["indices"].shape[0] for f in frames)
    else:
        sw, sh = screen
    gct, gbits = _gif_color_table(palette)
    out = bytearray(
        b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0x80 | (gbits - 1), 0, 0)
    )
    out += gct
    for f in frames:
        idx = f["indices"]
        h, w = idx.shape
        left, top = f.get("left", 0), f.get("top", 0)
        transparent = f.get("transparent")
        gflags = (f.get("disposal", 0) & 0x07) << 2
        tidx = 0
        if transparent is not None:
            gflags |= 0x01
            tidx = transparent
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", gflags, f.get("delay_cs", 4), tidx
        ) + b"\x00"
        local = f.get("palette")
        iflags = 0x40 if f.get("interlace", False) else 0
        table_bits = gbits
        lct = b""
        if local is not None:
            lct, lbits = _gif_color_table(local)
            iflags |= 0x80 | (lbits - 1)
            table_bits = lbits
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, iflags)
        out += lct
        body = idx
        if f.get("interlace", False):
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            body = idx[order]
        out += _gif_image_blocks(body, 1 << table_bits)
    out += b"\x3b"
    return bytes(out)


# --- BMP --------------------------------------------------------------------


def encode_bmp(px: np.ndarray, pad_to: int | None = None) -> bytes:
    """(h, w, 3) RGB uint8 → 24-bit bottom-up BI_RGB BMP; ``pad_to``
    appends trailing bytes after the pixel array (ignored by decoders)."""
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    size = 54 + stride * h
    out = (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
        + rows.tobytes()
    )
    if pad_to is not None:
        if len(out) > pad_to:
            raise ValueError("pad_to smaller than natural BMP size")
        out += b"\x00" * (pad_to - len(out))
    return out


# --- baseline JPEG (constant-gray; ITU-T T.81) -------------------------------
#
# Constant-color images are the one family baseline JPEG stores EXACTLY with
# an all-ones quant table: every block is DC-only, the DC coefficient
# 8*(v-128) quantizes losslessly, and the orthonormal IDCT reconstructs
# v ± ~1e-13 which np.round snaps back to v. That makes the decoded pixels
# (and their statistics) closed-form for the driver oracle.

def _jpeg_tables() -> tuple:
    """Minimal legal Huffman tables: DC = 12 category symbols at 4 bits each
    (codes 0000..1011; the all-ones code stays unassigned as T.81 Annex C
    requires), AC = the single EOB symbol 0x00 at 1 bit."""
    dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
    dc_vals = bytes(range(12))
    ac_bits = bytes([1] + [0] * 15)
    ac_vals = bytes([0x00])
    return dc_bits, dc_vals, ac_bits, ac_vals


class _BitWriter:
    """MSB-first entropy bit writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int):
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.put(1, 1)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg_const_gray(
    w: int, h: int, v: int, pad_to: int | None = None
) -> bytes:
    """Baseline single-component JPEG of a constant-``v`` w×h image, quant
    table all ones → decodes to exactly ``v`` everywhere. ``pad_to`` sizes a
    COM segment before SOS so the file is exactly that long."""
    dc_bits, dc_vals, ac_bits, ac_vals = _jpeg_tables()
    # canonical code assignment (T.81 Annex C): 12 DC codes of length 4
    dc_codes = {s: (s, 4) for s in range(12)}
    eob_code = (0, 1)

    bw = _BitWriter()
    blocks_x, blocks_y = -(-w // 8), -(-h // 8)
    diff = 8 * (v - 128)
    first = True
    for _ in range(blocks_x * blocks_y):
        d = diff if first else 0
        first = False
        if d == 0:
            s = 0
        else:
            s = abs(d).bit_length()
        code, ln = dc_codes[s]
        bw.put(code, ln)
        if s:
            bits = d if d >= 0 else d + (1 << s) - 1
            bw.put(bits, s)
        bw.put(*eob_code)  # all-zero AC
    bw.align()
    entropy = bytes(bw.out)

    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = _seg(0xC4, bytes([0x00]) + dc_bits + dc_vals) + _seg(
        0xC4, bytes([0x10]) + ac_bits + ac_vals
    )
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    base = (
        2  # SOI
        + len(dqt)
        + len(sof)
        + len(dht)
        + len(sos)
        + len(entropy)
        + 2  # EOI
    )
    com = b""
    if pad_to is not None:
        need = pad_to - base - 4  # COM marker (2) + length field (2)
        if need < 0:
            raise ValueError("pad_to smaller than natural JPEG size")
        com = _seg(0xFE, b"\x00" * need)
    return (
        b"\xff\xd8" + dqt + sof + dht + com + sos + entropy + b"\xff\xd9"
    )


# --- WAV (RIFF) --------------------------------------------------------------


def encode_wav(
    audio_fmt: int,
    channels: int,
    sample_rate: int,
    bits: int,
    data: bytes,
    block_align: int | None = None,
    fmt_ext: bytes = b"",
    fact_n: int | None = None,
    with_list_chunk: bool = False,
) -> bytes:
    """RIFF/WAVE container around raw ``data`` chunk bytes — the engine-side
    forward encoder for :func:`spiderspark.multimodal.decode_wav` (same
    two-job stance as the image encoders above: spec-inverse tests AND the
    closed-form driver fixture :func:`synthetic_wav_df`).

    ``audio_fmt`` is the WAVE format tag (1 PCM, 3 IEEE float, 6 A-law,
    7 µ-law, 0x11 IMA ADPCM). ``fmt_ext`` becomes the fmt-chunk extension
    (cbSize + bytes — ADPCM's wSamplesPerBlock lives here); ``fact_n``
    emits a fact chunk (authoritative decoded-sample count for compressed
    formats). ``with_list_chunk`` inserts an ODD-length LIST chunk before
    data so the decoder's chunk walk + RIFF pad-byte handling is exercised
    on the driver path, not just in pytest."""
    block = block_align if block_align is not None else channels * bits // 8
    byte_rate = sample_rate * block
    fmt_body = struct.pack(
        "<HHIIHH", audio_fmt, channels, sample_rate, byte_rate, block, bits
    )
    if fmt_ext:
        fmt_body += struct.pack("<H", len(fmt_ext)) + fmt_ext

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""  # RIFF pads odd chunks
        return tag + struct.pack("<I", len(body)) + body + pad

    inner = chunk(b"fmt ", fmt_body)
    if with_list_chunk:
        inner += chunk(b"LIST", b"INFOIA\x00")  # odd length: pad exercised
    if fact_n is not None:
        inner += chunk(b"fact", struct.pack("<I", fact_n))
    inner += chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"WAVE" + inner
