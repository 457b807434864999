"""From-scratch JPEG decoder (ITU-T T.81 / ISO 10918-1, public spec):
marker parse → DQT/DHT/SOF/SOS → huffman entropy decode (with byte
unstuffing and RSTn restart handling) → dequantize → de-zigzag → 8x8
IDCT-II (precomputed orthonormal basis, pure numpy matmul) → level shift →
chroma upsample (pixel replication) → YCbCr→RGB (BT.601 as specified in
JFIF). No image library involved anywhere.

Supported: baseline DCT (SOF0), extended-sequential huffman (SOF1 —
identical decode path at 8-bit precision), and PROGRESSIVE huffman (SOF2:
spectral selection + successive approximation per T.81 Annex G — DC
first/refinement scans, per-component AC band scans with EOB runs, and
AC refinement with correction bits); 1- or 3-component, integer-ratio
Hi/Vi sampling factors up to 4 — every component's factor must divide the
frame max, which covers 4:4:4, 4:2:2, 4:2:0, 4:1:1 (fractional-ratio
sampling like Y=3x1/C=2x1 is spec-legal but rejected, because the
replication upsampler would silently mis-stretch it), restart intervals,
8- and 16-bit DQT precision, multi-table DHT/DQT segments, DHT/DQT/DRI
between progressive scans. Rejected as ValueError (callers map to
valid=False, never a crash): arithmetic coding, hierarchical/lossless SOF
families, 12-bit precision, malformed/truncated streams, and images past
the shared 256 MB decoded-pixel budget (multimodal._MAX_PIXEL_BYTES —
dims are attacker-controlled at web scale; rejected BEFORE allocation).

Correctness tier, not throughput tier (same stance as the PNG
Average/Paeth filters): the entropy loop is per-coefficient Python with a
65536-entry fast huffman lookup per table; everything after entropy decode
(dequant, IDCT, upsample, color convert) is vectorized numpy over all
blocks at once. A production pipeline swaps in libjpeg-turbo behind the
SAME decode_image_real seam; the Spark-side plumbing is identical.
"""

from __future__ import annotations

import struct

import numpy as np

# shared with multimodal.py (defined here to avoid a circular import; that
# module asserts equality in its header)
MAX_PIXEL_BYTES = 256 * 1024 * 1024

# --- zigzag: generated from the spec's diagonal walk, not typed in -------


def _zigzag_order() -> np.ndarray:
    """(64,) flat indices: zigzag position k → row-major position."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2 == 0:
            rng = reversed(rng)
        out.extend(r * 8 + (s - r) for r in rng)
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()
_ZZ_LIST = [int(z) for z in _ZIGZAG]  # plain ints for the entropy loops

# --- IDCT basis: A[u, x] = C(u)/2 * cos((2x+1) u pi / 16) ----------------
# spatial = A.T @ F @ A  (orthonormal 2-D inverse DCT-II)
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) spatial samples
    (still centered at 0; caller level-shifts). One batched einsum —
    the entire image's IDCT is two matmuls."""
    return np.einsum("ux,nuv,vy->nxy", _A, coef, _A, optimize=True)


class _HuffTable:
    """Canonical JPEG huffman table with a 16-bit fast lookup: for every
    16-bit window, lookup[window] = (symbol, code_length). Build cost is
    one numpy slice-fill per code; decode cost is one index per symbol."""

    __slots__ = ("lookup_sym", "lookup_len")

    def __init__(self, counts: list[int], symbols: bytes):
        if len(counts) != 16 or sum(counts) != len(symbols):
            raise ValueError("malformed DHT")
        self.lookup_sym = np.zeros(1 << 16, dtype=np.int16)
        self.lookup_len = np.zeros(1 << 16, dtype=np.uint8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if code >= (1 << length):
                    raise ValueError("overfull huffman table")
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                self.lookup_sym[lo:hi] = symbols[k]
                self.lookup_len[lo:hi] = length
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over an already-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                # spec: pad with 1-bits at the end of the segment
                self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed coefficient."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _decode_huff(br: _BitReader, table: _HuffTable) -> int:
    w = br.peek16()
    length = int(table.lookup_len[w])
    if length == 0:
        raise ValueError("invalid huffman code")
    br.skip(length)
    return int(table.lookup_sym[w])


def _split_entropy(buf: bytes, start: int):
    """Entropy-coded bytes from ``start`` → (segments, end_pos).

    Removes 0xFF00 stuffing; splits on RST0-7 markers (segment boundaries
    reset the DC predictors / EOB runs and byte-align); stops at any other
    marker."""
    segments = []
    cur = bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:  # real marker: end of scan
            break
    segments.append(bytes(cur))
    return segments, i


def _check_trailing(br: _BitReader) -> None:
    # the reader buffers up to ~3 bytes ahead of consumed bits, so a
    # correct stream can leave that much "unread"; anything more means
    # the stream and our MCU accounting disagree
    if len(br.data) - br.pos > 4:
        raise ValueError("trailing entropy data in segment")


# --- scan decoders -------------------------------------------------------


def _decode_baseline_scan(segments, order, restart_interval, mcus_x, mcus_y):
    """Sequential single scan (SOF0/SOF1): full 0..63 band, Al=0,
    interleaved MCU walk (or the 1-component walk, where the caller has
    normalized sampling to 1x1 so MCU == data unit)."""
    total_mcus = mcus_x * mcus_y
    mcu_per_seg = restart_interval if restart_interval else total_mcus
    mcu = 0
    seg_idx = 0
    while mcu < total_mcus:
        if seg_idx >= len(segments):
            raise ValueError("entropy data ended early")
        br = _BitReader(segments[seg_idx])
        seg_idx += 1
        pred = {id(c): 0 for c, _d, _a in order}
        for _ in range(min(mcu_per_seg, total_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for c, dtab, atab in order:
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        row = my * c["v"] + v
                        col = mx * c["h"] + h
                        blk = c["coef"][row * c["bx"] + col]
                        t = _decode_huff(br, dtab)
                        if t > 15:
                            raise ValueError("bad DC magnitude")
                        diff = _extend(br.receive(t), t)
                        pred[id(c)] += diff
                        blk[0] = pred[id(c)]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, atab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[_ZZ_LIST[k]] = _extend(br.receive(s), s)
                            k += 1
            mcu += 1
        _check_trailing(br)


def _correction_bit(br, blk, z, p1, m1):
    """AC refinement correction bit for an already-nonzero coefficient
    (T.81 G.1.2.3): a 1-bit appends the next magnitude bit. In-scan
    coefficients are exact multiples of p1, so the two's-complement
    `& p1` test reads the magnitude bit for either sign."""
    if br.receive(1) and not (int(blk[z]) & p1):
        blk[z] += p1 if blk[z] >= 0 else m1


def _ac_first_block(br, atab, blk, ss, se, al, eobrun):
    """One block of an AC first scan (Ah=0): band [Ss, Se] at point
    transform Al, with EOBn run-length codes. Returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, atab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC band overflow")
        blk[_ZZ_LIST[k]] = _extend(br.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, atab, blk, ss, se, al, eobrun):
    """One block of an AC refinement scan (Ah=Al+1): newly-significant
    coefficients arrive with magnitude 1 at bit Al; every already-nonzero
    coefficient crossed on the way contributes one correction bit; EOBn
    covers whole blocks whose remaining history still takes correction
    bits. Returns the new EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, atab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                val = p1 if br.receive(1) else m1
            while k <= se:
                z = _ZZ_LIST[k]
                if blk[z] != 0:
                    _correction_bit(br, blk, z, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("refinement placement past band")
                blk[_ZZ_LIST[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = _ZZ_LIST[k]
            if blk[z] != 0:
                _correction_bit(br, blk, z, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _walk_dc_interleaved(segments, order, restart_interval, mcus_x, mcus_y,
                         ah, al):
    """Progressive DC scan with Ns>1: interleaved MCU walk. First scans
    (Ah=0) decode DC diffs at point transform Al; refinement scans read
    one raw bit per data unit (two's-complement OR works because the
    first scan applied an ARITHMETIC shift to the signed DC value)."""
    total = mcus_x * mcus_y
    per_seg = restart_interval if restart_interval else total
    mcu = 0
    seg_idx = 0
    while mcu < total:
        if seg_idx >= len(segments):
            raise ValueError("entropy data ended early")
        br = _BitReader(segments[seg_idx])
        seg_idx += 1
        pred = {id(c): 0 for c, _d in order}
        for _ in range(min(per_seg, total - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for c, dtab in order:
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        row = my * c["v"] + v
                        col = mx * c["h"] + h
                        blk = c["coef"][row * c["bx"] + col]
                        if ah == 0:
                            t = _decode_huff(br, dtab)
                            if t > 15:
                                raise ValueError("bad DC magnitude")
                            pred[id(c)] += _extend(br.receive(t), t)
                            blk[0] = pred[id(c)] << al
                        elif br.receive(1):
                            blk[0] |= 1 << al
            mcu += 1
        _check_trailing(br)


def _walk_noninterleaved(segments, c, restart_interval, block_fn):
    """Single-component scan walk (T.81 A.2.2): the block grid is the
    component's EFFECTIVE dims (ceil(comp samples / 8), no MCU padding);
    restart intervals count blocks. ``block_fn(br, blk, state)`` decodes
    one data unit; state carries the DC predictor / EOB run, both reset
    at restart boundaries."""
    total = c["ex"] * c["ey"]
    per_seg = restart_interval if restart_interval else total
    b = 0
    seg_idx = 0
    while b < total:
        if seg_idx >= len(segments):
            raise ValueError("entropy data ended early")
        br = _BitReader(segments[seg_idx])
        seg_idx += 1
        state = {"pred": 0, "eobrun": 0}
        for _ in range(min(per_seg, total - b)):
            ey, ex = divmod(b, c["ex"])
            blk = c["coef"][ey * c["bx"] + ex]
            block_fn(br, blk, state)
            b += 1
        _check_trailing(br)


def _decode_progressive_scan(segments, scan, by_id, huff_dc, huff_ac,
                             restart_interval, mcus_x, mcus_y,
                             ss, se, ah, al):
    """Dispatch one progressive scan (T.81 Annex G). DC scans (Ss=Se=0)
    may interleave several components; AC scans are single-component by
    spec. Successive approximation: Ah=0 is a first scan at precision Al;
    otherwise Ah must equal Al+1 and the scan refines one bit."""
    if ah != 0 and ah != al + 1:
        raise ValueError("successive approximation must refine one bit")
    comps = []
    for cs, td, ta in scan:
        c = by_id.get(cs)
        if c is None:
            raise ValueError("SOS references unknown component")
        comps.append((c, td, ta))
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        order = []
        for c, td, _ta in comps:
            dtab = huff_dc.get(td)
            if ah == 0 and dtab is None:
                raise ValueError("SOS references missing huffman table")
            order.append((c, dtab))
        if len(order) > 1:
            _walk_dc_interleaved(
                segments, order, restart_interval, mcus_x, mcus_y, ah, al
            )
        else:
            c, dtab = order[0]

            def dc_unit(br, blk, state):
                if ah == 0:
                    t = _decode_huff(br, dtab)
                    if t > 15:
                        raise ValueError("bad DC magnitude")
                    state["pred"] += _extend(br.receive(t), t)
                    blk[0] = state["pred"] << al
                elif br.receive(1):
                    blk[0] |= 1 << al

            _walk_noninterleaved(segments, c, restart_interval, dc_unit)
    else:
        if len(comps) != 1:
            raise ValueError("AC scan must be single-component")
        if not (ss <= se <= 63):
            raise ValueError("bad spectral band")
        c, _td, ta = comps[0]
        atab = huff_ac.get(ta)
        if atab is None:
            raise ValueError("SOS references missing huffman table")
        fn = _ac_first_block if ah == 0 else _ac_refine_block

        def ac_unit(br, blk, state):
            state["eobrun"] = fn(br, atab, blk, ss, se, al, state["eobrun"])

        _walk_noninterleaved(segments, c, restart_interval, ac_unit)


def decode_jpeg(buf: bytes):
    """→ (width, height, channels, pixels (h, w, c) uint8). Raises
    ValueError on anything outside the supported huffman-DCT subset
    (baseline, extended-sequential, progressive)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    sof = None
    progressive = False
    restart_interval = 0
    geom = None  # (width, height, nf, hmax, vmax, mcus_x, mcus_y, by_id)
    scans_done = 0
    i = 2
    n = len(buf)
    while i + 4 <= n:
        if buf[i] != 0xFF:
            raise ValueError("marker expected")
        marker = buf[i + 1]
        if marker == 0xFF:  # fill
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", buf, i + 2)
        if seglen < 2 or i + 2 + seglen > n:
            raise ValueError("truncated segment")
        data = buf[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(data, np.uint8, 64, p).astype(
                        np.float64
                    )
                    p += 64
                elif pq == 1:
                    vals = (
                        np.frombuffer(data, np.uint8, 128, p)
                        .reshape(64, 2)
                        .astype(np.float64)
                    )
                    vals = vals[:, 0] * 256 + vals[:, 1]
                    p += 128
                else:
                    raise ValueError("bad DQT precision")
                q = np.zeros(64, dtype=np.float64)
                q[_ZIGZAG] = vals
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(data):
                tc, th = data[p] >> 4, data[p] & 0x0F
                counts = list(data[p + 1 : p + 17])
                total = sum(counts)
                symbols = data[p + 17 : p + 17 + total]
                p += 17 + total
                table = _HuffTable(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 ext-seq huffman / SOF2 progressive
            if sof is not None:
                raise ValueError("multiple SOF segments")
            progressive = marker == 0xC2
            prec, height, width, nf = struct.unpack_from(">BHHB", data, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nf not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG supported")
            if width == 0 or height == 0:
                raise ValueError("bad dimensions")
            out_ch = 3 if nf == 3 else 1
            if width * height * out_ch > MAX_PIXEL_BYTES:
                raise ValueError("image exceeds decode pixel budget")
            comps = []
            for k in range(nf):
                cid, hv, tq = struct.unpack_from(">BBB", data, 6 + 3 * k)
                h_i, v_i = hv >> 4, hv & 0x0F
                if not (1 <= h_i <= 4 and 1 <= v_i <= 4):
                    raise ValueError("bad sampling factor")
                comps.append({"id": cid, "h": h_i, "v": v_i, "tq": tq})
            if nf == 1:
                # single-component file: scans are non-interleaved, the
                # MCU is one data unit and sampling factors play no role
                comps[0]["h"] = comps[0]["v"] = 1
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                # the replication upsampler needs INTEGER ratios; spec-legal
                # fractional sampling (e.g. Y 3x1 with chroma 2x1) would
                # otherwise decode silently-wrong pixels — reject instead
                # (the module's "ValueError, never wrong data" contract)
                if hmax % c["h"] != 0 or vmax % c["v"] != 0:
                    raise ValueError(
                        "non-integer-ratio chroma sampling unsupported"
                    )
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            for c in comps:
                # MCU-padded coefficient store; ex/ey are the EFFECTIVE
                # block dims a non-interleaved scan covers (A.2.2)
                c["bx"] = mcus_x * c["h"]
                c["by"] = mcus_y * c["v"]
                comp_w = -(-(width * c["h"]) // hmax)
                comp_h = -(-(height * c["v"]) // vmax)
                c["ex"] = -(-comp_w // 8)
                c["ey"] = -(-comp_h // 8)
                c["coef"] = np.zeros((c["by"] * c["bx"], 64), dtype=np.int64)
            sof = (width, height, comps)
            geom = (hmax, vmax, mcus_x, mcus_y,
                    {c["id"]: c for c in comps})
        elif marker in (
            0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        ):
            raise ValueError("unsupported SOF family")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = data[0]
            if len(data) < 4 + 2 * ns:
                raise ValueError("truncated SOS")
            scan = []
            for k in range(ns):
                cs, tdta = struct.unpack_from(">BB", data, 1 + 2 * k)
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            ss = data[1 + 2 * ns]
            se = data[2 + 2 * ns]
            ahal = data[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segments, i = _split_entropy(buf, i)
            hmax, vmax, mcus_x, mcus_y, by_id = geom
            width, height, comps = sof
            if progressive:
                _decode_progressive_scan(
                    segments, scan, by_id, huff_dc, huff_ac,
                    restart_interval, mcus_x, mcus_y, ss, se, ah, al,
                )
            else:
                if scans_done:
                    raise ValueError(
                        "multi-scan sequential JPEG unsupported"
                    )
                if len(scan) != len(comps):
                    raise ValueError(
                        "sequential scan must cover all components"
                    )
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("bad sequential scan header")
                order = []
                for cs, td, ta in scan:
                    c = by_id.get(cs)
                    if c is None:
                        raise ValueError("SOS references unknown component")
                    if td not in huff_dc or ta not in huff_ac:
                        raise ValueError(
                            "SOS references missing huffman table"
                        )
                    order.append((c, huff_dc[td], huff_ac[ta]))
                _decode_baseline_scan(
                    segments, order, restart_interval, mcus_x, mcus_y
                )
            scans_done += 1
        # APPn / COM / anything else with a length: skipped
    if sof is None or scans_done == 0:
        raise ValueError("missing SOF/SOS")
    width, height, comps = sof
    nf = len(comps)
    hmax, vmax = geom[0], geom[1]
    out_ch = 3 if nf == 3 else 1

    # vectorized tail: dequant + IDCT + assemble planes
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("component references missing quant table")
        q = qt[c["tq"]].reshape(64)
        coef = (c["coef"].astype(np.float64) * q).reshape(-1, 8, 8)
        spatial = _idct_blocks(coef) + 128.0
        blocks = spatial.reshape(c["by"], c["bx"], 8, 8)
        plane = blocks.transpose(0, 2, 1, 3).reshape(c["by"] * 8, c["bx"] * 8)
        # upsample to full resolution by pixel replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:height, :width])
    if nf == 1:
        px = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, px[:, :, None]
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    px = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, px


def jpeg_header_meta(buf: bytes):
    """Header-only (w, h, channels, valid) for the metadata path: walks
    markers to SOF0/SOF1/SOF2 without touching entropy data. Arithmetic /
    hierarchical / lossless SOF families → valid=False (same subset the
    pixel decoder accepts), mirroring image_header_meta's shallow-validity
    contract."""
    if buf[:2] != b"\xff\xd8":
        return 0, 0, 0, False
    i = 2
    n = len(buf)
    try:
        while i + 4 <= n:
            if buf[i] != 0xFF:
                return 0, 0, 0, False
            marker = buf[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS before SOF → malformed
                return 0, 0, 0, False
            (seglen,) = struct.unpack_from(">H", buf, i + 2)
            if seglen < 2 or i + 2 + seglen > n:
                return 0, 0, 0, False
            if marker in (0xC0, 0xC1, 0xC2):
                prec, height, width, nf = struct.unpack_from(
                    ">BHHB", buf, i + 4
                )
                out_ch = 3 if nf == 3 else 1
                ok = (
                    prec == 8
                    and nf in (1, 3)
                    and width > 0
                    and height > 0
                    and width * height * out_ch <= MAX_PIXEL_BYTES
                    and seglen >= 8 + 3 * nf
                )
                if ok and nf == 3:
                    # mirror the pixel decoder's integer-ratio sampling
                    # subset (it rejects fractional ratios as ValueError)
                    hs = [buf[i + 11 + 3 * k] >> 4 for k in range(nf)]
                    vs = [buf[i + 11 + 3 * k] & 0x0F for k in range(nf)]
                    ok = all(1 <= x <= 4 for x in hs + vs) and all(
                        max(hs) % x == 0 for x in hs
                    ) and all(max(vs) % x == 0 for x in vs)
                return (width, height, out_ch, True) if ok else (0, 0, 0, False)
            if marker in (
                0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                0xCE, 0xCF,
            ):
                return 0, 0, 0, False  # arithmetic / unsupported family
            i += 2 + seglen
    except struct.error:
        return 0, 0, 0, False
    return 0, 0, 0, False
