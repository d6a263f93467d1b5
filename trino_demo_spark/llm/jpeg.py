"""Baseline JPEG codec (ITU-T T.81, public spec) — grayscale, pure
stdlib + numpy block DCT. Closes the JPEG half of the multimodal image
stubs the same way the PNG/PPM/WAV kernels were closed: a REAL
encoder + decoder pair exercised end-to-end through mapInPandas
(multimodal.jpeg_roundtrip_features), with the lossy-codec twist that
the driver surface is a TOLERANCE VERDICT rather than a bit-exact
feature compare (quantization makes decoded != source by design, so a
DuckDB oracle cannot recompute pixel features from the source formula;
it checks the exact dims/byte counts plus boolean error-bound verdicts
instead — the llm_dedup_minhash verdict pattern).

Scope (declared, like every kernel contract in multimodal.py):
- ENCODER: baseline sequential DCT, 8-bit, single (luma) component,
  quality-scaled Annex-K luminance quantization table, custom
  fixed-length Huffman tables (DC: all 4-bit, AC: all 9-bit). Custom
  tables are spec-legal — JPEG Huffman tables are STREAM-DECLARED in
  DHT segments, and canonical fixed-length specs satisfy T.81 C.2
  (no code is all-ones, Kraft sum < 1) — chosen over transcribing the
  162-entry Annex-K AC table, which would be an untestable-by-parts
  constant; any standards-compliant decoder reads these files.
- DECODER: general baseline single-component: parses DQT/DHT/SOF0/SOS
  from the stream (NOT hardwired to this encoder's tables), handles
  byte unstuffing, huffman-decodes DC diffs + AC run-lengths,
  dequantizes, inverse-zigzags, IDCTs, clamps, crops edge padding.
- NOT supported, per the module error contract (NotImplementedError,
  never a raw struct/index error): progressive (SOF2) and every
  non-SOF0 frame type, multi-component (color) scans, restart
  intervals (DRI/RSTn), 16-bit quant tables, arithmetic coding.
  Color JPEG stays a declared stub — PPM/PNG carry the color-decode
  parity load.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 luminance quantization table (public constants).
_LUMA_Q = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)


def _quant_table(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex-K table (public formula)."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (_LUMA_Q * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _zigzag() -> "list[int]":
    cells = [(r, c) for r in range(8) for c in range(8)]
    cells.sort(
        key=lambda rc: (
            rc[0] + rc[1],
            rc[0] if (rc[0] + rc[1]) % 2 else -rc[0],
        )
    )
    return [r * 8 + c for r, c in cells]


_ZIGZAG = _zigzag()  # position k -> flat row-major index


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    c = np.cos(np.pi * (2 * n[None, :] + 1) * n[:, None] / 16) * np.sqrt(0.25)
    c[0] *= np.sqrt(0.5)
    return c


_C = _dct_matrix()

# Custom canonical Huffman specs (BITS counts per code length 1..16,
# then symbol values in order). DC: 12 size-symbols, all 4-bit codes;
# AC: EOB + ZRL + (run 0..15 x size 1..10), all 9-bit codes.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: "list[int]", vals: "list[int]"):
    """T.81 C.2 canonical code assignment: {symbol: (code, length)}."""
    codes = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.acc
                self.buf.append(b)
                if b == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            b = self.acc
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.nbits = 0


def _magnitude(v: int) -> "tuple[int, int]":
    """(size, bits) per T.81 F.1.2.1: negatives encode as v-1 in the
    low `size` bits (one's-complement style)."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, quality: int = 90
) -> bytes:
    """Baseline grayscale JPEG writer. `pixels` is row-major 8-bit
    luma, len == width*height. Edge-replicates to 8x8 block multiples
    (the decoder crops back)."""
    if len(pixels) != width * height:
        raise ValueError("len(pixels) must be width*height")
    qt = _quant_table(quality)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bh = (height + 7) // 8 * 8
    bw_ = (width + 7) // 8 * 8
    padded = np.empty((bh, bw_), dtype=np.float64)
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]
    padded[:, width:] = padded[:, width - 1 : width]

    w = _BitWriter()
    prev_dc = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw_, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coefs = _C @ block @ _C.T
            q = np.round(coefs / qt).astype(np.int64)
            # AC size caps at 10 in the symbol alphabet; clamping is a
            # (lossy) spec-alphabet bound, like every real encoder's
            # quant floor at those frequencies
            zz = [int(q.flat[_ZIGZAG[k]]) for k in range(64)]
            zz[1:] = [max(-1023, min(1023, v)) for v in zz[1:]]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size, bits = _magnitude(diff)
            code, length = _DC_CODES[size]
            w.write(code, length)
            if size:
                w.write(bits, size)
            run = 0
            for k in range(1, 64):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c0, l0 = _AC_CODES[0xF0]
                    w.write(c0, l0)
                    run -= 16
                size, bits = _magnitude(v)
                c0, l0 = _AC_CODES[(run << 4) | size]
                w.write(c0, l0)
                w.write(bits, size)
                run = 0
            if run:
                c0, l0 = _AC_CODES[0x00]  # EOB
                w.write(c0, l0)
    w.flush()

    dqt = bytes([0x00]) + bytes(int(qt.flat[_ZIGZAG[k]]) for k in range(64))
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xDB, dqt)
        + _seg(0xC0, sof0)
        + _seg(0xC4, dht)
        + _seg(0xDA, sos)
        + bytes(w.buf)
        + b"\xff\xd9"
    )


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; raises the
    declared contract error on truncation or an unexpected marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.done = False

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise NotImplementedError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise NotImplementedError("truncated JPEG entropy stream")
            m = self.data[self.pos]
            if m == 0x00:
                self.pos += 1
            elif m == 0xD9:  # EOI reached while bits still requested
                raise NotImplementedError("truncated JPEG entropy stream")
            elif 0xD0 <= m <= 0xD7:
                raise NotImplementedError(
                    "JPEG restart markers not supported"
                )
            else:
                raise NotImplementedError(
                    f"unexpected marker 0xFF{m:02X} inside entropy data"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        v = (self.acc >> self.nbits) & 1
        # drop the consumed high bits — without this mask the bigint
        # accumulator grows by 8 bits per entropy byte and the decode
        # goes quadratic in stream size (measured 14.5× for 4× pixels)
        self.acc &= (1 << self.nbits) - 1
        return v

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _read_huff(reader: "_BitReader", table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: decode a magnitude-category value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_gray(payload: bytes) -> dict:
    """Baseline single-component JPEG decode. Returns
    {width, height, channels: 1, pixels}. Tables are parsed from the
    stream; see the module docstring for the declared scope and the
    NotImplementedError contract."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG stream (missing SOI)")
    pos = 2
    qtabs: dict = {}
    htabs: dict = {}
    sof = None
    comp_q = 0
    dc_id = ac_id = 0
    while True:
        if pos + 4 > len(payload):
            raise NotImplementedError("truncated JPEG header")
        if payload[pos] != 0xFF:
            raise NotImplementedError("JPEG marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise NotImplementedError("JPEG has no scan (EOI before SOS)")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise NotImplementedError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                if p + 65 > len(seg):
                    raise NotImplementedError("truncated JPEG DQT segment")
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit JPEG quant tables not supported"
                    )
                t = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    t[_ZIGZAG[k]] = seg[p + 1 + k]
                qtabs[tq] = t.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise NotImplementedError("truncated JPEG DHT segment")
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                if len(vals) != nvals:
                    raise NotImplementedError("truncated JPEG DHT segment")
                table = {}
                code = 0
                i = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[i]
                        code += 1
                        i += 1
                    code <<= 1
                htabs[(tc, th)] = table
                p += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 9:  # 6 header bytes + >=1 component spec
                raise NotImplementedError("truncated JPEG SOF0 segment")
            prec, h, w_, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if ncomp != 1:
                raise NotImplementedError(
                    "color JPEG not supported (declared stub — "
                    "PPM/PNG carry the color parity load)"
                )
            comp_q = seg[8]
            sof = (w_, h)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            raise NotImplementedError("JPEG restart intervals not supported")
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise NotImplementedError("JPEG SOS before SOF0")
            if len(seg) < 6:  # ncomp + 1 comp spec + spectral bytes
                raise NotImplementedError("truncated JPEG SOS segment")
            if seg[0] != 1:
                raise NotImplementedError(
                    "multi-component JPEG scan not supported"
                )
            dc_id, ac_id = seg[2] >> 4, seg[2] & 0xF
            pos += seglen
            break
        # APPn / COM / anything else: skip
        pos += seglen

    w_, h = sof
    if (0, dc_id) not in htabs or (1, ac_id) not in htabs or comp_q not in qtabs:
        raise NotImplementedError("JPEG scan references missing tables")
    dc_tab, ac_tab = htabs[(0, dc_id)], htabs[(1, ac_id)]
    qt = qtabs[comp_q]
    bh = (h + 7) // 8 * 8
    bw_ = (w_ + 7) // 8 * 8
    out = np.zeros((bh, bw_), dtype=np.float64)
    reader = _BitReader(payload, pos)
    prev_dc = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw_, 8):
            zz = [0] * 64
            size = _read_huff(reader, dc_tab)
            prev_dc += _extend(reader.bits(size), size)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = _read_huff(reader, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise NotImplementedError(
                        "JPEG AC run overflows the block"
                    )
                zz[k] = _extend(reader.bits(size), size)
                k += 1
            coefs = np.zeros(64, dtype=np.float64)
            for i in range(64):
                coefs[_ZIGZAG[i]] = zz[i]
            block = _C.T @ (coefs.reshape(8, 8) * qt) @ _C
            out[by : by + 8, bx : bx + 8] = block + 128.0
    pixels = np.clip(np.round(out[:h, :w_]), 0, 255).astype(np.uint8)
    return {
        "width": w_,
        "height": h,
        "channels": 1,
        "pixels": pixels.tobytes(),
    }
