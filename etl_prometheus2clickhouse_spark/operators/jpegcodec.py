"""Baseline JPEG (ITU-T T.81) decode in stdlib + numpy — the JPEG face
of the real-decode layer (engine extension; see operators/multimodal.py).

JPEG is a fully public format (ITU-T Rec. T.81 / ISO 10918-1: marker
segments, Huffman entropy coding, 8x8 DCT blocks, Annex F decode
procedures), so — like the PNG and WAV paths — real JPEG decode need
not gate on an optional codec package: this module lets
``decode_images(mode="real")`` EXECUTE on baseline JPEGs, byte-pinned,
in codec-less environments like this repo's own container. Pillow
remains the production path for everything outside the supported
subset (progressive SOF2, arithmetic coding, 12-bit precision, hier-
archical) — those raise :class:`UnsupportedJpeg` to trigger the
fallback, while malformed streams raise ValueError as themselves
(same fail-as-yourself contract as ``_decode_png_stdlib``).

Supported subset (the overwhelmingly common one):

- baseline sequential DCT (SOF0) and extended sequential (SOF1),
  8-bit precision, Huffman entropy coding;
- 1-component grayscale and 3-component YCbCr with sampling factors
  up to 2x2 (4:4:4 / 4:2:2 / 4:2:0; chroma upsampled by sample
  replication);
- restart intervals (DRI + RSTn, DC predictor reset);
- arbitrary DHT/DQT tables (the decoder is table-driven — nothing is
  hardwired to the Annex K examples).

The module also ships a deterministic DC-only *encoder*
(:func:`encode_jpeg_dc`): every 8x8 block carries only its quantized
DC coefficient, so with Q[0,0] = 8 the decoded block is exactly the
flat value ``dc + 128`` (IDCT of a DC-only block is constant
``S00 / 8``; the level shift adds 128) — which makes distributed
decode verifiable against an exact SQL oracle, the same trick the WAV
path uses (plans/catalog.py: q_decode_audio_wav). The encoder emits
a fully valid baseline JPEG (SOI/DQT/SOF0/DHT/SOS/EOI, byte stuffing,
optional restart markers), so it doubles as the fixture generator for
the general decoder's tests.

Reference parity note: the reference ETL has no media layer at all;
this module belongs to the LLM-training-data extension surface
(multimodal columns), same as operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "UnsupportedJpeg",
    "decode_jpeg_baseline",
    "encode_jpeg_dc",
]


class UnsupportedJpeg(ValueError):
    """A well-formed JPEG outside the built-in decoder's subset
    (progressive, arithmetic-coded, 12-bit, hierarchical) — falls back
    to Pillow where installed."""


# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

# Zig-zag order: _ZIGZAG[k] = (row, col) of the k-th coefficient in a
# DQT segment / entropy-coded block (T.81 Figure 5).
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


def _idct_basis() -> np.ndarray:
    """M[u, x] = 0.5 * C(u) * cos((2x+1) u pi / 16), so the 2-D inverse
    DCT of coefficient block S is ``M.T @ S @ M`` (T.81 A.3.3)."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_IDCT_M = _idct_basis()


def _build_huff_lookup(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman table (T.81 C.2): {(length, code) -> symbol}."""
    out: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("DHT: fewer symbols than BITS counts")
            out[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("DHT: more symbols than BITS counts")
    return out


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-coded-segment bit reader: handles 0xFF00 byte stuffing
    and stops (without consuming) at any real marker (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG entropy stream truncated at 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed 0xFF data byte
                self.pos += 2
            else:  # a real marker terminates the segment
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def decode_huff(self, table: dict) -> int:
        length = 0
        code = 0
        for _ in range(16):
            code = (code << 1) | self.read_bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code (no match within 16 bits)")

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker (F.2.1.3.1)."""
        self.buf = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG truncated at restart boundary")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + n:
            raise ValueError(
                f"expected RST{n} marker at offset {self.pos}, found "
                f"{self.data[self.pos]:02X}{self.data[self.pos + 1]:02X}"
            )
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s received bits to a signed value."""
    if s == 0:
        return 0
    if v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _decode_block(
    r: _BitReader,
    dc_table: dict,
    ac_table: dict,
    qtab: np.ndarray,
    pred: int,
) -> tuple[np.ndarray, int]:
    """Decode one 8x8 block: Huffman DC diff + AC run/size pairs,
    dequantize, de-zigzag (T.81 F.2.2.1/F.2.2.2)."""
    coef = np.zeros((8, 8), dtype=np.float64)
    s = r.decode_huff(dc_table)
    if s > 11:
        raise ValueError(f"DC category {s} out of range")
    diff = _extend(r.read_bits(s), s)
    dc = pred + diff
    coef[0, 0] = dc * qtab[0, 0]
    k = 1
    while k < 64:
        rs = r.decode_huff(ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run overflows block")
        zr, zc = _ZIGZAG[k]
        coef[zr, zc] = _extend(r.read_bits(size), size) * qtab[zr, zc]
        k += 1
    return coef, dc


def decode_jpeg_baseline(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline/extended-sequential Huffman JPEG.

    Returns ``(width, height, channels, pixels)`` with pixels
    row-major, interleaved for 3-channel (RGB after the JFIF YCbCr
    conversion), matching the Pillow ``tobytes()`` layout the rest of
    the decode layer uses. Raises :class:`UnsupportedJpeg` for
    well-formed-but-outside-subset streams, plain ValueError for
    malformed ones.
    """
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> lookup
    restart_interval = 0
    frame = None  # (height, width, comps) comps: [(cid, h, v, tq)]

    while True:
        if pos + 4 > len(data):
            raise ValueError("JPEG truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # SOI / TEM / RSTn carry no length field
        if marker == 0xD9:
            raise ValueError("JPEG ended (EOI) before SOS")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq not in (0, 1):
                    raise ValueError("DQT precision flag invalid")
                n = 64 * (2 if pq else 1)
                if p + n > len(seg):
                    raise ValueError("DQT table truncated")
                q = np.zeros((8, 8), dtype=np.float64)
                for k in range(64):
                    v = (
                        struct.unpack(">H", seg[p + 2 * k : p + 2 * k + 2])[0]
                        if pq
                        else seg[p + k]
                    )
                    zr, zc = _ZIGZAG[k]
                    q[zr, zc] = v
                qtabs[tq] = q
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nsym = sum(bits)
                vals = seg[p + 17 : p + 17 + nsym]
                huff[(tc, th)] = _build_huff_lookup(bits, vals)
                p += 17 + nsym
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            precision = seg[0]
            if precision != 8:
                raise UnsupportedJpeg(f"{precision}-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            nf = seg[5]
            comps = []
            for i in range(nf):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise UnsupportedJpeg("progressive DCT (SOF2)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(f"SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            sos_seg = seg
            pos += seglen
            break
        # APPn / COM / anything else: skip
        pos += seglen

    if frame is None:
        raise ValueError("JPEG missing SOF before SOS")
    height, width, comps = frame
    if height == 0 or width == 0:
        raise UnsupportedJpeg("DNL-deferred dimensions")
    if len(comps) not in (1, 3):
        raise UnsupportedJpeg(f"{len(comps)}-component JPEG")

    sos = sos_seg
    ns = sos[0]
    if ns != len(comps):
        raise UnsupportedJpeg("non-interleaved multi-scan JPEG")
    scan_tables = {}
    for i in range(ns):
        cs, tdta = sos[1 + 2 * i], sos[2 + 2 * i]
        scan_tables[cs] = (tdta >> 4, tdta & 0x0F)

    if ns == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — one
        # data unit per MCU, in raster order over the component's own
        # ceil(w/8) x ceil(h/8) block grid, regardless of the sampling
        # factors the frame header declares (those only have meaning
        # relative to other components). Forcing effective 1x1 sampling
        # reproduces exactly that grid; decoding such a stream through
        # the interleaved-MCU path below would silently scramble block
        # placement whenever the declared factors exceed 1x1 and the
        # dimensions are MCU-multiples (round-9 advice, jpegcodec:330).
        cid0, _, _, tq0 = comps[0]
        comps = [(cid0, 1, 1, tq0)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        raise UnsupportedJpeg(f"sampling factors {hmax}x{vmax}")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    planes = []
    for cid, ch, cv, tq in comps:
        if tq not in qtabs:
            raise ValueError(f"component {cid} references missing DQT {tq}")
        planes.append(np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), np.float64))

    r = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst_n = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_and_expect_rst(rst_n)
                rst_n = (rst_n + 1) % 8
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                if cid not in scan_tables:
                    raise ValueError(f"SOS missing component {cid}")
                td, ta = scan_tables[cid]
                dc_t, ac_t = huff.get((0, td)), huff.get((1, ta))
                if dc_t is None or ac_t is None:
                    raise ValueError("SOS references missing DHT")
                for v in range(cv):
                    for hh in range(ch):
                        coef, preds[ci] = _decode_block(
                            r, dc_t, ac_t, qtabs[tq], preds[ci]
                        )
                        px = _IDCT_M.T @ coef @ _IDCT_M
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    # Level shift, upsample to full resolution, crop.
    full = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        p = plane + 128.0
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:height, :width])

    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()

    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()


# ---------------------------------------------------------------------------
# DC-only encoder (fixture generator / oracle-exact synthesis)
# ---------------------------------------------------------------------------

# Minimal valid Huffman tables for the encoder's own streams (the
# decoder is table-driven, so these exercise the same machinery as the
# Annex K examples without transcribing 162 AC symbols): DC = twelve
# categories, all 4-bit codes (Kraft 12/16, all-ones code unused);
# AC = EOB alone at 2 bits.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_BITS = [0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = bytes([0x00])  # EOB
# Extended AC table for streams that carry one real AC coefficient
# (EOB + run-0 sizes 1..10, all 4-bit codes — Kraft 11/16): selected
# only when ac01_planes is given, so DC-only streams stay byte-
# identical to earlier encoder output.
_ENC_AC_EXT_BITS = [0, 0, 0, 11, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_EXT_VALS = bytes([0x00] + list(range(0x01, 0x0B)))


def _enc_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code) for the encoder side."""
    lookup = _build_huff_lookup(bits, vals)
    return {sym: (length, code) for (length, code), sym in lookup.items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per F.1.2.3


def encode_jpeg_dc(
    dc_planes: list[np.ndarray],
    q00: int = 8,
    restart_interval: int = 0,
    ac01_planes: list[np.ndarray] | None = None,
) -> bytes:
    """Emit a valid baseline JPEG whose every 8x8 block carries only a
    quantized DC coefficient (plus, optionally, ONE AC coefficient).

    ``dc_planes`` is 1 (grayscale) or 3 (YCbCr, 4:4:4) int arrays of
    shape (blocks_y, blocks_x), entries in [-128, 127]; the image is
    ``8*blocks_x x 8*blocks_y``. With the default ``q00=8`` a decoder
    reconstructs each block as the exact flat value ``dc + 128``
    (grayscale) — integral, so float IDCT rounding is unambiguous and
    an SQL oracle can restate the full pixel buffer. Optional
    ``restart_interval`` (in MCUs) emits DRI + cycling RSTn markers to
    exercise the decoder's restart path.

    ``ac01_planes`` (same shapes as ``dc_planes``, entries in
    [-1023, 1023] excluding magnitudes needing >10 bits) additionally
    writes each block's quantized S(0,1) coefficient — the first
    zig-zag AC slot — driving the decoder's Huffman AC run/size path.
    The IDCT of a {DC, S(0,1)} block is closed-form: with the default
    quantizer (Q(0,1) = 16) pixel (y, x) is

        dc + 128 + ac * 16 * cos((2x+1)·π/16) / (4·√2)

    — constant down each column, an 8-value row ramp — so the decoded
    buffer is still exactly statable in SQL (plans/catalog.py:
    q_decode_jpeg_ac). Omitted (None), the emitted bytes are identical
    to the DC-only encoder of earlier rounds (the EOB-only AC table is
    kept for that case).
    """
    if len(dc_planes) not in (1, 3):
        raise ValueError("encode_jpeg_dc takes 1 or 3 planes")
    shapes = {p.shape for p in dc_planes}
    if len(shapes) != 1:
        raise ValueError("all planes must share one block grid (4:4:4)")
    by, bx = dc_planes[0].shape
    if by == 0 or bx == 0:
        raise ValueError("empty block grid")
    for p in dc_planes:
        if int(p.max()) > 127 or int(p.min()) < -128:
            raise ValueError("DC values must lie in [-128, 127]")
    if ac01_planes is not None:
        if len(ac01_planes) != len(dc_planes):
            raise ValueError("ac01_planes must match dc_planes count")
        if {p.shape for p in ac01_planes} != shapes:
            raise ValueError("ac01_planes must share dc_planes' grid")
        for p in ac01_planes:
            if int(np.abs(p).max()) > 1023:
                raise ValueError("AC(0,1) values must lie in [-1023, 1023]")
    w, h = bx * 8, by * 8
    ncomp = len(dc_planes)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: table 0, zigzag order — slot 0 is q00, the rest 16.
    q = bytearray([16] * 64)
    q[0] = q00
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + bytes(q)
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # 1x1 sampling, DQT 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC class 0 id 0, AC class 1 id 0
    ac_bits = _ENC_AC_EXT_BITS if ac01_planes is not None else _ENC_AC_BITS
    ac_vals = _ENC_AC_EXT_VALS if ac01_planes is not None else _ENC_AC_VALS
    dht = (
        bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + bytes([0x10]) + bytes(ac_bits) + ac_vals
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _enc_codes(ac_bits, ac_vals)
    eob_len, eob_code = ac_codes[0x00]

    wtr = _BitWriter()
    preds = [0] * ncomp
    rst_n = 0
    mcu = 0
    for y in range(by):
        for x in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                dc = int(dc_planes[ci][y, x])
                diff = dc - preds[ci]
                preds[ci] = dc
                mag = abs(diff)
                s = mag.bit_length()
                clen, code = dc_codes[s]
                wtr.write(code, clen)
                if s:
                    bits = diff if diff >= 0 else diff + (1 << s) - 1
                    wtr.write(bits, s)
                if ac01_planes is not None:
                    ac = int(ac01_planes[ci][y, x])
                    if ac:
                        # run/size symbol (run 0) + value bits for the
                        # k=1 zig-zag slot — S(0,1) (T.81 F.1.2.2)
                        sa = abs(ac).bit_length()
                        alen, acode = ac_codes[sa]  # symbol 0x0s
                        wtr.write(acode, alen)
                        abits = ac if ac >= 0 else ac + (1 << sa) - 1
                        wtr.write(abits, sa)
                wtr.write(eob_code, eob_len)
            mcu += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
