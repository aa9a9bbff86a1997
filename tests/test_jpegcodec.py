"""Baseline JPEG codec: encoder/decoder round trips, spec edge cases,
the mode="real" routing in decode_images, and the oracle fixture shape.

The decoder is table-driven T.81 (operators/jpegcodec.py); the DC-only
encoder gives exact expected pixels (flat blocks of ``dc + 128`` with
Q00=8), so every assertion here is byte-for-byte, no tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.jpegcodec import (
    UnsupportedJpeg,
    decode_jpeg_baseline,
    encode_jpeg_dc,
)
from etl_prometheus2clickhouse_spark.operators.multimodal import (
    decode_images,
)


def _flat_expected(dc: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(dc + 128, 8, 0), 8, 1).astype(np.uint8)


def test_gray_roundtrip_exact():
    dc = np.array([[10, -20, 0], [127, -128, 64]])
    w, h, ch, px = decode_jpeg_baseline(encode_jpeg_dc([dc]))
    assert (w, h, ch) == (24, 16, 1)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(h, w), _flat_expected(dc)
    )


def test_pinned_bytes_and_pixels():
    """Both directions pinned: the encoder's exact output bytes for a
    fixed grid, and the decoder's exact pixels for those bytes — a
    regression trap for either side drifting."""
    dc = np.array([[1, -1], [100, -100]])
    data = encode_jpeg_dc([dc])
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    import hashlib

    assert hashlib.md5(data).hexdigest() == (
        # frozen at introduction time; the round-trip tests prove the
        # bytes are a *valid* JPEG, the pin proves they are *these*
        # bytes — either codec side drifting breaks it
        "253ba94ae48bcde0172fc4d87eccabc0"
    ), "encoder byte stream drifted"
    w, h, ch, px = decode_jpeg_baseline(data)
    assert np.array_equal(
        np.frombuffer(px, np.uint8).reshape(16, 16), _flat_expected(dc)
    )


def test_restart_intervals_reset_predictors():
    rng = np.random.default_rng(42)
    dc = rng.integers(-128, 128, (4, 5))
    plain = decode_jpeg_baseline(encode_jpeg_dc([dc]))
    for interval in (1, 2, 3, 7):
        with_rst = decode_jpeg_baseline(
            encode_jpeg_dc([dc], restart_interval=interval)
        )
        assert with_rst == plain


def test_color_444_ycbcr_to_rgb():
    rng = np.random.default_rng(7)
    planes = [rng.integers(-128, 128, (2, 3)) for _ in range(3)]
    w, h, ch, px = decode_jpeg_baseline(encode_jpeg_dc(planes))
    assert (w, h, ch) == (24, 16, 3)
    y, cb, cr = [
        np.repeat(np.repeat(p + 128.0, 8, 0), 8, 1) for p in planes
    ]
    exp = np.clip(
        np.round(
            np.stack(
                [
                    y + 1.402 * (cr - 128.0),
                    y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                    y + 1.772 * (cb - 128.0),
                ],
                axis=-1,
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(np.frombuffer(px, np.uint8).reshape(16, 24, 3), exp)


def test_fuzz_roundtrip_many_grids():
    rng = np.random.default_rng(1234)
    for _ in range(30):
        by, bx = rng.integers(1, 7, 2)
        dc = rng.integers(-128, 128, (int(by), int(bx)))
        ri = int(rng.integers(0, 5))
        w, h, ch, px = decode_jpeg_baseline(
            encode_jpeg_dc([dc], restart_interval=ri)
        )
        assert (w, h, ch) == (int(bx) * 8, int(by) * 8, 1)
        assert np.array_equal(
            np.frombuffer(px, np.uint8).reshape(h, w), _flat_expected(dc)
        )


def test_rejects_malformed_as_valueerror():
    good = encode_jpeg_dc([np.array([[5]])])
    with pytest.raises(ValueError):
        decode_jpeg_baseline(b"\x00\x01")  # no SOI
    with pytest.raises(ValueError):
        decode_jpeg_baseline(good[:10])  # cut inside DQT
    with pytest.raises(ValueError):
        decode_jpeg_baseline(good[:-4])  # entropy stream truncated
    # corrupt the DHT symbol counts: more symbols than BITS allow
    bad = bytearray(good)
    dht = bad.find(b"\xff\xc4")
    # BITS layout: marker(2) len(2) TcTh(1) then 16 counts; the DC
    # table's twelve length-4 codes sit at counts[3] = dht + 8
    assert bad[dht + 8] == 12
    bad[dht + 8] = 0  # now HUFFVAL has more symbols than BITS admits
    with pytest.raises(ValueError):
        decode_jpeg_baseline(bytes(bad))


def test_unsupported_flavors_raise_unsupported():
    good = encode_jpeg_dc([np.array([[5]])])
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)  # SOF0 -> SOF2
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg_baseline(prog)
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)  # arithmetic SOF
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg_baseline(arith)
    # 12-bit precision flag inside an otherwise-valid SOF0
    bad = bytearray(good)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 4] = 12
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg_baseline(bytes(bad))


def test_chroma_subsampling_420_replication():
    """Hand-build a 4:2:0 stream: luma 2x2 sampling, chroma 1x1 — the
    decoder must replicate chroma samples 2x in both axes. Constructed
    by editing the encoder's 4:4:4 output is not possible (different
    MCU structure), so build the entropy stream directly with the same
    public building blocks the encoder uses."""
    import struct

    from etl_prometheus2clickhouse_spark.operators.jpegcodec import (
        _BitWriter,
        _ENC_AC_BITS,
        _ENC_AC_VALS,
        _ENC_DC_BITS,
        _ENC_DC_VALS,
        _enc_codes,
    )

    # one MCU: 16x16 luma (4 blocks) + one 8x8 Cb + one 8x8 Cr
    dc_y = [10, 20, 30, 40]
    dc_cb, dc_cr = 5, -5
    out = bytearray(b"\xff\xd8")
    q = bytearray([16] * 64)
    q[0] = 8
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(q)
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = (
        bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([3, 1, 0, 2, 0, 3, 0, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    dc_codes = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    eob_len, eob_code = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)[0]
    wtr = _BitWriter()
    pred = {0: 0, 1: 0, 2: 0}
    order = [(0, v) for v in dc_y] + [(1, dc_cb), (2, dc_cr)]
    for ci, dc in order:
        diff = dc - pred[ci]
        pred[ci] = dc
        s = abs(diff).bit_length()
        clen, code = dc_codes[s]
        wtr.write(code, clen)
        if s:
            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        wtr.write(eob_code, eob_len)
    wtr.flush()
    out += wtr.out + b"\xff\xd9"

    w, h, ch, px = decode_jpeg_baseline(bytes(out))
    assert (w, h, ch) == (16, 16, 3)
    a = np.frombuffer(px, np.uint8).reshape(16, 16, 3)
    y = np.zeros((16, 16))
    for i, d in enumerate(dc_y):
        y[(i // 2) * 8 : (i // 2) * 8 + 8, (i % 2) * 8 : (i % 2) * 8 + 8] = (
            d + 128
        )
    cb = np.full((16, 16), dc_cb + 128.0)
    cr = np.full((16, 16), dc_cr + 128.0)
    exp = np.clip(
        np.round(
            np.stack(
                [
                    y + 1.402 * (cr - 128.0),
                    y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                    y + 1.772 * (cb - 128.0),
                ],
                axis=-1,
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    assert np.array_equal(a, exp)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg_dc([])
    with pytest.raises(ValueError):
        encode_jpeg_dc([np.array([[200]])])  # DC out of range
    with pytest.raises(ValueError):
        encode_jpeg_dc(
            [np.array([[1]]), np.array([[1, 2]])]
        )  # mismatched planes
    with pytest.raises(ValueError):
        encode_jpeg_dc([np.zeros((0, 3), int)])


def test_decode_images_real_routes_jpeg(spark):
    """The Spark decode path: mode='real' on JPEG bytes runs the
    built-in decoder distributed (no Pillow in this container — if the
    routing were wrong this would be an ImportError, not pixels)."""
    dc0 = np.array([[3, -3]])
    dc1 = np.array([[40], [-40]])
    rows = [
        (1, bytearray(encode_jpeg_dc([dc0]))),
        (2, bytearray(encode_jpeg_dc([dc1], restart_interval=1))),
    ]
    df = spark.createDataFrame(rows, "id bigint, content binary")
    got = {
        r["id"]: r
        for r in decode_images(df, "content", "id", mode="real").collect()
    }
    assert got[1]["media_type"] == "image/jpeg"
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (16, 8, 1)
    assert bytes(got[1]["pixels"]) == _flat_expected(dc0).tobytes()
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (8, 16, 1)
    assert bytes(got[2]["pixels"]) == _flat_expected(dc1).tobytes()


def test_single_component_scan_ignores_declared_sampling():
    """T.81 A.2.2: a 1-component scan is NON-interleaved — raster
    order over ceil(w/8) x ceil(h/8) blocks regardless of the frame's
    declared sampling factors. A grayscale stream whose SOF declares
    2x2 must decode identically to the same stream declaring 1x1
    (round-9 advice: the interleaved-MCU path silently scrambled
    block placement on MCU-multiple dimensions)."""
    rng = np.random.default_rng(11)
    dc = rng.integers(-100, 100, size=(4, 4))  # 32x32, 16 distinct blocks
    data = encode_jpeg_dc([dc])
    w0, h0, c0, px0 = decode_jpeg_baseline(data)

    sof = data.index(b"\xff\xc0")
    hv_off = sof + 11  # marker(2) + len(2) + prec(1) + h(2) + w(2) + nf(1) + cid(1)
    assert data[hv_off] == 0x11
    patched = data[:hv_off] + b"\x22" + data[hv_off + 1 :]
    w1, h1, c1, px1 = decode_jpeg_baseline(patched)
    assert (w1, h1, c1) == (w0, h0, c0) == (32, 32, 1)
    assert px1 == px0


def test_ac_coefficient_closed_form_and_compat():
    """ac01_planes drives the Huffman AC run/size path; the decoded
    {DC, S(0,1)} block must equal the closed-form IDCT ramp
    dc + 128 + ac·16·cos((2x+1)π/16)/(4√2) byte-for-byte (the basis
    of the decode_jpeg_ac oracle), and omitting ac01_planes must emit
    byte-identical streams to the DC-only encoder."""
    import math

    ramp = [
        math.cos((2 * x + 1) * math.pi / 16) / (4 * math.sqrt(2.0))
        for x in range(8)
    ]
    rng = np.random.default_rng(5)
    dcp = rng.integers(-100, 100, (3, 4))
    acp = rng.integers(-3, 4, (3, 4))
    # extremes too: size-10 magnitudes and sign reconstruction
    acp[0, 0], acp[0, 1] = 1000, -1000
    data = encode_jpeg_dc([dcp], restart_interval=2, ac01_planes=[acp])
    w, h, c, px = decode_jpeg_baseline(data)
    assert (w, h, c) == (32, 24, 1)
    got = np.frombuffer(px, dtype=np.uint8).reshape(24, 32)
    for by in range(3):
        for bx in range(4):
            want = np.clip(
                np.round(
                    np.array(
                        [
                            [
                                dcp[by, bx] + 128 + acp[by, bx] * 16 * r
                                for r in ramp
                            ]
                        ]
                        * 8
                    )
                ),
                0,
                255,
            ).astype(np.uint8)
            assert (got[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == want).all()

    assert encode_jpeg_dc([dcp]) == encode_jpeg_dc([dcp], ac01_planes=None)
    with pytest.raises(ValueError, match="1023"):
        encode_jpeg_dc(
            [np.array([[10]])], ac01_planes=[np.array([[1024]])]
        )
    with pytest.raises(ValueError, match="grid"):
        encode_jpeg_dc([dcp], ac01_planes=[np.array([[1]])])
