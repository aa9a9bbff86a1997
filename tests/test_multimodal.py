"""Multimodal binary-column plumbing: sniffing, header metadata, dedup,
Arrow-batched decode/frame-sample shapes (operators/multimodal.py)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.multimodal import (
    binary_dedup,
    decode_images,
    extract_media_metadata,
    sample_frames,
)


def _png(width: int, height: int) -> bytes:
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", width, height)
    return sig + ihdr + b"\x08\x06\x00\x00\x00" + b"\x00" * 16


def _gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 16


def _wav(sample_rate: int) -> bytes:
    return (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHH", 16, 1, 2)
        + struct.pack("<I", sample_rate) + b"\x00" * 16
    )


def _mp4() -> bytes:
    return struct.pack(">I", 24) + b"ftypisom" + b"\x00" * 16


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, _png(640, 480)),
        (2, _gif(320, 200)),
        (3, _wav(44100)),
        (4, _mp4()),
        (5, b"\xff\xd8\xff\xe0" + b"\x00" * 20),  # jpeg
        (6, b"plain text bytes, not a container"),
        (7, _png(640, 480)),  # exact duplicate of 1
    ]
    return spark.createDataFrame(rows, "id bigint, content binary")


def _jpeg(width: int, height: int) -> bytes:
    # realistic shape: SOI, APP0/JFIF segment, THEN SOF0 — the marker
    # scan must find the SOF past the APP0 payload
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", height, width
    ) + b"\x03"
    return b"\xff\xd8" + app0 + sof0 + b"\x00" * 8


def test_jpeg_sof_and_mp4_brand(spark):
    df = spark.createDataFrame(
        [(1, _jpeg(1920, 1080)), (2, _mp4()), (3, b"\xff\xd8\xff\xdb" + b"\x00" * 8)],
        "id bigint, content binary",
    )
    got = {r.id: r for r in extract_media_metadata(df, "content").collect()}
    assert got[1].media_type == "image/jpeg"
    assert (got[1].width, got[1].height) == (1920, 1080)
    assert got[2].media_type == "video/mp4"
    assert got[2].container_brand == "isom"
    # a JPEG without any SOF marker: type sniffs, dimensions stay null
    assert got[3].media_type == "image/jpeg"
    assert got[3].width is None and got[3].height is None


def test_sniff_and_header_metadata(media_df):
    got = {
        r.id: r
        for r in extract_media_metadata(media_df, "content").collect()
    }
    assert got[1].media_type == "image/png"
    assert (got[1].width, got[1].height) == (640, 480)
    assert got[2].media_type == "image/gif"
    assert (got[2].width, got[2].height) == (320, 200)
    assert got[3].media_type == "audio/wav"
    assert got[3].sample_rate == 44100
    assert got[3].width is None
    assert got[4].media_type == "video/mp4"
    assert got[5].media_type == "image/jpeg"
    assert got[6].media_type == "application/octet-stream"
    assert got[6].byte_len == 33


def test_metadata_is_jvm_only(media_df):
    """The scan path must stay whole-stage-codegen — no Python workers."""
    plan = extract_media_metadata(media_df, "content")._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan


def test_binary_dedup(media_df):
    kept = binary_dedup(media_df, "content", order_col="id")
    ids = sorted(r.id for r in kept.collect())
    assert ids == [1, 2, 3, 4, 5, 6]  # 7 collapsed into 1 (lowest id wins)


def test_decode_images_fake_shape(media_df):
    out = decode_images(media_df, "content", "id", mode="fake")
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}
    r = rows[1]
    assert (r.width, r.height, r.channels) == (4, 4, 3)
    assert len(bytes(r.pixels)) == 4 * 4 * 3
    # deterministic: identical content → identical fake pixels
    assert bytes(rows[1].pixels) == bytes(rows[7].pixels)
    assert bytes(rows[1].pixels) != bytes(rows[2].pixels)
    assert rows[1].media_type == "image/png"


def test_decode_images_strict_raises(media_df):
    out = decode_images(media_df, "content", "id", mode="strict")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        out.collect()


def _encode_png(
    w: int, h: int, ch: int, pixels: bytes, filters: list[int] | None = None
) -> bytes:
    """Minimal test-side PNG encoder (spec-conformant chunks + CRCs,
    per-row filter choice) so the REAL decode path executes and is
    byte-pinned without any codec package — independent code from the
    decoder under test (forward filters here, inverse there)."""
    import struct
    import zlib

    ct = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    stride = w * ch
    out = []
    for y in range(h):
        f = filters[y] if filters else 0
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)

        def a(i):
            return row[i - ch] if i >= ch else 0

        def c(i):
            return prev[i - ch] if i >= ch else 0

        if f == 0:
            enc = row
        elif f == 1:
            enc = bytes((row[i] - a(i)) & 0xFF for i in range(stride))
        elif f == 2:
            enc = bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:
            enc = bytes(
                (row[i] - (a(i) + prev[i]) // 2) & 0xFF for i in range(stride)
            )
        elif f == 4:
            enc = bytearray()
            for i in range(stride):
                p = a(i) + prev[i] - c(i)
                pa, pb, pc = abs(p - a(i)), abs(p - prev[i]), abs(p - c(i))
                pred = (
                    a(i)
                    if (pa <= pb and pa <= pc)
                    else (prev[i] if pb <= pc else c(i))
                )
                enc.append((row[i] - pred) & 0xFF)
            enc = bytes(enc)
        else:
            raise AssertionError(f)
        out.append(bytes([f]) + enc)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(out)))
        + chunk(b"IEND", b"")
    )


def test_decode_images_real_png(spark):
    """REAL PNG decode end-to-end through the mapInPandas plumbing —
    executes everywhere: the built-in stdlib decoder needs no codec
    package. Byte-exact pixels, dimensions, and sniffed type."""
    px = bytes([255, 0, 0] + [7] * (5 * 3 * 3 - 6) + [0, 0, 255])
    df = spark.createDataFrame(
        [(1, _encode_png(5, 3, 3, px))], "id bigint, content binary"
    )
    out = decode_images(df, "content", "id", mode="real").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height, r.channels) == (5, 3, 3)
    assert r.media_type == "image/png"
    assert bytes(r.pixels) == px


def test_decode_png_all_filter_types_and_channels():
    """Every PNG scanline filter (None/Sub/Up/Average/Paeth) and every
    supported channel count round-trips byte-exact through the inverse
    filters."""
    import random

    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        _decode_png_stdlib,
    )

    rng = random.Random(42)
    for ch in (1, 3, 4):
        w, h = 7, 5
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        data = _encode_png(w, h, ch, px, filters=[0, 1, 2, 3, 4])
        assert _decode_png_stdlib(data) == (w, h, ch, px)


def test_decode_png_rejects_malformed_and_falls_back_unsupported():
    """A truncated PNG fails as itself (ValueError), never as a
    missing-codec error; an exotic-but-valid flavor (16-bit) raises
    the fallback signal for the Pillow path."""
    import struct
    import zlib

    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        _UnsupportedPng,
        _decode_png_stdlib,
    )

    good = _encode_png(4, 4, 3, bytes(48))
    with pytest.raises(ValueError, match="truncated"):
        _decode_png_stdlib(good[:20])  # cut inside the IHDR chunk data
    with pytest.raises(ValueError, match="missing IHDR/IDAT"):
        _decode_png_stdlib(good[:33])  # complete IHDR, no IDAT at all
    # 16-bit IHDR → unsupported flavor, not malformed
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(_UnsupportedPng):
        _decode_png_stdlib(deep)


def test_decode_images_real_without_pillow_raises(spark):
    """Where pillow is absent, mode='real' on content outside the
    built-in decoders' subset (not a common-subset PNG, not a baseline
    JPEG) must fail loud with the install hint, not fall back to fake
    pixels. A *malformed* baseline JPEG, by contrast, fails as itself
    (ValueError from the built-in decoder, no pillow mention)."""
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow installed - the ImportError path is dead here")
    except ImportError:
        pass
    gif = spark.createDataFrame(
        [(5, b"GIF89a" + b"\x00" * 20)], "id bigint, content binary"
    )
    with pytest.raises(Exception, match="pillow"):
        decode_images(gif, "content", "id", mode="real").collect()
    # progressive JPEG: well-formed marker, outside the subset → pillow
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.jpegcodec import (
        encode_jpeg_dc,
    )

    prog = encode_jpeg_dc([np.array([[5]])]).replace(
        b"\xff\xc0", b"\xff\xc2", 1
    )
    pj = spark.createDataFrame([(6, prog)], "id bigint, content binary")
    with pytest.raises(Exception, match="pillow"):
        decode_images(pj, "content", "id", mode="real").collect()
    # malformed JPEG: fails as itself, not as a missing codec
    bad = spark.createDataFrame(
        [(7, b"\xff\xd8\xff\xe0" + b"\x00" * 20)], "id bigint, content binary"
    )
    with pytest.raises(Exception, match="truncated"):
        decode_images(bad, "content", "id", mode="real").collect()


def test_sample_frames_fanout(spark):
    """Frame sampling is REAL demux now (tests/test_mp4_demux.py has
    the full matrix): fan-out over a valid container, fail-loud on a
    header-only ftyp stub."""
    from tests.mp4_fixtures import build_mp4

    mp4 = build_mp4(
        [[bytes([i]) * 8 for i in range(3)]], deltas=[600, 600, 600]
    )
    df = spark.createDataFrame([(4, mp4)], "id bigint, content binary")
    out = sample_frames(df, "content", "id", num_frames=3)
    rows = sorted(out.collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    assert [r.frame_ts_ms for r in rows] == [0, 1000, 2000]
    assert [bytes(r.frame) for r in rows] == [bytes([i]) * 8 for i in range(3)]
    # a bare ftyp header is NOT a demuxable container — loud, not fake
    stub = spark.createDataFrame([(5, _mp4())], "id bigint, content binary")
    with pytest.raises(Exception, match="missing box"):
        sample_frames(stub, "content", "id", num_frames=2).collect()


def _encode_wav(rate: int, channels: int, width: int, frames: bytes) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_audio_real_wav(spark):
    """REAL PCM WAV decode through the mapInPandas plumbing — stdlib
    wave module, executes everywhere. Byte-exact PCM round trip."""
    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        decode_audio,
    )

    pcm = bytes(range(64)) * 2  # 64 stereo 16-bit frames
    wav = _encode_wav(8000, 2, 2, pcm)
    df = spark.createDataFrame([(1, wav)], "id bigint, content binary")
    out = decode_audio(df, "content", "id").collect()
    assert len(out) == 1
    r = out[0]
    assert r.media_type == "audio/wav"
    assert (r.sample_rate, r.channels, r.sample_width, r.n_frames) == (
        8000, 2, 2, 32,
    )
    assert bytes(r.pcm) == pcm


def test_decode_audio_rejects_non_wav(spark):
    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        decode_audio,
    )

    df = spark.createDataFrame(
        [(1, b"not audio at all")], "id bigint, content binary"
    )
    with pytest.raises(Exception, match="not a decodable PCM WAV"):
        decode_audio(df, "content", "id").collect()


def test_resize_nearest_matches_numpy_reference(spark):
    """NN resize vs a direct numpy gather, including a non-integer
    ratio and 3 channels; null and malformed buffers pass through as
    NULL pixels."""
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        resize_nearest,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    rows = [
        (1, img.tobytes(), 7, 10, 3),
        (2, None, 7, 10, 3),
        (3, b"\x00\x01", 7, 10, 3),  # malformed: wrong length
    ]
    df = spark.createDataFrame(
        rows, "id bigint, pixels binary, width long, height long, channels int"
    )
    out = {r.id: r for r in resize_nearest(df, out_w=4, out_h=5).collect()}
    ys = (np.arange(5) * 10) // 5
    xs = (np.arange(4) * 7) // 4
    want = img[ys][:, xs].tobytes()
    assert bytes(out[1].pixels) == want
    assert out[1].width == 4 and out[1].height == 5
    assert out[2].pixels is None
    assert out[3].pixels is None


def test_image_features_known_values_and_nulls(spark):
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        image_features,
    )

    flat = np.full((4, 4), 7, dtype=np.uint8)
    ramp = np.tile(np.arange(4, dtype=np.uint8) * 10, (4, 1))
    rows = [
        (1, flat.tobytes(), 4, 4, 1),
        (2, ramp.tobytes(), 4, 4, 1),
        (3, None, 4, 4, 1),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, pixels binary, width long, height long, channels int"
    )
    out = {
        r.id: r.features for r in image_features(df).collect()
    }
    assert out[1].px_mean == 7.0 and out[1].px_std == 0.0
    assert out[1].edge_mean == 0.0  # flat image → zero gradient
    assert out[2].px_mean == 15.0
    assert out[2].px_min == 0 and out[2].px_max == 30
    assert out[2].edge_mean == 10.0  # constant 10 step everywhere
    assert out[3].px_mean is None


def test_audio_features_known_values_and_edges(spark):
    """Hand-computed features for 8-bit and 16-bit PCM, including the
    zero-skip crossing convention, plus NULL/odd-length/unsupported-
    width pass-through."""
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        audio_features,
    )

    # 8-bit unsigned: centered = [−128, 127, 0, −1, 1] → nz = [−,+,−,+]
    # → 3 crossings (the zero is skipped); rms = sqrt((128²+127²+0+1+1)/5)
    pcm8 = bytes([0, 255, 128, 127, 129])
    # 16-bit LE signed: [1000, −1000] → 1 crossing, rms 1000, peak 1000
    pcm16 = np.array([1000, -1000], dtype="<i2").tobytes()
    rows = [
        (1, pcm8, 1, 1),
        (2, pcm16, 2, 1),
        (3, None, 1, 1),
        (4, b"\x00\x01\x02", 2, 1),  # odd length for width 2
        (5, pcm8, 4, 1),  # unsupported width
    ]
    df = spark.createDataFrame(
        rows, "id bigint, pcm binary, sample_width int, channels int"
    )
    out = {r.id: r.features for r in audio_features(df).collect()}
    import math

    assert out[1].n_samples == 5
    assert out[1].rms == round(
        math.sqrt((128**2 + 127**2 + 0 + 1 + 1) / 5), 6
    )
    assert out[1].peak == 128
    assert out[1].zero_crossings == 3
    assert out[1].dc_offset == round((-128 + 127 + 0 - 1 + 1) / 5, 6)
    assert out[2].n_samples == 2
    assert out[2].rms == 1000.0
    assert out[2].peak == 1000 and out[2].zero_crossings == 1
    assert out[3].rms is None
    assert out[4].rms is None
    assert out[5].rms is None


def test_image_dhash_invariances_and_sensitivity(spark):
    """dHash (gradient-sign perceptual hash): invariant to a uniform
    brightness shift and to byte-level re-encoding of the same pixels;
    sensitive to a gradient-structure change; exact reference packing
    (LSB-first, two's-complement); NULL/malformed pass through NULL."""
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        image_dhash,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 200, (16, 16, 1), dtype=np.uint8)
    shifted = (img.astype(np.int64) + 30).astype(np.uint8)  # no clip
    flipped = img[:, ::-1]  # horizontal mirror reverses gradient signs
    rows = [
        (1, img.tobytes(), 16, 16, 1),
        (2, shifted.tobytes(), 16, 16, 1),
        (3, flipped.tobytes(), 16, 16, 1),
        (4, None, 16, 16, 1),
        (5, b"\x00", 16, 16, 1),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, pixels binary, width long, height long, channels int"
    )
    got = {r.id: r.dhash for r in image_dhash(df).collect()}
    # reference packing computed independently
    g = img[:, :, 0].astype(np.int64)
    ys = (np.arange(8) * 16) // 8
    xs = (np.arange(9) * 16) // 9
    s = g[ys][:, xs]
    val = 0
    for r in range(8):
        for c in range(8):
            if s[r, c] > s[r, c + 1]:
                val |= 1 << (r * 8 + c)
    if val >= 1 << 63:
        val -= 1 << 64
    assert got[1] == val
    assert got[2] == got[1]  # brightness-shift invariant
    assert got[3] != got[1]  # gradient flip changes the hash
    assert got[4] is None and got[5] is None
    # multi-channel grayscale is the exact integer floor-mean
    rgb = np.stack([img[:, :, 0]] * 3, axis=2)
    df3 = spark.createDataFrame(
        [(1, rgb.tobytes(), 16, 16, 3)],
        "id bigint, pixels binary, width long, height long, channels int",
    )
    assert image_dhash(df3).collect()[0].dhash == got[1]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="grid"):
        image_dhash(df, grid=9)


def test_image_dhash_null_metadata_yields_null(spark):
    """The docstring's 'NULL/malformed buffers yield NULL' contract
    covers NULL/zero height and channels too — a NULL metadata column
    or channels == 0 must produce a NULL hash, not a TypeError or a
    division by zero inside the Arrow batch."""
    import numpy as np

    from etl_prometheus2clickhouse_spark.operators.multimodal import (
        image_dhash,
        resize_nearest,
    )

    img = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16, 1)
    rows = [
        (1, img.tobytes(), 16, 16, 1),   # healthy control
        (2, img.tobytes(), 16, None, 1),  # NULL height
        (3, img.tobytes(), 16, 16, None),  # NULL channels
        (4, img.tobytes(), 16, 16, 0),   # zero channels (÷0 guard)
        (5, img.tobytes(), None, 16, 1),  # NULL width
        (6, img.tobytes(), -4, 16, 1),   # negative width
    ]
    df = spark.createDataFrame(
        rows, "id bigint, pixels binary, width long, height long, channels int"
    )
    got = {r.id: r.dhash for r in image_dhash(df).collect()}
    assert got[1] is not None
    assert all(got[i] is None for i in (2, 3, 4, 5, 6))
    # resize_nearest shares the guard: malformed rows pass through NULL
    rz = {r.id: r.pixels for r in resize_nearest(df, 4, 4).collect()}
    assert rz[1] is not None
    assert all(rz[i] is None for i in (2, 3, 4, 5, 6))
