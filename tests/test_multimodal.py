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


def test_decode_images_real_png(spark):
    """Real PNG decode through the same mapInPandas plumbing — runs
    only where pillow is installed (the dev container ships no codecs,
    so this skips there and exercises on a codec-equipped cluster)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("RGB", (5, 3))
    img.putpixel((0, 0), (255, 0, 0))
    img.putpixel((4, 2), (0, 0, 255))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame([(1, buf.getvalue())], "id bigint, content binary")
    out = decode_images(df, "content", "id", mode="real").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height, r.channels) == (5, 3, 3)
    assert r.media_type == "image/png"
    px = bytes(r.pixels)
    assert len(px) == 5 * 3 * 3
    assert px[0:3] == b"\xff\x00\x00"
    assert px[-3:] == b"\x00\x00\xff"


def test_decode_images_real_without_pillow_raises(media_df, monkeypatch):
    """Where pillow is absent, mode='real' must fail loud with the
    install hint, not fall back to fake pixels."""
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow installed - the ImportError path is dead here")
    except ImportError:
        pass
    out = decode_images(media_df, "content", "id", mode="real")
    with pytest.raises(Exception, match="pillow"):
        out.collect()


def test_sample_frames_fanout(media_df):
    out = sample_frames(media_df.where(F.col("id") == 4), "content", "id", num_frames=3, frame_bytes=32)
    rows = sorted(out.collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    assert [r.frame_ts_ms for r in rows] == [0, 1000, 2000]
    assert all(len(bytes(r.frame)) == 32 for r in rows)
    # frames differ from each other but are deterministic per (content, idx)
    assert bytes(rows[0].frame) != bytes(rows[1].frame)
    again = sorted(
        sample_frames(
            media_df.where(F.col("id") == 4), "content", "id", num_frames=3, frame_bytes=32
        ).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [bytes(r.frame) for r in rows] == [bytes(r.frame) for r in again]
