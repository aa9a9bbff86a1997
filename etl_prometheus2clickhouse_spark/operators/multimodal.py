"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata (engine extension; BASELINE.json north star).

The contract at 100 TB: media bytes stay an opaque ``BinaryType`` column
riding the normal columnar scan (parquet stores them page-compressed;
column pruning drops them when a query doesn't touch pixels), typed
metadata lives in ordinary scalar columns so Catalyst can filter/prune
on it *without* reading the blob, and per-item decode work happens in
Arrow-batched ``mapInPandas`` stages that scale with input splits.

What is REAL here (tested, production-shaped):

- magic-byte media-type sniffing as pure JVM expressions
  (:func:`sniff_media_type`) — no Python in the scan path;
- PNG / GIF / WAV header field extraction (width/height/sample-rate) as
  JVM byte arithmetic (:func:`extract_media_metadata`);
- content-hash dedup over binary columns (:func:`binary_dedup`),
  reusing the exact-dedup shuffle shape;
- the ``mapInPandas`` decode/frame-sample plumbing — schema, batch
  iteration, per-row fan-out (:func:`decode_images`,
  :func:`sample_frames`).

The pixel decode has three modes: ``mode="real"`` decodes via Pillow
when it is importable (optional dependency — the dev container ships
no codecs, so tests for it auto-skip); ``mode="strict"`` raises at the
decode site for fail-loud pipelines; ``mode="fake"`` (default)
produces a deterministic content-hash-seeded payload so tests can
assert the batch shape, partitioning, and determinism end-to-end
hermetically. Frame sampling is REAL container work:
:func:`demux_mp4` walks the ISO-BMFF sample table
(moov/trak/mdia/minf/stbl — stts/stsc/stsz/stco/co64, public spec
ISO/IEC 14496-12) to per-sample (offset, size, timestamp) rows, and
:func:`sample_frames` slices evenly-strided real sample payloads from
it — only the codec (frame pixels) would need ffmpeg on a cluster.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_prometheus2clickhouse_spark.operators.dedup import _keep_one_per_key

# ---------------------------------------------------------------------------
# JVM-side metadata extraction (no Python in the scan path)
# ---------------------------------------------------------------------------

def _be_u32(col: Column, pos: int) -> Column:
    """Big-endian uint32 at 1-based byte offset ``pos`` of a binary col."""
    return F.conv(F.hex(F.substring(col, pos, 4)), 16, 10).cast("bigint")


def _le_u32(col: Column, pos: int) -> Column:
    """Little-endian uint32 at 1-based byte offset ``pos``."""
    b = lambda i: F.conv(F.hex(F.substring(col, pos + i, 1)), 16, 10).cast("bigint")  # noqa: E731
    return b(0) + b(1) * 256 + b(2) * 65536 + b(3) * 16777216


def _le_u16(col: Column, pos: int) -> Column:
    b = lambda i: F.conv(F.hex(F.substring(col, pos + i, 1)), 16, 10).cast("bigint")  # noqa: E731
    return b(0) + b(1) * 256


def sniff_media_type(col: Column | str) -> Column:
    """Magic-byte container sniffing, entirely JVM-side.

    Covers the containers a crawl pipeline actually meets: PNG, JPEG,
    GIF, WebP, WAV, MP3 (ID3), MP4/ISO-BMFF, PDF; anything else is
    ``application/octet-stream``.
    """
    c = F.col(col) if isinstance(col, str) else col
    head = F.hex(F.substring(c, 1, 12))  # 24 hex chars
    return (
        F.when(head.startswith("89504E47"), F.lit("image/png"))
        .when(head.startswith("FFD8FF"), F.lit("image/jpeg"))
        .when(head.startswith("47494638"), F.lit("image/gif"))
        .when(
            head.startswith("52494646") & (F.substring(head, 17, 8) == "57454250"),
            F.lit("image/webp"),
        )
        .when(
            head.startswith("52494646") & (F.substring(head, 17, 8) == "57415645"),
            F.lit("audio/wav"),
        )
        .when(head.startswith("494433"), F.lit("audio/mpeg"))
        .when(F.substring(head, 9, 8) == "66747970", F.lit("video/mp4"))
        .when(head.startswith("25504446"), F.lit("application/pdf"))
        .otherwise(F.lit("application/octet-stream"))
    )


def _jpeg_sof_hexpos(hexhead: Column) -> Column:
    """1-based hex-char position of the first aligned SOF0/1/2 marker
    in the hex dump of the header region. Alignment check (odd hex
    index = even byte boundary) rejects matches straddling two bytes;
    a marker byte-sequence inside an earlier APPn payload can still
    false-positive — acceptable for a header heuristic (real tooling
    walks segments; that needs a UDF, not the scan path)."""
    cands = []
    for m in ("FFC0", "FFC1", "FFC2"):
        p = F.locate(m, hexhead)
        cands.append(F.when((p > 0) & (p % 2 == 1), p))
    return F.least(*cands)


def _hex_be_u16(hexstr: Column, pos: Column) -> Column:
    return F.conv(F.substring(hexstr, pos, 4), 16, 10).cast("bigint")


def extract_media_metadata(
    df: DataFrame, binary_col: str = "content"
) -> DataFrame:
    """Append typed metadata columns parsed from container headers.

    ``media_type``, ``byte_len`` always; ``width``/``height`` for
    PNG (IHDR, big-endian at offset 17/21), GIF (logical screen
    descriptor, little-endian u16 at offset 7/9), and JPEG (SOF
    frame header located by aligned marker scan over the first 4 KiB:
    marker(2B) len(2B) precision(1B) height(2B) width(2B));
    ``sample_rate`` for WAV (fmt chunk, little-endian u32 at offset
    25); ``container_brand`` for MP4/ISO-BMFF (ftyp major brand at
    offset 9). All JVM byte arithmetic — the blob is read but never
    leaves the JVM, and a query that later filters on these columns
    never touches the blob again.
    """
    c = F.col(binary_col)
    mt = sniff_media_type(c)
    jhex = F.hex(F.substring(c, 1, 4096))
    sof = _jpeg_sof_hexpos(jhex)
    return (
        df.withColumn("media_type", mt)
        .withColumn("byte_len", F.length(c).cast("bigint"))
        .withColumn(
            "width",
            F.when(mt == "image/png", _be_u32(c, 17))
            .when(mt == "image/gif", _le_u16(c, 7))
            .when(
                (mt == "image/jpeg") & sof.isNotNull(),
                _hex_be_u16(jhex, sof + 14),
            )
            .cast("bigint"),
        )
        .withColumn(
            "height",
            F.when(mt == "image/png", _be_u32(c, 21))
            .when(mt == "image/gif", _le_u16(c, 9))
            .when(
                (mt == "image/jpeg") & sof.isNotNull(),
                _hex_be_u16(jhex, sof + 10),
            )
            .cast("bigint"),
        )
        .withColumn(
            "sample_rate",
            F.when(mt == "audio/wav", _le_u32(c, 25)).cast("bigint"),
        )
        .withColumn(
            "container_brand",
            F.when(mt == "video/mp4", F.decode(F.substring(c, 9, 4), "UTF-8")),
        )
    )


def binary_dedup(
    df: DataFrame, binary_col: str = "content", order_col: str | None = None
) -> DataFrame:
    """Exact content dedup over a binary column: single hash-aggregate
    shuffle on (xxhash64, md5) of the bytes — same shape as
    :func:`~etl_prometheus2clickhouse_spark.operators.dedup.exact_dedup`,
    but hashing raw bytes (both hash functions accept BinaryType)."""
    keyed = df.select(
        "*",
        F.xxhash64(F.col(binary_col)).alias("__h64"),
        F.md5(F.col(binary_col)).alias("__h128"),
    )
    return _keep_one_per_key(keyed, ["__h64", "__h128"], order_col)


# ---------------------------------------------------------------------------
# mapInPandas decode plumbing (Arrow-batched; decode site stubbed)
# ---------------------------------------------------------------------------

DECODED_IMAGE_DDL = (
    "id bigint, media_type string, width bigint, height bigint, "
    "channels int, pixels binary"
)

FRAME_DDL = "id bigint, frame_idx int, frame_ts_ms bigint, frame bytes".replace(
    "bytes", "binary"
)


def _fake_payload(content: bytes, n: int) -> bytes:
    """Deterministic pseudo-payload seeded by content hash — lets tests
    pin batch shape and determinism without a codec."""
    seed = hashlib.sha256(content).digest()
    reps = n // len(seed) + 1
    return (seed * reps)[:n]


VALID_DECODE_MODES = ("real", "strict", "fake")

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class _UnsupportedPng(ValueError):
    """A well-formed PNG outside the built-in decoder's subset (16-bit,
    palette, interlaced) — falls back to Pillow where installed."""


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytes:
    """Reverse the per-scanline PNG filters (spec §9: None/Sub/Up/
    Average/Paeth). None/Up rows are whole-row numpy ops. Sub rows
    (``cur[x] = row[x] + cur[x-bpp]``) are a strided prefix sum —
    addition mod 256 distributes over the cumulative sum, so reshaping
    the row into (pixels, bpp) lanes and running one ``np.cumsum`` per
    lane is exact (kernel measured ~37× over the per-byte loop on
    256×256 RGB; BENCH_NOTES round 8). Average/Paeth predictors branch
    on the running decoded value, an inherently sequential recurrence,
    so those rows keep the per-byte loop — fine for the correctness
    role this decoder plays (see :func:`_decode_png_stdlib`)."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos
        ).astype(np.int32)
        pos += stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:
            cur = (row + prev) & 0xFF
        elif ftype == 1:
            # stride is always pixels × bpp for the supported subset,
            # so the (pixels, bpp) reshape is exact
            cur = (np.cumsum(row.reshape(-1, bpp), axis=0) & 0xFF).reshape(-1)
        elif ftype in (3, 4):
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur
    return out.tobytes()


def _decode_png_stdlib(data: bytes) -> tuple[int, int, int, bytes]:
    """Pure stdlib+numpy PNG decode (zlib inflate + scanline unfilter)
    for 8-bit gray/RGB/RGBA non-interlaced images — the common subset.

    PNG is a fully public format (W3C spec; IHDR/IDAT chunking, zlib
    streams, five scanline filters), so real image decode need not
    gate on an optional codec package for this subset: this is the
    path that lets ``decode_images(mode="real")`` EXECUTE — and be
    pytest-pinned byte-for-byte — in codec-less environments like this
    repo's own container. Pillow remains the production path for
    everything else (JPEG, palette/16-bit/interlaced PNG → raises
    :class:`_UnsupportedPng` to trigger that fallback); malformed PNGs
    raise ValueError rather than falling through, so a truncated file
    fails as itself, not as a missing-codec error."""
    import struct
    import zlib

    if len(data) < 8 or data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            if len(chunk) != 13:
                raise ValueError("malformed IHDR")
            hdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ct, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0 or ct not in (0, 2, 6):
        raise _UnsupportedPng(
            f"PNG flavor outside the built-in subset (bit_depth={depth}, "
            f"color_type={ct}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}[ct]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    return w, h, ch, _png_unfilter(raw, h, stride, ch)


def _decode_one(content: bytes, mode: str) -> tuple[int, int, int, bytes]:
    """Per-item decode site behind the ``mode`` switch.

    - ``"real"``: common-subset PNGs (8-bit gray/RGB/RGBA,
      non-interlaced) decode via the built-in stdlib decoder
      (:func:`_decode_png_stdlib`), and baseline/extended-sequential
      Huffman JPEGs (8-bit gray + YCbCr up to 2x2 sampling, restart
      intervals) via the built-in T.81 decoder
      (:mod:`~etl_prometheus2clickhouse_spark.operators.jpegcodec`) —
      no optional dependency, both execute and are pytest-pinned even
      in this codec-less container. Everything else (progressive
      JPEG, exotic PNG flavors, other formats) goes through Pillow,
      whose absence raises a clear ImportError. Malformed streams
      raise ValueError as themselves.
    - ``"strict"``: always raises — for pipelines that must fail loud
      rather than produce fake pixels.
    - ``"fake"`` (default): deterministic content-hash-seeded payload;
      pins batch shape/partitioning/determinism without a codec.
    """
    if mode not in VALID_DECODE_MODES:
        raise ValueError(
            f"decode mode {mode!r} is not one of {VALID_DECODE_MODES} - "
            "refusing to silently fall through to fake pixels"
        )
    if mode == "real":
        if content[:8] == _PNG_MAGIC:
            try:
                return _decode_png_stdlib(content)
            except _UnsupportedPng:
                pass  # Pillow handles the exotic flavors below
        elif content[:3] == b"\xff\xd8\xff":
            from etl_prometheus2clickhouse_spark.operators.jpegcodec import (
                UnsupportedJpeg,
                decode_jpeg_baseline,
            )

            try:
                return decode_jpeg_baseline(content)
            except UnsupportedJpeg:
                pass  # progressive/12-bit/arithmetic → Pillow below
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "decode_images(mode='real') requires pillow for this "
                "content (not a baseline JPEG or common-subset PNG — "
                "the built-in stdlib decoders cover 8-bit gray/RGB/RGBA "
                "non-interlaced PNG and baseline Huffman JPEG); install "
                "it on the cluster or use mode='fake' for plumbing tests"
            ) from e
        import io

        img = Image.open(io.BytesIO(content))
        if img.mode not in ("L", "RGB", "RGBA"):
            img = img.convert("RGB")
        w, h = img.size
        return w, h, len(img.getbands()), img.tobytes()
    if mode == "strict":
        raise NotImplementedError(
            "image decode requires a codec library (e.g. Pillow); use "
            "mode='real' where one is installed, or mode='fake' for "
            "plumbing tests"
        )
    w, h, ch = 4, 4, 3
    return w, h, ch, _fake_payload(content, w * h * ch)


def decode_images(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "id",
    mode: str = "fake",
) -> DataFrame:
    """Arrow-batched image decode: one output row per input row with
    ``(id, media_type, width, height, channels, pixels)``.

    The ``mapInPandas`` stage is the real 100 TB shape — per-partition
    generator over Arrow batches, no driver involvement, output schema
    declared up front. Only ``_decode_one`` is a stub."""
    if mode not in VALID_DECODE_MODES:
        # fail on the driver at plan-build time, not as a task error
        raise ValueError(
            f"decode mode {mode!r} is not one of {VALID_DECODE_MODES}"
        )

    def _decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": [], "media_type": [], "width": [],
                "height": [], "channels": [], "pixels": [],
            }
            for rid, content, mt in zip(
                pdf[id_col], pdf[binary_col], pdf["media_type"]
            ):
                b = bytes(content) if content is not None else b""
                w, h, ch, px = _decode_one(b, mode)
                out["id"].append(rid)
                out["media_type"].append(mt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["pixels"].append(px)
            yield pd.DataFrame(out)

    with_type = df.withColumn("media_type", sniff_media_type(binary_col))
    return with_type.mapInPandas(_decode_batches, DECODED_IMAGE_DDL)


DECODED_AUDIO_DDL = (
    "id bigint, media_type string, sample_rate bigint, channels int, "
    "sample_width int, n_frames bigint, pcm binary"
)


def _decode_wav_stdlib(data: bytes) -> tuple[int, int, int, int, bytes]:
    """PCM WAV decode via the stdlib ``wave`` module (RIFF is a public
    format; no codec package involved): returns (sample_rate, channels,
    sample_width_bytes, n_frames, raw_pcm). Malformed or non-PCM
    containers raise ValueError as themselves — same fail-as-yourself
    contract as the PNG decoder."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            return (
                w.getframerate(),
                w.getnchannels(),
                w.getsampwidth(),
                w.getnframes(),
                w.readframes(w.getnframes()),
            )
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a decodable PCM WAV: {e}") from e


def decode_audio(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """Arrow-batched REAL audio decode for PCM WAV content — the audio
    face of :func:`decode_images`: one output row per input row with
    ``(id, media_type, sample_rate, channels, sample_width, n_frames,
    pcm)``. Pure stdlib decode (see :func:`_decode_wav_stdlib`), so
    the path executes and is byte-pinned in codec-less environments;
    compressed formats (mp3/ogg/flac) belong to an external codec on
    the cluster and non-WAV content fails loud here. Same
    ``mapInPandas`` 100 TB shape as the image decoder: per-partition
    Arrow batches, no driver involvement, schema declared up front."""

    def _decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": [], "media_type": [], "sample_rate": [],
                "channels": [], "sample_width": [], "n_frames": [],
                "pcm": [],
            }
            for rid, content, mt in zip(
                pdf[id_col], pdf[binary_col], pdf["media_type"]
            ):
                b = bytes(content) if content is not None else b""
                rate, ch, width, n, pcm = _decode_wav_stdlib(b)
                out["id"].append(rid)
                out["media_type"].append(mt)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["sample_width"].append(width)
                out["n_frames"].append(n)
                out["pcm"].append(pcm)
            yield pd.DataFrame(out)

    with_type = df.withColumn("media_type", sniff_media_type(binary_col))
    return with_type.mapInPandas(_decode_batches, DECODED_AUDIO_DDL)


# ---------------------------------------------------------------------------
# ISO-BMFF (MP4) sample-table demux — a REAL container walk
# (ISO/IEC 14496-12 public spec): moov → trak → mdia → (mdhd
# timescale) → minf → stbl → stts/stsc/stsz/stco|co64, resolved to
# per-sample (offset, size, timestamp) rows with the payload sliced
# from the actual file bytes. No codec needed — demux is pure byte
# arithmetic, so it runs hermetically and is byte-exact oracle-able
# against a closed-form encoder (the encode_jpeg_dc pattern).
# ---------------------------------------------------------------------------

MP4_SAMPLE_DDL = (
    "id bigint, sample_idx int, ts_ms bigint, byte_offset bigint, "
    "size int, payload binary"
)


def _u32(b: bytes, p: int) -> int:
    return int.from_bytes(b[p : p + 4], "big")


def _u64(b: bytes, p: int) -> int:
    return int.from_bytes(b[p : p + 8], "big")


def _iter_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end): 32-bit size, size==1 → 64-bit largesize, size==0 →
    box extends to the end of the enclosing scope."""
    pos = start
    while pos + 8 <= end:
        size = _u32(b, pos)
        btype = b[pos + 4 : pos + 8]
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = _u64(b, pos + 8)
            payload = pos + 16
        elif size == 0:
            size = end - pos
            payload = pos + 8
        else:
            payload = pos + 8
        if size < payload - pos or pos + size > end:
            raise ValueError(f"box {btype!r} overruns enclosing scope")
        yield btype, payload, pos + size
        pos += size


def _find_box(b: bytes, start: int, end: int, name: bytes):
    for btype, ps, pe in _iter_boxes(b, start, end):
        if btype == name:
            return ps, pe
    return None


def _walk(b: bytes, path: list[bytes], start: int, end: int):
    for name in path:
        found = _find_box(b, start, end, name)
        if found is None:
            raise ValueError(f"missing box {name!r} in MP4 structure")
        start, end = found
    return start, end


def _demux_mp4_bytes(b: bytes) -> list[tuple[int, int, int, int, bytes]]:
    """Parse one ISO-BMFF file → [(sample_idx, ts_ms, byte_offset,
    size, payload)] for the FIRST track. Fail-loud ValueError on
    structural problems (missing boxes, offsets past EOF, stsz/stsc
    disagreement) — the decode-site contract of ``mode="strict"``."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (no leading ftyp box)")
    mdia_s, mdia_e = _walk(b, [b"moov", b"trak", b"mdia"], 0, len(b))
    mdhd = _find_box(b, mdia_s, mdia_e, b"mdhd")
    if mdhd is None:
        raise ValueError("missing box b'mdhd' in MP4 structure")
    version = b[mdhd[0]]
    timescale = _u32(b, mdhd[0] + (20 if version == 1 else 12))
    if timescale == 0:
        raise ValueError("mdhd timescale is zero")
    stbl_s, stbl_e = _walk(b, [b"minf", b"stbl"], mdia_s, mdia_e)

    def full_box(name: bytes) -> int:
        found = _find_box(b, stbl_s, stbl_e, name)
        if found is None:
            if name == b"stco":  # 64-bit variant allowed
                return -1
            raise ValueError(f"missing box {name!r} in stbl")
        return found[0]

    # stsz: fixed sample_size or per-sample table
    p = full_box(b"stsz")
    fixed_size, n_samples = _u32(b, p + 4), _u32(b, p + 8)
    sizes = (
        [fixed_size] * n_samples
        if fixed_size
        else [_u32(b, p + 12 + 4 * i) for i in range(n_samples)]
    )
    # stco / co64: chunk base offsets
    p = full_box(b"stco")
    if p >= 0:
        n_chunks = _u32(b, p + 4)
        chunk_offsets = [_u32(b, p + 8 + 4 * i) for i in range(n_chunks)]
    else:
        found = _find_box(b, stbl_s, stbl_e, b"co64")
        if found is None:
            raise ValueError("missing box b'stco'/b'co64' in stbl")
        p = found[0]
        n_chunks = _u32(b, p + 4)
        chunk_offsets = [_u64(b, p + 8 + 8 * i) for i in range(n_chunks)]
    # stsc: runs of (first_chunk, samples_per_chunk); expand per chunk
    p = full_box(b"stsc")
    n_runs = _u32(b, p + 4)
    runs = [
        (_u32(b, p + 8 + 12 * i), _u32(b, p + 12 + 12 * i))
        for i in range(n_runs)
    ]
    per_chunk: list[int] = []
    for ci in range(1, n_chunks + 1):
        spc = 0
        for first, count in runs:
            if first <= ci:
                spc = count
        per_chunk.append(spc)
    if sum(per_chunk) != n_samples:
        raise ValueError(
            f"stsc maps {sum(per_chunk)} samples over {n_chunks} chunks "
            f"but stsz declares {n_samples}"
        )
    # stts: runs of (sample_count, delta) → cumulative start times
    p = full_box(b"stts")
    n_tt = _u32(b, p + 4)
    deltas: list[int] = []
    for i in range(n_tt):
        cnt, delta = _u32(b, p + 8 + 8 * i), _u32(b, p + 12 + 8 * i)
        deltas.extend([delta] * cnt)
    if len(deltas) != n_samples:
        raise ValueError(
            f"stts covers {len(deltas)} samples, stsz declares {n_samples}"
        )
    # resolve per-sample offsets chunk by chunk
    out: list[tuple[int, int, int, int, bytes]] = []
    si = 0
    cum_t = 0
    for ci, spc in enumerate(per_chunk):
        off = chunk_offsets[ci]
        for _ in range(spc):
            size = sizes[si]
            if off + size > len(b):
                raise ValueError(
                    f"sample {si} at offset {off} (+{size}) runs past EOF"
                )
            out.append(
                (si, cum_t * 1000 // timescale, off, size, b[off : off + size])
            )
            cum_t += deltas[si]
            off += size
            si += 1
    return out


def demux_mp4(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """MP4 binary column → per-sample rows ``(id, sample_idx, ts_ms,
    byte_offset, size, payload)`` via the real stbl walk (module
    section comment). Arrow-batched ``mapInPandas`` with row fan-out —
    per-file Python byte arithmetic, embarrassingly parallel, the
    decode-stage class of the PNG/JPEG/WAV decoders."""

    def _demux_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": [],
                "sample_idx": [],
                "ts_ms": [],
                "byte_offset": [],
                "size": [],
                "payload": [],
            }
            for rid, content in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(content) if content is not None else b""
                for idx, ts, off, size, payload in _demux_mp4_bytes(b):
                    out["id"].append(rid)
                    out["sample_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    out["byte_offset"].append(off)
                    out["size"].append(size)
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    return df.mapInPandas(_demux_batches, MP4_SAMPLE_DDL)


def sample_frames(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "id",
    num_frames: int = 4,
) -> DataFrame:
    """Video → up to N sampled frames per row, sliced from the REAL
    sample table: the container is demuxed with the stbl walk and
    ``num_frames`` evenly-strided samples are emitted with their real
    timestamps and bytes (the ffmpeg-shaped fan-out, minus only the
    codec: frames are coded sample payloads, not decoded pixels).
    Files with fewer samples than ``num_frames`` yield all samples."""

    def _sample_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for rid, content in zip(pdf[id_col], pdf[binary_col]):
                b = bytes(content) if content is not None else b""
                samples = _demux_mp4_bytes(b)
                stride = max(1, len(samples) // num_frames)
                picked = samples[::stride][:num_frames]
                for j, (idx, ts, _off, _size, payload) in enumerate(picked):
                    out["id"].append(rid)
                    out["frame_idx"].append(j)
                    out["frame_ts_ms"].append(ts)
                    out["frame"].append(payload)
            yield pd.DataFrame(out)

    return df.mapInPandas(_sample_batches, FRAME_DDL)


# ---------------------------------------------------------------------------
# Decoded-frame transforms: resize + feature extraction (engine
# extension — the multimodal layer's post-decode stages; compose as
# decode_images → resize_nearest → image_features, each Arrow-batched)
# ---------------------------------------------------------------------------


def resize_nearest(
    df: DataFrame,
    out_w: int,
    out_h: int,
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
    channels_col: str = "channels",
) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel buffers (the output of
    :func:`decode_images`): output pixel (y, x) samples source pixel
    (floor(y·src_h/out_h), floor(x·src_w/out_w)) — pure integer index
    arithmetic, so the resized buffer is EXACTLY statable in SQL (the
    ``resize_nn`` catalog oracle restates it byte for byte), unlike
    area/bilinear kernels whose float blends are only
    approximately reproducible. One vectorized numpy gather per Arrow
    batch; rows whose buffer is NULL or malformed (length ≠ w·h·c)
    pass through with NULL pixels rather than poisoning the batch.

    At 100 TB: embarrassingly parallel (no shuffle), output volume
    shrinks by (out_w·out_h)/(src_w·src_h) — run it right after
    decode so every downstream stage moves the small buffer.
    Bilinear/area kernels are the documented production alternative
    (same plumbing, float weights); nearest is the oracle-exact
    default."""
    import numpy as np

    @F.pandas_udf("binary")
    def _resize(
        px: pd.Series, w: pd.Series, h: pd.Series, c: pd.Series
    ) -> pd.Series:
        out = []
        for buf, sw, sh, sc in zip(px, w, h, c):
            if (
                buf is None
                or pd.isna(sw) or pd.isna(sh) or pd.isna(sc)
                or sw <= 0 or sh <= 0 or sc <= 0
            ):
                out.append(None)
                continue
            sw, sh, sc = int(sw), int(sh), int(sc)
            a = np.frombuffer(bytes(buf), dtype=np.uint8)
            if len(a) != sw * sh * sc:
                out.append(None)
                continue
            a = a.reshape(sh, sw, sc)
            ys = (np.arange(out_h) * sh) // out_h
            xs = (np.arange(out_w) * sw) // out_w
            out.append(a[ys][:, xs].tobytes())
        return pd.Series(out)

    return (
        df.withColumn(
            pixels_col,
            _resize(
                F.col(pixels_col),
                F.col(width_col),
                F.col(height_col),
                F.col(channels_col),
            ),
        )
        .withColumn(width_col, F.lit(out_w).cast("long"))
        .withColumn(height_col, F.lit(out_h).cast("long"))
    )


def image_dhash(
    df: DataFrame,
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
    channels_col: str = "channels",
    out_col: str = "dhash",
    grid: int = 8,
) -> DataFrame:
    """Perceptual difference hash (dHash — the public
    gradient-sign construction: Krawetz, "Kind of Like That", 2013)
    over a decoded pixel buffer: grayscale by exact integer floor-mean
    across channels, nearest-neighbor downsample to a
    ``grid × (grid+1)`` sample lattice (the :func:`resize_nearest`
    index arithmetic — ``(i·src)//out``), bit ``(r, c)`` = 1 iff
    ``g[r][c] > g[r][c+1]``, packed LSB-first (``i = r·grid + c``) into
    a SIGNED 64-bit value (two's-complement wrap — the cross-engine
    spelling). Every step is exact integer arithmetic, so the hash is
    bit-reproducible in SQL on closed-form pixels (the
    ``image_dhash_dedup`` catalog oracle).

    Why a gradient-SIGN hash: byte-level content dedup
    (``binary_dedup``) misses re-encoded duplicates (same picture,
    different bytes: restart markers, metadata, encoder settings) and
    brightness-shifted copies; dHash is invariant to both — a uniform
    pixel shift preserves every comparison — while any change to the
    image's coarse gradient structure flips bits. Equal dHash means
    "same 8×8 gradient-sign structure", not byte equality: visually
    simple images can collide, which is the documented trade of every
    perceptual hash. One vectorized numpy pass per Arrow batch, no
    shuffle; NULL/malformed buffers yield NULL."""
    import numpy as np

    if not 1 <= grid <= 8:
        raise ValueError(f"image_dhash: grid must be in [1, 8], got {grid}")

    @F.pandas_udf("long")
    def _dhash(
        px: pd.Series, w: pd.Series, h: pd.Series, c: pd.Series
    ) -> pd.Series:
        out = []
        for buf, sw, sh, sc in zip(px, w, h, c):
            if (
                buf is None
                or pd.isna(sw) or pd.isna(sh) or pd.isna(sc)
                or sw <= 0 or sh <= 0 or sc <= 0
            ):
                out.append(None)
                continue
            sw, sh, sc = int(sw), int(sh), int(sc)
            a = np.frombuffer(bytes(buf), dtype=np.uint8)
            if len(a) != sw * sh * sc:
                out.append(None)
                continue
            g = a.reshape(sh, sw, sc).astype(np.int64).sum(axis=2) // sc
            ys = (np.arange(grid) * sh) // grid
            xs = (np.arange(grid + 1) * sw) // (grid + 1)
            s = g[ys][:, xs]
            bits = (s[:, :-1] > s[:, 1:]).astype(np.uint64)
            val = 0
            for r in range(grid):
                for cc in range(grid):
                    if bits[r, cc]:
                        val |= 1 << (r * grid + cc)
            if val >= 1 << 63:
                val -= 1 << 64  # two's-complement wrap to signed long
            out.append(val)
        return pd.Series(out, dtype="object")

    return df.withColumn(
        out_col,
        _dhash(
            F.col(pixels_col),
            F.col(width_col),
            F.col(height_col),
            F.col(channels_col),
        ),
    )


IMAGE_FEATURES_FIELDS = (
    "px_mean double, px_std double, px_min int, px_max int, "
    "edge_mean double"
)


def image_features(
    df: DataFrame,
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
    channels_col: str = "channels",
    out_col: str = "features",
) -> DataFrame:
    """Per-image scalar features over a decoded pixel buffer: mean,
    population std, min, max, and mean absolute horizontal gradient
    (``edge_mean`` — a cheap sharpness/flatness signal: 0 for flat
    fields, large for dithered noise; the standard first-pass quality
    filter for image corpora, analogous to the text layer's
    quality_score). All five are exact integer/float64 reductions, so
    the ``image_features`` catalog oracle restates them in closed form
    for the synthesized block images (flat 8x8 blocks → the gradient
    is nonzero only at block seams). NULL/malformed buffers yield a
    NULL struct. One vectorized numpy pass per Arrow batch, no
    shuffle."""
    import numpy as np

    @F.pandas_udf(f"struct<{IMAGE_FEATURES_FIELDS}>")
    def _feats(
        px: pd.Series, w: pd.Series, h: pd.Series, c: pd.Series
    ) -> pd.DataFrame:
        rows = []
        for buf, sw, sh, sc in zip(px, w, h, c):
            if buf is None or sw is None or sw <= 0 or sh <= 0:
                rows.append((None, None, None, None, None))
                continue
            sw, sh, sc = int(sw), int(sh), int(sc)
            a = np.frombuffer(bytes(buf), dtype=np.uint8)
            if len(a) != sw * sh * sc:
                rows.append((None, None, None, None, None))
                continue
            f = a.astype(np.float64)
            img = f.reshape(sh, sw, sc)
            grad = (
                float(np.abs(np.diff(img, axis=1)).mean())
                if sw > 1
                else 0.0
            )
            rows.append(
                (
                    round(float(f.mean()), 6),
                    round(float(f.std()), 6),
                    int(a.min()),
                    int(a.max()),
                    round(grad, 6),
                )
            )
        return pd.DataFrame(
            rows, columns=["px_mean", "px_std", "px_min", "px_max", "edge_mean"]
        )

    return df.withColumn(
        out_col,
        _feats(
            F.col(pixels_col),
            F.col(width_col),
            F.col(height_col),
            F.col(channels_col),
        ),
    )


AUDIO_FEATURES_FIELDS = (
    "n_samples bigint, rms double, peak int, zero_crossings bigint, "
    "dc_offset double"
)


def audio_features(
    df: DataFrame,
    pcm_col: str = "pcm",
    width_col: str = "sample_width",
    channels_col: str = "channels",
    out_col: str = "features",
) -> DataFrame:
    """Per-clip scalar features over decoded PCM (the output of
    :func:`decode_audio`) — the audio twin of :func:`image_features`,
    the first-pass filters a speech/audio corpus runs (drop silent or
    clipped clips, flag DC-biased captures): sample count, RMS
    amplitude, absolute peak, strict zero-crossing count, and mean
    (DC offset), all over the CENTERED signal in raw sample units
    (8-bit unsigned PCM centers at −128; 16-bit LE is already
    signed). Multi-channel PCM is analyzed over the interleaved
    stream (document-level stats, not per-channel). Exact integer /
    float64 reductions — the ``audio_features`` catalog oracle
    restates them value-for-value over the md5-derived synthesis.
    NULL/odd-length/unsupported-width buffers yield a NULL struct.
    One vectorized numpy pass per Arrow batch, no shuffle."""
    import numpy as np

    @F.pandas_udf(f"struct<{AUDIO_FEATURES_FIELDS}>")
    def _feats(
        pcm: pd.Series, width: pd.Series, ch: pd.Series
    ) -> pd.DataFrame:
        rows = []
        for buf, sw, _c in zip(pcm, width, ch):
            if buf is None or sw not in (1, 2):
                rows.append((None, None, None, None, None))
                continue
            b = bytes(buf)
            if len(b) == 0 or len(b) % sw:
                rows.append((None, None, None, None, None))
                continue
            if sw == 1:
                x = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                x -= 128.0
            else:
                x = np.frombuffer(b, dtype="<i2").astype(np.float64)
            sign = np.sign(x)
            nz = sign[sign != 0]
            zc = int((nz[1:] * nz[:-1] < 0).sum()) if len(nz) > 1 else 0
            rows.append(
                (
                    len(x),
                    round(float(np.sqrt((x * x).mean())), 6),
                    int(np.abs(x).max()),
                    zc,
                    round(float(x.mean()), 6),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "n_samples", "rms", "peak", "zero_crossings", "dc_offset",
            ],
        )

    return df.withColumn(
        out_col,
        _feats(F.col(pcm_col), F.col(width_col), F.col(channels_col)),
    )


def video_features(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """Per-video scalar features over the REAL sample table — the
    video member of the decode→features trio (:func:`image_features`,
    :func:`audio_features`): containers are demuxed with the stbl walk
    (:func:`demux_mp4`) and each video reduces to its structural
    profile — sample count, coded byte volume, last sample timestamp,
    size envelope, and the number of DISTINCT coded payloads (a crude
    content-diversity signal: a slideshow of identical frames scores
    1). Codec-free by design: these are the features you can trust
    without decoding, which is what large-scale video triage runs
    first.

    100 TB shape: the demux fan-out is embarrassingly parallel
    (Arrow-batched, per-file byte arithmetic), and the rollup is one
    map-side-combining hash aggregate keyed by the id the fan-out
    already carries — payloads never shuffle wider than their video's
    partial aggregate (count-distinct's partial dedup collapses
    repeated payloads before the exchange)."""
    s = demux_mp4(df, binary_col, id_col)
    return s.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_samples"),
        F.sum("size").cast("long").alias("total_bytes"),
        F.max("ts_ms").cast("long").alias("last_ts_ms"),
        F.min("size").cast("int").alias("min_size"),
        F.max("size").cast("int").alias("max_size"),
        F.countDistinct("payload").cast("long").alias(
            "n_distinct_payloads"
        ),
    )
