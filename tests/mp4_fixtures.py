"""Independent ISO-BMFF builder (ISO/IEC 14496-12 public spec) — a
second derivation of the container layout, used to pin the engine's
demux parser. Deliberately written with struct.pack, not shared code."""

from __future__ import annotations

import struct


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, body: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + body)


def build_mp4(
    chunks: list[list[bytes]],
    deltas: list[int],
    timescale: int = 600,
    brand: bytes = b"isom",
    co64: bool = False,
    fixed_size: int | None = None,
) -> bytes:
    """Build a minimal valid MP4: ftyp, mdat (all chunks' samples
    back-to-back), moov/trak/mdia/(mdhd, minf/stbl). ``chunks`` is a
    list of chunks, each a list of sample payloads; ``deltas`` one
    entry per sample (run-length-encoded into stts). ``fixed_size``
    forces the stsz uniform-size form (all samples must have that
    length). ``co64`` emits 64-bit chunk offsets."""
    samples = [s for c in chunks for s in c]
    assert len(deltas) == len(samples)
    if fixed_size is not None:
        assert all(len(s) == fixed_size for s in samples)

    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0))
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)

    # chunk base offsets: mdat payload starts right after ftyp + header
    chunk_offsets = []
    off = len(ftyp) + 8
    for c in chunks:
        chunk_offsets.append(off)
        off += sum(len(s) for s in c)

    # stts: run-length encode deltas
    runs: list[tuple[int, int]] = []
    for d in deltas:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _full(
        b"stts",
        0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", c, d) for c, d in runs),
    )
    # stsc: run-length encode samples-per-chunk
    sc_runs: list[tuple[int, int]] = []  # (first_chunk, spc)
    for i, c in enumerate(chunks, start=1):
        if not sc_runs or sc_runs[-1][1] != len(c):
            sc_runs.append((i, len(c)))
    stsc = _full(
        b"stsc",
        0,
        struct.pack(">I", len(sc_runs))
        + b"".join(
            struct.pack(">III", fc, spc, 1) for fc, spc in sc_runs
        ),
    )
    if fixed_size is not None:
        stsz = _full(
            b"stsz", 0, struct.pack(">II", fixed_size, len(samples))
        )
    else:
        stsz = _full(
            b"stsz",
            0,
            struct.pack(">II", 0, len(samples))
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
    if co64:
        stco = _full(
            b"co64",
            0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">Q", o) for o in chunk_offsets),
        )
    else:
        stco = _full(
            b"stco",
            0,
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
    stbl = _box(b"stbl", stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdhd = _full(
        b"mdhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, sum(deltas))
        + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov
