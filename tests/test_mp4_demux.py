"""MP4 sample-table demux (operators/multimodal.py:demux_mp4): real
stbl walks pinned against an independently-built container, including
multi-chunk stsc runs, multi-run stts, fixed-size stsz, co64, and the
fail-loud structural errors."""

from __future__ import annotations

import pytest

from etl_prometheus2clickhouse_spark.operators.multimodal import (
    _demux_mp4_bytes,
    demux_mp4,
    sample_frames,
)
from tests.mp4_fixtures import build_mp4


def test_single_chunk_round_trip():
    payloads = [b"AAAA", b"BBBBBB", b"CC"]
    b = build_mp4([payloads], deltas=[100, 100, 200], timescale=1000)
    got = _demux_mp4_bytes(b)
    # offsets: mdat payload starts at ftyp(16) + 8 = 24
    assert [(i, ts, off, size) for i, ts, off, size, _ in got] == [
        (0, 0, 24, 4),
        (1, 100, 28, 6),
        (2, 200, 34, 2),
    ]
    assert [p for *_, p in got] == payloads


def test_multi_chunk_stsc_runs_and_multi_run_stts():
    # 3 chunks: 2 + 2 + 1 samples → stsc runs [(1,2),(3,1)]
    chunks = [[b"a" * 3, b"b" * 4], [b"c" * 5, b"d" * 6], [b"e" * 7]]
    deltas = [10, 10, 10, 20, 20]  # stts runs [(3,10),(2,20)]
    b = build_mp4(chunks, deltas, timescale=10)
    got = _demux_mp4_bytes(b)
    assert [size for *_, size, _p in got] == [3, 4, 5, 6, 7]
    # cumulative start times: 0,10,20,30,50 → *1000/10
    assert [ts for _i, ts, *_ in got] == [0, 1000, 2000, 3000, 5000]
    # chunk bases: 24, 24+7, 24+7+11
    assert [off for _i, _t, off, *_ in got] == [24, 27, 31, 36, 42]
    assert b"".join(p for *_, p in got) == b"".join(
        s for c in chunks for s in c
    )


def test_fixed_size_stsz_and_co64():
    chunks = [[b"XY", b"ZW"], [b"KL"]]
    b = build_mp4(
        chunks, deltas=[5, 5, 5], timescale=5, co64=True, fixed_size=2
    )
    got = _demux_mp4_bytes(b)
    assert [p for *_, p in got] == [b"XY", b"ZW", b"KL"]
    assert [ts for _i, ts, *_ in got] == [0, 1000, 2000]


def test_structural_errors_are_loud():
    good = build_mp4([[b"AA"]], deltas=[1])
    with pytest.raises(ValueError, match="no leading ftyp"):
        _demux_mp4_bytes(b"\x00\x00\x00\x08free" + good[8:])
    with pytest.raises(ValueError, match="missing box b'moov'"):
        _demux_mp4_bytes(good[:16])  # ftyp only
    with pytest.raises(ValueError, match="overruns enclosing scope"):
        _demux_mp4_bytes(good[:24])  # truncated mid-mdat
    # stsz/stsc disagreement: corrupt stsz sample_count 1 → 2
    import struct

    idx = good.index(b"stsz")
    corrupt = (
        good[: idx + 12]
        + struct.pack(">I", 2)
        + good[idx + 16 :]
    )
    with pytest.raises(ValueError, match="stsc maps 1 samples"):
        _demux_mp4_bytes(corrupt)
    # chunk offset past EOF
    idx = good.index(b"stco")
    corrupt = good[: idx + 12] + struct.pack(">I", 10**6) + good[idx + 16 :]
    with pytest.raises(ValueError, match="runs past EOF"):
        _demux_mp4_bytes(corrupt)


def test_demux_mp4_dataframe_fanout(spark):
    b1 = build_mp4([[b"11", b"2222"]], deltas=[600, 600])
    b2 = build_mp4([[b"333333"]], deltas=[600])
    df = spark.createDataFrame(
        [(1, b1), (2, b2)], "id bigint, content binary"
    )
    rows = sorted(
        demux_mp4(df, "content", "id").collect(),
        key=lambda r: (r.id, r.sample_idx),
    )
    assert [(r.id, r.sample_idx, r.ts_ms, r.size) for r in rows] == [
        (1, 0, 0, 2),
        (1, 1, 1000, 4),
        (2, 0, 0, 6),
    ]
    assert bytes(rows[1].payload) == b"2222"


def test_sample_frames_slices_real_samples(spark):
    # 6 samples, num_frames=3 → stride 2 → original samples 0, 2, 4
    payloads = [bytes([65 + i]) * (i + 1) for i in range(6)]
    b = build_mp4([payloads], deltas=[600] * 6)
    df = spark.createDataFrame([(9, b)], "id bigint, content binary")
    rows = sorted(
        sample_frames(df, "content", "id", num_frames=3).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    assert [bytes(r.frame) for r in rows] == [
        payloads[0],
        payloads[2],
        payloads[4],
    ]
    assert [r.frame_ts_ms for r in rows] == [0, 2000, 4000]


def test_sample_frames_short_file_yields_all(spark):
    b = build_mp4([[b"qq", b"ww"]], deltas=[600, 600])
    df = spark.createDataFrame([(3, b)], "id bigint, content binary")
    rows = sample_frames(df, "content", "id", num_frames=4).collect()
    assert len(rows) == 2
