"""On-disk format bit-compatibility: bincode .needle.dat and skip JSON."""

import numpy as np
import pytest

from needle_tpu.data import (
    FrameHashes,
    SkipFile,
    frame_hash_data_path,
    shortest_f32_repr,
    skip_file_path,
    with_rust_extension,
)
from needle_tpu.duration import Duration
from needle_tpu.errors import FrameHashDataInvalidVersion, FrameHashDataNotFound


def test_with_rust_extension():
    assert str(with_rust_extension("/a/ep1.mp4", "needle.dat")) == "/a/ep1.needle.dat"
    assert str(with_rust_extension("/a/ep1", "needle.dat")) == "/a/ep1.needle.dat"
    assert (
        str(with_rust_extension("/a/e.s01.mkv", "needle.skip.json"))
        == "/a/e.s01.needle.skip.json"
    )
    assert str(frame_hash_data_path("/a/x.webm")) == "/a/x.needle.dat"
    assert str(skip_file_path("/a/x.webm")) == "/a/x.needle.skip.json"


def test_bincode_layout_exact():
    fh = FrameHashes(
        np.array([0xDEADBEEF], np.uint32),
        np.array([3 * 10**9 + 4081566], np.int64),
        np.zeros(0, np.uint32),
        np.zeros(0, np.int64),
        Duration.from_secs_f32(0.3),
        "0123456789abcdef0123456789abcdef",
    )
    raw = fh.to_bytes()
    # version enum variant index (u32 LE) == 0, data enum index == 0
    assert raw[:8] == b"\x00\x00\x00\x00\x00\x00\x00\x00"
    # opening vec: u64 len 1, then (u32 hash, u64 secs, u32 nanos)
    assert raw[8:16] == (1).to_bytes(8, "little")
    assert raw[16:20] == (0xDEADBEEF).to_bytes(4, "little")
    assert raw[20:28] == (3).to_bytes(8, "little")
    assert raw[28:32] == (4081566).to_bytes(4, "little")
    # ending vec: len 0
    assert raw[32:40] == (0).to_bytes(8, "little")
    # hash_duration: 0.3f32 -> (0 secs, 300000012 nanos)
    assert raw[40:48] == (0).to_bytes(8, "little")
    assert raw[48:52] == (300000012).to_bytes(4, "little")
    # md5: u64 len + bytes
    assert raw[52:60] == (32).to_bytes(8, "little")
    assert raw[60:] == b"0123456789abcdef0123456789abcdef"


def test_bincode_roundtrip(rng):
    n = 500
    hashes = rng.integers(0, 2**32, n).astype(np.uint32)
    ts = (rng.integers(0, 10**12, n)).astype(np.int64)
    ts.sort()
    fh = FrameHashes(hashes, ts, hashes[:7], ts[:7], Duration.from_millis(300), "x" * 32)
    fh2 = FrameHashes.from_bytes(fh.to_bytes())
    assert (fh2.opening_hashes == hashes).all()
    assert (fh2.opening_ts_nanos == ts).all()
    assert (fh2.ending_hashes == hashes[:7]).all()
    assert fh2.hash_duration() == Duration.from_millis(300)
    assert fh2.md5() == "x" * 32


def test_bad_version_rejected():
    fh = FrameHashes(
        np.zeros(0, np.uint32), np.zeros(0, np.int64),
        np.zeros(0, np.uint32), np.zeros(0, np.int64),
        Duration.from_millis(300), "m" * 32,
    )
    raw = bytearray(fh.to_bytes())
    raw[0] = 7
    with pytest.raises(FrameHashDataInvalidVersion):
        FrameHashes.from_bytes(bytes(raw))


def test_from_path_missing(tmp_path):
    with pytest.raises(FrameHashDataNotFound):
        FrameHashes.from_path(tmp_path / "nope.needle.dat")


def test_shortest_f32_repr():
    # values from the reference README's published skip file
    assert shortest_f32_repr(np.float32(1331.664387072)) == "1331.6644"
    assert shortest_f32_repr(np.float32(1419.024930474)) == "1419.0249"
    assert shortest_f32_repr(np.float32(2.0)) == "2.0"
    assert shortest_f32_repr(np.float32(0.1)) == "0.1"


def test_skip_file_json_bytes():
    sf = SkipFile(
        opening=None,
        ending=(np.float32(1331.664387072), np.float32(1419.024930474)),
        md5="14bfa97f85d86f74e1ab5a26066f9181",
    )
    assert sf.to_json_bytes() == (
        b'{"opening":null,"ending":[1331.6644,1419.0249],'
        b'"md5":"14bfa97f85d86f74e1ab5a26066f9181"}'
    )
    rt = SkipFile.from_json_bytes(sf.to_json_bytes())
    assert rt.opening is None and rt.md5 == sf.md5
    assert rt.ending == pytest.approx((1331.6644, 1419.0249))


def test_shortest_f32_repr_round_values_positional():
    """ryu prints positional decimals for round values — never "9e+01"."""
    for v, expect in [(90.0, "90.0"), (30.0, "30.0"), (120.0, "120.0"),
                      (1000.0, "1000.0"), (0.0, "0.0")]:
        assert shortest_f32_repr(v) == expect
    assert np.float32(shortest_f32_repr(1331.664387072)) == np.float32(
        1331.664387072
    )
