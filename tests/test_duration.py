"""Rust std::time::Duration emulation semantics."""

import numpy as np
import pytest

from needle_tpu.duration import Duration


def test_from_secs_f32_rounding():
    # 0.3f32 == 0.300000011920928955078125 -> 300000012 ns (Rust behavior)
    assert Duration.from_secs_f32(0.3).total_nanos() == 300000012
    assert Duration.from_secs_f32(1.0).total_nanos() == 1_000_000_000
    assert Duration.from_secs_f32(0.0).total_nanos() == 0


def test_from_secs_f64_exact():
    d = Duration.from_secs_f64(28666 / 11025)
    # 2.600090702947846... -> round-half-even at ns
    assert d.total_nanos() == 2600090703
    d = Duration.from_secs_f64(1365 / 11025)
    assert d.total_nanos() == 123809524


def test_as_secs_f32_is_f32_math():
    d = Duration(0, 123809524)
    v = d.as_secs_f32()
    assert isinstance(v, np.float32)
    # f32(0) + f32(123809524)/f32(1e9), all f32 ops
    assert v == np.float32(0) + np.float32(123809524) / np.float32(1e9)


def test_mul_f32_matches_rust_formula():
    item = Duration.from_secs_f64(1365 / 11025)
    # Rust: from_secs_f32(i as f32 * item.as_secs_f32())
    for i in [0, 1, 2, 100, 2906, 5813]:
        expected = Duration.from_secs_f32(np.float32(i) * item.as_secs_f32())
        assert item.mul_f32(np.float32(i)) == expected


def test_arithmetic_and_ordering():
    a, b = Duration.from_millis(1500), Duration.from_millis(500)
    assert (a + b).total_nanos() == 2_000_000_000
    assert (a - b).as_millis() == 1000
    assert b < a <= a
    with pytest.raises(OverflowError):
        _ = b - a
    with pytest.raises(ValueError):
        Duration.from_secs_f64(-0.1)
    with pytest.raises(ValueError):
        Duration.from_secs_f64(float("nan"))


def test_as_millis_truncates():
    assert Duration(0, 999_999_999).as_millis() == 999
    assert Duration(2, 1_000_000).as_millis() == 2001


def test_repr_matches_rust_debug():
    assert repr(Duration.from_nanos(3004081566)) == "3.004081566s"
    assert repr(Duration.from_secs(3)) == "3s"
