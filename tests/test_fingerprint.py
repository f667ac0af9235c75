"""Fingerprint engine vs the real libchromaprint (golden oracle)."""

import numpy as np
import pytest

from needle_tpu.fingerprint.numpy_impl import (
    downmix_stereo_i16,
    fingerprint_numpy,
    fingerprint_numpy_stereo,
    num_subfingerprints,
)

SR = 11025


def _golden(pcm, channels=1):
    from needle_tpu.fingerprint import oracle

    if not oracle.available():
        pytest.skip("libchromaprint not installed")
    return oracle.fingerprint_oracle(pcm, channels=channels)


def _assert_bit_exact(golden, mine):
    assert len(golden) == len(mine)
    if len(golden):
        assert (golden == mine).all()


def test_noise_bit_exact(rng):
    pcm = (rng.standard_normal(SR * 45) * 8000).clip(-32768, 32767).astype(np.int16)
    _assert_bit_exact(_golden(pcm), fingerprint_numpy(pcm))


def test_tonal_bit_exact(rng):
    t = np.arange(SR * 30) / SR
    sig = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 660 * t)
        + 0.05 * rng.standard_normal(len(t))
    )
    pcm = np.clip(sig * 12000, -32768, 32767).astype(np.int16)
    _assert_bit_exact(_golden(pcm), fingerprint_numpy(pcm))


def test_silence_and_quiet(rng):
    _assert_bit_exact(_golden(np.zeros(SR * 20, np.int16)), fingerprint_numpy(np.zeros(SR * 20, np.int16)))
    quiet = (rng.standard_normal(SR * 15) * 3).astype(np.int16)
    _assert_bit_exact(_golden(quiet), fingerprint_numpy(quiet))


def test_norm_threshold_ramp(rng):
    # sweeps the chroma-normalizer 0.01 threshold; catches window-scale bugs
    T = SR * 40
    amp = np.linspace(0, 6.0, T)
    pcm = (rng.standard_normal(T) * amp).astype(np.int16)
    _assert_bit_exact(_golden(pcm), fingerprint_numpy(pcm))


def test_stereo_downmix(rng):
    t = np.arange(SR * 20) / SR
    l = np.clip((np.sin(2 * np.pi * 330 * t) * 0.5 + 0.1 * rng.standard_normal(len(t))) * 10000, -32768, 32767)
    r = np.clip((np.sin(2 * np.pi * 550 * t) * 0.5 + 0.1 * rng.standard_normal(len(t))) * 10000, -32768, 32767)
    st = np.empty(len(t) * 2, np.int16)
    st[0::2] = l.astype(np.int16)
    st[1::2] = r.astype(np.int16)
    _assert_bit_exact(_golden(st, channels=2), fingerprint_numpy_stereo(st))


def test_downmix_truncates_toward_zero():
    st = np.array([-3, 0, 3, 0, -1, -2, 1, 2], np.int16)
    # C: (l+r)/2 truncation: -3/2 -> -1, 3/2 -> 1, -3/2 -> -1, 3/2 -> 1
    assert downmix_stereo_i16(st).tolist() == [-1, 1, -1, 1]


def test_edge_lengths(rng):
    noise = (rng.standard_normal(SR * 10) * 8000).astype(np.int16)
    for n in [0, 1000, 4095, 4096, 4096 + 1364, 4096 + 1365, 40000]:
        pcm = noise[:n]
        golden = _golden(pcm)
        mine = fingerprint_numpy(pcm)
        _assert_bit_exact(golden, mine)
        assert len(mine) == num_subfingerprints(n)


def test_hash_count_formula(rng):
    for secs in [5, 12, 30]:
        pcm = (rng.standard_normal(SR * secs) * 5000).astype(np.int16)
        assert len(fingerprint_numpy(pcm)) == num_subfingerprints(len(pcm))


def test_windowed_recompute_matches_full(rng):
    """fingerprint_numpy_window([lo,hi)) == fingerprint_numpy[lo:hi] for any
    range — the local dependency window of a subfingerprint is exactly 20
    FFT frames (used by the JAX backend's bit-exact rescan)."""
    from needle_tpu.fingerprint.numpy_impl import (
        fingerprint_numpy,
        fingerprint_numpy_window,
        merge_flag_ranges,
    )

    mono = (rng.standard_normal(11025 * 25) * 9000).astype(np.int16)
    full = fingerprint_numpy(mono)
    n = len(full)
    assert n > 40
    for lo, hi in ((0, 3), (5, 6), (n - 4, n), (10, 30), (0, n)):
        np.testing.assert_array_equal(
            fingerprint_numpy_window(mono, lo, hi), full[lo:hi]
        )

    assert merge_flag_ranges([]) == []
    assert merge_flag_ranges([4]) == [(4, 5)]
    assert merge_flag_ranges([1, 2, 3]) == [(1, 4)]
    assert merge_flag_ranges([1, 20, 100], gap=19) == [(1, 21), (100, 101)]
    assert merge_flag_ranges([1, 21], gap=19) == [(1, 22)]
    assert merge_flag_ranges([1, 22], gap=19) == [(1, 2), (22, 23)]
