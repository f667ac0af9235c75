"""Exactness of the fused device-ingest path against its canonical host
oracle (fingerprint/ingest_oracle.py).

The fused program ([integer decimate ->] integer downmix -> f32 polyphase
resample -> fingerprint) defines its hash basis as the canonical float64
host evaluation of the same program structure; borderline-quantized hashes
are flagged on device and rescanned with the oracle
(jax_impl.IngestDispatcher._rescan), making the returned hashes exactly
the oracle's on every backend. Reference counterpart: the host
swr+chromaprint pipeline of needle/src/audio/analyzer.rs:176-311 (a
different — also internally consistent — resampler basis)."""

import numpy as np
import pytest

from needle_tpu.fingerprint.jax_impl import (
    IngestDispatcher,
    _bucket_frames,
    fingerprint_ingest_jax_batch,
    resampled_length,
)
from needle_tpu.fingerprint.ingest_oracle import (
    decimate2_hb_np,
    ingest_hashes_full_oracle,
    ingest_hashes_window_oracle,
)
from needle_tpu.fingerprint.numpy_impl import num_frames, num_subfingerprints


def _lane_geometry(seg_len, n_valid, in_rate, channels):
    d = IngestDispatcher(in_rate, channels)
    n_dec = (n_valid // channels) // d.dec_factor
    n_res = resampled_length(n_dec * channels, d.mid_rate, channels)
    n_sub = num_subfingerprints(n_res)
    nf_b = _bucket_frames(num_frames(n_res))
    return d.dec_factor, nf_b, n_sub


def _noise(rng, n, amp=6000):
    # white noise concentrates classifier values near the trained
    # thresholds — the worst case for borderline flagging
    return (rng.standard_normal(n) * amp).astype(np.int16)


CASES = [
    (44100, 2, 8.0),  # stereo, factor-4 decimate cascade
    (16000, 1, 10.0),  # mono, factor-2 half-band
    (11025, 1, 10.0),  # mono, mid rate == 11025: no resample stage
    (22050, 2, 6.0),  # stereo, factor-2, then 11025 resample... (22050/2)
]


@pytest.mark.parametrize("in_rate,channels,secs", CASES)
def test_fused_ingest_matches_canonical_oracle(in_rate, channels, secs):
    rng = np.random.default_rng(in_rate + channels)
    n = int(in_rate * secs) * channels
    seg = _noise(rng, n)
    out = fingerprint_ingest_jax_batch([seg], in_rate, channels)[0]
    dec, nf_b, n_sub = _lane_geometry(len(seg), len(seg), in_rate, channels)
    oracle = ingest_hashes_full_oracle(
        seg, len(seg), in_rate, channels, dec, nf_b, n_sub
    )
    assert len(out) == n_sub
    np.testing.assert_array_equal(out, oracle)


def test_fused_ingest_respects_n_valid_masking():
    """Segments may extend past the true window; samples past n_valid are
    zeroed before the decimation FIR (whose ringing would otherwise leak
    the overhang into the window's hashes)."""
    rng = np.random.default_rng(5)
    in_rate, channels = 16000, 1
    n_valid = in_rate * 6
    seg = _noise(rng, in_rate * 8)  # 2 s of overhang past n_valid
    out = fingerprint_ingest_jax_batch([seg], in_rate, channels, [n_valid])[0]
    dec, nf_b, n_sub = _lane_geometry(len(seg), n_valid, in_rate, channels)
    oracle = ingest_hashes_full_oracle(
        seg, n_valid, in_rate, channels, dec, nf_b, n_sub
    )
    np.testing.assert_array_equal(out, oracle)
    # and the overhang must not have leaked: hashes equal the truncated
    # segment's (whose lane zero-padding is the canonical semantics)
    out2 = fingerprint_ingest_jax_batch(
        [seg[:n_valid]], in_rate, channels, [n_valid]
    )[0]
    np.testing.assert_array_equal(out, out2)


@pytest.mark.parametrize(
    "in_rate,channels,valid_frac",
    [
        (44100, 2, 1.0),  # factor-4 cascade, stereo
        (16000, 1, 1.0),  # factor-2 half-band, mono
        (16000, 1, 0.7),  # valid-count masking inside the lane
        (11025, 1, 1.0),  # no resample stage (direct mono window)
        (22050, 2, 0.8),  # factor-2 stereo + masking
    ],
)
def test_window_oracle_consistency(in_rate, channels, valid_frac):
    """Recomputing any [lo, hi) slice from only its dependency window
    (_prepare_mid_window + per-span resample) must reproduce the full
    oracle's values — the rescan relies on this for every rate family,
    decimation cascade, and valid-count mask position."""
    rng = np.random.default_rng(11)
    seg = _noise(rng, in_rate * channels * 10)
    n_valid = int(len(seg) * valid_frac) // channels * channels
    dec, nf_b, n_sub = _lane_geometry(len(seg), n_valid, in_rate, channels)
    full = ingest_hashes_full_oracle(
        seg, n_valid, in_rate, channels, dec, nf_b, n_sub
    )
    for lo, hi in [(0, 5), (17, 18), (n_sub - 4, n_sub), (3, n_sub - 3)]:
        win = ingest_hashes_window_oracle(
            seg, n_valid, in_rate, channels, dec, nf_b, lo, hi
        )
        np.testing.assert_array_equal(win, full[lo:hi])


def test_rescan_flags_fire_on_noise(monkeypatch):
    """The equality above must not be vacuous: with a paranoid margin the
    flag count is large, and the rescan output still equals the default
    margin's (all three — default, paranoid, and oracle — agree)."""
    import jax

    from needle_tpu import tracing

    rng = np.random.default_rng(7)
    seg = _noise(rng, 16000 * 6)
    out_default = fingerprint_ingest_jax_batch([seg], 16000, 1)[0]

    monkeypatch.setenv("NEEDLE_TPU_EXACT_EPS", "1e30")
    jax.clear_caches()  # the margin is baked at trace time
    flagged = {}
    orig = tracing.span

    def spy(name, **kw):
        if name == "ingest.rescan":
            flagged["n"] = kw.get("flagged", 0)
        return orig(name, **kw)

    monkeypatch.setattr(tracing, "span", spy)
    out_all = fingerprint_ingest_jax_batch([seg], 16000, 1)[0]
    monkeypatch.setattr(tracing, "span", orig)
    monkeypatch.delenv("NEEDLE_TPU_EXACT_EPS")
    jax.clear_caches()

    assert flagged.get("n", 0) == len(out_all)  # paranoid margin flags all
    np.testing.assert_array_equal(out_default, out_all)


@pytest.mark.parametrize(
    "in_rate,channels,dec_factor",
    [(44100, 2, 4), (16000, 1, 2), (22050, 2, 2), (11025, 1, 1), (8000, 2, 1)],
)
def test_prepare_mid_window_matches_whole_lane(in_rate, channels, dec_factor):
    """_prepare_mid_window must equal the whole-lane _ingest_prepare_mid on
    any slice, including windows reaching before the lane (negative global
    indices), past its end, and across the valid-count boundary."""
    from needle_tpu.fingerprint.ingest_oracle import (
        _ingest_prepare_mid,
        _prepare_mid_window,
    )

    rng = np.random.default_rng(in_rate * 7 + channels)
    in_len_mid = 4096
    raw_len = in_len_mid * channels * dec_factor
    seg = _noise(rng, raw_len - 1234)  # shorter than the bucket: zero-extend
    n_valid = (raw_len * 3 // 4) // channels * channels
    full = np.asarray(
        _ingest_prepare_mid(seg, n_valid, channels, dec_factor, in_len_mid),
        dtype=np.int64,
    )
    nv_mid = (min(n_valid, raw_len) // channels) // dec_factor
    for g_lo, g_hi in [
        (-50, 40),  # reaches before the lane
        (0, 130),
        (nv_mid - 64, nv_mid + 64),  # straddles the valid-count boundary
        (in_len_mid - 100, in_len_mid + 80),  # past the lane end
        (513, 514),
    ]:
        win = np.asarray(
            _prepare_mid_window(
                seg, n_valid, channels, dec_factor, in_len_mid, g_lo, g_hi
            ),
            dtype=np.int64,
        )
        expect = np.zeros(g_hi - g_lo, np.int64)
        a, b = max(0, g_lo), min(len(full), g_hi)
        if b > a:
            expect[a - g_lo : b - g_lo] = full[a:b]
        np.testing.assert_array_equal(win, expect)


def test_decimate_replica_three_ways():
    """decimate2_hb_np must be bit-identical to the native kernel and the
    device kernel — one integer semantics, three implementations."""
    from needle_tpu.fingerprint.decimate import _HB_MAIN, _halfband_q14

    rng = np.random.default_rng(3)
    odd_q, c0 = _halfband_q14(*_HB_MAIN)
    for channels in (1, 2):
        x = rng.integers(-32768, 32768, size=(4096, channels)).astype(np.int32)
        ref = decimate2_hb_np(x, odd_q, c0)

        from needle_tpu import ingest

        if ingest.native_available():
            nat = ingest.decimate2_hb(
                x.astype(np.int16).reshape(-1), channels, odd_q, c0
            )
            np.testing.assert_array_equal(
                nat.reshape(-1, channels).astype(np.int32), ref
            )

        from needle_tpu.fingerprint.jax_impl import _device_decimate2_hb_i32

        dev = np.asarray(_device_decimate2_hb_i32(x, odd_q, c0))
        np.testing.assert_array_equal(dev, ref)


def test_native_output_adoption_lifetime(rng=np.random.default_rng(3)):
    """Native decimator outputs are adopted zero-copy (_adopt_native_i16):
    the array must carry a base (not an owning copy), views must keep the
    native buffer alive after the parent is dropped, and values must match
    the canonical numpy halfband replica."""
    import gc

    from needle_tpu import ingest
    from needle_tpu.fingerprint.decimate import _HB_MAIN, _halfband_q14

    if not ingest.native_available():
        pytest.skip("native ingest unavailable")
    x = (rng.standard_normal(16000) * 8000).astype(np.int16)
    odd, c0 = _halfband_q14(*_HB_MAIN)
    y = ingest.decimate2_hb(x, 1, odd, c0)
    ref = decimate2_hb_np(x.reshape(-1, 1), odd, c0).reshape(-1)
    np.testing.assert_array_equal(y, ref.astype(np.int16))
    # zero-copy: the ndarray wraps the native buffer instead of owning a
    # fresh allocation (the old .copy() path had base None)
    assert y.base is not None
    view = y[100:200]
    snapshot = view.copy()
    del y
    gc.collect()
    np.testing.assert_array_equal(view, snapshot)  # buffer still alive
    del view
    gc.collect()  # finalizer frees the native buffer; must not crash
