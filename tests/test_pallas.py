"""Pallas fused framing+DFT kernel vs the NumPy oracle (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from needle_tpu.fingerprint.numpy_impl import frame_signal, spectral_energy
from needle_tpu.fingerprint.pallas_impl import spectral_energy_pallas
from needle_tpu.fingerprint.constants import HOP_SIZE, chroma_bin_ranges
from needle_tpu.fingerprint.jax_impl import _ROWS_PER_FRAME


def test_dft_energy_matches_oracle(rng):
    mono = (rng.standard_normal(11025 * 40) * 6000).astype(np.int16)
    frames = frame_signal(mono)
    min_idx, max_idx, _ = chroma_bin_ranges()
    ref = spectral_energy(frames)[:, min_idx:max_idx]  # chroma-used bins
    n_frames = ref.shape[0]

    from needle_tpu.fingerprint.jax_impl import _dft_tables

    wc, ws, _ = _dft_tables()
    pad_len = (n_frames + _ROWS_PER_FRAME + 1) * HOP_SIZE
    sig = np.zeros(pad_len, np.float32)
    sig[: len(mono)] = mono.astype(np.float32)
    out = np.asarray(
        spectral_energy_pallas(
            jnp.asarray(sig), jnp.asarray(wc), jnp.asarray(ws), n_frames,
            interpret=True,
        )
    )
    assert out.shape == ref.shape
    rel = np.abs(out - ref) / (np.abs(ref) + 1e3)
    assert rel.max() < 5e-4, f"max rel err {rel.max()}"


def test_full_pipeline_with_pallas_spectral(rng, monkeypatch):
    """Hashes through the pallas spectral stage match the default path."""
    from needle_tpu.fingerprint import jax_impl as J
    from needle_tpu.search.oracle import popcount_u32

    mono = (rng.standard_normal(11025 * 30) * 6000).astype(np.int16)
    base = J.fingerprint_jax(mono)
    monkeypatch.setattr(J, "_SPECTRAL", "pallas")
    # distinct jit cache entries come from the pallas branch itself
    J._fingerprint_core_batched.clear_cache()
    try:
        h = J.fingerprint_jax(mono)
    finally:
        J._fingerprint_core_batched.clear_cache()
    d = popcount_u32(np.asarray(base) ^ np.asarray(h))
    assert d.max() <= 2
    assert d.mean() < 0.05
