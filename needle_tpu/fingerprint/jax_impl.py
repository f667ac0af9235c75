"""Batched JAX/XLA fingerprint pipeline (the TPU path).

TPU-first reformulation of the chromaprint TEST2 algorithm (the reference
calls into C++ chromaprint per-sample-stream; needle/src/audio/analyzer.rs:
176-311). Design notes:

  * Framing without gathers: the signal is padded to a multiple of the hop
    (1365) and reshaped to rows; each 4096-sample frame is rows f..f+2 plus
    one sample of row f+3 (4096 = 3*1365 + 1), assembled from 4 shifted
    slices + concat — pure layout ops XLA fuses well.
  * The Hamming window is folded into a real DFT-as-matmul: two (4096 x B)
    matrices (cos/sin, restricted to the B=1298 spectral bins chroma actually
    uses) drive the MXU instead of an FFT — large, static, batched matmuls
    are the fastest thing on TPU and XLA cannot tile small strided FFTs onto
    the MXU nearly as well. FLOPs/frame ~21 MF; a 28-episode season is only
    ~3.5 TF.
  * Chroma fold is a second small matmul; the temporal chroma filter is 5
    shifted adds; normalization is a VPU rowwise op.
  * The 16 trained classifiers are expressed as ONE (192 x 32) matmul over
    unfolded 16-frame windows (classifier_window_matrix), replacing the
    reference's sequential integral-image walk, followed by threshold
    compares, gray-coding, and bit-packing.

Matmuls run with Precision.HIGHEST (f32 accumulation) so quantized classifier
levels agree with the scalar pipeline except for values within float noise of
a trained threshold (~0.05% of hashes, 1 gray-code bit each; the search
engine's Hamming threshold absorbs these).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .._jax_setup import ensure as _jax_setup_ensure

_jax_setup_ensure()

from .constants import (
    CHROMA_FILTER_COEFFS,
    CHROMA_NORM_THRESHOLD,
    FRAME_SIZE,
    HOP_SIZE,
    MAX_FILTER_WIDTH,
    NUM_BANDS,
    QUANTIZER_THRESHOLDS,
    SAMPLE_RATE,
    WINDOW_SCALE,
    chroma_bin_ranges,
    classifier_window_matrix,
    hamming_window,
)
from .numpy_impl import num_frames, num_subfingerprints

_PREC = jax.lax.Precision.HIGHEST

# 4096 = 3 * 1365 + 1
_ROWS_PER_FRAME = FRAME_SIZE // HOP_SIZE  # 3
_FRAME_REMAINDER = FRAME_SIZE - _ROWS_PER_FRAME * HOP_SIZE  # 1


@functools.lru_cache(maxsize=1)
def _dft_tables() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(windowed cos table, windowed sin table, chroma fold matrix)."""
    min_idx, max_idx, notes = chroma_bin_ranges()
    window = hamming_window(FRAME_SIZE, WINDOW_SCALE)  # float64
    n = np.arange(FRAME_SIZE, dtype=np.float64)[:, None]
    k = np.arange(min_idx, max_idx, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / FRAME_SIZE
    wc = (window[:, None] * np.cos(ang)).astype(np.float32)
    ws = (window[:, None] * -np.sin(ang)).astype(np.float32)
    fold = np.zeros((max_idx - min_idx, NUM_BANDS), dtype=np.float32)
    fold[np.arange(max_idx - min_idx), notes] = 1.0
    return wc, ws, fold


@functools.lru_cache(maxsize=1)
def _classifier_tables() -> Tuple[np.ndarray, np.ndarray]:
    W, _ = classifier_window_matrix()
    return W.astype(np.float32), QUANTIZER_THRESHOLDS.astype(np.float32)


def _frames_from_padded(x: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """(T,) f32 signal (padded so that rows exist) -> (n_frames, 4096)."""
    n_rows = n_frames + _ROWS_PER_FRAME  # enough rows for slicing below
    rows = x[: n_rows * HOP_SIZE].reshape(n_rows, HOP_SIZE)
    a = rows[:n_frames]
    b = rows[1 : n_frames + 1]
    c = rows[2 : n_frames + 2]
    d = rows[3 : n_frames + 3, :_FRAME_REMAINDER]
    return jnp.concatenate([a, b, c, d], axis=1)


def _pack_bits(gray: jnp.ndarray) -> jnp.ndarray:
    shifts = 2 * (15 - jnp.arange(16, dtype=jnp.uint32))
    vals = gray << shifts[None, :]
    out = vals[:, 0]
    for k in range(1, 16):
        out = out | vals[:, k]
    return out


_device_tables_cache = {}


def _device_tables():
    """DFT/classifier tables uploaded once per process and passed as jit
    ARGUMENTS — baking them in as HLO constants (~42 MB) made remote TPU
    compiles take minutes."""
    key = "tables"
    if key not in _device_tables_cache:
        wc, ws, fold = _dft_tables()
        W_cls, thresholds = _classifier_tables()
        _device_tables_cache[key] = tuple(
            jax.device_put(t) for t in (wc, ws, fold, W_cls, thresholds)
        )
    return _device_tables_cache[key]


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _fingerprint_core_batched(batch_i16, wc, ws, fold, W_cls, thresholds, n_frames):
    return jax.vmap(
        lambda x: _fingerprint_core_inline(
            x.astype(jnp.float32), wc, ws, fold, W_cls, thresholds, n_frames
        )
    )(batch_i16)


def _fingerprint_core_inline(mono_f32, wc, ws, fold, W_cls, thresholds, n_frames):
    frames = _frames_from_padded(mono_f32, n_frames)
    re = jnp.dot(frames, wc, precision=_PREC)
    im = jnp.dot(frames, ws, precision=_PREC)
    energy = re * re + im * im
    chroma = jnp.dot(energy, fold, precision=_PREC)
    n_filt = n_frames - (len(CHROMA_FILTER_COEFFS) - 1)
    filtered = jnp.zeros((n_filt, NUM_BANDS), jnp.float32)
    for k_i, coeff in enumerate(CHROMA_FILTER_COEFFS):
        filtered = filtered + jnp.float32(coeff) * chroma[k_i : k_i + n_filt]
    norm = jnp.sqrt(jnp.sum(filtered * filtered, axis=1, keepdims=True))
    normalized = jnp.where(
        norm < CHROMA_NORM_THRESHOLD, 0.0, filtered / jnp.where(norm == 0, 1.0, norm)
    )
    n_sub = n_filt - (MAX_FILTER_WIDTH - 1)
    windows = jnp.concatenate(
        [normalized[k : k + n_sub] for k in range(MAX_FILTER_WIDTH)], axis=1
    )
    ab = jnp.dot(windows, W_cls, precision=_PREC)
    a, b = ab[:, 0::2], ab[:, 1::2]
    values = jnp.log((1.0 + a) / (1.0 + b))
    q = (
        (values >= thresholds[None, :, 0]).astype(jnp.uint32)
        + (values >= thresholds[None, :, 1]).astype(jnp.uint32)
        + (values >= thresholds[None, :, 2]).astype(jnp.uint32)
    )
    gray = jnp.array([0, 1, 3, 2], jnp.uint32)[q]
    return _pack_bits(gray)


def _bucket_frames(n_frames: int) -> int:
    """Round frame counts up to limit recompilation (powers-of-two-ish)."""
    if n_frames <= 256:
        return 256
    b = 256
    while b < n_frames:
        b *= 2
    for q in (b // 2 + b // 8, b // 2 + b // 4, b // 2 + 3 * b // 8, b // 2 + b // 2):
        if n_frames <= q:
            return q
    return b


def downmix_stereo_i16_jnp(interleaved: jnp.ndarray) -> jnp.ndarray:
    """Stereo -> mono with C truncation-toward-zero semantics, on device."""
    x = interleaved.reshape(-1, 2).astype(jnp.int32)
    s = x[:, 0] + x[:, 1]
    return jnp.where(s < 0, -((-s) >> 1), s >> 1).astype(jnp.float32)


def fingerprint_jax(mono_i16: np.ndarray) -> np.ndarray:
    """mono i16 @ 11025 Hz -> u32 subfingerprints, computed on the JAX
    default backend (TPU when available)."""
    return fingerprint_jax_batch([mono_i16])[0]


def fingerprint_jax_stereo(interleaved_i16: np.ndarray) -> np.ndarray:
    """Stereo interleaved i16 @ 11025 Hz -> subfingerprints (downmix on
    host to preserve exact C semantics, cheap)."""
    from .numpy_impl import downmix_stereo_i16

    return fingerprint_jax(downmix_stereo_i16(interleaved_i16))


def fingerprint_jax_batch(monos: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Fingerprint a batch of mono i16 episodes.

    Episodes are padded to a shared frame bucket and processed as one
    batched call via vmap, uploaded as int16 (half the transfer bytes) —
    the episodes axis is the natural data-parallel axis on TPU (and shards
    over meshes; see needle_tpu.parallel).
    """
    monos = [np.asarray(m, dtype=np.int16) for m in monos]
    n_subs = [num_subfingerprints(len(m)) for m in monos]
    if not monos:
        return []
    if max(n_subs) <= 0:
        return [np.zeros(0, np.uint32) for _ in monos]
    nf_b = _bucket_frames(max(num_frames(len(m)) for m in monos))
    pad_len = (nf_b + _ROWS_PER_FRAME + 1) * HOP_SIZE
    batch = np.zeros((len(monos), pad_len), np.int16)
    for r, m in enumerate(monos):
        batch[r, : len(m)] = m
    from ..parallel import shard_batch

    device_batch, _ = shard_batch(batch)
    out = _fingerprint_core_batched(device_batch, *_device_tables(), nf_b)
    out = np.asarray(out)
    return [out[r, :max(0, n)].astype(np.uint32) for r, n in enumerate(n_subs)]
