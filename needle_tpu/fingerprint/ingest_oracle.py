"""Host canonical oracle for the fused device-ingest hash basis.

The fused TPU ingest program (jax_impl._ingest_fingerprint_batched) computes
[integer half-band decimate ->] integer downmix -> windowed-sinc polyphase
resample -> chromaprint TEST2 fingerprint in one jitted program. The integer
stages are bit-exactly replicated here; the resample and fingerprint stages
run the device's exact program STRUCTURE in float64 and cast each resampled
sample to f32 — defining a deterministic, backend-independent canonical
basis for the fused path's hashes. The device's f32 (MXU-emulated)
arithmetic approximates this basis within a measured error bound; hashes
whose quantization lands within NEEDLE_TPU_EXACT_EPS of a classifier or
norm-zeroing threshold are flagged on device and recomputed here
(jax_impl.IngestDispatcher), making the fused path's output EXACTLY this
oracle's output on every backend.

The reference instead resamples on host with libswresample and hashes with
C++ chromaprint (needle/src/audio/analyzer.rs:176-311); its hash basis
differs from this one by the resampler choice, which the search engine's
Hamming threshold absorbs (both bases are internally consistent, which is
what opening/ending detection needs).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .constants import (
    CHROMA_FILTER_COEFFS,
    FRAME_SIZE,
    HOP_SIZE,
    MAX_FILTER_WIDTH,
    SAMPLE_RATE,
)
from .numpy_impl import (
    chroma_features,
    chroma_filter,
    chroma_normalize,
    classify,
    num_frames,
    spectral_energy,
)

_RESCAN_EXTRA = (len(CHROMA_FILTER_COEFFS) - 1) + (MAX_FILTER_WIDTH - 1)  # 19


def decimate2_hb_np(x_2d: np.ndarray, odd_q, c0: int) -> np.ndarray:
    """Pure-NumPy replica of the half-band decimator's exact integer
    semantics — the single source of truth implemented three ways (native
    ni_decimate2_hb, device _device_decimate2_hb_i32, and this): zero-padded
    edges, Q14 taps, (acc + 8192) >> 14 arithmetic shift, clip to i16 range.
    Input/output are (frames, channels) int32 arrays; output has frames//2
    rows (output row k reads input rows 2k + offset)."""
    x = np.asarray(x_2d, dtype=np.int64)
    n, C = x.shape
    n_odd = len(odd_q)
    H = 2 * n_odd - 1
    out_n = n // 2
    pad_top = H + 1
    pad_bot = H + 1 + ((pad_top + n + H + 1) % 2)
    xp = np.concatenate(
        [np.zeros((pad_top, C), np.int64), x, np.zeros((pad_bot, C), np.int64)]
    )

    def sl(offset: int) -> np.ndarray:
        o = offset + pad_top
        return xp[o : o + 2 * out_n : 2]

    acc = np.int64(c0) * sl(0)
    for m, q in enumerate(np.asarray(odd_q)):
        d = 2 * m + 1
        acc = acc + np.int64(q) * (sl(-d) + sl(d))
    y = (acc + 8192) >> 14
    return np.clip(y, -32768, 32767).astype(np.int32)


def _ingest_prepare_mid(
    segment_i16: np.ndarray,
    n_valid: int,
    channels: int,
    dec_factor: int,
    in_len_mid: int,
) -> np.ndarray:
    """Raw interleaved segment -> float64 mono at the mid rate, replicating
    the device lane preparation exactly: zero-extend to the bucket's raw
    length, zero frames >= the valid count, integer half-band decimation
    with the same inter-stage masking, integer downmix."""
    from .decimate import _HB_MAIN, _HB_RELAXED, _halfband_q14

    raw_len = in_len_mid * channels * dec_factor
    seg = np.zeros(raw_len, np.int16)
    take = min(len(segment_i16), raw_len)
    seg[:take] = segment_i16[:take]
    x = seg.reshape(-1, channels).astype(np.int32)
    nv = min(int(n_valid), raw_len) // channels
    x[nv:] = 0
    if dec_factor > 1:
        nv1 = nv
        if dec_factor == 4:
            x = decimate2_hb_np(x, *_halfband_q14(*_HB_RELAXED))
            nv1 //= 2
            x[nv1:] = 0
        x = decimate2_hb_np(x, *_halfband_q14(*_HB_MAIN))
        nv1 //= 2
        x[nv1:] = 0
    if channels == 2:
        s = x[:, 0] + x[:, 1]
        mono = np.where(s < 0, -((-s) >> 1), s >> 1)
    else:
        mono = x[:, 0]
    return mono.astype(np.float64)


def resample_window_canonical(
    mono_mid_f64: np.ndarray, mid_rate: int, t_lo: int, t_hi: int
) -> np.ndarray:
    """Canonical 11025 Hz samples [t_lo, t_hi) of the device's block
    polyphase resample: the same f32 filter matrix and block decomposition
    (jax_impl._resample_inline), each output computed as a float64 dot and
    cast to f32 — sample-deterministic regardless of backend."""
    from .jax_impl import _RS_HALF_TAPS, _resample_plan

    L, M, k, mat = _resample_plan(mid_rate)
    H = _RS_HALF_TAPS
    kM, kL = k * M, k * L
    matd = mat.astype(np.float64)
    xpad = np.concatenate([np.zeros(H, np.float64), mono_mid_f64])
    b_lo, b_hi = t_lo // kL, (t_hi - 1) // kL + 1
    outs = []
    for b in range(b_lo, b_hi):
        w = xpad[b * kM : b * kM + kM + 2 * H]
        if len(w) < kM + 2 * H:  # tail block margin past the padded signal
            w = np.pad(w, (0, kM + 2 * H - len(w)))
        outs.append(w @ matd)
    out = np.concatenate(outs)[t_lo - b_lo * kL : t_hi - b_lo * kL]
    return out.astype(np.float32)


def _fingerprint_window_f32(mono_f32: np.ndarray, n_sub: int) -> np.ndarray:
    """Float-sample variant of numpy_impl's pipeline tail: (T,) f32 samples
    at 11025 Hz -> first n_sub u32 subfingerprints. Framing matches
    frame_signal; the window multiply matches spectral_energy's
    (f64 window * f64 sample) -> f32 cast for float input."""
    nf = num_frames(len(mono_f32))
    if nf <= 0 or n_sub <= 0:
        return np.zeros(0, np.uint32)
    x = np.ascontiguousarray(mono_f32, dtype=np.float32)
    frames = np.lib.stride_tricks.as_strided(
        x,
        shape=(nf, FRAME_SIZE),
        strides=(x.strides[0] * HOP_SIZE, x.strides[0]),
        writeable=False,
    )
    energy = spectral_energy(frames)
    normalized = chroma_normalize(chroma_filter(chroma_features(energy)))
    return classify(normalized)[:n_sub]


def ingest_hashes_window_oracle(
    segment_i16: np.ndarray,
    n_valid: int,
    in_rate: int,
    channels: int,
    dec_factor: int,
    nf_bucket: int,
    lo: int,
    hi: int,
) -> np.ndarray:
    """Canonical subfingerprints [lo, hi) of one fused-ingest lane,
    recomputed from only the raw samples they depend on. Subfingerprint i
    depends on resampled samples [i*HOP_SIZE, (i+19)*HOP_SIZE + FRAME_SIZE)
    and the dependency window starts on a hop boundary, so the pipeline run
    on that slice reproduces the global values exactly (the integer and
    resample stages are global-index-deterministic FIRs)."""
    from .jax_impl import _ROWS_PER_FRAME, _ingest_dims

    mid_rate = in_rate // dec_factor
    _, in_len_mid, out_needed = _ingest_dims(mid_rate, nf_bucket)
    pad_len = (nf_bucket + _ROWS_PER_FRAME + 1) * HOP_SIZE
    mono_mid = _ingest_prepare_mid(
        segment_i16, n_valid, channels, dec_factor, in_len_mid
    )
    t_lo = lo * HOP_SIZE
    t_hi = min(pad_len, (hi - 1 + _RESCAN_EXTRA) * HOP_SIZE + FRAME_SIZE)
    if mid_rate != SAMPLE_RATE:
        window = resample_window_canonical(mono_mid, mid_rate, t_lo, t_hi)
        # the device program truncates the resample output to out_needed
        # (== pad_len) and zero-extends; t_hi <= pad_len so nothing to do
    else:
        flat = np.zeros(pad_len, np.float32)
        take = min(len(mono_mid), pad_len)
        flat[:take] = mono_mid[:take].astype(np.float32)
        window = flat[t_lo:t_hi]
    return _fingerprint_window_f32(window, hi - lo)


def ingest_values_oracle(
    segment_i16: np.ndarray,
    n_valid: int,
    in_rate: int,
    channels: int,
    dec_factor: int,
    nf_bucket: int,
    n_sub: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Canonical pre-quantization classifier values (n_sub, 16) and
    per-frame chroma norms of one fused-ingest lane — the float64 oracle
    counterpart of jax_impl.ingest_classifier_values_jax, used by
    tools/hw_parity.py to measure the fused path's device-vs-canonical
    error on hardware."""
    from .jax_impl import _ROWS_PER_FRAME, _ingest_dims
    from .numpy_impl import _classifier_values

    mid_rate = in_rate // dec_factor
    _, in_len_mid, _ = _ingest_dims(mid_rate, nf_bucket)
    pad_len = (nf_bucket + _ROWS_PER_FRAME + 1) * HOP_SIZE
    mono_mid = _ingest_prepare_mid(
        segment_i16, n_valid, channels, dec_factor, in_len_mid
    )
    if mid_rate != SAMPLE_RATE:
        mono = resample_window_canonical(mono_mid, mid_rate, 0, pad_len)
    else:
        mono = np.zeros(pad_len, np.float32)
        take = min(len(mono_mid), pad_len)
        mono[:take] = mono_mid[:take].astype(np.float32)
    nf = num_frames(len(mono))
    x = np.ascontiguousarray(mono, dtype=np.float32)
    frames = np.lib.stride_tricks.as_strided(
        x,
        shape=(nf, FRAME_SIZE),
        strides=(x.strides[0] * HOP_SIZE, x.strides[0]),
        writeable=False,
    )
    filtered = chroma_filter(chroma_features(spectral_energy(frames)))
    norm = np.sqrt(np.sum(filtered * filtered, axis=1))
    return (
        _classifier_values(chroma_normalize(filtered))[:n_sub],
        norm,
    )


def ingest_hashes_full_oracle(
    segment_i16: np.ndarray,
    n_valid: int,
    in_rate: int,
    channels: int,
    dec_factor: int,
    nf_bucket: int,
    n_sub: int,
) -> np.ndarray:
    """Whole-lane canonical hashes (testing: the window recompute above must
    agree with this for any [lo, hi) split)."""
    return ingest_hashes_window_oracle(
        segment_i16, n_valid, in_rate, channels, dec_factor, nf_bucket,
        0, n_sub,
    )
