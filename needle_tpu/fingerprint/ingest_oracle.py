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

import functools as _functools
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
    """Raw interleaved segment -> INTEGER mono at the mid rate, replicating
    the device lane preparation exactly: zero-extend to the bucket's raw
    length, zero frames >= the valid count, integer half-band decimation
    with the same inter-stage masking, integer downmix. Returns an integer
    dtype (i16 for the pass-through mono case, i32 otherwise) — every
    sample is an exact integer, so downstream float conversion can happen
    per-block instead of whole-lane (the whole-lane f64 cast + pad copies
    were ~250 MB of memcpy per lane and dominated rescan cost once the
    1e-5 margin made flags rare)."""
    from .decimate import _HB_MAIN, _HB_RELAXED, _halfband_q14

    raw_len = in_len_mid * channels * dec_factor
    seg = np.zeros(raw_len, np.int16)
    take = min(len(segment_i16), raw_len)
    seg[:take] = segment_i16[:take]
    nv = min(int(n_valid), raw_len) // channels
    if channels == 1 and dec_factor == 1:
        seg[nv:] = 0
        return seg  # int16 view of the exact device lane input
    x = seg.reshape(-1, channels).astype(np.int32)
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
    return np.ascontiguousarray(mono)


@_functools.lru_cache(maxsize=None)
def _resample_matd(mid_rate: int):
    """(L, M, k, float64 filter operator) of the device resample plan —
    cached so repeated window recomputes don't rebuild it. The operator is
    scipy CSC when available: the filter matrix is banded (only 2H+1 of
    kM+2H rows are nonzero per output column — 65/384 at mid_rate 8000),
    so the dense f64 GEMM wasted ~6x FLOPs on structural zeros; the sparse
    product is ~2.5x faster measured and its accumulation (sequential over
    nonzeros in ascending tap order, scipy's csr_matvecs kernel) is the
    canonical f64 accumulation order. Dense fallback keeps the oracle
    working without scipy (f64-ulp accumulation differences vs the sparse
    path essentially never survive the f32 cast — 0 of 5.7M samples in a
    randomized check)."""
    from .jax_impl import _resample_plan

    L, M, k, mat = _resample_plan(mid_rate)
    matd = mat.astype(np.float64)
    try:
        import scipy.sparse as _sp

        matd = _sp.csc_matrix(matd)
    except ImportError:  # pragma: no cover - scipy is a baked-in dep here
        pass
    return L, M, k, matd


def _resample_spans(xpad_int: np.ndarray, mid_rate: int, spans) -> list:
    """Canonical 11025 Hz samples for several [t_lo, t_hi) output spans of
    the device's block polyphase resample (jax_impl._resample_inline):
    each output is the float64 dot of its block's input window with its
    filter column, cast to f32 — sample-deterministic regardless of
    backend. All blocks needed by all spans are gathered (deduplicated)
    into ONE row-batched product, so the filter operator streams from
    memory once instead of once per block. `xpad_int` is the
    half-taps-zero-padded mid-rate INTEGER mono signal, prepared ONCE by
    the caller; only the gathered block windows are cast to f64 (exact —
    the samples are integers), so whole-lane float copies never happen."""
    from .jax_impl import _RS_HALF_TAPS

    L, M, k, matd = _resample_matd(mid_rate)
    H = _RS_HALF_TAPS
    kM, kL = k * M, k * L
    blocks = sorted(
        {
            b
            for t_lo, t_hi in spans
            for b in range(t_lo // kL, (t_hi - 1) // kL + 1)
        }
    )
    b_arr = np.asarray(blocks, dtype=np.int64)
    b_max = int(b_arr[-1])
    need = b_max * kM + kM + 2 * H
    if len(xpad_int) < need:  # tail block margin past the padded signal
        xpad_int = np.pad(xpad_int, (0, need - len(xpad_int)))
    it = xpad_int.strides[0]
    W = np.lib.stride_tricks.as_strided(
        xpad_int,
        shape=(b_max + 1, kM + 2 * H),
        strides=(it * kM, it),
    )[b_arr].astype(np.float64)
    Y = np.asarray(W @ matd)  # (n_blocks, kL) float64
    pos = {b: i for i, b in enumerate(blocks)}
    out_spans = []
    for t_lo, t_hi in spans:
        b_lo, b_hi = t_lo // kL, (t_hi - 1) // kL + 1
        out = np.concatenate(
            [Y[pos[b]] for b in range(b_lo, b_hi)]
        )[t_lo - b_lo * kL : t_hi - b_lo * kL]
        out_spans.append(out.astype(np.float32))
    return out_spans


def resample_window_canonical(
    mono_mid_int: np.ndarray, mid_rate: int, t_lo: int, t_hi: int
) -> np.ndarray:
    """Single-span convenience wrapper over _resample_spans."""
    from .jax_impl import _RS_HALF_TAPS

    xpad = np.concatenate(
        [np.zeros(_RS_HALF_TAPS, mono_mid_int.dtype), mono_mid_int]
    )
    return _resample_spans(xpad, mid_rate, [(t_lo, t_hi)])[0]


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


def ingest_hashes_ranges_oracle(
    segment_i16: np.ndarray,
    n_valid: int,
    in_rate: int,
    channels: int,
    dec_factor: int,
    nf_bucket: int,
    ranges,
) -> list:
    """Canonical subfingerprints for several [lo, hi) ranges of one
    fused-ingest lane, each recomputed from only the raw samples it depends
    on. Subfingerprint i depends on resampled samples
    [i*HOP_SIZE, (i+19)*HOP_SIZE + FRAME_SIZE) and the dependency window
    starts on a hop boundary, so the pipeline run on that slice reproduces
    the global values exactly (the integer and resample stages are
    global-index-deterministic FIRs). The integer preparation, resample
    padding, and f64 filter matrix are shared across ranges — recomputing
    them per range made the rescan ~3x slower on flag-dense content."""
    from .jax_impl import _ROWS_PER_FRAME, _RS_HALF_TAPS, _ingest_dims

    mid_rate = in_rate // dec_factor
    _, in_len_mid, out_needed = _ingest_dims(mid_rate, nf_bucket)
    pad_len = (nf_bucket + _ROWS_PER_FRAME + 1) * HOP_SIZE
    mono_mid = _ingest_prepare_mid(
        segment_i16, n_valid, channels, dec_factor, in_len_mid
    )
    spans = []
    for lo, hi in ranges:
        t_lo = lo * HOP_SIZE
        t_hi = min(pad_len, (hi - 1 + _RESCAN_EXTRA) * HOP_SIZE + FRAME_SIZE)
        spans.append((t_lo, t_hi))
    if mid_rate != SAMPLE_RATE:
        # the device program truncates the resample output to out_needed
        # (== pad_len) and zero-extends; t_hi <= pad_len so nothing to do
        xpad = np.concatenate(
            [np.zeros(_RS_HALF_TAPS, mono_mid.dtype), mono_mid]
        )
        windows = _resample_spans(xpad, mid_rate, spans)
    else:
        flat = np.zeros(pad_len, np.float32)
        take = min(len(mono_mid), pad_len)
        flat[:take] = mono_mid[:take].astype(np.float32)
        windows = [flat[t_lo:t_hi] for t_lo, t_hi in spans]
    return [
        _fingerprint_window_f32(w, hi - lo)
        for w, (lo, hi) in zip(windows, ranges)
    ]


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
    """Single-range convenience wrapper over ingest_hashes_ranges_oracle."""
    return ingest_hashes_ranges_oracle(
        segment_i16, n_valid, in_rate, channels, dec_factor, nf_bucket,
        [(lo, hi)],
    )[0]


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
