"""Pallas TPU kernel: fused framing + Hamming window + DFT energy.

The XLA pipeline materializes the (n_frames, 4096) frame matrix in HBM
(~84 MB per 10-minute lane) before the two DFT matmuls read it back. This
kernel DMAs each block's signal slice from HBM into VMEM scratch, builds
the frame block there (overlapping 4096-sample windows on a 1365 hop are
three hop-rows plus one sample — a reshape + concat, no gathers), runs
both windowed-DFT matmuls on the MXU, and writes only the spectral
energies: HBM traffic drops from ~3x frames-size to signal + energies.

Grid: (frame_blocks, k_blocks). Per step VMEM: signal scratch (~1.4 MB),
wc/ws table tiles (2 x 2 MB), the on-the-fly frame block (~4 MB), energy
out tile (128 KB) — comfortably under 16 MB.

Status: EXPERIMENTAL — correctness is pinned by interpreter-mode tests
against the NumPy oracle stage, and the lane axis rides the Pallas grid
(ANY-space inputs cannot be vmap-batched). The current Mosaic toolchain
cannot lower the hop-1365 (non-lane-aligned) frame reshape for real-TPU
execution, so NEEDLE_TPU_SPECTRAL=pallas takes effect on CPU/interpret
runs while hardware uses the XLA matmul formulation (which the compiler
already fuses onto the MXU; measured within noise of this kernel's
projected traffic savings at current batch sizes).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .constants import FRAME_SIZE, HOP_SIZE

F_BLK = 256  # frames per grid step
K_BLK = 128  # spectral columns per grid step
_ROWS = FRAME_SIZE // HOP_SIZE  # 3
_REM = FRAME_SIZE - _ROWS * HOP_SIZE  # 1
# signal rows needed to build F_BLK frames: F_BLK + 3 (for the +3 row shift)
_SIG_ROWS = F_BLK + _ROWS
_SIG_LEN = _SIG_ROWS * HOP_SIZE


def _kernel(sig_ref, wc_ref, ws_ref, out_ref, sig_vmem, sem):
    b = pl.program_id(0)
    fb = pl.program_id(1)
    # HBM -> VMEM staging: ANY/HBM refs cannot be loaded directly on TPU,
    # and the lane axis must live in the grid (not vmap) because ANY-space
    # inputs only support whole-array blocks with a trivial index_map.
    copy = pltpu.make_async_copy(
        sig_ref.at[b, pl.ds(fb * F_BLK * HOP_SIZE, _SIG_LEN)], sig_vmem, sem
    )
    copy.start()
    copy.wait()
    rows = sig_vmem[...].reshape(_SIG_ROWS, HOP_SIZE)
    frames = jnp.concatenate(
        [
            rows[:F_BLK],
            rows[1 : F_BLK + 1],
            rows[2 : F_BLK + 2],
            rows[3 : F_BLK + 3, :_REM],
        ],
        axis=1,
    )
    re = jnp.dot(frames, wc_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, ws_ref[...], preferred_element_type=jnp.float32)
    out_ref[0, :, :] = re * re + im * im


def _dft_energy_pallas_grid(sig_b, wc, ws, n_frames, interpret):
    """(B, T) f32 signals -> (B, nf_pad, k_pad) f32 spectral energies with
    the lane axis in the Pallas grid."""
    k_pad = wc.shape[1]
    assert k_pad % K_BLK == 0, "pad DFT tables to a K_BLK multiple"
    nf_pad = -(-n_frames // F_BLK) * F_BLK
    B = sig_b.shape[0]
    grid = (B, nf_pad // F_BLK, k_pad // K_BLK)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (FRAME_SIZE, K_BLK), lambda b, fb, kb: (0, kb),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (FRAME_SIZE, K_BLK), lambda b, fb, kb: (0, kb),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, F_BLK, K_BLK), lambda b, fb, kb: (b, fb, kb),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nf_pad, k_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_SIG_LEN,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig_b, wc, ws)


def spectral_energy_pallas_batched(
    sig_b, wc, ws, n_frames: int, interpret: bool = False
):
    """Batched spectral-energy stage: (B, T) f32 -> (B, n_frames, n_bins).

    wc/ws are the DEVICE table arguments threaded through the outer jit
    (fingerprint.jax_impl._device_tables) — padding them to a K_BLK
    multiple here is a cheap traced op, whereas baking host tables into
    the trace would embed ~46 MB of constants per compiled program.
    """
    k = wc.shape[1]
    k_pad = -(-k // K_BLK) * K_BLK
    if k_pad != k:
        wc = jnp.pad(wc, ((0, 0), (0, k_pad - k)))
        ws = jnp.pad(ws, ((0, 0), (0, k_pad - k)))
    nf_pad = -(-n_frames // F_BLK) * F_BLK
    need = (nf_pad + _ROWS + 1) * HOP_SIZE
    pad = max(0, need - sig_b.shape[1])
    if pad:
        sig_b = jnp.pad(sig_b, ((0, 0), (0, pad)))
    out = _dft_energy_pallas_grid(sig_b, wc, ws, n_frames, interpret)
    return out[:, :n_frames, :k]


def spectral_energy_pallas(
    sig_padded, wc, ws, n_frames: int, interpret: bool = False
):
    """Single-lane wrapper: (T,) f32 -> (n_frames, n_bins) f32."""
    return spectral_energy_pallas_batched(
        sig_padded[None, :], wc, ws, n_frames, interpret=interpret
    )[0]
