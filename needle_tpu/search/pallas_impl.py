"""Pallas TPU kernel for the diagonal-run search (EXPERIMENTAL).

The XLA tile kernel is HBM-traffic bound: XLA materializes ~30 bytes of
intermediates per (i, diagonal) cell (gathered dst, match matrix, cumsum
buffers), measured at ~2.5 ms per pair on v5e. This kernel streams both
hash vectors into VMEM once per (pair, tile) step and walks i sequentially,
carrying run lengths in VMEM — HBM traffic is just the two hash vectors in
and one count vector out.

Grid: (pairs, diagonal_tiles). All slice starts are dynamic with static
sizes (pl.ds), shapes are lane-aligned (D_TILE = 512 = 4x128), and
validity comes from index arithmetic — no gathers, no tables. dst is
staged into an extended VMEM buffer with (n_pad-1) zeros on the left so a
row's diagonal window dst[i + o], o in [d0, d0+D_TILE), is always one
in-bounds contiguous slice.

Status: EXPERIMENTAL — exact against the NumPy oracle in interpreter
mode. Real-TPU lowering is blocked on Mosaic's alignment prover: the
per-row sliding window load `dst_ext[pl.ds(i + d0 + left, D_TILE)]`
advances by one element per row and Mosaic requires dynamic 512-wide
vector loads be provably 1024-aligned. Known candidate workarounds for a
future round: (a) aligned 2-row loads + tpu.dynamic_rotate (pltpu.roll)
lane extraction, (b) shift-by-one rolling window with a masked scalar
insert per row, (c) per-tile re-DMA of the shifted window. Measured XLA
baseline this kernel targets: ~2.5 ms/pair, ~30 B/cell HBM traffic.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D_TILE = 512
I_BLK = 8  # i rows per inner step


def _popcount(x):
    one = jnp.uint32(1)
    v = x - ((x >> one) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    v = (v + (v >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> jnp.uint32(24)).astype(jnp.int32)


def _kernel(
    nv_ref, mv_ref, lm_ref, thr_ref,  # scalar prefetch: (chunk,) i32 each
    src_hbm, dst_hbm,  # ANY: (chunk, n_pad) u32
    counts_ref,  # VMEM out block: (1, n_tiles, D_TILE) i32 (whole pair row)
    src_v, dst_ext, sem,  # scratch
):
    p = pl.program_id(0)
    t = pl.program_id(1)
    n_pad = src_v.shape[0]
    d0 = t * D_TILE - (n_pad - 1)
    nv = nv_ref[p]
    mv = mv_ref[p]
    l_min = jnp.maximum(lm_ref[p], 1)
    thr = thr_ref[p]

    left = n_pad - 1  # zeros before dst so i + d0 + left >= 0 always
    cp1 = pltpu.make_async_copy(src_hbm.at[p], src_v, sem.at[0])
    cp2 = pltpu.make_async_copy(
        dst_hbm.at[p], dst_ext.at[pl.ds(left, n_pad)], sem.at[1]
    )
    cp1.start()
    cp2.start()
    # zero the pads while the DMAs fly (values there are masked by index
    # validity anyway, but keep the buffer deterministic)
    dst_ext[pl.ds(0, left)] = jnp.zeros((n_pad - 1,), jnp.uint32)
    tail = dst_ext.shape[0] - left - n_pad
    dst_ext[pl.ds(left + n_pad, tail)] = jnp.zeros((tail,), jnp.uint32)
    cp1.wait()
    cp2.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D_TILE), 1)

    def body(b, carry):
        run, prev_S, prev_run, cand = carry
        for s in range(I_BLK):
            i = b * I_BLK + s
            j = i + d0 + lane  # (1, D_TILE) diagonal j indices at row i
            start = i + d0 + left  # >= 0 by construction
            dst_row = dst_ext[pl.ds(start, D_TILE)].reshape(1, D_TILE)
            src_i = src_v[pl.ds(i, 1)].reshape(1, 1)
            valid = (i >= 1) & (i < nv) & (j >= 1) & (j < mv)
            S = (_popcount(src_i ^ dst_row) <= thr) & valid
            ends_prev = prev_S & ~S
            cand = cand + jnp.where(ends_prev & (prev_run >= l_min), 1, 0)
            run = jnp.where(S, run + 1, 0)
            prev_S, prev_run = S, run
        return run, prev_S, prev_run, cand

    zero_b = jnp.zeros((1, D_TILE), bool)
    zero_i = jnp.zeros((1, D_TILE), jnp.int32)
    run, prev_S, prev_run, cand = jax.lax.fori_loop(
        0, n_pad // I_BLK, body, (zero_i, zero_b, zero_i, zero_i)
    )
    # the final row's live runs end at the array edge
    cand = cand + jnp.where(prev_S & (prev_run >= l_min), 1, 0)
    counts_ref[0, pl.ds(t, 1), :] = cand.reshape(1, D_TILE)


@functools.partial(
    jax.jit, static_argnames=("n_pad", "interpret")
)
def batch_counts_pallas(
    nv_b, mv_b, lm_b, thr_b, src_b, dst_b, n_pad, interpret=False
):
    """(chunk, n_pad) src/dst hash rows + per-pair scalars -> per-diagonal
    candidate counts (chunk, n_tiles*D_TILE) i32. Diagonal index d maps to
    offset d - (n_pad - 1)."""
    chunk = src_b.shape[0]
    n_tiles = -(-(2 * n_pad - 1) // D_TILE)
    ext_len = (n_pad - 1) + n_pad + n_tiles * D_TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(chunk, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        # one whole (n_tiles, D_TILE) row per pair: TPU requires the
        # second-to-last block dim be 8-divisible or full-size, so the t
        # steps revisit the pair's block and store their own tile slice
        out_specs=pl.BlockSpec(
            (1, n_tiles, D_TILE), lambda p, t, *_: (p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad,), jnp.uint32),
            pltpu.VMEM((ext_len,), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((chunk, n_tiles, D_TILE), jnp.int32),
        interpret=interpret,
    )(nv_b, mv_b, lm_b, thr_b, src_b, dst_b)
    return out.reshape(chunk, n_tiles * D_TILE)
