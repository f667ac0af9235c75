"""Pallas TPU kernel for the diagonal-run search (EXPERIMENTAL).

The XLA tile kernel is HBM-traffic bound: XLA materializes ~30 bytes of
intermediates per (i, diagonal) cell (gathered dst, match matrix, cumsum
buffers), measured at ~2.5 ms per pair on v5e. This kernel streams both
hash vectors into VMEM/SMEM once per (pair, tile) step and walks i
sequentially, carrying run lengths in registers — HBM traffic is just the
two hash vectors in and one count block out.

Mosaic TPU constraints shaped every access here:
  * dynamic vector loads must be (8, 128)-tile aligned -> dst lives in a
    row-aligned (rows, 512) VMEM buffer; each sliding window is built from
    a 16-row aligned load + dynamic sublane/lane rotations (pltpu.roll)
    with mask-reduce row extraction (no size-1 slices);
  * src is staged to SMEM for per-row dynamic scalar reads;
  * the output block is written whole each grid step (read-modify-write
    accumulation over the tile axis) — size-1 tile-dim stores don't lower.

Status: EXPERIMENTAL — exact against the NumPy oracle in interpreter mode;
enable on hardware with NEEDLE_TPU_SEARCH=pallas.
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
    n_pad,  # true (unpadded-to-rows) sequence bucket, bound via partial
    nv_ref, mv_ref, lm_ref, thr_ref,  # scalar prefetch: (chunk,) i32 each
    src_hbm, dst_hbm,  # ANY: (chunk, n_rows, 512) u32 each (row-aligned)
    counts_ref,  # VMEM out block: (1, n_tiles_pad, D_TILE) i32
    src_sm, dst2d, sem,  # scratch: src in SMEM (dynamic scalar reads)
):
    p = pl.program_id(0)
    t = pl.program_id(1)
    d0 = t * D_TILE - (n_pad - 1)
    nv = nv_ref[p]
    mv = mv_ref[p]
    l_min = jnp.maximum(lm_ref[p], 1)
    thr = thr_ref[p]

    n_rows = dst_hbm.shape[1]
    # DMA slice starts/sizes on the row axis must be 8-aligned
    left_rows = -(-(-(-(n_pad - 1) // D_TILE)) // 8) * 8
    left = left_rows * D_TILE

    cp_src = pltpu.make_async_copy(src_hbm.at[p], src_sm, sem.at[0])
    cp_dst = pltpu.make_async_copy(
        dst_hbm.at[p], dst2d.at[pl.ds(left_rows, n_rows), :], sem.at[1]
    )
    cp_src.start()
    cp_dst.start()
    # zero the pads while the DMAs fly
    dst2d[pl.ds(0, left_rows), :] = jnp.zeros((left_rows, D_TILE), jnp.uint32)
    tail0 = left_rows + n_rows
    dst2d[pl.ds(tail0, dst2d.shape[0] - tail0), :] = jnp.zeros(
        (dst2d.shape[0] - tail0, D_TILE), jnp.uint32
    )
    cp_src.wait()
    cp_dst.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, D_TILE), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (16, D_TILE), 0)

    def window(start):
        """dst[start : start + D_TILE] via a 16-row aligned load, dynamic
        sublane rotation, mask-reduce row extraction, and lane rotation."""
        q = start // D_TILE
        r = start % D_TILE
        base8 = (q // 8) * 8
        rows16 = dst2d[pl.ds(base8, 16), :]
        rp = pltpu.roll(rows16, base8 - q, 0)  # row 0 = q, row 1 = q+1
        rp_i = rp.astype(jnp.int32)
        row0 = jnp.sum(jnp.where(sub16 == 0, rp_i, 0), axis=0, keepdims=True)
        row1 = jnp.sum(jnp.where(sub16 == 1, rp_i, 0), axis=0, keepdims=True)
        rot0 = pltpu.roll(row0, -r, 1)
        rot1 = pltpu.roll(row1, -r, 1)
        return jnp.where(lane < (D_TILE - r), rot0, rot1).astype(jnp.uint32)

    def body(b, carry):
        # all carries are i32 vectors (i1 vector loop state fails to
        # legalize in Mosaic's scf.for lowering)
        prev_S, prev_run, cand = carry
        for s in range(I_BLK):
            i = b * I_BLK + s
            j = i + d0 + lane  # (1, D_TILE) diagonal j indices at row i
            dst_row = window(i + d0 + left)
            src_i = src_sm[i // D_TILE, i % D_TILE]
            valid = (i >= 1) & (i < nv) & (j >= 1) & (j < mv)
            S = ((_popcount(src_i ^ dst_row) <= thr) & valid).astype(jnp.int32)
            ends_prev = (prev_S == 1) & (S == 0)
            cand = cand + jnp.where(ends_prev & (prev_run >= l_min), 1, 0)
            run = jnp.where(S == 1, prev_run * prev_S + 1, 0)
            prev_S, prev_run = S, run
        return prev_S, prev_run, cand

    zero_i = jnp.zeros((1, D_TILE), jnp.int32)
    prev_S, prev_run, cand = jax.lax.fori_loop(
        0, n_pad // I_BLK, body, (zero_i, zero_i, zero_i)
    )
    # the final row's live runs end at the array edge
    cand = cand + jnp.where((prev_S == 1) & (prev_run >= l_min), 1, 0)

    # whole-block read-modify-write: size-1 stores on tiled dims don't
    # lower, so each t step writes the full (n_tiles_pad, D_TILE) block
    # with its own row updated (the block stays resident across t steps).
    row_sel = jax.lax.broadcasted_iota(jnp.int32, counts_ref.shape, 1) == t
    prev = jnp.where(t == 0, 0, counts_ref[...])
    counts_ref[...] = prev + jnp.where(row_sel, cand[None, :, :], 0)


@functools.partial(
    jax.jit, static_argnames=("n_pad", "interpret")
)
def batch_counts_pallas(
    nv_b, mv_b, lm_b, thr_b, src_b, dst_b, n_pad, interpret=False
):
    """(chunk, n_pad) src/dst hash rows + per-pair scalars -> per-diagonal
    candidate counts (chunk, n_tiles*D_TILE) i32. Diagonal index d maps to
    offset d - (n_pad - 1)."""
    assert n_pad % D_TILE == 0, "pallas search requires n_pad % 512 == 0"
    chunk = src_b.shape[0]
    n_tiles = -(-(2 * n_pad - 1) // D_TILE)
    n_tiles_pad = -(-n_tiles // 8) * 8  # output block sublane alignment
    # src/dst reshaped to aligned rows: slicing one pair out of a 2-D
    # tiled HBM array for the DMA violates (8,128) tiling, but a dim-0
    # slice of a 3-D array keeps the tiled trailing dims whole
    n_rows = -(--(-n_pad // D_TILE) // 8) * 8  # 8-aligned row count
    pad_cols = n_rows * D_TILE - n_pad
    src_rows = jnp.pad(src_b, ((0, 0), (0, pad_cols))).reshape(
        chunk, n_rows, D_TILE
    )
    dst_rows = jnp.pad(dst_b, ((0, 0), (0, pad_cols))).reshape(
        chunk, n_rows, D_TILE
    )
    left_rows = -(-(-(-(n_pad - 1) // D_TILE)) // 8) * 8
    ext_rows = left_rows + n_rows + n_tiles + 17
    ext_rows = -(-ext_rows // 16) * 16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(chunk, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, n_tiles_pad, D_TILE), lambda p, t, *_: (p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.SMEM((n_rows, D_TILE), jnp.uint32),
            pltpu.VMEM((ext_rows, D_TILE), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (chunk, n_tiles_pad, D_TILE), jnp.int32
        ),
        interpret=interpret,
    )(nv_b, mv_b, lm_b, thr_b, src_rows, dst_rows)
    return out[:, :n_tiles, :].reshape(chunk, n_tiles * D_TILE)
