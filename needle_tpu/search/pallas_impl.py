"""Pallas TPU kernel for the diagonal-run search.

The XLA tile kernel is HBM-traffic bound: XLA materializes ~30 bytes of
intermediates per (i, diagonal) cell (gathered dst, match matrix, cumsum
buffers), measured at ~2.5 ms per pair on v5e. This kernel streams both
hash vectors into VMEM/SMEM once per pair and walks i sequentially,
carrying run lengths in registers — HBM traffic is just the two hash
vectors in and one count block out.

Layout: each grid step processes a GROUP of 8 diagonal tiles as one
(8, 512) block — sublane = tile, lane = diagonal-within-tile — so every
vector op runs at full VPU width (the single-tile formulation's (1, 512)
ops wasted 7/8 sublanes and measured ~5x slower end-to-end). The dst
windows of the 8 tiles at row i are 8 CONSECUTIVE 512-wide rows of the
staged dst buffer, all at the same lane phase r = (i + offset) % 512, so
one pair of (8, 512) row blocks + two lane-rolls per row serves all 8
tiles; the blocks are re-extracted only when the phase wraps (once per
512 rows).

Mosaic TPU constraints shaped every access here:
  * dynamic vector loads must be (8, 128)-tile aligned -> dst lives in a
    row-aligned (rows, 512) VMEM buffer; row blocks come from 16-row
    aligned loads + dynamic sublane rolls (pltpu.roll), no size-1 slices;
  * src is staged to SMEM for per-row dynamic scalar reads;
  * the output block is written whole each grid step (read-modify-write
    accumulation) — size-1 tile-dim stores don't lower; the group's rows
    land via an 8-aligned dynamic_update_slice.

Exact against the NumPy oracle in interpreter mode (tests) and on
hardware (production default, NEEDLE_TPU_SEARCH).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D_TILE = 512
G_TILES = 8  # default diagonal tiles per grid step (sublane dimension)


def _popcount(x):
    one = jnp.uint32(1)
    v = x - ((x >> one) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    v = (v + (v >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> jnp.uint32(24)).astype(jnp.int32)


def _kernel(
    n_pad,  # true (unpadded-to-rows) sequence bucket, bound via partial
    g_tiles,  # diagonal tiles per grid step (8 or 16), bound via partial
    nv_ref, mv_ref, lm_ref, thr_ref,  # scalar prefetch: (chunk,) i32 each
    bm_ref,  # scalar prefetch: (chunk, n_groups) i32 row-block bitmasks
    src_hbm, dst_hbm,  # ANY: (chunk, n_rows, 512) u32 each (row-aligned)
    counts_ref,  # VMEM out block: (1, n_tiles_pad, D_TILE) i32
    src_sm, dst2d, sem,  # scratch: src in SMEM (dynamic scalar reads)
):
    p = pl.program_id(0)
    g = pl.program_id(1)
    # group g covers diagonal offsets [g*8*512, g*8*512 + 8*512) shifted
    # by -(n_pad-1); sublane k within the group is tile g*g_tiles + k
    d0 = g * (g_tiles * D_TILE) - (n_pad - 1)
    nv = nv_ref[p]
    mv = mv_ref[p]
    l_min = jnp.maximum(lm_ref[p], 1)
    thr = thr_ref[p]

    n_rows = dst_hbm.shape[1]
    # DMA slice starts/sizes on the row axis must be 8-aligned
    left_rows = -(-(-(-(n_pad - 1) // D_TILE)) // 8) * 8
    left = left_rows * D_TILE

    # Stage this pair's hash vectors once: scratch persists across grid
    # steps and the group axis g is innermost, so only the FIRST group of
    # a pair pays the HBM->VMEM/SMEM copies.
    @pl.when(g == 0)
    def _stage():
        cp_src = pltpu.make_async_copy(src_hbm.at[p], src_sm, sem.at[0])
        cp_dst = pltpu.make_async_copy(
            dst_hbm.at[p], dst2d.at[pl.ds(left_rows, n_rows), :], sem.at[1]
        )
        cp_src.start()
        cp_dst.start()
        # zero the pads while the DMAs fly
        dst2d[pl.ds(0, left_rows), :] = jnp.zeros(
            (left_rows, D_TILE), jnp.uint32
        )
        tail0 = left_rows + n_rows
        dst2d[pl.ds(tail0, dst2d.shape[0] - tail0), :] = jnp.zeros(
            (dst2d.shape[0] - tail0, D_TILE), jnp.uint32
        )
        cp_src.wait()
        cp_dst.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (g_tiles, D_TILE), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (g_tiles, D_TILE), 0)
    # diagonal offset per (sub, lane) cell relative to row i
    off = d0 + sub * D_TILE + lane

    # Row walk in phase blocks: the window of tile k at row i starts at
    # s_k = i + d0 + left + k*D_TILE — 8 consecutive 512-wide dst rows at
    # a common lane phase r = (i + d0 + left) % D_TILE. n_pad is a D_TILE
    # multiple, so d0 + left ≡ 1 (mod D_TILE): the phase wraps exactly at
    # i ≡ D_TILE-1. Each outer step b covers rows [b*D_TILE - 1,
    # (b+1)*D_TILE - 1) — constant base row q — extracts row blocks
    # A = dst2d[q .. q+8) and B = dst2d[q+1 .. q+9) once, and the inner
    # walk is two (8,512) lane-rolls + select + popcount + run update per
    # row. Rows i < 0 / i >= n_pad at the edges fail the validity mask
    # (S = 0), preserving the exact sequential run semantics.
    # Useful-row bounds for THIS (pair, group): a row i can only produce
    # S=1 if i ∈ [1, nv) and some lane's j = i + off hits [1, mv), i.e.
    # i ≥ 1 - off_max and i < mv - off_min. Off-center groups need only a
    # fraction of the blocks (for n=2400 in the 2560 bucket the second
    # group needs 2 of 6), and nv < n_pad trims the tail for every group —
    # 42% of all row-block work on the search1000 shape. Out-of-range
    # blocks are SKIPPED inside a statically-bounded loop (a dynamic
    # fori_loop trip count turned the outer loop into an scf.while whose
    # per-iteration overhead ate the entire win; the cond inside a static
    # loop keeps Mosaic's unrolling). Skipping preserves exactness: the
    # skipped rows are all S=0, the carry passes through unchanged, and a
    # run live at the truncated tail is closed by the same final-edge
    # accounting below that the full walk used.
    off_min = d0
    off_max = d0 + g_tiles * D_TILE - 1
    i_lo = jnp.maximum(1, 1 - off_max)
    i_hi = jnp.minimum(nv - 1, mv - 1 - off_min)  # inclusive
    n_blocks = n_pad // D_TILE + 1
    b_lo = jnp.clip((i_lo + 1) // D_TILE, 0, n_blocks)
    b_hi = jnp.clip((i_hi + 1) // D_TILE + 1, b_lo, n_blocks)
    # Prefilter row-block bitmask for this (pair, group): bit b set means
    # row block b may intersect a qualifying run on SOME diagonal of this
    # group (search/prefilter.py band bounds). Cleared blocks provably
    # contain no row of any qualifying run, so skipping them is exact
    # PROVIDED the carry is FLUSHED at the gap (see `flush_blk` below):
    # a live run with prev_run >= l_min at a gap entry is qualifying and
    # therefore cannot extend into the gap — it ends exactly there, so
    # counting it at the flush equals the full walk's accounting; a live
    # run with prev_run < l_min can never reach l_min (its continuation
    # would put qualifying-run rows inside the gap), so resetting it
    # drops only runs the full walk would also have dropped. A run that
    # starts inside a gap and qualifies is impossible for the same
    # reason, so re-entering the walk with zeroed carry is exact too.
    # All-ones masks (the default when the prefilter is off) make this a
    # no-op beyond the validity bounds above.
    bm = bm_ref[p, g]

    zero_i = jnp.zeros((g_tiles, D_TILE), jnp.int32)

    def blk(b, carry):
        def run_blk(carry):
            prev_S, prev_run, cand = carry
            i0 = b * D_TILE - 1
            s0 = i0 + d0 + left  # a D_TILE multiple (see above)
            q = s0 // D_TILE
            base16 = (q // 16) * 16
            rows32 = dst2d[pl.ds(base16, 32), :]
            rp = pltpu.roll(rows32, base16 - q, 0)  # row 0 = dst2d[q]
            A = rp[0:g_tiles, :].astype(jnp.int32)
            B = pltpu.roll(rp, 31, 0)[0:g_tiles, :].astype(jnp.int32)  # rp shifted by -1

            def rows8(rr, carry2):
                # 8-row unroll amortizes the scf.for per-iteration overhead
                prev_S, prev_run, cand = carry2
                for u in range(8):
                    r = rr * 8 + u
                    i = i0 + r
                    i_c = jnp.clip(i, 0, n_pad - 1)
                    j = i + off
                    rot_a = pltpu.roll(A, -r, 1)
                    rot_b = pltpu.roll(B, -r, 1)
                    dst_blk = jnp.where(
                        lane < (D_TILE - r), rot_a, rot_b
                    ).astype(jnp.uint32)
                    src_i = src_sm[i_c // D_TILE, i_c % D_TILE]
                    valid = (i >= 1) & (i < nv) & (j >= 1) & (j < mv)
                    S = ((_popcount(src_i ^ dst_blk) <= thr) & valid).astype(
                        jnp.int32
                    )
                    ends_prev = (prev_S == 1) & (S == 0)
                    cand = cand + jnp.where(
                        ends_prev & (prev_run >= l_min), 1, 0
                    )
                    prev_run = jnp.where(S == 1, prev_run * prev_S + 1, 0)
                    prev_S = S
                return prev_S, prev_run, cand

            return jax.lax.fori_loop(
                0, D_TILE // 8, rows8, carry
            )

        def flush_blk(carry):
            # close any live qualifying run at the gap boundary (exactness
            # argument above); identical to the final-edge accounting
            prev_S, prev_run, cand = carry
            cand = cand + jnp.where(
                (prev_S == 1) & (prev_run >= l_min), 1, 0
            )
            return zero_i, zero_i, cand

        # clamp the shift: for n_pad >= 16384, b can exceed 31 and an
        # int32 shift by >= 32 is implementation-defined in XLA. Masks
        # with n_blocks > 31 never reach this kernel (prefilter falls
        # back to the pair-level skip), so any such block carries the
        # all-ones mask and bit 31 (sign-filled) reads 1 — allowed.
        allowed = ((bm >> jnp.minimum(b, 31)) & 1) == 1
        return jax.lax.cond(
            (b >= b_lo) & (b < b_hi) & allowed, run_blk, flush_blk, carry
        )

    prev_S, prev_run, cand = jax.lax.fori_loop(
        0, n_blocks, blk, (zero_i, zero_i, zero_i)
    )
    # the final row's live runs end at the array edge
    cand = cand + jnp.where((prev_S == 1) & (prev_run >= l_min), 1, 0)

    # whole-block read-modify-write accumulation: the group's 8 count rows
    # land at row g*8 by zero-extending cand to the full block and
    # rotating sublanes by g*8 (dynamic_update_slice doesn't lower in
    # Mosaic; a dynamic-shift roll does, and the zero rows make the
    # rotation non-overlapping)
    prev = jnp.where(g == 0, 0, counts_ref[...])
    n_tiles_pad = counts_ref.shape[1]
    if n_tiles_pad == g_tiles:
        # single group: no placement needed (and a zero-row pad block is
        # not a legal Mosaic vector type)
        placed = cand
    else:
        padded = jnp.concatenate(
            [cand, jnp.zeros((n_tiles_pad - g_tiles, D_TILE), jnp.int32)],
            axis=0,
        )
        placed = pltpu.roll(padded, g * g_tiles, 0)
    counts_ref[...] = prev + placed[None, :, :]


def _resolve_g_tiles() -> int:
    """Group width: (16, 512) blocks were tried for big shapes (halving
    the grid-program count; the 32-row staged window serves either width)
    but measured ~17% SLOWER than 8 in an interleaved A/B on v5e
    (245 vs 290 ms per 512-pair chunk at n_pad=2560, r3) — the wider
    rolls/selects don't pipeline as well. 8 stays the default;
    NEEDLE_TPU_SEARCH_GTILES overrides for future hardware. Resolved
    OUTSIDE jit so each call re-reads the env and an invalid value always
    raises (an in-trace read froze at first compile); note that callers
    that are themselves jitted (e.g. _batch_pallas_bitmask) still bake
    the value in at their own trace time."""
    import os as _os

    g_tiles = int(_os.environ.get("NEEDLE_TPU_SEARCH_GTILES", "0")) or G_TILES
    if g_tiles not in (8, 16):
        # the staged dst window is 32 rows (kernel line `pl.ds(base16, 32)`
        # with q - base16 up to 15), so any width > 16 would silently read
        # wrapped rows — wrong counts, no error
        raise ValueError("NEEDLE_TPU_SEARCH_GTILES must be 8 or 16")
    return g_tiles


def n_groups_for(n_pad: int, g_tiles: int = None) -> int:
    """Grid groups the kernel walks for this bucket (the second grid axis);
    also the width of the per-pair row-block bitmask array."""
    g_tiles = g_tiles or _resolve_g_tiles()
    n_tiles = -(-(2 * n_pad - 1) // D_TILE)
    return -(-n_tiles // g_tiles)


def full_block_mask(n_pad: int) -> np.int32:
    """Bitmask walking every row block (prefilter disabled / pass-through).
    For buckets too long for a 31-bit mask, -1 keeps every block (i32
    arithmetic shift preserves the sign bit, so (bm >> b) & 1 == 1 for
    all b)."""
    n_blocks = n_pad // D_TILE + 1
    if n_blocks > 31:
        return np.int32(-1)
    return np.int32((np.int64(1) << n_blocks) - 1)


def batch_counts_pallas(
    nv_b, mv_b, lm_b, thr_b, src_b, dst_b, n_pad, bm_b=None, interpret=False
):
    """(chunk, n_pad) src/dst hash rows + per-pair scalars -> per-diagonal
    candidate counts (chunk, n_tiles*D_TILE) i32. Diagonal index d maps to
    offset d - (n_pad - 1). `bm_b` ((chunk, n_groups) i32, optional) is a
    per-(pair, group) row-block bitmask from the band prefilter; cleared
    blocks are skipped exactly (carry flushed at gaps)."""
    g_tiles = _resolve_g_tiles()
    if bm_b is None:
        bm_b = np.full(
            (np.shape(nv_b)[0], n_groups_for(n_pad, g_tiles)),
            full_block_mask(n_pad),
            np.int32,
        )
    return _batch_counts_pallas_jit(
        nv_b, mv_b, lm_b, thr_b, bm_b, src_b, dst_b, n_pad,
        g_tiles, interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("n_pad", "g_tiles", "interpret")
)
def _batch_counts_pallas_jit(
    nv_b, mv_b, lm_b, thr_b, bm_b, src_b, dst_b, n_pad, g_tiles,
    interpret=False,
):
    assert n_pad % D_TILE == 0, "pallas search requires n_pad % 512 == 0"
    chunk = src_b.shape[0]
    n_tiles = -(-(2 * n_pad - 1) // D_TILE)
    n_groups = -(-n_tiles // g_tiles)
    n_tiles_pad = n_groups * g_tiles
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
    ext_rows = left_rows + n_rows + n_tiles_pad + 33
    ext_rows = -(-ext_rows // 16) * 16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(chunk, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, n_tiles_pad, D_TILE), lambda p, g, *_: (p, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.SMEM((n_rows, D_TILE), jnp.uint32),
            pltpu.VMEM((ext_rows, D_TILE), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_pad, g_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (chunk, n_tiles_pad, D_TILE), jnp.int32
        ),
        interpret=interpret,
    )(nv_b, mv_b, lm_b, thr_b, bm_b, src_rows, dst_rows)
    return out[:, :n_tiles, :].reshape(chunk, n_tiles * D_TILE)
