"""Pallas search kernel (experimental) vs the host oracle, interpret mode."""

import numpy as np

from needle_tpu.search.jax_impl import _diag_candidates
from needle_tpu.search.pallas_impl import batch_counts_pallas


def test_pallas_counts_match_oracle(rng):
    n_pad, chunk = 256, 4
    shared = rng.integers(0, 2**32, size=40, dtype=np.uint32)
    src = rng.integers(0, 2**32, size=(chunk, n_pad), dtype=np.uint32)
    dst = rng.integers(0, 2**32, size=(chunk, n_pad), dtype=np.uint32)
    nv = np.array([200, 256, 150, 90], np.int32)
    mv = np.array([220, 256, 100, 250], np.int32)
    for r in range(chunk):
        src[r, 30:70] = shared
        dst[r, 50:90] = shared
    lm = np.array([10, 40, 41, 5], np.int32)
    thr = np.array([10, 10, 10, 0], np.int32)
    out = np.asarray(
        batch_counts_pallas(nv, mv, lm, thr, src, dst, n_pad, interpret=True)
    )
    for r in range(chunk):
        for d in range(out.shape[1]):
            o = d - (n_pad - 1)
            cands = _diag_candidates(
                src[r][: nv[r]], dst[r][: mv[r]], o, int(thr[r])
            )
            expect = sum(1 for (_, _, L) in cands if L >= lm[r])
            assert expect == out[r, d], (r, o, expect, out[r, d])
