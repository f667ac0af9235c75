"""Pallas search kernel (experimental) vs the host oracle, interpret mode."""

import numpy as np

from needle_tpu.search.jax_impl import _diag_candidates
from needle_tpu.search.pallas_impl import batch_counts_pallas


def test_pallas_counts_match_oracle(rng):
    n_pad, chunk = 512, 4
    shared = rng.integers(0, 2**32, size=40, dtype=np.uint32)
    src = rng.integers(0, 2**32, size=(chunk, n_pad), dtype=np.uint32)
    dst = rng.integers(0, 2**32, size=(chunk, n_pad), dtype=np.uint32)
    nv = np.array([200, 512, 150, 90], np.int32)
    mv = np.array([220, 512, 100, 250], np.int32)
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


import pytest


@pytest.mark.parametrize("g_tiles", [8, 16])
def test_pallas_wide_groups_2560_match_oracle(rng, monkeypatch, g_tiles):
    """n_pad=2560 exercises multi-group placement and the block-skip
    bounds at both group widths (16 is the NEEDLE_TPU_SEARCH_GTILES
    alternative kept for future hardware); both must stay exact,
    including nv/mv < n_pad."""
    monkeypatch.setenv("NEEDLE_TPU_SEARCH_GTILES", str(g_tiles))
    n_pad, chunk = 2560, 2
    shared = rng.integers(0, 2**32, size=60, dtype=np.uint32)
    src = rng.integers(0, 2**32, size=(chunk, n_pad), dtype=np.uint32)
    dst = rng.integers(0, 2**32, size=(chunk, n_pad), dtype=np.uint32)
    nv = np.array([2400, 2560], np.int32)
    mv = np.array([2300, 2560], np.int32)
    for r in range(chunk):
        src[r, 100:160] = shared
        dst[r, 2000:2060] = shared
        src[r, 2200:2260] = shared
        dst[r, 30:90] = shared
    lm = np.array([5, 3], np.int32)
    thr = np.array([8, 8], np.int32)
    out = np.asarray(
        batch_counts_pallas(nv, mv, lm, thr, src, dst, n_pad, interpret=True)
    )
    assert out.shape == (chunk, 5120)
    for r in range(chunk):
        nz = np.nonzero(out[r])[0]
        for d in nz:  # spot-check every flagged diagonal + a sample of zeros
            o = int(d) - (n_pad - 1)
            cands = _diag_candidates(
                src[r][: nv[r]], dst[r][: mv[r]], o, int(thr[r])
            )
            expect = sum(1 for (_, _, L) in cands if L >= lm[r])
            assert expect == out[r, d], (r, o)
        for d in rng.integers(0, out.shape[1], size=64):
            o = int(d) - (n_pad - 1)
            cands = _diag_candidates(
                src[r][: nv[r]], dst[r][: mv[r]], o, int(thr[r])
            )
            expect = sum(1 for (_, _, L) in cands if L >= lm[r])
            assert expect == out[r, d], (r, o)


def test_engine_with_pallas_kernel_matches_numpy(rng, monkeypatch):
    """Full search engine with the pallas kernel forced (interpret on CPU)
    must match the reference-exact numpy engine."""
    from needle_tpu import Comparator
    from needle_tpu.data import FrameHashes
    from needle_tpu.duration import Duration
    from needle_tpu.search import jax_impl as S

    monkeypatch.setattr(S, "_KERNEL", "pallas")

    shared = rng.integers(0, 2**32, size=70, dtype=np.uint32)
    fhs = []
    for e in range(4):
        h = rng.integers(0, 2**32, size=300 + 40 * e, dtype=np.uint32)
        h[15 + 11 * e : 15 + 11 * e + 70] = shared
        ts = (2600090703 + np.arange(len(h)) * 247619033).astype(np.int64)
        fhs.append(FrameHashes(h, ts, np.zeros(0, np.uint32),
                               np.zeros(0, np.int64),
                               Duration.from_millis(300), "b" * 32))

    def run(engine):
        cmp = Comparator.from_files(
            [f"p{k}.mkv" for k in range(4)], engine=engine
        ).with_min_opening_duration(Duration.from_secs(12))
        res = cmp.run_with_frame_hashes(
            fhs, display=False, use_skip_files=False, write_skip_files=False
        )
        return [None if r.opening is None else
                (r.opening[0].total_nanos(), r.opening[1].total_nanos())
                for r in res]

    got = run("jax")
    expect = run("numpy")
    assert got == expect
    assert any(g is not None for g in got)


def test_device_extraction_overflow_falls_back(rng):
    """A diagonal with more run-ends than K_CANDS (periodic corruption)
    overflows the device extraction and must fall back to the exact host
    rescan — results identical to the NumPy oracle engine."""
    from needle_tpu import Comparator
    from needle_tpu.data import FrameHashes
    from needle_tpu.duration import Duration

    n = 600
    step = 247619033
    base = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    fhs = []
    for e in range(3):
        h = base.copy()
        # corrupt a different sparse set per episode -> many short shared
        # runs on the main diagonal of every pair
        h[e + 3 :: 37] ^= np.uint32(0xFFFFFFFF)
        ts = (2600090703 + np.arange(n) * step).astype(np.int64)
        fhs.append(
            FrameHashes(h, ts, np.zeros(0, np.uint32),
                        np.zeros(0, np.int64),
                        Duration.from_millis(300), f"{e:032x}")
        )
    results = {}
    for engine in ("numpy", "jax"):
        cmp = Comparator.from_files(
            [f"x{k}.mkv" for k in range(3)], engine=engine
        ).with_min_opening_duration(Duration.from_secs(2))
        res = cmp.run_with_frame_hashes(
            fhs, display=False, use_skip_files=False, write_skip_files=False
        )
        results[engine] = [
            None if r.opening is None
            else (str(r.opening[0]), str(r.opening[1]))
            for r in res
        ]
    assert results["jax"] == results["numpy"]
    assert any(r is not None for r in results["jax"])
