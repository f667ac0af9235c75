"""The JAX/TPU engines (fingerprint + search) vs the validated NumPy paths.

Runs on the virtual 8-device CPU mesh (conftest). These are the tests the
reference lacks entirely: the accelerated path is cross-checked against the
reference-exact oracle on every synthetic input.
"""

import json

import numpy as np
import pytest

from needle_tpu.cli import main
from needle_tpu.duration import Duration
from needle_tpu.data import FrameHashes
from needle_tpu.fingerprint.jax_impl import fingerprint_jax, fingerprint_jax_batch
from needle_tpu.fingerprint.numpy_impl import fingerprint_numpy
from needle_tpu.search.oracle import popcount_u32
from needle_tpu.testing import make_synthetic_season


def _music(rng, secs, rate=11025):
    from needle_tpu.testing import _music_like

    return _music_like(rng, int(secs * rate), rate)


def _assert_hashes_close(a, b, max_bit_frac=0.0):
    """The JAX backend's flag-and-rescan pass (borderline-quantized hashes
    recomputed with the host oracle) makes its output EXACTLY equal to the
    scalar pipeline's."""
    assert a.shape == b.shape
    if len(a) == 0:
        return
    dist = popcount_u32(a ^ b)
    assert dist.max() == 0, (
        f"{int((dist > 0).sum())} hashes differ, max hamming {dist.max()}"
    )


def test_fingerprint_jax_matches_numpy():
    rng = np.random.default_rng(123)
    mono = _music(rng, 30)
    _assert_hashes_close(fingerprint_jax(mono), fingerprint_numpy(mono))


def test_fingerprint_jax_bit_exact_long():
    """Longer input (more borderline frames) still bit-exact end to end."""
    rng = np.random.default_rng(77)
    mono = _music(rng, 120)
    np.testing.assert_array_equal(
        np.asarray(fingerprint_jax(mono)), fingerprint_numpy(mono)
    )


def test_fingerprint_rescan_disabled_is_close(monkeypatch):
    """With NEEDLE_TPU_EXACT=0 the raw device hashes are still within
    float-noise of the oracle (≤1 gray bit on rare borderline frames)."""
    monkeypatch.setenv("NEEDLE_TPU_EXACT", "0")
    rng = np.random.default_rng(123)
    mono = _music(rng, 30)
    a, b = np.asarray(fingerprint_jax(mono)), fingerprint_numpy(mono)
    dist = popcount_u32(a ^ b)
    assert dist.max() <= 4
    assert dist.sum() / (32.0 * len(a)) <= 0.002


def test_classifier_values_extraction_matches_oracle():
    """The hw_parity validation entry point (pre-quantization classifier
    values + chroma norms) agrees with the float64 oracle within the
    EXACT_EPS flagging margin on this backend."""
    from needle_tpu.fingerprint.numpy_impl import classifier_values_oracle
    from needle_tpu.fingerprint.jax_impl import (
        _exact_eps,
        classifier_values_jax,
    )

    rng = np.random.default_rng(99)
    mono = _music(rng, 20)
    v_dev, n_dev = classifier_values_jax(mono)
    v_np, norm = classifier_values_oracle(mono)
    assert v_dev.shape == v_np.shape
    assert np.max(np.abs(v_dev - v_np)) < 0.5 * _exact_eps()
    small = norm <= 1.0
    if small.any():
        assert np.max(np.abs(n_dev[small] - norm[small])) < 0.5 * _exact_eps()
    # empty input degrades cleanly
    v0, n0 = classifier_values_jax(np.zeros(10, np.int16))
    assert v0.shape == (0, 16) and n0.shape == (0,)


def test_accurate_log32_ulp_accuracy():
    """_accurate_log32 (the software log that replaced the builtin TPU
    log's ~1e-4 approximation — the sole source of the former TPU margin
    asymmetry) stays within ~2 ulp of float64 log across the classifier
    operand range, including the cancellation-prone x ~= 1 region."""
    import jax

    from needle_tpu.fingerprint.jax_impl import _accurate_log32

    rng = np.random.default_rng(11)
    xs = np.concatenate(
        [
            np.exp(rng.uniform(np.log(1e-3), np.log(1e3), size=200000)),
            1.0 + rng.normal(0, 1e-4, size=100000),
            [1.0, np.nextafter(1.0, 0.0), np.nextafter(1.0, 2.0), 0.5, 2.0],
        ]
    ).astype(np.float32)
    xs = xs[xs > 0]
    got = np.asarray(jax.jit(_accurate_log32)(xs)).astype(np.float64)
    ref = np.log(xs.astype(np.float64))
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
    assert err.max() < 5e-7
    near_one = np.abs(ref) < 0.1
    assert np.abs(got - ref)[near_one].max() < 5e-8


def test_fingerprint_jax_batch_variable_lengths():
    rng = np.random.default_rng(5)
    monos = [_music(rng, s) for s in (8, 20, 33.7, 12)]
    batched = fingerprint_jax_batch(monos)
    for m, h in zip(monos, batched):
        assert h.dtype == np.uint32
        _assert_hashes_close(h, np.asarray(fingerprint_jax(m)))
        _assert_hashes_close(h, fingerprint_numpy(m))


def test_fingerprint_jax_batch_empty_and_short():
    assert fingerprint_jax_batch([]) == []
    out = fingerprint_jax_batch([np.zeros(100, np.int16)])
    assert len(out) == 1 and len(out[0]) == 0


def test_jax_search_engine_matches_numpy_engine(tmp_path):
    d = tmp_path / "season"
    make_synthetic_season(
        d, num_episodes=4, episode_secs=110, opening_secs=24, ending_secs=24, seed=11
    )
    from needle_tpu import Analyzer, Comparator

    paths = sorted(d.glob("*"))
    fhs = (
        Analyzer.from_files(paths, backend="numpy")
        .with_include_endings(True)
        .run(Duration.from_secs_f32(np.float32(0.3)), persist=False)
    )
    results = {}
    for engine in ("numpy", "jax"):
        cmp = Comparator.from_files(paths, engine=engine).with_include_endings(True)
        res = cmp.run_with_frame_hashes(
            fhs, display=False, use_skip_files=False, write_skip_files=False
        )
        results[engine] = [
            (
                None if r.opening is None else (str(r.opening[0]), str(r.opening[1])),
                None if r.ending is None else (str(r.ending[0]), str(r.ending[1])),
            )
            for r in res
        ]
    assert results["jax"] == results["numpy"]


def test_jax_engine_end_to_end_cli(tmp_path):
    d = tmp_path / "season"
    # episode/window sizing: the 25% ending search window (35 s here) must
    # fully contain the ending (25 s + up to 4 s end gap)
    _, op_truth, end_truth = make_synthetic_season(
        d, num_episodes=3, episode_secs=140, opening_secs=25, ending_secs=25, seed=99
    )
    assert main(["analyze", "--backend", "jax", "--include-endings", str(d)]) == 0
    assert (
        main(
            [
                "search",
                "--engine",
                "jax",
                "--include-endings",
                "--no-display",
                "--write-skip-files",
                str(d),
            ]
        )
        == 0
    )
    paths = sorted(d.glob("*.needle.skip.json"))
    assert len(paths) == 3
    for p, (op_s, op_e), (en_s, en_e) in zip(paths, op_truth, end_truth):
        skip = json.loads(p.read_text())
        assert skip["opening"] is not None and skip["ending"] is not None
        assert abs(skip["opening"][0] - op_s) < 8.0
        assert abs(skip["opening"][1] - op_e) < 8.0
        assert abs(skip["ending"][0] - en_s) < 8.0
        assert abs(skip["ending"][1] - en_e) < 8.0


def test_jax_engine_under_mesh(tmp_path):
    """Sharded over the virtual 8-device mesh, results are unchanged."""
    d = tmp_path / "season"
    make_synthetic_season(
        d, num_episodes=4, episode_secs=90, opening_secs=22, ending_secs=0, seed=3
    )
    from needle_tpu import Comparator
    from needle_tpu.parallel import needle_mesh

    paths = sorted(d.glob("*"))
    fhs = [FrameHashes.from_video(p, analyze=True) for p in paths]

    def run():
        cmp = Comparator.from_files(paths, engine="jax")
        res = cmp.run_with_frame_hashes(
            fhs, display=False, use_skip_files=False, write_skip_files=False
        )
        return [(r.opening, r.ending) for r in res]

    base = run()
    with needle_mesh(8):
        sharded = run()
    assert sharded == base
    assert any(op is not None for op, _ in base)


def test_batched_analyzer_matches_single(tmp_path):
    """Analyzer.run's batched JAX dispatch == per-video run_single."""
    d = tmp_path / "season"
    make_synthetic_season(
        d, num_episodes=3, episode_secs=60, opening_secs=15, ending_secs=15, seed=21
    )
    from needle_tpu import Analyzer

    paths = sorted(d.glob("*"))
    hd = Duration.from_secs_f32(np.float32(0.3))

    batched = Analyzer.from_files(paths, backend="jax").with_include_endings(
        True
    ).run(hd, persist=False)
    singles = [
        Analyzer.from_files([p], backend="jax")
        .with_include_endings(True)
        .run_single(p, hd, persist=False)
        for p in paths
    ]
    for b, s in zip(batched, singles):
        np.testing.assert_array_equal(b.opening_hashes, s.opening_hashes)
        np.testing.assert_array_equal(b.opening_ts_nanos, s.opening_ts_nanos)
        np.testing.assert_array_equal(b.ending_hashes, s.ending_hashes)
        np.testing.assert_array_equal(b.ending_ts_nanos, s.ending_ts_nanos)
        assert b.md5() == s.md5()


def test_entries_batch_matches_scalar_spec():
    """_entries_batch (library-wide vectorization) must produce EXACTLY the
    RunEntry lists of _entries_from_candidates (the per-pair scalar spec),
    including the BinaryHeap backing order, for every pair of a synthetic
    library with shared episodes, duration-filtered candidates, and empty
    pairs."""
    from needle_tpu.search.jax_impl import JaxSearchEngine, _EpisodeSide

    rng = np.random.default_rng(42)
    n_eps, n_pad = 6, 256
    sides = []
    for _ in range(n_eps):
        n = int(rng.integers(150, 250))
        hashes = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        ts = np.cumsum(rng.integers(80, 160, size=n)).astype(np.int64) * int(1e6)
        sides.append(_EpisodeSide(hashes, ts))
    hash_durations = [Duration.from_nanos(int(1.238e8))] * n_eps
    min_dur_ns = int(3e9)

    work, p = [], 0
    for a in range(n_eps):
        for b in range(a + 1, n_eps):
            work.append((p, a, b))
            p += 1
    ep_ids = list(range(n_eps))
    w_pidx = np.array([w[0] for w in work], np.int64)
    w_sa = np.array([w[1] for w in work], np.int32)
    w_sb = np.array([w[2] for w in work], np.int32)
    a_arr = np.array([w[1] for w in work], np.int64)
    b_arr = np.array([w[2] for w in work], np.int64)

    # random candidates: some long enough to survive the duration filter,
    # some not; pairs 0 and 7 get none at all
    cands = []
    for row, (p_idx, a, b) in enumerate(work):
        if p_idx in (0, 7):
            continue
        for _ in range(int(rng.integers(1, 6))):
            L = int(rng.integers(2, 80))
            i = int(rng.integers(L, len(sides[a].hashes)))
            j = int(rng.integers(L, len(sides[b].hashes)))
            cands.append((row, i, j, L))
    rng.shuffle(cands)
    cand_row = np.array([c[0] for c in cands], np.int64)
    cand_i = np.array([c[1] for c in cands], np.int64)
    cand_j = np.array([c[2] for c in cands], np.int64)
    cand_L = np.array([c[3] for c in cands], np.int64)

    eng = JaxSearchEngine.__new__(JaxSearchEngine)  # no device needed

    batch = {pi: [] for pi, _, _ in work}
    eng._entries_batch(
        batch, cand_row, cand_i, cand_j, cand_L,
        w_pidx, w_sa, w_sb, a_arr, b_arr, ep_ids, sides,
        hash_durations, True, min_dur_ns, n_pad, n_eps,
    )

    for row, (p_idx, a, b) in enumerate(work):
        mine = [
            (int(i), int(j), int(L))
            for r, i, j, L in zip(cand_row, cand_i, cand_j, cand_L)
            if r == row
        ]
        ref = eng._entries_from_candidates(
            sides[a], sides[b], mine,
            hash_durations[a], hash_durations[b], True, min_dur_ns,
        )
        assert batch[p_idx] == ref, f"pair {p_idx} diverged"


def test_heap_perm_segments_matches_scalar():
    """_heap_perm_segments (vectorized same-size BinaryHeap simulation)
    must reproduce binary_heap_perm per segment — including duplicate keys
    (sift-up stops on <=, so ties are semantic) and both the scalar
    fallback (rare sizes) and the vectorized path (common sizes)."""
    from needle_tpu.search.jax_impl import _heap_perm_segments
    from needle_tpu.search.oracle import binary_heap_perm

    rng = np.random.default_rng(3)
    # many segments of a few common sizes (vector path) + rare sizes
    # (scalar fallback) + heavy tie pressure from a tiny key alphabet
    sizes = (
        [1] * 40 + [2] * 300 + [3] * 250 + [7] * 120 + [4] * 10
        + [19] * 40 + [63] * 2 + [128] * 1
    )
    rng.shuffle(sizes)
    g0, gb, keys = [], [0], []
    for n in sizes:
        g0.append(gb[-1])
        gb.append(gb[-1] + n)
        keys.extend(int(k) for k in rng.integers(0, 9, size=n))
    rank = np.array(keys, np.int64)
    out = _heap_perm_segments(rank, np.array(g0), np.array(gb))
    for k, n in enumerate(sizes):
        s0, s1 = g0[k], gb[k + 1]
        ref = [s0 + q for q in binary_heap_perm(keys[s0:s1])]
        assert out[s0:s1].tolist() == ref, f"segment {k} (size {n})"


def test_lazy_entries_pickle_and_eq():
    """_LazyEntries pickles to the canonical plain list (the distributed
    all-gather transport) and compares equal to it in both directions."""
    import pickle

    from needle_tpu.search.jax_impl import _LazyEntries

    cols = (
        np.array([5, 3], np.int64),                      # L
        np.array([100, 200], np.int64),                  # ss
        np.array([900, 800], np.int64),                  # se
        np.array([150, 250], np.int64),                  # ds
        np.array([950, 850], np.int64),                  # de
        np.array([7, 9], np.uint64),                     # ssim
        np.array([8, 10], np.uint64),                    # dsim
        np.array([800, 600], np.int64),                  # sdur
        np.array([800, 600], np.int64),                  # ddur
    )
    hd = Duration.from_nanos(123)
    le = _LazyEntries(cols, 0, 2, hd, hd, True)
    assert len(le) == 2 and le._mat is None
    via_pickle = pickle.loads(pickle.dumps(le))
    assert isinstance(via_pickle, list)
    assert via_pickle == le.materialize()
    assert le == via_pickle and via_pickle == le
    s, d = le.vote_cols(True)
    assert s.tolist() == [7, 9] and d.tolist() == [800, 600]
    (a, b), h = le.entry_run_hd(1, False)
    assert (a.total_nanos(), b.total_nanos(), h) == (250, 850, hd)


def test_find_best_match_lazy_equals_materialized():
    """find_best_match over array-backed (_LazyEntries) infos must return
    exactly the result of the same infos as plain RunEntry lists — and must
    not materialize any entry while doing so."""
    from needle_tpu.comparator import Comparator, OpeningAndEndingInfo
    from needle_tpu.search.jax_impl import JaxSearchEngine, _EpisodeSide

    rng = np.random.default_rng(11)
    n_eps, n_pad = 5, 256
    sides = []
    for _ in range(n_eps):
        n = int(rng.integers(150, 250))
        hashes = rng.integers(0, 2**10, size=n, dtype=np.uint32) << 4
        ts = np.cumsum(rng.integers(80, 160, size=n)).astype(np.int64) * int(1e6)
        sides.append(_EpisodeSide(hashes, ts))
    hash_durations = [Duration.from_nanos(int(1.238e8))] * n_eps
    pairs = [(a, b) for a in range(n_eps) for b in range(a + 1, n_eps)]
    work = [(p, a, b) for p, (a, b) in enumerate(pairs)]
    w_pidx = np.array([w[0] for w in work], np.int64)
    w_sa = np.array([w[1] for w in work], np.int32)
    w_sb = np.array([w[2] for w in work], np.int32)
    a_arr = w_sa.astype(np.int64)
    b_arr = w_sb.astype(np.int64)
    cands = []
    for row, (p_idx, a, b) in enumerate(work):
        for _ in range(int(rng.integers(1, 8))):
            L = int(rng.integers(10, 120))
            i = int(rng.integers(L, len(sides[a].hashes)))
            j = int(rng.integers(L, len(sides[b].hashes)))
            cands.append((row, i, j, L))
    cand_row = np.array([c[0] for c in cands], np.int64)
    cand_i = np.array([c[1] for c in cands], np.int64)
    cand_j = np.array([c[2] for c in cands], np.int64)
    cand_L = np.array([c[3] for c in cands], np.int64)

    eng = JaxSearchEngine.__new__(JaxSearchEngine)
    results = {p: [] for p, _, _ in work}
    eng._entries_batch(
        results, cand_row, cand_i, cand_j, cand_L,
        w_pidx, w_sa, w_sb, a_arr, b_arr, list(range(n_eps)), sides,
        hash_durations, True, int(1e9), n_pad, n_eps,
    )

    comp = Comparator([f"v{i}" for i in range(n_eps)])
    comp.time_padding = Duration.from_nanos(int(5e8))
    lazy_infos = [
        OpeningAndEndingInfo(results[p], results[p], [], [])
        for p, _, _ in work
    ]
    mat_infos = [
        OpeningAndEndingInfo(list(results[p]) if results[p] else [], [], [], [])
        for p, _, _ in work
    ]
    # materializing for mat_infos fills _mat caches; rebuild fresh lazy
    # objects so the no-materialization assertion below is meaningful
    results2 = {p: [] for p, _, _ in work}
    eng._entries_batch(
        results2, cand_row, cand_i, cand_j, cand_L,
        w_pidx, w_sa, w_sb, a_arr, b_arr, list(range(n_eps)), sides,
        hash_durations, True, int(1e9), n_pad, n_eps,
    )
    lazy_infos = [
        OpeningAndEndingInfo(results2[p], results2[p], [], [])
        for p, _, _ in work
    ]
    mat_infos = [
        OpeningAndEndingInfo(
            list(results[p]), list(results[p]), [], []
        )
        for p, _, _ in work
    ]
    for idx in range(n_eps):
        lazy_m, mat_m = [], []
        for (a, b), li, mi in zip(pairs, lazy_infos, mat_infos):
            if a == idx:
                lazy_m.append((li, True))
                mat_m.append((mi, True))
            elif b == idx:
                lazy_m.append((li, False))
                mat_m.append((mi, False))
        r_lazy = comp.find_best_match(lazy_m)
        r_mat = comp.find_best_match(mat_m)
        assert r_lazy.opening == r_mat.opening
        assert r_lazy.ending == r_mat.ending
    assert all(
        results2[p]._mat is None for p, _, _ in work if len(results2[p])
    ), "voting materialized entries"
