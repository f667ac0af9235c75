"""Search oracle vs a literal transcription of comparator.rs, and simhash
vs libchromaprint."""

import numpy as np
import pytest

from needle_tpu.duration import Duration
from needle_tpu.search.oracle import (
    binary_heap_order,
    compute_run_table,
    longest_common_hash_match,
    popcount_u32,
    simhash32,
    simhash32_batch,
)


def brute_force_runs(src, dst, thr, min_dur_ns, src_ts, dst_ts):
    """Direct triple-loop transcription of comparator.rs:174-229."""
    n, m = len(src), len(dst)
    table = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n):
        for j in range(m):
            if i == 0 or j == 0:
                table[i][j] = 0
            elif bin(int(src[i]) ^ int(dst[j])).count("1") <= thr:
                table[i][j] = table[i - 1][j - 1] + 1
            else:
                table[i][j] = 0
    out = []
    for i in reversed(range(1, n)):
        for j in reversed(range(1, m)):
            if table[i][j] == 0 or (
                i < n - 1 and j < m - 1 and table[i + 1][j + 1] != 0
            ):
                continue
            ssi, sei = i - table[i][j], i
            dsi, dei = j - table[i][j], j
            if (src_ts[sei] - src_ts[ssi]) >= min_dur_ns and (
                dst_ts[dei] - dst_ts[dsi]
            ) >= min_dur_ns:
                out.append((table[i][j], ssi, sei, dsi, dei))
    return out


def test_popcount(rng):
    x = rng.integers(0, 2**32, 1000).astype(np.uint32)
    expect = np.array([bin(int(v)).count("1") for v in x])
    assert (popcount_u32(x) == expect).all()


def test_simhash_vs_library(rng, chromaprint_available):
    if not chromaprint_available:
        pytest.skip("libchromaprint not installed")
    from needle_tpu.fingerprint.oracle import ChromaprintOracle

    ctx = ChromaprintOracle()
    for _ in range(30):
        n = int(rng.integers(1, 300))
        hs = rng.integers(0, 2**32, n).astype(np.uint32)
        assert simhash32(hs) == ctx.simhash(hs)
    hs = rng.integers(0, 2**32, 500).astype(np.uint32)
    starts = rng.integers(0, 400, 50)
    ends = starts + rng.integers(0, 99, 50)
    batch = simhash32_batch(hs, starts, ends)
    for k in range(50):
        assert int(batch[k]) == simhash32(hs[starts[k] : ends[k] + 1])


def test_lcs_vs_brute_force(rng):
    for _ in range(100):
        n, m = int(rng.integers(2, 50)), int(rng.integers(2, 50))
        src = rng.integers(0, 4, n).astype(np.uint32)
        dst = rng.integers(0, 4, m).astype(np.uint32)
        ts_s = (np.arange(n) * 250_000_000).astype(np.int64)
        ts_d = (np.arange(m) * 250_000_000).astype(np.int64)
        min_dur = Duration.from_nanos(1_000_000_000)
        want = sorted(
            brute_force_runs(src, dst, 1, min_dur.total_nanos(), ts_s, ts_d)
        )
        entries = longest_common_hash_match(
            src, ts_s, dst, ts_d,
            Duration.from_millis(250), Duration.from_millis(250),
            True, 1, min_dur, min_dur,
        )
        got = sorted(
            (
                e.score,
                e.src_longest_run[0].total_nanos() // 250_000_000,
                e.src_longest_run[1].total_nanos() // 250_000_000,
                e.dst_longest_run[0].total_nanos() // 250_000_000,
                e.dst_longest_run[1].total_nanos() // 250_000_000,
            )
            for e in entries
        )
        assert got == want


def test_run_table_zeroing_quirk():
    # identical sequences: the diagonal run cannot include index 0
    x = np.array([5, 5, 5, 5], np.uint32)
    table = compute_run_table(x, x, 0)
    assert table[0, 0] == 0  # forced zero despite matching hash
    assert table[3, 3] == 3  # run starts at (1,1)


def test_heap_order_emulation():
    """Known BinaryHeap behavior: backing array after pushes is heap order."""
    from needle_tpu.search.oracle import RunEntry

    def e(score):
        z = (Duration.from_nanos(0), Duration.from_nanos(0))
        return RunEntry(score, z, z, 0, 0, True, False, True, False)

    out = binary_heap_order([e(1), e(2), e(3)])
    # push 1 -> [1]; push 2 -> sift up -> [2,1]; push 3 -> [3,1,2]
    assert [x.score for x in out] == [3, 1, 2]


def test_threshold_zero_reports_nothing(rng):
    """With hash_match_threshold=0 the bias threshold is 0, no candidate
    pair (not even a candidate with itself) enters the reference's
    distinct-match map, and no opening is reported (comparator.rs:434-473)."""
    from needle_tpu import Comparator
    from needle_tpu.data import FrameHashes
    from needle_tpu.duration import Duration

    shared = rng.integers(0, 2**32, size=80, dtype=np.uint32)
    fhs = []
    for e in range(2):
        h = rng.integers(0, 2**32, size=300, dtype=np.uint32)
        h[20 : 20 + len(shared)] = shared
        ts = (2600090703 + np.arange(300) * 247619033).astype(np.int64)
        fhs.append(FrameHashes(h, ts, np.zeros(0, np.uint32),
                               np.zeros(0, np.int64),
                               Duration.from_millis(300), "a" * 32))
    for engine in ("numpy", "jax"):
        cmp = (
            Comparator.from_files(["a.mkv", "b.mkv"], engine=engine)
            .with_hash_match_threshold(0)
            .with_min_opening_duration(Duration.from_secs(5))
        )
        res = cmp.run_with_frame_hashes(
            fhs, display=False, use_skip_files=False, write_skip_files=False
        )
        assert all(r.opening is None for r in res)


def test_find_best_match_matches_scalar_reference(rng):
    """The vectorized voting (unique-sim distance matrix + f32 array
    scoring) must reproduce the reference's scalar semantics exactly:
    per-candidate pairwise popcount votes, strict bias threshold
    (thr + thr//2), -(votes*0.3f32 + dur*0.7f32) scoring with (score, k)
    tie-break, and the thr=0 nothing-qualifies edge."""
    from needle_tpu.comparator import Comparator, OpeningAndEndingInfo
    from needle_tpu.duration import Duration
    from needle_tpu.search.oracle import RunEntry, popcount_u32

    def scalar_reference(comp, matches):
        # direct transcription of comparator.rs:405-515
        cands = []
        for m, is_source in matches:
            groups = (
                ((m.src_openings, True), (m.src_endings, False))
                if is_source
                else ((m.dst_openings, True), (m.dst_endings, False))
            )
            for entries, is_open in groups:
                for e in entries:
                    if is_source:
                        c = (e.src_longest_run, e.src_hash_duration,
                             e.src_match_hash)
                    else:
                        c = (e.dst_longest_run, e.dst_hash_duration,
                             e.dst_match_hash)
                    cands.append((c, is_open))
        if not cands:
            return None, None
        sim = np.array([c[0][2] for c in cands], dtype=np.uint32)
        dist = popcount_u32(sim[:, None] ^ sim[None, :])
        bias = comp.hash_match_threshold + comp.hash_match_threshold // 2
        q = dist < bias
        votes = q.sum(axis=1)
        eligible = q.any(axis=1)

        def pick(want):
            scored = []
            for k, (c, is_open) in enumerate(cands):
                if is_open != want or not eligible[k]:
                    continue
                (start, end), _, _ = c
                dur = (end - start).as_secs_f32()
                s = -(np.float32(int(votes[k])) * np.float32(0.3)
                      + dur * np.float32(0.7))
                scored.append((float(s), k))
            scored.sort()
            if not scored:
                return None
            (start, end), hd, _ = cands[scored[0][1]][0]
            return (start + comp.time_padding,
                    end - comp.time_padding - hd)

        return pick(True), pick(False)

    hd = Duration.from_nanos(123_800_000)

    def entry(is_open, sim, dur_s):
        s = int(rng.integers(0, 400)) * 10**9
        e = s + int(dur_s) * 10**9
        return RunEntry(50, (Duration.from_nanos(s), Duration.from_nanos(e)),
                        (Duration.from_nanos(s), Duration.from_nanos(e)),
                        int(sim), int(sim), is_open, not is_open,
                        is_open, not is_open, hd, hd)

    for thr in (0, 1, 10, 14):
        for trial in range(8):
            # small sim alphabet forces vote multiplicities and score ties
            sims = rng.integers(0, 2**32, size=4, dtype=np.uint32)
            matches = []
            for k in range(int(rng.integers(2, 40))):
                op = [entry(True, sims[rng.integers(4)],
                            rng.integers(20, 24))
                      for _ in range(int(rng.integers(0, 3)))]
                en = [entry(False, sims[rng.integers(4)],
                            rng.integers(20, 24))
                      for _ in range(int(rng.integers(0, 3)))]
                matches.append(
                    (OpeningAndEndingInfo(op, op, en, en), bool(k % 2))
                )
            comp = Comparator.__new__(Comparator)
            comp.hash_match_threshold = thr
            comp.include_endings = True
            comp.time_padding = Duration.from_secs_f32(np.float32(0.5))
            got = comp.find_best_match(matches)
            want_o, want_e = scalar_reference(comp, matches)
            assert got.opening == want_o, (thr, trial)
            assert got.ending == want_e, (thr, trial)
