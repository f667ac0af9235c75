"""The doc-blessed library embedding flow (reference lib.rs:20-100):
Analyzer -> run -> Comparator.from_analyzer -> run_with_frame_hashes."""

import numpy as np

import needle_tpu as needle
from needle_tpu.testing import make_synthetic_season


def test_library_embedding_flow(tmp_path):
    make_synthetic_season(
        tmp_path, num_episodes=3, episode_secs=110, opening_secs=25, seed=31
    )
    videos = needle.util.find_video_files([tmp_path])
    assert len(videos) == 3

    analyzer = needle.Analyzer.from_files(
        sorted(videos), threaded_decoding=False, force=False
    )
    frame_hashes = analyzer.run(
        needle.Duration.from_secs_f32(np.float32(0.3)), persist=False
    )
    assert len(frame_hashes) == 3

    comparator = needle.Comparator.from_analyzer(analyzer)
    results = comparator.run_with_frame_hashes(
        frame_hashes,
        display=False,
        use_skip_files=False,
        write_skip_files=False,
    )
    assert len(results) == 3
    assert all(isinstance(r, needle.SearchResult) for r in results)
    assert any(r.opening is not None for r in results)


def test_pair_sharded_search_equals_monolithic(tmp_path):
    """The multi-host decomposition (pair_order -> per-shard
    search_pair_infos -> union -> finalize_results) must produce exactly
    what run_with_frame_hashes produces, for any shard split — the
    single-process guarantee behind distributed_search."""
    make_synthetic_season(
        tmp_path, num_episodes=4, episode_secs=100, opening_secs=25, seed=77
    )
    videos = sorted(needle.util.find_video_files([tmp_path]))
    analyzer = needle.Analyzer.from_files(videos)
    fhs = analyzer.run(
        needle.Duration.from_secs_f32(np.float32(0.3)), persist=False
    )
    cmp = needle.Comparator.from_files(videos)
    base = cmp.run_with_frame_hashes(
        fhs, display=False, use_skip_files=False, write_skip_files=False
    )

    pairs = cmp.pair_order(len(videos))
    for n_shards in (2, 3):
        merged = {}
        for s in range(n_shards):
            mine = pairs[s::n_shards]  # round-robin, like local_shard
            infos = cmp.search_pair_infos(fhs, mine)
            for key, info in zip(mine, infos):
                if not info.is_empty():
                    merged[key] = info
        data = [(i, j, merged[(i, j)]) for (i, j) in pairs if (i, j) in merged]
        sharded = cmp.finalize_results(
            data, display=False, use_skip_files=False, write_skip_files=False
        )
        assert [(r.opening, r.ending) for r in sharded] == [
            (r.opening, r.ending) for r in base
        ], f"{n_shards}-shard split diverged"


def test_public_surface_exports():
    """The facade exports everything the reference's lib.rs does."""
    for name in (
        "Analyzer", "Comparator", "FrameHashes", "SearchResult", "SkipFile",
        "Duration", "Error", "FrameHashDataNotFound",
        "FrameHashDataInvalidVersion", "FrameHashDataNoEnding",
        "AnalyzerMissingPaths", "PathNotFound",
        "FRAME_HASH_DATA_FILE_NAME", "SKIP_FILE_NAME",
        "DEFAULT_HASH_MATCH_THRESHOLD", "DEFAULT_OPENING_SEARCH_PERCENTAGE",
        "DEFAULT_ENDING_SEARCH_PERCENTAGE", "DEFAULT_MIN_OPENING_DURATION",
        "DEFAULT_MIN_ENDING_DURATION", "DEFAULT_HASH_DURATION",
        "DEFAULT_OPENING_AND_ENDING_TIME_PADDING",
    ):
        assert hasattr(needle, name), name
    assert needle.FRAME_HASH_DATA_FILE_NAME == "needle.dat"
    assert needle.SKIP_FILE_NAME == "needle.skip.json"
    assert callable(needle.util.format_time)
    assert callable(needle.util.find_video_files)
    assert callable(needle.util.compute_header_md5sum)


def test_numpy_engine_threaded_pairs_match_serial(tmp_path):
    """The CPU-fallback engine parallelizes the pair loop like the
    reference's rayon par_iter (comparator.rs:549-564); results must be
    identical to the serial (--no-threading) path."""
    make_synthetic_season(
        tmp_path, num_episodes=4, episode_secs=100, opening_secs=25, seed=5
    )
    videos = sorted(needle.util.find_video_files([tmp_path]))
    analyzer = needle.Analyzer.from_files(videos)
    fhs = analyzer.run(
        needle.Duration.from_secs_f32(np.float32(0.3)), persist=False
    )
    cmp = needle.Comparator.from_files(videos, engine="numpy")
    kw = dict(display=False, use_skip_files=False, write_skip_files=False)
    r_thr = cmp.run_with_frame_hashes(fhs, threading=True, **kw)
    r_ser = cmp.run_with_frame_hashes(fhs, threading=False, **kw)
    assert [(r.opening, r.ending) for r in r_thr] == [
        (r.opening, r.ending) for r in r_ser
    ]
    assert any(r.opening is not None for r in r_thr)
