"""Tracing/metrics subsystem (SURVEY §5.1/§5.5 equivalents)."""

import logging

import numpy as np

from needle_tpu.tracing import metrics, report_metrics, span


def test_span_records_metrics():
    metrics.reset()
    with span("test.stage", items=3):
        pass
    with span("test.stage"):
        pass
    snap = metrics.snapshot()
    assert "test.stage" in snap
    total, count = snap["test.stage"]
    assert count == 2 and total >= 0.0
    metrics.reset()


def test_span_logs_at_debug(caplog):
    with caplog.at_level(logging.DEBUG, logger="needle_tpu"):
        with span("test.logged", n=1):
            pass
    msgs = [r.getMessage() for r in caplog.records]
    assert any("test.logged{n=1}: enter" in m for m in msgs)
    assert any("test.logged: exit" in m for m in msgs)


def test_report_metrics_prints(capsys):
    metrics.reset()
    with span("test.report"):
        pass
    report_metrics(force=True)
    out = capsys.readouterr().out
    assert "test.report" in out
    metrics.reset()


def test_analyze_and_search_emit_spans(tmp_path):
    from needle_tpu import Analyzer, Comparator
    from needle_tpu.duration import Duration
    from needle_tpu.testing import make_synthetic_season

    make_synthetic_season(tmp_path, num_episodes=3, episode_secs=60,
                          opening_secs=15, seed=77)
    metrics.reset()
    paths = sorted(tmp_path.glob("*.wav"))
    fhs = Analyzer.from_files(paths, backend="jax").run(
        Duration.from_secs_f32(np.float32(0.3)), persist=False
    )
    Comparator.from_files(paths, engine="jax").run_with_frame_hashes(
        fhs, display=False, use_skip_files=False, write_skip_files=False
    )
    snap = metrics.snapshot()
    assert "analyze.decode" in snap
    assert "analyze.fingerprint" in snap
    assert "search.pairs" in snap
    assert "search.launch" in snap
    metrics.reset()


def test_device_resampler_quality():
    """The on-device polyphase resampler must preserve band-limited content
    well enough that hashes of resampled audio match across offsets."""
    import jax.numpy as jnp

    from needle_tpu.fingerprint.jax_impl import (
        _resample_plan,
        _rs_device_matrix,
        _resample_inline,
        _ingest_dims,
        resampled_length,
    )

    in_rate = 16000
    t = np.arange(in_rate * 2) / in_rate
    sig = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)

    n_frames = 16
    _, in_len, out_needed = _ingest_dims(in_rate, n_frames)
    flat = np.zeros(in_len, np.float32)
    flat[: len(sig)] = sig
    out = np.asarray(
        _resample_inline(jnp.asarray(flat), _rs_device_matrix(in_rate),
                         in_rate, n_frames)
    )
    # Compare against an ideal 440 Hz tone at 11025 Hz (skip filter edges).
    n = min(len(out), resampled_length(len(sig), in_rate)) - 200
    ref = np.sin(2 * np.pi * 440.0 * np.arange(n) / 11025.0)
    err = np.abs(out[100 : n - 100] - ref[100 : n - 100])
    assert err.max() < 0.02, f"resample error {err.max()}"
