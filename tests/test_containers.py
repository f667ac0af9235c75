"""Real-media robustness: containers synthesized through the native layer.

The reference is only ever exercised on two bundled 5 s mp4s; these tests
mux synthetic PCM into real containers (mkv/mp4/mp2 — no ffmpeg CLI exists
here, so the native layer's ni_write_media does the encoding) and drive the
decode/seek/resampler-rebuild paths of native/needle_ingest.cpp that those
samples never touch (analyzer.rs:231-255 InputChanged, audio/util.rs:18-41
seek window).
"""

import numpy as np
import pytest

from needle_tpu import ingest


pytestmark = pytest.mark.skipif(
    not ingest.native_available(), reason="native ingest unavailable"
)


def _tone_ramp(rng, n, rate):
    """Deterministic band-limited content with time-varying pitch (so any
    slice is locatable by exact match)."""
    t = np.arange(n) / rate
    f = 220.0 + 40.0 * np.sin(2 * np.pi * t / 7.0)
    x = np.sin(2 * np.pi * np.cumsum(f) / rate)
    x += 0.2 * rng.standard_normal(n)
    return np.clip(x * 12000, -32768, 32767).astype(np.int16)


def _find_exact(hay: np.ndarray, probe: np.ndarray):
    """Offset of the exact occurrence of `probe` in `hay` (or None)."""
    n = len(hay) - len(probe) + 1
    if n <= 0:
        return None
    mask = np.ones(n, bool)
    for k in range(min(8, len(probe))):
        mask &= hay[k : k + n] == probe[k]
    for off in np.flatnonzero(mask):
        if np.array_equal(hay[off : off + len(probe)], probe):
            return int(off)
    return None


def test_mkv_pcm_roundtrip(tmp_path, rng):
    """Stereo PCM-in-Matroska decodes back bit-exactly (modulo the
    reference's pts<=0 first-packet skip, analyzer.rs:221-226); a mono
    source goes through swr's default upmix (1/sqrt(2) into each channel)."""
    rate = 11025
    n = rate * 12
    mono = _tone_ramp(rng, n, rate)
    stereo = np.repeat(mono, 2)  # L == R
    p = tmp_path / "round.mkv"
    ingest.write_media(p, stereo, rate, 2, codec="pcm_s16le")

    decoded, dur = ingest.decode_audio(p, sample_rate=rate)
    assert abs(dur - 12.0) < 0.2
    st = decoded.reshape(-1, 2)
    # stereo -> stereo through swr is a passthrough: bit-exact
    np.testing.assert_array_equal(st[:, 0], st[:, 1])
    left = st[:, 0]
    # the first packet (pts 0) is skipped by reference semantics; find the
    # surviving prefix in the source and require exact PCM equality
    assert len(left) > rate * 10
    probe = left[:rate]
    off = _find_exact(mono, probe)
    assert off is not None, "decoded audio not found in source"
    np.testing.assert_array_equal(mono[off : off + len(left)], left)

    # mono source: swr's default upmix scales by 1/sqrt(2) (the reference's
    # decode chain behaves identically — everything passes through swr to
    # stereo, analyzer.rs:180-187)
    pm = tmp_path / "mono.mkv"
    ingest.write_media(pm, mono, rate, 1, codec="pcm_s16le")
    dm, _ = ingest.decode_audio(pm, sample_rate=rate)
    stm = dm.reshape(-1, 2)
    np.testing.assert_array_equal(stm[:, 0], stm[:, 1])
    scaled = mono.astype(np.float64) * (2.0 ** -0.5)
    probe8 = stm[:8, 0].astype(np.float64)
    cand = np.flatnonzero(np.abs(scaled[: n - 8] - probe8[0]) <= 1.0)
    offs = [
        o for o in cand
        if np.all(np.abs(scaled[o : o + 8] - probe8) <= 1.0)
    ]
    assert offs, "upmixed audio not locatable in source"
    o = int(offs[0])
    m = len(stm)
    assert np.max(np.abs(scaled[o : o + m] - stm[:, 0])) <= 1.0


def test_mkv_stereo_decode_and_downmix(tmp_path, rng):
    """Stereo PCM mkv: decode keeps channels; chromaprint downmix matches
    the host oracle computed from the source."""
    rate = 11025
    n = rate * 8
    l = _tone_ramp(rng, n, rate)
    r = _tone_ramp(rng, n, rate)
    inter = np.empty(2 * n, np.int16)
    inter[0::2], inter[1::2] = l, r
    p = tmp_path / "st.mkv"
    ingest.write_media(p, inter, rate, 2, codec="pcm_s16le")

    decoded, _ = ingest.decode_audio(p, sample_rate=rate)
    st = decoded.reshape(-1, 2)
    probe = np.ascontiguousarray(st[: rate // 2, 0])
    off = _find_exact(l, probe)
    assert off is not None, "decoded left channel not found in source"
    m = len(st)
    np.testing.assert_array_equal(st[:, 0], l[off : off + m])
    np.testing.assert_array_equal(st[:, 1], r[off : off + m])


def test_mkv_seek_window(tmp_path, rng):
    """avformat_seek_file with the reference's ±1 s window on a Matroska
    (1/1000 time base — where reference and physical seek targets agree):
    decode-from-seek must land within the window and stream exact PCM."""
    rate = 11025
    mono = _tone_ramp(rng, rate * 100, rate)
    p = tmp_path / "seek.mkv"
    # stereo (L == R) so decode is a bit-exact passthrough
    ingest.write_media(p, np.repeat(mono, 2), rate, 2, codec="pcm_s16le")

    seek_to = 75.0
    decoded, dur = ingest.decode_audio(p, seek_to_secs=seek_to, sample_rate=rate)
    assert abs(dur - 100.0) < 0.5
    left = decoded.reshape(-1, 2)[:, 0]
    probe = left[:rate]
    off = _find_exact(mono, probe)
    assert off is not None, "post-seek audio not found in source"
    start_s = off / rate
    # the reference accepts any keyframe within ±1 s of the target
    assert seek_to - 1.2 < start_s < seek_to + 1.2, start_s
    np.testing.assert_array_equal(mono[off : off + len(left)], left)


def test_seek_compat_mode_mkv_identical(tmp_path, rng, monkeypatch):
    """NEEDLE_TPU_SEEK_COMPAT=ref (bug-for-bug reference seek arithmetic,
    audio/util.rs:18-41) must be byte-identical to the default physical
    seek on Matroska's 1/1000 time base — the one case where the
    reference's ms/time_base math IS physically correct."""
    rate = 11025
    mono = _tone_ramp(rng, rate * 100, rate)
    p = tmp_path / "compat.mkv"
    ingest.write_media(p, np.repeat(mono, 2), rate, 2, codec="pcm_s16le")

    default, _ = ingest.decode_audio(p, seek_to_secs=75.0, sample_rate=rate)
    monkeypatch.setenv("NEEDLE_TPU_SEEK_COMPAT", "ref")
    compat, _ = ingest.decode_audio(p, seek_to_secs=75.0, sample_rate=rate)
    np.testing.assert_array_equal(default, compat)


def test_seek_past_end_mkv(tmp_path, rng):
    rate = 11025
    p = tmp_path / "short.mkv"
    ingest.write_media(p, _tone_ramp(rng, rate * 5, rate), rate, 1,
                       codec="pcm_s16le")
    with pytest.raises(ingest.SeekPastEnd):
        ingest.decode_audio(p, seek_to_secs=4.9)


def test_mp4_aac_end_to_end(tmp_path, rng):
    """Compressed mp4 (AAC) episodes through the full analyze+search CLI:
    the lossy codec must not break opening detection."""
    from needle_tpu.cli import main
    from needle_tpu.testing import _music_like

    rate = 44100
    # _tone_ramp repeats the same pitch contour every call — chroma would
    # match across unrelated episodes; use chromatically diverse content
    def music(n):
        return np.clip(
            _music_like(rng, n, rate) * 11000, -32768, 32767
        ).astype(np.int16)

    shared = music(int(26 * rate))
    for e in range(3):
        body = music(int(95 * rate))
        at = int((4.0 + 3 * e) * rate)
        body[at : at + len(shared)] = shared
        ingest.write_media(tmp_path / f"e{e}.mp4", body, rate, 1, codec="aac")

    assert main(["analyze", "--backend", "jax", str(tmp_path)]) == 0
    assert main(
        ["search", "--engine", "jax", "--no-display", "--write-skip-files",
         str(tmp_path)]
    ) == 0
    skips = sorted(tmp_path.glob("*.needle.skip.json"))
    assert len(skips) == 3
    import json

    for e, p in enumerate(skips):
        skip = json.loads(p.read_text())
        assert skip["opening"] is not None, p.name
        start, end = skip["opening"]
        assert abs(start - (4.0 + 3 * e)) < 4.0
        assert abs(end - (4.0 + 3 * e + 26.0)) < 4.0


def test_mp2_midstream_channel_change(tmp_path, rng):
    """Concatenated MP2 streams with different channel counts: the decoder
    reconfigures mid-stream and the swr rebuild path (InputChanged,
    analyzer.rs:235-252 / needle_ingest.cpp convert_and_append) produces
    continuous output instead of erroring."""
    rate = 44100
    a_n = rate * 6
    l = _tone_ramp(rng, a_n, rate)
    r = _tone_ramp(rng, a_n, rate)
    stereo = np.empty(2 * a_n, np.int16)
    stereo[0::2], stereo[1::2] = l, r
    mono = _tone_ramp(rng, rate * 6, rate)

    pa, pb = tmp_path / "a.mp2", tmp_path / "b.mp2"
    ingest.write_media(pa, stereo, rate, 2, codec="mp2", with_video=False)
    ingest.write_media(pb, mono, rate, 1, codec="mp2", with_video=False)
    pc = tmp_path / "c.mp2"
    pc.write_bytes(pa.read_bytes() + pb.read_bytes())

    decoded, dur = ingest.decode_audio(pc, sample_rate=11025)
    # both halves decoded (some tolerance for codec priming/padding)
    n_secs = len(decoded) / 2 / 11025
    assert 10.0 < n_secs < 13.5, n_secs
    # downstream: the fingerprint pipeline accepts it
    from needle_tpu.fingerprint.numpy_impl import fingerprint_numpy_stereo

    hashes = fingerprint_numpy_stereo(decoded)
    assert len(hashes) > 50
