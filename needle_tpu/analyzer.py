"""Analyzer: per-video decode -> resample -> fingerprint -> FrameHashes.

Mirrors needle/src/audio/analyzer.rs. The decode/resample happens on host via
the native ingest layer (exact reference packet semantics); the fingerprint
math runs on the selected backend:

  * "jax"         — batched JAX/XLA/Pallas pipeline on TPU (default when JAX
                    is usable); episodes are fingerprinted as one batch.
  * "numpy"       — the validated NumPy implementation (CPU fallback).
  * "chromaprint" — ctypes to a system libchromaprint (bit-exact with that
                    exact build; optional).

Timestamp math replicates the reference exactly (analyzer.rs:286-318):
  delay = 28666 samples, item duration = 1365 samples (chromaprint TEST2),
  converted to Durations at full precision; ts_i = delay + item.mul_f32(i),
  stepping raw hash indices by hash_duration.as_millis()/item.as_millis();
  ending hashes additionally get seek_to added, where
  seek_to = stream_duration.mul_f32(1 - ending_search_percentage).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import constants
from .data import FrameHashes, frame_hash_data_path
from .duration import Duration
from .errors import AnalyzerMissingPaths
from .fingerprint.constants import DELAY_SAMPLES, ITEM_DURATION_SAMPLES, SAMPLE_RATE
from .util import compute_header_md5sum

# chromaprint-rust converts sample counts to Durations; full-precision f64
# seconds (the physically-correct conversion).
CHROMAPRINT_DELAY = Duration.from_secs_f64(DELAY_SAMPLES / SAMPLE_RATE)
CHROMAPRINT_ITEM_DURATION = Duration.from_secs_f64(ITEM_DURATION_SAMPLES / SAMPLE_RATE)


def _fingerprint_backend(name: str):
    """Resolve a backend name to fn(stereo_interleaved_i16) -> uint32 array."""
    if name == "numpy":
        from .fingerprint.numpy_impl import fingerprint_numpy_stereo

        return fingerprint_numpy_stereo
    if name == "chromaprint":
        from .fingerprint.oracle import fingerprint_oracle

        return lambda pcm: fingerprint_oracle(pcm, channels=2)
    if name == "jax":
        from .fingerprint.jax_impl import fingerprint_jax_stereo

        return fingerprint_jax_stereo
    if name == "auto":
        try:
            return _fingerprint_backend("jax")
        except Exception:
            return _fingerprint_backend("numpy")
    raise ValueError(f"unknown fingerprint backend: {name}")


class Analyzer:
    """Analyzes videos into FrameHashes (analyzer.rs:85-455)."""

    def __init__(self, videos: Sequence = (), backend: str = "auto"):
        self.videos: List[Path] = [Path(v) for v in videos]
        self.opening_search_percentage: float = (
            constants.DEFAULT_OPENING_SEARCH_PERCENTAGE
        )
        self.ending_search_percentage: float = (
            constants.DEFAULT_ENDING_SEARCH_PERCENTAGE
        )
        self.include_endings: bool = False
        self.threaded_decoding: bool = False
        self.force: bool = False
        self.backend_name = backend

    # -- builder API (analyzer.rs:108-151) ------------------------------------

    @classmethod
    def from_files(
        cls, videos: Sequence, threaded_decoding: bool = False, force: bool = False, **kw
    ) -> "Analyzer":
        a = cls(videos, **kw)
        a.threaded_decoding = threaded_decoding
        a.force = force
        return a

    def with_opening_search_percentage(self, v: float) -> "Analyzer":
        self.opening_search_percentage = float(v)
        return self

    def with_ending_search_percentage(self, v: float) -> "Analyzer":
        self.ending_search_percentage = float(v)
        return self

    def with_include_endings(self, v: bool) -> "Analyzer":
        self.include_endings = bool(v)
        return self

    def with_threaded_decoding(self, v: bool) -> "Analyzer":
        self.threaded_decoding = bool(v)
        return self

    def with_force(self, v: bool) -> "Analyzer":
        self.force = bool(v)
        return self

    # -- decode ---------------------------------------------------------------

    def _decode_segments(
        self, path: Path
    ) -> Tuple[np.ndarray, Optional[np.ndarray], Duration, Optional[Duration]]:
        """Decode the opening window and (optionally) the ending window.

        Returns (opening_pcm, ending_pcm, stream_duration, ending_seek_to),
        with PCM as S16 interleaved stereo @ 11025 Hz.
        """
        from . import ingest

        if ingest.is_pcm_file(path):
            pcm, duration_secs = ingest.load_pcm_as_chromaprint_input(path)
            stream_duration = Duration.from_secs_f64(duration_secs)
            opening_duration = stream_duration.mul_f32(
                np.float32(self.opening_search_percentage)
            )
            n_open = int(opening_duration.as_secs_f64() * SAMPLE_RATE) * 2
            opening_pcm = pcm[:n_open]
            ending_pcm, seek_to = None, None
            if self.include_endings:
                seek_to = stream_duration.mul_f32(
                    np.float32(1.0) - np.float32(self.ending_search_percentage)
                )
                n_skip = int(seek_to.as_secs_f64() * SAMPLE_RATE) * 2
                ending_pcm = pcm[n_skip:]
            return opening_pcm, ending_pcm, stream_duration, seek_to

        # First probe duration (cheap open), mirroring analyzer.rs:362-374.
        duration_secs = ingest.stream_duration_secs(path)
        stream_duration = Duration.from_secs_f64(duration_secs)

        opening_duration = stream_duration.mul_f32(
            np.float32(self.opening_search_percentage)
        )
        opening_pcm, _ = ingest.decode_audio(
            path,
            seek_to_secs=None,
            duration_limit_secs=opening_duration.as_secs_f64(),
            sample_rate=SAMPLE_RATE,
            threaded=self.threaded_decoding,
        )
        ending_pcm, seek_to = None, None
        if self.include_endings:
            seek_to = stream_duration.mul_f32(
                np.float32(1.0) - np.float32(self.ending_search_percentage)
            )
            # The reference seeks using ms-truncated timestamps
            # (audio/util.rs:36-38).
            ending_pcm, _ = ingest.decode_audio(
                path,
                seek_to_secs=seek_to.as_millis() / 1000.0,
                duration_limit_secs=None,
                sample_rate=SAMPLE_RATE,
                threaded=self.threaded_decoding,
            )
        return opening_pcm, ending_pcm, stream_duration, seek_to

    # -- hash assembly (analyzer.rs:286-318) -----------------------------------

    @staticmethod
    def _hashes_with_timestamps(
        raw_hashes: np.ndarray,
        hash_duration: Optional[Duration],
        seek_to: Optional[Duration],
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Select every step_by-th raw hash and attach reference-exact
        timestamps. Returns (uint32 hashes, int64 ts_nanos)."""
        if hash_duration is not None:
            step_by = hash_duration.as_millis() // CHROMAPRINT_ITEM_DURATION.as_millis()
            if step_by == 0:
                # Rust Iterator::step_by(0) panics.
                raise ValueError("hash_duration shorter than chromaprint item duration")
        else:
            step_by = 1
        idx = np.arange(0, len(raw_hashes), step_by, dtype=np.int64)
        hashes = np.asarray(raw_hashes, dtype=np.uint32)[idx]
        # ts = delay + item_duration.mul_f32(i as f32)  (+ seek_to)
        item_f32 = CHROMAPRINT_ITEM_DURATION.as_secs_f32()
        prods = np.float32(idx.astype(np.float32) * item_f32)
        # Duration::from_secs_f32: exact f32 value -> nanos, round-half-even.
        ts = np.array(
            [Duration.from_secs_f32(p).total_nanos() for p in prods], dtype=np.int64
        )
        ts += CHROMAPRINT_DELAY.total_nanos()
        if seek_to is not None:
            ts += seek_to.total_nanos()
        return hashes, ts

    # -- single video -----------------------------------------------------------

    def run_single(
        self, path, hash_duration: Duration, persist: bool
    ) -> FrameHashes:
        """analyzer.rs:326-420."""
        path = Path(path)
        fp = _fingerprint_backend(self.backend_name)
        frame_hash_path = frame_hash_data_path(path)

        md5 = compute_header_md5sum(path)
        if not self.force and frame_hash_path.exists():
            try:
                data = FrameHashes.from_path(frame_hash_path)
            except Exception:
                data = None
            if data is not None and data.md5() == md5:
                print(f"Skipping analysis for {path}...")
                return data

        opening_pcm, ending_pcm, _, seek_to = self._decode_segments(path)

        opening_raw = fp(opening_pcm)
        oh, ot = self._hashes_with_timestamps(opening_raw, hash_duration, None)
        if ending_pcm is not None:
            ending_raw = fp(ending_pcm)
            eh, et = self._hashes_with_timestamps(ending_raw, hash_duration, seek_to)
        else:
            eh = np.zeros(0, np.uint32)
            et = np.zeros(0, np.int64)

        frame_hashes = FrameHashes(oh, ot, eh, et, hash_duration, md5)
        if persist:
            frame_hashes.save(frame_hash_path)
        return frame_hashes

    # -- all videos --------------------------------------------------------------

    def run(
        self, hash_duration: Duration, persist: bool, threading: bool = True
    ) -> List[FrameHashes]:
        """analyzer.rs:425-455 (decode parallel on host threads; fingerprints
        batch naturally on the accelerator backend)."""
        if len(self.videos) == 0:
            raise AnalyzerMissingPaths()
        if isinstance(hash_duration, (int, float)):
            hash_duration = Duration.from_secs_f32(np.float32(hash_duration))

        if threading and len(self.videos) > 1:
            with ThreadPoolExecutor() as pool:
                return list(
                    pool.map(
                        lambda p: self.run_single(p, hash_duration, persist),
                        self.videos,
                    )
                )
        return [self.run_single(p, hash_duration, persist) for p in self.videos]
