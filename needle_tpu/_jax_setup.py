"""Shared JAX configuration: persistent compilation cache + transport probe.

First TPU compiles of the fingerprint/search programs take tens of seconds;
the persistent cache makes subsequent processes (CLI runs, benchmarks) start
hot. Import this module before any jitted call.
"""

import os
import time

import jax

_initialized = False
_h2d_bandwidth = None


def h2d_bandwidth_mb_s(reprobe: bool = False) -> float:
    """Measured host->device bandwidth (MB/s), probed once per process with
    a 16 MB transfer. Tunneled transports vary by >50x between sessions;
    ingest strategies (e.g. host decimation before upload) adapt to this.
    Override with NEEDLE_TPU_H2D_MBS for testing.

    reprobe=True re-measures (still honoring the env override): eras can
    collapse MID-RUN (r3 measured 79 MB/s at process start degrading to
    ~7 MB/s within minutes), so long-running callers (bench trials) re-probe
    to attribute per-trial walls to the transport."""
    global _h2d_bandwidth
    if reprobe:
        _h2d_bandwidth = None
    if _h2d_bandwidth is None:
        env = os.environ.get("NEEDLE_TPU_H2D_MBS")
        if env:
            _h2d_bandwidth = float(env)
            return _h2d_bandwidth
        try:
            import numpy as np

            x = np.zeros(8 << 20, np.int16)  # 16 MB
            # connection setup + fence warm (np.asarray: on the axon
            # transport only a device->host transfer reliably fences;
            # block_until_ready can return before remote work completes,
            # which would inflate the reading exactly when the wire is
            # collapsing — the case the probe's callers gate on)
            np.asarray(jax.device_put(x[:128]) + np.int16(1))
            t0 = time.perf_counter()
            y = jax.device_put(x)
            np.asarray(y[-64:])  # d2h fence; ~0.04 s fixed cost, charged
            # to the probe — errs conservative (reads slightly SLOW) on
            # high-RTT eras, never fast on a collapsed one
            dt = max(time.perf_counter() - t0, 1e-6)
            _h2d_bandwidth = x.nbytes / 1e6 / dt
        except Exception:
            _h2d_bandwidth = 1e9  # assume fast when unprobeable
    return _h2d_bandwidth


def ensure() -> None:
    global _initialized
    if _initialized:
        return
    _initialized = True
    cache_dir = os.environ.get(
        "NEEDLE_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "needle_tpu_jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
