#!/usr/bin/env python3
"""Transport-era probe: characterize the tunnel BEFORE trusting any timing.

This environment's host<->device link swings 9 MB/s - 1.3 GB/s between
sessions, the first device->host transfer can stall minutes, and CPU
throttle eras slow host code 5-20x (CLAUDE.md). Run this first; interpret
every other measurement against its numbers. Prints ONE JSON line:

  warm_s          first-roundtrip stall absorbed before measuring
  h2d_mb_s        upload bandwidth at 8/64/160 MB payloads
  d2h_mb_s        download bandwidth at 8/64 MB payloads
  dispatch_ms     median latency of a tiny compiled dispatch (RTT proxy)
  host_gflops     dumb float loop rate (CPU-throttle detector; compare
                  ~1.0+ on a healthy era for this host)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    out = {}
    # warm_s covers the WHOLE warm-up: the first roundtrip plus however
    # long the retry loop spends before roundtrips get quick — on slow
    # eras most wall time goes here and must be visible in the artifact
    warm_t0 = time.perf_counter()
    np.asarray(jax.device_put(np.ones(64, np.float32)) * 2.0)
    deadline = time.time() + 600
    while time.time() < deadline:
        t0 = time.perf_counter()
        np.asarray(jax.device_put(np.ones(64, np.float32)) * 2.0)
        if time.perf_counter() - t0 < 0.3:
            break
    out["warm_s"] = round(time.perf_counter() - warm_t0, 3)

    h2d = {}
    for mb in (8, 64, 160):
        buf = np.zeros(mb * 1_000_000 // 2, np.int16)
        t0 = time.perf_counter()
        dev = jax.device_put(buf)
        dev.block_until_ready()
        # only a d2h transfer reliably fences on this transport
        np.asarray(dev[:4])
        h2d[str(mb)] = round(mb / (time.perf_counter() - t0), 1)
    out["h2d_mb_s"] = h2d

    d2h = {}
    for mb in (8, 64):
        dev = jax.device_put(np.zeros(mb * 1_000_000 // 2, np.int16))
        np.asarray(dev[:4])
        t0 = time.perf_counter()
        np.asarray(dev)
        d2h[str(mb)] = round(mb / (time.perf_counter() - t0), 1)
    out["d2h_mb_s"] = d2h

    f = jax.jit(lambda x: x * 2 + 1)
    x = jax.device_put(np.ones(128, np.float32))
    np.asarray(f(x))  # compile
    lat = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(f(x))
        lat.append(time.perf_counter() - t0)
    out["dispatch_ms"] = round(sorted(lat)[len(lat) // 2] * 1e3, 2)

    a = np.random.default_rng(0).standard_normal((512, 512)).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(4):
        a = a @ a * 1e-3
    out["host_gflops"] = round(4 * 2 * 512**3 / (time.perf_counter() - t0) / 1e9, 2)
    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
