"""Unit tests for bench.py's era-robustness helpers.

The bench artifact is the driver's recorded evidence (VERDICT r2 weak #3:
slow trials must be attributable from the artifact alone), so its era
logic is worth pinning: the gate must honor the NEEDLE_TPU_H2D_MBS
override (and therefore never block tests), report its probes, and the
reprobe path must actually reset the process cache.
"""

import importlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _bench():
    sys.path.insert(0, str(REPO))
    import bench

    return importlib.reload(bench)


def test_era_gate_passes_immediately_on_fast_wire(monkeypatch):
    monkeypatch.setenv("NEEDLE_TPU_H2D_MBS", "500.0")
    bench = _bench()
    out = bench.wait_for_usable_era()
    assert out["era_wait_probes_mb_s"] == [500.0]
    assert out["era_wait_s"] < 5.0


def test_era_gate_bounded_on_collapsed_wire(monkeypatch):
    monkeypatch.setenv("NEEDLE_TPU_H2D_MBS", "3.0")
    # Budget below one sleep interval: the gate must break out before
    # sleeping (time budget check), not loop.
    monkeypatch.setenv("NEEDLE_BENCH_ERA_WAIT_S", "10")
    bench = _bench()
    out = bench.wait_for_usable_era()
    assert out["era_wait_probes_mb_s"] == [3.0]
    assert out["era_wait_s"] < 5.0


def test_transport_watchdog_fires_on_dead_transport():
    """With the tunnel agent dead, the first device call blocks forever
    inside the runtime; the watchdog must print one diagnostic JSON line
    and exit 2 instead of hanging until the driver's timeout."""
    import json
    import subprocess

    code = (
        "import os, time, sys\n"
        "sys.path.insert(0, %r)\n"
        "os.environ['NEEDLE_BENCH_WATCHDOG_S'] = '0.5'\n"
        "import bench\n"
        "bench.arm_transport_watchdog()\n"
        "time.sleep(30)  # simulated hang inside a device call\n"
    ) % str(REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=25,
    )
    assert proc.returncode == 2
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["value"] is None
    assert "transport" in line["metric"]
    assert "outage" in line["error"]


def test_transport_watchdog_disarmed_by_roundtrip():
    """Once any roundtrip completes, the watchdog must never fire."""
    import subprocess

    code = (
        "import os, time, sys\n"
        "sys.path.insert(0, %r)\n"
        "os.environ['NEEDLE_BENCH_WATCHDOG_S'] = '0.5'\n"
        "import bench\n"
        "bench.arm_transport_watchdog()\n"
        "bench._WATCHDOG_DISARM.set()  # what warm_device does on success\n"
        "time.sleep(1.5)\n"
        "print('survived')\n"
    ) % str(REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=25,
    )
    assert proc.returncode == 0
    assert "survived" in proc.stdout


def test_h2d_reprobe_resets_cache(monkeypatch):
    sys.path.insert(0, str(REPO))
    from needle_tpu import _jax_setup

    monkeypatch.setattr(_jax_setup, "_h2d_bandwidth", 42.0)
    assert _jax_setup.h2d_bandwidth_mb_s() == 42.0
    monkeypatch.setenv("NEEDLE_TPU_H2D_MBS", "77.0")
    # Without reprobe the cached value wins; with reprobe the env (and on
    # real runs, a fresh measurement) is consulted again.
    assert _jax_setup.h2d_bandwidth_mb_s() == 42.0
    assert _jax_setup.h2d_bandwidth_mb_s(reprobe=True) == 77.0
