"""Unit tests for tools/era_watch.py's fire decision (`decide`).

The watcher spends recorded-bench attempts only on transport eras that can
beat the best result so far (CLAUDE.md: the wire swings 9 MB/s-1.3 GB/s);
these tests pin the tier arithmetic without subprocesses or sleeps.
"""

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
spec = importlib.util.spec_from_file_location(
    "era_watch", REPO / "tools" / "era_watch.py"
)
era_watch = importlib.util.module_from_spec(spec)
sys.modules["era_watch"] = era_watch
spec.loader.exec_module(era_watch)

decide = era_watch.decide
FULL_BARS = era_watch.FULL_BARS
DENSE_BARS = era_watch.DENSE_BARS
FAIL_SLACK = era_watch.FAIL_SLACK


def fresh_state(**over):
    s = {
        "best_full": None,
        "best_dense": None,
        "last_full": 0.0,
        "last_dense": 0.0,
        "fired_full": 0,
        "fired_dense": 0,
        "failed_full": 0,
        "failed_dense": 0,
    }
    s.update(over)
    return s


def probe(h2d=50.0, d2h=30.0, gf=80.0):
    return {"h2d64_mb_s": h2d, "d2h16_mb_s": d2h, "host_gflops": gf}


NOW = 100_000.0
DEADLINE = NOW + 10_000.0


def test_first_full_attempt_fires_on_modest_era():
    assert decide(fresh_state(), probe(h2d=FULL_BARS[0]), NOW, DEADLINE) == "full"


def test_dead_tunnel_probe_fires_nothing():
    assert decide(fresh_state(), {"dead_tunnel": True}, NOW, DEADLINE) is None


def test_throttled_host_blocks_even_fast_wire():
    assert decide(fresh_state(), probe(h2d=200.0, gf=5.0), NOW, DEADLINE) is None


def test_bars_tighten_after_each_success():
    s = fresh_state(fired_full=1, last_full=NOW - 10_000)
    # a wire that passed tier 0 no longer passes tier 1
    assert decide(s, probe(h2d=FULL_BARS[0]), NOW, DEADLINE) != "full"
    assert decide(s, probe(h2d=FULL_BARS[1]), NOW, DEADLINE) == "full"


def test_best_result_raises_the_bar_beyond_the_tier():
    # best_full = 8 s with ~430 MB on the wire means only h2d above
    # 430/(8-4) = 107.5 MB/s can possibly beat it — tier 1's 65 MB/s bar
    # must be overridden upward.
    s = fresh_state(fired_full=1, best_full=8.0, last_full=NOW - 10_000)
    assert decide(s, probe(h2d=FULL_BARS[1], d2h=0.0), NOW, DEADLINE) is None
    assert decide(s, probe(h2d=110.0), NOW, DEADLINE) == "full"


def test_target_reached_stops_firing():
    s = fresh_state(best_full=4.2, last_full=NOW - 10_000)
    # (d2h=0 isolates the full config: dense may legitimately still fire)
    assert decide(s, probe(h2d=1000.0, d2h=0.0), NOW, DEADLINE) is None


def test_failed_attempts_do_not_consume_tiers_but_cap_out():
    # failures keep the bar at tier 0 ...
    s = fresh_state(failed_full=2, last_full=NOW - 10_000)
    assert decide(s, probe(h2d=FULL_BARS[0]), NOW, DEADLINE) == "full"
    # ... until the failure slack is exhausted
    s = fresh_state(failed_full=len(FULL_BARS) + FAIL_SLACK,
                    last_full=NOW - 10_000)
    assert decide(s, probe(h2d=1000.0, d2h=0.0), NOW, DEADLINE) is None


def test_cooldown_blocks_back_to_back_runs():
    s = fresh_state(last_full=NOW - 60, last_dense=NOW - 60)
    assert decide(s, probe(h2d=1000.0, d2h=1000.0), NOW, DEADLINE) is None


def test_budget_tail_blocks_new_runs():
    assert decide(fresh_state(), probe(h2d=1000.0), NOW, NOW + 600) is None


def test_dense_fires_when_full_is_on_cooldown():
    s = fresh_state(last_full=NOW - 60, last_dense=NOW - 10_000)
    assert decide(s, probe(h2d=40.0, d2h=DENSE_BARS[0]), NOW, DEADLINE) == "dense"


def test_dense_needs_d2h_not_just_h2d():
    s = fresh_state(last_full=NOW - 60)
    assert decide(
        s, probe(h2d=200.0, d2h=DENSE_BARS[0] - 1), NOW, DEADLINE
    ) is None
