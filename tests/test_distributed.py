"""Multi-host execution proof: 2 real processes over jax.distributed.

The reference is single-process (SURVEY §5.8); needle-tpu's multi-host story
is `parallel.distributed`: initialize the JAX runtime across processes,
round-robin-shard episodes per host (`local_shard`), analyze each shard
locally (persisting `.needle.dat` next to the videos), synchronize, then
search the whole library on the coordinator. This test launches two actual
CPU processes wired through `jax.distributed.initialize` and runs that
exact flow end to end, including a cross-process collective barrier.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json
import os
import sys

# Pin CPU before any jax backend init (the axon sitecustomize would
# otherwise route this onto the TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, sys.argv[1])

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from needle_tpu import Analyzer, Comparator
from needle_tpu.duration import Duration
import needle_tpu.parallel.distributed as dist

coord, pid, season = sys.argv[2], int(sys.argv[3]), sys.argv[4]

dist.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert dist.is_initialized()
assert dist.process_count() == 2, dist.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == 2 * len(jax.local_devices())

from pathlib import Path

paths = sorted(Path(season).glob("*.wav"))
mine = dist.local_shard(paths)
assert 0 < len(mine) < len(paths)  # both processes got work

hd = Duration.from_secs_f32(np.float32(0.3))
Analyzer.from_files(mine, backend="numpy").run(hd, persist=True)

# Cross-process barrier (a real collective over the 2-process global device
# set): no process may search before every shard's .dat files exist.
from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("needle-analyze-done")

if dist.is_coordinator():
    results = Comparator.from_files(paths, engine="numpy").run(
        analyze=False, display=False, use_skip_files=False,
        write_skip_files=True,
    )
    out = [
        None
        if r.opening is None
        else [r.opening[0].as_secs_f64(), r.opening[1].as_secs_f64()]
        for r in results
    ]
    Path(season, "RESULTS.json").write_text(json.dumps(out))
print(f"process {pid}: OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_analyze_search(tmp_path):
    from needle_tpu.testing import make_synthetic_season

    season = tmp_path / "season"
    # opening must exceed the default 20 s minimum (comparator defaults)
    make_synthetic_season(
        season, num_episodes=4, episode_secs=90, opening_secs=25, seed=13
    )

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    # hermetic: no axon sitecustomize, no inherited platform/device forcing
    env["PYTHONPATH"] = str(REPO)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(REPO), coord, str(pid), str(season)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"process {pid}: OK" in out

    # every shard analyzed (4 .dat files from 2 processes, 2 each)
    assert len(list(season.glob("*.needle.dat"))) == 4
    # the coordinator searched the UNION of both processes' shards
    results = json.loads((season / "RESULTS.json").read_text())
    assert len(results) == 4
    assert any(r is not None for r in results)
    assert len(list(season.glob("*.needle.skip.json"))) >= 1
