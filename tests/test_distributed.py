"""Actually-multi-process ``jax.distributed`` execution (SURVEY §2.6
distributed comm backend; VERDICT r4 missing #3).

The reference has no distributed anything (single process, single
thread — /root/reference/py/MonteCarlo.py:23-45); this repo's multi-host
path is ``parallel/mesh.py::init_distributed``.  Every other multi-device
artifact in the repo is a single-process virtual mesh; this test spawns
real coordinator-connected worker processes on localhost (Gloo-backed CPU
collectives — the same program topology a pod slice runs over ICI/DCN)
and asserts the sharded rollout + collective aggregation matches the
single-process result (scores bit-exact, damage to f32 roundoff).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "distributed_mc.py")


def _run(nproc, dpp, port):
    # clean env: the parent conftest pins jax to CPU via jax.config, but
    # the spawned workers configure themselves (and must not inherit a
    # forced device-count XLA flag from the test session)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, TOOL, "--nproc", str(nproc),
         "--devices-per-proc", str(dpp), "--games", "32", "--steps", "30",
         "--sweep-iters", "8", "--port", str(port)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    return rec


def test_two_process_distributed_mc():
    rec = _run(nproc=2, dpp=2, port=9931)
    assert rec["ok"] is True
    assert rec["global_devices"] == 4
    assert rec["score_exact"] and rec["damage_close"] and rec["stats_close"]
    # the workload must actually produce damage for the aggregation check
    # to mean anything
    assert rec["stats"]["damage_total"] > 1.0
