"""Checkpoint/resume and profiling utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import SimParams
from robogame_tpu.physics.engine import step
from robogame_tpu.state import initial_state
from robogame_tpu.utils.checkpoint import (checkpointed_scan,
                                           load_checkpoint,
                                           save_checkpoint)
from robogame_tpu.utils.profiling import PhaseTimer, counters_line

PARAMS = SimParams(dtype="float64", engine="sweep")


def test_checkpoint_roundtrip(tmp_path):
    s = initial_state(PARAMS, x0_puck=[1.0, 0.5, -2.0, 0.3], seed=7)
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, s, meta={"step": 42})
    s2, meta = load_checkpoint(p, s)
    assert meta["step"] == 42
    for a, b in zip(jax.tree_util.tree_leaves(s),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpointed_scan_resumes(tmp_path):
    """Interrupting after the first chunk and re-running must produce the
    same state as an uninterrupted run."""
    p = str(tmp_path / "run.npz")
    u = jnp.zeros((4, 2))

    def step_fn(s):
        return step(s, u, PARAMS)

    s0 = initial_state(PARAMS, x0_puck=[0.0, 0.3, 2.0, 1.0])
    full = checkpointed_scan(step_fn, s0, 10,
                             str(tmp_path / "full.npz"), every=100)

    # "crash" after 4 steps: first run only does 4, second resumes to 10
    partial = checkpointed_scan(step_fn, s0, 4, p, every=2)
    resumed = checkpointed_scan(step_fn, s0, 10, p, every=3)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               atol=1e-12)
    assert float(resumed.t) == float(full.t)


def test_phase_timer_and_counters():
    pt = PhaseTimer()
    with pt.phase("work", items=100):
        sum(range(1000))
    assert pt.seconds()["work"] > 0
    assert pt.rates()["work"] > 0
    line = counters_line("m", 1.234, "x/s", 2.0)
    import json
    d = json.loads(line)
    assert d == {"metric": "m", "value": 1.2, "unit": "x/s",
                 "vs_baseline": 2.0}


def test_puck_player_mpc():
    from robogame_tpu.config import MpcParams
    from robogame_tpu.control.puck_player_mpc import JointPuckPlayerMPC
    mpc = MpcParams(N=10, t_grid=4, sqp_iters=2, qp_iters=80)
    ctrl = JointPuckPlayerMPC(PARAMS, mpc)
    ok, u1, u2 = ctrl.compute_control(
        np.array([-2.0, 0, 0, 0]), np.array([-2.0, -1, 0, 0]),
        np.array([1.0, 0, 0, 0]), np.array([5.0, 0.0]),
        np.array([[3.0, 2.0], [3.0, -2.0]]))
    assert ok
    assert u1[0] > 0.5            # drives toward the puck (at +x)
    np.testing.assert_array_equal(u2, np.zeros(2))  # reference returns 0s
