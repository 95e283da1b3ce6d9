"""Pallas kernel cross-validation against the sweep engine.

On CPU the kernel runs in interpreter mode (same semantics as the
compiled Mosaic kernel up to fp contraction order)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogame_tpu.config import SimParams
from robogame_tpu.physics.pallas_step import step_pallas_batch
from robogame_tpu.physics.sweep import step_sweep
from robogame_tpu.state import initial_state

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _batch_states(params, x0s, seeds):
    keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(seeds, jnp.uint32))
    return jax.vmap(lambda k, x0: initial_state(params, x0_puck=x0,
                                                seed=k))(
        keys, jnp.asarray(x0s, jnp.float32))


def test_pallas_matches_sweep_random_play():
    params = SimParams(dtype="float32", engine="sweep", winning_score=3)
    B = 8
    rng = np.random.default_rng(5)
    x0s = np.concatenate([
        np.tile([3.2, 0.1, 9.0, 0.0], (B // 2, 1)),   # scoring runs
        np.tile([0.0, 0.3, 2.0, 1.0], (B // 2, 1)),   # bouncy runs
    ])
    s_sw = s_pl = _batch_states(params, x0s, np.arange(1, B + 1))
    maxd = 0.0
    for _ in range(25):
        u = jnp.asarray(rng.uniform(-8, 8, (B, 4, 2)), jnp.float32)
        s_sw = jax.vmap(lambda s, uu: step_sweep(s, uu, params))(s_sw, u)
        s_pl = step_pallas_batch(s_pl, u, params)
        maxd = max(maxd, float(jnp.abs(s_sw.x - s_pl.x).max()))
    assert maxd < 1e-4, maxd
    np.testing.assert_array_equal(np.asarray(s_sw.score),
                                  np.asarray(s_pl.score))
    np.testing.assert_allclose(np.asarray(s_sw.damage),
                               np.asarray(s_pl.damage), atol=1e-5)


def test_pallas_scripted_scenario_scores():
    """Replay a golden schedule (batch of 1): scores must match the sweep
    engine, which is itself validated against the reference-exact event
    engine (tests/test_sweep.py)."""
    name = "kick_goal_10s"
    with open(os.path.join(GOLDEN, f"{name}.json")) as f:
        meta = json.load(f)
    sched = np.loadtxt(os.path.join(GOLDEN, f"{name}.sched.txt"))
    sched = jnp.asarray(sched.reshape(-1, 1, 4, 2), jnp.float32)
    params = SimParams(dt=meta["dt"], winning_score=100, dtype="float32",
                       engine="sweep")
    s_sw = s_pl = _batch_states(params, [meta["x0"]], [0])
    for k in range(meta["n_steps"]):
        s_sw = jax.vmap(lambda s, uu: step_sweep(s, uu, params))(
            s_sw, sched[k])
        s_pl = step_pallas_batch(s_pl, sched[k], params)
    # scores (the discrete outcome) must agree; positions decorrelate in
    # this wall-grinding scenario (same tolerance philosophy as
    # tests/test_sweep.py FULL_RUN_TOL - grinding amplifies fp seeds)
    np.testing.assert_array_equal(np.asarray(s_sw.score),
                                  np.asarray(s_pl.score))
    assert np.isfinite(np.asarray(s_pl.x)).all()


def test_pallas_stochastic_variance_matches_sweep():
    """Noise plane path: velocity variance agrees with the sweep engine
    (same statistical model, different PRNG streams)."""
    B, n = 128, 3
    params = SimParams(dtype="float32", engine="sweep", stochastic=True,
                       noise=0.8)
    s_pl = _batch_states(params, np.zeros((B, 4)), np.arange(1, B + 1))
    s_sw = s_pl
    u = jnp.zeros((B, 4, 2), jnp.float32)
    for _ in range(n):
        s_pl = step_pallas_batch(s_pl, u, params)
        s_sw = jax.vmap(lambda s, uu: step_sweep(s, uu, params))(s_sw, u)
    v_pl = np.asarray(s_pl.x)[:, :4, 2:4]
    v_sw = np.asarray(s_sw.x)[:, :4, 2:4]
    assert v_pl.std() > 0
    assert abs(v_pl.std() - v_sw.std()) / v_sw.std() < 0.25


def test_pallas_pads_odd_batch():
    """B not a multiple of 128 pads internally and returns B results."""
    params = SimParams(dtype="float32", engine="sweep")
    B = 3
    s = _batch_states(params, np.zeros((B, 4)), np.arange(B))
    out = step_pallas_batch(s, jnp.zeros((B, 4, 2)), params)
    assert out.x.shape == (B, 5, 4)
    assert np.isfinite(np.asarray(out.x)).all()


def test_single_game_pallas_dispatch():
    """engine='pallas' through the scalar step()/GameSim path (wraps a
    batch of one, padded to a lane tile internally)."""
    from robogame_tpu import GameSim
    params = SimParams(engine="pallas")
    sim = GameSim(params)
    vec = sim.reset(x0_ball=[0.0, 0.3, 2.0, 1.0])
    for _ in range(3):
        vec = sim.run(np.ones(2), np.zeros(2), np.zeros(2), np.zeros(2))
    assert np.isfinite(np.asarray(vec)).all()
    assert abs(float(vec[2])) > 0.01       # puck moved
