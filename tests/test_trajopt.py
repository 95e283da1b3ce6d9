"""LinearOptimizer-equivalent tests: simulate planned controls through the
exact model and check goal attainment, input limits, arena bounds."""

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import SimParams
from robogame_tpu.control.trajopt import (Trajectory, intercepting_traj,
                                          min_time_bounce_kick_traj,
                                          min_time_traj)
from robogame_tpu.physics.dynamics import exact_player_step

P = SimParams(dtype="float64")


def playback(x0, traj: Trajectory, params):
    """Simulate the padded control sequence through the exact dynamics at
    dt, like the sim does with open-loop playback."""
    x = jnp.asarray(x0, jnp.float64)
    n = int(traj.length)
    for k in range(n):
        x = exact_player_step(x, traj.u[:, k], params.dt, params.tau_player)
    return x


def test_min_time_reaches_target():
    p0 = jnp.array([-2.5, 1.25])
    v0 = jnp.zeros(2)
    pf = jnp.array([0.0, 0.0])
    vf = jnp.array([3.0, 0.0])
    traj = min_time_traj(p0, v0, pf, vf, P)
    assert bool(traj.success)
    assert float(jnp.abs(traj.u).max()) <= P.input_limit + 1e-6
    xT = playback(jnp.concatenate([p0, v0]), traj, P)
    err = np.abs(np.asarray(xT) - np.asarray(jnp.concatenate([pf, vf])))
    # soft terminal cost: tolerance comparable to the reference behavior
    assert err[:2].max() < 0.3, err
    assert err[2:].max() < 1.0, err


def test_min_time_prefers_short_T_when_easy():
    # target right next to start: min-time term should pick a small T
    p0 = jnp.array([0.0, 0.0]); v0 = jnp.zeros(2)
    pf = jnp.array([0.3, 0.0]); vf = jnp.zeros(2)
    traj = min_time_traj(p0, v0, pf, vf, P)
    assert bool(traj.success)
    assert float(traj.T) < 2.0


def test_intercepting_traj_terminal_equality():
    p0 = jnp.array([-1.0, 0.5]); v0 = jnp.array([0.5, 0.0])
    pf = jnp.array([0.5, -0.5]); vf = jnp.array([2.0, 0.0])
    n_steps = 20   # T = 1.0 at dt = 0.05
    traj = intercepting_traj(p0, v0, pf, vf, P, n_steps)
    assert bool(traj.success)
    xT = playback(jnp.concatenate([p0, v0]), traj, P)
    err = np.abs(np.asarray(xT) - np.asarray(jnp.concatenate([pf, vf])))
    assert err.max() < 5e-2, err


def test_bounce_kick_final_velocity_imparts_desired_puck_vel():
    m1, m2 = P.player_mass, P.puck_mass
    p0 = jnp.array([0.0, 0.0]); v0 = jnp.zeros(2)
    p_puck = jnp.array([1.0, 0.5])
    v_puck = jnp.zeros(2)
    v_des = jnp.array([2.0, 1.0])
    traj = min_time_bounce_kick_traj(p0, v0, p_puck, v_puck, v_des, P)
    assert bool(traj.success)
    xT = np.asarray(playback(jnp.concatenate([p0, v0]), traj, P))
    # apply the elastic reset map at the kick point
    pf, v1 = xT[:2], xT[2:]
    n = np.asarray(p_puck) - pf
    c = 2 * m1 / (m1 + m2)
    v_after = np.asarray(v_puck) - c * np.dot(
        np.asarray(v_puck) - v1, n) / np.dot(n, n) * n
    np.testing.assert_allclose(v_after, np.asarray(v_des), atol=0.15)


def test_min_time_batched():
    p0 = jnp.array([[-2.5, 1.25], [2.5, -1.25]])
    v0 = jnp.zeros((2, 2))
    pf = jnp.zeros((2, 2))
    vf = jnp.array([[3.0, 0.0], [-3.0, 0.0]])
    trajs = jax.vmap(lambda a, b, c, d: min_time_traj(a, b, c, d, P))(
        p0, v0, pf, vf)
    assert trajs.u.shape[0] == 2
    assert bool(trajs.success.all())


def test_min_time_traj_batch_matches_single():
    """min_time_traj_batch (one batched QP launch for all B x T_GRID
    candidates; the lanes kernel on TPU) must reproduce per-instance
    min_time_traj: same chosen final times and controls to solver
    roundoff (identical QPs, different batching => f32 association
    differs)."""
    import jax
    import numpy as np
    from robogame_tpu.control.trajopt import min_time_traj_batch

    params = SimParams(dtype="float32")
    rng = np.random.default_rng(5)
    B = 5
    p0 = jnp.asarray(rng.uniform(-3, 3, (B, 2)), jnp.float32)
    v0 = jnp.asarray(rng.uniform(-2, 2, (B, 2)), jnp.float32)
    pf = jnp.asarray(rng.uniform(-3, 3, (B, 2)), jnp.float32)
    vf = jnp.asarray(rng.uniform(-2, 2, (B, 2)), jnp.float32)
    tb = min_time_traj_batch(p0, v0, pf, vf, params, use_lanes=False)
    for i in range(B):
        ti = min_time_traj(p0[i], v0[i], pf[i], vf[i], params)
        assert bool(ti.success) == bool(tb.success[i])
        np.testing.assert_allclose(float(tb.T[i]), float(ti.T), rtol=1e-6)
        # playback length can flip by one at a floor(T/dt) boundary when
        # T differs at the last ulp; compare the common valid prefix
        n1, n2 = int(ti.length), int(tb.length[i])
        assert abs(n1 - n2) <= 1, (n1, n2)
        n = min(n1, n2)
        np.testing.assert_allclose(np.asarray(tb.u[i][:, :n]),
                                   np.asarray(ti.u[:, :n]), atol=6e-3)
