"""Unit tests for the controller stack: CBF filter, bounce-pass contact
planner, and obstacle-avoiding SQP trajectories."""

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import CbfParams, SimParams, StrategyParams
from robogame_tpu.control.cbf import safe_control
from robogame_tpu.control.contact import bounce_pass_wall, simulate_bounce
from robogame_tpu.control.obstacles import (_obs_arrays,
                                            intercepting_with_obs_avoidance,
                                            intercepting_with_obs_avoidance_bb,
                                            min_time_traj_avoid_obs)
from robogame_tpu.models.lqsys import exact_ab

PARAMS = SimParams(dtype="float64")
CBF = CbfParams()


def test_cbf_inactive_returns_nominal():
    """All players separating -> no active constraints -> u == u_nominal."""
    p = jnp.asarray([[-2.0, 1.0], [-2.0, -1.0], [2.0, 1.0], [2.0, -1.0]])
    v = jnp.asarray([[-1.0, 0.0], [-1.0, 0.0], [1.0, 0.0], [1.0, 0.0]])
    u_nom = jnp.asarray([[3.0, 1.0], [2.0, -1.0], [-3.0, 0.5], [0.0, 0.0]])
    res = safe_control(u_nom, p, v, PARAMS, CBF)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_nom),
                               atol=1e-3)


def test_cbf_batch_matches_per_game():
    """safe_control_batch (the lanes-kernel integration path) must equal
    vmapped per-game safe_control on its XLA fallback."""
    from robogame_tpu.control.cbf import safe_control_batch
    B = 5
    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.uniform(-1, 1, (B, 4, 2)) * np.array([4, 2]))
    v = jnp.asarray(rng.uniform(-3, 3, (B, 4, 2)))
    u = jnp.asarray(rng.uniform(-10, 10, (B, 4, 2)))
    ref = jax.vmap(lambda a, b, c: safe_control(a, b, c, PARAMS, CBF))(
        u, p, v)
    got = safe_control_batch(u, p, v, PARAMS, CBF, use_lanes=False)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u),
                               atol=1e-9)
    np.testing.assert_array_equal(np.asarray(got.converged),
                                  np.asarray(ref.converged))


def test_cbf_head_on_modifies_controls():
    """Two players closing fast head-on: the filter must brake them."""
    p = jnp.asarray([[-0.5, 0.0], [0.5, 0.0], [3.0, 2.0], [3.0, -2.0]])
    v = jnp.asarray([[3.0, 0.0], [-3.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
    u_nom = jnp.asarray([[10.0, 0.0], [-10.0, 0.0], [0.0, 0.0],
                         [0.0, 0.0]])
    res = safe_control(u_nom, p, v, PARAMS, CBF)
    assert bool(res.converged)
    u = np.asarray(res.u)
    # commanded accelerations along the collision axis must be reduced
    assert u[0, 0] < 9.0 and u[1, 0] > -9.0
    assert np.all(np.abs(u) <= PARAMS.input_limit + 1e-6)
    # the barrier constraint holds at the solution
    tau, amax, Ds = PARAMS.tau_player, 2 * PARAMS.input_limit, \
        CBF.safety_radius
    pij = np.asarray(p[0] - p[1]); vij = np.asarray(v[0] - v[1])
    pn = np.linalg.norm(pij); pu = pij / pn
    vcol = pu @ vij
    E = np.exp((pn + tau * vcol - Ds) / (tau * amax))
    h = (amax - vcol) * E - amax
    vperp2 = vij @ vij - vcol ** 2
    hdot = E * (-vperp2 / pn + (amax - vcol) / (tau * amax) *
                (vcol + tau / pn * vperp2) +
                vcol / (tau * amax) * (vcol - pu @ (u[0] - u[1])))
    assert hdot >= -CBF.barrier_gain * h ** 3 - 1e-3


def test_bounce_pass_reaches_goal():
    """tau_puck = 1 (the bounce_kick regime, reference run_sim.py:20)."""
    params = SimParams(dtype="float64", tau_puck=1.0)
    p_puck = jnp.asarray([-2.0, 0.0])
    p_goal = jnp.asarray([5.0, 0.0])
    for wall in ("up", "down"):
        plan = bounce_pass_wall(p_puck, p_goal, wall, params)
        assert bool(plan.success), f"no bounce plan for wall={wall}"
        p_c, p_end, v_end = simulate_bounce(p_puck, plan.v0, plan.h[0],
                                            plan.h[1], params, wall)
        sgn = 1.0 if wall == "up" else -1.0
        np.testing.assert_allclose(
            float(p_c[1]), sgn * (params.arena_y / 2 - params.puck_radius),
            atol=1e-6)
        np.testing.assert_allclose(np.asarray(p_end), np.asarray(p_goal),
                                   atol=1e-6)
        # end velocity points into the goal (reference constraint 93-102)
        assert float(v_end[0]) >= 0.1
        assert sgn * float(v_end[1]) <= -0.1


def test_bounce_pass_validates_wall_name():
    import pytest
    with pytest.raises(ValueError):
        bounce_pass_wall(jnp.zeros(2), jnp.zeros(2), "left", PARAMS)


def _rollout_positions(traj, x0, params, n):
    A, B = exact_ab(params.dt, params.tau_player, jnp.float64)
    xs, x = [], x0
    for k in range(n):
        x = A @ x + B @ traj.u[:, k]
        xs.append(np.asarray(x))
    return np.stack(xs)


def test_intercepting_obs_solver_matches_exact_optimum():
    """With the obstacle far away (inactive) the SQP must reproduce the
    closed-form optimum of the reference's cost (10 terminal + 1 effort,
    NonLinearOptimizer.py:27,38)."""
    from robogame_tpu.models.lqsys import condense
    p0 = jnp.asarray([-1.0, 0.0]); v0 = jnp.zeros(2)
    pf = jnp.asarray([1.0, 0.0]); vf = jnp.zeros(2)
    obs, obs_r, mask = _obs_arrays([np.array([4.0, 2.0])], None, PARAMS,
                                   jnp.float64, include_puck=False)
    n = 20
    traj = intercepting_with_obs_avoidance(p0, v0, pf, vf, obs, obs_r,
                                           mask, PARAMS, n)
    assert bool(traj.success)
    A, B = exact_ab(PARAMS.dt, PARAMS.tau_player, jnp.float64)
    phi, gam = condense(A, B, n)
    gN = np.asarray(gam[4 * (n - 1):]); phiN = np.asarray(phi[4 * (n - 1):])
    x0 = np.array([-1, 0, 0, 0.]); xfn = np.array([1, 0, 0, 0.])
    H = np.eye(2 * n) + 10 * gN.T @ gN
    U_star = np.linalg.solve(H, -10 * gN.T @ (phiN @ x0 - xfn))
    np.testing.assert_allclose(np.asarray(traj.u[:, :n]).T.reshape(-1),
                               U_star, atol=2e-2)


def test_intercepting_with_obs_avoidance_detours():
    """Obstacle on the straight path: trajectory must keep clear while
    still making progress toward the target."""
    p0 = jnp.asarray([-1.5, 0.0]); v0 = jnp.zeros(2)
    pf = jnp.asarray([1.5, 0.0]); vf = jnp.zeros(2)
    obs_p = np.array([-0.4, 0.02])
    obs, obs_r, mask = _obs_arrays([obs_p], None, PARAMS, jnp.float64,
                                   include_puck=False)
    n = 40
    traj = intercepting_with_obs_avoidance(p0, v0, pf, vf, obs, obs_r,
                                           mask, PARAMS, n)
    assert bool(traj.success)
    xs = _rollout_positions(traj, jnp.concatenate([p0, v0]), PARAMS, n)
    dmin = np.linalg.norm(xs[:, 0:2] - obs_p, axis=1).min()
    assert dmin >= 2 * PARAMS.player_radius - 0.06
    # progress toward the target (the reference's 10-terminal/1-effort
    # weights only close part of the gap; see
    # test_intercepting_obs_solver_matches_exact_optimum)
    assert xs[-1, 0] > float(p0[0]) + 0.5


def test_intercepting_bb_variant():
    p0 = jnp.asarray([-3.0, 0.0]); v0 = jnp.zeros(2)
    pf = jnp.asarray([3.0, 0.0]); vf = jnp.zeros(2)
    obs, obs_r, mask = _obs_arrays([np.array([0.0, 0.05])], None, PARAMS,
                                   jnp.float64, include_puck=False)
    n = 40
    traj = intercepting_with_obs_avoidance_bb(p0, v0, pf, vf, obs, obs_r,
                                              mask, PARAMS, n)
    assert bool(traj.success)
    xs = _rollout_positions(traj, jnp.concatenate([p0, v0]), PARAMS, n)
    dmin = np.abs(xs[:, 0:2] - np.array([0.0, 0.05])).max(axis=1).min()
    # axis-separation: at every knot one axis distance >= r - tol
    assert dmin >= 2 * PARAMS.player_radius - 0.06
    np.testing.assert_allclose(xs[-1], np.concatenate([pf, vf]), atol=0.05)


def test_min_time_traj_avoid_obs():
    p0 = jnp.asarray([-2.0, 0.0]); v0 = jnp.zeros(2)
    pf = jnp.asarray([2.0, 0.0]); vf = jnp.asarray([2.0, 0.0])
    obs, obs_r, mask = _obs_arrays([np.array([0.0, 0.0])], None, PARAMS,
                                   jnp.float64, include_puck=False)
    traj = min_time_traj_avoid_obs(p0, v0, pf, vf, obs, obs_r, mask, PARAMS)
    assert bool(traj.success)
    assert int(traj.length) == 20
