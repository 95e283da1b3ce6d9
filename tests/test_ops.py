"""Tests for the batched QP solver and LTI condensed forms."""

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import SimParams
from robogame_tpu.models.lqsys import condense, euler_ab, exact_ab
from robogame_tpu.ops.qp import solve_box_ls, solve_qp, solve_qp_batch
from robogame_tpu.physics.dynamics import exact_player_step


def test_qp_simple_box():
    # min 1/2 x'Ix - [1,0]'x  s.t. 0 <= x <= 0.5  -> x = (0.5, 0)
    H = jnp.eye(2)
    g = jnp.array([-1.0, 0.0])
    A = jnp.eye(2)
    sol = solve_qp(H, g, A, jnp.zeros(2), 0.5 * jnp.ones(2), iters=100)
    np.testing.assert_allclose(np.asarray(sol.x), [0.5, 0.0], atol=1e-4)
    assert bool(sol.converged)


def test_qp_equality_constraint():
    # min |x|^2 s.t. x0 + x1 == 1  -> x = (0.5, 0.5)
    H = 2 * jnp.eye(2)
    g = jnp.zeros(2)
    A = jnp.array([[1.0, 1.0]])
    sol = solve_qp(H, g, A, jnp.ones(1), jnp.ones(1), iters=200)
    np.testing.assert_allclose(np.asarray(sol.x), [0.5, 0.5], atol=1e-4)


def test_qp_batch():
    H = jnp.stack([jnp.eye(2)] * 3)
    g = jnp.stack([jnp.array([-1.0, 0.0]), jnp.array([0.0, -1.0]),
                   jnp.array([-1.0, -1.0])])
    A = jnp.stack([jnp.eye(2)] * 3)
    lo = jnp.zeros((3, 2))
    hi = jnp.full((3, 2), 0.5)
    sols = solve_qp_batch(H, g, A, lo, hi, iters=100)
    np.testing.assert_allclose(np.asarray(sols.x),
                               [[0.5, 0], [0, 0.5], [0.5, 0.5]], atol=1e-4)


def test_box_ls():
    F = jnp.array([[2.0, 0.0], [0.0, 1.0]])
    b = jnp.array([4.0, -3.0])
    x = solve_box_ls(F, b, -jnp.ones(2), jnp.ones(2), iters=200)
    np.testing.assert_allclose(np.asarray(x), [1.0, -1.0], atol=1e-5)


def test_exact_ab_matches_dynamics():
    tau = 0.5
    A, B = exact_ab(0.05, tau, jnp.float64)
    x0 = jnp.array([1.0, -2.0, 0.5, 3.0])
    u = jnp.array([2.0, -1.0])
    x1 = A @ x0 + B @ u
    ref = exact_player_step(x0, u, 0.05, tau)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(ref), rtol=1e-12)


def test_euler_ab_matches_reference_model():
    dt, tau = 0.05, 0.5
    A, B = euler_ab(dt, tau, jnp.float64)
    A_ref = np.eye(4) + dt * np.array([[0, 0, 1, 0], [0, 0, 0, 1],
                                       [0, 0, -1 / tau, 0],
                                       [0, 0, 0, -1 / tau]])
    B_ref = dt * np.array([[0, 0], [0, 0], [1 / tau, 0], [0, 1 / tau]])
    np.testing.assert_allclose(np.asarray(A), A_ref)
    np.testing.assert_allclose(np.asarray(B), B_ref)


def test_condense_rollout_equivalence():
    A, B = exact_ab(0.1, 0.5, jnp.float64)
    N = 6
    phi, gam = condense(A, B, N)
    x0 = jnp.array([0.5, -0.2, 1.0, 0.0])
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.uniform(-2, 2, (N, 2)))
    X = phi @ x0 + gam @ U.reshape(-1)
    # sequential rollout
    x = x0
    xs = []
    for k in range(N):
        x = A @ x + B @ U[k]
        xs.append(x)
    np.testing.assert_allclose(np.asarray(X).reshape(N, 4),
                               np.asarray(jnp.stack(xs)), rtol=1e-12)
