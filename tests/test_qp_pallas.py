"""Parity tests: lanes-batched Pallas ADMM (ops.qp_pallas.solve_qp_lanes)
vs the XLA reference solver (ops.qp.solve_qp) -- same algorithm, same
rho schedule, same convergence semantics, so solutions must agree to
f32 round-off on identical problems."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robogame_tpu.ops.qp import solve_qp
from robogame_tpu.ops.qp_pallas import solve_qp_lanes


def make_qps(B, n, m, seed=0, n_eq=0, cond=10.0):
    rng = np.random.default_rng(seed)
    Q = rng.normal(size=(B, n, n)).astype(np.float32)
    # SPD with controlled conditioning
    H = np.einsum("bij,bkj->bik", Q, Q) / n + \
        np.eye(n, dtype=np.float32) / cond
    g = rng.normal(size=(B, n)).astype(np.float32)
    A = rng.normal(size=(B, m, n)).astype(np.float32)
    l = rng.uniform(-2.0, 0.0, size=(B, m)).astype(np.float32)
    u = rng.uniform(0.1, 2.0, size=(B, m)).astype(np.float32)
    if n_eq:
        b_eq = rng.uniform(-0.5, 0.5, size=(B, n_eq)).astype(np.float32)
        l[:, :n_eq] = b_eq
        u[:, :n_eq] = b_eq
    return (jnp.asarray(H), jnp.asarray(g), jnp.asarray(A),
            jnp.asarray(l), jnp.asarray(u))


def ref_solve(H, g, A, l, u, **kw):
    return jax.vmap(lambda *a: solve_qp(*a, **kw))(H, g, A, l, u)


@pytest.mark.parametrize("n,m,n_eq",
                         [(8, 12, 0), (8, 20, 4), (16, 50, 0),
                          (10, 17, 0)])   # n % 8 != 0: dummy-var padding
def test_matches_xla_solver(n, m, n_eq):
    B = 9                       # non-multiple of 128: exercises padding
    H, g, A, l, u = make_qps(B, n, m, seed=n + m, n_eq=n_eq)
    ref = ref_solve(H, g, A, l, u, iters=60)
    got = solve_qp_lanes(H, g, A, l, u, iters=60)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=2e-3, rtol=1e-2)
    # convergence flags agree except at the threshold knife-edge
    agree = np.mean(np.asarray(got.converged) ==
                    np.asarray(ref.converged))
    assert agree >= 8 / 9, (np.asarray(got.converged),
                            np.asarray(ref.converged))


def test_matches_at_production_dmpc_shape():
    """n=40 variables, m=140 rows: the production DMPC condensed QP."""
    B = 16
    H, g, A, l, u = make_qps(B, 40, 140, seed=3)
    ref = ref_solve(H, g, A, l, u, iters=60, scale_rows=True)
    got = solve_qp_lanes(H, g, A, l, u, iters=60, scale_rows=True)
    x_r, x_g = np.asarray(ref.x), np.asarray(got.x)
    # compare objective values (solutions may differ within solver tol)
    def obj(x):
        return (0.5 * np.einsum("bi,bij,bj->b", x, np.asarray(H), x) +
                np.einsum("bi,bi->b", np.asarray(g), x))
    np.testing.assert_allclose(obj(x_g), obj(x_r), atol=5e-3, rtol=2e-2)
    np.testing.assert_allclose(x_g, x_r, atol=5e-3, rtol=5e-2)


def test_solution_quality_vs_projected_truth():
    """On a box-QP with known solution: x* = clip(-H^{-1}g) when the
    unconstrained optimum is interior for most coordinates."""
    B, n = 8, 8
    rng = np.random.default_rng(7)
    H = np.stack([np.eye(n, dtype=np.float32) * (1.0 + i) for i in
                  range(B)])
    g = rng.normal(size=(B, n)).astype(np.float32)
    A = np.broadcast_to(np.eye(n, dtype=np.float32), (B, n, n)).copy()
    l = -np.ones((B, n), np.float32) * 10.0
    u = np.ones((B, n), np.float32) * 10.0
    got = solve_qp_lanes(jnp.asarray(H), jnp.asarray(g), jnp.asarray(A),
                         jnp.asarray(l), jnp.asarray(u), iters=60)
    x_true = -g / (1.0 + np.arange(B))[:, None]
    assert np.asarray(got.converged).all()
    np.testing.assert_allclose(np.asarray(got.x), x_true, atol=1e-3)
