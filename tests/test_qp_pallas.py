"""Parity tests: lanes-batched Pallas ADMM (ops.qp_pallas.solve_qp_lanes)
vs the XLA reference solver (ops.qp.solve_qp) -- same algorithm, same
rho schedule, same convergence semantics, so solutions must agree to
f32 round-off on identical problems."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robogame_tpu.ops.qp import solve_qp
from robogame_tpu.ops.qp_pallas import solve_qp_lanes, solve_qp_lanes_joint


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


def make_joint_qps(B, n1, m_own, m_pair, seed=0):
    """Structured two-agent problem + its dense assembly: H block
    diagonal, constraint rows [box (implicit); own1; own2; pair]."""
    rng = np.random.default_rng(seed)
    n2 = 2 * n1
    Q = rng.normal(size=(B, 2, n1, n1)).astype(np.float32)
    Hb = (np.einsum("bpij,bpkj->bpik", Q, Q) / n1 +
          0.1 * np.eye(n1, dtype=np.float32))
    g = rng.normal(size=(B, n2)).astype(np.float32)
    Ab = rng.normal(size=(B, 2, m_own + m_pair, n1)).astype(np.float32)
    l = rng.uniform(-2, 0, size=(B, 2 * m_own + m_pair)).astype(np.float32)
    u = rng.uniform(0.1, 2, size=(B, 2 * m_own + m_pair)).astype(np.float32)
    lx = -3.0 * np.ones((B, n2), np.float32)
    ux = 3.0 * np.ones((B, n2), np.float32)

    H = np.zeros((B, n2, n2), np.float32)
    H[:, :n1, :n1] = Hb[:, 0]
    H[:, n1:, n1:] = Hb[:, 1]
    A = np.zeros((B, n2 + 2 * m_own + m_pair, n2), np.float32)
    A[:, :n2] = np.eye(n2, dtype=np.float32)
    A[:, n2:n2 + m_own, :n1] = Ab[:, 0, :m_own]
    A[:, n2 + m_own:n2 + 2 * m_own, n1:] = Ab[:, 1, :m_own]
    A[:, n2 + 2 * m_own:, :n1] = Ab[:, 0, m_own:]
    A[:, n2 + 2 * m_own:, n1:] = Ab[:, 1, m_own:]
    ld = np.concatenate([lx, l], axis=1)
    ud = np.concatenate([ux, u], axis=1)
    joint = (jnp.asarray(Hb), jnp.asarray(g), jnp.asarray(Ab),
             jnp.asarray(l), jnp.asarray(u), jnp.asarray(lx),
             jnp.asarray(ux))
    dense = (jnp.asarray(H), jnp.asarray(g), jnp.asarray(A),
             jnp.asarray(ld), jnp.asarray(ud))
    return joint, dense


@pytest.mark.parametrize("n1,m_own,m_pair,scale",
                         [(8, 5, 3, False),      # row padding both blocks
                          (16, 12, 8, True)])    # scale_rows parity
def test_joint_matches_dense(n1, m_own, m_pair, scale):
    """solve_qp_lanes_joint (per-player blocks, implicit box rows,
    block-Schur solve) == solve_qp on the assembled dense problem.  The
    production CMPC shape (n1=40, m_own=80, m_pair=20) is pinned by
    tests/test_mpc.py::test_cmpc_batch_joint_matches via the controller;
    here small shapes keep the interpret-mode kernel fast."""
    B = 5
    joint, dense = make_joint_qps(B, n1, m_own, m_pair, seed=n1)
    ref = ref_solve(*dense, iters=60, scale_rows=scale)
    got = solve_qp_lanes_joint(*joint, m_own=m_own, m_pair=m_pair,
                               iters=60, scale_rows=scale)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x),
                               atol=2e-3, rtol=1e-2)
    agree = np.mean(np.asarray(got.converged) ==
                    np.asarray(ref.converged))
    assert agree >= (B - 1) / B


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
