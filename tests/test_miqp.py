"""Exact MIQP branch & bound vs brute-force enumeration, and the
solve-then-fix incumbent's optimality gap.

The reference solves the big-M obstacle MIQP with Drake's
MixedIntegerBranchAndBound (/root/reference/py/src/NonLinearOptimizer.py:
103-108); ``control.miqp.solve_bb_exact`` is our exact equivalent and
``control.obstacles.intercepting_with_obs_avoidance_bb`` the fast jittable
incumbent.  On small instances we can afford the full 4^(M*N) enumeration
as ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from robogame_tpu.config import SimParams
from robogame_tpu.control import miqp
from robogame_tpu.control.obstacles import intercepting_with_obs_avoidance_bb

P = SimParams(dtype="float64", dt=0.3)

# one obstacle square dead on the straight path
P0, V0 = np.array([-1.5, 0.0]), np.zeros(2)
PF, VF = np.array([1.5, 0.0]), np.zeros(2)
OBS = np.array([[0.0, 0.0]])
S = np.array([0.45])
MASK = np.array([True])
N = 5


def _linf_ok(U, p0, v0, params, n, obs, s, mask, tol=5e-3):
    from robogame_tpu.models.lqsys import exact_ab
    A, B = exact_ab(params.dt, params.tau_player, jnp.float64)
    x = jnp.concatenate([jnp.asarray(p0), jnp.asarray(v0)])
    ps = []
    for k in range(n):
        x = A @ x + B @ jnp.asarray(U).reshape(n, 2)[k]
        ps.append(np.asarray(x[:2]))
    ps = np.stack(ps)
    d = np.abs(ps[None] - obs[:, None]).max(-1)   # (M, n) l-inf distances
    return bool(np.all(~mask[:, None] | (d >= s[:, None] - tol))), ps


def test_bb_matches_enumeration():
    traj, info = miqp.solve_bb_exact(P0, V0, PF, VF, OBS, S, MASK, P, N)
    assert bool(traj.success), info
    assert info["status"] == "optimal"
    f_enum = miqp.solve_enumerate(P0, V0, PF, VF, OBS, S, MASK, P, N)
    assert np.isfinite(f_enum)
    # exact B&B == exhaustive enumeration (same node QP solver)
    assert info["objective"] <= f_enum + 1e-3 * (1 + f_enum)
    assert info["objective"] >= f_enum - 1e-3 * (1 + f_enum)
    # and the B&B pruned: far fewer node solves than 4^N = 1024
    assert info["nodes"] < 4 ** N / 2

    # the returned trajectory actually satisfies every l-inf keep-out
    U = np.asarray(traj.u)[:, :N].T.reshape(-1)
    ok, _ = _linf_ok(U, P0, V0, P, N, OBS, S, MASK)
    assert ok


def test_bb_infeasible_start():
    """Knot 0 inside the keep-out box -> reference raises; we flag."""
    traj, info = miqp.solve_bb_exact(np.array([0.1, 0.1]), V0, PF, VF,
                                     OBS, S, MASK, P, N)
    assert not bool(traj.success)
    assert info["status"] == "infeasible_x0"


def test_incumbent_optimality_gap():
    """solve-then-fix must produce an MIQP-feasible incumbent whose
    effort objective is within a bounded factor of the exact optimum."""
    _, info = miqp.solve_bb_exact(P0, V0, PF, VF, OBS, S, MASK, P, N)
    f_exact = info["objective"]

    obs_pad = jnp.zeros((4, 2), jnp.float64).at[0].set(jnp.asarray(OBS[0]))
    r_pad = jnp.zeros((4,), jnp.float64).at[0].set(float(S[0]))
    m_pad = jnp.zeros((4,), bool).at[0].set(True)
    traj = intercepting_with_obs_avoidance_bb(
        jnp.asarray(P0), jnp.asarray(V0), jnp.asarray(PF),
        jnp.asarray(VF), obs_pad, r_pad, m_pad, P, N)
    assert bool(traj.success)
    U = np.asarray(traj.u)[:, :N].T.reshape(-1)
    ok, _ = _linf_ok(U, P0, V0, P, N, OBS, S, MASK, tol=1e-2)
    assert ok, "incumbent must be MIQP-feasible"
    f_inc = float(U @ U)
    # incumbent cannot beat the exact optimum (sanity on both solvers)
    assert f_inc >= f_exact - 1e-2 * (1 + f_exact)
    # measured gap bound: document how sub-optimal solve-then-fix may be
    assert f_inc <= 1.5 * f_exact + 1e-6, (f_inc, f_exact)
