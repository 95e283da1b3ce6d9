"""Fused SQP CMPC kernel (ops.sqp_pallas.solve_cmpc_sqp_lanes) vs the
multi-launch joint-kernel path it replaces.

SQP iteration 1 of the fused kernel is the SAME algorithm as one
``solve_qp_lanes_joint(scale_rows=True)`` launch (cold ADMM start, same
rho schedule, same scaling), so with ``sqp_iters=1`` the two controller
paths must agree to f32 round-off.  Later iterations warm-start ADMM
across the SQP relinearizations, which is a deliberate semantic
improvement (fewer iterations to convergence); for those we assert
agreement of the converged fixed point at generous iteration budgets,
not per-iterate equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogame_tpu.config import MpcParams, SimParams
from robogame_tpu.control.cmpc import (compute_control_batch,
                                       initial_cmpc_state)

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _instances(Bq, seed, mpc):
    rng = np.random.default_rng(seed)
    st = jax.tree.map(lambda a: jnp.stack([a] * Bq),
                      initial_cmpc_state(mpc))
    x0_p1 = jnp.asarray(rng.normal(size=(Bq, 4)), jnp.float32)
    x0_p2 = jnp.asarray(rng.normal(size=(Bq, 4)) + 1.0, jnp.float32)
    xf_p1 = jnp.asarray(rng.normal(size=(Bq, 4)) * 2, jnp.float32)
    xf_p2 = jnp.asarray(rng.normal(size=(Bq, 4)) * 2, jnp.float32)
    obs = jnp.asarray(rng.uniform(-2.0, 2.0, size=(Bq, 2, 2)),
                      jnp.float32)
    return st, x0_p1, x0_p2, xf_p1, xf_p2, obs


def test_fused_single_sqp_matches_joint():
    """sqp_iters=1: fused == one solve_qp_lanes_joint launch (the only
    difference is in-kernel row assembly order -> f32 round-off)."""
    mpc = MpcParams(N=8, sqp_iters=1, qp_iters=40, t_grid=2, t_local=0)
    params = SimParams()
    args = _instances(3, 0, mpc)
    stj, u1j, u2j = compute_control_batch(*args, params, mpc,
                                          use_lanes="joint")
    stf, u1f, u2f = compute_control_batch(*args, params, mpc,
                                          use_lanes="fused")
    np.testing.assert_allclose(np.asarray(u1f), np.asarray(u1j),
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(u2f), np.asarray(u2j),
                               atol=2e-3, rtol=1e-2)
    assert np.array_equal(np.asarray(stj.valid), np.asarray(stf.valid))
    np.testing.assert_allclose(np.asarray(stf.h), np.asarray(stj.h))


def test_fused_warm_sqp_no_worse_than_joint():
    """At generous iteration budgets the fused warm-started SQP achieves
    an objective (terminal cost + N h at the winning candidate) no worse
    than the cold multi-launch path.  Per-control equality is NOT
    asserted: the keepouts are nonconvex, so a lane can legitimately
    settle on the mirror-image avoidance branch."""
    import robogame_tpu.control.cmpc as cm

    params = SimParams()
    mpc = MpcParams(N=8, sqp_iters=3, qp_iters=150, warm_qp_iters=80,
                    t_grid=2, t_local=0)
    args = _instances(3, 1, mpc)
    st, x1, x2, f1, f2, obs = args
    stj, _, _ = compute_control_batch(*args, params, mpc,
                                      use_lanes="joint")
    stf, _, _ = compute_control_batch(*args, params, mpc,
                                      use_lanes="fused")
    assert np.array_equal(np.asarray(stj.valid), np.asarray(stf.valid))
    np.testing.assert_allclose(np.asarray(stf.h), np.asarray(stj.h),
                               rtol=1e-5)

    def winner_cost(state):
        x0 = jnp.concatenate([x1, x2], axis=1)
        xd = jnp.concatenate([f1, f2], axis=1)
        costs = []
        for b in range(x0.shape[0]):
            prep = cm._prepare(state.h[b], x0[b], xd[b], obs[b], params,
                               mpc)
            _, c = cm._finish(state.U[b], prep, params, mpc)
            costs.append(float(c))
        return np.asarray(costs)

    cj = winner_cost(stj)
    cf = winner_cost(stf)
    valid = np.asarray(stj.valid)
    assert np.all(cf[valid] <= cj[valid] * 1.1 + 0.5), (cf, cj)


def test_fused_warm_start_from_state():
    """Second control step (valid warm state, local candidate grid,
    U0 != 0 linearization point) stays consistent with the joint path."""
    params = SimParams()
    mpc = MpcParams(N=8, sqp_iters=3, qp_iters=150, warm_qp_iters=80,
                    t_grid=4, t_local=2)
    st, x1, x2, f1, f2, obs = _instances(2, 2, mpc)
    stf, _, _ = compute_control_batch(st, x1, x2, f1, f2, obs, params,
                                      mpc, use_lanes="fused")
    st2, v1, v2 = compute_control_batch(stf, x1, x2, f1, f2, obs, params,
                                        mpc, use_lanes="fused")
    assert bool(jnp.all(jnp.isfinite(v1))) and bool(
        jnp.all(jnp.isfinite(v2)))
    lim = params.input_limit + 1e-4
    assert float(jnp.max(jnp.abs(v1))) <= lim
    assert float(jnp.max(jnp.abs(v2))) <= lim
    # a converged warm state must stay valid
    assert np.all(np.asarray(st2.valid) | ~np.asarray(stf.valid))


def test_cmpc_prepare_fused_matches_generic():
    """The closed-form per-player pieces (cmpc._prepare_fused) equal the
    permuted generic joint ``_prepare`` output on every field the fused
    kernel consumes."""
    import robogame_tpu.control.cmpc as cm

    params = SimParams()
    mpc = MpcParams(N=20)
    N = mpc.N
    nU = 4 * N
    n1 = 2 * N
    perm1 = (np.arange(N)[:, None] * 4 + np.array([0, 1])).reshape(-1)
    perm2 = perm1 + 2
    rng = np.random.default_rng(7)
    for h in [0.0025, 0.05, 0.2]:
        x0 = jnp.asarray(rng.normal(size=8), jnp.float32)
        xd = jnp.asarray(rng.normal(size=8) * 2, jnp.float32)
        obs = jnp.asarray(rng.uniform(-2, 2, size=(2, 2)), jnp.float32)
        a = cm._prepare(jnp.float32(h), x0, xd, obs, params, mpc)
        b = cm._prepare_fused(jnp.float32(h), x0, xd, obs, params, mpc)
        chk = lambda x, y, f: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-5, rtol=2e-5,
            err_msg=f"{f} at h={h}")
        chk(b.H1, a.H[perm1][:, perm1], "H1(p1)")
        chk(b.H1, a.H[perm2][:, perm2], "H1(p2)")
        chk(b.g, np.concatenate([np.asarray(a.g)[perm1],
                                 np.asarray(a.g)[perm2]]), "g")
        chk(b.sg1, np.asarray(a.sg1)[..., perm1], "sg1")
        chk(b.sg1, np.asarray(a.sg2)[..., perm2], "sg2")
        chk(b.p0[0], a.p0_1, "p0_1")
        chk(b.p0[1], a.p0_2, "p0_2")
        xy = lambda v: np.swapaxes(np.asarray(v).reshape(N, 2), 0,
                                   1).reshape(2 * N)
        chk(b.loa[0], xy(a.lo_fix[nU:nU + n1]), "loa1")
        chk(b.loa[1], xy(a.lo_fix[nU + n1:]), "loa2")
        chk(b.hia[0], xy(a.hi_fix[nU:nU + n1]), "hia1")
        chk(b.hia[1], xy(a.hi_fix[nU + n1:]), "hia2")
        chk(b.gN1, np.asarray(a.gN)[0:4][:, perm1][[0, 1, 2, 3]],
            "gN1(p1)")
        chk(b.phiN.reshape(-1), a.phiN_x0, "phiN")


def test_fused_auto_select_fits():
    """The production CMPC shape (N=20) fits the fused kernel's VMEM
    accounting, so auto-select routes to it on TPU."""
    from robogame_tpu.ops.sqp_pallas import fits_vmem_cmpc_fused
    assert fits_vmem_cmpc_fused(40, 20, 2)
    assert not fits_vmem_cmpc_fused(160, 80, 2)   # 4x horizon: too big
