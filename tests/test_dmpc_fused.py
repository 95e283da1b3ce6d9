"""Fused SQP DMPC kernel (ops.sqp_pallas.solve_dmpc_sqp_lanes) vs the
multi-launch dense-lanes path it replaces.

Mirrors tests/test_sqp_pallas.py for the single-agent shape: SQP
iteration 1 of the fused kernel is the SAME algorithm as one
``solve_qp_lanes(scale_rows=True)`` launch (cold ADMM start, same rho
schedule, same scaling -- the input-box rows are implicit in-kernel but
have unit norm, so scaling is unchanged), so with ``sqp_iters=1`` the
two controller paths must agree to f32 round-off.  Later iterations
warm-start ADMM across the SQP relinearizations (a deliberate semantic
improvement); for those we assert fixed-point consistency, not
per-iterate equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogame_tpu.config import MpcParams, SimParams
from robogame_tpu.control.dmpc import (compute_control_batch,
                                       initial_dmpc_state)

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _instances(Bq, seed, mpc):
    rng = np.random.default_rng(seed)
    st = jax.tree.map(lambda a: jnp.stack([a] * Bq),
                      initial_dmpc_state(mpc))
    x0 = jnp.asarray(rng.normal(size=(Bq, 4)), jnp.float32)
    x_des = jnp.asarray(rng.normal(size=(Bq, 4)) * 2, jnp.float32)
    obs = jnp.asarray(rng.uniform(-2.0, 2.0, size=(Bq, 3, 2)),
                      jnp.float32)
    return st, x0, x_des, obs


def test_fused_single_sqp_matches_lanes():
    """sqp_iters=1: fused == one solve_qp_lanes launch (the only
    difference is in-kernel row assembly order -> f32 round-off)."""
    mpc = MpcParams(N=8, sqp_iters=1, qp_iters=40, t_grid=2, t_local=0)
    params = SimParams()
    args = _instances(3, 0, mpc)
    stl, ul = compute_control_batch(*args, params, mpc, use_lanes=True)
    stf, uf = compute_control_batch(*args, params, mpc,
                                    use_lanes="fused")
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ul),
                               atol=2e-3, rtol=1e-2)
    assert np.array_equal(np.asarray(stl.valid), np.asarray(stf.valid))
    np.testing.assert_allclose(np.asarray(stf.h), np.asarray(stl.h))


def test_fused_warm_sqp_no_worse_than_lanes():
    """At generous iteration budgets the fused warm-started SQP achieves
    an objective no worse than the cold multi-launch path (the keepouts
    are nonconvex, so per-control equality is not asserted)."""
    import robogame_tpu.control.dmpc as dm

    params = SimParams()
    mpc = MpcParams(N=8, sqp_iters=3, qp_iters=150, warm_qp_iters=80,
                    t_grid=2, t_local=0)
    args = _instances(3, 1, mpc)
    st, x0, xd, obs = args
    stl, _ = compute_control_batch(*args, params, mpc, use_lanes=True)
    stf, _ = compute_control_batch(*args, params, mpc,
                                   use_lanes="fused")
    assert np.array_equal(np.asarray(stl.valid), np.asarray(stf.valid))
    np.testing.assert_allclose(np.asarray(stf.h), np.asarray(stl.h),
                               rtol=1e-5)

    def winner_cost(state):
        costs = []
        for b in range(x0.shape[0]):
            prep = dm._prepare(state.h[b], x0[b], xd[b], obs[b], params,
                               mpc)
            _, c = dm._finish(state.U[b], prep, params, mpc)
            costs.append(float(c))
        return np.asarray(costs)

    cl = winner_cost(stl)
    cf = winner_cost(stf)
    valid = np.asarray(stl.valid)
    assert np.all(cf[valid] <= cl[valid] * 1.1 + 0.5), (cf, cl)


def test_fused_warm_start_from_state():
    """Second control step (valid warm state, local candidate grid,
    U0 != 0 linearization point) stays consistent."""
    params = SimParams()
    mpc = MpcParams(N=8, sqp_iters=3, qp_iters=150, warm_qp_iters=80,
                    t_grid=4, t_local=2)
    st, x0, xd, obs = _instances(2, 2, mpc)
    stf, _ = compute_control_batch(st, x0, xd, obs, params, mpc,
                                   use_lanes="fused")
    st2, v = compute_control_batch(stf, x0, xd, obs, params, mpc,
                                   use_lanes="fused")
    assert bool(jnp.all(jnp.isfinite(v)))
    assert float(jnp.max(jnp.abs(v))) <= params.input_limit + 1e-4
    assert np.all(np.asarray(st2.valid) | ~np.asarray(stf.valid))


def test_prepare_fused_matches_generic():
    """The closed-form ``_prepare_fused`` equals the condense-based
    ``_prepare`` on every field the fused path and ``_finish`` consume,
    across the candidate-h range."""
    import robogame_tpu.control.dmpc as dm

    params = SimParams()
    mpc = MpcParams(N=20)
    rng = np.random.default_rng(3)
    for h in [0.0025, 0.05, 0.25]:
        x0 = jnp.asarray(rng.normal(size=4), jnp.float32)
        xd = jnp.asarray(rng.normal(size=4) * 2, jnp.float32)
        obs = jnp.asarray(rng.uniform(-2, 2, size=(3, 2)), jnp.float32)
        a = dm._prepare(jnp.float32(h), x0, xd, obs, params, mpc)
        b = dm._prepare_fused(jnp.float32(h), x0, xd, obs, params, mpc)
        for f in ("H", "g", "lo_fix", "hi_fix", "sg", "p0p", "gN",
                  "phiN_x0"):
            np.testing.assert_allclose(
                np.asarray(getattr(b, f)), np.asarray(getattr(a, f)),
                atol=2e-5, rtol=2e-5, err_msg=f"{f} at h={h}")


def test_fused_auto_select_fits():
    """The production DMPC shape (N=20, 3 neighbors) fits the fused
    kernel's VMEM accounting, so auto-select routes to it on TPU."""
    from robogame_tpu.ops.sqp_pallas import fits_vmem_dmpc_fused
    assert fits_vmem_dmpc_fused(40, 20, 3)
    assert not fits_vmem_dmpc_fused(320, 160, 3)   # 8x horizon: too big
