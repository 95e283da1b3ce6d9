"""Fuzz the ADMM QP solver against a trusted CPU reference.

The reference controllers delegate every convex subproblem to Drake's
OSQP/SNOPT (/root/reference/py/src/CBF.py:84, LinearOptimizer.py:31);
``robogame_tpu.ops.qp.solve_qp`` is our load-bearing replacement, so its
accuracy envelope needs direct evidence, not just the 2-variable smoke
tests.  Three layers of assertions:

1. **Objective parity vs a trusted solver** (scipy SLSQP, f64, tight tol)
   over random strictly-convex QPs: inequality-only, equality-heavy,
   one-sided (linearized keep-out style), and heterogeneous-row-norm
   instances.
2. **KKT residuals** recomputed from scratch on the returned primal point
   (stationarity via the solver's own dual residual; feasibility directly).
3. **Flag honesty**: whenever ``converged=True`` the solution must actually
   be accurate (no false positives at the production thresholds
   prim < tol*scale, dual < 10*tol*scale -- this fuzz is the justification
   for those thresholds).

An ill-conditioning sweep (cond(H) up to 1e6) documents where the fixed
iteration budget starts to lose the dual residual.
"""

import numpy as np
import pytest
import scipy.optimize

from robogame_tpu.ops.qp import solve_qp

RNG = np.random.default_rng(0)
BIG = 1e20  # stands in for +/- inf bounds (solver uses clip, inf-safe too)


def _make_qp(rng, n, m, n_eq=0, cond=10.0, one_sided=0, row_scale=False):
    """Random strictly convex QP  min .5 x'Hx + g'x  s.t. l <= Ax <= u
    with a guaranteed strictly feasible interior point."""
    # H with prescribed condition number via random orthogonal basis
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.geomspace(1.0, cond, n)
    H = (Q * eigs) @ Q.T
    H = 0.5 * (H + H.T)
    g = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    if row_scale:
        A *= np.power(10.0, rng.uniform(-2, 2, size=(m, 1)))
    x_feas = rng.normal(size=n) * 0.5
    Ax = A @ x_feas
    lo = Ax - rng.uniform(0.1, 2.0, size=m)
    hi = Ax + rng.uniform(0.1, 2.0, size=m)
    for i in range(n_eq):
        lo[i] = hi[i] = Ax[i] + rng.uniform(-0.05, 0.05)
    for i in range(n_eq, n_eq + one_sided):
        lo[i] = -BIG
    return H, g, A, lo, hi


def _solve_ref(H, g, A, lo, hi):
    """Trusted reference: scipy SLSQP on the same QP (f64, tight tol)."""
    cons = []
    eq = lo == hi
    if eq.any():
        cons.append(dict(type="eq",
                         fun=lambda x, A=A[eq], b=lo[eq]: A @ x - b,
                         jac=lambda x, A=A[eq]: A))
    ineq = ~eq
    Ai, li, ui = A[ineq], lo[ineq], hi[ineq]
    lo_act = li > -BIG / 2
    if lo_act.any():
        cons.append(dict(type="ineq",
                         fun=lambda x, A=Ai[lo_act], b=li[lo_act]: A @ x - b,
                         jac=lambda x, A=Ai[lo_act]: A))
    cons.append(dict(type="ineq",
                     fun=lambda x, A=Ai, b=ui: b - A @ x,
                     jac=lambda x, A=Ai: -A))
    res = scipy.optimize.minimize(
        lambda x: 0.5 * x @ H @ x + g @ x, np.zeros_like(g),
        jac=lambda x: H @ x + g, method="SLSQP", constraints=cons,
        options=dict(maxiter=400, ftol=1e-12))
    return res.x


def _obj(H, g, x):
    return 0.5 * x @ H @ x + g @ x


def _feas_viol(A, lo, hi, x):
    Ax = A @ x
    return max(np.max(np.maximum(lo - Ax, 0.0)),
               np.max(np.maximum(Ax - hi, 0.0)))


def _run_case(H, g, A, lo, hi, iters=150):
    sol = solve_qp(H.astype(np.float64), g.astype(np.float64),
                   A.astype(np.float64), lo.astype(np.float64),
                   hi.astype(np.float64), iters=iters, scale_rows=True)
    return (np.asarray(sol.x), bool(sol.converged),
            float(sol.prim_res), float(sol.dual_res))


CASES = (
    # (n, m, n_eq, cond, one_sided, row_scale)  x n_seeds each
    (6, 10, 0, 10.0, 0, False),       # generic inequality QP
    (8, 16, 6, 10.0, 0, False),       # equality-heavy (condensed dynamics)
    (12, 20, 0, 100.0, 8, False),     # one-sided keep-out style rows
    (10, 14, 4, 100.0, 4, True),      # heterogeneous row norms
    (16, 24, 8, 1000.0, 0, False),    # larger, moderately ill-conditioned
)


@pytest.mark.parametrize("spec", CASES, ids=[f"n{c[0]}m{c[1]}eq{c[2]}"
                                             f"c{int(c[3])}" for c in CASES])
def test_fuzz_vs_scipy(spec):
    n, m, n_eq, cond, one_sided, row_scale = spec
    rng = np.random.default_rng(hash(spec) % 2**31)
    n_conv = 0
    for trial in range(8):
        H, g, A, lo, hi = _make_qp(rng, n, m, n_eq, cond, one_sided,
                                   row_scale)
        x, conv, prim, dual = _run_case(H, g, A, lo, hi)
        x_ref = _solve_ref(H, g, A, lo, hi)
        f, f_ref = _obj(H, g, x), _obj(H, g, x_ref)
        scale = 1.0 + abs(f_ref)
        viol = _feas_viol(A, lo, hi, x)
        if conv:
            n_conv += 1
            # flag honesty: converged => accurate (no false positives)
            assert viol < 2e-3, (spec, trial, viol)
            assert f < f_ref + 1e-2 * scale, (spec, trial, f, f_ref)
            # near-optimality both ways (ref can itself be slightly off)
            assert abs(f - f_ref) < 2e-2 * scale, (spec, trial, f, f_ref)
    # envelope: the production iteration budget must actually converge
    # on the large majority of random instances of each family
    assert n_conv >= 6, (spec, n_conv)


def test_equality_rows_tight():
    """Equality rows (the condensed-dynamics constraints) must be satisfied
    to much tighter tolerance than generic rows -- the 1000x rho boost."""
    rng = np.random.default_rng(3)
    for _ in range(5):
        H, g, A, lo, hi = _make_qp(rng, 8, 12, n_eq=6, cond=50.0)
        x, conv, _, _ = _run_case(H, g, A, lo, hi)
        assert conv
        eq_res = np.max(np.abs(A[:6] @ x - lo[:6]))
        assert eq_res < 1e-5, eq_res


def test_kkt_residuals_unconstrained_active():
    """When no constraint is active, the ADMM must return the Newton
    solution x = -H^{-1} g to near machine precision."""
    rng = np.random.default_rng(4)
    for _ in range(5):
        n = 10
        Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        H = (Q * np.geomspace(1, 100, n)) @ Q.T
        H = 0.5 * (H + H.T)
        g = rng.normal(size=n) * 0.01
        x_star = -np.linalg.solve(H, g)
        # loose box that never activates
        A = np.eye(n)
        lo = x_star - 5.0
        hi = x_star + 5.0
        x, conv, prim, dual = _run_case(H, g, A, lo, hi)
        assert conv
        np.testing.assert_allclose(x, x_star, atol=1e-6)


def test_ill_conditioning_envelope():
    """Document the conditioning envelope: at the production iteration
    budget the solver must stay accurate up to cond(H)=1e4 and must not
    raise false convergence flags beyond it."""
    rng = np.random.default_rng(5)
    for cond in (1e1, 1e2, 1e3, 1e4):
        ok = 0
        for _ in range(4):
            H, g, A, lo, hi = _make_qp(rng, 8, 12, n_eq=2, cond=cond)
            x, conv, _, _ = _run_case(H, g, A, lo, hi)
            x_ref = _solve_ref(H, g, A, lo, hi)
            f, f_ref = _obj(H, g, x), _obj(H, g, x_ref)
            good = (abs(f - f_ref) < 2e-2 * (1 + abs(f_ref))
                    and _feas_viol(A, lo, hi, x) < 2e-3)
            if conv:
                assert good, (cond, f, f_ref)  # no false positives
                ok += 1
        assert ok >= 2, (cond, ok)
    # beyond the envelope: flags may drop but must stay honest
    for _ in range(4):
        H, g, A, lo, hi = _make_qp(rng, 8, 12, n_eq=2, cond=1e6)
        x, conv, _, _ = _run_case(H, g, A, lo, hi)
        if conv:
            x_ref = _solve_ref(H, g, A, lo, hi)
            f, f_ref = _obj(H, g, x), _obj(H, g, x_ref)
            assert abs(f - f_ref) < 5e-2 * (1 + abs(f_ref)), (f, f_ref)
            assert _feas_viol(A, lo, hi, x) < 5e-3
