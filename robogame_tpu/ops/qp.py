"""Batched convex QP solver (OSQP-style ADMM, fixed iteration count).

Replaces Drake's ``MathematicalProgram`` + OSQP/SNOPT for every convex
subproblem in the reference controller stack (CBF filter QP,
``intercepting_traj`` effort-QP, the SQP inner problems of the MPC
controllers).  TPU-first design decisions:

* fixed iteration count, no data-dependent control flow -> one fused XLA
  program, trivially ``vmap``-able over thousands of problem instances;
* one dense Cholesky factorization of ``H + sigma I + rho AᵀA`` per problem
  (problems here are <= ~128 variables, a single MXU tile);
* convergence reported as residual-based flags, mirroring the reference's
  fallback-on-failure semantics (/root/reference/py/src/CBF.py:92-94).

Problem form:   min ½ xᵀHx + gᵀx   s.t.  l <= Ax <= u
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def f32_matmul(fn):
    """Trace the wrapped (possibly jitted) function under full-f32 matmul
    precision -- TPU's default bf16 accumulation is too coarse for the
    condensed-QP linear algebra (power tables, normal matrices)."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped


class QpSolution(NamedTuple):
    x: jax.Array           # (n,) primal solution
    converged: jax.Array   # () bool
    prim_res: jax.Array    # () final primal residual (inf-norm)
    dual_res: jax.Array    # () final dual residual (inf-norm)


@functools.partial(jax.jit, static_argnames=("iters", "scale_rows"))
def solve_qp(H, g, A, l, u, iters: int = 50, rho: float = 1.0,
             sigma: float = 1e-6, alpha: float = 1.6,
             tol: float = 1e-3, scale_rows: bool = False) -> QpSolution:
    """ADMM with over-relaxation.  All arguments may carry leading batch
    dims via ``vmap``; shapes: H (n,n), g (n,), A (m,n), l/u (m,).

    Equality rows (l == u) get a 1000x larger rho, following OSQP's
    heuristic, which sharply improves their satisfaction at fixed
    iteration counts.  ``scale_rows`` applies OSQP-style row
    equilibration (unit-norm constraint rows) -- essential when row norms
    are heterogeneous, as in the linearized keep-out SQPs."""
    # TPU f32 matmuls default to bf16 accumulation; the ADMM needs full
    # f32 or its residual tests report spurious non-convergence
    with jax.default_matmul_precision("float32"):
        return _solve_qp_inner(H, g, A, l, u, iters, rho, sigma, alpha,
                               tol, scale_rows)


def _solve_qp_inner(H, g, A, l, u, iters, rho, sigma, alpha, tol,
                    scale_rows):
    n = H.shape[-1]
    dtype = H.dtype
    if scale_rows:
        rn = jnp.linalg.norm(A, axis=-1)
        d = 1.0 / jnp.maximum(rn, 1e-8)
        A = A * d[:, None]
        l = l * d
        u = u * d
    is_eq = (l == u)
    sigma = jnp.asarray(sigma, dtype)
    alpha = jnp.asarray(alpha, dtype)
    eyeN = jnp.eye(n, dtype=dtype)

    # initial rho scaled to the cost curvature (OSQP heuristic flavor):
    # a rho far from the Hessian scale stalls either residual
    rho0 = jnp.clip(jnp.trace(H) / n, 1e-3, 1e6) * rho

    def run_segment(carry, _):
        x, z, y, rho_s = carry
        rho_vec = jnp.where(is_eq, 1e3 * rho_s, rho_s).astype(dtype)
        K = H + sigma * eyeN + (A.T * rho_vec[None, :]) @ A
        chol = jnp.linalg.cholesky(K)
        # Invert K once per segment (two triangular solves with an n-column
        # RHS) so the iteration body is a single MXU matvec: per-iteration
        # triangular solves are substitution-serial on TPU and dominated
        # the batched-MPC profile.
        t = jax.scipy.linalg.solve_triangular(chol, eyeN, lower=True)
        Kinv = jax.scipy.linalg.solve_triangular(chol.T, t, lower=False)

        def body(c, _):
            x, z, y = c
            rhs = sigma * x - g + A.T @ (rho_vec * z - y)
            x_new = Kinv @ rhs
            Ax = A @ x_new
            z_tilde = alpha * Ax + (1 - alpha) * z
            z_new = jnp.clip(z_tilde + y / rho_vec, l, u)
            y_new = y + rho_vec * (z_tilde - z_new)
            return (x_new, z_new, y_new), None

        (x, z, y), _ = lax.scan(body, (x, z, y), None, length=seg_iters)
        # adaptive rho update (OSQP §5.2): balance the residual ratio
        Ax = A @ x
        prim = jnp.max(jnp.abs(Ax - z))
        dual = jnp.max(jnp.abs(H @ x + g + A.T @ y))
        p_sc = jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))) + 1e-9
        d_sc = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(H @ x)),
                                       jnp.max(jnp.abs(A.T @ y))),
                           jnp.max(jnp.abs(g))) + 1e-9
        ratio = jnp.sqrt((prim / p_sc) / (dual / d_sc + 1e-12))
        rho_new = jnp.clip(rho_s * jnp.clip(ratio, 0.2, 5.0), 1e-6, 1e8)
        return (x, z, y, rho_new), (prim, dual, p_sc, d_sc)

    x0 = jnp.zeros((n,), dtype)
    z0 = jnp.zeros(A.shape[:-1], dtype)
    y0 = jnp.zeros_like(z0)
    n_seg = 4
    seg_iters = max(1, iters // n_seg)
    # scan (not an unrolled loop) over the rho segments: the segment body
    # holds the factorization + inversion + inner scan, and inlining it
    # n_seg times quadruples the solver portion of every embedding program
    # (the closed-loop MPC scans are already compile-time-bound)
    carry, res = lax.scan(run_segment, (x0, z0, y0, rho0), None,
                          length=n_seg)
    x, z, y, _ = carry
    prim, dual, p_sc, d_sc = jax.tree.map(lambda r: r[-1], res)

    # Threshold justification (tests/test_qp_fuzz.py): across random,
    # equality-heavy, one-sided, row-heterogeneous and cond(H)<=1e6 QPs,
    # conv=True at these relative thresholds implies objective within
    # 2e-2*(1+|f*|) of a trusted solver and feasibility violation <2e-3
    # (zero false positives observed); equality rows are satisfied <1e-5.
    conv = (prim < tol * p_sc) & (dual < 10.0 * tol * d_sc)
    return QpSolution(x=x, converged=conv, prim_res=prim, dual_res=dual)


def solve_qp_batch(H, g, A, l, u, iters: int = 50, **kw) -> QpSolution:
    """vmap over a leading batch axis of every argument."""
    return jax.vmap(lambda *a: solve_qp(*a, iters=iters, **kw))(H, g, A, l,
                                                                u)


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_box_ls(F, b, lo, hi, iters: int = 40, reg: float = 1e-8):
    """Box-constrained least squares  min ||F x - b||²  s.t. lo <= x <= hi
    via projected gradient with optimal fixed step (1/L, L = ||FᵀF||).
    Used for condensed trajectory problems where the only constraints are
    input boxes."""
    n = F.shape[-1]
    H = F.T @ F + reg * jnp.eye(n, dtype=F.dtype)
    g = -(F.T @ b)
    L = jnp.linalg.norm(H, ord=2)  # spectral norm; shapes are tiny
    step = 1.0 / L

    x0 = jnp.clip(jnp.zeros((n,), F.dtype), lo, hi)

    def body(x, _):
        grad = H @ x + g
        x = jnp.clip(x - step * grad, lo, hi)
        return x, None

    x, _ = lax.scan(body, x0, None, length=iters)
    return x
