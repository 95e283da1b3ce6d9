"""Lanes-batched ADMM QP solver as a fused Pallas TPU kernel.

Motivation (measured, see BASELINE.md "batched small linear algebra"):
XLA-TPU executes batched *small* matrix ops -- the (B, 40, 40) Cholesky,
triangular solves, and (B, m, n) normal-matrix products at the heart of
``ops.qp.solve_qp`` -- at ~10 GFLOP/s: every batch element becomes its
own MXU dispatch padded to 128x128 (>90% waste), and every formulation
re-reads the batched operands from HBM.  Since the per-problem
dimensions (n <= ~64 variables, m <= ~192 rows) never fill an MXU tile,
the TPU-native layout is the opposite one: **batch in the 128 vector
lanes, matrix dimensions in sublanes**.  Each (rows, 128-lane) slab op
then advances 128 independent problems at once on the VPU, and the
whole solve (normal matrix, Cholesky, triangular inversion, and all
ADMM iterations) runs inside one kernel with every operand resident in
VMEM -- A is read from HBM exactly once per solve.

Algorithm: identical to ``ops.qp.solve_qp`` (OSQP-style ADMM with
over-relaxation, equality rows at 1e3 rho, adaptive rho across
``n_seg`` segments, relative-residual convergence flags) so the two are
interchangeable; ``tests/test_qp_pallas.py`` pins them against each
other.  The reference this replaces solves such QPs one at a time
through pydrake/OSQP (/root/reference/py/src/CBF.py:81-94,
DMPC.py:16-54).

Slab conventions inside the kernel (lanes = problems):
  A, Atil       column-major: column i at rows i*m:(i+1)*m
  K (-> L), Kinv column-major: column j at rows j*n:(j+1)*n
  C = L^{-1}    row-major: row i at rows i*n:(i+1)*n
All inner loops are Python-unrolled slab ops of O(n^2) count; the ADMM
iterations and rho segments use lax control flow so the traced body
stays O(n^2) statements total.

Scope: per-problem data must fit VMEM (A twice + 3 n*n slabs + small
vectors per 128-lane tile).  Production DMPC (n=40, m=140), CBF (n=8),
and the skill QPs fit easily; the joint CMPC (n=80, m>=300: ~30 MB)
exceeds VMEM per tile and stays on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qp import QpSolution

TILE = 128


def _rup(x: int, q: int) -> int:
    return (x + q - 1) // q * q


def fits_vmem(n: int, m: int, budget_bytes: int = 12 * 2 ** 20) -> bool:
    """Whether a (n vars, m rows) problem's per-tile working set fits the
    ~16 MB VMEM (with headroom for I/O buffers and the compiler): the
    kernel holds A + rho-scaled A (2 * n * m_pad rows) and K, C, Kinv
    (3 * n * n rows), all (rows, 128) f32 slabs.  The production joint
    CMPC (n=80, m=340: ~38 MB) does NOT fit and must use the XLA path;
    DMPC (n=40, m=140: ~8 MB) and CBF (n=8) do."""
    m_pad = _rup(m, 8)
    rows = 2 * n * m_pad + 3 * n * n + 4 * (m_pad + _rup(n, 8))
    return rows * TILE * 4 <= budget_bytes


def _make_kernel(n: int, m: int, n_seg: int, seg_iters: int,
                 sigma: float, alpha: float, tol: float):
    n_pad = _rup(n, 8)
    m_pad = _rup(m, 8)

    def kernel(H_ref, g_ref, A_ref, l_ref, u_ref, x_ref, out_ref,
               K_s, C_s, Kinv_s, At_s):
        l_all = l_ref[:]                        # (m_pad, TILE)
        u_all = u_ref[:]
        g_all = g_ref[:]                        # (n_pad, TILE)
        is_eq = (l_all == u_all)

        # rho0 = clip(trace(H)/n, 1e-3, 1e6)  (qp.py:82)
        tr = jnp.zeros((TILE,), jnp.float32)
        for i in range(n):
            tr = tr + H_ref[i * n + i, :]
        rho0 = jnp.clip(tr * (1.0 / n), 1e-3, 1e6)

        def acol(i):
            # columns are m_pad-strided (8-aligned sublane offsets); the
            # padded tail rows are zero, so reductions over the full slab
            # are exact
            return A_ref[i * m_pad:(i + 1) * m_pad, :]

        def matvec_A(xv):
            """A @ x  -- xv (n_pad, TILE) -> (m_pad, TILE)."""
            acc = acol(0) * xv[0, :][None, :]
            for i in range(1, n):
                acc = acc + acol(i) * xv[i, :][None, :]
            return acc

        def matvec_At(w):
            """A^T @ w -- w (m_pad, TILE) -> (n_pad, TILE)."""
            rows = [jnp.sum(acol(i) * w, axis=0) for i in range(n)]
            rows += [jnp.zeros((TILE,), jnp.float32)] * (n_pad - n)
            return jnp.stack(rows)

        def matvec_H(xv):
            """H @ x (H column-major, symmetric)."""
            rows = []
            for i in range(n):
                acc = jnp.zeros((TILE,), jnp.float32)
                for j in range(n):
                    acc = acc + H_ref[j * n + i, :] * xv[j, :]
                rows.append(acc)
            rows += [jnp.zeros((TILE,), jnp.float32)] * (n_pad - n)
            return jnp.stack(rows)

        def rho_rows(rho_s):
            return jnp.where(is_eq, 1e3 * rho_s[None, :],
                             rho_s[None, :])

        def segment(x, z, y, rho_s):
            rho_vec = rho_rows(rho_s)           # (m_pad, TILE)
            # Atil = diag(rho) A, column-wise
            for i in range(n):
                At_s[i * m_pad:(i + 1) * m_pad, :] = acol(i) * rho_vec
            # K = H + sigma I + A^T diag(rho) A, built column by column
            # (sigma added via a one-hot mask: Mosaic has no scatter-add)
            eye_cols = jnp.eye(n, dtype=jnp.float32)
            for j in range(n):
                atj = At_s[j * m_pad:(j + 1) * m_pad, :]
                col = [jnp.sum(acol(i) * atj, axis=0) for i in range(n)]
                colv = (jnp.stack(col) + H_ref[j * n:(j + 1) * n, :] +
                        sigma * eye_cols[j][:, None])
                K_s[j * n:(j + 1) * n, :] = colv
            # Cholesky in place: column j of L overwrites column j of K
            # (rows < j hold garbage; never read)
            for j in range(n):
                d = lax.rsqrt(K_s[j * n + j, :])
                K_s[j * n:(j + 1) * n, :] = K_s[j * n:(j + 1) * n, :] * \
                    d[None, :]
                lcol = K_s[j * n:(j + 1) * n, :]
                for k in range(j + 1, n):
                    K_s[k * n:(k + 1) * n, :] = (
                        K_s[k * n:(k + 1) * n, :] -
                        lcol * lcol[k, :][None, :])
            # C = L^{-1}, row-major, forward substitution:
            # C[i,:] = (e_i - sum_{k<i} L[i,k] C[k,:]) / L[i,i]
            eye_rows = jnp.eye(n, dtype=jnp.float32)
            for i in range(n):
                acc = jnp.zeros((n, TILE), jnp.float32)
                for k in range(i):
                    lik = K_s[k * n + i, :]     # L[i,k] (col-major)
                    acc = acc + C_s[k * n:(k + 1) * n, :] * lik[None, :]
                inv_dii = 1.0 / K_s[i * n + i, :]
                C_s[i * n:(i + 1) * n, :] = (
                    (eye_rows[i][:, None] - acc) * inv_dii[None, :])
            # Kinv = C^T C, column-major: col j = sum_k C_row_k * C[k,j]
            for j in range(n):
                acc = jnp.zeros((n, TILE), jnp.float32)
                for k in range(j, n):           # C[k,j] = 0 for k < j
                    ckj = C_s[k * n + j, :]
                    acc = acc + C_s[k * n:(k + 1) * n, :] * ckj[None, :]
                Kinv_s[j * n:(j + 1) * n, :] = acc

            def matvec_Kinv(rv):
                acc = Kinv_s[0:n, :] * rv[0, :][None, :]
                for j in range(1, n):
                    acc = acc + Kinv_s[j * n:(j + 1) * n, :] * \
                        rv[j, :][None, :]
                return jnp.concatenate(
                    [acc, jnp.zeros((n_pad - n, TILE), jnp.float32)],
                    axis=0) if n_pad > n else acc

            def admm_iter(_, c):
                x, z, y = c
                w = rho_vec * z - y
                rhs = sigma * x - g_all + matvec_At(w)
                x_new = matvec_Kinv(rhs)
                Ax = matvec_A(x_new)
                z_t = alpha * Ax + (1.0 - alpha) * z
                z_new = jnp.clip(z_t + y / rho_vec, l_all, u_all)
                y_new = y + rho_vec * (z_t - z_new)
                return (x_new, z_new, y_new)

            x, z, y = lax.fori_loop(0, seg_iters, admm_iter, (x, z, y))

            # residuals + adaptive rho (qp.py:108-116)
            Ax = matvec_A(x)
            prim = jnp.max(jnp.abs(Ax - z), axis=0)
            Hx = matvec_H(x)
            Aty = matvec_At(y)
            dual = jnp.max(jnp.abs(Hx + g_all + Aty), axis=0)
            p_sc = jnp.maximum(jnp.max(jnp.abs(Ax), axis=0),
                               jnp.max(jnp.abs(z), axis=0)) + 1e-9
            d_sc = jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(Hx), axis=0),
                            jnp.max(jnp.abs(Aty), axis=0)),
                jnp.max(jnp.abs(g_all), axis=0)) + 1e-9
            ratio = jnp.sqrt((prim / p_sc) / (dual / d_sc + 1e-12))
            rho_new = jnp.clip(rho_s * jnp.clip(ratio, 0.2, 5.0),
                               1e-6, 1e8)
            return x, z, y, rho_new, (prim, dual, p_sc, d_sc)

        x = jnp.zeros((n_pad, TILE), jnp.float32)
        z = jnp.zeros((m_pad, TILE), jnp.float32)
        y = jnp.zeros((m_pad, TILE), jnp.float32)
        rho_s = rho0
        res = None
        # segments unrolled: the body mutates scratch (K_s, C_s, Kinv_s),
        # which lax.scan carries cannot express
        for _ in range(n_seg):
            x, z, y, rho_s, res = segment(x, z, y, rho_s)
        prim, dual, p_sc, d_sc = res

        conv = (prim < tol * p_sc) & (dual < 10.0 * tol * d_sc)
        x_ref[:] = x
        zeros = jnp.zeros((TILE,), jnp.float32)
        out_ref[:] = jnp.stack([jnp.where(conv, 1.0, 0.0), prim, dual,
                                p_sc, d_sc, zeros, zeros, zeros])

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("iters", "n_seg", "scale_rows"))
def solve_qp_lanes(H, g, A, l, u, iters: int = 50, n_seg: int = 4,
                   rho: float = 1.0, sigma: float = 1e-6,
                   alpha: float = 1.6, tol: float = 1e-3,
                   scale_rows: bool = False) -> QpSolution:
    """Batched QP solve with batch in vector lanes.

    Same problem form and semantics as ``ops.qp.solve_qp`` but the batch
    axis is MANDATORY and leading: H (B, n, n), g (B, n), A (B, m, n),
    l/u (B, m).  B is padded to a multiple of 128 internally.
    """
    del rho  # rho0 is derived from trace(H) exactly as in solve_qp
    B, n = g.shape
    n_orig = n
    m = A.shape[1]
    dtype = jnp.float32
    H = H.astype(dtype)
    g = g.astype(dtype)
    A = A.astype(dtype)
    l = l.astype(dtype)
    u = u.astype(dtype)
    if scale_rows:
        rn = jnp.linalg.norm(A, axis=-1)
        d = 1.0 / jnp.maximum(rn, 1e-8)
        A = A * d[:, :, None]
        l = l * d
        u = u * d

    seg_iters = max(1, iters // n_seg)
    n_pad = _rup(n, 8)
    m_pad = _rup(m, 8)
    Bp = _rup(B, TILE)

    def plane(a, rows, pad_rows=0, pad_val=0.0):
        a2 = a.reshape(B, rows)
        a2 = jnp.pad(a2, ((0, Bp - B), (0, 0)))
        p = a2.T
        if pad_rows:
            p = jnp.pad(p, ((0, pad_rows), (0, 0)),
                        constant_values=pad_val)
        return p

    if n % 8 != 0:
        # pad the variable space to 8-aligned width with decoupled dummy
        # variables (block-diag H, zero g, zero A columns): their
        # solution is exactly 0 and they never touch the real problem's
        # residuals, so results are identical after slicing.  The dummy
        # diagonal equals the mean diagonal so rho0 = trace(H)/n is
        # preserved exactly (matching ops.qp.solve_qp's heuristic).
        n2 = _rup(n, 8)
        tr = jnp.trace(H, axis1=1, axis2=2) / n              # (B,)
        pad_rows = jnp.zeros((n2,), dtype).at[n:].set(1.0)
        H2 = (jnp.zeros((B, n2, n2), dtype).at[:, :n, :n].set(H) +
              tr[:, None, None] *
              (jnp.eye(n2, dtype=dtype) * pad_rows[:, None])[None])
        g = jnp.pad(g, ((0, 0), (0, n2 - n)))
        A = jnp.pad(A, ((0, 0), (0, 0), (0, n2 - n)))
        H, n = H2, n2
        n_pad = n
    # H column-major == row-major (symmetric); A column-major with each
    # column zero-padded to m_pad rows (8-aligned sublane offsets)
    H_p = plane(jnp.swapaxes(H, 1, 2), n * n)
    g_p = plane(g, n, n_pad - n)
    A_cm = jnp.swapaxes(A, 1, 2)                      # (B, n, m)
    A_cm = jnp.pad(A_cm, ((0, 0), (0, 0), (0, m_pad - m)))
    A_p = plane(A_cm, n * m_pad)
    l_p = plane(l, m, m_pad - m, -3.0e38)
    u_p = plane(u, m, m_pad - m, 3.0e38)

    kernel = _make_kernel(n, m, n_seg, seg_iters, float(sigma),
                          float(alpha), float(tol))
    lane = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    x_p, out_p = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[lane(n * n), lane(n_pad), lane(n * m_pad),
                  lane(m_pad), lane(m_pad)],
        out_specs=(lane(n_pad), lane(8)),
        out_shape=(jax.ShapeDtypeStruct((n_pad, Bp), dtype),
                   jax.ShapeDtypeStruct((8, Bp), dtype)),
        scratch_shapes=[pltpu.VMEM((n * n, TILE), dtype),
                        pltpu.VMEM((n * n, TILE), dtype),
                        pltpu.VMEM((n * n, TILE), dtype),
                        pltpu.VMEM((n * m_pad, TILE), dtype)],
        interpret=(jax.default_backend() == "cpu"),
    )(H_p, g_p, A_p, l_p, u_p)

    x = x_p[0:n_orig, 0:B].T
    return QpSolution(x=x, converged=out_p[0, 0:B] > 0.5,
                      prim_res=out_p[1, 0:B], dual_res=out_p[2, 0:B])
