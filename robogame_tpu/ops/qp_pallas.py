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
and the skill QPs fit easily; the joint CMPC (n=80, m>=300: ~45 MB)
exceeds the dense kernel's budget and uses the STRUCTURED two-agent
kernel below (``solve_qp_lanes_joint``: per-player column blocks,
implicit variable-box rows, single-buffered HBM->VMEM operand copies,
block-Schur factorization -- ~9 MB/tile).
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
    ~16 MB VMEM (with headroom for the compiler).  Accounting (ADVICE r2:
    the H input slab and Pallas's double-buffered I/O blocks are
    included, not just the scratch slabs):

    * double-buffered inputs: H (n*n) + A (n*m_pad) + g/l/u/x vectors
    * scratch: K, C, Kinv (3 * n*n) + Atil (n*m_pad)
    * double-buffered outputs: x (n_pad) + stats (8)

    The production joint CMPC (n=80, m=340: ~45 MB by this count) does
    NOT fit and uses the split kernel (``solve_qp_lanes_joint``); DMPC
    (n=40, m=140: ~10 MB) and CBF (n=8) fit."""
    m_pad = _rup(m, 8)
    n_pad = _rup(n, 8)
    in_rows = n * n + n * m_pad + n_pad + 2 * m_pad
    scratch_rows = 3 * n * n + n * m_pad
    out_rows = n_pad + 8
    rows = 2 * (in_rows + out_rows) + scratch_rows
    return rows * TILE * 4 <= budget_bytes


def fits_vmem_joint(n1: int, m_own: int, m_pair: int,
                    budget_bytes: int = 12 * 2 ** 20) -> bool:
    """VMEM check for ``solve_qp_lanes_joint``: A and H live in HBM and
    are copied once into SINGLE-buffered scratch (no pipelining 2x), the
    lane-blocked vectors are double-buffered.  The production joint CMPC
    (n1=40, m_own=80, m_pair=20) needs ~9 MB -- it fits."""
    mo_pad = _rup(max(m_own, 1), 8)
    mp_pad = _rup(max(m_pair, 1), 8)
    m1p = mo_pad + mp_pad
    scratch_rows = 2 * n1 * m1p + 2 * n1 * n1 + 3 * n1 * n1
    vec_rows = 3 * (2 * n1) + 2 * (2 * mo_pad + mp_pad)   # inputs
    out_rows = 2 * n1 + 8
    rows = scratch_rows + 2 * (vec_rows + out_rows)
    return rows * TILE * 4 <= budget_bytes


def _make_kernel(n: int, m: int, n_seg: int, seg_iters: int,
                 sigma: float, alpha: float, tol: float,
                 rho: float = 1.0):
    n_pad = _rup(n, 8)
    m_pad = _rup(m, 8)

    def kernel(H_ref, g_ref, A_ref, l_ref, u_ref, x_ref, out_ref,
               K_s, C_s, Kinv_s, At_s):
        l_all = l_ref[:]                        # (m_pad, TILE)
        u_all = u_ref[:]
        g_all = g_ref[:]                        # (n_pad, TILE)
        is_eq = (l_all == u_all)

        # rho0 = clip(trace(H)/n, 1e-3, 1e6) * rho  (qp.py:82) -- the
        # caller's rho multiplier is folded in as a static float so the
        # lanes solver stays interchangeable with solve_qp at rho != 1
        tr = jnp.zeros((TILE,), jnp.float32)
        for i in range(n):
            tr = tr + H_ref[i * n + i, :]
        rho0 = jnp.clip(tr * (1.0 / n), 1e-3, 1e6) * rho

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
                   static_argnames=("iters", "n_seg", "rho", "scale_rows"))
def solve_qp_lanes(H, g, A, l, u, iters: int = 50, n_seg: int = 4,
                   rho: float = 1.0, sigma: float = 1e-6,
                   alpha: float = 1.6, tol: float = 1e-3,
                   scale_rows: bool = False) -> QpSolution:
    """Batched QP solve with batch in vector lanes.

    Same problem form and semantics as ``ops.qp.solve_qp`` but the batch
    axis is MANDATORY and leading: H (B, n, n), g (B, n), A (B, m, n),
    l/u (B, m).  B is padded to a multiple of 128 internally.  ``rho``
    must be a static Python float (it is folded into the kernel's rho0
    exactly as solve_qp folds it, qp.py:82).
    """
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
                          float(alpha), float(tol), rho=float(rho))
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


# ---------------------------------------------------------------------------
# Joint two-agent QP kernel (the CMPC shape)
# ---------------------------------------------------------------------------
#
# The joint CMPC QP (n = 4N = 80 vars, m ~ 260 rows) does NOT fit the
# dense lanes kernel's VMEM budget (fits_vmem: ~45 MB/tile).  But the
# joint problem is *structured*: the two players' dynamics are decoupled
# (H is block-diagonal 2x(n1,n1) because gam/Omega are block-structured,
# control/cmpc.py::_prepare), and every constraint row except the N
# pairwise keep-outs touches only ONE player's inputs.  The kernel
# exploits all of it:
#
# * per-player column blocks: A is stored as 2 x n1 columns of
#   (m_own + m_pair) rows -- the zero halves of the joint matrix are
#   never materialized (2x40x104 rows vs 80x264 dense: 3.4x smaller);
# * implicit variable-box rows: the input-box identity rows contribute
#   diag(rho) to K and an elementwise clip to the z-update -- no A
#   storage, no matvec work (removes 80 of the 260 rows);
# * A and H stay in HBM (memory_space=ANY) and are copied ONCE per tile
#   into single-buffered VMEM scratch -- Pallas's automatic pipelining
#   would double-buffer them (+12 MB/tile) for no benefit since each
#   tile reads them exactly once per solve;
# * block-Schur factorization: K = [[K11,K12],[K12^T,K22]] is factored
#   via chol(K11) -> C1 = L1^{-1} (in-place LAPACK-style trtri),
#   W = C1 K12, S = K22 - W^T W, chol(S) -> C_S; every factor op is an
#   (n1, TILE) slab op and the iteration solve is 6 triangular matvecs.
#   No explicit K^{-1} is formed (C^T(C r) costs the same madds as a
#   dense Kinv matvec and saves an n^2 slab);
# * the 4 adaptive-rho segments run in a lax.fori_loop whose body
#   mutates the factor scratch -- the traced program stays one segment
#   deep (the dense kernel unrolls segments; at n=80 that would 4x a
#   ~15k-op trace).
#
# Semantics: identical to ops.qp.solve_qp on the equivalent dense
# problem (same ADMM, same rho schedule; tests/test_qp_pallas.py pins
# them).  Reference capability this serves:
# /root/reference/py/src/CentralizedMPC.py:17-72.


def _chol_in_place(K_s, n1):
    """Cholesky of an (n1*n1, TILE) col-major slab, L overwrites K
    column-by-column (rows < j of column j hold garbage; never read)."""
    for j in range(n1):
        d = lax.rsqrt(K_s[j * n1 + j, :])
        K_s[j * n1:(j + 1) * n1, :] = K_s[j * n1:(j + 1) * n1, :] * \
            d[None, :]
        lcol = K_s[j * n1:(j + 1) * n1, :]
        for k in range(j + 1, n1):
            K_s[k * n1:(k + 1) * n1, :] = (
                K_s[k * n1:(k + 1) * n1, :] - lcol * lcol[k, :][None, :])


def _trtri_in_place(L_s, n1):
    """C = L^{-1} overwrites L in place (col-major), trailing-block-first
    (LAPACK dtrti2 ordering): column j needs only the already-inverted
    columns k > j and the original column j, read before the write."""
    for j in range(n1 - 1, -1, -1):
        colj = L_s[j * n1:(j + 1) * n1, :]          # original L column j
        inv_d = 1.0 / colj[j, :]
        acc = jnp.zeros((n1, TILE), jnp.float32)
        for k in range(j + 1, n1):
            acc = acc + L_s[k * n1:(k + 1) * n1, :] * colj[k, :][None, :]
        eye = jnp.eye(n1, dtype=jnp.float32)[j]
        L_s[j * n1:(j + 1) * n1, :] = (
            (eye[:, None] - acc) * inv_d[None, :])


def _make_joint_kernel(n1: int, mo_pad: int, mp_pad: int, n_seg: int,
                       seg_iters: int, sigma: float, alpha: float,
                       tol: float, rho: float):
    m1p = mo_pad + mp_pad
    n2 = 2 * n1

    def kernel(A_hbm, H_hbm, g_ref, lx_ref, ux_ref, lo_ref, uo_ref,
               x_ref, out_ref, A_s, H_s, C1_s, W_s, S_s, sem):
        i = pl.program_id(0)
        cpA = pltpu.make_async_copy(
            A_hbm.at[:, pl.ds(i * TILE, TILE)], A_s, sem)
        cpA.start()
        cpA.wait()
        cpH = pltpu.make_async_copy(
            H_hbm.at[:, pl.ds(i * TILE, TILE)], H_s, sem)
        cpH.start()
        cpH.wait()

        def acol(p, j):
            base = (p * n1 + j) * m1p
            return A_s[base:base + m1p, :]

        def hcol(p, j):
            base = (p * n1 + j) * n1
            return H_s[base:base + n1, :]

        g_all = g_ref[:]                     # (n2, TILE)
        lx = lx_ref[:]
        ux = ux_ref[:]
        lo_all = lo_ref[:]                   # (2*mo_pad + mp_pad, TILE)
        uo_all = uo_ref[:]
        is_eq = (lo_all == uo_all)

        # rho0 = clip(trace(H)/n, 1e-3, 1e6) * rho (qp.py:82)
        tr = jnp.zeros((TILE,), jnp.float32)
        for p in range(2):
            for j in range(n1):
                tr = tr + hcol(p, j)[j, :]
        rho0 = jnp.clip(tr * (1.0 / n2), 1e-3, 1e6) * rho

        def rho_parts(rho_s):
            ro = jnp.where(is_eq, 1e3 * rho_s[None, :], rho_s[None, :])
            return ro                        # constraint rows only

        def tri_matvec(T_s, v):
            """T @ v for an (n1*n1, TILE) col-major factor slab."""
            acc = T_s[0:n1, :] * v[0, :][None, :]
            for k in range(1, n1):
                acc = acc + T_s[k * n1:(k + 1) * n1, :] * v[k, :][None, :]
            return acc

        def tri_t_matvec(T_s, v):
            """T^T @ v."""
            return jnp.stack(
                [jnp.sum(T_s[k * n1:(k + 1) * n1, :] * v, axis=0)
                 for k in range(n1)])

        def matvec_H(xv):
            out = []
            for p in range(2):
                acc = jnp.zeros((n1, TILE), jnp.float32)
                for j in range(n1):
                    acc = acc + hcol(p, j) * xv[p * n1 + j, :][None, :]
                out.append(acc)
            return jnp.concatenate(out, axis=0)

        def matvec_A_blocks(xv):
            """Per-player full-column matvecs: returns (f1, f2), each
            (m1p, TILE) = [own rows; this player's pair contribution]."""
            outs = []
            for p in range(2):
                acc = acol(p, 0) * xv[p * n1, :][None, :]
                for j in range(1, n1):
                    acc = acc + acol(p, j) * xv[p * n1 + j, :][None, :]
                outs.append(acc)
            return outs

        def matvec_At(w_o, w_p):
            """A^T w for the constraint rows (w_o (2*mo_pad,T) own rows,
            w_p (mp_pad,T) pair rows) -> (n2, TILE)."""
            rows = []
            for p in range(2):
                wf = jnp.concatenate(
                    [w_o[p * mo_pad:(p + 1) * mo_pad, :], w_p], axis=0)
                for j in range(n1):
                    rows.append(jnp.sum(acol(p, j) * wf, axis=0))
            return jnp.stack(rows)

        def segment(c, _):
            (x, zx, zo, zp, yx, yo, yp, rho_s) = c
            ro = rho_parts(rho_s)            # (2*mo_pad+mp_pad, TILE)
            ro1 = ro[0:mo_pad, :]
            ro2 = ro[mo_pad:2 * mo_pad, :]
            rp = ro[2 * mo_pad:, :]
            rx = rho_s[None, :]              # box rows: never equality

            # ---- K blocks + factorization --------------------------------
            # K_pp = H_p + (sigma + rho_x) I + Aown_p^T diag(ro_p) Aown_p
            #        + P_p^T diag(rp) P_p   (full-column product with the
            #        combined per-row rho vector)
            for j in range(n1):
                rv1 = jnp.concatenate([ro1, rp], axis=0)
                ajr = acol(0, j) * rv1
                col = jnp.stack(
                    [jnp.sum(acol(0, k) * ajr, axis=0) for k in range(n1)])
                eye = jnp.eye(n1, dtype=jnp.float32)[j]
                C1_s[j * n1:(j + 1) * n1, :] = (
                    col + hcol(0, j) +
                    eye[:, None] * (sigma + rx))
            _chol_in_place(C1_s, n1)
            _trtri_in_place(C1_s, n1)
            # K12 = P1^T diag(rp) P2; W = C1 K12, column by column
            for j in range(n1):
                pcj = acol(1, j)[mo_pad:, :] * rp
                k12 = jnp.stack(
                    [jnp.sum(acol(0, k)[mo_pad:, :] * pcj, axis=0)
                     for k in range(n1)])
                W_s[j * n1:(j + 1) * n1, :] = tri_matvec(C1_s, k12)
            # S = K22 - W^T W
            for j in range(n1):
                rv2 = jnp.concatenate([ro2, rp], axis=0)
                ajr = acol(1, j) * rv2
                col = jnp.stack(
                    [jnp.sum(acol(1, k) * ajr, axis=0) for k in range(n1)])
                wj = W_s[j * n1:(j + 1) * n1, :]
                ww = jnp.stack(
                    [jnp.sum(W_s[k * n1:(k + 1) * n1, :] * wj, axis=0)
                     for k in range(n1)])
                eye = jnp.eye(n1, dtype=jnp.float32)[j]
                S_s[j * n1:(j + 1) * n1, :] = (
                    col + hcol(1, j) + eye[:, None] * (sigma + rx) - ww)
            _chol_in_place(S_s, n1)
            _trtri_in_place(S_s, n1)

            def solve_K(r):
                """x = K^{-1} r via the Schur factors."""
                r1 = r[0:n1, :]
                r2 = r[n1:, :]
                t1 = tri_matvec(C1_s, r1)
                t2 = r2 - tri_t_matvec(W_s, t1)
                u2 = tri_matvec(S_s, t2)
                x2 = tri_t_matvec(S_s, u2)
                v1 = t1 - tri_matvec(W_s, x2)
                x1 = tri_t_matvec(C1_s, v1)
                return jnp.concatenate([x1, x2], axis=0)

            def admm_iter(_, cc):
                x, zx, zo, zp, yx, yo, yp = cc
                w_x = rx * zx - yx
                w_o = jnp.concatenate([ro1, ro2], axis=0) * zo - yo
                w_p = rp * zp - yp
                rhs = sigma * x - g_all + matvec_At(w_o, w_p) + w_x
                x_new = solve_K(rhs)
                f1, f2 = matvec_A_blocks(x_new)
                Ax_o = jnp.concatenate(
                    [f1[0:mo_pad, :], f2[0:mo_pad, :]], axis=0)
                Ax_p = f1[mo_pad:, :] + f2[mo_pad:, :]
                # box rows
                zx_t = alpha * x_new + (1.0 - alpha) * zx
                zx_new = jnp.clip(zx_t + yx / rx, lx, ux)
                yx_new = yx + rx * (zx_t - zx_new)
                # own rows
                roo = jnp.concatenate([ro1, ro2], axis=0)
                zo_t = alpha * Ax_o + (1.0 - alpha) * zo
                zo_new = jnp.clip(zo_t + yo / roo,
                                  lo_all[0:2 * mo_pad, :],
                                  uo_all[0:2 * mo_pad, :])
                yo_new = yo + roo * (zo_t - zo_new)
                # pair rows
                zp_t = alpha * Ax_p + (1.0 - alpha) * zp
                zp_new = jnp.clip(zp_t + yp / rp,
                                  lo_all[2 * mo_pad:, :],
                                  uo_all[2 * mo_pad:, :])
                yp_new = yp + rp * (zp_t - zp_new)
                return (x_new, zx_new, zo_new, zp_new, yx_new, yo_new,
                        yp_new)

            x, zx, zo, zp, yx, yo, yp = lax.fori_loop(
                0, seg_iters, admm_iter, (x, zx, zo, zp, yx, yo, yp))

            # residuals + adaptive rho (qp.py:108-116); max over ALL rows
            # including the implicit box rows
            f1, f2 = matvec_A_blocks(x)
            Ax_o = jnp.concatenate([f1[0:mo_pad, :], f2[0:mo_pad, :]],
                                   axis=0)
            Ax_p = f1[mo_pad:, :] + f2[mo_pad:, :]

            def maxabs(*vs):
                m = jnp.zeros((TILE,), jnp.float32)
                for v in vs:
                    m = jnp.maximum(m, jnp.max(jnp.abs(v), axis=0))
                return m

            prim = maxabs(x - zx, Ax_o - zo, Ax_p - zp)
            Hx = matvec_H(x)
            Aty = matvec_At(yo, yp) + yx
            dual = maxabs(Hx + g_all + Aty)
            p_sc = jnp.maximum(maxabs(x, Ax_o, Ax_p),
                               maxabs(zx, zo, zp)) + 1e-9
            d_sc = jnp.maximum(jnp.maximum(maxabs(Hx), maxabs(Aty)),
                               maxabs(g_all)) + 1e-9
            ratio = jnp.sqrt((prim / p_sc) / (dual / d_sc + 1e-12))
            rho_new = jnp.clip(rho_s * jnp.clip(ratio, 0.2, 5.0),
                               1e-6, 1e8)
            return ((x, zx, zo, zp, yx, yo, yp, rho_new),
                    (prim, dual, p_sc, d_sc))

        x0 = jnp.zeros((n2, TILE), jnp.float32)
        zx0 = jnp.zeros((n2, TILE), jnp.float32)
        zo0 = jnp.zeros((2 * mo_pad, TILE), jnp.float32)
        zp0 = jnp.zeros((mp_pad, TILE), jnp.float32)
        init = (x0, zx0, zo0, zp0, jnp.zeros_like(zx0),
                jnp.zeros_like(zo0), jnp.zeros_like(zp0), rho0)

        # segments in a lax.fori_loop: the body mutates the factor
        # scratch refs and carries (x, z, y, rho, residuals) -- the
        # traced program stays ONE segment deep (a Python loop would 4x
        # a ~12k-op trace; Mosaic compile time scales with it).
        # Residuals of the LAST segment feed the convergence flag,
        # matching the dense kernel.
        zres = jnp.zeros((TILE,), jnp.float32)
        carry, res = lax.fori_loop(
            0, n_seg,
            lambda s, cr: segment(cr[0], s),
            (init, (zres, zres, zres, zres)))
        x_fin = carry[0]
        prim, dual, p_sc, d_sc = res

        conv = (prim < tol * p_sc) & (dual < 10.0 * tol * d_sc)
        x_ref[:] = x_fin
        zeros = jnp.zeros((TILE,), jnp.float32)
        out_ref[:] = jnp.stack([jnp.where(conv, 1.0, 0.0), prim, dual,
                                p_sc, d_sc, zeros, zeros, zeros])

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "m_own", "m_pair", "iters", "n_seg", "rho", "scale_rows"))
def solve_qp_lanes_joint(Hb, g, Ab, l, u, lx, ux, *, m_own: int,
                         m_pair: int, iters: int = 50, n_seg: int = 4,
                         rho: float = 1.0, sigma: float = 1e-6,
                         alpha: float = 1.6, tol: float = 1e-3,
                         scale_rows: bool = False) -> QpSolution:
    """Two-agent joint QP with batch in vector lanes (the CMPC shape).

    Equivalent to ``ops.qp.solve_qp`` on the dense joint problem

        min 1/2 x^T H x + g^T x   s.t.  lx <= x <= ux,  l <= A x <= u

    where ``H = blockdiag(Hb[0], Hb[1])`` and the constraint rows are
    [own rows of player 1; own rows of player 2; m_pair shared pairwise
    rows].  Inputs:

    * ``Hb`` (B, 2, n1, n1) per-player Hessian blocks (n1 % 8 == 0)
    * ``g``  (B, 2*n1)
    * ``Ab`` (B, 2, m_own + m_pair, n1): player p's constraint columns,
      rows ordered [own_p (m_own); pair (m_pair)].  The full pairwise
      row r is ``[Ab[0, m_own+r], Ab[1, m_own+r]]``.
    * ``l``/``u`` (B, 2*m_own + m_pair), rows [own1, own2, pair]
    * ``lx``/``ux`` (B, 2*n1) variable box (the input-limit rows --
      handled implicitly in-kernel, no A storage)

    ``scale_rows`` normalizes constraint rows by their FULL joint-row
    norm (pairwise rows use both blocks), matching
    ``solve_qp(scale_rows=True)``; box rows have unit norm by
    construction so they are never scaled.
    """
    B = g.shape[0]
    n1 = Hb.shape[-1]
    if n1 % 8 != 0:
        raise ValueError(f"joint kernel requires n1 % 8 == 0, got {n1}")
    dtype = jnp.float32
    Hb = Hb.astype(dtype)
    g = g.astype(dtype)
    Ab = Ab.astype(dtype)
    l = l.astype(dtype)
    u = u.astype(dtype)
    lx = lx.astype(dtype)
    ux = ux.astype(dtype)

    if scale_rows:
        own = Ab[:, :, :m_own, :]                       # (B,2,m_own,n1)
        d_own = 1.0 / jnp.maximum(
            jnp.linalg.norm(own, axis=-1), 1e-8)        # (B,2,m_own)
        pair = Ab[:, :, m_own:, :]
        d_pair = 1.0 / jnp.maximum(jnp.sqrt(
            jnp.sum(pair * pair, axis=(-1, -3))), 1e-8)  # (B,m_pair)
        d_ab = jnp.concatenate(
            [d_own, jnp.broadcast_to(d_pair[:, None], (B, 2, m_pair))],
            axis=2)
        Ab = Ab * d_ab[..., None]
        d_rows = jnp.concatenate([d_own[:, 0], d_own[:, 1], d_pair],
                                 axis=1)
        l = l * d_rows
        u = u * d_rows

    seg_iters = max(1, iters // n_seg)
    mo_pad = _rup(max(m_own, 1), 8)
    mp_pad = _rup(max(m_pair, 1), 8)
    m1p = mo_pad + mp_pad
    Bp = _rup(B, TILE)

    def plane(a, rows, pad_rows=0, pad_val=0.0):
        a2 = a.reshape(B, rows)
        a2 = jnp.pad(a2, ((0, Bp - B), (0, 0)))
        p = a2.T
        if pad_rows:
            p = jnp.pad(p, ((0, pad_rows), (0, 0)),
                        constant_values=pad_val)
        return p

    # A: per-player, per-column slabs of m1p rows (own pad + pair pad)
    A_cm = jnp.swapaxes(Ab, 2, 3)                      # (B, 2, n1, m1)
    A_own = A_cm[..., :m_own]
    A_pair = A_cm[..., m_own:]
    A_cm = jnp.concatenate([
        jnp.pad(A_own, ((0, 0),) * 3 + ((0, mo_pad - m_own),)),
        jnp.pad(A_pair, ((0, 0),) * 3 + ((0, mp_pad - m_pair),)),
    ], axis=-1)                                        # (B, 2, n1, m1p)
    A_p = plane(A_cm, 2 * n1 * m1p)
    # H: col-major == row-major (symmetric blocks)
    H_p = plane(jnp.swapaxes(Hb, 2, 3), 2 * n1 * n1)
    g_p = plane(g, 2 * n1)
    lx_p = plane(lx, 2 * n1)
    ux_p = plane(ux, 2 * n1)

    def split_rows(v, neutral):
        o1 = jnp.pad(v[:, :m_own], ((0, 0), (0, mo_pad - m_own)),
                     constant_values=neutral)
        o2 = jnp.pad(v[:, m_own:2 * m_own],
                     ((0, 0), (0, mo_pad - m_own)),
                     constant_values=neutral)
        pr = jnp.pad(v[:, 2 * m_own:], ((0, 0), (0, mp_pad - m_pair)),
                     constant_values=neutral)
        return jnp.concatenate([o1, o2, pr], axis=1)

    lo_p = plane(split_rows(l, -3.0e38), 2 * mo_pad + mp_pad)
    uo_p = plane(split_rows(u, 3.0e38), 2 * mo_pad + mp_pad)

    kernel = _make_joint_kernel(n1, mo_pad, mp_pad, n_seg, seg_iters,
                                float(sigma), float(alpha), float(tol),
                                float(rho))
    lane = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    x_p, out_p = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # A (HBM)
            pl.BlockSpec(memory_space=pl.ANY),         # H (HBM)
            lane(2 * n1), lane(2 * n1), lane(2 * n1),
            lane(2 * mo_pad + mp_pad), lane(2 * mo_pad + mp_pad),
        ],
        out_specs=(lane(2 * n1), lane(8)),
        out_shape=(jax.ShapeDtypeStruct((2 * n1, Bp), dtype),
                   jax.ShapeDtypeStruct((8, Bp), dtype)),
        scratch_shapes=[pltpu.VMEM((2 * n1 * m1p, TILE), dtype),
                        pltpu.VMEM((2 * n1 * n1, TILE), dtype),
                        pltpu.VMEM((n1 * n1, TILE), dtype),
                        pltpu.VMEM((n1 * n1, TILE), dtype),
                        pltpu.VMEM((n1 * n1, TILE), dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=(jax.default_backend() == "cpu"),
    )(A_p, H_p, g_p, lx_p, ux_p, lo_p, uo_p)

    return QpSolution(x=x_p[:, 0:B].T, converged=out_p[0, 0:B] > 0.5,
                      prim_res=out_p[1, 0:B], dual_res=out_p[2, 0:B])
