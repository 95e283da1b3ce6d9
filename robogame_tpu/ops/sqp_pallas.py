"""Fused SQP+ADMM joint-CMPC solver as one Pallas TPU kernel.

Round-3 cost decomposition of the CMPC closed loop (BASELINE.md): each
control step launches ``sqp_iters`` separate ``solve_qp_lanes_joint``
kernels, and every launch pays a fixed ~1.9 ms -- four adaptive-rho
block-Schur refactorizations from a COLD ADMM start, plus the XLA-side
keepout relinearization and the HBM->VMEM copies of A and H.  The SQP
iterations only move the 3N keepout/pairwise rows (the Hessian, the
gradient, the input box and the arena rows are all fixed per candidate),
so almost all of that fixed cost is re-computation.

This kernel fuses the whole SQP loop (the structure of
``control/cmpc.py::compute_control_batch``; reference capability
/root/reference/py/src/CentralizedMPC.py:17-72):

* **In-kernel relinearization**: the keepout rows are linear functions of
  the condensed position-sensitivity maps ``sg_p`` (N x 2 x n1 per
  player) and the current iterate -- row (m, k) is
  ``2 * diff[m,k] . sg[k]``.  ``sg`` is copied to VMEM once per solve;
  each SQP iteration rebuilds the 3N moving rows of A in place from
  (2 x n1) slab multiply-adds, with no HBM traffic and no XLA glue.
* **Closed-form row norms**: ``scale_rows`` normalization needs per-row
  norms of the relinearized rows.  With the per-knot gram terms
  ``Gxx[k] = sum_j sgx[k,j]^2`` (and Gxy, Gyy; constant per solve) the
  keepout row norm is ``2 * sqrt(dx^2 Gxx + 2 dx dy Gxy + dy^2 Gyy)`` --
  no second pass over A.
* **Warm-started ADMM across SQP iterations** (OSQP ``warm_start``
  semantics): x and the duals y carry over (rescaled by the old/new row
  norms, ``y_s_new = y_s_old * d_old / d_new``), z is re-seeded to
  ``A_new x``.  The first SQP iteration runs the full ``n_seg0`` x
  ``it0`` adaptive-rho schedule from a cold start; every later iteration
  runs ONE segment of ``it_rest`` iterations with the carried rho --
  one refactorization instead of four, and far fewer iterations because
  the duals already know the active set.

Semantics: SQP iteration 1 is numerically identical to
``ops.qp_pallas.solve_qp_lanes_joint`` on the same candidate (same ADMM,
same rho schedule, same scaling; pinned by
``tests/test_sqp_pallas.py``).  Later iterations differ from the cold
multi-launch path only through warm starting -- the convergence flag
still reflects the final relinearization's residuals.
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
from .qp_pallas import TILE, _chol_in_place, _rup, _trtri_in_place

BIGF = 3.0e38


def fits_vmem_cmpc_fused(n1: int, N: int, n_obs: int,
                         budget_bytes: int = 13 * 2 ** 20) -> bool:
    """Scratch accounting for the fused kernel: A + H + sg single-buffered
    VMEM scratch, 3 Schur factor slabs, plus the double-buffered vector
    I/O blocks.  Production CMPC (n1=40, N=20, M=2) ~ 10.5 MB."""
    m_own = 2 * N + n_obs * N
    mo_pad = _rup(max(m_own, 1), 8)
    mp_pad = _rup(max(N, 1), 8)
    m1p = mo_pad + mp_pad
    scratch = 2 * n1 * m1p + 2 * n1 * n1 + 2 * n1 * 2 * N + 3 * n1 * n1
    vec_in = 5 * 2 * n1 + 2 * 2 * 2 * N + 2 * 2 * N + _rup(2 * n_obs, 8)
    out = 2 * n1 + 8
    rows = scratch + 2 * (vec_in + out)
    return rows * TILE * 4 <= budget_bytes


def _make_cmpc_kernel(n1: int, N: int, M: int, mo_pad: int, mp_pad: int,
                      n_seg0: int, it0: int, sqp_rest: int, it_rest: int,
                      sigma: float, alpha: float, tol: float, rho: float,
                      d2: float):
    m_own = 2 * N + M * N
    m_pair = N
    m1p = mo_pad + mp_pad
    n2 = 2 * n1
    twoN = 2 * N

    def kernel(H_hbm, sg_hbm, g_ref, lx_ref, ux_ref, loa_ref, hia_ref,
               p0_ref, obs_ref, u0_ref, x_ref, out_ref,
               A_s, H_s, sg_s, C1_s, W_s, S_s, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            H_hbm.at[:, pl.ds(i * TILE, TILE)], H_s, sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(
            sg_hbm.at[:, pl.ds(i * TILE, TILE)], sg_s, sem)
        cp.start()
        cp.wait()

        def sgx(p, j):
            base = (p * n1 + j) * twoN
            return sg_s[base:base + N, :]

        def sgy(p, j):
            base = (p * n1 + j) * twoN
            return sg_s[base + N:base + twoN, :]

        def acol(p, j):
            base = (p * n1 + j) * m1p
            return A_s[base:base + m1p, :]

        def hcol(p, j):
            base = (p * n1 + j) * n1
            return H_s[base:base + n1, :]

        g_all = g_ref[:]
        lx = lx_ref[:]
        ux = ux_ref[:]
        loa = loa_ref[:]                 # (2*twoN, T), per player [x;y]
        hia = hia_ref[:]
        p0 = p0_ref[:]                   # (2*twoN, T), per player [x;y]
        u0 = u0_ref[:]

        # zero the pad rows of every A column once (scratch is
        # uninitialized; pad rows must stay exactly 0 for matvecs)
        if mo_pad > m_own or mp_pad > m_pair:
            zpad_o = jnp.zeros((mo_pad - m_own, TILE), jnp.float32)
            zpad_p = jnp.zeros((mp_pad - m_pair, TILE), jnp.float32)
            for p in range(2):
                for j in range(n1):
                    base = (p * n1 + j) * m1p
                    if mo_pad > m_own:
                        A_s[base + m_own:base + mo_pad, :] = zpad_o
                    if mp_pad > m_pair:
                        A_s[base + mo_pad + m_pair:base + m1p, :] = zpad_p

        # per-player knot gram terms (constant per solve): the closed-form
        # row norms of any relinearized keepout/pair row
        grams = []
        for p in range(2):
            gxx = jnp.zeros((N, TILE), jnp.float32)
            gxy = jnp.zeros((N, TILE), jnp.float32)
            gyy = jnp.zeros((N, TILE), jnp.float32)
            for j in range(n1):
                sx = sgx(p, j)
                sy = sgy(p, j)
                gxx = gxx + sx * sx
                gxy = gxy + sx * sy
                gyy = gyy + sy * sy
            grams.append((gxx, gxy, gyy))
        arena_norm = [
            jnp.concatenate([jnp.sqrt(grams[p][0]),
                             jnp.sqrt(grams[p][2])], axis=0)
            for p in range(2)]           # (2N, T) per player

        # rho0 = clip(trace(H)/n, 1e-3, 1e6) * rho (qp.py:82)
        tr = jnp.zeros((TILE,), jnp.float32)
        for p in range(2):
            for j in range(n1):
                tr = tr + hcol(p, j)[j, :]
        rho0 = jnp.clip(tr * (1.0 / n2), 1e-3, 1e6) * rho

        # pad-row masks as iota comparisons (pallas rejects captured
        # host constants; Mosaic has no rank-2 bool tensors, so the
        # comparison feeds jnp.where directly)
        own_iota = lax.broadcasted_iota(jnp.int32, (mo_pad, TILE), 0)
        pair_iota = lax.broadcasted_iota(jnp.int32, (mp_pad, TILE), 0)

        def relinearize(x_lin):
            """Rebuild the scaled A in place at the linearization point
            ``x_lin``; returns (bounds, row-scale vectors)."""
            pb = []
            for p in range(2):
                accx = p0[p * twoN:p * twoN + N, :]
                accy = p0[p * twoN + N:(p + 1) * twoN, :]
                for j in range(n1):
                    xj = x_lin[p * n1 + j, :][None, :]
                    accx = accx + sgx(p, j) * xj
                    accy = accy + sgy(p, j) * xj
                pb.append((accx, accy))

            # pairwise diff + row scale
            dpx = pb[0][0] - pb[1][0]
            dpy = pb[0][1] - pb[1][1]
            sxx = grams[0][0] + grams[1][0]
            sxy = grams[0][1] + grams[1][1]
            syy = grams[0][2] + grams[1][2]
            rnp_ = 2.0 * jnp.sqrt(dpx * dpx * sxx + 2.0 * dpx * dpy * sxy
                                  + dpy * dpy * syy)
            d_pr = 1.0 / jnp.maximum(
                jnp.concatenate(
                    [rnp_, jnp.zeros((mp_pad - m_pair, TILE),
                                     jnp.float32)], axis=0)
                if mp_pad > m_pair else rnp_, 1e-8)
            gp = dpx * dpx + dpy * dpy - d2
            rhs_p = (2.0 * (dpx * pb[0][0] + dpy * pb[0][1]
                            - dpx * pb[1][0] - dpy * pb[1][1]) - gp
                     - 2.0 * (dpx * (p0[0:N, :] - p0[twoN:twoN + N, :])
                              + dpy * (p0[N:twoN, :]
                                       - p0[twoN + N:2 * twoN, :])))
            pad_p = jnp.zeros((mp_pad - m_pair, TILE), jnp.float32)
            lo_pr = jnp.concatenate([rhs_p * d_pr[0:m_pair, :], pad_p],
                                    axis=0) if mp_pad > m_pair else \
                rhs_p * d_pr
            hi_pr = 1e9 * d_pr
            lo_pr = jnp.where(pair_iota >= m_pair, -BIGF, lo_pr)
            hi_pr = jnp.where(pair_iota >= m_pair, BIGF, hi_pr)

            d_own = []
            lo_own = []
            hi_own = []
            for p in range(2):
                gxx, gxy, gyy = grams[p]
                pbx, pby = pb[p]
                p0x = p0[p * twoN:p * twoN + N, :]
                p0y = p0[p * twoN + N:(p + 1) * twoN, :]
                dxs = []
                dys = []
                ko_norm = []
                rhs_ko = []
                for m in range(M):
                    ox = obs_ref[2 * m, :][None, :]
                    oy = obs_ref[2 * m + 1, :][None, :]
                    dx = pbx - ox
                    dy = pby - oy
                    dxs.append(dx)
                    dys.append(dy)
                    ko_norm.append(2.0 * jnp.sqrt(
                        dx * dx * gxx + 2.0 * dx * dy * gxy
                        + dy * dy * gyy))
                    gval = dx * dx + dy * dy - d2
                    rhs_ko.append(2.0 * (dx * pbx + dy * pby) - gval
                                  - 2.0 * (dx * p0x + dy * p0y))
                norm_own = jnp.concatenate(
                    [arena_norm[p]] + ko_norm, axis=0)      # (m_own, T)
                if mo_pad > m_own:
                    norm_own = jnp.concatenate(
                        [norm_own, jnp.zeros((mo_pad - m_own, TILE),
                                             jnp.float32)], axis=0)
                d_o = 1.0 / jnp.maximum(norm_own, 1e-8)
                d_own.append(d_o)
                lo_o = jnp.concatenate(
                    [loa[p * twoN:(p + 1) * twoN, :]
                     * d_o[0:twoN, :]] +
                    [rhs_ko[m] * d_o[twoN + m * N:twoN + (m + 1) * N, :]
                     for m in range(M)], axis=0)
                hi_o = jnp.concatenate(
                    [hia[p * twoN:(p + 1) * twoN, :]
                     * d_o[0:twoN, :]] +
                    [1e9 * d_o[twoN + m * N:twoN + (m + 1) * N, :]
                     for m in range(M)], axis=0)
                if mo_pad > m_own:
                    padz = jnp.zeros((mo_pad - m_own, TILE), jnp.float32)
                    lo_o = jnp.concatenate([lo_o, padz], axis=0)
                    hi_o = jnp.concatenate([hi_o, padz], axis=0)
                lo_own.append(jnp.where(own_iota >= m_own, -BIGF, lo_o))
                hi_own.append(jnp.where(own_iota >= m_own, BIGF, hi_o))

                # write scaled A columns for player p
                sign = 1.0 if p == 0 else -1.0
                for j in range(n1):
                    sx = sgx(p, j)
                    sy = sgy(p, j)
                    base = (p * n1 + j) * m1p
                    A_s[base:base + N, :] = sx * d_o[0:N, :]
                    A_s[base + N:base + twoN, :] = sy * d_o[N:twoN, :]
                    for m in range(M):
                        r0 = base + twoN + m * N
                        A_s[r0:r0 + N, :] = (
                            2.0 * (dxs[m] * sx + dys[m] * sy)
                            * d_o[twoN + m * N:twoN + (m + 1) * N, :])
                    r0 = base + mo_pad
                    A_s[r0:r0 + N, :] = (
                        sign * 2.0 * (dpx * sx + dpy * sy)
                        * d_pr[0:N, :])

            lo_o = jnp.concatenate(lo_own, axis=0)
            hi_o = jnp.concatenate(hi_own, axis=0)
            return (lo_o, hi_o, lo_pr, hi_pr,
                    jnp.concatenate(d_own, axis=0), d_pr)

        # ---- ADMM machinery (identical to solve_qp_lanes_joint) ---------
        def tri_matvec(T_s, v):
            acc = T_s[0:n1, :] * v[0, :][None, :]
            for k in range(1, n1):
                acc = acc + T_s[k * n1:(k + 1) * n1, :] * v[k, :][None, :]
            return acc

        def tri_t_matvec(T_s, v):
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
            outs = []
            for p in range(2):
                acc = acol(p, 0) * xv[p * n1, :][None, :]
                for j in range(1, n1):
                    acc = acc + acol(p, j) * xv[p * n1 + j, :][None, :]
                outs.append(acc)
            return outs

        def matvec_At(w_o, w_p):
            rows = []
            for p in range(2):
                wf = jnp.concatenate(
                    [w_o[p * mo_pad:(p + 1) * mo_pad, :], w_p], axis=0)
                for j in range(n1):
                    rows.append(jnp.sum(acol(p, j) * wf, axis=0))
            return jnp.stack(rows)

        def segment(c, bounds, seg_iters):
            (x, zx, zo, zp, yx, yo, yp, rho_s) = c
            lo_o, hi_o, lo_pr, hi_pr = bounds
            ro = rho_s[None, :]          # no equality rows in this shape
            rx = rho_s[None, :]

            for j in range(n1):
                ajr = acol(0, j) * ro
                col = jnp.stack(
                    [jnp.sum(acol(0, k) * ajr, axis=0) for k in range(n1)])
                eye = jnp.eye(n1, dtype=jnp.float32)[j]
                C1_s[j * n1:(j + 1) * n1, :] = (
                    col + hcol(0, j) + eye[:, None] * (sigma + rx))
            _chol_in_place(C1_s, n1)
            _trtri_in_place(C1_s, n1)
            for j in range(n1):
                pcj = acol(1, j)[mo_pad:, :] * ro
                k12 = jnp.stack(
                    [jnp.sum(acol(0, k)[mo_pad:, :] * pcj, axis=0)
                     for k in range(n1)])
                W_s[j * n1:(j + 1) * n1, :] = tri_matvec(C1_s, k12)
            for j in range(n1):
                ajr = acol(1, j) * ro
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
                w_o = ro * zo - yo
                w_p = ro * zp - yp
                rhs = sigma * x - g_all + matvec_At(w_o, w_p) + w_x
                x_new = solve_K(rhs)
                f1, f2 = matvec_A_blocks(x_new)
                Ax_o = jnp.concatenate(
                    [f1[0:mo_pad, :], f2[0:mo_pad, :]], axis=0)
                Ax_p = f1[mo_pad:, :] + f2[mo_pad:, :]
                zx_t = alpha * x_new + (1.0 - alpha) * zx
                zx_new = jnp.clip(zx_t + yx / rx, lx, ux)
                yx_new = yx + rx * (zx_t - zx_new)
                zo_t = alpha * Ax_o + (1.0 - alpha) * zo
                zo_new = jnp.clip(zo_t + yo / ro, lo_o, hi_o)
                yo_new = yo + ro * (zo_t - zo_new)
                zp_t = alpha * Ax_p + (1.0 - alpha) * zp
                zp_new = jnp.clip(zp_t + yp / ro, lo_pr, hi_pr)
                yp_new = yp + ro * (zp_t - zp_new)
                return (x_new, zx_new, zo_new, zp_new, yx_new, yo_new,
                        yp_new)

            x, zx, zo, zp, yx, yo, yp = lax.fori_loop(
                0, seg_iters, admm_iter, (x, zx, zo, zp, yx, yo, yp))

            f1, f2 = matvec_A_blocks(x)
            Ax_o = jnp.concatenate([f1[0:mo_pad, :], f2[0:mo_pad, :]],
                                   axis=0)
            Ax_p = f1[mo_pad:, :] + f2[mo_pad:, :]

            def maxabs(*vs):
                mx = jnp.zeros((TILE,), jnp.float32)
                for v in vs:
                    mx = jnp.maximum(mx, jnp.max(jnp.abs(v), axis=0))
                return mx

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

        # ---- SQP iteration 1: cold start, full rho schedule -------------
        bounds0 = relinearize(u0)
        lo_o, hi_o, lo_pr, hi_pr, d_o, d_pr = bounds0
        zv = jnp.zeros((n2, TILE), jnp.float32)
        zo0 = jnp.zeros((2 * mo_pad, TILE), jnp.float32)
        zp0 = jnp.zeros((mp_pad, TILE), jnp.float32)
        init = (zv, zv, zo0, zp0, jnp.zeros_like(zv),
                jnp.zeros_like(zo0), jnp.zeros_like(zp0), rho0)
        zres = jnp.zeros((TILE,), jnp.float32)
        carry, res = lax.fori_loop(
            0, n_seg0,
            lambda s, cr: segment(cr[0], (lo_o, hi_o, lo_pr, hi_pr), it0),
            (init, (zres, zres, zres, zres)))

        # ---- SQP iterations 2..: relinearize + warm single segment ------
        if sqp_rest > 0:
            def sqp_body(s, cr):
                c, _res, d_o, d_pr = cr
                (x, zx, zo, zp, yx, yo, yp, rho_s) = c
                lo_o, hi_o, lo_pr, hi_pr, d_o_new, d_pr_new = \
                    relinearize(x)
                # OSQP warm_start: keep x, rescale duals to the new row
                # scaling (y_scaled_new = y_scaled_old * d_old / d_new),
                # re-seed z = A_new x
                yo = yo * (d_o / d_o_new)
                yp = yp * (d_pr / d_pr_new)
                f1, f2 = matvec_A_blocks(x)
                zo = jnp.concatenate([f1[0:mo_pad, :], f2[0:mo_pad, :]],
                                     axis=0)
                zp = f1[mo_pad:, :] + f2[mo_pad:, :]
                c2, res2 = segment(
                    (x, zx, zo, zp, yx, yo, yp, rho_s),
                    (lo_o, hi_o, lo_pr, hi_pr), it_rest)
                return (c2, res2, d_o_new, d_pr_new)

            carry, res, d_o, d_pr = lax.fori_loop(
                0, sqp_rest, sqp_body, (carry, res, d_o, d_pr))

        x_fin = carry[0]
        prim, dual, p_sc, d_sc = res
        conv = (prim < tol * p_sc) & (dual < 10.0 * tol * d_sc)
        x_ref[:] = x_fin
        zeros = jnp.zeros((TILE,), jnp.float32)
        out_ref[:] = jnp.stack([jnp.where(conv, 1.0, 0.0), prim, dual,
                                p_sc, d_sc, zeros, zeros, zeros])

    return kernel


def fits_vmem_dmpc_fused(n1: int, N: int, n_obs: int,
                         budget_bytes: int = 13 * 2 ** 20) -> bool:
    """Scratch accounting for the single-agent fused kernel: A + H + sg
    single-buffered VMEM scratch, one factor slab, plus the
    double-buffered vector I/O blocks.  Production DMPC (n1=40, N=20,
    M=3) ~ 4.8 MB."""
    m_own = 2 * N + n_obs * N
    mo_pad = _rup(max(m_own, 1), 8)
    scratch = n1 * mo_pad + n1 * n1 + n1 * 2 * N + n1 * n1
    vec_in = 4 * n1 + 2 * 2 * N + 2 * N + _rup(2 * n_obs, 8)
    out = n1 + 8
    rows = scratch + 2 * (vec_in + out)
    return rows * TILE * 4 <= budget_bytes


def _make_dmpc_kernel(n1: int, N: int, M: int, mo_pad: int,
                      n_seg0: int, it0: int, sqp_rest: int, it_rest: int,
                      sigma: float, alpha: float, tol: float, rho: float,
                      d2: float):
    """Single-agent fused SQP kernel body (the DMPC shape): the CMPC
    kernel above with the second player and the pairwise block removed --
    one Cholesky factor, one own-rows slab, implicit input-box rows."""
    m_own = 2 * N + M * N
    twoN = 2 * N

    def kernel(H_hbm, sg_hbm, g_ref, lx_ref, ux_ref, loa_ref, hia_ref,
               p0_ref, obs_ref, u0_ref, x_ref, out_ref,
               A_s, H_s, sg_s, K_s, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            H_hbm.at[:, pl.ds(i * TILE, TILE)], H_s, sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(
            sg_hbm.at[:, pl.ds(i * TILE, TILE)], sg_s, sem)
        cp.start()
        cp.wait()

        def sgx(j):
            return sg_s[j * twoN:j * twoN + N, :]

        def sgy(j):
            return sg_s[j * twoN + N:(j + 1) * twoN, :]

        def acol(j):
            return A_s[j * mo_pad:(j + 1) * mo_pad, :]

        def hcol(j):
            return H_s[j * n1:(j + 1) * n1, :]

        g_all = g_ref[:]
        lx = lx_ref[:]
        ux = ux_ref[:]
        loa = loa_ref[:]                 # (2N, T), rows [x (N); y (N)]
        hia = hia_ref[:]
        p0 = p0_ref[:]                   # (2N, T), rows [x (N); y (N)]
        u0 = u0_ref[:]

        # zero the pad rows of every A column once (scratch is
        # uninitialized; pad rows must stay exactly 0 for matvecs)
        if mo_pad > m_own:
            zpad = jnp.zeros((mo_pad - m_own, TILE), jnp.float32)
            for j in range(n1):
                A_s[j * mo_pad + m_own:(j + 1) * mo_pad, :] = zpad

        # knot gram terms (constant per solve): closed-form row norms of
        # any relinearized keepout row and of the arena rows
        gxx = jnp.zeros((N, TILE), jnp.float32)
        gxy = jnp.zeros((N, TILE), jnp.float32)
        gyy = jnp.zeros((N, TILE), jnp.float32)
        for j in range(n1):
            sx = sgx(j)
            sy = sgy(j)
            gxx = gxx + sx * sx
            gxy = gxy + sx * sy
            gyy = gyy + sy * sy
        arena_norm = jnp.concatenate([jnp.sqrt(gxx), jnp.sqrt(gyy)],
                                     axis=0)          # (2N, T)

        # rho0 = clip(trace(H)/n, 1e-3, 1e6) * rho (qp.py:82)
        tr = jnp.zeros((TILE,), jnp.float32)
        for j in range(n1):
            tr = tr + hcol(j)[j, :]
        rho0 = jnp.clip(tr * (1.0 / n1), 1e-3, 1e6) * rho

        own_iota = lax.broadcasted_iota(jnp.int32, (mo_pad, TILE), 0)

        def relinearize(x_lin):
            """Rebuild the scaled A in place at ``x_lin``; returns
            (lo, hi, row-scale)."""
            accx = p0[0:N, :]
            accy = p0[N:twoN, :]
            for j in range(n1):
                xj = x_lin[j, :][None, :]
                accx = accx + sgx(j) * xj
                accy = accy + sgy(j) * xj

            dxs = []
            dys = []
            ko_norm = []
            rhs_ko = []
            for m in range(M):
                ox = obs_ref[2 * m, :][None, :]
                oy = obs_ref[2 * m + 1, :][None, :]
                dx = accx - ox
                dy = accy - oy
                dxs.append(dx)
                dys.append(dy)
                ko_norm.append(2.0 * jnp.sqrt(
                    dx * dx * gxx + 2.0 * dx * dy * gxy + dy * dy * gyy))
                gval = dx * dx + dy * dy - d2
                rhs_ko.append(2.0 * (dx * accx + dy * accy) - gval
                              - 2.0 * (dx * p0[0:N, :]
                                       + dy * p0[N:twoN, :]))
            norm_own = jnp.concatenate([arena_norm] + ko_norm, axis=0)
            if mo_pad > m_own:
                norm_own = jnp.concatenate(
                    [norm_own, jnp.zeros((mo_pad - m_own, TILE),
                                         jnp.float32)], axis=0)
            d_o = 1.0 / jnp.maximum(norm_own, 1e-8)
            lo_o = jnp.concatenate(
                [loa * d_o[0:twoN, :]] +
                [rhs_ko[m] * d_o[twoN + m * N:twoN + (m + 1) * N, :]
                 for m in range(M)], axis=0)
            hi_o = jnp.concatenate(
                [hia * d_o[0:twoN, :]] +
                [1e9 * d_o[twoN + m * N:twoN + (m + 1) * N, :]
                 for m in range(M)], axis=0)
            if mo_pad > m_own:
                padz = jnp.zeros((mo_pad - m_own, TILE), jnp.float32)
                lo_o = jnp.concatenate([lo_o, padz], axis=0)
                hi_o = jnp.concatenate([hi_o, padz], axis=0)
            lo_o = jnp.where(own_iota >= m_own, -BIGF, lo_o)
            hi_o = jnp.where(own_iota >= m_own, BIGF, hi_o)

            # write scaled A columns
            for j in range(n1):
                sx = sgx(j)
                sy = sgy(j)
                base = j * mo_pad
                A_s[base:base + N, :] = sx * d_o[0:N, :]
                A_s[base + N:base + twoN, :] = sy * d_o[N:twoN, :]
                for m in range(M):
                    r0 = base + twoN + m * N
                    A_s[r0:r0 + N, :] = (
                        2.0 * (dxs[m] * sx + dys[m] * sy)
                        * d_o[twoN + m * N:twoN + (m + 1) * N, :])
            return lo_o, hi_o, d_o

        # ---- ADMM machinery (single block of solve_qp_lanes_joint) ------
        def tri_matvec(T_s, v):
            acc = T_s[0:n1, :] * v[0, :][None, :]
            for k in range(1, n1):
                acc = acc + T_s[k * n1:(k + 1) * n1, :] * v[k, :][None, :]
            return acc

        def tri_t_matvec(T_s, v):
            return jnp.stack(
                [jnp.sum(T_s[k * n1:(k + 1) * n1, :] * v, axis=0)
                 for k in range(n1)])

        def matvec_H(xv):
            acc = jnp.zeros((n1, TILE), jnp.float32)
            for j in range(n1):
                acc = acc + hcol(j) * xv[j, :][None, :]
            return acc

        def matvec_A(xv):
            acc = acol(0) * xv[0, :][None, :]
            for j in range(1, n1):
                acc = acc + acol(j) * xv[j, :][None, :]
            return acc

        def matvec_At(w):
            return jnp.stack(
                [jnp.sum(acol(j) * w, axis=0) for j in range(n1)])

        def segment(c, bounds, seg_iters):
            (x, zx, zo, yx, yo, rho_s) = c
            lo_o, hi_o = bounds
            ro = rho_s[None, :]          # no equality rows in this shape
            rx = rho_s[None, :]

            for j in range(n1):
                ajr = acol(j) * ro
                col = jnp.stack(
                    [jnp.sum(acol(k) * ajr, axis=0) for k in range(n1)])
                eye = jnp.eye(n1, dtype=jnp.float32)[j]
                K_s[j * n1:(j + 1) * n1, :] = (
                    col + hcol(j) + eye[:, None] * (sigma + rx))
            _chol_in_place(K_s, n1)
            _trtri_in_place(K_s, n1)

            def solve_K(r):
                return tri_t_matvec(K_s, tri_matvec(K_s, r))

            def admm_iter(_, cc):
                x, zx, zo, yx, yo = cc
                w_x = rx * zx - yx
                w_o = ro * zo - yo
                rhs = sigma * x - g_all + matvec_At(w_o) + w_x
                x_new = solve_K(rhs)
                Ax = matvec_A(x_new)
                zx_t = alpha * x_new + (1.0 - alpha) * zx
                zx_new = jnp.clip(zx_t + yx / rx, lx, ux)
                yx_new = yx + rx * (zx_t - zx_new)
                zo_t = alpha * Ax + (1.0 - alpha) * zo
                zo_new = jnp.clip(zo_t + yo / ro, lo_o, hi_o)
                yo_new = yo + ro * (zo_t - zo_new)
                return (x_new, zx_new, zo_new, yx_new, yo_new)

            x, zx, zo, yx, yo = lax.fori_loop(
                0, seg_iters, admm_iter, (x, zx, zo, yx, yo))

            Ax = matvec_A(x)

            def maxabs(*vs):
                mx = jnp.zeros((TILE,), jnp.float32)
                for v in vs:
                    mx = jnp.maximum(mx, jnp.max(jnp.abs(v), axis=0))
                return mx

            prim = maxabs(x - zx, Ax - zo)
            Hx = matvec_H(x)
            Aty = matvec_At(yo) + yx
            dual = maxabs(Hx + g_all + Aty)
            p_sc = jnp.maximum(maxabs(x, Ax), maxabs(zx, zo)) + 1e-9
            d_sc = jnp.maximum(jnp.maximum(maxabs(Hx), maxabs(Aty)),
                               maxabs(g_all)) + 1e-9
            ratio = jnp.sqrt((prim / p_sc) / (dual / d_sc + 1e-12))
            rho_new = jnp.clip(rho_s * jnp.clip(ratio, 0.2, 5.0),
                               1e-6, 1e8)
            return ((x, zx, zo, yx, yo, rho_new),
                    (prim, dual, p_sc, d_sc))

        # ---- SQP iteration 1: cold start, full rho schedule -------------
        lo_o, hi_o, d_o = relinearize(u0)
        zv = jnp.zeros((n1, TILE), jnp.float32)
        zo0 = jnp.zeros((mo_pad, TILE), jnp.float32)
        init = (zv, zv, zo0, jnp.zeros_like(zv), jnp.zeros_like(zo0),
                rho0)
        zres = jnp.zeros((TILE,), jnp.float32)
        carry, res = lax.fori_loop(
            0, n_seg0,
            lambda s, cr: segment(cr[0], (lo_o, hi_o), it0),
            (init, (zres, zres, zres, zres)))

        # ---- SQP iterations 2..: relinearize + warm single segment ------
        if sqp_rest > 0:
            def sqp_body(s, cr):
                c, _res, d_o = cr
                (x, zx, zo, yx, yo, rho_s) = c
                lo_o, hi_o, d_o_new = relinearize(x)
                # OSQP warm_start: keep x, rescale duals to the new row
                # scaling, re-seed z = A_new x
                yo = yo * (d_o / d_o_new)
                zo = matvec_A(x)
                c2, res2 = segment((x, zx, zo, yx, yo, rho_s),
                                   (lo_o, hi_o), it_rest)
                return (c2, res2, d_o_new)

            carry, res, d_o = lax.fori_loop(
                0, sqp_rest, sqp_body, (carry, res, d_o))

        x_fin = carry[0]
        prim, dual, p_sc, d_sc = res
        conv = (prim < tol * p_sc) & (dual < 10.0 * tol * d_sc)
        x_ref[:] = x_fin
        zeros = jnp.zeros((TILE,), jnp.float32)
        out_ref[:] = jnp.stack([jnp.where(conv, 1.0, 0.0), prim, dual,
                                p_sc, d_sc, zeros, zeros, zeros])

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "N", "n_obs", "n_seg0", "it0", "sqp_rest", "it_rest", "rho", "d2"))
def solve_dmpc_sqp_lanes(H, g, sg, p0, obs, lo_arena, hi_arena, lx, ux,
                         U0, *, N: int, n_obs: int, n_seg0: int = 4,
                         it0: int = 37, sqp_rest: int = 5,
                         it_rest: int = 40, rho: float = 1.0,
                         sigma: float = 1e-6, alpha: float = 1.6,
                         tol: float = 1e-3, d2: float = 0.16
                         ) -> QpSolution:
    """Fused SQP single-agent solve, batch in vector lanes (the DMPC
    shape; reference capability /root/reference/py/src/DMPC.py:16-54).

    Equivalent to ``sqp_rest + 1`` sequential
    ``solve_qp_lanes(scale_rows=True)`` launches with the keepout rows
    relinearized between launches (the loop in
    ``control/dmpc.py::compute_control_batch``), except that ADMM state
    warm-carries across SQP iterations and iterations after the first run
    one ``it_rest``-iteration rho segment instead of ``n_seg0``.

    Inputs (batch-leading; n1 = 2N, n1 % 8 == 0):

    * ``H`` (B, n1, n1), ``g`` (B, n1)
    * ``sg`` (B, N, 2, n1) position sensitivity d p[k, c] / d u[j]
    * ``p0`` (B, N, 2) free-response positions
    * ``obs`` (B, n_obs, 2) keepout centers
    * ``lo_arena``/``hi_arena`` (B, 2N): arena-box bounds ordered
      [x-rows (N); y-rows (N)]
    * ``lx``/``ux`` (B, n1) input box (implicit rows)
    * ``U0`` (B, n1) first linearization point (cold ADMM start)
    * ``d2`` static: squared keepout distance ((2 r)^2)
    """
    B = g.shape[0]
    n1 = H.shape[-1]
    if n1 != 2 * N or n1 % 8 != 0:
        raise ValueError(f"need n1 == 2N, n1 % 8 == 0; got n1={n1}, N={N}")
    m_own = 2 * N + n_obs * N
    mo_pad = _rup(m_own, 8)
    dtype = jnp.float32
    Bp = _rup(B, TILE)

    def plane(a, rows):
        a2 = a.reshape(B, rows).astype(dtype)
        a2 = jnp.pad(a2, ((0, Bp - B), (0, 0)))
        return a2.T

    # sg plane: per column j, rows [x(k=0..N-1); y(...)]
    # (B, N, 2, n1) [b,k,c,j] -> [b,j,c,k]
    sg_pl = plane(jnp.swapaxes(sg, 1, 3), n1 * 2 * N)
    H_pl = plane(jnp.swapaxes(H, 1, 2), n1 * n1)
    g_pl = plane(g, n1)
    lx_pl = plane(lx, n1)
    ux_pl = plane(ux, n1)
    loa_pl = plane(lo_arena, 2 * N)
    hia_pl = plane(hi_arena, 2 * N)
    p0_pl = plane(jnp.swapaxes(p0, 1, 2), 2 * N)
    obs_rows = _rup(2 * n_obs, 8)
    obs_pl = plane(
        jnp.pad(obs.reshape(B, 2 * n_obs),
                ((0, 0), (0, obs_rows - 2 * n_obs))), obs_rows)
    u0_pl = plane(U0, n1)

    kernel = _make_dmpc_kernel(
        n1, N, n_obs, mo_pad, n_seg0, it0, sqp_rest, it_rest,
        float(sigma), float(alpha), float(tol), float(rho), float(d2))
    lane = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    x_p, out_p = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # H (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # sg (HBM)
            lane(n1), lane(n1), lane(n1),
            lane(2 * N), lane(2 * N), lane(2 * N),
            lane(obs_rows), lane(n1),
        ],
        out_specs=(lane(n1), lane(8)),
        out_shape=(jax.ShapeDtypeStruct((n1, Bp), dtype),
                   jax.ShapeDtypeStruct((8, Bp), dtype)),
        scratch_shapes=[pltpu.VMEM((n1 * mo_pad, TILE), dtype),
                        pltpu.VMEM((n1 * n1, TILE), dtype),
                        pltpu.VMEM((n1 * 2 * N, TILE), dtype),
                        pltpu.VMEM((n1 * n1, TILE), dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=(jax.default_backend() == "cpu"),
    )(H_pl, sg_pl, g_pl, lx_pl, ux_pl, loa_pl, hia_pl, p0_pl, obs_pl,
      u0_pl)

    return QpSolution(x=x_p[:, 0:B].T, converged=out_p[0, 0:B] > 0.5,
                      prim_res=out_p[1, 0:B], dual_res=out_p[2, 0:B])


@functools.partial(jax.jit, static_argnames=(
    "N", "n_obs", "n_seg0", "it0", "sqp_rest", "it_rest", "rho", "d2"))
def solve_cmpc_sqp_lanes(Hb, g, sg, p0, obs, lo_arena, hi_arena, lx, ux,
                         U0, *, N: int, n_obs: int, n_seg0: int = 4,
                         it0: int = 37, sqp_rest: int = 5,
                         it_rest: int = 40, rho: float = 1.0,
                         sigma: float = 1e-6, alpha: float = 1.6,
                         tol: float = 1e-3, d2: float = 0.16
                         ) -> QpSolution:
    """Fused SQP joint-CMPC solve, batch in vector lanes.

    Equivalent to ``sqp_rest + 1`` sequential
    ``solve_qp_lanes_joint(scale_rows=True)`` launches with the keepout
    rows relinearized between launches (the loop in
    ``control/cmpc.py::compute_control_batch``), except that ADMM state
    warm-carries across SQP iterations and iterations after the first
    run one ``it_rest``-iteration rho segment instead of ``n_seg0``.

    Inputs (all batch-leading, variable space PERMUTED per-player as in
    the ``use_lanes="joint"`` path; n1 = 2N, n1 % 8 == 0):

    * ``Hb`` (B, 2, n1, n1) per-player Hessian blocks
    * ``g`` (B, 2*n1)
    * ``sg`` (B, 2, N, 2, n1): player p's position sensitivity
      ``d p_p[k, c] / d u_p[j]`` in p's own permuted columns
    * ``p0`` (B, 2, N, 2) free-response positions
    * ``obs`` (B, n_obs, 2) keepout centers (same set for both players)
    * ``lo_arena``/``hi_arena`` (B, 2, 2N): arena-box bounds per player,
      ordered [x-rows (N); y-rows (N)]
    * ``lx``/``ux`` (B, 2*n1) input box (implicit rows)
    * ``U0`` (B, 2*n1) first linearization point (NOT an ADMM warm
      start -- the first QP starts cold, matching the multi-launch path)
    * ``d2`` static: squared keepout distance ((2 r)^2)
    """
    B = g.shape[0]
    n1 = Hb.shape[-1]
    if n1 != 2 * N or n1 % 8 != 0:
        raise ValueError(f"need n1 == 2N, n1 % 8 == 0; got n1={n1}, N={N}")
    m_own = 2 * N + n_obs * N
    mo_pad = _rup(m_own, 8)
    mp_pad = _rup(N, 8)
    dtype = jnp.float32
    Bp = _rup(B, TILE)

    def plane(a, rows):
        a2 = a.reshape(B, rows).astype(dtype)
        a2 = jnp.pad(a2, ((0, Bp - B), (0, 0)))
        return a2.T

    # sg plane: per player, per column j, rows [x(k=0..N-1); y(...)]
    # (B, 2, N, 2, n1) [b,p,k,c,j] -> [b,p,j,c,k]
    sg_pl = plane(jnp.swapaxes(sg, 2, 4), 2 * n1 * 2 * N)
    H_pl = plane(jnp.swapaxes(Hb, 2, 3), 2 * n1 * n1)
    g_pl = plane(g, 2 * n1)
    lx_pl = plane(lx, 2 * n1)
    ux_pl = plane(ux, 2 * n1)
    loa_pl = plane(lo_arena, 2 * 2 * N)
    hia_pl = plane(hi_arena, 2 * 2 * N)
    p0_pl = plane(jnp.swapaxes(p0, 2, 3), 2 * 2 * N)
    obs_rows = _rup(2 * n_obs, 8)
    obs_pl = plane(
        jnp.pad(obs.reshape(B, 2 * n_obs),
                ((0, 0), (0, obs_rows - 2 * n_obs))), obs_rows)
    u0_pl = plane(U0, 2 * n1)

    kernel = _make_cmpc_kernel(
        n1, N, n_obs, mo_pad, mp_pad, n_seg0, it0, sqp_rest, it_rest,
        float(sigma), float(alpha), float(tol), float(rho), float(d2))
    lane = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    m1p = mo_pad + mp_pad
    x_p, out_p = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # H (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # sg (HBM)
            lane(2 * n1), lane(2 * n1), lane(2 * n1),
            lane(2 * 2 * N), lane(2 * 2 * N), lane(2 * 2 * N),
            lane(obs_rows), lane(2 * n1),
        ],
        out_specs=(lane(2 * n1), lane(8)),
        out_shape=(jax.ShapeDtypeStruct((2 * n1, Bp), dtype),
                   jax.ShapeDtypeStruct((8, Bp), dtype)),
        scratch_shapes=[pltpu.VMEM((2 * n1 * m1p, TILE), dtype),
                        pltpu.VMEM((2 * n1 * n1, TILE), dtype),
                        pltpu.VMEM((2 * n1 * 2 * N, TILE), dtype),
                        pltpu.VMEM((n1 * n1, TILE), dtype),
                        pltpu.VMEM((n1 * n1, TILE), dtype),
                        pltpu.VMEM((n1 * n1, TILE), dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=(jax.default_backend() == "cpu"),
    )(H_pl, sg_pl, g_pl, lx_pl, ux_pl, loa_pl, hia_pl, p0_pl, obs_pl,
      u0_pl)

    return QpSolution(x=x_p[:, 0:B].T, converged=out_p[0, 0:B] > 0.5,
                      prim_res=out_p[1, 0:B], dual_res=out_p[2, 0:B])
