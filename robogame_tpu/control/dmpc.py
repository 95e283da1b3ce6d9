"""Decentralized per-agent MPC (DMPC parity).

Capability spec: /root/reference/py/src/DMPC.py -- per-agent 4-state /
2-input free-final-time DirectCollocation (N = 20 samples, equal
intervals, timestep in [dt/N, 5/N]): terminal quadratic cost Omega_N to
the strategy target (line 24), keep-out constraints vs the other three
players' *current* positions (27-31), input/arena boxes (66-77),
AddFinalCost(time) (38), warm start (40-41), SNOPT; returns the first
input (54).  (The commented-out potential-field consensus algorithm at
DMPC.py:79-123 is dead code and not reproduced.)

The "decentralized" structure is independent solves against frozen
neighbor positions -- no message passing (SURVEY.md 3.3) -- so all four
agents' solves batch perfectly with ``vmap``; on a sharded Monte-Carlo
batch that is games x agents x T-grid candidates of identical condensed
QPs running on the MXU simultaneously.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MpcParams, SimParams
from ..models.lqsys import condense, exact_ab
from ..ops.qp import f32_matmul, solve_qp

N_NEIGHBORS = 3


class DmpcState(NamedTuple):
    """Warm-start carry (DMPC.py:13-14), one per agent."""
    U: jax.Array        # (2 N,)
    valid: jax.Array    # () bool
    h: jax.Array        # () previous winner's per-knot time step


def initial_dmpc_state(mpc: MpcParams, dtype=jnp.float32) -> DmpcState:
    return DmpcState(U=jnp.zeros((2 * mpc.N,), dtype),
                     valid=jnp.asarray(False),
                     h=jnp.zeros((), dtype))


def candidate_steps(minT, maxT, t_grid: int, t_local: int, h_prev, valid,
                    dtype):
    """Hybrid free-final-time candidate grid.

    Cold (no warm-start yet): a ``t_grid``-point geometric grid over
    [minT, maxT] (geometric, not linear: the optimal per-knot step
    shrinks continuously as the target nears, and a linear grid leaves
    gaps at short horizons that make the closed loop procrastinate).

    Warm: the last ``t_local`` candidates are re-centered on the previous
    winner's time step (x0.7 .. x1.6, clipped to the bounds), while the
    remaining candidates keep spanning the full global range for play
    switches.  This mirrors the reference's warm-started free-final-time
    NLP (/root/reference/py/src/CentralizedMPC.py:57-58 hands SNOPT the
    previous trajectory, which warm-starts its timestep variable too):
    after the first solve the free-time search is local refinement, not
    a global scan, which is what lets ``t_grid`` stay small."""
    n_local = min(t_local, t_grid // 2)
    ratio = jnp.logspace(0.0, 1.0, t_grid, base=maxT / minT)
    glob = (minT * ratio).astype(dtype)
    if n_local == 0:
        return glob
    keep = np.round(np.linspace(0, t_grid - 1,
                                t_grid - n_local)).astype(int)
    # the incumbent (factor 1.0) is always a candidate, so a repeat solve
    # of an unchanged problem keeps its winner instead of oscillating
    # along the (nearly flat) free-time cost valley
    factors = np.concatenate([[1.0], np.geomspace(0.7, 1.5,
                                                  n_local - 1)]) \
        if n_local > 1 else np.asarray([1.0])
    local = h_prev * jnp.asarray(factors, dtype)
    local = jnp.clip(local, minT, maxT).astype(dtype)
    warm = jnp.concatenate([glob[keep], local])
    return jnp.where(valid, warm, glob)


class QpPieces(NamedTuple):
    """Per-candidate condensed-QP data that does not depend on the SQP
    iterate (built once per (h, x0, x_des, obs) instance)."""
    H: jax.Array          # (nU, nU)
    g: jax.Array          # (nU,)
    A_fix: jax.Array      # (nU + 2N, nU) input box + arena rows
    lo_fix: jax.Array
    hi_fix: jax.Array
    sg: jax.Array         # (N, 2, nU) position rows of Gamma
    p0p: jax.Array        # (N, 2) free-response positions
    phi_x0: jax.Array     # (4N,)
    gam: jax.Array        # (4N, nU)
    gN: jax.Array         # (4, nU)
    phiN_x0: jax.Array    # (4,)
    obs: jax.Array        # (3, 2)
    x_des: jax.Array      # (4,)
    h: jax.Array          # ()


def _prepare(h, x0, x_des, obs, params: SimParams, mpc: MpcParams):
    dtype = x0.dtype
    N = mpc.N
    A, B = exact_ab(h, params.tau_player, dtype)
    phi, gam = condense(A, B, N)
    nU = 2 * N

    Omega = jnp.diag(jnp.asarray([mpc.w_pos, mpc.w_pos, mpc.w_vel,
                                  mpc.w_vel], dtype))
    rowN = slice(4 * (N - 1), 4 * N)
    gN = gam[rowN]
    phiN_x0 = phi[rowN] @ x0
    H = 2.0 * (gN.T @ Omega @ gN + mpc.u_reg * jnp.eye(nU, dtype=dtype))
    g = 2.0 * gN.T @ Omega @ (phiN_x0 - x_des)

    # position "selector": rows 4k+{0,1} of the stacked state -- a pure
    # reshape/slice, not a selector-matrix matmul (free at trace time and
    # on the MXU)
    pos_rows = lambda M: M.reshape(N, 4, -1)[:, 0:2].reshape(2 * N, -1)
    phi_x0 = phi @ x0
    lim = params.input_limit
    r = params.player_radius
    box = jnp.tile(jnp.asarray([params.arena_x / 2.0 - r,
                                params.arena_y / 2.0 - r], dtype), N)
    sel_gam = pos_rows(gam)
    off = pos_rows(phi_x0)[:, 0]
    A_fix = jnp.concatenate([jnp.eye(nU, dtype=dtype), sel_gam], axis=0)
    lo_fix = jnp.concatenate([-lim * jnp.ones(nU, dtype), -box - off])
    hi_fix = jnp.concatenate([lim * jnp.ones(nU, dtype), box - off])
    return QpPieces(H=H, g=g, A_fix=A_fix, lo_fix=lo_fix, hi_fix=hi_fix,
                    sg=sel_gam.reshape(N, 2, nU), p0p=off.reshape(N, 2),
                    phi_x0=phi_x0, gam=gam, gN=gN, phiN_x0=phiN_x0,
                    obs=obs, x_des=x_des, h=h)


class FusedPieces(NamedTuple):
    """The subset of ``QpPieces`` the fused-kernel path consumes, built
    by ``_prepare_fused`` from closed forms (no condense scan, no small
    batched matmuls -- measured 6.8 ms of a 15.3 ms production
    ``compute_control_batch`` call was the generic ``_prepare``)."""
    H: jax.Array
    g: jax.Array
    lo_fix: jax.Array
    hi_fix: jax.Array
    sg: jax.Array
    p0p: jax.Array
    gN: jax.Array
    phiN_x0: jax.Array
    obs: jax.Array
    x_des: jax.Array
    h: jax.Array


def _gains(h, tau, N: int, dtype):
    """Closed-form condensed gains of the exact-ZOH player model
    (models/lqsys.exact_ab), per axis.

    ``A^m B`` per axis is ``[P[m]; V[m]]`` with
    ``P[m] = (h - s) + tau (1 - e^m)(1 - e)``, ``V[m] = e^m (1 - e)``,
    ``e = exp(-h/tau)``, ``s = tau (1 - e)``; the free response at knot
    k uses ``s_k = tau (1 - e^k)``, ``e_k = e^k``.  Everything is
    elementwise in h -- the condense() scan of (4, 4) matmuls and the
    Gamma gather become broadcast arithmetic, which is what lets the
    per-candidate QP data build at XLA speed instead of one padded MXU
    dispatch per tiny matmul (BASELINE.md "batched small linear
    algebra")."""
    m = jnp.arange(N, dtype=dtype)
    e1 = jnp.exp(-h / tau)
    em = jnp.exp(-(m * h) / tau)           # e^m, m = 0..N-1
    ek = em * e1                           # e^k, k = 1..N
    s1 = tau * (1.0 - e1)
    P = (h - s1) + tau * (1.0 - em) * (1.0 - e1)
    V = em * (1.0 - e1)
    sk = tau * (1.0 - ek)
    return P, V, sk, ek


def _prepare_fused(h, x0, x_des, obs, params: SimParams, mpc: MpcParams):
    """Closed-form equivalent of ``_prepare`` restricted to the fields
    the fused SQP kernel and ``_finish`` consume.  Numerically equal to
    ``_prepare`` up to f32 round-off (pinned by
    tests/test_dmpc_fused.py::test_prepare_fused_matches_generic)."""
    dtype = x0.dtype
    N = mpc.N
    nU = 2 * N
    P, V, sk, ek = _gains(h, params.tau_player, N, dtype)
    Pt = P[::-1]                           # index j: P[N-1-j]
    Vt = V[::-1]
    eye2 = jnp.eye(2, dtype=dtype)

    # H = 2 (gN^T Omega gN + reg I): axis-decoupled rank-2 structure
    Hs = 2.0 * (mpc.w_pos * jnp.outer(Pt, Pt) +
                mpc.w_vel * jnp.outer(Vt, Vt))            # (N, N)
    H = (Hs[:, None, :, None] * eye2[None, :, None, :]).reshape(nU, nU) \
        + 2.0 * mpc.u_reg * jnp.eye(nU, dtype=dtype)

    p0c, v0c = x0[0:2], x0[2:4]
    pos_free = p0c[None, :] + sk[:, None] * v0c[None, :]  # (N, 2)
    velN = ek[-1] * v0c
    phiN_x0 = jnp.concatenate([pos_free[-1], velN])
    errp = pos_free[-1] - x_des[0:2]
    errv = velN - x_des[2:4]
    g = (2.0 * (mpc.w_pos * Pt[:, None] * errp[None, :] +
                mpc.w_vel * Vt[:, None] * errv[None, :])).reshape(nU)

    # sg[k, c, 2j+c'] = P[k-j] delta_cc' for j <= k (row k = knot k+1)
    d = jnp.arange(N)[:, None] - jnp.arange(N)[None, :]
    M = jnp.where(d >= 0, P[jnp.clip(d, 0, N - 1)], 0.0)  # (N, N)
    sg = (M[:, None, :, None] * eye2[None, :, None, :]).reshape(N, 2, nU)

    gN = jnp.concatenate([
        jnp.transpose(Pt[:, None, None] * eye2, (1, 0, 2)).reshape(2, nU),
        jnp.transpose(Vt[:, None, None] * eye2, (1, 0, 2)).reshape(2, nU),
    ], axis=0)                                            # (4, nU)

    lim = params.input_limit
    r = params.player_radius
    box = jnp.tile(jnp.asarray([params.arena_x / 2.0 - r,
                                params.arena_y / 2.0 - r], dtype), N)
    off = pos_free.reshape(-1)             # interleaved [x_1, y_1, ...]
    lo_fix = jnp.concatenate([-lim * jnp.ones(nU, dtype), -box - off])
    hi_fix = jnp.concatenate([lim * jnp.ones(nU, dtype), box - off])
    return FusedPieces(H=H, g=g, lo_fix=lo_fix, hi_fix=hi_fix, sg=sg,
                       p0p=pos_free, gN=gN, phiN_x0=phiN_x0, obs=obs,
                       x_des=x_des, h=h)


def _keepout(U, prep: QpPieces, params: SimParams, mpc: MpcParams):
    """Linearized keep-out rows vs the other 3 players' frozen positions
    (DMPC.py:27-31) at the current SQP iterate."""
    N = mpc.N
    nU = 2 * N
    d2 = (2.0 * params.player_radius) ** 2
    p_bar = (prep.phi_x0 + prep.gam @ U).reshape(N, 4)[:, 0:2]
    diff = p_bar[None] - prep.obs[:, None]              # (3, N, 2)
    gval = jnp.sum(diff * diff, -1) - d2
    rows = 2.0 * jnp.einsum("mnc,ncu->mnu", diff, prep.sg).reshape(-1, nU)
    rhs = (2.0 * jnp.sum(diff * p_bar[None], -1) - gval -
           2.0 * jnp.sum(diff * prep.p0p[None], -1)).reshape(-1)
    return rows, rhs


def _finish(U, prep: QpPieces, params: SimParams, mpc: MpcParams):
    """Box projection + candidate cost (terminal + final-time)."""
    dtype = U.dtype
    Omega = jnp.diag(jnp.asarray([mpc.w_pos, mpc.w_pos, mpc.w_vel,
                                  mpc.w_vel], dtype))
    U = jnp.clip(U, -params.input_limit, params.input_limit)
    xN = prep.phiN_x0 + prep.gN @ U
    err = xN - prep.x_des
    cost = err @ Omega @ err + mpc.N * prep.h
    return U, cost


def _solve_candidate(h, x0, x_des, obs, params: SimParams, mpc: MpcParams,
                     U0):
    dtype = x0.dtype
    prep = _prepare(h, x0, x_des, obs, params, mpc)

    def sqp_body(U, _):
        rows, rhs = _keepout(U, prep, params, mpc)
        A_all = jnp.concatenate([prep.A_fix, rows], axis=0)
        lo = jnp.concatenate([prep.lo_fix, rhs])
        hi = jnp.concatenate([prep.hi_fix,
                              jnp.full(rhs.shape, 1e9, dtype)])
        sol = solve_qp(prep.H, prep.g, A_all, lo, hi, iters=mpc.qp_iters,
                       scale_rows=True)
        return sol.x, sol.converged

    U, convs = jax.lax.scan(sqp_body, U0, None, length=mpc.sqp_iters)
    U, cost = _finish(U, prep, params, mpc)
    return U, cost, convs[-1]


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "mpc"))
def compute_control(state: DmpcState, x0, x_des, obstacles,
                    params: SimParams, mpc: MpcParams):
    """Equivalent of ``DMPC.compute_control``
    (/root/reference/py/src/DMPC.py:16-54).

    x0 (4,), x_des (4,), obstacles (3, 2).  Returns (new state, u (2,)).
    """
    dtype = jnp.asarray(x0).dtype
    obs = jnp.asarray(obstacles, dtype).reshape(N_NEIGHBORS, 2)
    minT = params.dt * mpc.minT_frac / mpc.N
    maxT = 5.0 / mpc.N                         # DMPCTeam.py:38
    hs = candidate_steps(minT, maxT, mpc.t_grid, mpc.t_local, state.h,
                         state.valid, dtype)

    U0 = jnp.where(state.valid, state.U, 0.0)
    Us, costs, convs = jax.vmap(
        lambda h: _solve_candidate(h, jnp.asarray(x0, dtype),
                                   jnp.asarray(x_des, dtype), obs, params,
                                   mpc, U0))(hs)
    costs = jnp.where(convs, costs, costs + 1e9)
    k = jnp.argmin(costs)
    U, ok = Us[k], convs[k]
    new_state = DmpcState(U=jnp.where(ok, U, state.U),
                          valid=ok | state.valid,
                          h=jnp.where(ok, hs[k], state.h))
    return new_state, U[0:2]


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "mpc",
                                             "use_lanes"))
def compute_control_batch(state: DmpcState, x0, x_des, obstacles,
                          params: SimParams, mpc: MpcParams,
                          use_lanes: bool | str | None = None):
    """Batched ``compute_control``: every argument carries a leading
    instance axis Bq (e.g. games x agents).  All Bq * t_grid candidate
    QPs are flattened into ONE lanes-batched Pallas solve per SQP
    iteration (ops.qp_pallas.solve_qp_lanes), which is how the solver
    reaches throughput on TPU -- XLA executes vmapped small-matrix
    factorizations one padded MXU dispatch per instance (see
    BASELINE.md), while the lanes kernel advances 128 problems per slab
    op.

    ``use_lanes``: ``"fused"`` runs the ENTIRE SQP loop (relinearization
    + all QP solves, ADMM warm-carried across SQP iterations) inside one
    Pallas kernel (ops.sqp_pallas.solve_dmpc_sqp_lanes -- the fastest
    path); ``True`` multi-launches the dense lanes kernel per SQP
    iteration; ``False`` the vmapped XLA solver.  ``None`` auto-selects
    on TPU: fused if it fits, else dense lanes, else XLA (CPU interpret
    mode is orders of magnitude slower than XLA on CPU)."""
    dtype = jnp.asarray(x0).dtype
    Bq = x0.shape[0]
    T = mpc.t_grid
    nU = 2 * mpc.N
    n_rows = nU + 2 * mpc.N + N_NEIGHBORS * mpc.N
    if use_lanes is None:
        from ..ops.qp_pallas import fits_vmem
        from ..ops.sqp_pallas import fits_vmem_dmpc_fused
        if jax.default_backend() != "tpu":
            use_lanes = False
        elif nU % 8 == 0 and fits_vmem_dmpc_fused(nU, mpc.N, N_NEIGHBORS):
            use_lanes = "fused"
        else:
            use_lanes = fits_vmem(nU, n_rows)

    obs = jnp.asarray(obstacles, dtype).reshape(Bq, N_NEIGHBORS, 2)
    minT = params.dt * mpc.minT_frac / mpc.N
    maxT = 5.0 / mpc.N
    hs = jax.vmap(lambda h, v: candidate_steps(
        minT, maxT, T, mpc.t_local, h, v, dtype))(state.h, state.valid)

    rep = lambda a: jnp.repeat(a, T, axis=0)
    prep_fn = _prepare_fused if use_lanes == "fused" else _prepare
    prep = jax.vmap(lambda h, x, xd, o: prep_fn(h, x, xd, o, params,
                                                mpc))(
        hs.reshape(-1), rep(x0.astype(dtype)), rep(x_des.astype(dtype)),
        rep(obs))

    U0 = jnp.where(state.valid[:, None], state.U, 0.0).astype(dtype)
    U = rep(U0)
    conv = jnp.zeros((Bq * T,), bool)
    big = jnp.full((Bq * T, 3 * mpc.N), 1e9, dtype)

    if use_lanes == "fused":
        from ..ops.sqp_pallas import solve_dmpc_sqp_lanes
        # arena bounds from interleaved [x_0, y_0, x_1, y_1, ...] rows to
        # the kernel's xy-blocked [x (N); y (N)] order
        xy_blocked = lambda a: jnp.swapaxes(
            a.reshape(-1, mpc.N, 2), 1, 2).reshape(-1, 2 * mpc.N)
        sol = solve_dmpc_sqp_lanes(
            prep.H, prep.g, prep.sg, prep.p0p, prep.obs,
            xy_blocked(prep.lo_fix[:, nU:]),
            xy_blocked(prep.hi_fix[:, nU:]),
            prep.lo_fix[:, :nU], prep.hi_fix[:, :nU], U,
            N=mpc.N, n_obs=N_NEIGHBORS, n_seg0=4,
            it0=max(1, mpc.qp_iters // 4), sqp_rest=mpc.sqp_iters - 1,
            it_rest=mpc.warm_qp_iters,
            d2=float((2.0 * params.player_radius) ** 2))
        U, conv = sol.x.astype(dtype), sol.converged

    for _ in range(mpc.sqp_iters if use_lanes != "fused" else 0):
        rows, rhs = jax.vmap(lambda u, p: _keepout(u, p, params, mpc))(
            U, prep)
        A_all = jnp.concatenate([prep.A_fix, rows], axis=1)
        lo = jnp.concatenate([prep.lo_fix, rhs], axis=1)
        hi = jnp.concatenate([prep.hi_fix, big], axis=1)
        if use_lanes:
            from ..ops.qp_pallas import solve_qp_lanes
            sol = solve_qp_lanes(prep.H, prep.g, A_all, lo, hi,
                                 iters=mpc.qp_iters, scale_rows=True)
        else:
            sol = jax.vmap(lambda H, g, A, l, u: solve_qp(
                H, g, A, l, u, iters=mpc.qp_iters, scale_rows=True))(
                prep.H, prep.g, A_all, lo, hi)
        U, conv = sol.x.astype(dtype), sol.converged

    U, costs = jax.vmap(lambda u, p: _finish(u, p, params, mpc))(U, prep)
    costs = jnp.where(conv, costs, costs + 1e9).reshape(Bq, T)
    U = U.reshape(Bq, T, nU)
    conv = conv.reshape(Bq, T)
    k = jnp.argmin(costs, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, k.reshape(Bq, *([1] * (a.ndim - 1))), axis=1)[:, 0]
    U_w = take(U)
    ok = take(conv)
    h_w = jnp.take_along_axis(hs, k[:, None], axis=1)[:, 0]
    new_state = DmpcState(U=jnp.where(ok[:, None], U_w, state.U),
                          valid=ok | state.valid,
                          h=jnp.where(ok, h_w, state.h))
    return new_state, U_w[:, 0:2]
