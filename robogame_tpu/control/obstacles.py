"""Obstacle-avoiding trajectory optimization (NonLinearOptimizer parity).

Capability spec: /root/reference/py/src/NonLinearOptimizer.py.

* ``intercepting_with_obs_avoidance`` (reference 13-57): fixed-T manual
  transcription, quadratic terminal (10 I) + effort cost, nonconvex
  quadratic keep-outs per obstacle, SNOPT.
* ``intercepting_with_obs_avoidance_bb`` (reference 59-109): the same
  problem with big-M axis-separation binaries solved by OSQP branch &
  bound, and terminal *equality*.
* ``min_time_traj_avoid_obs`` (reference 111-158): N=20 collocation with
  the timestep pinned to dt (min == max == dt, reference 119-120, so the
  "min-time" cost is vacuous), terminal error cost I, running cost
  0.1|u|^2, player keep-outs only (the puck keep-out is commented out,
  reference 146-148 -- replicated).

TPU-native design: SNOPT's line-searched SQP becomes a FIXED-iteration SQP:
each outer iteration linearizes every keep-out around the current
trajectory iterate and solves one condensed-horizon QP (ops/qp.py ADMM,
fixed iterations), keeping everything static-shaped and ``vmap``-able.  The
MIQP variant replaces branch & bound with solve-then-fix: run the SQP,
read off each knot's separating side per obstacle from the solution, and
re-solve the QP with those per-knot linear side constraints fixed (an
MIQP-feasible incumbent; exact B&B search is data-dependent control flow
the reference itself only uses on a dead code path,
/root/reference/py/src/ClassicalPlayer.py:78).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SimParams
from ..models.lqsys import condense, exact_ab
from ..ops.qp import f32_matmul, solve_qp
from .trajopt import MAX_TRAJ, Trajectory, _arena_rows

MAX_OBS = 4          # static obstacle slots: teammate + 2 opponents + puck


class _QpParts(NamedTuple):
    H: jax.Array
    g: jax.Array
    A_fix: jax.Array   # fixed rows: input box, arena box [, terminal eq]
    lo_fix: jax.Array
    hi_fix: jax.Array
    phi: jax.Array
    gam: jax.Array
    sel: jax.Array     # (2N, 4N) position selector


def _build_parts(x0, xf, h, params: SimParams, N: int, w_term: float,
                 w_eff: float, terminal_eq: bool):
    dtype = x0.dtype
    A, B = exact_ab(h, params.tau_player, dtype)
    phi, gam = condense(A, B, N)
    nU = 2 * N
    rowN = slice(4 * (N - 1), 4 * N)
    gN = gam[rowN]
    phiN_x0 = phi[rowN] @ x0

    H = 2.0 * (w_eff * jnp.eye(nU, dtype=dtype) + w_term * gN.T @ gN)
    g = 2.0 * w_term * gN.T @ (phiN_x0 - xf)

    sel, plo, phi_hi = _arena_rows(params, N, dtype)
    A_pos = sel @ gam
    off = sel @ (phi @ x0)
    lim = params.input_limit
    A_fix = jnp.concatenate([jnp.eye(nU, dtype=dtype), A_pos], axis=0)
    lo = jnp.concatenate([-lim * jnp.ones(nU, dtype), plo - off])
    hi = jnp.concatenate([lim * jnp.ones(nU, dtype), phi_hi - off])
    if terminal_eq:
        tgt = xf - phiN_x0
        A_fix = jnp.concatenate([A_fix, gN], axis=0)
        lo = jnp.concatenate([lo, tgt])
        hi = jnp.concatenate([hi, tgt])
    return _QpParts(H, g, A_fix, lo, hi, phi, gam, sel)


def _positions(parts: _QpParts, x0, U):
    X = parts.phi @ x0 + parts.gam @ U
    return (parts.sel @ X).reshape(-1, 2)          # (N, 2)


def _keepout_rows(parts: _QpParts, x0, p_bar, obs, obs_r, obs_mask):
    """Linearized keep-outs  |p_k - o|^2 >= r_o^2  around p_bar.

    p_bar: (N, 2); obs: (MAX_OBS, 2); returns (MAX_OBS*N, nU) rows + bounds.
    """
    dtype = x0.dtype
    N = p_bar.shape[0]
    diff = p_bar[None, :, :] - obs[:, None, :]           # (M, N, 2)
    gval = jnp.sum(diff * diff, axis=-1) - obs_r[:, None] ** 2
    # row: 2 diff . p_k >= 2 diff . p_bar - g
    sel_gam = (parts.sel @ parts.gam).reshape(N, 2, -1)  # (N, 2, nU)
    rows = 2.0 * jnp.einsum("mnc,ncu->mnu", diff, sel_gam)
    p0_part = (parts.sel @ (parts.phi @ x0)).reshape(N, 2)
    rhs = (2.0 * jnp.sum(diff * p_bar[None], axis=-1) - gval -
           2.0 * jnp.sum(diff * p0_part[None], axis=-1))
    rows = jnp.where(obs_mask[:, None, None], rows, 0.0)
    lo = jnp.where(obs_mask[:, None], rhs, -1.0)
    hi = jnp.full_like(lo, 1e9)
    hi = jnp.where(obs_mask[:, None], hi, 1.0)
    nU = parts.gam.shape[1]
    return rows.reshape(-1, nU), lo.reshape(-1), hi.reshape(-1)


def _sqp(x0, xf, h, params, N, w_term, w_eff, terminal_eq, obs, obs_r,
         obs_mask, sqp_iters, qp_iters):
    parts = _build_parts(x0, xf, h, params, N, w_term, w_eff, terminal_eq)
    nU = 2 * N
    U = jnp.zeros((nU,), x0.dtype)

    def body(U, _):
        p_bar = _positions(parts, x0, U)
        rows, lo_o, hi_o = _keepout_rows(parts, x0, p_bar, obs, obs_r,
                                         obs_mask)
        A = jnp.concatenate([parts.A_fix, rows], axis=0)
        lo = jnp.concatenate([parts.lo_fix, lo_o])
        hi = jnp.concatenate([parts.hi_fix, hi_o])
        sol = solve_qp(parts.H, parts.g, A, lo, hi, iters=qp_iters,
                       scale_rows=True)
        return sol.x, sol.converged

    U, convs = jax.lax.scan(body, U, None, length=sqp_iters)
    # feasibility: all keep-outs hold at the final iterate (small slack)
    p_fin = _positions(parts, x0, U)
    dist2 = jnp.sum((p_fin[None] - obs[:, None]) ** 2, axis=-1)
    feas = jnp.all(jnp.where(obs_mask[:, None],
                             dist2 >= (obs_r[:, None] - 0.05) ** 2, True))
    return parts, U, convs[-1] & feas


def _pack(U, N, params, success):
    u_pad = jnp.zeros((2, MAX_TRAJ), U.dtype).at[:, :N].set(
        U.reshape(N, 2).T)
    u_pad = jnp.where(success, u_pad, 0.0)
    return Trajectory(u=u_pad,
                      length=jnp.where(success, N, 1).astype(jnp.int32),
                      success=success,
                      T=jnp.asarray(N * params.dt, U.dtype))


def _obs_arrays(obstacles, p_puck, params, dtype, include_puck=True):
    """Pad obstacle list to MAX_OBS with mask; radii per reference:
    players 2r (NonLinearOptimizer.py:186), puck r+r_p-0.2 (193)."""
    obs = jnp.zeros((MAX_OBS, 2), dtype)
    mask = jnp.zeros((MAX_OBS,), bool)
    radii = jnp.zeros((MAX_OBS,), dtype)
    n = 0
    for p in obstacles:
        obs = obs.at[n].set(jnp.asarray(p, dtype))
        mask = mask.at[n].set(True)
        radii = radii.at[n].set(2.0 * params.player_radius)
        n += 1
    if include_puck and p_puck is not None:
        obs = obs.at[n].set(jnp.asarray(p_puck, dtype))
        mask = mask.at[n].set(True)
        radii = radii.at[n].set(params.player_radius +
                                params.puck_radius - 0.2)
    return obs, radii, mask


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "n_steps",
                                             "sqp_iters", "qp_iters"))
def intercepting_with_obs_avoidance(p0, v0, pf, vf, obs, obs_r, obs_mask,
                                    params: SimParams, n_steps: int,
                                    sqp_iters: int = 5,
                                    qp_iters: int = 150) -> Trajectory:
    """Fixed-T kick trajectory avoiding obstacles
    (/root/reference/py/src/NonLinearOptimizer.py:13-57): terminal cost
    10 I, effort cost 1."""
    dtype = jnp.asarray(p0).dtype
    x0 = jnp.concatenate([p0, v0]).astype(dtype)
    xf = jnp.concatenate([pf, vf]).astype(dtype)
    h = jnp.asarray(params.dt, dtype)
    _, U, ok = _sqp(x0, xf, h, params, n_steps, 10.0, 1.0, False, obs,
                    obs_r, obs_mask, sqp_iters, qp_iters)
    return _pack(U, n_steps, params, ok)


def _solve_sides(sides, parts: _QpParts, x0, obs, obs_s, obs_mask,
                 qp_iters: int):
    """Solve the QP with fixed axis-separation sides.  ``sides``: (M, N)
    int32 in {-1 free/disabled, 0: x>=o_x+s, 1: x<=o_x-s, 2: y>=o_y+s,
    3: y<=o_y-s} (the reference's binary assignment,
    /root/reference/py/src/NonLinearOptimizer.py:210-219)."""
    dtype = x0.dtype
    M, N = sides.shape
    sel_gam = (parts.sel @ parts.gam).reshape(N, 2, -1)
    p0_part = (parts.sel @ (parts.phi @ x0)).reshape(N, 2)
    is_x = (sides == 0) | (sides == 1)
    sign = jnp.where((sides == 0) | (sides == 2), 1.0, -1.0).astype(dtype)
    axis = jnp.where(is_x, 0, 1)
    nrm = jax.nn.one_hot(axis, 2, dtype=dtype) * sign[..., None]  # (M,N,2)
    rows = jnp.einsum("mnc,ncu->mnu", nrm, sel_gam)
    # sign*(p_ax - o_ax) >= s  =>  row . U >= s + sign*o_ax - sign*p0_ax
    rhs = (obs_s[:, None] + jnp.sum(nrm * obs[:, None], axis=-1) -
           jnp.sum(nrm * p0_part[None], axis=-1))
    active = (sides >= 0) & obs_mask[:, None]
    rows = jnp.where(active[..., None], rows, 0.0)
    lo_o = jnp.where(active, rhs, -1.0).reshape(-1)
    hi_o = jnp.where(active, 1e9, 1.0).reshape(-1)
    A = jnp.concatenate([parts.A_fix, rows.reshape(-1, 2 * N)], axis=0)
    lo = jnp.concatenate([parts.lo_fix, lo_o])
    hi = jnp.concatenate([parts.hi_fix, hi_o])
    return solve_qp(parts.H, parts.g, A, lo, hi, iters=qp_iters,
                    scale_rows=True)


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "n_steps",
                                             "sqp_iters", "qp_iters"))
def intercepting_with_obs_avoidance_bb(p0, v0, pf, vf, obs, obs_r, obs_mask,
                                       params: SimParams, n_steps: int,
                                       sqp_iters: int = 5,
                                       qp_iters: int = 150) -> Trajectory:
    """Big-M MIQP variant (/root/reference/py/src/NonLinearOptimizer.py:
    59-109): fast jittable incumbent with the reference's terminal
    *equality*.  Races a fixed candidate set of side assignments -- the
    SQP solution's per-knot dominant side, its per-obstacle majority side,
    and the four uniform sides -- one batched QP solve, best feasible
    effort wins.  The *exact* optimum (host-side branch & bound, like the
    reference's MixedIntegerBranchAndBound) is ``control.miqp
    .solve_bb_exact``; tests/test_miqp.py pins this incumbent's
    optimality gap against it."""
    dtype = jnp.asarray(p0).dtype
    x0 = jnp.concatenate([p0, v0]).astype(dtype)
    xf = jnp.concatenate([pf, vf]).astype(dtype)
    h = jnp.asarray(params.dt, dtype)
    N, M = n_steps, obs.shape[0]
    parts, U, _ = _sqp(x0, xf, h, params, N, 10.0, 1.0, True, obs, obs_r,
                       obs_mask, sqp_iters, qp_iters)

    # candidate 0: per-knot dominant separating axis/side from the SQP
    p_bar = _positions(parts, x0, U)                  # (N, 2)
    diff = p_bar[None] - obs[:, None]                 # (M, N, 2)
    axis = jnp.argmax(jnp.abs(diff), axis=-1)         # (M, N) 0=x, 1=y
    sgn_pos = jnp.take_along_axis(diff, axis[..., None], -1)[..., 0] >= 0
    per_knot = jnp.where(axis == 0,
                         jnp.where(sgn_pos, 0, 1),
                         jnp.where(sgn_pos, 2, 3)).astype(jnp.int32)
    # candidate 1: per-obstacle majority side, uniform across knots
    counts = (jax.nn.one_hot(per_knot, 4, dtype=jnp.float32)
              .sum(axis=1))                            # (M, 4)
    majority = jnp.argmax(counts, axis=-1).astype(jnp.int32)
    cand_major = jnp.broadcast_to(majority[:, None], (M, N))
    # candidates 2-5: every obstacle on the same uniform side
    uniform = jnp.broadcast_to(
        jnp.arange(4, dtype=jnp.int32)[:, None, None], (4, M, N))
    # split candidates: side a for knots < j, side b for knots >= j, for
    # every split point and the four axis-crossing (a, b) pairs -- these
    # capture the optimal "cross between two knots" patterns the MIQP's
    # knot-only constraints admit (corner-cutting between samples)
    ks = jnp.arange(N, dtype=jnp.int32)
    pairs = jnp.asarray([[1, 0], [0, 1], [3, 2], [2, 3]], jnp.int32)
    js = jnp.arange(N + 1, dtype=jnp.int32)
    split = jnp.where(ks[None, None, :] < js[None, :, None],
                      pairs[:, 0, None, None], pairs[:, 1, None, None])
    split = split.reshape(4 * (N + 1), 1, N)
    split = jnp.broadcast_to(split, (4 * (N + 1), M, N))
    sides = jnp.concatenate([per_knot[None], cand_major[None], uniform,
                             split], axis=0)          # (6+4(N+1), M, N)

    sols = jax.vmap(lambda s: _solve_sides(s, parts, x0, obs, obs_r,
                                           obs_mask, qp_iters))(sides)
    effort = jnp.einsum("cu,cu->c", sols.x, sols.x)
    score = jnp.where(sols.converged, effort, jnp.inf)
    best = jnp.argmin(score)
    return _pack(sols.x[best], N, params, sols.converged[best])


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "sqp_iters",
                                             "qp_iters"))
def min_time_traj_avoid_obs(p0, v0, pf, vf, obs, obs_r, obs_mask,
                            params: SimParams, sqp_iters: int = 5,
                            qp_iters: int = 400) -> Trajectory:
    """N=20, timestep pinned to dt (the reference's min==max==dt
    collocation, /root/reference/py/src/NonLinearOptimizer.py:117-120),
    terminal cost I, effort 0.1, player keep-outs only."""
    dtype = jnp.asarray(p0).dtype
    x0 = jnp.concatenate([p0, v0]).astype(dtype)
    xf = jnp.concatenate([pf, vf]).astype(dtype)
    h = jnp.asarray(params.dt, dtype)
    N = 20
    # Drake's AddRunningCost integrates over time, so the reference's
    # 0.1|u|^2 running cost contributes 0.1 h |u_k|^2 per knot
    _, U, ok = _sqp(x0, xf, h, params, N, 1.0, 0.1 * params.dt, False,
                    obs, obs_r, obs_mask, sqp_iters, qp_iters)
    return _pack(U, N, params, ok)
