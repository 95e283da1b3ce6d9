"""Trajectory optimization for a single player (LinearOptimizer parity).

Replaces Drake DirectTranscription / DirectCollocation + SNOPT
(/root/reference/py/src/LinearOptimizer.py) with TPU-native batched solvers:

* ``intercepting_traj``     -- fixed-T, terminal-equality, min-effort QP
                               (reference lines 19-41)
* ``min_time_traj``         -- free-final-time: a parallel grid of K
                               candidate final times, one condensed QP each,
                               argmin of the reference's soft objective
                               10*|x_N - xf|^2 + T (reference lines 142-182)
* ``min_time_bounce_kick_traj`` -- terminal state from the elastic-collision
                               reset map, then a fixed-T feasibility QP
                               (reference lines 67-86, 125-140)

Everything is fixed-shape and jittable; a trajectory is always a padded
(2, MAX_TRAJ) array plus a length, so thousands of player instances batch
with ``vmap``.  Free final time is handled by *parallel enumeration* over a
static T-grid instead of an NLP line search: all K condensed QPs solve
simultaneously on the MXU, and ties resolve toward the smallest cost --
deterministic, branch-free, and typically faster than one SNOPT solve.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimParams
from ..models.lqsys import condense, exact_ab
from ..ops.qp import f32_matmul, solve_qp

# Solver-grid constants (mirror the reference's N=15 knots, T in [dt, 5];
# LinearOptimizer.py:147-149)
N_KNOTS = 15
T_MAX = 5.0
T_GRID = 16
MAX_TRAJ = 100        # ceil(T_MAX / dt) at dt=0.05


class Trajectory(NamedTuple):
    u: jax.Array          # (2, MAX_TRAJ) padded control sequence at dt
    length: jax.Array     # () int32 valid entries
    success: jax.Array    # () bool
    T: jax.Array          # () chosen final time


def _arena_rows(params: SimParams, N: int, dtype):
    """Inequality rows selecting the position components of the stacked
    state X (N*4,) with arena bounds (LinearOptimizer.py:190-195)."""
    sel = jnp.zeros((2 * N, 4 * N), dtype)
    for k in range(N):
        sel = sel.at[2 * k, 4 * k].set(1.0)
        sel = sel.at[2 * k + 1, 4 * k + 1].set(1.0)
    r = params.player_radius
    hx = params.arena_x / 2.0 - r
    hy = params.arena_y / 2.0 - r
    lo = jnp.tile(jnp.asarray([-hx, -hy], dtype), N)
    hi = jnp.tile(jnp.asarray([hx, hy], dtype), N)
    return sel, lo, hi


def _fixed_T_qp(x0, xf, h, params: SimParams, N: int,
                w_terminal: float, w_effort: float,
                terminal_eq: bool, qp_iters: int):
    """Condensed horizon QP for one candidate step length h.

    min  w_eff |U|^2 + w_term |x_N - xf|^2   (or x_N == xf as equality)
    s.t. |u| <= input_limit (box), arena box on every knot.
    Returns (U (N,2), x_N, converged).
    """
    dtype = x0.dtype
    A, B = exact_ab(h, params.tau_player, dtype)
    phi, gam = condense(A, B, N)             # X = phi x0 + gam U
    nU = 2 * N

    rowN = slice(4 * (N - 1), 4 * N)
    gN = gam[rowN]                            # (4, nU)
    phiN_x0 = phi[rowN] @ x0                  # (4,)

    H = 2.0 * (w_effort * jnp.eye(nU, dtype=dtype) +
               w_terminal * gN.T @ gN)
    g = 2.0 * w_terminal * gN.T @ (phiN_x0 - xf)

    sel, plo, phi_hi = _arena_rows(params, N, dtype)
    A_pos = sel @ gam                         # (2N, nU)
    off = sel @ (phi @ x0)
    lim = params.input_limit

    A_in = jnp.concatenate([jnp.eye(nU, dtype=dtype), A_pos], axis=0)
    lo = jnp.concatenate([-lim * jnp.ones(nU, dtype), plo - off])
    hi = jnp.concatenate([lim * jnp.ones(nU, dtype), phi_hi - off])
    if terminal_eq:
        A_in = jnp.concatenate([A_in, gN], axis=0)
        tgt = xf - phiN_x0
        lo = jnp.concatenate([lo, tgt])
        hi = jnp.concatenate([hi, tgt])

    sol = solve_qp(H, g, A_in, lo, hi, iters=qp_iters)
    # project out residual ADMM box violation (exact, cheap)
    U = jnp.clip(sol.x.reshape(N, 2), -lim, lim)
    xN = phiN_x0 + gN @ U.reshape(-1)
    return U, xN, sol.converged


def _resample(U, h, dt, T):
    """Resample a piecewise-constant (N,2) control at dt into the padded
    playback buffer (reference resamples its collocation input trajectory
    at dt, LinearOptimizer.py:171-181)."""
    dtype = U.dtype
    n_out = jnp.maximum(1, jnp.floor(T / dt)).astype(jnp.int32)
    t_out = jnp.arange(MAX_TRAJ, dtype=dtype) * dt
    idx = jnp.clip((t_out / h).astype(jnp.int32), 0, U.shape[0] - 1)
    u_full = U[idx]                                   # (MAX_TRAJ, 2)
    mask = (jnp.arange(MAX_TRAJ) < n_out)[:, None]
    return jnp.where(mask, u_full, 0.0).T, n_out      # (2, MAX_TRAJ)


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "qp_iters"))
def min_time_traj(p0, v0, pf, vf, params: SimParams,
                  qp_iters: int = 60) -> Trajectory:
    """Free-final-time reach: parallel T-grid of condensed QPs, argmin of
    10|x_N - xf|^2 + T (the reference's DirectCollocation objective,
    LinearOptimizer.py:161-162)."""
    dtype = jnp.asarray(p0).dtype
    x0 = jnp.concatenate([p0, v0]).astype(dtype)
    xf = jnp.concatenate([pf, vf]).astype(dtype)

    # geometric spacing: dense at short horizons, where min-time plans for
    # nearby targets live (see control/dmpc.py on linear-grid gaps)
    Ts = (params.dt * jnp.logspace(0.0, 1.0, T_GRID,
                                   base=T_MAX / params.dt)).astype(dtype)
    hs = Ts / N_KNOTS

    def solve_one(h):
        return _fixed_T_qp(x0, xf, h, params, N_KNOTS, 10.0, 1e-3,
                           False, qp_iters)

    Us, xNs, convs = jax.vmap(solve_one)(hs)
    costs = 10.0 * jnp.sum((xNs - xf) ** 2, axis=-1) + Ts
    costs = jnp.where(convs, costs, costs + 1e6)
    k = jnp.argmin(costs)
    U, T, h = Us[k], Ts[k], hs[k]
    success = convs[k]
    u_pad, n = _resample(U, h, params.dt, T)
    u_pad = jnp.where(success, u_pad, 0.0)
    return Trajectory(u=u_pad, length=jnp.where(success, n, 1),
                      success=success, T=T)


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "qp_iters",
                                             "use_lanes"))
def min_time_traj_batch(p0, v0, pf, vf, params: SimParams,
                        qp_iters: int = 60,
                        use_lanes: bool | None = None) -> Trajectory:
    """Batched :func:`min_time_traj`: (B, 2) inputs, Trajectory with
    (B, ...) leaves.

    All B x T_GRID candidate condensed QPs solve in ONE lanes-kernel
    launch on TPU (``ops.qp_pallas.solve_qp_lanes``) instead of B x
    T_GRID separate padded MXU dispatches (the vmapped-XLA
    batched-small-matmul pathology, NOTES.md r2) -- this is what makes
    the batched classical team (the reference's run_sim flagship, 5
    candidate skills x T_GRID QPs per game per control step) fast at
    matchup scale.  The per-candidate H / A_in / condensation matrices
    depend only on the static T grid, so they are trace-time constants
    broadcast across games; only g and the box offsets are per-game.
    Matches :func:`min_time_traj` (same solver family; argmin
    tie-breaks can differ at solver roundoff --
    tests/test_agents.py::test_classical_batch_matches_vmapped)."""
    dtype = jnp.asarray(p0).dtype
    B = p0.shape[0]
    x0 = jnp.concatenate([p0, v0], axis=1).astype(dtype)     # (B, 4)
    xf = jnp.concatenate([pf, vf], axis=1).astype(dtype)
    N = N_KNOTS
    nU = 2 * N
    w_terminal, w_effort = 10.0, 1e-3
    lim = params.input_limit

    Ts_np = params.dt * np.logspace(0.0, 1.0, T_GRID,
                                    base=T_MAX / params.dt)
    sel, plo, phi_hi = _arena_rows(params, N, dtype)
    H_ks, Ain_ks, gN_ks, phiN_ks, selphi_ks = [], [], [], [], []
    for h in Ts_np / N_KNOTS:
        A, Bm = exact_ab(float(h), params.tau_player, dtype)
        phi, gam = condense(A, Bm, N)
        rowN = slice(4 * (N - 1), 4 * N)
        gN = gam[rowN]
        H_ks.append(2.0 * (w_effort * jnp.eye(nU, dtype=dtype) +
                           w_terminal * gN.T @ gN))
        Ain_ks.append(jnp.concatenate(
            [jnp.eye(nU, dtype=dtype), sel @ gam], axis=0))
        gN_ks.append(gN)
        phiN_ks.append(phi[rowN])
        selphi_ks.append(sel @ phi)
    H_k = jnp.stack(H_ks)                     # (K, nU, nU)
    Ain_k = jnp.stack(Ain_ks)                 # (K, m, nU)
    gN_k = jnp.stack(gN_ks)                   # (K, 4, nU)
    phiN_k = jnp.stack(phiN_ks)               # (K, 4, 4)
    selphi_k = jnp.stack(selphi_ks)           # (K, 2N, 4)
    K = T_GRID
    m = Ain_k.shape[1]

    phiN_x0 = jnp.einsum("kij,bj->kbi", phiN_k, x0)          # (K, B, 4)
    g = 2.0 * w_terminal * jnp.einsum("kin,kbi->kbn", gN_k,
                                      phiN_x0 - xf[None])    # (K, B, nU)
    off = jnp.einsum("krj,bj->kbr", selphi_k, x0)            # (K, B, 2N)
    lo = jnp.concatenate(
        [jnp.broadcast_to(-lim * jnp.ones(nU, dtype), (K, B, nU)),
         plo[None, None] - off], axis=-1)                    # (K, B, m)
    hi = jnp.concatenate(
        [jnp.broadcast_to(lim * jnp.ones(nU, dtype), (K, B, nU)),
         phi_hi[None, None] - off], axis=-1)

    H_all = jnp.broadcast_to(H_k[:, None], (K, B, nU, nU))
    A_all = jnp.broadcast_to(Ain_k[:, None], (K, B, m, nU))
    flat = lambda a: a.reshape((K * B,) + a.shape[2:])

    if use_lanes is None:
        from ..ops.qp_pallas import fits_vmem
        use_lanes = (jax.default_backend() == "tpu"
                     and fits_vmem(nU, m))
    if use_lanes:
        from ..ops.qp_pallas import solve_qp_lanes
        sol = solve_qp_lanes(flat(H_all), flat(g), flat(A_all),
                             flat(lo), flat(hi), iters=qp_iters)
    else:
        from ..ops.qp import solve_qp_batch
        sol = solve_qp_batch(flat(H_all), flat(g), flat(A_all),
                             flat(lo), flat(hi), iters=qp_iters)

    U = jnp.clip(sol.x.reshape(K, B, N, 2), -lim, lim)
    xN = phiN_x0 + jnp.einsum("kin,kbn->kbi", gN_k,
                              U.reshape(K, B, nU))
    Ts = jnp.asarray(Ts_np, dtype)
    costs = (10.0 * jnp.sum((xN - xf[None]) ** 2, axis=-1)
             + Ts[:, None])                                  # (K, B)
    conv = sol.converged.reshape(K, B)
    costs = jnp.where(conv, costs, costs + 1e6)
    kbest = jnp.argmin(costs, axis=0)                        # (B,)
    bi = jnp.arange(B)
    U_b = U[kbest, bi]                                       # (B, N, 2)
    T_b = Ts[kbest]
    h_b = T_b / N_KNOTS
    success = conv[kbest, bi]
    u_pad, n_len = jax.vmap(
        lambda Uu, hh, TT: _resample(Uu, hh, params.dt, TT))(U_b, h_b, T_b)
    u_pad = jnp.where(success[:, None, None], u_pad, 0.0)
    return Trajectory(u=u_pad,
                      length=jnp.where(success, n_len, 1),
                      success=success, T=T_b)


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "n_steps",
                                             "qp_iters"))
def intercepting_traj(p0, v0, pf, vf, params: SimParams, n_steps: int,
                      qp_iters: int = 80) -> Trajectory:
    """Fixed-T trajectory with terminal equality and min-effort cost
    (LinearOptimizer.py:19-41; reference uses the Euler-discretized model
    inside DirectTranscription -- we use the exact ZOH model at the same
    dt grid, which the physics engine integrates exactly)."""
    dtype = jnp.asarray(p0).dtype
    x0 = jnp.concatenate([p0, v0]).astype(dtype)
    xf = jnp.concatenate([pf, vf]).astype(dtype)
    N = n_steps
    h = jnp.asarray(params.dt, dtype)
    U, xN, conv = _fixed_T_qp(x0, xf, h, params, N, 0.0, 1.0, True,
                              qp_iters)
    u_pad = jnp.zeros((2, MAX_TRAJ), dtype).at[:, :N].set(U.T)
    u_pad = jnp.where(conv, u_pad, 0.0)
    return Trajectory(u=u_pad,
                      length=jnp.where(conv, N, 1).astype(jnp.int32),
                      success=conv, T=h * N)


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "qp_iters"))
def min_time_bounce_kick_traj(p0, v0, p0_puck, v0_puck, v_puck_desired,
                              params: SimParams,
                              qp_iters: int = 80) -> Trajectory:
    """Reach the kick point with a final velocity that imparts
    ``v_puck_desired`` through the elastic reset map
    (LinearOptimizer.py:125-140).  With the kick point placed along the
    desired direction, the reset map pins only the component of the
    player's final velocity along the contact normal; the tangential
    component is chosen zero (the reference's SNOPT feasibility solve
    leaves it unconstrained)."""
    dtype = jnp.asarray(p0).dtype
    m1, m2 = params.player_mass, params.puck_mass
    vd = v_puck_desired.astype(dtype)
    nrm = jnp.linalg.norm(vd)
    dirn = vd / jnp.where(nrm > 0, nrm, 1.0)
    pf = p0_puck - dirn * (params.puck_radius + params.player_radius)

    nvec = p0_puck - pf                      # contact normal (unnormalized)
    nn = jnp.sum(nvec * nvec)
    c = 2.0 * m1 / (m1 + m2)
    # v_after = v2 - c ((v2 - v1)·n / |n|^2) n  == vd
    # component along n:  (vd - v2)·n = c (v1 - v2)·n  ->  v1·n
    v1_dot_n = (jnp.sum((vd - v0_puck) * nvec) / c +
                jnp.sum(v0_puck * nvec))
    v1 = (v1_dot_n / nn) * nvec              # tangential component = 0
    T = jnp.asarray(1.0, dtype)              # reference uses T = 1
    N = 20
    h = T / N
    x0 = jnp.concatenate([p0, v0]).astype(dtype)
    xf = jnp.concatenate([pf, v1])
    U, xN, conv = _fixed_T_qp(x0, xf, h, params, N, 0.0, 1.0, True,
                              qp_iters)
    u_pad, n = _resample(U, h, params.dt, T)
    u_pad = jnp.where(conv, u_pad, 0.0)
    return Trajectory(u=u_pad, length=jnp.where(conv, n, 1),
                      success=conv, T=T)
