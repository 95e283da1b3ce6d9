"""Centralized two-player MPC (CentralizedMPC parity).

Capability spec: /root/reference/py/src/CentralizedMPC.py -- a joint
8-state / 4-input free-final-time DirectCollocation (N+1 = 21 samples,
equal intervals, timestep in [dt/(N+1), 4 dt]): terminal quadratic cost
diag(Omega, Omega) to both players' target states (lines 24-27), keep-out
constraints of both players vs every obstacle and vs each other (31-38),
input/arena boxes (41-53), AddFinalCost(time) (55), warm start from the
previous solve (57-58), SNOPT; returns the first input pair (69-72).

TPU-native design: free final time becomes a static grid of candidate
per-knot steps h -- each candidate solves a condensed-horizon SQP with
linearized keep-outs (fixed iteration counts), all candidates in parallel
under ``vmap``; the winner minimizes  terminal_cost + N h  (the
collocation objective).  Warm starting carries the previous winner's U
into every candidate's first SQP iterate, mirroring SetInitialTrajectory.
A per-agent-block KKT view of the joint QP reduces across the agent axis
with ICI collectives when sharded (BASELINE.json north star); at 2 agents
the dense joint solve is fastest on one chip and is what ships here.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MpcParams, SimParams
from ..models.lqsys import condense, exact_ab
from ..ops.qp import f32_matmul, solve_qp
from .dmpc import candidate_steps

N_OBS = 2     # obstacles: the two opposing players (CentralizedPlayers.py:109-113)


class CmpcState(NamedTuple):
    """Warm-start carry (mirrors prev_u/prev_x,
    /root/reference/py/src/CentralizedMPC.py:12-15)."""
    U: jax.Array        # (4 N,) previous solution
    valid: jax.Array    # () bool
    h: jax.Array        # () previous winner's per-knot time step


def initial_cmpc_state(mpc: MpcParams, dtype=jnp.float32) -> CmpcState:
    return CmpcState(U=jnp.zeros((4 * mpc.N,), dtype),
                     valid=jnp.asarray(False),
                     h=jnp.zeros((), dtype))


def _joint_ab(h, params: SimParams, dtype):
    A, B = exact_ab(h, params.tau_player, dtype)
    Aj = jnp.zeros((8, 8), dtype).at[:4, :4].set(A).at[4:, 4:].set(A)
    Bj = jnp.zeros((8, 4), dtype).at[:4, :2].set(B).at[4:, 2:].set(B)
    return Aj, Bj


def _pos_rows(M, N: int, lo: int):
    """Rows ``8k+lo .. 8k+lo+1`` of a stacked (8N, ...) matrix/vector --
    player-position components extracted by reshape/slice (free at trace
    time and on the MXU; replaces selector-matrix matmuls)."""
    return M.reshape(N, 8, -1)[:, lo:lo + 2].reshape(2 * N, -1)


def _solve_candidate(h, x0, x_des, obs, params: SimParams, mpc: MpcParams,
                     U0):
    """One fixed-h SQP; returns (U, cost, converged)."""
    dtype = x0.dtype
    N = mpc.N
    Aj, Bj = _joint_ab(h, params, dtype)
    phi, gam = condense(Aj, Bj, N)                 # X (8N) = phi x0 + gam U
    nU = 4 * N

    Omega = jnp.diag(jnp.asarray([mpc.w_pos, mpc.w_pos, mpc.w_vel,
                                  mpc.w_vel] * 2, dtype))
    rowN = slice(8 * (N - 1), 8 * N)
    gN = gam[rowN]
    phiN_x0 = phi[rowN] @ x0
    H = 2.0 * (gN.T @ Omega @ gN + mpc.u_reg * jnp.eye(nU, dtype=dtype))
    g = 2.0 * gN.T @ Omega @ (phiN_x0 - x_des)

    phi_x0 = phi @ x0
    lim = params.input_limit
    r = params.player_radius
    hx = params.arena_x / 2.0 - r
    hy = params.arena_y / 2.0 - r
    box = jnp.tile(jnp.asarray([hx, hy], dtype), N)
    A_arena = jnp.concatenate([_pos_rows(gam, N, 0),
                               _pos_rows(gam, N, 4)], axis=0)
    off = jnp.concatenate([_pos_rows(phi_x0, N, 0)[:, 0],
                           _pos_rows(phi_x0, N, 4)[:, 0]])
    A_fix = jnp.concatenate([jnp.eye(nU, dtype=dtype), A_arena], axis=0)
    lo_fix = jnp.concatenate([-lim * jnp.ones(nU, dtype),
                              jnp.tile(-box, 2) - off])
    hi_fix = jnp.concatenate([lim * jnp.ones(nU, dtype),
                              jnp.tile(box, 2) - off])

    d2 = (2.0 * params.player_radius) ** 2
    sg1 = _pos_rows(gam, N, 0).reshape(N, 2, nU)
    sg2 = _pos_rows(gam, N, 4).reshape(N, 2, nU)
    p0_1 = _pos_rows(phi_x0, N, 0).reshape(N, 2)
    p0_2 = _pos_rows(phi_x0, N, 4).reshape(N, 2)

    def sqp_body(U, _):
        X = (phi_x0 + gam @ U).reshape(N, 8)
        p1 = X[:, 0:2]
        p2 = X[:, 4:6]

        def keepout(p_bar, sg, p0p, centers):
            diff = p_bar[None] - centers[:, None]            # (M, N, 2)
            gval = jnp.sum(diff * diff, -1) - d2
            rows = 2.0 * jnp.einsum("mnc,ncu->mnu", diff, sg)
            rhs = (2.0 * jnp.sum(diff * p_bar[None], -1) - gval -
                   2.0 * jnp.sum(diff * p0p[None], -1))
            return rows.reshape(-1, nU), rhs.reshape(-1)

        r1, b1 = keepout(p1, sg1, p0_1, obs)
        r2, b2 = keepout(p2, sg2, p0_2, obs)
        # pairwise: |p1_k - p2_k|^2 >= (2r)^2 (CentralizedMPC.py:38)
        diffp = p1 - p2
        gp = jnp.sum(diffp * diffp, -1) - d2
        rowsp = 2.0 * jnp.einsum("nc,ncu->nu", diffp, sg1 - sg2)
        rhsp = (2.0 * jnp.sum(diffp * (p1 - p2), -1) - gp -
                2.0 * jnp.sum(diffp * (p0_1 - p0_2), -1))
        A = jnp.concatenate([A_fix, r1, r2, rowsp], axis=0)
        big = 1e9
        lo = jnp.concatenate([lo_fix, b1, b2, rhsp])
        hi = jnp.concatenate([hi_fix,
                              jnp.full(b1.shape, big, x0.dtype),
                              jnp.full(b2.shape, big, x0.dtype),
                              jnp.full(rhsp.shape, big, x0.dtype)])
        sol = solve_qp(H, g, A, lo, hi, iters=mpc.qp_iters,
                       scale_rows=True)
        return sol.x, sol.converged

    U, convs = jax.lax.scan(sqp_body, U0, None, length=mpc.sqp_iters)
    # project out residual ADMM box violation (exact, cheap)
    U = jnp.clip(U, -params.input_limit, params.input_limit)
    xN = phiN_x0 + gN @ U
    err = xN - x_des
    cost = err @ Omega @ err + N * h          # terminal + final-time cost
    return U, cost, convs[-1]


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "mpc"))
def compute_control(state: CmpcState, x0_p1, x0_p2, xf_p1, xf_p2,
                    obstacles, params: SimParams, mpc: MpcParams):
    """Equivalent of ``CentralizedMPC.compute_control``
    (/root/reference/py/src/CentralizedMPC.py:17-72).

    obstacles: (2, 2) opposing players' positions.  Returns
    (new CmpcState, u_p1 (2,), u_p2 (2,)).
    """
    dtype = jnp.asarray(x0_p1).dtype
    x0 = jnp.concatenate([x0_p1, x0_p2]).astype(dtype)
    x_des = jnp.concatenate([xf_p1, xf_p2]).astype(dtype)
    obs = jnp.asarray(obstacles, dtype).reshape(N_OBS, 2)

    minT = params.dt * mpc.minT_frac / (mpc.N + 1)
    maxT = 4.0 * params.dt                     # MpcParams.maxT (reference)
    # hybrid global + warm-local grid (see dmpc.candidate_steps)
    hs = candidate_steps(minT, maxT, mpc.t_grid, mpc.t_local, state.h,
                         state.valid, dtype)

    U0 = jnp.where(state.valid, state.U, 0.0)
    Us, costs, convs = jax.vmap(
        lambda h: _solve_candidate(h, x0, x_des, obs, params, mpc, U0))(hs)
    costs = jnp.where(convs, costs, costs + 1e9)
    k = jnp.argmin(costs)
    U, ok = Us[k], convs[k]
    u0 = U[:4]                                  # first knot's 4 inputs
    new_state = CmpcState(U=jnp.where(ok, U, state.U),
                          valid=ok | state.valid,
                          h=jnp.where(ok, hs[k], state.h))
    return new_state, u0[0:2], u0[2:4]
