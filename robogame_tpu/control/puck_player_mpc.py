"""Joint puck+player MPC (JointPuckPlayerMPC parity).

Capability spec: /root/reference/py/src/CentralizedPuckPlayerMPC.py.  The
reference class contains an experimental hybrid puck+player MPC with
kick-indicator slack variables and big-M guard activation (lines 17-143),
but a SECOND ``compute_control`` definition at line 176 shadows the first,
so the class's *actual* behavior is: compute a target state at the puck
with velocity 6 toward the goal, run a single-player free-final-time
DirectCollocation for player 1 only ("initial guess", lines 181-243), and
return ``(True, u1, zeros(2))`` -- the hybrid formulation is dead code.

This module reproduces the effective behavior exactly (via the DMPC
condensed-SQP machinery, which is the same single-player problem), with
warm starting.  The dead hybrid path is intentionally not reproduced; the
kick reset map it gestures at is covered for real by
``control.trajopt.min_time_bounce_kick_traj`` and ``control.contact``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MpcParams, SimParams
from ..ops.qp import f32_matmul
from .dmpc import DmpcState, _solve_candidate, initial_dmpc_state

V_HIT = 6.0     # CentralizedPuckPlayerMPC.py:184


class JointPuckPlayerState(NamedTuple):
    p1: DmpcState


def initial_state(mpc: MpcParams, dtype=jnp.float32):
    return JointPuckPlayerState(p1=initial_dmpc_state(mpc, dtype))


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "mpc"))
def compute_control(state: JointPuckPlayerState, x_p1, x_p2, x_puck,
                    p_goal, obstacles, params: SimParams,
                    mpc: MpcParams):
    """Effective reference behavior (CentralizedPuckPlayerMPC.py:176-243):
    single-player solve toward the puck for p1; p2 gets zeros.

    obstacles: (M, 2) positions (the reference iterates whatever list it
    is given).  Returns (state, u_p1 (2,), u_p2 (2,))."""
    dtype = jnp.asarray(x_p1).dtype
    p_puck = jnp.asarray(x_puck, dtype)[0:2]
    d = jnp.asarray(p_goal, dtype) - p_puck
    n = jnp.linalg.norm(d)
    hit = V_HIT * d / jnp.where(n > 0, n, 1.0)
    x_des = jnp.concatenate([p_puck, hit])

    obs = jnp.asarray(obstacles, dtype).reshape(-1, 2)
    # pad/trim to the DMPC's 3 neighbor slots
    M = obs.shape[0]
    if M < 3:
        obs = jnp.concatenate(
            [obs, jnp.full((3 - M, 2), 1e3, dtype)], axis=0)
    obs = obs[:3]

    minT = params.dt * mpc.minT_frac / (mpc.N + 1)
    maxT = 4.0 * params.dt                 # MpcParams.maxT (reference)
    hs = jnp.linspace(minT, maxT, mpc.t_grid).astype(dtype)
    U0 = jnp.where(state.p1.valid, state.p1.U, 0.0)
    Us, costs, convs = jax.vmap(
        lambda h: _solve_candidate(h, jnp.asarray(x_p1, dtype), x_des,
                                   obs, params, mpc, U0))(hs)
    costs = jnp.where(convs, costs, costs + 1e9)
    k = jnp.argmin(costs)
    U, ok = Us[k], convs[k]
    new = JointPuckPlayerState(
        p1=DmpcState(U=jnp.where(ok, U, state.p1.U),
                     valid=ok | state.p1.valid,
                     h=jnp.where(ok, hs[k], state.p1.h)))
    return new, U[0:2], jnp.zeros(2, dtype)


class JointPuckPlayerMPC:
    """Host-API wrapper mirroring the reference class."""

    def __init__(self, sim_params: SimParams, mpc: MpcParams | None = None):
        self.params = sim_params
        self.mpc = mpc or MpcParams()
        self.state = initial_state(self.mpc, sim_params.jdtype)

    def compute_control(self, x_p1, x_p2, x_puck, p_goal, obstacles):
        self.state, u1, u2 = compute_control(
            self.state, jnp.asarray(x_p1), jnp.asarray(x_p2),
            jnp.asarray(x_puck), jnp.asarray(p_goal),
            jnp.asarray(obstacles), self.params, self.mpc)
        return True, np.asarray(u1), np.asarray(u2)
