"""Centralized MPC team (BaselineCentralizedPlayers / CentralizedTeam
parity).

Capability spec: /root/reference/py/src/CentralizedPlayers.py and
/root/reference/py/src/CentralizedTeam.py.  The strategy computes target
states for an attacker (reach the puck with velocity v_hit toward the
goal) and a defender (midpoint between home goal and puck), then the
joint CentralizedMPC solves both players at once.  CentralizedTeam
always plays OFFENSE (CentralizedTeam.py:14-18).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import A1, A2, B1, B2, PUCK, MpcParams, SimParams
from ..control.cmpc import (CmpcState, compute_control,
                            compute_control_batch, initial_cmpc_state)
from ..state import SimStateView

OFFENSE, DEFENSE = 0, 1
V_HIT = 5.0     # CentralizedPlayers.py:52


def target_states(play, puck_pos, field, params: SimParams,
                  v_hit: float = V_HIT):
    """Attacker/defender desired states
    (/root/reference/py/src/CentralizedPlayers.py:67-98)."""
    dtype = puck_pos.dtype
    goal = jnp.asarray([-field * params.arena_x / 2.0, 0.0], dtype)
    home = jnp.asarray([field * params.arena_x / 2.0, 0.0], dtype)
    d = goal - puck_pos
    n = jnp.linalg.norm(d)
    hit = v_hit * d / jnp.where(n > 0, n, 1.0)
    x_attack_off = jnp.concatenate([puck_pos, hit])
    x_attack_def = jnp.concatenate([puck_pos, 2.0 * hit])
    x_attack = jnp.where(play == OFFENSE, x_attack_off, x_attack_def)

    def_pos = home + (puck_pos - home) / 2.0
    x_def_home = jnp.concatenate([def_pos, jnp.zeros(2, dtype)])
    # offense defender: if puck in own half -> midpoint, else also attack
    puck_home_side = field * puck_pos[0] > 0
    x_defend = jnp.where(play == OFFENSE,
                         jnp.where(puck_home_side, x_def_home,
                                   x_attack_off),
                         x_def_home)
    return x_attack, x_defend


@functools.partial(jax.jit, static_argnames=("field", "params", "mpc"))
def team_step(cs: CmpcState, x: jax.Array, play, field: int,
              params: SimParams, mpc: MpcParams):
    """One control step of the centralized team: targets + joint MPC.
    x: (5, 4).  Returns (CmpcState, (2, 2) velocities [attacker,
    defender])."""
    rows = (A1, A2, B1, B2) if field < 0 else (B1, B2, A1, A2)
    a_row, d_row, o1, o2 = rows
    x_att, x_def = target_states(play, x[PUCK, 0:2], field, params)
    obstacles = jnp.stack([x[o1, 0:2], x[o2, 0:2]])
    cs, u1, u2 = compute_control(cs, x[a_row], x[d_row], x_att, x_def,
                                 obstacles, params, mpc)
    return cs, jnp.stack([u1, u2])


@functools.partial(jax.jit, static_argnames=("field", "params", "mpc"))
def team_step_batch(cs: CmpcState, x: jax.Array, play, field: int,
                    params: SimParams, mpc: MpcParams):
    """Batched ``team_step``: cs leaves carry a leading game axis B, x is
    (B, 5, 4), play is () or (B,).  All games' joint QPs solve in one
    lanes-batched call (control.cmpc.compute_control_batch).  Returns
    (state, (B, 2, 2) velocities)."""
    B = x.shape[0]
    rows = (A1, A2, B1, B2) if field < 0 else (B1, B2, A1, A2)
    a_row, d_row, o1, o2 = rows
    play_b = jnp.broadcast_to(play, (B,))

    def tgt(x1, p1):
        x_att, x_def = target_states(p1, x1[PUCK, 0:2], field, params)
        return x_att, x_def, jnp.stack([x1[o1, 0:2], x1[o2, 0:2]])

    x_att, x_def, obstacles = jax.vmap(tgt)(x, play_b)
    cs, u1, u2 = compute_control_batch(cs, x[:, a_row], x[:, d_row],
                                       x_att, x_def, obstacles, params,
                                       mpc)
    return cs, jnp.stack([u1, u2], axis=1)


class BaselineCentralizedPlayers:
    """Host-API wrapper (/root/reference/py/src/CentralizedPlayers.py:43-98).
    ``field``: -1 -> team A, +1 -> team B."""

    OFFENSE, DEFENSE = OFFENSE, DEFENSE

    def __init__(self, sim_params: SimParams, field: int,
                 player_id: int = 1, mpc: MpcParams | None = None):
        self.params = sim_params
        self.field = field
        self.this_team = "A" if field < 0 else "B"
        self.player_id = player_id
        self.v_hit = V_HIT
        self.mpc = mpc or MpcParams()
        self.cs = initial_cmpc_state(self.mpc, sim_params.jdtype)

    def get_action(self, play, state):
        view = (state if isinstance(state, SimStateView)
                else SimStateView(state))
        x = view.entity_array.astype(self.params.jdtype)
        self.cs, u = team_step(self.cs, x, jnp.asarray(play, jnp.int32),
                               self.field, self.params, self.mpc)
        return np.asarray(u[0]), np.asarray(u[1])


class CentralizedTeam:
    """Always-offense wrapper (/root/reference/py/src/CentralizedTeam.py)."""

    def __init__(self, params: SimParams, field: int, team: str | None = None,
                 mpc: MpcParams | None = None):
        self.players = BaselineCentralizedPlayers(params, field, 1, mpc)

    def run(self, state):
        return self.players.get_action(OFFENSE, state)
