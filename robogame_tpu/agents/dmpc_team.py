"""Decentralized-MPC team (DMPCPlayer / DMPCTeam parity).

Capability spec: /root/reference/py/src/DMPCPlayer.py and
/root/reference/py/src/DMPCTeam.py.  Per-player ATTACKER/DEFENDER roles
choose target states (same strategy shapes as the centralized team with
v_hit = 4, DMPCTeam.py:70); each player solves an independent DMPC
against the other three players' frozen current positions.

Play selection (DMPCTeam.execute, 78-87) compares ``field * puck_x``
against ``arena_x - d_goalie_defense`` (= 7.5) and ``arena_x -
d_goalie_offense`` (= 5.0).  Since |puck_x| <= arena_x/2 = 5, BOTH
defense triggers are unreachable and the reference team always plays
OFFENSE -- a latent reference bug replicated faithfully here (the
thresholds remain configurable through StrategyParams for users who want
the presumably-intended halved comparisons).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (A1, A2, B1, B2, PUCK, MpcParams, SimParams,
                      StrategyParams)
from ..control.dmpc import (DmpcState, compute_control,
                            compute_control_batch, initial_dmpc_state)
from ..state import SimStateView

OFFENSE, DEFENSE = 0, 1
ATTACKER, DEFENDER = 1, 2      # DMPC.py:7-8


class DmpcTeamState(NamedTuple):
    attacker: DmpcState
    defender: DmpcState


def initial_team_state(mpc: MpcParams, dtype=jnp.float32) -> DmpcTeamState:
    return DmpcTeamState(attacker=initial_dmpc_state(mpc, dtype),
                         defender=initial_dmpc_state(mpc, dtype))


def select_play(puck, field: int, params: SimParams,
                strat: StrategyParams):
    """DMPCTeam.execute play thresholds (DMPCTeam.py:78-87).  See module
    docstring: with the reference constants this is always OFFENSE."""
    px, vx = puck[0], puck[2]
    d1 = params.arena_x - strat.d_goalie_defense
    d2 = params.arena_x - strat.d_goalie_offense
    defense = (field * px > d1) | ((field * px > d2) &
                                   (field * vx > strat.v_thresh))
    return jnp.where(defense, DEFENSE, OFFENSE).astype(jnp.int32)


def player_target(play, role: int, puck_pos, field: int,
                  params: SimParams, strat: StrategyParams):
    """DMPCPlayer.get_action target selection (DMPCPlayer.py:27-57)."""
    dtype = puck_pos.dtype
    goal = jnp.asarray([-field * params.arena_x / 2.0, 0.0], dtype)
    home = jnp.asarray([field * params.arena_x / 2.0, 0.0], dtype)
    d = goal - puck_pos
    n = jnp.linalg.norm(d)
    hit = strat.v_hit * d / jnp.where(n > 0, n, 1.0)
    x_hit = jnp.concatenate([puck_pos, hit])
    x_hit2 = jnp.concatenate([puck_pos, 2.0 * hit])
    def_pos = home + (puck_pos - home) / 2.0
    x_home = jnp.concatenate([def_pos, jnp.zeros(2, dtype)])
    if role == ATTACKER:
        return jnp.where(play == OFFENSE, x_hit, x_hit2)
    puck_home_side = field * puck_pos[0] > 0
    off_target = jnp.where(puck_home_side, x_home, x_hit)
    return jnp.where(play == OFFENSE, off_target, x_home)


@functools.partial(jax.jit, static_argnames=("field", "params", "mpc",
                                             "strat"))
def team_step(ts: DmpcTeamState, x: jax.Array, field: int,
              params: SimParams, mpc: MpcParams, strat: StrategyParams):
    """One control step: play selection + two independent DMPC solves
    (vmapped).  x: (5, 4).  Returns (state, (2, 2) [attacker, defender])."""
    rows = (A1, A2, B1, B2) if field < 0 else (B1, B2, A1, A2)
    a_row, d_row, o1, o2 = rows
    puck = x[PUCK]
    play = select_play(puck, field, params, strat)

    tgt_a = player_target(play, ATTACKER, puck[0:2], field, params, strat)
    tgt_d = player_target(play, DEFENDER, puck[0:2], field, params, strat)
    # per-agent obstacle sets: the other three players (DMPC.py:56-64)
    obs_a = jnp.stack([x[d_row, 0:2], x[o1, 0:2], x[o2, 0:2]])
    obs_d = jnp.stack([x[a_row, 0:2], x[o1, 0:2], x[o2, 0:2]])

    states = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                          ts.attacker, ts.defender)
    x0s = jnp.stack([x[a_row], x[d_row]])
    tgts = jnp.stack([tgt_a, tgt_d])
    obss = jnp.stack([obs_a, obs_d])
    new_states, us = jax.vmap(
        lambda s, x0, t, o: compute_control(s, x0, t, o, params, mpc))(
            states, x0s, tgts, obss)
    ts2 = DmpcTeamState(
        attacker=jax.tree.map(lambda a: a[0], new_states),
        defender=jax.tree.map(lambda a: a[1], new_states))
    return ts2, us


@functools.partial(jax.jit, static_argnames=("field", "params", "mpc",
                                             "strat"))
def team_step_batch(ts: DmpcTeamState, x: jax.Array, field: int,
                    params: SimParams, mpc: MpcParams,
                    strat: StrategyParams):
    """Batched ``team_step``: ts leaves carry a leading game axis B and
    x is (B, 5, 4).  Both agents of every game are flattened into one
    ``control.dmpc.compute_control_batch`` call (2B x t_grid candidate
    QPs in a single lanes-batched Pallas solve per SQP iteration) --
    the TPU-scaling path for closed-loop DMPC games.  Returns
    (state, (B, 2, 2) [attacker, defender] velocities)."""
    B = x.shape[0]

    def targets(x1):
        rows = (A1, A2, B1, B2) if field < 0 else (B1, B2, A1, A2)
        a_row, d_row, o1, o2 = rows
        puck = x1[PUCK]
        play = select_play(puck, field, params, strat)
        tgt_a = player_target(play, ATTACKER, puck[0:2], field, params,
                              strat)
        tgt_d = player_target(play, DEFENDER, puck[0:2], field, params,
                              strat)
        obs_a = jnp.stack([x1[d_row, 0:2], x1[o1, 0:2], x1[o2, 0:2]])
        obs_d = jnp.stack([x1[a_row, 0:2], x1[o1, 0:2], x1[o2, 0:2]])
        return (jnp.stack([x1[a_row], x1[d_row]]),
                jnp.stack([tgt_a, tgt_d]), jnp.stack([obs_a, obs_d]))

    x0s, tgts, obss = jax.vmap(targets)(x)          # (B, 2, ...)
    flat = lambda a: a.reshape((2 * B,) + a.shape[2:])
    states = jax.tree.map(
        lambda a, d: flat(jnp.stack([a, d], axis=1)),
        ts.attacker, ts.defender)
    new_states, us = compute_control_batch(
        states, flat(x0s), flat(tgts), flat(obss), params, mpc)
    unflat = lambda a: a.reshape((B, 2) + a.shape[1:])
    ts2 = DmpcTeamState(
        attacker=jax.tree.map(lambda a: unflat(a)[:, 0], new_states),
        defender=jax.tree.map(lambda a: unflat(a)[:, 1], new_states))
    return ts2, unflat(us)


class DMPCPlayer:
    """Host-API per-player wrapper (/root/reference/py/src/DMPCPlayer.py)."""

    OFFENSE, DEFENSE = OFFENSE, DEFENSE
    ATTACKER, DEFENDER = ATTACKER, DEFENDER

    def __init__(self, sim_params: SimParams, mpc: MpcParams,
                 strat: StrategyParams, field: int, player_id: int):
        self.params = sim_params
        self.mpc = mpc
        self.strat = strat
        self.field = field
        self.player_id = player_id
        self.this_team = "A" if field < 0 else "B"
        self.cs = initial_dmpc_state(mpc, sim_params.jdtype)

    def get_action(self, play, state):
        view = (state if isinstance(state, SimStateView)
                else SimStateView(state))
        x = view.entity_array.astype(self.params.jdtype)
        puck = x[PUCK]
        tgt = player_target(jnp.asarray(play, jnp.int32), self.player_id,
                            puck[0:2], self.field, self.params, self.strat)
        rows = (A1, A2, B1, B2) if self.field < 0 else (B1, B2, A1, A2)
        me = rows[0] if self.player_id == ATTACKER else rows[1]
        others = [r for r in (A1, A2, B1, B2) if r != me]
        obs = jnp.stack([x[r, 0:2] for r in others])
        self.cs, u = compute_control(self.cs, x[me], tgt, obs, self.params,
                                     self.mpc)
        return np.asarray(u)


class DMPCTeam:
    """Host-API team wrapper (/root/reference/py/src/DMPCTeam.py:27-93)."""

    def __init__(self, sim_params: SimParams, field: int, name: str = "",
                 mpc: MpcParams | None = None,
                 strat: StrategyParams | None = None):
        self.params = sim_params
        self.field = field
        self.name = name
        self.mpc = mpc or MpcParams()
        self.strat = strat or StrategyParams()
        self.state = initial_team_state(self.mpc, sim_params.jdtype)

    def execute(self, sim_state):
        view = (sim_state if isinstance(sim_state, SimStateView)
                else SimStateView(sim_state))
        x = view.entity_array.astype(self.params.jdtype)
        self.state, us = team_step(self.state, x, self.field, self.params,
                                   self.mpc, self.strat)
        return np.asarray(us[0]), np.asarray(us[1])
