"""Classical open-loop skill players and the 2-player team state machine.

Capability spec: /root/reference/py/src/ClassicalPlayer.py and
/root/reference/py/src/ClassicalTeam.py.

Two surfaces:

* :class:`ClassicalPlayer` / :class:`ClassicalTeam` -- host-level classes
  mirroring the reference API method-for-method (skills ``timed_kick``,
  ``simple_kick``, ``bounce_kick``, ``defend_kick``, ``defend``,
  ``*_avoiding_obs``, open-loop ``get_control`` playback).
* :func:`team_policy` -- the same team state machine as a pure jittable
  function ``(TeamState, x) -> (TeamState, controls)``, so whole games
  (or vmapped batches of games) run as one XLA program.  All plays are
  masked target-state selection; every control step solves the candidate
  skill trajectories in parallel and applies them only where the
  reference's state machine would re-plan (players re-plan only when idle
  or when the play flips -- plays are open-loop,
  /root/reference/py/src/ClassicalTeam.py:15-30).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import A1, A2, B1, B2, PUCK, SimParams, StrategyParams
from ..state import SimStateView
from ..control.trajopt import (MAX_TRAJ, Trajectory, intercepting_traj,
                               min_time_bounce_kick_traj, min_time_traj)
from ..control.contact import bounce_pass_wall
from ..control.obstacles import (_obs_arrays, intercepting_with_obs_avoidance,
                                 min_time_traj_avoid_obs)

OFFENSE, DEFENSE = 0, 1


class PlayerState(NamedTuple):
    """Open-loop playback state (/root/reference/py/src/ClassicalPlayer.py:
    15-17): current control trajectory + evaluation index."""
    u_traj: jax.Array   # (2, MAX_TRAJ)
    t_idx: jax.Array    # () int32
    length: jax.Array   # () int32


class TeamState(NamedTuple):
    goalie: PlayerState
    player: PlayerState
    curr_play: jax.Array  # () int32, OFFENSE/DEFENSE


def idle_player(dtype=jnp.float32) -> PlayerState:
    """Zero-length trajectory (ClassicalPlayer.idle, reference 83-89)."""
    return PlayerState(u_traj=jnp.zeros((2, MAX_TRAJ), dtype),
                       t_idx=jnp.zeros((), jnp.int32),
                       length=jnp.ones((), jnp.int32))


def initial_team_state(dtype=jnp.float32) -> TeamState:
    return TeamState(goalie=idle_player(dtype), player=idle_player(dtype),
                     curr_play=jnp.asarray(DEFENSE, jnp.int32))


def is_idle(ps: PlayerState) -> jax.Array:
    """(t_idx+1)/length >= 1 (reference 191-199)."""
    return (ps.t_idx + 1) >= ps.length


def get_control(ps: PlayerState):
    """Open-loop playback (reference 26-38): emit u_traj[:, t_idx] and
    advance; past the end, go idle and emit zeros."""
    ok = (ps.t_idx + 1) <= ps.length
    u = jnp.where(ok, ps.u_traj[:, jnp.clip(ps.t_idx, 0, MAX_TRAJ - 1)],
                  0.0)
    nxt = PlayerState(u_traj=jnp.where(ok, ps.u_traj, 0.0),
                      t_idx=jnp.where(ok, ps.t_idx + 1, 0),
                      length=jnp.where(ok, ps.length, 1))
    return u, nxt


def _apply_traj(ps: PlayerState, traj: Trajectory, do: jax.Array
                ) -> PlayerState:
    """Install a freshly planned trajectory where ``do & traj.success``
    (the min-time skills only overwrite on success, reference 101-106)."""
    take = do & traj.success
    return PlayerState(
        u_traj=jnp.where(take, traj.u, ps.u_traj),
        t_idx=jnp.where(take, 0, ps.t_idx),
        length=jnp.where(take, traj.length, ps.length))


def kick_final_state(p_goal, p_puck, kick_velocity, params: SimParams):
    """pf = p_puck - dir (r_puck + r_player), vf = kick_vel dir
    (reference 215-227)."""
    d = p_goal - p_puck
    n = jnp.linalg.norm(d)
    d = jnp.where(n > 1e-4, d / jnp.where(n > 0, n, 1.0), d)
    pf = p_puck - d * (params.puck_radius + params.player_radius)
    return pf, kick_velocity * d


def _normalize(v):
    n = jnp.linalg.norm(v)
    return jnp.where(n > 0, v / jnp.where(n > 0, n, 1.0), v)


def _team_candidates(x: jax.Array, field: int, params: SimParams,
                     strat: StrategyParams):
    """Per-game pre-solve math of the team state machine: the 5 candidate
    skill problems (player simple_kick / defend_kick@1.5kv, goalie
    defend / kick / defend_kick) and the play selection."""
    dtype = x.dtype
    kv = strat.kick_velocity
    rows = (A1, A2, B1, B2) if field < 0 else (B1, B2, A1, A2)
    g_row, p_row, o1_row, o2_row = rows
    puck = x[PUCK]
    goal = jnp.asarray([-field * params.arena_x / 2.0, 0.0], dtype)
    home = jnp.asarray([field * params.arena_x / 2.0, 0.0], dtype)

    # --- play selection (ClassicalTeam.evaluateGame, 32-37) ---
    next_play = jnp.where((field * puck[0] >= params.arena_x / 4.0) &
                          (field * puck[2] >= 0), DEFENSE,
                          OFFENSE).astype(jnp.int32)

    # --- candidate skill targets ---
    pf_kick, vf_kick = kick_final_state(goal, puck[0:2], kv, params)
    # defend_kick direction (reference 149-170): open-field shot away from
    # the opponents' mean y side
    opp_y = x[o1_row, 1] + x[o2_row, 1]
    dk_dir = _normalize(jnp.stack([jnp.asarray(-field, dtype),
                                   jnp.sign(opp_y)]))
    pf_dk = puck[0:2] - dk_dir * (params.puck_radius + params.player_radius)
    # goalie defend point: home + 0.5 (puck - home) (reference 172-183)
    pf_def = home + 0.5 * (puck[0:2] - home)

    z = jnp.zeros(2, dtype)
    cand_p0 = jnp.stack([x[p_row, 0:2], x[p_row, 0:2], x[g_row, 0:2],
                         x[g_row, 0:2], x[g_row, 0:2]])
    cand_v0 = jnp.stack([x[p_row, 2:4], x[p_row, 2:4], x[g_row, 2:4],
                         x[g_row, 2:4], x[g_row, 2:4]])
    cand_pf = jnp.stack([pf_kick, pf_dk, pf_def, pf_kick, pf_dk])
    cand_vf = jnp.stack([vf_kick, 1.5 * kv * dk_dir, z, vf_kick,
                         kv * dk_dir])
    return cand_p0, cand_v0, cand_pf, cand_vf, next_play


def _team_apply(ts: TeamState, x: jax.Array, trajs, next_play,
                field: int):
    """Post-solve half of the state machine: play-flip idling, masked
    trajectory installs, open-loop playback."""
    dtype = x.dtype
    puck = x[PUCK]
    rows = (A1, A2, B1, B2) if field < 0 else (B1, B2, A1, A2)
    g_row, p_row, o1_row, o2_row = rows
    flipped = next_play != ts.curr_play
    # play flip -> clean_up(): both players idled (reference 19-21, 77-80)
    goalie = jax.tree.map(
        lambda a, b: jnp.where(flipped, a, b), idle_player(dtype), ts.goalie)
    player = jax.tree.map(
        lambda a, b: jnp.where(flipped, a, b), idle_player(dtype), ts.player)

    (t_simple, t_dk15, t_def, t_gkick, t_gdk) = [
        jax.tree.map(lambda a, i=i: a[i], trajs) for i in range(5)]

    offense = next_play == OFFENSE
    # --- player (reference 43-46, 55-59) ---
    p_idle = is_idle(player)
    player = _apply_traj(player, t_simple, p_idle & offense)
    player = _apply_traj(player, t_dk15, p_idle & ~offense)

    # --- goalie ---
    g_idle = is_idle(goalie)
    # offense: defend if puck in home half else kick (reference 49-53)
    home_half = field * puck[0] >= 0
    goalie = _apply_traj(goalie, t_def, g_idle & offense & home_half)
    goalie = _apply_traj(goalie, t_gkick, g_idle & offense & ~home_half)
    # defense: kick away if closest to puck else defend (reference 61-75).
    # NOTE reference quirk kept: ``goalie_pos`` reads the ADVERSARY team's
    # player 1 (ClassicalTeam.py:65), so "goalie distance" is actually the
    # opposing goalie's distance -- behavior replicated for parity.
    gd = jnp.linalg.norm(x[o1_row, 0:2] - puck[0:2])
    d1 = jnp.linalg.norm(x[o1_row, 0:2] - puck[0:2])
    d2 = jnp.linalg.norm(x[o2_row, 0:2] - puck[0:2])
    closest = (gd < d1) & (gd < d2)
    goalie = _apply_traj(goalie, t_gdk, g_idle & ~offense & closest)
    goalie = _apply_traj(goalie, t_def, g_idle & ~offense & ~closest)

    u_g, goalie = get_control(goalie)
    u_p, player = get_control(player)
    ts2 = TeamState(goalie=goalie, player=player, curr_play=next_play)
    return ts2, jnp.stack([u_g, u_p])


@functools.partial(jax.jit, static_argnames=("field", "params", "strat"))
def team_policy(ts: TeamState, x: jax.Array, field: int,
                params: SimParams, strat: StrategyParams):
    """One control step of the classical team state machine
    (/root/reference/py/src/ClassicalTeam.py:15-75).

    ``x``: (5, 4) entity states; ``field``: -1 (team A, defends left) or
    +1 (team B).  Returns (new TeamState, (2, 2) velocities
    [goalie, player]).
    """
    cand_p0, cand_v0, cand_pf, cand_vf, next_play = _team_candidates(
        x, field, params, strat)
    trajs = jax.vmap(lambda a, b, c, d: min_time_traj(a, b, c, d, params))(
        cand_p0, cand_v0, cand_pf, cand_vf)
    return _team_apply(ts, x, trajs, next_play, field)


@functools.partial(jax.jit, static_argnames=("field", "params", "strat",
                                             "use_lanes"))
def team_policy_batch(ts: TeamState, x: jax.Array, field: int,
                      params: SimParams, strat: StrategyParams,
                      use_lanes: bool | None = None):
    """Batched :func:`team_policy`: ``ts`` with (B, ...) leaves, ``x``
    (B, 5, 4).  All B x 5 candidate skill solves (x T_GRID final-time
    candidates each) go through ONE lanes-kernel launch
    (``control.trajopt.min_time_traj_batch``) instead of vmapped
    per-problem XLA QPs -- the classical matchup sweep's dominant cost
    (NOTES.md r5).  Matches vmapped :func:`team_policy` up to solver
    roundoff (tests/test_agents.py::test_classical_batch_matches_vmapped).
    """
    from ..control.trajopt import min_time_traj_batch

    B = x.shape[0]
    cand_p0, cand_v0, cand_pf, cand_vf, next_play = jax.vmap(
        lambda xx: _team_candidates(xx, field, params, strat))(x)
    flat = lambda a: a.reshape(B * 5, 2)
    trajs_flat = min_time_traj_batch(flat(cand_p0), flat(cand_v0),
                                     flat(cand_pf), flat(cand_vf),
                                     params, use_lanes=use_lanes)
    # (B*5, ...) -> per-game candidate-leading (B, 5, ...)
    trajs = jax.tree.map(
        lambda a: a.reshape((B, 5) + a.shape[1:]), trajs_flat)
    return jax.vmap(
        lambda t, xx, tr, npl: _team_apply(t, xx, tr, npl, field)
    )(ts, x, trajs, next_play)


# ---------------------------------------------------------------------------
# Host-level API mirroring the reference classes
# ---------------------------------------------------------------------------

class ClassicalPlayer:
    """Reference-API skill player (/root/reference/py/src/ClassicalPlayer.py).

    ``field``: -1 left / +1 right defended side; ``team``: "A"/"B";
    ``player_id``: 1 or 2."""

    def __init__(self, params: SimParams, field: int, team: str,
                 player_id: int,
                 strat: StrategyParams | None = None):
        self.params = params
        self.field = field
        self.team = team
        self.player_id = player_id
        self.strat = strat or StrategyParams()
        self.state = idle_player(params.jdtype)

    # -- playback ----------------------------------------------------------
    def get_control(self):
        pct = self.task_percentage_completed()
        u, self.state = get_control(self.state)
        return np.asarray(u), min(pct, 1.0)

    def is_idle(self) -> bool:
        return bool(is_idle(self.state))

    def task_percentage_completed(self) -> float:
        return float((self.state.t_idx + 1) / self.state.length)

    def idle(self):
        self.state = idle_player(self.params.jdtype)
        return True

    # -- geometry helpers (reference 201-258) ------------------------------
    def get_adversary_goal_pos(self):
        return np.array([-self.field * self.params.arena_x / 2.0, 0.0])

    def get_home_goal_pos(self):
        return np.array([self.field * self.params.arena_x / 2.0, 0.0])

    def get_adversary_team(self):
        return {"A": "B", "B": "A"}[self.team]

    def get_teammate_id(self):
        return {1: 2, 2: 1}[self.player_id]

    def _me(self, state: SimStateView):
        return (jnp.asarray(state.get_player_pos(self.team, self.player_id)),
                jnp.asarray(state.get_player_vel(self.team, self.player_id)))

    def _others(self, state: SimStateView):
        adv = self.get_adversary_team()
        return [np.asarray(state.get_player_pos(self.team,
                                                self.get_teammate_id())),
                np.asarray(state.get_player_pos(adv, 1)),
                np.asarray(state.get_player_pos(adv, 2))]

    def _install(self, traj: Trajectory, only_on_success: bool = True):
        ok = bool(traj.success)
        if ok or not only_on_success:
            self.state = PlayerState(u_traj=traj.u,
                                     t_idx=jnp.zeros((), jnp.int32),
                                     length=traj.length)
        return ok

    # -- skills (reference 48-183) ----------------------------------------
    def timed_kick(self, state, kick_velocity, time_to_kick):
        p_puck = jnp.asarray(state.get_puck_pos())
        pf, vf = kick_final_state(jnp.asarray(self.get_adversary_goal_pos()),
                                  p_puck, kick_velocity, self.params)
        p0, v0 = self._me(state)
        n = max(1, int(round(time_to_kick / self.params.dt)))
        traj = intercepting_traj(p0, v0, pf, vf, self.params, n)
        return self._install(traj, only_on_success=False)

    def timed_kick_avoiding_obs(self, state, kick_velocity, time_to_kick):
        p_puck = jnp.asarray(state.get_puck_pos())
        pf, vf = kick_final_state(jnp.asarray(self.get_adversary_goal_pos()),
                                  p_puck, kick_velocity, self.params)
        p0, v0 = self._me(state)
        obs, obs_r, mask = _obs_arrays(self._others(state),
                                       np.asarray(p_puck), self.params,
                                       self.params.jdtype)
        n = max(1, int(round(time_to_kick / self.params.dt)))
        traj = intercepting_with_obs_avoidance(p0, v0, pf, vf, obs, obs_r,
                                               mask, self.params, n)
        return self._install(traj, only_on_success=False)

    def simple_kick(self, state, kick_velocity):
        p_puck = jnp.asarray(state.get_puck_pos())
        pf, vf = kick_final_state(jnp.asarray(self.get_adversary_goal_pos()),
                                  p_puck, kick_velocity, self.params)
        p0, v0 = self._me(state)
        return self._install(min_time_traj(p0, v0, pf, vf, self.params))

    def simple_kick_avoiding_obs(self, state, kick_velocity):
        p_puck = jnp.asarray(state.get_puck_pos())
        pf, vf = kick_final_state(jnp.asarray(self.get_adversary_goal_pos()),
                                  p_puck, kick_velocity, self.params)
        p0, v0 = self._me(state)
        obs, obs_r, mask = _obs_arrays(self._others(state),
                                       np.asarray(p_puck), self.params,
                                       self.params.jdtype)
        return self._install(min_time_traj_avoid_obs(
            p0, v0, pf, vf, obs, obs_r, mask, self.params))

    def bounce_kick(self, state, which_wall):
        """Bank the puck off a wall into the goal (requires tau_puck >= 1,
        reference 129-147)."""
        plan = bounce_pass_wall(jnp.asarray(state.get_puck_pos()),
                                jnp.asarray(self.get_adversary_goal_pos(),
                                            dtype=self.params.jdtype),
                                which_wall, self.params)
        if not bool(plan.success):
            return False
        p0, v0 = self._me(state)
        traj = min_time_bounce_kick_traj(
            p0, v0, jnp.asarray(state.get_puck_pos()),
            jnp.asarray(state.get_puck_vel()), plan.v0, self.params)
        return self._install(traj)

    def defend_kick(self, state, kick_vel):
        adv = self.get_adversary_team()
        opp_y = (state.get_player_pos(adv, 1)[1] +
                 state.get_player_pos(adv, 2)[1])
        d = _normalize(jnp.asarray([-float(self.field), float(np.sign(
            np.asarray(opp_y)))], dtype=self.params.jdtype))
        p_puck = jnp.asarray(state.get_puck_pos())
        pf = p_puck - d * (self.params.puck_radius +
                           self.params.player_radius)
        p0, v0 = self._me(state)
        return self._install(min_time_traj(p0, v0, pf, kick_vel * d,
                                           self.params))

    def defend(self, state):
        home = jnp.asarray(self.get_home_goal_pos(),
                           dtype=self.params.jdtype)
        pf = home + 0.5 * (jnp.asarray(state.get_puck_pos()) - home)
        p0, v0 = self._me(state)
        return self._install(min_time_traj(p0, v0, pf,
                                           jnp.zeros(2, self.params.jdtype),
                                           self.params))


class ClassicalTeam:
    """Reference-API team (/root/reference/py/src/ClassicalTeam.py): a
    stateful wrapper over the jittable :func:`team_policy`."""

    def __init__(self, params: SimParams, field: int, team: str,
                 strat: StrategyParams | None = None):
        self.params = params
        self.field = field
        self.team = team
        self.strat = strat or StrategyParams()
        self.state = initial_team_state(params.jdtype)

    def run(self, sim_state):
        """sim_state: SimStateView or flat 22-vector.  Returns
        (vel_goalie, vel_player)."""
        view = (sim_state if isinstance(sim_state, SimStateView)
                else SimStateView(sim_state))
        x = view.entity_array.astype(self.params.jdtype)
        self.state, u = team_policy(self.state, x, self.field, self.params,
                                    self.strat)
        return np.asarray(u[0]), np.asarray(u[1])
