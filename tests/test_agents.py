"""Tests for the classical agent layer (skills, state machine, full game)."""

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu import GameSim, SimParams, SimStateView
from robogame_tpu.config import A1, A2, B1, B2, PUCK, CbfParams, \
    StrategyParams
from robogame_tpu.agents.classical import (ClassicalPlayer, ClassicalTeam,
                                           OFFENSE, DEFENSE,
                                           initial_team_state, team_policy)
from robogame_tpu.control.cbf import safe_control
from robogame_tpu.physics.engine import step
from robogame_tpu.state import initial_state

PARAMS = SimParams(dtype="float64")
STRAT = StrategyParams()


def _view(x0_puck):
    s = initial_state(PARAMS, x0_puck=x0_puck)
    return SimStateView(s)


def test_simple_kick_plans_and_plays_back():
    player = ClassicalPlayer(PARAMS, -1, "A", 2)
    ok = player.simple_kick(_view([1.0, 0.5, 0.0, 0.0]), 4.0)
    assert ok
    assert not player.is_idle()
    u0, pct = player.get_control()
    assert np.all(np.abs(u0) <= PARAMS.input_limit + 1e-6)
    n = int(player.state.length)
    for _ in range(n + 2):
        player.get_control()
    assert player.is_idle()


def test_defend_targets_midpoint():
    player = ClassicalPlayer(PARAMS, -1, "A", 1)
    assert player.defend(_view([2.0, 1.0, 0.0, 0.0]))
    assert np.allclose(player.get_home_goal_pos(), [-5.0, 0.0])
    assert np.allclose(player.get_adversary_goal_pos(), [5.0, 0.0])


def test_team_play_selection():
    """Defense iff puck in own half moving toward own goal
    (/root/reference/py/src/ClassicalTeam.py:32-37)."""
    ts = initial_team_state(jnp.float64)
    # puck deep in A's half (x=-3) moving left (towards A's goal)
    s = initial_state(PARAMS, x0_puck=[-3.0, 0.0, -1.0, 0.0])
    ts2, _ = team_policy(ts, s.x, -1, PARAMS, STRAT)
    assert int(ts2.curr_play) == DEFENSE
    # same puck for team B (field +1) is offense
    ts3, _ = team_policy(ts, s.x, 1, PARAMS, STRAT)
    assert int(ts3.curr_play) == OFFENSE
    # puck moving away -> offense for A
    s = initial_state(PARAMS, x0_puck=[-3.0, 0.0, 2.0, 0.0])
    ts4, _ = team_policy(ts, s.x, -1, PARAMS, STRAT)
    assert int(ts4.curr_play) == OFFENSE


def test_full_classical_game_with_cbf():
    """The run_sim.py workload (classical vs classical + CBF filter) as one
    jitted scan: finite states, bounded controls, nonzero activity."""
    params = SimParams(dtype="float64", engine="sweep")
    cbf = CbfParams()

    def policy(carry, s):
        ts_a, ts_b = carry
        ts_a, u_a = team_policy(ts_a, s.x, -1, params, STRAT)
        ts_b, u_b = team_policy(ts_b, s.x, 1, params, STRAT)
        u_nom = jnp.concatenate([u_a, u_b], axis=0)
        res = safe_control(u_nom, s.x[:4, 0:2], s.x[:4, 2:4], params, cbf)
        return (ts_a, ts_b), res.u

    @jax.jit
    def game(s0):
        def body(c, _):
            carry, s = c
            carry, u = policy(carry, s)
            s2 = step(s, u, params)
            return (carry, s2), (u, s2.x)
        init = ((initial_team_state(jnp.float64),
                 initial_team_state(jnp.float64)), s0)
        (_, final), (us, xs) = jax.lax.scan(body, init, None, length=60)
        return final, us, xs

    s0 = initial_state(params, x0_puck=[-1.0, 0.0, 0.0, 0.0])
    final, us, xs = game(s0)
    us, xs = np.asarray(us), np.asarray(xs)
    assert np.isfinite(xs).all()
    assert np.abs(us).max() <= params.input_limit + 1e-6
    assert np.abs(us).max() > 0.1          # the teams actually act
    # players moved from their start positions
    assert np.abs(xs[-1, :4, 0:2] - np.asarray(s0.x[:4, 0:2])).max() > 0.1


def test_host_team_api_runs():
    """ClassicalTeam drop-in over the GameSim wrapper (the reference
    run_sim.py loop shape)."""
    sim = GameSim(SimParams(dtype="float64", engine="sweep"))
    vec = sim.reset(dt=0.05, winning_score=4, x0_ball=[-1.0, 0.0, 0.0, 0.0])
    home = ClassicalTeam(sim.params, -1, "A")
    away = ClassicalTeam(sim.params, 1, "B")
    for _ in range(5):
        view = SimStateView(vec)
        vA1, vA2 = home.run(view)
        vB1, vB2 = away.run(view)
        vec = sim.run(vA1, vA2, vB1, vB2)
    assert np.isfinite(vec).all()


def test_classical_batch_matches_vmapped():
    """team_policy_batch routes all B x 5 candidate skill solves through
    one batched QP launch (min_time_traj_batch; the lanes kernel on TPU,
    batched XLA here).  It must reproduce the vmapped per-game
    team_policy: plays identical, installed trajectories and emitted
    controls to solver roundoff (the two paths evaluate the same QPs
    with different batching, so einsum association differs at f32)."""
    from robogame_tpu.agents.classical import team_policy_batch
    from robogame_tpu.parallel.monte_carlo import McParams, _initial_states

    params = SimParams(dtype="float32", engine="sweep")
    strat = StrategyParams()
    B = 6
    states = _initial_states(params, McParams(num_runs=B,
                                              randomize_x0=True))
    x = states.x
    ts0 = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                       initial_team_state(jnp.float32))
    ts1, u1 = jax.vmap(
        lambda t, xx: team_policy(t, xx, -1, params, strat))(ts0, x)
    ts2, u2 = team_policy_batch(ts0, x, -1, params, strat,
                                use_lanes=False)
    assert bool(jnp.all(ts1.curr_play == ts2.curr_play))
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ts1.goalie.u_traj),
                               np.asarray(ts2.goalie.u_traj), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ts1.player.u_traj),
                               np.asarray(ts2.player.u_traj), atol=2e-3)
