#!/usr/bin/env python
"""Classical vs classical 2v2 game with the centralized CBF safety filter.

Equivalent of /root/reference/py/run_sim.py (T=20 s, dt=0.05, winning
score 4, puck at (-1,0), binary log "minimal_game.log") -- but the whole
game compiles to ONE XLA program (teams, CBF-QP, and physics inside a
single lax.scan) instead of a Python loop crossing into native solvers
every step.

Usage: python examples/run_sim.py [--steps N] [--log minimal_game.log]
       [--host-loop]   (drive the reference-shaped per-step host API
                        instead of the fused scan)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu import GameSim, SimParams, SimStateView
from robogame_tpu.agents.classical import (ClassicalTeam, initial_team_state,
                                           team_policy)
from robogame_tpu.config import CbfParams, StrategyParams
from robogame_tpu.control.cbf import safe_control
from robogame_tpu.physics.engine import step
from robogame_tpu.physics.rollout import log_record
from robogame_tpu.state import initial_state
from robogame_tpu.utils.gamelog import write_trajectory_log


def fused_game(params, strat, cbf, n_steps, x0_ball):
    """The full game as one jitted scan."""

    @jax.jit
    def game(s0):
        def body(carry, _):
            (ts_a, ts_b), s = carry
            ts_a, u_a = team_policy(ts_a, s.x, -1, params, strat)
            ts_b, u_b = team_policy(ts_b, s.x, 1, params, strat)
            u_nom = jnp.concatenate([u_a, u_b], axis=0)
            res = safe_control(u_nom, s.x[:4, 0:2], s.x[:4, 2:4], params,
                               cbf)
            s2 = step(s, res.u, params)
            return ((ts_a, ts_b), s2), log_record(s2)
        dt = params.jdtype
        init = ((initial_team_state(dt), initial_team_state(dt)), s0)
        (_, final), recs = jax.lax.scan(body, init, None, length=n_steps)
        return final, recs

    s0 = initial_state(params, x0_puck=x0_ball)
    return game(s0)


def host_loop_game(params, strat, cbf, n_steps, x0_ball, logname):
    """Reference-shaped loop (run_sim.py:56-75) over the host GameSim API."""
    sim = GameSim(params)
    vec = sim.reset(dt=params.dt, winning_score=params.winning_score,
                    x0_ball=x0_ball, log=bool(logname),
                    logname=logname or "minimal_game.log")
    home = ClassicalTeam(params, -1, "A")
    away = ClassicalTeam(params, 1, "B")
    for _ in range(n_steps):
        view = SimStateView(vec)
        velA1, velA2 = home.run(view)
        velB1, velB2 = away.run(view)
        u_nom = jnp.asarray(np.stack([velA1, velA2, velB1, velB2]))
        res = safe_control(u_nom, view.entity_array[:4, 0:2],
                           view.entity_array[:4, 2:4], params, cbf)
        u = np.asarray(res.u)
        vec = sim.run(u[0], u[1], u[2], u[3])
    return vec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)   # T=20 s
    ap.add_argument("--log", default="minimal_game.log")
    ap.add_argument("--host-loop", action="store_true")
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()

    params = SimParams(dt=0.05, winning_score=4, engine="sweep",
                       dtype="float64" if args.f64 else "float32")
    strat = StrategyParams()
    cbf = CbfParams()
    x0_ball = [-1.0, 0.0, 0.0, 0.0]

    t0 = time.time()
    if args.host_loop:
        vec = host_loop_game(params, strat, cbf, args.steps, x0_ball,
                             args.log)
        print(f"final state: scores A={vec[0]:.0f} B={vec[1]:.0f} "
              f"({time.time() - t0:.1f}s)")
    else:
        final, recs = fused_game(params, strat, cbf, args.steps, x0_ball)
        jax.block_until_ready(final)
        if args.log:
            write_trajectory_log(args.log, recs)
        sa, sb = int(final.score[0]), int(final.score[1])
        print(f"T={args.steps * params.dt:.0f}s  scores A={sa} B={sb}  "
              f"puck={np.asarray(final.x[4, 0:2]).round(2)}  "
              f"wall={time.time() - t0:.1f}s  log={args.log}")


if __name__ == "__main__":
    main()
