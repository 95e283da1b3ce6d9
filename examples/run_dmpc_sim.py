#!/usr/bin/env python
"""DMPC vs DMPC full game (four independent per-agent MPC solves per step).

Equivalent of /root/reference/py/test_dmpc.py (T=100 s, dt=0.05, winning
score 100, log "dmpc_game.log"), fused into one XLA scan.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu import SimParams
from robogame_tpu.agents.dmpc_team import initial_team_state, team_step
from robogame_tpu.config import MpcParams, StrategyParams
from robogame_tpu.physics.engine import step
from robogame_tpu.physics.rollout import log_record
from robogame_tpu.state import initial_state
from robogame_tpu.utils.gamelog import write_trajectory_log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)  # T = 100 s
    ap.add_argument("--log", default="dmpc_game.log")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--t-grid", type=int, default=8)
    args = ap.parse_args()

    params = SimParams(dt=0.05, winning_score=100, engine="sweep",
                       dtype="float64" if args.f64 else "float32")
    mpc = MpcParams(t_grid=args.t_grid, sqp_iters=3)
    strat = StrategyParams()

    @jax.jit
    def game(s0):
        def body(carry, _):
            (ts_a, ts_b), s = carry
            ts_a, u_a = team_step(ts_a, s.x, -1, params, mpc, strat)
            ts_b, u_b = team_step(ts_b, s.x, 1, params, mpc, strat)
            u = jnp.concatenate([u_a, u_b], axis=0)
            s2 = step(s, u, params)
            return ((ts_a, ts_b), s2), log_record(s2)
        dt = params.jdtype
        init = ((initial_team_state(mpc, dt), initial_team_state(mpc, dt)),
                s0)
        (_, final), recs = jax.lax.scan(body, init, None,
                                        length=args.steps)
        return final, recs

    s0 = initial_state(params, x0_puck=[0.0, 0.0, 0.0, 0.0])
    t0 = time.time()
    final, recs = game(s0)
    jax.block_until_ready(final)
    if args.log:
        write_trajectory_log(args.log, recs)
    print(f"T={args.steps * params.dt:.0f}s  scores "
          f"A={int(final.score[0])} B={int(final.score[1])}  "
          f"wall={time.time() - t0:.1f}s  log={args.log}")


if __name__ == "__main__":
    main()
