#!/usr/bin/env python
"""CentralizedTeam vs CentralizedTeam game (joint two-player MPC per team).

Equivalent of /root/reference/py/run_centralized_sim.py (T=10 s, dt=0.05)
with both teams' joint MPC solves and the physics fused into one XLA scan.
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
from robogame_tpu.agents.centralized import OFFENSE, team_step
from robogame_tpu.config import MpcParams
from robogame_tpu.control.cmpc import initial_cmpc_state
from robogame_tpu.physics.engine import step
from robogame_tpu.physics.rollout import log_record
from robogame_tpu.state import initial_state
from robogame_tpu.utils.gamelog import write_trajectory_log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)   # T = 10 s
    ap.add_argument("--log", default="centralized_game.log")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--t-grid", type=int, default=8)
    args = ap.parse_args()

    params = SimParams(dt=0.05, winning_score=100, engine="sweep",
                       dtype="float64" if args.f64 else "float32")
    mpc = MpcParams(t_grid=args.t_grid, sqp_iters=3)
    play = jnp.asarray(OFFENSE, jnp.int32)   # CentralizedTeam.py:14-18

    @jax.jit
    def game(s0):
        def body(carry, _):
            (cs_a, cs_b), s = carry
            cs_a, u_a = team_step(cs_a, s.x, play, -1, params, mpc)
            cs_b, u_b = team_step(cs_b, s.x, play, 1, params, mpc)
            u = jnp.concatenate([u_a, u_b], axis=0)
            s2 = step(s, u, params)
            return ((cs_a, cs_b), s2), log_record(s2)
        dt = params.jdtype
        init = ((initial_cmpc_state(mpc, dt), initial_cmpc_state(mpc, dt)),
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
          f"puck={np.asarray(final.x[4, 0:2]).round(2)}  "
          f"wall={time.time() - t0:.1f}s  log={args.log}")


if __name__ == "__main__":
    main()
