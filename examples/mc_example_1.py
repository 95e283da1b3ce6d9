#!/usr/bin/env python
"""Monte-Carlo sweep: classical vs classical WITH the CBF safety filter.

Equivalent of /root/reference/py/mc_example_1.py -- but where the
reference runs its games strictly sequentially (MonteCarlo.py:23-45),
here ALL games run lockstep as one vmapped XLA program, optionally
sharded over a device mesh.  Writes configuration.txt and one
reference-format binary log per run.

Usage: python examples/mc_example_1.py [--runs 4] [--T 10] [--no-cbf]
       (--no-cbf reproduces mc_example_2.py)
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
from robogame_tpu.agents.classical import (initial_team_state,
                                           team_policy_batch)
from robogame_tpu.config import CbfParams, StrategyParams
from robogame_tpu.control.cbf import safe_control_batch
from robogame_tpu.parallel.monte_carlo import (McParams, aggregate,
                                               monte_carlo)
from robogame_tpu.utils.gamelog import GameLogWriter, rows_from_states


def make_policy(params, strat, cbf, use_cbf):
    def policy(carry, states):
        ts_a, ts_b = carry
        # all B x 5 candidate skill solves of each team in one batched QP
        # launch (the lanes kernel on TPU, control.trajopt.
        # min_time_traj_batch), as are the CBF-QPs below
        ts_a, u_a = team_policy_batch(ts_a, states.x, -1, params, strat)
        ts_b, u_b = team_policy_batch(ts_b, states.x, 1, params, strat)
        u = jnp.concatenate([u_a, u_b], axis=1)
        if use_cbf:
            u = safe_control_batch(u, states.x[:, :4, 0:2],
                                   states.x[:, :4, 2:4], params, cbf).u
        return (ts_a, ts_b), u

    return policy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--T", type=float, default=10.0)
    ap.add_argument("--no-cbf", action="store_true")
    ap.add_argument("--out", default="mc_out")
    ap.add_argument("--no-logs", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    params = SimParams(dt=0.05, winning_score=4, engine="sweep")
    strat = StrategyParams()
    cbf = CbfParams()
    mc = McParams(num_runs=args.runs, T=args.T, log_prefix=args.out,
                  x0_ball=(-1.0, 0.0, 0.0, 0.0))
    B = args.runs

    def mk(dtype):
        ia = initial_team_state(dtype)
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), (ia, ia))

    policy = make_policy(params, strat, cbf, not args.no_cbf)
    t0 = time.time()
    # chunk_steps: the classical-policy rollout at large B would exceed
    # the tunneled worker's per-execution wall budget in one scan
    # (NOTES.md r3); chunking is bit-identical
    res, recs = monte_carlo(params, mc, policy=policy,
                            policy_state=mk(params.jdtype), log=True,
                            write_config=True, chunk_steps=100)
    stats = aggregate(res)
    wall = time.time() - t0
    n_steps = int(np.ceil(args.T / params.dt))
    print(f"{B} games x {n_steps} steps in {wall:.1f}s "
          f"({B * n_steps / wall:.0f} steps/s)")
    print("aggregate:", stats)

    if not args.no_logs:
        os.makedirs(args.out, exist_ok=True)
        for i in range(B):
            rows = rows_from_states(
                np.asarray(recs.t)[:, i], np.asarray(recs.score)[:, i],
                np.asarray(recs.positions)[:, i],
                np.asarray(recs.damage)[:, i])
            with GameLogWriter(os.path.join(args.out,
                                            f"mc_run_{i + 1}.log")) as w:
                w.write_rows(rows)
        print(f"wrote {B} logs + configuration.txt under {args.out}/")


if __name__ == "__main__":
    main()
