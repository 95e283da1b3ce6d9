#!/usr/bin/env python
"""Physics-only regression driver: replay per-player velocity schedules
from text files through the sim with logging on.

Equivalent of /root/reference/py/test_collisions.py:33-61 -- reads
whitespace-separated schedules A1.txt A2.txt B1.txt B2.txt (one "vx vy"
row per control step) and replays them as one compiled scan.

Usage: python examples/run_collisions.py [--dir DIR] [--log test.log]
With no schedule files present, a built-in demonstration schedule is used.
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
from robogame_tpu.physics.rollout import scripted_rollout
from robogame_tpu.state import initial_state
from robogame_tpu.utils.gamelog import write_trajectory_log


def load_schedules(d):
    names = ["A1.txt", "A2.txt", "B1.txt", "B2.txt"]
    paths = [os.path.join(d, n) for n in names]
    if not all(os.path.exists(p) for p in paths):
        return None
    cols = [np.loadtxt(p).reshape(-1, 2) for p in paths]
    n = min(c.shape[0] for c in cols)
    return np.stack([c[:n] for c in cols], axis=1)     # (T, 4, 2)


def demo_schedule(n_steps=200):
    t = np.arange(n_steps) * 0.05
    s = np.zeros((n_steps, 4, 2))
    s[:, 0, 0] = 6.0                  # A1 charges right into the puck
    s[:, 2] = np.stack([3 * np.cos(t), 3 * np.sin(t)], axis=1)  # B1 swirls
    s[:, 3, 0] = -2.0
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".")
    ap.add_argument("--log", default="collision_test.log")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the env var alone cannot override a "
                         "pinned TPU plugin)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sched = load_schedules(args.dir)
    if sched is None:
        print("no A1.txt..B2.txt found; using built-in demo schedule")
        sched = demo_schedule()

    params = SimParams(dt=0.05, winning_score=100,
                       dtype="float64" if args.f64 else "float32")
    s0 = initial_state(params, x0_puck=[-1.0, 0.0, 0.0, 0.0])
    t0 = time.time()
    final, recs = scripted_rollout(s0, jnp.asarray(sched), params, log=True)
    jax.block_until_ready(final)
    write_trajectory_log(args.log, recs)
    print(f"{sched.shape[0]} steps  scores A={int(final.score[0])} "
          f"B={int(final.score[1])}  wall={time.time() - t0:.1f}s  "
          f"log={args.log}")


if __name__ == "__main__":
    main()
