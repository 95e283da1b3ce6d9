#!/usr/bin/env python
"""Bounce-kick demonstration: bank the puck off a wall into the goal.

Reproduces the reference's bounce_kick capability
(/root/reference/videos/bounce_kick_up.mp4 / bounce_kick_down.mp4;
ClassicalPlayer.bounce_kick, requires tau_puck >= 1): the contact planner
solves for the puck velocity that banks off the chosen wall into the
adversary goal, the trajectory optimizer drives the player to impart that
velocity through the elastic reset map, and the sim plays it out.

Usage: python examples/bounce_kick_demo.py [--wall up|down]
       [--log bounce_kick.log]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from robogame_tpu import GameSim, SimParams, SimStateView
from robogame_tpu.agents.classical import ClassicalPlayer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wall", default="up", choices=["up", "down"])
    ap.add_argument("--log", default="bounce_kick.log")
    ap.add_argument("--steps", type=int, default=120)
    args = ap.parse_args()

    # tau_puck = 1.0: the bounce_kick regime (reference run_sim.py:20)
    params = SimParams(dt=0.05, winning_score=1, tau_puck=1.0,
                       engine="sweep", dtype="float32")
    sim = GameSim(params)
    vec = sim.reset(dt=params.dt, winning_score=1, tau_puck=1.0,
                    x0_ball=[-1.0, 0.0, 0.0, 0.0], log=bool(args.log),
                    logname=args.log)

    player = ClassicalPlayer(params, -1, "A", 2)   # team A attacks right
    view = SimStateView(vec)
    ok = player.bounce_kick(view, args.wall)
    print(f"bounce_kick({args.wall}) planned: {ok}")
    if not ok:
        sys.exit(1)

    z = np.zeros(2)
    for k in range(args.steps):
        u, _ = player.get_control()
        vec = sim.run(z, u, z, z)                  # A2 is the kicker
        if vec[0] >= 1:
            print(f"GOAL via {args.wall}-wall bank at t={k * params.dt:.2f}s"
                  f"  puck path logged to {args.log}")
            return
    print(f"no goal within {args.steps * params.dt:.0f}s "
          f"(final puck: {vec[2:6]})")
    sys.exit(2)


if __name__ == "__main__":
    main()
