"""Generate golden parity fixtures by driving the *compiled reference* C++
sim (built out-of-tree from /root/reference, never copied into this repo)
with deterministic scripted velocity schedules.

Outputs per scenario under tests/golden/:
  <name>.sched.txt   the velocity schedule (one line per step, 8 floats)
  <name>.log         reference binary trajectory (29 doubles / step)
  <name>.final       reference final 22-state vector
  <name>.json        scenario parameters

Usage: python tools/gen_goldens.py <path-to-oracle-binary>
"""

import json
import os
import subprocess
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

SCENARIOS = {
    # name: (T, dt, x0_ball, seed_for_schedule, style, extra)
    "zeros_20s": dict(T=20.0, dt=0.05, x0=[-1, 0, 0, 0], style="zeros"),
    "swirl_20s": dict(T=20.0, dt=0.05, x0=[0, 0, 0, 0], style="swirl"),
    "random_100s": dict(T=100.0, dt=0.05, x0=[0, 0, 3.0, 1.5],
                        style="random", sched_seed=7),
    "kick_goal_10s": dict(T=10.0, dt=0.05, x0=[-1, 0, 0, 0], style="kick"),
    "bouncy_tau1_20s": dict(T=20.0, dt=0.05, x0=[0, 0.3, 2.0, 1.0],
                            style="random", sched_seed=3, tau_puck=1.0),
    "winning_score_1": dict(T=20.0, dt=0.05, x0=[4.0, 0, 6.0, 0],
                            style="zeros", winning_score=1),
    # goal + post-goal puck reset under random play (puck decay rate is
    # 0.2/tau_puck = 2/s, so range = v0/2; start close enough to reach goal)
    "goals_random_60s": dict(T=60.0, dt=0.05, x0=[3.2, 0.1, 9.0, 0.0],
                             style="random", sched_seed=11,
                             winning_score=3),
    # non-default physical parameters: heavy slow puck, sluggish players
    "heavy_puck_20s": dict(T=20.0, dt=0.05, x0=[0.5, -0.2, 1.5, 0.8],
                           style="random", sched_seed=21, puck_mass=2.0,
                           player_mass=1.5),
    "slow_players_20s": dict(T=20.0, dt=0.05, x0=[-0.5, 0.2, 2.0, -1.0],
                             style="swirl", tau_player=1.2),
}


def make_schedule(cfg, n_steps):
    style = cfg["style"]
    t = np.arange(n_steps) * cfg["dt"]
    if style == "zeros":
        return np.zeros((n_steps, 8))
    if style == "swirl":
        s = np.zeros((n_steps, 8))
        for k in range(4):
            s[:, 2 * k] = 3.0 * np.cos(t + k * np.pi / 2)
            s[:, 2 * k + 1] = 3.0 * np.sin(t + k * np.pi / 2)
        return s
    if style == "random":
        rng = np.random.default_rng(cfg.get("sched_seed", 0))
        # piecewise-constant aggressive commands, changing every 10 steps
        n_seg = n_steps // 10 + 1
        seg = rng.uniform(-8, 8, (n_seg, 8))
        return np.repeat(seg, 10, axis=0)[:n_steps]
    if style == "kick":
        s = np.zeros((n_steps, 8))
        s[:, 0] = 6.0   # A1 drives right into the puck, toward right goal
        s[:, 1] = 0.0
        s[:, 6] = -2.0  # B2 drives left
        return s
    raise ValueError(style)


def main(oracle):
    os.makedirs(OUT, exist_ok=True)
    for name, cfg in SCENARIOS.items():
        n_steps = int(round(cfg["T"] / cfg["dt"]))
        sched = make_schedule(cfg, n_steps)
        spath = os.path.join(OUT, f"{name}.sched.txt")
        np.savetxt(spath, sched, fmt="%.17g")
        log = os.path.join(OUT, f"{name}.log")
        args = [oracle, spath, log,
                str(cfg["dt"]), str(cfg["T"]),
                str(cfg.get("winning_score", 100)),
                *[str(v) for v in cfg["x0"]],
                str(cfg.get("noise", 0.0)), str(cfg.get("seed", 0)),
                str(cfg.get("tau_puck", 0.1)),
                str(cfg.get("tau_player", 0.5)),
                str(cfg.get("player_mass", 1.0)),
                str(cfg.get("puck_mass", 0.5))]
        subprocess.run(args, check=True)
        meta = dict(cfg)
        meta["n_steps"] = n_steps
        with open(os.path.join(OUT, f"{name}.json"), "w") as f:
            json.dump(meta, f, indent=1)
        print(name, "->", log)


if __name__ == "__main__":
    main(sys.argv[1])
