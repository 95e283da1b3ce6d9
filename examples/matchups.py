#!/usr/bin/env python
"""Reproduce the reference's matchup record statistically.

The reference's de-facto expected-behavior record is its ``videos/``
matchups (bl_vs_bl_4.mp4, dmpc_vs_cmpc_4.mp4, dmpc_vs_cmpc_cbf_4.mp4 --
single games) and the mc_example_1/2 Monte-Carlo sweeps whose score/
damage histograms matlab/interpret_mc_results.m:52-96 plots.  Here every
matchup is a *batched* MC sweep (vmapped games, one XLA program) and the
qualitative invariants of that record are asserted:

* controllers play: games produce goals;
* the centralized CBF filter reduces collision damage
  (mc_example_1 vs mc_example_2, /root/reference/py/mc_example_[12].py);
* MPC teams beat no-ops and are competitive with each other
  (dmpc_vs_cmpc videos).

Team pairings follow the reference harnesses: classical
(py/mc_example_1.py:44), CMPC (py/run_centralized_sim.py:40-58), DMPC
(py/test_dmpc.py:33-47); the optional CBF is the reference's centralized
4-player filter applied to both teams' nominal controls
(py/MonteCarlo.py:41-43).

Usage:
  python examples/matchups.py [--runs 64] [--T 20] [--quick] [--cpu]
                              [--only classical_cbf,...] [--json out.json]

Results are recorded in BASELINE.md (matchup table).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import (CbfParams, MpcParams, SimParams,
                                 StrategyParams)
from robogame_tpu.control.cbf import safe_control_batch
from robogame_tpu.parallel.monte_carlo import McParams, monte_carlo


def make_team(kind, field, params, mpc, strat, dtype):
    """(init() -> carry, step_batch(carry, x (B,5,4)) -> (carry,
    u (B,2,2))) for one team of the given kind on the given field side.
    DMPC routes through the lanes-batched Pallas QP kernel
    (agents.dmpc_team.team_step_batch); the rest vmap per game."""
    if kind == "classical":
        from robogame_tpu.agents.classical import (initial_team_state,
                                                   team_policy_batch)
        # all B x 5 candidate skill solves in one lanes-kernel launch
        # (min_time_traj_batch) -- ~the whole cost of this pairing
        return (lambda: initial_team_state(dtype),
                lambda ts, x: team_policy_batch(ts, x, field, params,
                                                strat))
    if kind == "cmpc":
        from robogame_tpu.agents.centralized import (OFFENSE,
                                                     team_step_batch)
        from robogame_tpu.control.cmpc import initial_cmpc_state
        play = jnp.asarray(OFFENSE, jnp.int32)
        return (lambda: initial_cmpc_state(mpc, dtype),
                lambda cs, x: team_step_batch(cs, x, play, field, params,
                                              mpc))
    if kind == "dmpc":
        from robogame_tpu.agents.dmpc_team import (initial_team_state,
                                                   team_step_batch)
        return (lambda: initial_team_state(mpc, dtype),
                lambda ts, x: team_step_batch(ts, x, field, params, mpc,
                                              strat))
    if kind == "noop":
        return (lambda: jnp.zeros((), dtype),
                lambda ts, x: (ts, jnp.zeros((x.shape[0], 2, 2), dtype)))
    raise ValueError(kind)


def make_policy(kind_a, kind_b, use_cbf, params, mpc, strat, cbf, B):
    dtype = params.jdtype
    init_a, step_a = make_team(kind_a, -1, params, mpc, strat, dtype)
    init_b, step_b = make_team(kind_b, 1, params, mpc, strat, dtype)

    def policy(carry, states):
        ca, cb = carry
        ca, u_a = step_a(ca, states.x)
        cb, u_b = step_b(cb, states.x)
        u = jnp.concatenate([u_a, u_b], axis=1)         # (B, 4, 2)
        if use_cbf:
            u = safe_control_batch(u, states.x[:, :4, 0:2],
                                   states.x[:, :4, 2:4], params, cbf).u
        return (ca, cb), u

    def batched_init():
        ca, cb = init_a(), init_b()
        return jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                            (ca, cb))

    return policy, batched_init


# (name, team_a, team_b, cbf) -- the reference's recorded matchups
MATCHUPS = [
    ("classical_cbf",   "classical", "classical", True),   # mc_example_1
    ("classical_nocbf", "classical", "classical", False),  # mc_example_2
    ("cmpc_vs_cmpc",    "cmpc",      "cmpc",      False),  # bl_vs_bl_4
    ("dmpc_vs_cmpc",    "dmpc",      "cmpc",      False),  # dmpc_vs_cmpc_4
    ("dmpc_vs_cmpc_cbf", "dmpc",     "cmpc",      True),   # ..._cbf_4
    ("dmpc_vs_noop",    "dmpc",      "noop",      False),  # sanity: scores
]


def run_matchup(name, kind_a, kind_b, use_cbf, args, params, mpc, strat,
                cbf):
    B = args.runs
    mc = McParams(num_runs=B, T=args.T, randomize_x0=True,
                  x0_pos_range=(1.0, 0.5), x0_vel_range=2.0)
    policy, binit = make_policy(kind_a, kind_b, use_cbf, params, mpc,
                                strat, cbf, B)
    t0 = time.time()
    res = monte_carlo(params, mc, policy=policy, policy_state=binit(),
                      chunk_steps=args.chunk)
    sc = np.asarray(res.scores)
    dmg = np.asarray(res.damage).sum((1, 2))
    wall = time.time() - t0
    n_steps = int(np.ceil(args.T / params.dt))
    out = dict(
        matchup=name, games=B, T=args.T,
        goals_a=float(sc[:, 0].mean()), goals_b=float(sc[:, 1].mean()),
        wins_a=int((sc[:, 0] > sc[:, 1]).sum()),
        wins_b=int((sc[:, 1] > sc[:, 0]).sum()),
        draws=int((sc[:, 0] == sc[:, 1]).sum()),
        damage_mean=float(dmg.mean()), damage_std=float(dmg.std()),
        damage_hist=np.histogram(dmg, bins=8)[0].tolist(),
        score_hist_a=np.bincount(sc[:, 0], minlength=5).tolist(),
        score_hist_b=np.bincount(sc[:, 1], minlength=5).tolist(),
        wall_s=round(wall, 1),
        games_per_s=round(B / wall, 2),
        steps_per_s=round(B * n_steps / wall, 1),
    )
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=64)
    ap.add_argument("--T", type=float, default=20.0)
    ap.add_argument("--quick", action="store_true",
                    help="8 games x 5 s (CI smoke)")
    ap.add_argument("--only", default=None,
                    help="comma-separated matchup names")
    ap.add_argument("--json", default=None, help="write results here")
    ap.add_argument("--chunk", type=int, default=100,
                    help="max control steps per XLA execution (host-synced "
                         "chunking; the tunneled TPU worker kills single "
                         "executions beyond ~60-90 s wall -- NOTES.md r3)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--engine", default=None,
                    help="physics engine override (default: the shipped "
                         "production default -- pallas_exact on TPU, "
                         "sweep on CPU where the interpreted kernel is "
                         "slower than the XLA path)")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the qualitative-invariant assertions")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.quick:
        args.runs, args.T = 8, 5.0

    # default to the production stack: the flagship record must measure
    # the physics users actually get (VERDICT r4: the sweep default here
    # silently benchmarked non-default physics at a fraction of the
    # speed -- ~30 ms/step at B=128, more than both teams' solves)
    engine = args.engine or ("sweep" if jax.default_backend() == "cpu"
                             else "pallas_exact")
    params = SimParams(dt=0.05, winning_score=4, engine=engine)
    mpc = MpcParams()
    strat = StrategyParams()
    cbf = CbfParams()

    names = (args.only.split(",") if args.only
             else [m[0] for m in MATCHUPS])
    results = {}
    for name, ka, kb, use_cbf in MATCHUPS:
        if name not in names:
            continue
        results[name] = run_matchup(name, ka, kb, use_cbf, args, params,
                                    mpc, strat, cbf)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)

    if not args.no_check and not args.only:
        r = results
        # CBF reduces collision damage (mc_example_1 vs 2's record)
        assert (r["classical_cbf"]["damage_mean"]
                < r["classical_nocbf"]["damage_mean"]), "CBF damage"
        assert (r["dmpc_vs_cmpc_cbf"]["damage_mean"]
                < r["dmpc_vs_cmpc"]["damage_mean"]), "CBF damage (mpc)"
        # controllers actually score
        total = lambda m: r[m]["goals_a"] + r[m]["goals_b"]
        assert total("classical_nocbf") > 0, "classical scores"
        assert r["dmpc_vs_noop"]["goals_a"] > 0, "dmpc scores"
        print("# qualitative invariants: PASS", flush=True)


if __name__ == "__main__":
    main()
