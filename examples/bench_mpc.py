#!/usr/bin/env python
"""MPC benchmarks: solver throughput, closed-loop game throughput, and
single-game per-step latency vs the 50 ms real-time budget.

Modes:
  throughput   (default) batched open-loop DMPC solves/s on one chip --
               BASELINE.md metric "MPC solves/s/chip (2v2, H=20)".
  closed-loop  full CMPC-vs-CMPC or DMPC-vs-DMPC *games* (controllers +
               physics fused in one scan), vmapped over B games:
               games/s and control-steps/s.  The reference plays these
               one SNOPT solve at a time (/root/reference/py/
               run_centralized_sim.py:44-58, py/test_dmpc.py:39-47).
  latency      single-game per-step wall latency (one jitted step =
               both teams' solves + physics), vs the dt=0.05 s budget.

Examples:
  python examples/bench_mpc.py --batch 512
  python examples/bench_mpc.py --mode closed-loop --team cmpc --batch 64
  python examples/bench_mpc.py --mode latency --team dmpc
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from robogame_tpu.config import MpcParams, SimParams, StrategyParams
from robogame_tpu.control import dmpc
from robogame_tpu.physics.engine import step
from robogame_tpu.state import initial_state


def solver_throughput(args, params, mpc):
    B = args.batch
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (B, 4)) *
                     np.array([4, 2, 2, 2]), jnp.float32)
    xd = jnp.asarray(rng.uniform(-1, 1, (B, 4)) *
                     np.array([4, 2, 4, 4]), jnp.float32)
    obs = jnp.asarray(rng.uniform(-1, 1, (B, 3, 2)) *
                      np.array([4, 2]), jnp.float32)
    states = jax.vmap(lambda _: dmpc.initial_dmpc_state(mpc, jnp.float32))(
        jnp.arange(B))

    if args.xla:
        @jax.jit
        def solve_all(states, x0, xd, obs):
            return jax.vmap(lambda s, a, b, c: dmpc.compute_control(
                s, a, b, c, params, mpc))(states, x0, xd, obs)
    else:
        @jax.jit
        def solve_all(states, x0, xd, obs):
            return dmpc.compute_control_batch(states, x0, xd, obs,
                                              params, mpc)

    out = solve_all(states, x0, xd, obs)
    _ = np.asarray(out[1])          # host fetch = true synchronization
    # (block_until_ready alone has returned early through tunneled TPU
    # runtimes; chain the reps through the warm-start state so they
    # serialize, and end the timed region with a host fetch)
    n_rep = 5
    st = states
    t0 = time.perf_counter()
    for _ in range(n_rep):
        st, u = solve_all(st, x0, xd, obs)
    u = np.asarray(u)
    w = (time.perf_counter() - t0) / n_rep
    dev = jax.devices()[0].platform
    print(f"{B} DMPC solves (N={args.N}, t_grid={args.t_grid}, "
          f"sqp={args.sqp_iters}x{args.qp_iters}) in {w * 1e3:.1f} ms "
          f"on {dev}  ->  {B / w:,.0f} solves/s")
    assert np.isfinite(u).all()


def _make_team(team: str, params, mpc, strat, dtype):
    """Returns (initial_carry_fn, controls_fn(carry, s) -> (carry, u))."""
    if team == "cmpc":
        from robogame_tpu.agents.centralized import OFFENSE, team_step
        from robogame_tpu.control.cmpc import initial_cmpc_state
        play = jnp.asarray(OFFENSE, jnp.int32)

        def init():
            return (initial_cmpc_state(mpc, dtype),
                    initial_cmpc_state(mpc, dtype))

        def controls(carry, s):
            cs_a, cs_b = carry
            cs_a, u_a = team_step(cs_a, s.x, play, -1, params, mpc)
            cs_b, u_b = team_step(cs_b, s.x, play, 1, params, mpc)
            return (cs_a, cs_b), jnp.concatenate([u_a, u_b], axis=0)
    elif team == "dmpc":
        from robogame_tpu.agents.dmpc_team import (initial_team_state,
                                                   team_step)

        def init():
            return (initial_team_state(mpc, dtype),
                    initial_team_state(mpc, dtype))

        def controls(carry, s):
            ts_a, ts_b = carry
            ts_a, u_a = team_step(ts_a, s.x, -1, params, mpc, strat)
            ts_b, u_b = team_step(ts_b, s.x, 1, params, mpc, strat)
            return (ts_a, ts_b), jnp.concatenate([u_a, u_b], axis=0)
    elif team == "classical":
        # the flagship run_sim.py entry point: classical skills + the
        # centralized CBF safety filter (VERDICT r2 #8 latency row)
        from robogame_tpu.agents.classical import (initial_team_state,
                                                   team_policy)
        from robogame_tpu.config import CbfParams
        from robogame_tpu.control.cbf import safe_control
        cbf = CbfParams()

        def init():
            return (initial_team_state(dtype), initial_team_state(dtype))

        def controls(carry, s):
            ts_a, ts_b = carry
            ts_a, u_a = team_policy(ts_a, s.x, -1, params, strat)
            ts_b, u_b = team_policy(ts_b, s.x, 1, params, strat)
            u = jnp.concatenate([u_a, u_b], axis=0)
            u = safe_control(u, s.x[:4, 0:2], s.x[:4, 2:4], params,
                             cbf).u
            return (ts_a, ts_b), u
    elif team == "physics":
        # physics-only single-game step (the pallas kernel's latency row)
        def init():
            return jnp.zeros((), dtype)

        def controls(carry, s):
            return carry, jnp.zeros((4, 2), dtype)
    else:
        raise ValueError(team)
    return init, controls


def _make_team_batched(team: str, params, mpc, strat, dtype, B):
    """Batched-controls variant: (init() -> carry with leading B axis,
    controls(carry, states) -> (carry, u (B, 4, 2))).  For DMPC this
    routes both teams' solves through the lanes-batched Pallas QP kernel
    (agents.dmpc_team.team_step_batch) instead of vmapping per-game
    solves."""
    if team == "cmpc":
        from robogame_tpu.agents.centralized import (OFFENSE,
                                                     team_step_batch)
        from robogame_tpu.control.cmpc import initial_cmpc_state
        play = jnp.asarray(OFFENSE, jnp.int32)

        def init():
            one = (initial_cmpc_state(mpc, dtype),
                   initial_cmpc_state(mpc, dtype))
            return jax.tree.map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape), one)

        def controls(carry, s):
            cs_a, cs_b = carry
            cs_a, u_a = team_step_batch(cs_a, s.x, play, -1, params, mpc)
            cs_b, u_b = team_step_batch(cs_b, s.x, play, 1, params, mpc)
            return (cs_a, cs_b), jnp.concatenate([u_a, u_b], axis=1)
        return init, controls

    if team == "classical":
        # the run_sim flagship batched: all B x 5 candidate skill solves
        # of each team in one lanes-kernel launch (team_policy_batch, r5)
        # plus the lanes-batched centralized CBF filter
        from robogame_tpu.agents.classical import (initial_team_state,
                                                   team_policy_batch)
        from robogame_tpu.config import CbfParams
        from robogame_tpu.control.cbf import safe_control_batch
        cbf = CbfParams()

        def init():
            one = (initial_team_state(dtype), initial_team_state(dtype))
            return jax.tree.map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape), one)

        def controls(carry, s):
            ts_a, ts_b = carry
            ts_a, u_a = team_policy_batch(ts_a, s.x, -1, params, strat)
            ts_b, u_b = team_policy_batch(ts_b, s.x, 1, params, strat)
            u = jnp.concatenate([u_a, u_b], axis=1)
            u = safe_control_batch(u, s.x[:, :4, 0:2], s.x[:, :4, 2:4],
                                   params, cbf).u
            return (ts_a, ts_b), u
        return init, controls

    if team != "dmpc":
        init1, controls1 = _make_team(team, params, mpc, strat, dtype)

        def init():
            return jax.tree.map(
                lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                init1())

        def controls(carry, s):
            return jax.vmap(controls1)(carry, s)
        return init, controls

    from robogame_tpu.agents.dmpc_team import (initial_team_state,
                                               team_step_batch)

    def init():
        one = (initial_team_state(mpc, dtype),
               initial_team_state(mpc, dtype))
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), one)

    def controls(carry, s):
        ts_a, ts_b = carry
        ts_a, u_a = team_step_batch(ts_a, s.x, -1, params, mpc, strat)
        ts_b, u_b = team_step_batch(ts_b, s.x, 1, params, mpc, strat)
        return (ts_a, ts_b), jnp.concatenate([u_a, u_b], axis=1)
    return init, controls


def _batch_states(B, params):
    from robogame_tpu.parallel.monte_carlo import McParams, _initial_states
    return _initial_states(params, McParams(num_runs=B, randomize_x0=True,
                                            x0_vel_range=2.0))


def closed_loop(args, params, mpc, strat):
    """Full games: B x (controllers + physics) fused in one scan."""
    dtype = params.jdtype
    B, n_steps = args.batch, args.steps
    init, controls = _make_team_batched(args.team, params, mpc, strat,
                                        dtype, B)
    states = _batch_states(B, params)
    carries = init()

    @jax.jit
    def run_games(carries, states):
        def body(c, _):
            cs, s = c
            cs, u = controls(cs, s)
            s2 = jax.vmap(lambda st, uu: step(st, uu, params))(s, u)
            return (cs, s2), None
        (cs, final), _ = lax.scan(body, (carries, states), None,
                                  length=n_steps)
        return final

    t0 = time.perf_counter()
    final = run_games(carries, states)
    _ = np.asarray(final.score)
    t_first = time.perf_counter() - t0

    wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        final = run_games(carries, states)
        _ = np.asarray(final.score)
        wall = min(wall, time.perf_counter() - t0)
    dev = jax.devices()[0].platform
    print(f"closed-loop {args.team}: B={B} games x {n_steps} steps "
          f"(T={n_steps * params.dt:.0f}s) on {dev}: "
          f"compile+first {t_first:.1f}s, steady {wall:.2f}s -> "
          f"{B / wall:.2f} games/s, {B * n_steps / wall:,.0f} "
          f"control-steps/s, total goals "
          f"{int(np.asarray(final.score).sum())}, damage mean "
          f"{float(np.asarray(final.damage).sum((1, 2)).mean()):.2f}")


def latency(args, params, mpc, strat):
    """Single-game per-step latency: one jitted (controllers + physics)
    step, host loop -- the real-time deployment shape."""
    dtype = params.jdtype
    if args.team == "dmpc" and not args.xla:
        # lanes path at B=1: both agents' candidate QPs in one kernel
        initb, controlsb = _make_team_batched(args.team, params, mpc,
                                              strat, dtype, 1)
        init = initb

        def controls(carry, s):
            carry, u = controlsb(carry, jax.tree.map(
                lambda a: a[None], s))
            return carry, u[0]
    else:
        init1, controls1 = _make_team(args.team, params, mpc, strat,
                                      dtype)
        init = init1
        controls = controls1
    s = initial_state(params, x0_puck=[0.0, 0.5, 1.0, 0.0])
    carry = init()

    @jax.jit
    def one_step(carry, s):
        carry, u = controls(carry, s)
        return carry, step(s, u, params)

    carry2, s2 = one_step(carry, s)
    _ = np.asarray(s2.t)            # compile + warm
    n = args.steps
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        carry2, s2 = one_step(carry2, s2)
        _ = np.asarray(s2.t)        # per-step host sync, as deployed
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat) * 1e3
    dev = jax.devices()[0].platform
    print(f"latency {args.team}: per-step {np.median(lat):.1f} ms median "
          f"(p90 {np.percentile(lat, 90):.1f}, max {lat.max():.1f}) on "
          f"{dev}; budget {params.dt * 1e3:.0f} ms -> "
          f"{'REAL-TIME' if np.percentile(lat, 90) < params.dt * 1e3 else 'over budget'}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="throughput",
                    choices=["throughput", "closed-loop", "latency"])
    ap.add_argument("--team", default="dmpc",
                choices=["cmpc", "dmpc", "classical", "physics"],
                help="classical/physics: latency mode only "
                     "(run_sim.py flagship + kernel rows)")
    ap.add_argument("--batch", type=int, default=512,
                    help="solver instances / games")
    ap.add_argument("--steps", type=int, default=200,
                    help="game length in control steps (closed-loop), "
                         "or timed steps (latency)")
    ap.add_argument("--N", type=int, default=20)
    ap.add_argument("--t-grid", type=int, default=None,
                    help="default: 8 for throughput (round-1 metric "
                         "config), production MpcParams default otherwise")
    ap.add_argument("--sqp-iters", type=int, default=None)
    ap.add_argument("--qp-iters", type=int, default=None)
    ap.add_argument("--engine", default=None,
                    choices=["event", "sweep", "pallas",
                             "pallas_exact"],
                    help="physics engine for the fused step (default: "
                         "pallas_exact on TPU, sweep on CPU -- the "
                         "sweep engine costs ~30 ms/step at B=128 and "
                         "used to halve the closed-loop game rate)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--xla", action="store_true",
                    help="force the vmapped XLA solver path (default: "
                         "lanes-batched Pallas QP kernel where eligible)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.engine is None:
        args.engine = ("pallas_exact" if jax.default_backend() == "tpu"
                       else "sweep")

    # throughput mode keeps the round-1 metric config; closed-loop and
    # latency run the production MpcParams defaults (the config the games
    # actually need to converge)
    fast = args.mode == "throughput"
    mpc = MpcParams(
        N=args.N,
        t_grid=args.t_grid or (8 if fast else MpcParams.t_grid),
        sqp_iters=args.sqp_iters or (3 if fast else MpcParams.sqp_iters),
        qp_iters=args.qp_iters or (60 if fast else MpcParams.qp_iters))
    args.t_grid, args.sqp_iters, args.qp_iters = (mpc.t_grid,
                                                  mpc.sqp_iters,
                                                  mpc.qp_iters)

    params = SimParams(dtype="float32", engine=args.engine,
                       winning_score=100)
    strat = StrategyParams()

    if args.mode == "throughput":
        solver_throughput(args, params, mpc)
    elif args.mode == "closed-loop":
        closed_loop(args, params, mpc, strat)
    else:
        latency(args, params, mpc, strat)


if __name__ == "__main__":
    main()
