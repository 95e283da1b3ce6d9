#!/usr/bin/env python
"""Batch-size + noise sweep of the headline Monte-Carlo physics benchmark.

Same honest workload as bench.py (per-game independent piecewise-constant
schedules, full 20 s games, winning_score=4 so the decided freeze is
live), measured at B in {256, 2048, 8192} with the pallas engine plus a
stochastic-noise variant (w=1.0; noise draws via jax.random outside the
kernel, physics/sweep.populate_noise).  Results are recorded in
BASELINE.md.

Usage: python examples/bench_sweep.py [--quick]
"""

import json
import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax  # noqa: E402

from bench import (B, HOLD, N_STEPS, REFERENCE_STEPS_PER_SEC,  # noqa: E402
                   make_inputs, make_run, time_run)


def main():
    quick = "--quick" in sys.argv
    n_steps = 40 if quick else N_STEPS
    sizes = [256, 2048] if quick else [256, 2048, 8192]
    results = []
    for engine in ("pallas_exact", "pallas"):
        for b in sizes:
            _, run = make_run(engine, b, n_steps)
            states, u_base = make_inputs(b, n_steps)
            wall = time_run(run, states, u_base)
            sps = b * n_steps / wall
            results.append(dict(
                B=b, engine=engine, noise=0.0,
                steps_per_sec=round(sps, 1),
                vs_ref=round(sps / REFERENCE_STEPS_PER_SEC, 2)))
            print(json.dumps(results[-1]), flush=True)

    # stochastic variants at the headline batch size (the exact kernel
    # gained the reference-structure noise model in round 5)
    b = 2048
    for engine in ("pallas", "pallas_exact"):
        _, run = make_run(engine, b, n_steps, stochastic=True)
        states, u_base = make_inputs(b, n_steps)
        wall = time_run(run, states, u_base)
        sps = b * n_steps / wall
        results.append(dict(B=b, engine=engine, noise=1.0,
                            steps_per_sec=round(sps, 1),
                            vs_ref=round(sps / REFERENCE_STEPS_PER_SEC,
                                         2)))
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
