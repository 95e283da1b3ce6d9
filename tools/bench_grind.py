#!/usr/bin/env python
"""Corner-grind / MC-window kernel ablation bench (TPU).

The corner family (all players schedule-pinned into a corner) grinds the
exact kernel's event loop at the full reference cap -- one wall event
per grid column -- and is the workload the incremental-re-detection and
feedback-loop levers target (BASELINE.md r4b decomposition: re-detect
27%, feedback 24.5% of an event-loop iteration).  The uniform family is
the MC mix (~92% of steps finish in one iteration).

Methodology (NOTES.md): chained reps, host fetch closes the timed
region, first window after compile discarded, ~30 ms fixed dispatch
overhead per execution subtracted via the two-window trick when windows
are short.

Run: python tools/bench_grind.py [--batch 2048] [--steps 40] [--reps 3]
"""

import argparse
import os
import sys
import time
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--families", default="corner,uniform")
    ap.add_argument("--engine", default="pallas_exact")
    ap.add_argument("--two-phase", action="store_true",
                    help="two-phase kernel (default one-phase: the "
                         "event-loop stressor)")
    ap.add_argument("--detect", default="auto",
                    choices=["auto", "blocked", "monolithic"],
                    help="force the detect variant (A/B ablation)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import dist_equiv
    from robogame_tpu.config import SimParams
    from robogame_tpu.physics import pallas_step as psm
    from robogame_tpu.physics.pallas_step import step_pallas_batch

    if args.detect != "auto":
        psm._FORCE_BLOCKED_DETECT = args.detect == "blocked"

    B, n = args.batch, args.steps
    params = SimParams(dtype="float32", engine=args.engine,
                       two_phase=args.two_phase)

    for family in args.families.split(","):
        states = dist_equiv.make_states(B, None, params)
        sched = jnp.asarray(dist_equiv.make_sched(
            family, B, n, seed=zlib.crc32(family.encode()) % 2**31))

        @jax.jit
        def run(s, u):
            def body(c, uk):
                return step_pallas_batch(c, uk, params), None
            f, _ = lax.scan(body, s, u)
            return f

        f = run(states, sched)                      # compile + warm
        cks = float(np.asarray(f.damage).sum())
        rates = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            f = run(f, sched)                       # chained
            _ = float(np.asarray(f.x).sum())        # host fetch
            rates.append(B * n / (time.perf_counter() - t0))
        print(f"{family:8s} {args.engine} two_phase={args.two_phase} "
              f"B={B} steps/s best={max(rates):,.0f} "
              f"all={[f'{r:,.0f}' for r in rates]} dmg_ck={cks:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
