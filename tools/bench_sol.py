#!/usr/bin/env python
"""Speed-of-light / utilization measurement for the exact kernel (r5).

Measures the exact kernel's per-tile event-loop-iteration cost by
sweeping the event cap on the corner grind (every lane grinds at the
cap, so trips == cap and the time-vs-cap slope is the iteration cost),
plus the populate+detect+I/O floor from the cap->1 intercept, and the
uniform-workload two-phase step cost for the headline context.

Methodology: chained reps + host fetch (NOTES.md); 40-step scans
amortize the ~30 ms tunnel dispatch constant, and the slope method
cancels it entirely.

Run: python tools/bench_sol.py [--batch 2048]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import dist_equiv
    from robogame_tpu.config import SimParams
    from robogame_tpu.physics.pallas_step import TILE, step_pallas_batch

    B, n = args.batch, args.steps
    tiles = B // TILE

    def timed(params, family):
        states = dist_equiv.make_states(B, None, params)
        sched = jnp.asarray(dist_equiv.make_sched(
            family, B, n, seed=zlib.crc32(family.encode()) % 2**31))

        @jax.jit
        def run(s, u):
            def body(c, uk):
                return step_pallas_batch(c, uk, params), None
            f, _ = lax.scan(body, s, u)
            return f

        f = run(states, sched)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            f = run(f, sched)
            _ = float(np.asarray(f.x).sum())
            best = min(best, time.perf_counter() - t0)
        return best / n            # seconds per batch step

    print(f"# B={B} tiles={tiles} steps={n}", flush=True)
    rows = []
    for cap in (2, 9, 25, 49):
        p = SimParams(dtype="float32", engine="pallas_exact",
                      two_phase=False, collision_counter_lim=cap + 1)
        t = timed(p, "corner")
        rows.append((cap, t))
        print(f"cap={cap:3d}  step={t*1e3:8.3f} ms  "
              f"({B*1.0/t:,.0f} steps/s)", flush=True)
    # least-squares slope over the cap sweep: per-iteration cost for the
    # whole batch; /tiles = per-tile-iteration (tiles serialize through
    # the kernel grid)
    caps = np.array([r[0] for r in rows], float)
    ts = np.array([r[1] for r in rows], float)
    A = np.vstack([caps, np.ones_like(caps)]).T
    slope, intercept = np.linalg.lstsq(A, ts, rcond=None)[0]
    print(f"slope: {slope*1e6:.2f} us/iteration (batch) = "
          f"{slope*1e6/tiles:.2f} us/tile-iteration; "
          f"intercept (populate+detect+glue+dispatch): "
          f"{intercept*1e3:.3f} ms", flush=True)

    p_head = SimParams(dtype="float32", engine="pallas_exact",
                       two_phase=True)
    t_u = timed(p_head, "uniform")
    print(f"uniform two-phase: step={t_u*1e3:.3f} ms "
          f"({B/t_u:,.0f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
