#!/usr/bin/env python
"""Monte-Carlo scaling sweep across a device mesh.

Measures games/s with the batch sharded over 1, 2, ..., N devices and
reports scaling efficiency (BASELINE.md target: >= 0.8 at 1 -> 32 chips).

On a multi-chip slice this runs as-is over the real mesh (launch one
process per host with the same arguments; robogame_tpu.parallel.mesh.
init_distributed wires jax.distributed).  On a single-chip/dev machine,
``--virtual N`` forces an N-device virtual CPU mesh so the sharding path
itself is exercised (absolute numbers then reflect CPU, not TPU).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force an N-device virtual CPU mesh")
    ap.add_argument("--games-per-device", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--engine", default="sweep",
                    choices=["sweep", "pallas"])
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.virtual}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from robogame_tpu.config import SimParams
    from robogame_tpu.parallel.mesh import make_mesh
    from robogame_tpu.parallel.monte_carlo import McParams, monte_carlo

    n_dev = len(jax.devices())
    if args.virtual:
        print("NOTE: virtual CPU devices share the same physical cores -- "
              "efficiency here validates the sharding path, not hardware "
              "scaling (run on a real slice for BASELINE numbers)")
    params = SimParams(dtype="float32", engine=args.engine)
    results = {}
    d = 1
    sizes = []
    while d <= n_dev:
        sizes.append(d)
        d *= 2
    if sizes[-1] != n_dev:
        sizes.append(n_dev)

    for nd in sizes:
        mesh = make_mesh(nd)
        B = args.games_per_device * nd
        mc = McParams(num_runs=B, T=args.steps * params.dt,
                      randomize_x0=True)
        # warmup/compile
        res = monte_carlo(params, mc, mesh=mesh)
        jax.block_until_ready(res.scores)
        t0 = time.perf_counter()
        res = monte_carlo(params, mc, mesh=mesh)
        jax.block_until_ready(res.scores)
        w = time.perf_counter() - t0
        rate = B * args.steps / w
        results[nd] = rate
        base = results[sizes[0]] * nd / sizes[0]
        eff = rate / base
        print(f"devices={nd:3d}  B={B:6d}  steps/s={rate:12,.0f}  "
              f"scaling_eff={eff:.2f}")

    return results


if __name__ == "__main__":
    main()
