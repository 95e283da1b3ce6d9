#!/usr/bin/env python
"""MPC solver throughput: batched DMPC solves/s on one chip.

BASELINE.md metric "MPC solves/s/chip (2v2, H=20)".  One 'solve' is a
full free-final-time DMPC compute_control: t_grid candidate final times x
sqp_iters warm-started SQP iterations, each an ADMM condensed QP
(nU = 2N variables, input/arena boxes + 3 neighbor keep-outs).

The reference solves these one at a time through pydrake SNOPT (~tens of
ms each); here thousands of (game x agent) instances solve lockstep.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import MpcParams, SimParams
from robogame_tpu.control import dmpc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512,
                    help="independent solver instances (games x agents)")
    ap.add_argument("--N", type=int, default=20)
    ap.add_argument("--t-grid", type=int, default=8)
    ap.add_argument("--sqp-iters", type=int, default=3)
    ap.add_argument("--qp-iters", type=int, default=60)
    args = ap.parse_args()

    params = SimParams(dtype="float32")
    mpc = MpcParams(N=args.N, t_grid=args.t_grid,
                    sqp_iters=args.sqp_iters, qp_iters=args.qp_iters)
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

    @jax.jit
    def solve_all(states, x0, xd, obs):
        return jax.vmap(lambda s, a, b, c: dmpc.compute_control(
            s, a, b, c, params, mpc))(states, x0, xd, obs)

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


if __name__ == "__main__":
    main()
