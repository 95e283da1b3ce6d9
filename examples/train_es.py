#!/usr/bin/env python
"""Train an attacker policy with evolution strategies on the batched sim.

The reference exists "for testing and developing optimal control and RL
algorithms" (/root/reference/README.md:5) but trains nothing -- its sim
steps one game at a time through pybind11.  This example shows the point
of the TPU-native engine: a full ES training loop where EVERY candidate
policy is evaluated on its own game simultaneously (antithetic sampling,
one fused program per generation).

Task: a 2-layer tanh policy drives player A2 to score against a static
defense within T seconds. Reward: goals + progress shaping (puck velocity
toward the goal, player proximity to the puck).

Usage: python examples/train_es.py [--gens 30] [--pop 512] [--steps 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import A2, PUCK, SimParams
from robogame_tpu.physics.engine import step
from robogame_tpu.state import initial_state

OBS_DIM = 8          # own state (4) + puck state (4)
HID = 32
ACT_DIM = 2


def n_params():
    return OBS_DIM * HID + HID + HID * ACT_DIM + ACT_DIM


def policy_apply(theta, obs, input_limit):
    """theta (P,), obs (..., OBS_DIM) -> (..., 2) velocity command."""
    i = 0
    W1 = theta[i:i + OBS_DIM * HID].reshape(OBS_DIM, HID); i += OBS_DIM * HID
    b1 = theta[i:i + HID]; i += HID
    W2 = theta[i:i + HID * ACT_DIM].reshape(HID, ACT_DIM); i += HID * ACT_DIM
    b2 = theta[i:i + ACT_DIM]
    h = jnp.tanh(obs @ W1 + b1)
    return input_limit * jnp.tanh(h @ W2 + b2)


def make_eval(params: SimParams, n_steps: int, pop: int):
    goal = jnp.asarray([params.arena_x / 2.0, 0.0], jnp.float32)

    @jax.jit
    def evaluate(thetas, key):
        """thetas (pop, P) -> returns (pop,) episode rewards."""
        keys = jax.random.split(key, pop)
        k0 = jax.vmap(lambda k: jax.random.uniform(
            k, (2,), jnp.float32, -1.0, 1.0))(keys)
        x0 = jnp.concatenate([k0 * jnp.asarray([2.0, 1.5]),
                              jnp.zeros((pop, 2), jnp.float32)], axis=1)
        states = jax.vmap(lambda k, x: initial_state(params, x0_puck=x,
                                                     seed=k))(keys, x0)

        def body(carry, _):
            s = carry
            obs = jnp.concatenate([s.x[:, A2, :], s.x[:, PUCK, :]],
                                  axis=-1)
            u_a2 = jax.vmap(policy_apply, in_axes=(0, 0, None))(
                thetas, obs, params.input_limit)
            u = jnp.zeros((pop, 4, 2), jnp.float32).at[:, 1].set(u_a2)
            s2 = jax.vmap(lambda st, uu: step(st, uu, params))(s, u)
            # shaping: puck velocity toward goal + proximity to puck
            vx = s2.x[:, PUCK, 2]
            dist = jnp.linalg.norm(s2.x[:, A2, 0:2] - s2.x[:, PUCK, 0:2],
                                   axis=-1)
            r = 0.02 * vx - 0.01 * dist
            return s2, r

        final, rs = jax.lax.scan(body, states, None, length=n_steps)
        reward = rs.sum(0) + 10.0 * final.score[:, 0].astype(jnp.float32)
        return reward, final.score[:, 0]

    return evaluate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gens", type=int, default=30)
    ap.add_argument("--pop", type=int, default=512)   # must be even
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--sigma", type=float, default=0.05)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--engine", default="sweep",
                    choices=["sweep", "pallas"])
    args = ap.parse_args()

    params = SimParams(dt=0.05, winning_score=100, engine=args.engine,
                       dtype="float32")
    P = n_params()
    evaluate = make_eval(params, args.steps, args.pop)
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(0, 0.1, (P,)), jnp.float32)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for g in range(args.gens):
        key, ke, kn = jax.random.split(key, 3)
        eps = jax.random.normal(kn, (args.pop // 2, P), jnp.float32)
        eps = jnp.concatenate([eps, -eps])            # antithetic
        cand = theta[None] + args.sigma * eps
        rewards, goals = evaluate(cand, ke)
        r = (rewards - rewards.mean()) / (rewards.std() + 1e-8)
        grad = (r[:, None] * eps).mean(0) / args.sigma
        theta = theta + args.lr * grad
        if g % 5 == 0 or g == args.gens - 1:
            print(f"gen {g:3d}  reward {float(rewards.mean()):7.3f} "
                  f"(best {float(rewards.max()):7.3f})  "
                  f"goals/ep {float(goals.mean()):.3f}  "
                  f"[{time.time() - t0:.0f}s]", flush=True)

    # final greedy evaluation
    key, ke = jax.random.split(key)
    rewards, goals = evaluate(jnp.tile(theta[None], (args.pop, 1)), ke)
    print(f"trained policy: mean reward {float(rewards.mean()):.3f}, "
          f"goals/episode {float(goals.mean()):.3f} over {args.pop} games")


if __name__ == "__main__":
    main()
