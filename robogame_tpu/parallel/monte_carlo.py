"""Batched, sharded Monte-Carlo game sweeps.

Capability spec: /root/reference/py/MonteCarlo.py runs ``num_runs`` games
*sequentially*, each seeded ``i``, writing one binary log per run plus a
``configuration.txt``.  Here all games run lockstep as one XLA program:
``vmap`` over the game batch (sharded across the device mesh) and
``lax.scan`` over control steps.  Result aggregation (score/damage
statistics, the histograms of /root/reference/matlab/interpret_mc_results.m)
is a cross-game reduction XLA lowers to ICI collectives.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import SimParams
from ..physics.engine import step
from ..physics.rollout import log_record
from ..state import GameState, initial_state
from .mesh import shard_batch


@dataclasses.dataclass(frozen=True)
class McParams:
    """Mirrors the reference's MC configuration record
    (/root/reference/py/MonteCarlo.py:15-18)."""
    num_runs: int = 4
    T: float = 10.0
    log_prefix: str = "mc_out"
    randomize_x0: bool = False       # extension: random puck initial states
    x0_ball: tuple = (0.0, 0.0, 0.0, 0.0)
    x0_pos_range: tuple = (2.0, 1.0)   # |x|,|y| ranges when randomizing
    x0_vel_range: float = 4.0

    @property
    def n_steps(self):
        return None  # computed from SimParams.dt at call time


class McResult(NamedTuple):
    scores: jax.Array    # (B, 2) int32 final scores
    damage: jax.Array    # (B, 4, 4)
    t_final: jax.Array   # (B,)


def _initial_states(params: SimParams, mc: McParams) -> GameState:
    """Batch of initial states, seeds 1..num_runs (MonteCarlo.py:28)."""
    seeds = jnp.arange(1, mc.num_runs + 1, dtype=jnp.uint32)
    keys = jax.vmap(jax.random.PRNGKey)(seeds)
    if mc.randomize_x0:
        def mk(key):
            k0, k1, krest = jax.random.split(key, 3)
            pr = jnp.asarray(mc.x0_pos_range, params.jdtype)
            pos = jax.random.uniform(k0, (2,), params.jdtype, -1.0, 1.0) * pr
            vel = jax.random.uniform(k1, (2,), params.jdtype,
                                     -mc.x0_vel_range, mc.x0_vel_range)
            return initial_state(params, x0_puck=jnp.concatenate([pos, vel]),
                                 seed=krest)
        return jax.vmap(mk)(keys)
    x0 = jnp.asarray(mc.x0_ball, params.jdtype)
    return jax.vmap(
        lambda k: initial_state(params, x0_puck=x0, seed=k))(keys)


@functools.partial(jax.jit,
                   static_argnames=("params", "n_steps", "policy", "log"))
def _run_batch(states: GameState, params: SimParams, n_steps: int,
               policy: Callable | None, policy_state=None, log: bool = False):
    """scan over time of the vmapped step; policy is an optional jittable
    ``(policy_state, states_batch) -> (policy_state, controls (B,4,2))``."""
    B = states.score.shape[0]

    def body(carry, _):
        s, ps = carry
        if policy is None:
            u = jnp.zeros((B, 4, 2), params.jdtype)
            ps2 = ps
        else:
            ps2, u = policy(ps, s)
        if params.engine in ("pallas", "pallas_exact"):
            from ..physics.pallas_step import step_pallas_batch
            s2 = step_pallas_batch(s, u, params)
        else:
            s2 = jax.vmap(lambda st, uu: step(st, uu, params))(s, u)
        rec = jax.vmap(log_record)(s2) if log else None
        return (s2, ps2), rec

    (final, ps_final), recs = lax.scan(body, (states, policy_state), None,
                                       length=n_steps)
    return final, ps_final, recs


def _run_batch_chunked(states: GameState, params: SimParams, n_steps: int,
                       policy, policy_state, log: bool, chunk_steps: int):
    """Host-chunked rollout: the n_steps scan is split into segments of at
    most ``chunk_steps`` steps, each its own XLA execution with the
    (states, policy_state) carry returned to host between segments.

    Rationale (NOTES.md round-3): any single XLA execution running longer
    than ~60-90 s wall crashes the tunneled TPU worker ("TPU worker
    process crashed") -- reproduced with a plain matmul scan, independent
    of program content or trip count.  Long closed-loop policy rollouts
    (classical team at B>=64 over full 400-step games, the VERDICT r2 #3
    workload) exceed that budget in one execution; chunking keeps each
    execution safely under it at the cost of one host sync per chunk.
    Segment results are bit-identical to the single-scan rollout (the
    scan carry is exactly the chunk boundary state)."""
    final, recs_parts = states, []
    done = 0
    while done < n_steps:
        n = min(chunk_steps, n_steps - done)
        final, policy_state, recs = _run_batch(final, params, n, policy,
                                               policy_state, log)
        if log:
            recs_parts.append(jax.tree.map(np.asarray, recs))
        else:
            jax.block_until_ready(final.score)
        done += n
    if log:
        recs = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0),
                            *recs_parts)
    else:
        recs = None
    return final, recs


def monte_carlo(params: SimParams, mc: McParams,
                policy: Callable | None = None, policy_state=None,
                mesh=None, log: bool = False,
                write_config: bool = False,
                chunk_steps: int | None = None) -> McResult:
    """Run the full sweep.  With ``mesh`` given, the game batch is sharded
    across devices; ``num_runs`` that does not divide the device count is
    padded with duplicate games (results sliced back to ``num_runs``).  The
    pallas engine additionally runs per-shard under shard_map so each
    device drives its own kernel grid -- no cross-device gathers.

    ``chunk_steps``: split the rollout into host-synced XLA executions of
    at most this many control steps (bit-identical results) -- required
    for heavy closed-loop policies whose full-game single execution would
    exceed the tunneled worker's ~60-90 s execution budget (see
    _run_batch_chunked)."""
    n_steps = int(np.ceil(mc.T / params.dt))
    states = _initial_states(params, mc)
    n_pad = 0
    if mesh is not None:
        n_dev = mesh.devices.size
        rem = mc.num_runs % n_dev
        if rem:
            n_pad = n_dev - rem
            pad_idx = jnp.arange(n_pad) % mc.num_runs
            states = jax.tree.map(
                lambda a: jnp.concatenate([a, a[pad_idx]], axis=0), states)
        states = shard_batch(states, mesh)
    if (mesh is not None
            and params.engine in ("pallas", "pallas_exact")
            and policy is None and not log):
        final, recs = _run_batch_shard_map(states, params, n_steps,
                                           mesh), None
    elif chunk_steps is not None and chunk_steps < n_steps:
        final, recs = _run_batch_chunked(states, params, n_steps, policy,
                                         policy_state, log, chunk_steps)
    else:
        final, _, recs = _run_batch(states, params, n_steps, policy,
                                    policy_state, log)
    if write_config:
        write_configuration(params, mc)
    if n_pad:
        final = jax.tree.map(lambda a: a[:mc.num_runs], final)
        if recs is not None:
            recs = recs[:, :mc.num_runs]
    res = McResult(scores=final.score, damage=final.damage, t_final=final.t)
    return (res, recs) if log else res


def _run_batch_shard_map(states: GameState, params: SimParams,
                         n_steps: int, mesh) -> GameState:
    """Policy-free sweep with the pallas kernel under shard_map: every
    device runs its own kernel over its local batch shard (no cross-
    device gathers around the pallas_call)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..physics.pallas_step import step_pallas_batch
    from .mesh import BATCH_AXIS

    spec = jax.tree.map(lambda _: P(BATCH_AXIS), states)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec,),
                       out_specs=spec, check_vma=False)
    def run_shard(s):
        B = s.score.shape[0]
        u = jnp.zeros((B, 4, 2), params.jdtype)

        def body(c, _):
            return step_pallas_batch(c, u, params), None

        final, _ = lax.scan(body, s, None, length=n_steps)
        return final

    return jax.jit(run_shard)(states)


def write_configuration(params: SimParams, mc: McParams) -> None:
    """Reference-compatible configuration.txt: 13 scalars, one per line
    (/root/reference/py/MonteCarlo.py:14-21)."""
    os.makedirs(mc.log_prefix, exist_ok=True)
    vals = [mc.num_runs, mc.T, params.dt, params.winning_score,
            mc.x0_ball[0], mc.x0_ball[1], mc.x0_ball[2], mc.x0_ball[3],
            params.noise, params.tau_puck, params.tau_player,
            params.player_mass, params.puck_mass]
    with open(os.path.join(mc.log_prefix, "configuration.txt"), "w") as f:
        for v in vals:
            f.write(str(v) + "\n")


def aggregate(res: McResult) -> dict:
    """Cross-game statistics (the interpret_mc_results.m histograms as
    moments); under a sharded batch this lowers to ICI collectives."""
    scores = res.scores.astype(jnp.float32)
    return dict(
        games=res.scores.shape[0],
        mean_score_a=float(scores[:, 0].mean()),
        mean_score_b=float(scores[:, 1].mean()),
        wins_a=int((res.scores[:, 0] > res.scores[:, 1]).sum()),
        wins_b=int((res.scores[:, 1] > res.scores[:, 0]).sum()),
        mean_total_damage=float(res.damage.sum(axis=(1, 2)).mean()),
    )
