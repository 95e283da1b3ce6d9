"""Batched trajectory rollouts: ``lax.scan`` over time, ``vmap`` over games.

The reference drives games with a Python while-loop calling ``sim.run`` once
per control step through pybind11 (/root/reference/py/run_sim.py:56-75); here
a whole game (or a batch of thousands) is one compiled XLA program.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import A1, A2, B1, B2, PUCK, SimParams
from ..state import GameState
from .engine import step


class LogRecord(NamedTuple):
    """One 29-field log record per control step, matching the reference's
    binary log layout (/root/reference/src/GameSim.cpp:160-170):
    t, scoreA, scoreB, puck/A1/A2/B1/B2 positions (2 each), damage (4x4)."""
    t: jax.Array          # ()
    score: jax.Array      # (2,)
    positions: jax.Array  # (5, 2) in log order [puck, A1, A2, B1, B2]
    damage: jax.Array     # (4, 4)


def log_record(state: GameState) -> LogRecord:
    pos = state.x[:, 0:2]
    order = jnp.array([PUCK, A1, A2, B1, B2])
    return LogRecord(t=state.t, score=state.score,
                     positions=pos[order], damage=state.damage)


def record_to_f64_row(rec: LogRecord) -> jnp.ndarray:
    """Flatten to the 29-double layout the MATLAB readers expect."""
    return jnp.concatenate([
        rec.t[..., None].astype(jnp.float64),
        rec.score.astype(jnp.float64),
        rec.positions.reshape(rec.positions.shape[:-2] + (10,)).astype(
            jnp.float64),
        rec.damage.reshape(rec.damage.shape[:-2] + (16,)).astype(
            jnp.float64),
    ], axis=-1)


@functools.partial(jax.jit, static_argnames=("params", "n_steps", "log"))
def scripted_rollout(state: GameState, controls: jax.Array,
                     params: SimParams, n_steps: int | None = None,
                     log: bool = True):
    """Roll out with a precomputed control schedule.

    ``controls``: (T, 4, 2).  This is the ``test_collisions.py`` workload
    (/root/reference/py/test_collisions.py:33-61) as one compiled scan.
    Returns (final_state, LogRecord-stacked-over-T or None).
    """
    if n_steps is None:
        n_steps = controls.shape[0]

    def body(s, u):
        s2 = step(s, u, params)
        return s2, (log_record(s2) if log else None)

    final, recs = lax.scan(body, state, controls[:n_steps])
    return final, recs


def rollout(state: GameState, policy: Callable, params: SimParams,
            n_steps: int, log: bool = False, policy_state=None):
    """Closed-loop rollout: ``policy(policy_state, game_state) ->
    (policy_state, controls(4,2))`` evaluated every control step.

    The policy must be jittable (pure function of its carried state)."""

    def body(carry, _):
        s, ps = carry
        ps2, u = policy(ps, s)
        s2 = step(s, u, params)
        return (s2, ps2), (log_record(s2) if log else None)

    (final, ps), recs = lax.scan(body, (state, policy_state), None,
                                 length=n_steps)
    return final, ps, recs


def batch_rollout(states: GameState, controls, params: SimParams,
                  log: bool = False):
    """vmap of :func:`scripted_rollout` over a leading batch axis."""
    fn = jax.vmap(lambda s, c: scripted_rollout(s, c, params,
                                                log=log))
    return fn(states, controls)
