"""Game state pytree and conversions to/from the reference's flat 22-vector.

The reference packs state into a 22-double Eigen vector
(/root/reference/include/SimState.h:14-23); here the canonical layout is a
small pytree of arrays, batch-first under ``vmap``:

* ``x``      -- (5, 4) entity states, rows [A1, A2, B1, B2, PUCK], cols
               [px, py, vx, vy]
* ``score``  -- (2,) int32 [teamA, teamB]
* ``damage`` -- (4, 4) pairwise accumulated damage
               (/root/reference/include/SimState.h:33-38)
* ``t``      -- scalar sim time
* ``key``    -- PRNG key (used only when SimParams.stochastic)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import (A1, A2, B1, B2, PUCK, VEC_A1, VEC_A2, VEC_B1, VEC_B2,
                     VEC_PK, SimParams)


class GameState(NamedTuple):
    x: jax.Array        # (5, 4)
    score: jax.Array    # (2,) int32
    damage: jax.Array   # (4, 4)
    t: jax.Array        # scalar
    key: jax.Array      # PRNG key


def initial_state(params: SimParams,
                  x0_puck=None,
                  seed: int | jax.Array = 0) -> GameState:
    """Reset state. Player start positions are (+-X/4, +-Y/4)
    (/root/reference/src/GameSim.cpp:35-38); puck initial state is an
    argument (defaults to zeros, /root/reference/src/GameSim.cpp:22)."""
    dt = params.jdtype
    qx, qy = params.arena_x / 4.0, params.arena_y / 4.0
    x = jnp.array([[-qx,  qy, 0.0, 0.0],
                   [-qx, -qy, 0.0, 0.0],
                   [ qx,  qy, 0.0, 0.0],
                   [ qx, -qy, 0.0, 0.0],
                   [0.0, 0.0, 0.0, 0.0]], dtype=dt)
    if x0_puck is not None:
        x = x.at[PUCK].set(jnp.asarray(x0_puck, dtype=dt))
    key = seed if isinstance(seed, jax.Array) and seed.dtype == jnp.dtype(
        "uint32") else jax.random.PRNGKey(seed)
    return GameState(
        x=x,
        score=jnp.zeros((2,), dtype=jnp.int32),
        damage=jnp.zeros((4, 4), dtype=dt),
        t=jnp.zeros((), dtype=dt),
        key=key,
    )


def undecided(state: GameState, params: SimParams) -> jax.Array:
    """True while neither team has reached winning_score
    (/root/reference/src/GameSim.cpp:57-60)."""
    return jnp.all(state.score < params.winning_score)


def to_vector(state: GameState) -> jax.Array:
    """Flat 22-vector in the reference layout
    [scoreA, scoreB, puck, A1, A2, B1, B2]."""
    return jnp.concatenate([
        state.score.astype(state.x.dtype),
        state.x[PUCK], state.x[A1], state.x[A2], state.x[B1], state.x[B2],
    ])


def from_vector(vec: jax.Array, params: SimParams,
                t=0.0, seed: int = 0) -> GameState:
    """Inverse of :func:`to_vector` (damage not represented in the vector)."""
    dt = params.jdtype
    vec = jnp.asarray(vec, dtype=dt)
    x = jnp.stack([vec[VEC_A1:VEC_A1 + 4], vec[VEC_A2:VEC_A2 + 4],
                   vec[VEC_B1:VEC_B1 + 4], vec[VEC_B2:VEC_B2 + 4],
                   vec[VEC_PK:VEC_PK + 4]])
    return GameState(
        x=x,
        score=vec[:2].astype(jnp.int32),
        damage=jnp.zeros((4, 4), dtype=dt),
        t=jnp.asarray(t, dtype=dt),
        key=jax.random.PRNGKey(seed),
    )


# ---------------------------------------------------------------------------
# Read-only accessor mirroring /root/reference/py/src/SimState.py
# ---------------------------------------------------------------------------

_PLAYER_ROW = {("A", 1): A1, ("A", 2): A2, ("B", 1): B1, ("B", 2): B2}


class SimStateView:
    """API-compatible accessor over a GameState (or flat 22-vector),
    mirroring /root/reference/py/src/SimState.py:15-43."""

    def __init__(self, state):
        if isinstance(state, GameState):
            self._x = state.x
            self._score = state.score
        else:
            vec = jnp.asarray(state)
            self._x = jnp.stack([
                vec[VEC_A1:VEC_A1 + 4], vec[VEC_A2:VEC_A2 + 4],
                vec[VEC_B1:VEC_B1 + 4], vec[VEC_B2:VEC_B2 + 4],
                vec[VEC_PK:VEC_PK + 4]])
            self._score = vec[:2]

    def get_player_state(self, team: str, player_id: int):
        return self._x[_PLAYER_ROW[(team, player_id)]]

    def get_player_pos(self, team: str, player_id: int):
        return self.get_player_state(team, player_id)[0:2]

    def get_player_vel(self, team: str, player_id: int):
        return self.get_player_state(team, player_id)[2:4]

    def get_puck_state(self):
        return self._x[PUCK]

    def get_puck_pos(self):
        return self._x[PUCK][0:2]

    def get_puck_vel(self):
        return self._x[PUCK][2:4]

    @property
    def scores(self):
        return self._score

    @property
    def entity_array(self):
        """(5, 4) entity states in framework row order [A1,A2,B1,B2,PUCK]."""
        return self._x
