"""Drop-in ``GameSim`` class mirroring the reference pybind11 API.

The reference exposes ``GameSim`` with ``reset`` / ``undecided`` / ``run``
(/root/reference/src/RoboGamePy.cpp:11-24).  This wrapper provides the same
surface over the jitted TPU engine, returning the flat 22-vector, and makes
every reset parameter keyword-optional with the C++ default values (the
reference's pybind layer declares no defaults even though the C++ definition
has them -- a latent inconsistency fixed here, see SURVEY.md §2.1).
"""

from __future__ import annotations

import numpy as np

from .config import SimParams
from .physics.engine import step
from .physics.rollout import log_record
from .state import GameState, initial_state, to_vector
from .utils.gamelog import GameLogWriter


class GameSim:
    """Stateful convenience wrapper (the functional API is
    :func:`robogame_tpu.physics.step`)."""

    def __init__(self, params: SimParams | None = None):
        self._params = params or SimParams()
        self._state: GameState | None = None
        self._log: GameLogWriter | None = None

    def reset(self, dt: float = 0.05, winning_score: int = 3,
              x0_ball=None, noise: float = 0.0, log: bool = False,
              logname: str = "gamelog.log", seed: int = 0,
              tau_puck: float = 0.1, tau_player: float = 0.5,
              player_mass: float = 1.0, puck_mass: float = 0.5):
        """Same signature/defaults as ``GameSim::reset``
        (/root/reference/src/GameSim.cpp:21-25)."""
        self._params = self._params.replace(
            dt=dt, winning_score=winning_score, noise=noise,
            tau_puck=tau_puck, tau_player=tau_player,
            player_mass=player_mass, puck_mass=puck_mass,
            stochastic=noise != 0.0)
        self._state = initial_state(self._params, x0_puck=x0_ball, seed=seed)
        if self._log is not None:
            self._log.close()
            self._log = None
        if log:
            self._log = GameLogWriter(logname)
        return np.asarray(to_vector(self._state))

    def undecided(self) -> bool:
        s = self._state
        return bool((s.score < self._params.winning_score).all())

    def run(self, vel_A1, vel_A2, vel_B1, vel_B2):
        u = np.stack([np.asarray(v, dtype=np.float64).reshape(2)
                      for v in (vel_A1, vel_A2, vel_B1, vel_B2)])
        was_undecided = self.undecided()
        self._state = step(self._state, u, self._params)
        if self._log is not None and was_undecided:
            s = self._state
            rec = log_record(s)
            from .utils.gamelog import damage_log_fields
            row = np.concatenate([
                np.asarray(rec.t, dtype=np.float64).reshape(1),
                np.asarray(rec.score, dtype=np.float64),
                np.asarray(rec.positions, dtype=np.float64).reshape(10),
                # sliding-window damage emission (reference Logger quirk,
                # include/utils.h:72-76; see utils/gamelog.py)
                damage_log_fields(np.asarray(rec.damage)),
            ])
            self._log.write_row(row)
        return np.asarray(to_vector(self._state))

    @property
    def state(self) -> GameState:
        return self._state

    @property
    def params(self) -> SimParams:
        return self._params
