"""robogame_tpu: a TPU-native framework with the capabilities of
goromal/robo-game-sim (multi-player air-hockey simulation for optimal
control / RL research), re-designed for JAX/XLA/Pallas/pjit.

Layers (bottom-up):
  physics/   branch-free batched game engine (the reference's C++ GameSim)
  ops/       batched QP / trajectory-optimization solvers (replaces Drake)
  control/   controllers: linear/contact optimizers, CBF filter, CMPC, DMPC
  agents/    team strategies (classical state machine, centralized, DMPC)
  parallel/  device-mesh sharding, Monte-Carlo sweeps, collectives
  utils/     binary game logs (MATLAB-compatible), config, profiling
"""

from .config import (CbfParams, MpcParams, SimParams, StrategyParams,
                     A1, A2, B1, B2, PUCK)
from .state import (GameState, SimStateView, initial_state, to_vector,
                    from_vector, undecided)
from .physics import step, rollout, scripted_rollout
from .sim import GameSim

__version__ = "0.1.0"

__all__ = [
    "SimParams", "MpcParams", "CbfParams", "StrategyParams",
    "GameState", "SimStateView", "initial_state", "to_vector", "from_vector",
    "undecided", "step", "rollout", "scripted_rollout", "GameSim",
    "A1", "A2", "B1", "B2", "PUCK",
]
