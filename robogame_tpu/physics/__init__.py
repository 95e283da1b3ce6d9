from .engine import step
from .dynamics import (exact_player_step, exact_puck_step, rk4_step,
                       entity_consts)
from .rollout import rollout, scripted_rollout
from .sweep import step_sweep
from .pallas_step import step_pallas_batch

__all__ = ["step", "step_sweep", "step_pallas_batch", "rollout",
           "scripted_rollout", "exact_player_step", "exact_puck_step",
           "rk4_step", "entity_consts"]
