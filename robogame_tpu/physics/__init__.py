from .engine import step
from .dynamics import (exact_player_step, exact_puck_step, rk4_step,
                       entity_consts)
from .rollout import rollout, scripted_rollout

__all__ = ["step", "rollout", "scripted_rollout", "exact_player_step",
           "exact_puck_step", "rk4_step", "entity_consts"]
