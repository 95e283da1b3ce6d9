"""System models: discrete-time LTI forms of the player/puck dynamics and
the condensed (prediction-matrix) horizon forms used by every controller."""

from .lqsys import (condense, euler_ab, exact_ab, exact_puck_ab,
                    prediction_matrices)

__all__ = ["condense", "euler_ab", "exact_ab", "exact_puck_ab",
           "prediction_matrices"]
