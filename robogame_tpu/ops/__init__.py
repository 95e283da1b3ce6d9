"""Batched numerical kernels: QP solver and LTI horizon forms."""

from .qp import QpSolution, solve_qp, solve_qp_batch
from ..models.lqsys import condense, euler_ab, exact_ab, exact_puck_ab

__all__ = ["QpSolution", "solve_qp", "solve_qp_batch", "condense",
           "euler_ab", "exact_ab", "exact_puck_ab"]
