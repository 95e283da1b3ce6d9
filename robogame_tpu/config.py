"""Frozen configuration dataclasses for the TPU-native robo-game framework.

Single source of truth for every constant the reference duplicates between C++
and Python (see /root/reference/src/GameSim.cpp:5-16,21-25 and the per-script
``GameParams`` classes, e.g. /root/reference/py/run_sim.py:13-36).

All classes are hashable frozen dataclasses so they can be passed as static
arguments to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

# Entity index order used everywhere in this framework:
#   0 = A1, 1 = A2, 2 = B1, 3 = B2, 4 = PUCK
# (matches the reference's grid enum order A1GRID..PKGRID,
#  /root/reference/include/GameSim.h:13)
A1, A2, B1, B2, PUCK = 0, 1, 2, 3, 4
N_ENTITIES = 5
N_PLAYERS = 4

# Collision type ids (match /root/reference/include/Collision.h:5)
WALL_UP, WALL_DOWN, WALL_RIGHT, WALL_LEFT, INTER_AGENT = 0, 1, 2, 3, 4

# State component order within an entity's 4-vector: [px, py, vx, vy]
# (matches /root/reference/include/SimState.h:7)
PX, PY, VX, VY = 0, 1, 2, 3

# Flat 22-vector layout of the reference state
# (/root/reference/include/SimState.h:14-23):
#   [scoreA, scoreB, puck(4), A1(4), A2(4), B1(4), B2(4)]
VEC_TAS, VEC_TBS, VEC_PK, VEC_A1, VEC_A2, VEC_B1, VEC_B2, VEC_SIZE = (
    0, 1, 2, 6, 10, 14, 18, 22)


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Physics parameters. Defaults equal the reference C++ defaults
    (/root/reference/src/GameSim.cpp:5-16 and reset defaults at 21-25)."""

    dt: float = 0.05
    winning_score: int = 3
    noise: float = 0.0                 # w_stdev on player accelerations
    tau_player: float = 0.5
    tau_puck: float = 0.1
    player_mass: float = 1.0
    puck_mass: float = 0.5
    player_radius: float = 0.2
    puck_radius: float = 0.175
    arena_x: float = 10.0
    arena_y: float = 5.0
    goal_height: float = 1.0
    input_limit: float = 10.0          # Python-side limit (run_sim.py:23)
    # Sub-step grid / event loop (include/GameSim.h:6-9)
    grid_points: int = 50
    collision_counter_lim: int = 50
    overlap_buffer: float = 1.1
    # Numerics
    dtype: str = "float32"             # "float32" on TPU, "float64" for parity
    stochastic: bool = False           # compile the noise path (static flag)
    # Engine selection:
    #   "event"  -- reference-exact sequential event loop (parity harness)
    #   "sweep"  -- TPU-throughput XLA path: closed-form affine-map
    #               propagation, parallel resolution of disjoint collision
    #               events (physics/sweep.py)
    #   "pallas" -- the sweep algorithm as one fused Pallas TPU kernel,
    #               batch in lanes, whole step in VMEM (~65x the sweep
    #               path at B=2048; physics/pallas_step.py).
    #   "pallas_exact" -- event-ORDER-exact Pallas kernel: each game
    #               resolves its single globally-earliest event per loop
    #               iteration with sequential feedback re-propagation --
    #               the reference's exact GameSim::updateSim semantics
    #               (GameSim.cpp:136-150) at lane-batched throughput.
    #               Stochastic mode mirrors the reference's noise
    #               structure: populate-pass noise plus fresh per-substep
    #               draws consumed inside the feedback re-propagation
    #               (sweep.repropagation_noise; the event engine remains
    #               the stochastic parity oracle).
    engine: str = "event"
    sweep_iters: int = 50              # event-loop iteration cap in
                                       # sweep/pallas mode, default = the
                                       # reference's 50-event cap
                                       # (include/GameSim.h:7).  Each
                                       # iteration resolves the earliest
                                       # event of every disjoint conflict
                                       # component (<= 5 events), so 50
                                       # iterations cover at least the
                                       # reference's event depth.  The
                                       # loops exit early when no events
                                       # remain, so normal gameplay pays
                                       # only the few iterations it uses;
                                       # the two-phase pallas path keeps
                                       # the deep cap cheap at batch.
                                       # tools/dist_equiv.py campaign: at
                                       # 50 the sweep engine is
                                       # statistically indistinguishable
                                       # from the event engine on random
                                       # schedules; the old default 12
                                       # truncated sustained grinding
    # Two-phase event loop (pallas engines): phase 1 runs every game to
    # a shallow cap, then the games whose chains are longer are
    # compacted into a batch of B/compact_frac lanes and finished at
    # full depth.  When MORE than B/compact_frac games are still pending
    # after phase 1, a rarely-taken lax.cond re-runs the resume over the
    # FULL batch, so two-phase is exactly one-phase-equivalent at every
    # pending count (see _twophase_planes[_exact]); compact_frac is
    # therefore a pure throughput knob.  r5 sweep on the headline MC
    # workload (B=8192 / 2048, pallas_exact): frac 4 -> 8.28M / 6.94M
    # steps/s, 8 -> 9.03M / 7.29M, 16 -> 9.27M / 7.32M, 32 -> 8.18M / -
    # (full-resume guard dominates) => default 16.  Default ON: pallas
    # engines are the throughput path; set two_phase=False for the
    # strict one-phase kernel.
    two_phase: bool = True
    phase1_iters: int = 1
    compact_frac: int = 16

    def __post_init__(self):
        if self.engine not in ("event", "sweep", "pallas", "pallas_exact"):
            raise ValueError(
                f"SimParams.engine must be 'event', 'sweep', 'pallas' or "
                f"'pallas_exact', got {self.engine!r}")
        if self.two_phase and not 0 < self.phase1_iters < self.sweep_iters:
            raise ValueError(
                "two_phase needs 0 < phase1_iters < sweep_iters, got "
                f"{self.phase1_iters} / {self.sweep_iters}")

    @property
    def dt_col(self) -> float:
        return self.dt / self.grid_points

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def radii(self) -> Tuple[float, ...]:
        r, p = self.player_radius, self.puck_radius
        return (r, r, r, r, p)

    @property
    def masses(self) -> Tuple[float, ...]:
        m, q = self.player_mass, self.puck_mass
        return (m, m, m, m, q)

    @property
    def taus(self) -> Tuple[float, ...]:
        return (self.tau_player,) * 4 + (self.tau_puck,)

    @property
    def drags(self) -> Tuple[float, ...]:
        # Player: vdot = (u - v)/tau  -> drag coefficient 1.0
        # Puck:   vdot = (u - 0.2 v)/tau -> drag coefficient 0.2
        # (/root/reference/src/GameSim.cpp:62-68,90-96)
        return (1.0, 1.0, 1.0, 1.0, 0.2)

    def replace(self, **kw) -> "SimParams":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class MpcParams:
    """Horizon / weight parameters shared by the MPC controllers.
    Defaults mirror /root/reference/py/src/CentralizedPlayers.py:5-40 and
    /root/reference/py/src/DMPCTeam.py:35-63."""

    N: int = 20                        # knots in horizon
    minT_frac: float = 1.0             # minT = dt * minT_frac / N
    maxT: float = 5.0 / 20.0           # per-step max (DMPC: 5.0/N)
    w_pos: float = 10.0                # Omega_N_max diag (pos)
    w_vel: float = 20.0                # Omega_N_max diag (vel)
    u_reg: float = 1e-2                # effort regularization: the
                                       # reference cost is terminal-only
                                       # (CentralizedMPC.py:24-27), which
                                       # leaves the control sequence
                                       # under-determined; a small ridge
                                       # picks the smooth solution
    sqp_iters: int = 6                 # fixed SQP outer iterations
    qp_iters: int = 150                # fixed ADMM iterations per QP (the
                                       # joint CMPC needs ~150 for its
                                       # short-horizon candidates to
                                       # converge; below that only the
                                       # longest, gentlest final-time
                                       # candidate passes and the closed
                                       # loop barely moves)
    warm_qp_iters: int = 40            # ADMM iterations per SQP iteration
                                       # AFTER the first in the fused
                                       # CMPC kernel (ops/sqp_pallas.py):
                                       # iterations 2.. warm-start from
                                       # the previous iterate's ADMM
                                       # state (x, rescaled duals,
                                       # carried rho), so they need far
                                       # fewer iterations than the cold
                                       # first solve (qp_iters)
    t_grid: int = 8                    # candidate final-time grid size
    t_local: int = 4                   # of t_grid, candidates re-centered
                                       # on the previous winner's time
                                       # step once a warm solution exists
                                       # (control/dmpc.candidate_steps --
                                       # warm local refinement mirrors the
                                       # reference's warm-started free-T
                                       # NLP and halves the grid the
                                       # closed loop has to sweep)

    def replace(self, **kw) -> "MpcParams":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class CbfParams:
    """CBF safety-filter parameters (/root/reference/py/run_sim.py:34-36,
    /root/reference/py/src/CBF.py:23-32)."""

    safety_radius: float = 0.4         # 2 * player_radius
    barrier_gain: float = 30.0
    qp_iters: int = 50

    def replace(self, **kw) -> "CbfParams":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class StrategyParams:
    """Team strategy thresholds (/root/reference/py/src/DMPCTeam.py:65-70,
    /root/reference/py/src/ClassicalTeam.py:12)."""

    kick_velocity: float = 4.0
    v_hit: float = 4.0
    v_thresh: float = 1.0              # arena_x / 10
    d_goalie_offense: float = 5.0      # arena_x / 2
    d_goalie_defense: float = 2.5      # arena_x / 4

    def replace(self, **kw) -> "StrategyParams":
        return dataclasses.replace(self, **kw)
