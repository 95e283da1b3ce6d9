"""Centralized control-barrier-function safety filter.

Capability spec: /root/reference/py/src/CBF.py (damped-double-integrator
CBF, the variant actually used by the harness; the reference's plain
double-integrator variant at CBF.py:96-154 is marked DO NOT USE and is not
reproduced).  Minimally modifies nominal controls so the 4 players avoid
each other:

    min  ||u - u_nominal||^2
    s.t. hij_dot(u) >= -gain * hij^3        for every approaching pair
         |u| <= input_limit

with barrier (CBF.py:62-75)

    hij  = (a_max - v_col) * E - a_max,
    E    = exp((|p_ij| + tau*v_col - Ds) / (tau*a_max)),
    v_col = p_ij_unit . v_ij  (negative when approaching),
    a_max = 2 * input_limit  (relative acceleration bound).

hij_dot is linear in u_ij = u_i - u_j, so the filter is one small QP over
all 8 input components -- solved here with the batched fixed-iteration ADMM
(ops/qp.py), vmappable over thousands of games.  On solver failure the
nominal inputs are returned unchanged (CBF.py:92-94).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CbfParams, SimParams
from ..ops.qp import f32_matmul, solve_qp

# ordered player pairs (i, j), i != j -- the reference loops i, j in 0..3
_PAIRS = [(i, j) for i in range(4) for j in range(4) if i != j]


class CbfResult(NamedTuple):
    u: jax.Array          # (4, 2) safe controls
    converged: jax.Array  # () bool (False -> u == u_nominal)


@f32_matmul
@functools.partial(jax.jit, static_argnames=("params", "cbf"))
def safe_control(u_nominal: jax.Array, positions: jax.Array,
                 velocities: jax.Array, params: SimParams,
                 cbf: CbfParams) -> CbfResult:
    """u_nominal/positions/velocities: (4, 2) player arrays.

    Equivalent of ``CBF.get_centralized_safe_control_damped_double_integrator``
    (/root/reference/py/src/CBF.py:35-94).
    """
    H, g, A, lo, hi, u_nom = _build_qp(u_nominal, positions, velocities,
                                       params, cbf)
    lim = params.input_limit
    sol = solve_qp(H, g, A, lo, hi, iters=cbf.qp_iters)
    # project out the ADMM's residual box violation (exact, cheap)
    u_safe = jnp.clip(sol.x.reshape(4, 2), -lim, lim)
    u_out = jnp.where(sol.converged, u_safe, u_nom)
    return CbfResult(u=u_out, converged=sol.converged)


def _build_qp(u_nominal, positions, velocities, params: SimParams,
              cbf: CbfParams):
    """Per-game CBF-QP pieces (H, g, A, lo, hi) -- the constraint-build
    half of safe_control, factored out so the batched path can construct
    all games' QPs under vmap and solve them in one lanes-batched kernel
    call."""
    dtype = params.jdtype
    u_nom = jnp.asarray(u_nominal, dtype).reshape(4, 2)
    p = jnp.asarray(positions, dtype).reshape(4, 2)
    v = jnp.asarray(velocities, dtype).reshape(4, 2)

    tau = params.tau_player
    a_max = 2.0 * params.input_limit
    Ds = cbf.safety_radius
    gain = cbf.barrier_gain

    ii = jnp.asarray([a for a, _ in _PAIRS])
    jj = jnp.asarray([b for _, b in _PAIRS])
    pij = p[ii] - p[jj]
    vij = v[ii] - v[jj]
    pn = jnp.linalg.norm(pij, axis=-1)
    pn_safe = jnp.where(pn > 0, pn, 1.0)
    pu = pij / pn_safe[:, None]
    vcol = jnp.sum(pu * vij, axis=-1)
    active = vcol < 0

    E = jnp.exp((pn + tau * vcol - Ds) / (tau * a_max))
    vperp2 = jnp.sum(vij * vij, axis=-1) - vcol ** 2
    c0 = E * (-vperp2 / pn_safe +
              (a_max - vcol) / (tau * a_max) *
              (vcol + tau / pn_safe * vperp2) +
              vcol / (tau * a_max) * vcol)
    k = E * vcol / (tau * a_max)
    h = (a_max - vcol) * E - a_max

    rows = jnp.zeros((len(_PAIRS), 8), dtype)
    rows = rows.at[jnp.arange(12)[:, None], 2 * ii[:, None] +
                   jnp.arange(2)[None, :]].set(-k[:, None] * pu)
    rows = rows.at[jnp.arange(12)[:, None], 2 * jj[:, None] +
                   jnp.arange(2)[None, :]].set(k[:, None] * pu)
    lo_c = -gain * h ** 3 - c0
    big = jnp.asarray(1e9, dtype)
    rows = jnp.where(active[:, None], rows, 0.0)
    lo_c = jnp.where(active, lo_c, -1.0)
    hi_c = jnp.where(active, big, 1.0)

    lim = params.input_limit
    A = jnp.concatenate([rows, jnp.eye(8, dtype=dtype)], axis=0)
    lo = jnp.concatenate([lo_c, -lim * jnp.ones(8, dtype)])
    hi = jnp.concatenate([hi_c, lim * jnp.ones(8, dtype)])
    H = 2.0 * jnp.eye(8, dtype=dtype)
    g = -2.0 * u_nom.reshape(8)
    return H, g, A, lo, hi, u_nom


@functools.partial(jax.jit, static_argnames=("params", "cbf",
                                             "use_lanes"))
def safe_control_batch(u_nominal, positions, velocities,
                       params: SimParams, cbf: CbfParams,
                       use_lanes: bool | None = None) -> CbfResult:
    """Batched safety filter over a leading game axis: all games' 8-var
    CBF-QPs solve in ONE lanes-batched Pallas kernel call on TPU
    (vmapped XLA solver elsewhere), exactly matching per-game
    ``safe_control`` semantics."""
    if use_lanes is None:
        from ..ops.qp_pallas import fits_vmem
        use_lanes = (jax.default_backend() == "tpu") and fits_vmem(8, 20)
    H, g, A, lo, hi, u_nom = jax.vmap(
        lambda u, p, v: _build_qp(u, p, v, params, cbf))(
        u_nominal, positions, velocities)
    if use_lanes:
        from ..ops.qp_pallas import solve_qp_lanes
        sol = solve_qp_lanes(H, g, A, lo, hi, iters=cbf.qp_iters)
    else:
        sol = jax.vmap(lambda *a: solve_qp(*a, iters=cbf.qp_iters))(
            H, g, A, lo, hi)
    lim = params.input_limit
    u_safe = jnp.clip(sol.x.reshape(-1, 4, 2), -lim, lim)
    u_out = jnp.where(sol.converged[:, None, None], u_safe, u_nom)
    return CbfResult(u=u_out, converged=sol.converged)
