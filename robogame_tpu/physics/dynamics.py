"""Entity dynamics: damped double integrators integrated with classic RK4.

Capability spec (NOT a code port) from the reference:
* player:  pdot = v,  vdot = (u - v)/tau_player + w * N(0,1)
  (/root/reference/src/GameSim.cpp:62-68) -- noise drawn independently at
  every RK4 stage evaluation, players only.
* puck:    pdot = v,  vdot = (u - 0.2 v)/tau_puck with u == 0 during sim
  (/root/reference/src/GameSim.cpp:90-96).

Here both laws are one vectorized family
    vdot = (u - c * v) / tau + noise
with per-entity constants c (drag) and tau, so a single RK4 evaluation
advances all 5 entities at once on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SimParams


def f_all(x, u, tau, drag, stage_noise):
    """Vectorized dynamics for all entities.

    x: (..., E, 4), u: (..., E, 2), tau/drag: (E,), stage_noise: (..., E, 2).
    Returns xdot with the same shape as x.
    """
    vel = x[..., 2:4]
    acc = (u - drag[..., :, None] * vel) / tau[..., :, None] + stage_noise
    return jnp.concatenate([vel, acc], axis=-1)


def rk4_step(x, u, dt, tau, drag, noise=None):
    """Classic RK4 (/root/reference/src/GameSim.cpp:70-88,98-116).

    ``noise`` is (4, ..., E, 2): an independent draw per RK4 stage, matching
    the reference's fresh normal draws inside each f_player evaluation.
    ``dt`` may be a scalar or broadcastable to (..., E) leading dims; it is
    applied per-entity via a trailing singleton.
    """
    if noise is None:
        z = jnp.zeros_like(u)
        noise = (z, z, z, z)
    dt_ = jnp.asarray(dt, dtype=x.dtype)
    if dt_.ndim > 0:
        dt_ = dt_[..., None]
    k1 = f_all(x, u, tau, drag, noise[0])
    k2 = f_all(x + k1 * (dt_ / 2.0), u, tau, drag, noise[1])
    k3 = f_all(x + k2 * (dt_ / 2.0), u, tau, drag, noise[2])
    k4 = f_all(x + k3 * dt_, u, tau, drag, noise[3])
    return x + (k1 + 2.0 * k2 + 2.0 * k3 + k4) * (dt_ / 6.0)


def sample_stage_noise(key, shape, w_stdev, dtype):
    """4 independent stage draws: (4, *shape)."""
    return w_stdev * jax.random.normal(key, (4,) + tuple(shape), dtype=dtype)


# ---------------------------------------------------------------------------
# Closed-form solutions (used by tests and by the controllers' models)
# ---------------------------------------------------------------------------

def exact_player_step(x, u, dt, tau):
    """Exact discretization of pdot=v, vdot=(u-v)/tau for constant u.

    v(t) = u + (v0-u) e^{-t/tau};  p(t) = p0 + u t + tau (v0-u)(1-e^{-t/tau}).
    """
    p0, v0 = x[..., 0:2], x[..., 2:4]
    e = jnp.exp(-dt / tau)
    v = u + (v0 - u) * e
    p = p0 + u * dt + tau * (v0 - u) * (1.0 - e)
    return jnp.concatenate([p, v], axis=-1)


def exact_puck_step(x, dt, tau, drag=0.2):
    """Exact free-puck flight: vdot = -(drag/tau) v.

    v(t) = v0 e^{-kt}, p(t) = p0 + v0 (1-e^{-kt})/k with k = drag/tau.
    The *controllers* intentionally model the puck with k = 1/tau instead
    (see /root/reference/py/src/ContactOptimizer.py:80-86); pass drag=1.0
    to reproduce that model.
    """
    k = drag / tau
    p0, v0 = x[..., 0:2], x[..., 2:4]
    e = jnp.exp(-k * dt)
    v = v0 * e
    p = p0 + v0 * (1.0 - e) / k
    return jnp.concatenate([p, v], axis=-1)


def entity_consts(params: SimParams):
    """(tau, drag, radius, mass) arrays of shape (5,)."""
    dt = params.jdtype
    return (jnp.array(params.taus, dtype=dt),
            jnp.array(params.drags, dtype=dt),
            jnp.array(params.radii, dtype=dt),
            jnp.array(params.masses, dtype=dt))
