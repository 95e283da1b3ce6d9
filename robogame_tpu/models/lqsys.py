"""Discrete-time models of the damped double integrator and condensed
(prediction-matrix) horizon forms.

The reference controllers share the LTI player model
``A = I + dt*Ac``, ``B = dt*Bc`` (forward-Euler discretization,
/root/reference/py/src/LinearOptimizer.py:10-17,
/root/reference/py/src/CentralizedPlayers.py:9-33) with
``Ac = [[0,0,1,0],[0,0,0,1],[0,0,-1/tau,0],[0,0,0,-1/tau]]``.
We provide that model for behavioral parity *and* the exact ZOH
discretization (preferred: the underlying dynamics are solvable in closed
form, so there is no reason to carry Euler error on TPU).

Condensed form over a horizon of N steps:
    X = Phi x0 + Gamma U,   X = [x_1..x_N],  U = [u_0..u_{N-1}]
built as one batched matmul stack -- MXU-friendly, vmap-able over the
time-step ``h`` (used by the free-final-time T-grid search).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def euler_ab(dt, tau, dtype=jnp.float32):
    """Reference forward-Euler model (LinearOptimizer.py:11-12)."""
    dt = jnp.asarray(dt, dtype)
    a = jnp.eye(4, dtype=dtype)
    a = a.at[0, 2].set(dt).at[1, 3].set(dt)
    a = a.at[2, 2].add(-dt / tau).at[3, 3].add(-dt / tau)
    b = jnp.zeros((4, 2), dtype)
    b = b.at[2, 0].set(dt / tau).at[3, 1].set(dt / tau)
    return a, b


def exact_ab(h, tau, dtype=jnp.float32):
    """Exact ZOH discretization of pdot=v, vdot=(u-v)/tau.

    v' = u + (v-u) e,  p' = p + tau (v-u)(1-e) + u h,  e = exp(-h/tau).
    """
    h = jnp.asarray(h, dtype)
    e = jnp.exp(-h / tau)
    s = tau * (1.0 - e)          # ∫ e^{-t/tau} dt over [0,h]
    a = jnp.eye(4, dtype=dtype)
    a = a.at[0, 2].set(s).at[1, 3].set(s)
    a = a.at[2, 2].set(e).at[3, 3].set(e)
    b = jnp.zeros((4, 2), dtype)
    b = b.at[0, 0].set(h - s).at[1, 1].set(h - s)
    b = b.at[2, 0].set(1.0 - e).at[3, 1].set(1.0 - e)
    return a, b


def exact_puck_ab(h, tau, drag=1.0, dtype=jnp.float32):
    """Exact free-flight puck map (no input): v' = v e^{-kh},
    p' = p + v (1-e^{-kh})/k, k = drag/tau.  ``drag=1`` reproduces the
    reference controllers' (intentionally mismatched) puck model
    (/root/reference/py/src/CentralizedPlayers.py:15); the sim itself uses
    drag=0.2 (/root/reference/src/GameSim.cpp:94-95)."""
    h = jnp.asarray(h, dtype)
    k = drag / tau
    e = jnp.exp(-k * h)
    s = (1.0 - e) / k
    a = jnp.eye(4, dtype=dtype)
    a = a.at[0, 2].set(s).at[1, 3].set(s)
    a = a.at[2, 2].set(e).at[3, 3].set(e)
    return a


def prediction_matrices(A, B, N: int):
    """Phi: (N, nx, nx) with Phi[k] = A^{k+1};
    Gamma: (N, N, nx, nu) with Gamma[k, j] = A^{k-j} B for j <= k else 0.

    X_k (k=1..N) = Phi[k-1] x0 + sum_j Gamma[k-1, j] u_j.
    Built with a scan of matrix products (N is small, <= ~21).
    Full-f32 matmuls: TPU's default bf16 accumulation degrades A^k."""
    with jax.default_matmul_precision("float32"):
        return _prediction_matrices(A, B, N)


def _prediction_matrices(A, B, N: int):
    nx, nu = B.shape

    def pow_body(Ak, _):
        Anext = A @ Ak
        return Anext, Anext

    _, powers = jax.lax.scan(pow_body, jnp.eye(nx, dtype=A.dtype), None,
                             length=N)           # powers[k] = A^{k+1}
    eyeA = jnp.concatenate([jnp.eye(nx, dtype=A.dtype)[None], powers[:-1]],
                           axis=0)               # A^0 .. A^{N-1}

    # Gamma[k, j] = A^{k-j} B  (k >= j)
    idx = jnp.arange(N)
    diff = idx[:, None] - idx[None, :]           # (N, N)
    safe = jnp.clip(diff, 0, N - 1)
    gam = eyeA[safe] @ B                         # (N, N, nx, nu)
    gam = jnp.where((diff >= 0)[:, :, None, None], gam, 0.0)
    return powers, gam


def condense(A, B, N: int):
    """Flat condensed matrices: X (N*nx) = Phi_f (N*nx, nx) x0 +
    Gamma_f (N*nx, N*nu) U."""
    nx, nu = B.shape
    powers, gam = prediction_matrices(A, B, N)
    phi_f = powers.reshape(N * nx, nx)
    gam_f = jnp.transpose(gam, (0, 2, 1, 3)).reshape(N * nx, N * nu)
    return phi_f, gam_f
