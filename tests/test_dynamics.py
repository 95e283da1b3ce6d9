"""Unit tests for entity dynamics: RK4 vs exact closed forms."""

import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import SimParams
from robogame_tpu.physics.dynamics import (entity_consts, exact_player_step,
                                           exact_puck_step, rk4_step)

P = SimParams(dtype="float64")


def test_rk4_player_matches_closed_form():
    tau, drag, _, _ = entity_consts(P)
    x = jnp.array([[1.0, -0.5, 2.0, 0.3]] * 5)
    u = jnp.array([[3.0, -1.0]] * 5)
    dt = P.dt_col
    # integrate 50 sub-steps
    for _ in range(50):
        x = rk4_step(x, u, dt, tau, drag)
    exact = exact_player_step(jnp.array([1.0, -0.5, 2.0, 0.3]),
                              jnp.array([3.0, -1.0]), 0.05, P.tau_player)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(exact),
                               rtol=1e-9)


def test_rk4_puck_matches_closed_form():
    tau, drag, _, _ = entity_consts(P)
    x0 = jnp.array([0.3, 0.1, 4.0, -2.0])
    x = jnp.array([[0.0, 0.0, 0.0, 0.0]] * 4 + [list(x0)])
    u = jnp.zeros((5, 2))
    for _ in range(50):
        x = rk4_step(x, u, P.dt_col, tau, drag)
    # effective puck decay rate = 0.2 / tau_puck (GameSim.cpp:94-95)
    exact = exact_puck_step(x0, 0.05, P.tau_puck, drag=0.2)
    np.testing.assert_allclose(np.asarray(x[4]), np.asarray(exact),
                               rtol=1e-9)


def test_rk4_convergence_order():
    """RK4 global error should scale ~h^4."""
    tau, drag, _, _ = entity_consts(P)
    x0 = jnp.array([[0.0, 0.0, 1.0, -1.0]])
    u = jnp.array([[2.0, 2.0]])
    tau1, drag1 = tau[:1], drag[:1]
    exact = exact_player_step(x0[0], u[0], 1.0, P.tau_player)

    def err(n):
        x = x0
        for _ in range(n):
            x = rk4_step(x, u, 1.0 / n, tau1, drag1)
        return float(jnp.max(jnp.abs(x[0] - exact)))

    e1, e2 = err(8), err(16)
    assert e1 / e2 > 10.0  # ~16x for 4th order


def test_stage_noise_is_zero_mean_scaling():
    from robogame_tpu.physics.dynamics import sample_stage_noise
    import jax
    k = jax.random.PRNGKey(0)
    n = sample_stage_noise(k, (1000, 2), 0.5, jnp.float64)
    assert n.shape == (4, 1000, 2)
    assert abs(float(n.mean())) < 0.02
    assert abs(float(n.std()) - 0.5) < 0.02
