"""Statistical equivalence of the stochastic paths.

The reference draws fresh normals inside every RK4 stage
(/root/reference/src/GameSim.cpp:66-67); the event engine replicates that
structure with threefry draws, while the sweep engine draws once per
substep through the exact stage-noise covariance factor
(physics/sweep.py).  Exact-stream parity is impossible (different RNGs,
SURVEY hard-part #5) -- these tests assert the *distributions* agree and
match the analytic OU-process moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogame_tpu.config import SimParams
from robogame_tpu.physics.engine import step
from robogame_tpu.state import initial_state

W = 0.8
N_GAMES = 256
N_STEPS = 4


def _final_player_states(engine):
    params = SimParams(dtype="float64", engine=engine, noise=W,
                       stochastic=True)
    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(1, N_GAMES + 1, dtype=jnp.uint32))
    states = jax.vmap(lambda k: initial_state(params, seed=k))(keys)
    u = jnp.zeros((4, 2), jnp.float64)

    @jax.jit
    def run(s):
        def body(c, _):
            return jax.vmap(lambda st: step(st, u, params))(c), None
        return jax.lax.scan(body, s, None, length=N_STEPS)[0]

    out = run(states)
    return np.asarray(out.x)[:, :4, :]     # players only


def _discrete_velocity_var(params, n_substeps):
    """Exact covariance of the reference's noise structure: per RK4
    substep the stage draws map to the state through M_s (see
    physics/sweep._substep_affine_np), giving per-substep covariance
    w^2 C; after n substeps V_n = w^2 sum_j F^j C (F^j)^T.

    NOTE this is NOT a continuous SDE: the reference adds w N(0,1) to the
    acceleration at each stage, so the integrated per-substep noise
    scales like h*w (grid-resolution-dependent) -- a reference quirk
    replicated by both engines."""
    from robogame_tpu.physics.sweep import _substep_affine_np
    F, _, L = _substep_affine_np(params)
    C = L @ L.T
    V = np.zeros((4, 4))
    Fp = np.eye(4)
    for _ in range(n_substeps):
        V = V + Fp @ C @ Fp.T
        Fp = F[0] @ Fp
    return W ** 2 * V


@pytest.mark.parametrize("engine", ["event", "sweep"])
def test_velocity_variance_matches_discrete_analytic(engine):
    xs = _final_player_states(engine)
    params = SimParams(dtype="float64")
    V = _discrete_velocity_var(params, N_STEPS * params.grid_points)
    for c, name in [(2, "vx"), (3, "vy"), (0, "px"), (1, "py")]:
        # variance across games per player slot (start positions differ
        # between slots), averaged over slots
        var_m = xs[:, :, c].var(axis=0).mean()
        var_a = V[c, c]
        # N_GAMES*4 samples/component -> rel. sampling error ~ 4-5%
        assert abs(var_m - var_a) / var_a < 0.2, (engine, name, var_m,
                                                 var_a)


def test_event_and_sweep_noise_distributions_agree():
    xe = _final_player_states("event")
    xs = _final_player_states("sweep")
    for c, name in [(2, "vx"), (3, "vy"), (0, "px")]:
        ve = xe[:, :, c] - xe[:, :, c].mean(axis=0, keepdims=True)
        vs = xs[:, :, c] - xs[:, :, c].mean(axis=0, keepdims=True)
        se, ss = ve.std(), vs.std()
        assert abs(se - ss) / max(se, 1e-12) < 0.2, (name, se, ss)


def test_noise_zero_matches_deterministic():
    """stochastic=True with noise=0 must equal the deterministic path."""
    params_d = SimParams(dtype="float64", engine="sweep")
    params_s = params_d.replace(noise=0.0, stochastic=True)
    s0 = initial_state(params_d, x0_puck=[0.0, 0.3, 2.0, 1.0])
    u = jnp.ones((4, 2), jnp.float64)
    sd = step(s0, u, params_d)
    ss = step(s0, u, params_s)
    np.testing.assert_allclose(np.asarray(sd.x), np.asarray(ss.x),
                               atol=1e-12)
