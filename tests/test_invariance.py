"""jit/vmap invariance: the pure-functional step must give identical
results jitted vs unjitted and vmapped vs looped (SURVEY.md §5: these
play the role the reference's missing race detector would)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robogame_tpu.config import SimParams
from robogame_tpu.physics.engine import _update_sim, step
from robogame_tpu.physics.sweep import _update_sweep
from robogame_tpu.state import initial_state


@pytest.mark.parametrize("engine", ["event", "sweep"])
def test_jit_vs_nojit(engine):
    params = SimParams(dtype="float64", engine=engine)
    s0 = initial_state(params, x0_puck=[0.0, 0.3, 2.0, 1.0])
    u = jnp.asarray([[6.0, 0], [0, -3.0], [-6.0, 0], [0, 3.0]],
                    jnp.float64)
    upd = _update_sweep if engine == "sweep" else _update_sim
    with jax.disable_jit():
        a = upd(s0, u, params)
    b = upd(s0, u, params)   # traced/jitted via the caller's jit in step()
    # compiled fusion may reassociate fp ops (fma); bound at 1e-12
    np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(a.score), np.asarray(b.score))


@pytest.mark.parametrize("engine", ["event", "sweep"])
def test_vmap_vs_loop(engine):
    params = SimParams(dtype="float64", engine=engine)
    B = 4
    rng = np.random.default_rng(9)
    x0s = rng.uniform(-1, 1, (B, 4)) * np.array([3, 1.5, 5, 3])
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    states = jax.vmap(lambda k, x0: initial_state(params, x0_puck=x0,
                                                  seed=k))(
        keys, jnp.asarray(x0s))
    u = jnp.asarray(rng.uniform(-8, 8, (B, 4, 2)))

    batched = jax.vmap(lambda s, uu: step(s, uu, params))(states, u)
    for i in range(B):
        single = step(jax.tree.map(lambda a: a[i], states), u[i], params)
        np.testing.assert_array_equal(
            np.asarray(single.x), np.asarray(batched.x[i]),
            err_msg=f"{engine}: game {i} differs under vmap")
        np.testing.assert_array_equal(np.asarray(single.score),
                                      np.asarray(batched.score[i]))
