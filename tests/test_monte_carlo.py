"""Monte-Carlo sweep tests incl. multi-device sharding on the 8-way
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import SimParams
from robogame_tpu.parallel import (McParams, aggregate, make_mesh,
                                   monte_carlo)

P = SimParams(dtype="float64")


def test_mc_zero_policy_runs():
    mc = McParams(num_runs=8, T=1.0, x0_ball=(0, 0, 8.0, 0.0))
    res = monte_carlo(P, mc)
    assert res.scores.shape == (8, 2)
    # puck launched at goal from center: range v0/2 = 4 < 5, no score
    assert int(res.scores.sum()) == 0


def test_mc_scores_goal():
    mc = McParams(num_runs=4, T=2.0, x0_ball=(3.2, 0.0, 9.0, 0.0))
    res = monte_carlo(P.replace(winning_score=100), mc)
    np.testing.assert_array_equal(np.asarray(res.scores),
                                  [[1, 0]] * 4)


def test_mc_sharded_matches_unsharded():
    mesh = make_mesh(8)
    mc = McParams(num_runs=16, T=1.0, randomize_x0=True)
    res1 = monte_carlo(P, mc)
    res2 = monte_carlo(P, mc, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(res1.scores),
                                  np.asarray(res2.scores))
    np.testing.assert_allclose(np.asarray(res1.damage),
                               np.asarray(res2.damage), rtol=1e-12)
    agg = aggregate(res2)
    assert agg["games"] == 16


def test_mc_sharded_pads_non_divisible():
    """num_runs that does not divide the device count is padded internally
    and the results are sliced back -- identical to the unsharded run."""
    mesh = make_mesh(8)
    mc = McParams(num_runs=5, T=1.0, randomize_x0=True)
    res1 = monte_carlo(P, mc)
    res2 = monte_carlo(P, mc, mesh=mesh)
    assert res2.scores.shape == (5, 2)
    np.testing.assert_array_equal(np.asarray(res1.scores),
                                  np.asarray(res2.scores))
    np.testing.assert_allclose(np.asarray(res1.damage),
                               np.asarray(res2.damage), rtol=1e-12)


def test_mc_policy_closed_loop():
    """A trivial jittable policy: every player chases the puck."""
    def chase(ps, states):
        puck = states.x[:, 4:5, 0:2]
        players = states.x[:, :4, 0:2]
        d = puck - players
        u = 5.0 * d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-6)
        return ps, u

    mc = McParams(num_runs=4, T=2.0, x0_ball=(1.0, 0.3, 0.0, 0.0))
    res = monte_carlo(P, mc, policy=chase)
    # chasing players must have moved the puck
    assert res.scores.shape == (4, 2)


def test_mc_chunked_matches_single_scan():
    """Host-chunked rollout (the long-execution watchdog workaround,
    NOTES.md r3) is bit-identical to the single-scan rollout: the scan
    carry IS the chunk boundary state.  Uneven final chunk included."""
    def chase(ps, states):
        puck = states.x[:, 4:5, 0:2]
        players = states.x[:, :4, 0:2]
        d = puck - players
        u = 5.0 * d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-6)
        return ps + 1, u

    mc = McParams(num_runs=4, T=2.0, x0_ball=(1.0, 0.3, 0.0, 0.0))
    res_one = monte_carlo(P, mc, policy=chase,
                          policy_state=jnp.zeros((4,), jnp.int32))
    res_chk = monte_carlo(P, mc, policy=chase,
                          policy_state=jnp.zeros((4,), jnp.int32),
                          chunk_steps=7)     # 40 steps -> 5 full + 5-step tail
    for a, b in zip(res_one, res_chk):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mc_configuration_file(tmp_path):
    mc = McParams(num_runs=2, T=0.5, log_prefix=str(tmp_path / "mc"))
    monte_carlo(P, mc, write_config=True)
    lines = open(tmp_path / "mc" / "configuration.txt").read().splitlines()
    assert len(lines) == 13
    assert float(lines[0]) == 2


def test_sharded_pallas_mc_matches_sweep():
    """The shard_map fast path (pallas kernel per device shard) must give
    the same games as the unsharded sweep engine."""
    import numpy as np
    from robogame_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    mc = McParams(num_runs=16, T=0.5, randomize_x0=True)
    p_pl = SimParams(dtype="float32", engine="pallas")
    p_sw = SimParams(dtype="float32", engine="sweep")
    res_sh = monte_carlo(p_pl, mc, mesh=mesh)
    res_un = monte_carlo(p_sw, mc)
    np.testing.assert_array_equal(np.asarray(res_sh.scores),
                                  np.asarray(res_un.scores))
    np.testing.assert_allclose(np.asarray(res_sh.damage),
                               np.asarray(res_un.damage), atol=1e-5)
