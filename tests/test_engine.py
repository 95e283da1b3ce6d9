"""Engine behavior tests: free flight, wall bounces, scoring, pair
collisions (momentum/energy), damage, decided-game freeze."""

import jax
import jax.numpy as jnp
import numpy as np

from robogame_tpu.config import A1, A2, B1, B2, PUCK, SimParams
from robogame_tpu.physics.dynamics import exact_player_step, exact_puck_step
from robogame_tpu.physics.engine import step
from robogame_tpu.state import GameState, initial_state

P = SimParams(dtype="float64")


def mk_state(x, score=(0, 0), t=0.0):
    return GameState(x=jnp.asarray(x, jnp.float64),
                     score=jnp.asarray(score, jnp.int32),
                     damage=jnp.zeros((4, 4), jnp.float64),
                     t=jnp.asarray(t, jnp.float64),
                     key=jax.random.PRNGKey(0))


ZU = np.zeros((4, 2))


def test_free_flight_matches_closed_form():
    s = initial_state(P, x0_puck=[0.0, 0.0, 1.0, 1.0])
    u = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    s2 = step(s, u, P)
    for i, row in enumerate(u):
        exact = exact_player_step(s.x[i], jnp.asarray(row), P.dt,
                                  P.tau_player)
        np.testing.assert_allclose(np.asarray(s2.x[i]), np.asarray(exact),
                                   rtol=1e-8)
    exact_puck = exact_puck_step(s.x[PUCK], P.dt, P.tau_puck, drag=0.2)
    np.testing.assert_allclose(np.asarray(s2.x[PUCK]),
                               np.asarray(exact_puck), rtol=1e-8)
    assert float(s2.t) == P.dt


def test_wall_bounce_reverses_velocity():
    # puck moving up fast near the top wall
    x = np.zeros((5, 4))
    x[A1] = [-4, 2, 0, 0]
    x[A2] = [-4, -2, 0, 0]
    x[B1] = [4, 2, 0, 0]
    x[B2] = [4, -2, 0, 0]
    x[PUCK] = [0.0, 2.30, 0.0, 3.0]   # wall at y=2.5, r=0.175 -> gap 0.025
    s = mk_state(x)
    s2 = step(s, ZU, P)
    assert float(s2.x[PUCK, 3]) < 0           # vy flipped
    assert float(s2.x[PUCK, 1]) + P.puck_radius <= P.arena_y / 2 + 1e-9


def test_goal_scoring_and_puck_reset():
    x = np.zeros((5, 4))
    x[A1] = [-4, 2, 0, 0]
    x[A2] = [-4, -2, 0, 0]
    x[B1] = [4, 2, 0, 0]
    x[B2] = [4, -2, 0, 0]
    x[PUCK] = [4.80, 0.0, 8.0, 0.0]  # heading into the right goal (|y|<0.5)
    s = mk_state(x)
    s2 = step(s, ZU, P)
    assert tuple(np.asarray(s2.score)) == (1, 0)  # WALL_RIGHT -> team A
    np.testing.assert_allclose(np.asarray(s2.x[PUCK]), 0.0, atol=1e-12)


def test_left_goal_scores_team_b():
    x = np.zeros((5, 4))
    x[A1] = [-4, 2, 0, 0]
    x[A2] = [-4, -2, 0, 0]
    x[B1] = [4, 2, 0, 0]
    x[B2] = [4, -2, 0, 0]
    x[PUCK] = [-4.80, 0.2, -8.0, 0.0]
    s = mk_state(x)
    s2 = step(s, ZU, P)
    assert tuple(np.asarray(s2.score)) == (0, 1)


def test_high_shot_bounces_no_goal():
    x = np.zeros((5, 4))
    x[A1] = [-4, 2, 0, 0]
    x[A2] = [-4, -2, 0, 0]
    x[B1] = [4, 1.5, 0, 0]
    x[B2] = [4, -2, 0, 0]
    x[PUCK] = [4.80, 0.8, 8.0, 0.0]   # |y| > goal_height/2 = 0.5
    s = mk_state(x)
    s2 = step(s, ZU, P)
    assert tuple(np.asarray(s2.score)) == (0, 0)
    assert float(s2.x[PUCK, 2]) < 0   # bounced back


def test_head_on_equal_mass_swaps_velocities():
    x = np.zeros((5, 4))
    x[A1] = [-0.25, 0.0, 2.0, 0.0]
    x[A2] = [0.25, 0.0, -2.0, 0.0]
    x[B1] = [4, 2, 0, 0]
    x[B2] = [4, -2, 0, 0]
    x[PUCK] = [0.0, 2.0, 0.0, 0.0]
    s = mk_state(x)
    # drive them together with matching velocity commands so u ~ v
    u = np.array([[2.0, 0.0], [-2.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
    s2 = step(s, u, P)
    # equal masses head-on: x-velocities swap at impact
    assert float(s2.x[A1, 2]) < 0
    assert float(s2.x[A2, 2]) > 0
    # momentum of the pair approximately conserved through the impact
    # (inputs keep pushing after impact so allow tolerance)
    assert abs(float(s2.x[A1, 2] + s2.x[A2, 2])) < 0.5


def test_collision_conserves_momentum_energy_zero_input():
    """With zero input and tau large (low drag), impact conserves p and KE."""
    P2 = P.replace(tau_player=1e6)
    x = np.zeros((5, 4))
    x[A1] = [-0.25, 0.0, 3.0, 0.1]
    x[A2] = [0.25, 0.05, -1.0, 0.0]
    x[B1] = [4, 2, 0, 0]
    x[B2] = [4, -2, 0, 0]
    x[PUCK] = [0.0, 2.0, 0.0, 0.0]
    s = mk_state(x)
    # commands = current velocities (so (u - v)/tau ~ 0 anyway)
    u = np.array([[3.0, 0.1], [-1.0, 0.0], [0, 0], [0, 0]])
    s2 = step(s, u, P2)
    p_before = x[A1, 2:] + x[A2, 2:]
    p_after = np.asarray(s2.x[A1, 2:] + s2.x[A2, 2:])
    np.testing.assert_allclose(p_after, p_before, atol=1e-6)
    ke_before = 0.5 * (np.sum(x[A1, 2:] ** 2) + np.sum(x[A2, 2:] ** 2))
    ke_after = 0.5 * float(jnp.sum(s2.x[A1, 2:] ** 2) +
                           jnp.sum(s2.x[A2, 2:] ** 2))
    np.testing.assert_allclose(ke_after, ke_before, rtol=1e-6)
    # damage accrued both ways, m * 0.01 * |dv|^2 (GameSim.cpp:276-282)
    dmg = np.asarray(s2.damage)
    dv2 = np.sum((x[A1, 2:] - x[A2, 2:]) ** 2)
    np.testing.assert_allclose(dmg[A1, A2], 0.01 * 1.0 * dv2, rtol=1e-6)
    np.testing.assert_allclose(dmg[A2, A1], 0.01 * 1.0 * dv2, rtol=1e-6)
    assert dmg.sum() == dmg[A1, A2] + dmg[A2, A1]


def test_puck_player_collision_no_damage():
    x = np.zeros((5, 4))
    x[A1] = [-0.5, 0.0, 4.0, 0.0]
    x[A2] = [-4, -2, 0, 0]
    x[B1] = [4, 2, 0, 0]
    x[B2] = [4, -2, 0, 0]
    x[PUCK] = [0.0, 0.0, 0.0, 0.0]
    s = mk_state(x)
    u = np.array([[4.0, 0.0], [0, 0], [0, 0], [0, 0]])
    s2 = step(s, u, P)
    assert float(s2.x[PUCK, 2]) > 0       # puck kicked forward
    assert float(np.asarray(s2.damage).sum()) == 0.0


def test_decided_game_freezes():
    x = np.zeros((5, 4))
    x[A1] = [-4, 2, 0, 0]
    x[A2] = [-4, -2, 0, 0]
    x[B1] = [4, 2, 0, 0]
    x[B2] = [4, -2, 0, 0]
    x[PUCK] = [0, 0, 1.0, 0]
    s = mk_state(x, score=(3, 0))   # winning_score=3 default
    u = np.ones((4, 2))
    s2 = step(s, u, P)
    np.testing.assert_array_equal(np.asarray(s2.x), x)
    assert float(s2.t) == 0.0


def test_no_interpenetration_after_step():
    """Property: entities never end a step overlapping beyond tolerance."""
    rng = np.random.default_rng(0)
    radii = np.array(P.radii)
    for trial in range(20):
        x = np.zeros((5, 4))
        x[:, 0] = rng.uniform(-4.5, 4.5, 5)
        x[:, 1] = rng.uniform(-2.2, 2.2, 5)
        x[:, 2:] = rng.uniform(-3, 3, (5, 2))
        s = mk_state(x)
        u = rng.uniform(-5, 5, (4, 2))
        s2 = step(s, u, P)
        pos = np.asarray(s2.x[:, :2])
        for i in range(5):
            for j in range(i + 1, 5):
                d = np.linalg.norm(pos[i] - pos[j])
                # the reference tolerates small transient overlap; final
                # states should be nearly separated
                assert d > (radii[i] + radii[j]) * 0.8, (trial, i, j, d)


def test_vmap_matches_single():
    x = np.zeros((5, 4))
    x[A1] = [-0.5, 0.0, 3.0, 0.0]
    x[A2] = [0.5, 0.0, -3.0, 0.0]
    x[B1] = [4, 2, 0, 0]
    x[B2] = [4, -2, 0, 0]
    x[PUCK] = [2.0, 2.3, 0.0, 3.0]
    s = mk_state(x)
    u = np.array([[3.0, 0], [-3.0, 0], [0, 0], [0, 0]])
    single = step(s, u, P)

    batch = jax.tree.map(lambda a: jnp.stack([a, a, a]), s)
    ub = jnp.stack([jnp.asarray(u)] * 3)
    batched = jax.vmap(lambda st, uu: step(st, uu, P))(batch, ub)
    for lf_s, lf_b in zip(jax.tree.leaves(single), jax.tree.leaves(batched)):
        np.testing.assert_allclose(np.asarray(lf_b[1]), np.asarray(lf_s),
                                   rtol=1e-12, atol=0)
