"""TPU-throughput game step: closed-form propagation + parallel events.

Same capability spec as :mod:`.engine` (the reference's ``GameSim::updateSim``,
/root/reference/src/GameSim.cpp:126-171) but re-structured for large batched
Monte-Carlo throughput on TPU.  The event engine (:func:`.engine.step`) is
reference-exact but pays two sequential costs that dominate under ``vmap``:

* the 50-point RK4 populate scan, and
* a per-event re-propagation scan of up to 50 sub-steps, inside a while-loop
  that under ``vmap`` runs to the *batch max* trip count.

This module removes both:

1. **Closed-form propagation.**  Between collisions the dynamics are LTI
   (damped double integrators, constant input over the control step), so one
   RK4 sub-step is a constant affine map ``x' = F x + S u`` with
   ``F = sum_m (h A)^m / m!`` truncated at m=4 (RK4 on a linear ODE is the
   4th-order truncated exponential).  Grid columns are then
   ``x_k = F^k x_0 + S_k u`` with trace-time precomputed powers -- the whole
   51-column grid is two einsums instead of a 50-step scan.
2. **Parallel event resolution.**  Each loop iteration resolves the
   earliest pending collision of EVERY connected conflict component at once
   (events touching disjoint entity sets commute -- resolving them in one
   iteration is equivalent to the reference's strict time order), so the
   iteration count is ~#events / #components instead of #events.
3. **Feedback-free overlap corrections.**  The reference applies its
   post-collision overlap fix-ups column-by-column, each feeding the next
   re-propagated column (/root/reference/src/GameSim.cpp:292-297,336-340).
   Here the tail is re-propagated in closed form from the resolve point and
   corrections are applied per column without feedback.  During sustained
   wall/pair grinding this deviates from the reference by
   O(0.1 * penetration) per control step; exact-order parity runs use
   ``SimParams(engine="event")``.

Noise (``SimParams.stochastic``): the reference draws fresh normals inside
every RK4 stage (/root/reference/src/GameSim.cpp:66-67).  Per sub-step that
is an additive Gaussian on the state with covariance
``w^2 sum_s M_s M_s^T`` (``M_s`` = the linear map from the stage-s draw to
the end-of-substep state); we draw one 4-vector per sub-step through the
Cholesky factor of that covariance and accumulate it through the affine
chain -- distributionally identical for the populate pass, omitted on
post-collision re-propagation (statistical-equivalence mode, see
SURVEY.md hard part #5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import INTER_AGENT, PUCK, SimParams
from ..state import GameState, undecided
from .dynamics import entity_consts, rk4_step
from .engine import _INF, _Slots, _detect


# ---------------------------------------------------------------------------
# Trace-time affine tables
# ---------------------------------------------------------------------------

def _substep_affine_np(params: SimParams):
    """Per-entity one-substep RK4 affine map (F (5,4,4), S (5,4,2)) plus the
    per-substep stage-noise covariance Cholesky factor L (4,4), all float64
    numpy (trace-time constants)."""
    h = params.dt_col
    F = np.zeros((5, 4, 4))
    S = np.zeros((5, 4, 2))
    I = np.eye(4)
    N = np.zeros((4, 2))
    N[2, 0] = N[3, 1] = 1.0                      # noise enters on vdot
    cov = np.zeros((4, 4))
    for e in range(5):
        tau, drag = params.taus[e], params.drags[e]
        Ac = np.zeros((4, 4))
        Ac[0, 2] = Ac[1, 3] = 1.0
        Ac[2, 2] = Ac[3, 3] = -drag / tau
        Bc = np.zeros((4, 2))
        Bc[2, 0] = Bc[3, 1] = 1.0 / tau
        hA = h * Ac
        hA2, hA3 = hA @ hA, hA @ hA @ hA
        F[e] = I + hA + hA2 / 2.0 + hA3 / 6.0 + hA3 @ hA / 24.0
        S[e] = h * (I + hA / 2.0 + hA2 / 6.0 + hA3 / 24.0) @ Bc
        if e == 0:  # players all share tau/drag; covariance from player map
            M1 = h / 6.0 * (I + hA + hA2 / 2.0 + hA3 / 4.0) @ N
            M2 = h / 6.0 * (2.0 * I + hA + hA2 / 2.0) @ N
            M3 = h / 6.0 * (2.0 * I + hA) @ N
            M4 = h / 6.0 * N
            for M in (M1, M2, M3, M4):
                cov += M @ M.T
    L = np.linalg.cholesky(cov + 1e-300 * np.eye(4))
    return F, S, L


def _affine_tables_np(params: SimParams):
    """Power tables: Fpow[d] = F^d, Spow[d] = sum_{m<d} F^m S  (d = 0..G),
    so grid column k is  x_k = Fpow[k] x_0 + Spow[k] u."""
    G = params.grid_points
    F, S, L = _substep_affine_np(params)
    Fpow = np.zeros((G + 1, 5, 4, 4))
    Spow = np.zeros((G + 1, 5, 4, 2))
    Fpow[0] = np.eye(4)
    for d in range(1, G + 1):
        Fpow[d] = np.einsum("eij,ejk->eik", F, Fpow[d - 1])
        Spow[d] = np.einsum("eij,ejk->eik", F, Spow[d - 1]) + S
    return Fpow, Spow, L


@functools.lru_cache(maxsize=32)
def _affine_tables_cached(key):
    params = SimParams(**dict(key))
    return _affine_tables_np(params)


def _affine_tables(params: SimParams):
    key = (("dt", params.dt), ("grid_points", params.grid_points),
           ("tau_player", params.tau_player), ("tau_puck", params.tau_puck))
    Fpow, Spow, L = _affine_tables_cached(key)
    dt = params.jdtype
    return (jnp.asarray(Fpow, dt), jnp.asarray(Spow, dt), jnp.asarray(L, dt))


def populate_noise(key, params: SimParams, Fpow=None, Lnoise=None):
    """Accumulated populate-pass noise contribution, (G, 4 players, 4).

    One 4-vector draw per substep per player through the exact stage-noise
    covariance factor L, accumulated through the affine chain:
    contrib[k] = sum_{j<k} F^{k-1-j} L xi_j  (players share F).
    Also used by the pallas path (noise is generated outside the kernel
    and passed in as an input plane)."""
    dtype = params.jdtype
    G = params.grid_points
    if Fpow is None or Lnoise is None:
        Fpow, _, Lnoise = _affine_tables(params)
    w = jnp.asarray(params.noise, dtype)
    xi = jax.random.normal(key, (G, 4, 4), dtype=dtype)  # substep, player
    eta = w * jnp.einsum("ij,kej->kei", Lnoise, xi)      # (G, 4, 4)
    d = jnp.arange(G)[:, None] - jnp.arange(G)[None, :] - 1     # k-1-j
    P = jnp.where((d >= 0)[:, :, None, None],
                  Fpow[jnp.clip(d, 0, G), 0], 0.0)              # (G,G,4,4)
    return jnp.einsum("kjab,jeb->kea", P, eta)                  # (G, 4, 4)


def repropagation_noise(key, params: SimParams, Lnoise=None,
                        n: int | None = None):
    """Per-substep noise contributions (NOT accumulated), (G, 4 players, 4).

    ``eta[j] = w L xi_j`` -- one fresh 4-vector per substep per player
    through the exact stage-noise covariance factor L.  Consumed by the
    exact kernel's sequential feedback re-propagation loop, mirroring the
    reference's fresh in-loop RK4 noise draws during collision handling
    (/root/reference/src/GameSim.cpp:66-67 via carryOutFirstCollision;
    the event engine's analogue is engine._iter_noise's ``sn``).  The
    draws are independent of the populate pass; multiple events in one
    control step re-propagating the same entity over overlapping columns
    REUSE these per-column draws (the reference redraws -- a documented
    second-order deviation; iteration-rotated reads were tried in r5 and
    measured WORSE at campaign power, PARITY.md noise section).  ``n``
    overrides the number of substep rows (the kernel plane carries G+1
    iid rows)."""
    dtype = params.jdtype
    G = params.grid_points
    if Lnoise is None:
        _, _, Lnoise = _affine_tables(params)
    w = jnp.asarray(params.noise, dtype)
    xi = jax.random.normal(key, (n if n is not None else G, 4, 4),
                           dtype=dtype)
    return w * jnp.einsum("ij,kej->kei", Lnoise, xi)


# ---------------------------------------------------------------------------
# Vectorized overlap corrections (slot/column batched)
# ---------------------------------------------------------------------------

def _pair_correct_v(p_i, p_j, r_i, r_j, buffer):
    """De-penetration along the *unnormalized* relative position
    (/root/reference/src/GameSim.cpp:263-264,587-588), batched over any
    leading dims; r_i/r_j broadcastable."""
    pij = p_j - p_i
    overlap = r_i + r_j - jnp.linalg.norm(pij, axis=-1)
    apply = overlap > 0
    coef_i = jnp.where(apply, buffer * r_i / (r_i + r_j) * overlap, 0.0)
    coef_j = jnp.where(apply, buffer * r_j / (r_i + r_j) * overlap, 0.0)
    return p_i - coef_i[..., None] * pij, p_j + coef_j[..., None] * pij


def _wall_correct_v(x, r, ctype, halfx, halfy, buffer):
    """Unit-normal wall fix-up (/root/reference/src/GameSim.cpp:594-623),
    batched: x (..., 4), r/ctype (...,)."""
    p = x[..., 0:2]
    overlaps = jnp.stack([p[..., 1] + r - halfy,      # UP
                          -p[..., 1] + r - halfy,     # DOWN
                          p[..., 0] + r - halfx,      # RIGHT
                          -p[..., 0] + r - halfx], axis=-1)
    dirs = jnp.asarray([[0.0, -1.0], [0.0, 1.0], [-1.0, 0.0], [1.0, 0.0]],
                       dtype=x.dtype)
    w = jnp.clip(ctype, 0, 3)
    overlap = jnp.take_along_axis(overlaps, w[..., None], axis=-1)[..., 0]
    corr = jnp.where(overlap > 0, buffer * overlap, 0.0)[..., None] * dirs[w]
    corr = jnp.where((ctype < 4)[..., None], corr, 0.0)
    return x.at[..., 0:2].add(corr)


# ---------------------------------------------------------------------------
# The sweep step
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params",))
def step_sweep(state: GameState, controls: jax.Array,
               params: SimParams) -> GameState:
    """One control step, throughput path.  Decided games are frozen
    (``GameSim::run`` gate, /root/reference/src/GameSim.cpp:118-124)."""
    new_state = _update_sweep(state, controls, params)
    keep = undecided(state, params)
    return jax.tree.map(lambda n, o: jnp.where(keep, n, o), new_state, state)


def _update_sweep(state: GameState, controls, params: SimParams) -> GameState:
    G = params.grid_points
    dtype = params.jdtype
    tau, drag, radius, mass = entity_consts(params)
    Fpow, Spow, Lnoise = _affine_tables(params)
    dtcol = jnp.asarray(params.dt_col, dtype)
    dt = jnp.asarray(params.dt, dtype)
    halfx = jnp.asarray(params.arena_x / 2.0, dtype)
    halfy = jnp.asarray(params.arena_y / 2.0, dtype)
    buf = jnp.asarray(params.overlap_buffer, dtype)
    gh2 = jnp.asarray(params.goal_height / 2.0, dtype)
    ids = jnp.arange(5)

    controls = jnp.asarray(controls, dtype).reshape(4, 2)
    inputs = jnp.concatenate([controls, jnp.zeros((1, 2), dtype)], axis=0)
    t0 = state.t
    key, kpop = jax.random.split(state.key)

    # --- populate the grid in closed form -------------------------------
    grid = (jnp.einsum("keij,ej->kei", Fpow, state.x,
                       precision=lax.Precision.HIGHEST) +
            jnp.einsum("keij,ej->kei", Spow, inputs,
                       precision=lax.Precision.HIGHEST))     # (G+1, 5, 4)
    if params.stochastic:
        grid = grid.at[1:, :4, :].add(
            populate_noise(kpop, params, Fpow, Lnoise))

    slots = _detect(grid, jnp.ones((5,), jnp.int32), t0, params, radius)

    def loop_cond(c):
        (_, slots_c, _, _, _, it) = c
        return jnp.any(slots_c.valid) & (it < params.sweep_iters)

    def loop_body(c):
        grid_c, slots_c, scored_c, score_c, dmg_c, it = c

        valid = slots_c.valid
        is_pair = slots_c.ctype == INTER_AGENT
        jj = jnp.where(is_pair, slots_c.j, ids)            # partner or self
        t_a = jnp.where(valid, slots_c.t, _INF)

        # --- local-minimum disjoint event selection ---------------------
        inv = (ids[None, :] == ids[:, None]) | \
              (is_pair[:, None] & (ids[None, :] == jj[:, None]))   # (slot, ent)
        share = jnp.any(inv[:, None, :] & inv[None, :, :], axis=-1)
        conflict = share & ~jnp.eye(5, dtype=bool) & \
            valid[:, None] & valid[None, :]
        beats = conflict & ((t_a[:, None] < t_a[None, :]) |
                            ((t_a[:, None] == t_a[None, :]) &
                             (ids[:, None] < ids[None, :])))
        take = valid & ~jnp.any(beats, axis=0)

        puck_inv = (ids == PUCK) | (is_pair & (jj == PUCK))
        skip = take & puck_inv & scored_c                # scored latch
        live = take & ~skip                              # (5,) slots resolved

        # --- resolve all live slots in parallel -------------------------
        km1 = jnp.clip(jnp.floor((t_a - t0) / dtcol).astype(jnp.int32),
                       0, G - 1)
        base_a = km1 + 1                                   # (5,)
        ents = jnp.stack([ids, jj], axis=1)                # (5, 2)
        xs_m = grid_c[km1[:, None], ents]                  # (5, 2, 4)
        us = inputs[ents]                                  # (5, 2, 2)
        dt_t = jnp.clip(t_a - (t0 + km1.astype(dtype) * dtcol), 0.0, dtcol)
        xs_t = rk4_step(xs_m, us, dt_t[:, None], tau[ents], drag[ents])

        r_i, r_j = radius[ids], radius[jj]
        m_i, m_j = mass[ids], mass[jj]

        # pair branch: de-penetrate (1.01) + elastic impulse
        # (/root/reference/src/GameSim.cpp:258-282)
        p_i, p_j = _pair_correct_v(xs_t[:, 0, 0:2], xs_t[:, 1, 0:2],
                                   r_i, r_j, jnp.asarray(1.01, dtype))
        v1, v2 = xs_t[:, 0, 2:4], xs_t[:, 1, 2:4]
        d12 = p_i - p_j
        den = jnp.sum(d12 * d12, axis=-1)
        den_safe = jnp.where(den > 0, den, 1.0)
        dot_v = jnp.sum((v1 - v2) * d12, axis=-1)
        imp = (dot_v / den_safe)[:, None] * d12
        vi_new = v1 - (2.0 * m_j / (m_i + m_j))[:, None] * imp
        vj_new = v2 + (2.0 * m_i / (m_i + m_j))[:, None] * imp
        xi_pair = jnp.concatenate([p_i, vi_new], axis=-1)
        xj_pair = jnp.concatenate([p_j, vj_new], axis=-1)

        dmg_on = live & is_pair & (ids != PUCK) & (jj != PUCK)
        dv2 = 0.01 * jnp.sum((v1 - v2) ** 2, axis=-1)
        di, dj = jnp.clip(ids, 0, 3), jnp.clip(jj, 0, 3)
        dmg_new = dmg_c.at[di, dj].add(jnp.where(dmg_on, m_i * dv2, 0.0))
        dmg_new = dmg_new.at[dj, di].add(jnp.where(dmg_on, m_j * dv2, 0.0))

        # wall branch: sign-conditioned flip + goal test
        # (/root/reference/src/GameSim.cpp:312-327)
        ctype = slots_c.ctype
        vx, vy = xs_t[:, 0, 2], xs_t[:, 0, 3]
        flip_y = ((ctype == 0) & (vy > 0)) | ((ctype == 1) & (vy < 0))
        flip_x = ((ctype == 2) & (vx > 0)) | ((ctype == 3) & (vx < 0))
        x_wall = xs_t[:, 0]
        x_wall = x_wall.at[:, 2].multiply(jnp.where(flip_x, -1.0, 1.0))
        x_wall = x_wall.at[:, 3].multiply(jnp.where(flip_y, -1.0, 1.0))

        py = xs_t[:, 0, 1]
        goal = ((~is_pair) & (ids == PUCK) & ((ctype == 2) | (ctype == 3)) &
                (py < gh2) & (py > -gh2) & live)
        any_goal = jnp.any(goal & ~scored_c)
        right_goal = jnp.any(goal & ~scored_c & (ctype == 2))
        inc = jnp.where(any_goal,
                        jnp.where(right_goal, jnp.array([1, 0], jnp.int32),
                                  jnp.array([0, 1], jnp.int32)),
                        jnp.zeros(2, jnp.int32))
        score_new = score_c + inc
        scored_new = scored_c | jnp.any(goal)

        # propagate resolved states to their base columns + corrections
        xres = jnp.stack([jnp.where(is_pair[:, None], xi_pair, x_wall),
                          xj_pair], axis=1)                # (5, 2, 4)
        xprop = rk4_step(xres, us, (dtcol - dt_t)[:, None], tau[ents],
                         drag[ents])
        pi_c, pj_c = _pair_correct_v(xprop[:, 0, 0:2], xprop[:, 1, 0:2],
                                     r_i, r_j, buf)
        xi_base_pair = xprop[:, 0].at[:, 0:2].set(pi_c)
        xj_base = xprop[:, 1].at[:, 0:2].set(pj_c)
        xi_base_wall = _wall_correct_v(xprop[:, 0], r_i, ctype, halfx,
                                       halfy, buf)
        goal_now = goal                                    # zero puck state
        xi_base = jnp.where(is_pair[:, None], xi_base_pair,
                            jnp.where(goal_now[:, None],
                                      jnp.zeros((5, 4), dtype),
                                      xi_base_wall))

        # --- slot -> entity mapping -------------------------------------
        claim = live[:, None] & inv                        # (slot, ent)
        claimed = jnp.any(claim, axis=0)                   # (5,) entities
        slot_of = jnp.argmax(claim, axis=0)                # (5,)
        primary = ids[slot_of] == ids                      # e is its slot's i
        ent_val = jnp.where(primary[:, None], xi_base[slot_of],
                            xj_base[slot_of])              # (5, 4)
        ent_base = base_a[slot_of]                         # (5,)

        col_vals = grid_c[ent_base, ids]
        grid1 = grid_c.at[ent_base, ids].set(
            jnp.where(claimed[:, None], ent_val, col_vals))

        # --- closed-form tail re-propagation + feedback-free corrections
        k_idx = jnp.arange(1, G + 1)[:, None]              # (G, 1)
        dtl = jnp.clip(k_idx - ent_base[None, :], 0, G)    # (G, 5)
        Fd = Fpow[dtl, ids[None, :]]                       # (G, 5, 4, 4)
        Sd = Spow[dtl, ids[None, :]]                       # (G, 5, 4, 2)
        x_tail = (jnp.einsum("keij,ej->kei", Fd, ent_val,
                             precision=lax.Precision.HIGHEST) +
                  jnp.einsum("keij,ej->kei", Sd, inputs,
                             precision=lax.Precision.HIGHEST))  # (G, 5, 4)

        ent_ctype = ctype[slot_of]
        ent_pair = is_pair[slot_of]
        partner = jnp.where(primary, jj[slot_of], ids[slot_of])   # (5,)
        # pair correction vs the partner's (uncorrected) tail columns
        part_tail = x_tail[:, partner]                     # (G, 5, 4)
        r_e, r_p = radius[ids], radius[partner]
        pe_c, _ = _pair_correct_v(x_tail[..., 0:2], part_tail[..., 0:2],
                                  r_e, r_p, buf)
        tail_pair = x_tail.at[..., 0:2].set(pe_c)
        tail_wall = _wall_correct_v(x_tail, radius[ids],
                                    jnp.broadcast_to(ent_ctype, (G, 5)),
                                    halfx, halfy, buf)
        tail = jnp.where(ent_pair[None, :, None], tail_pair, tail_wall)

        apply = claimed[None, :] & (k_idx > ent_base[None, :])    # (G, 5)
        new_cols = jnp.where(apply[..., None], tail, grid1[1:])
        grid_new = jnp.concatenate([grid1[:1], new_cols], axis=0)

        # --- slot bookkeeping --------------------------------------------
        refs_touched = jnp.any(inv & claimed[None, :], axis=-1)   # (5,) slots
        keep_valid = valid & ~refs_touched & ~skip
        redet = _detect(grid_new, jnp.where(claimed, ent_base, 1), t0,
                        params, radius)
        slots_new = _Slots(
            t=jnp.where(claimed, redet.t, slots_c.t),
            j=jnp.where(claimed, redet.j, slots_c.j),
            ctype=jnp.where(claimed, redet.ctype, slots_c.ctype),
            valid=jnp.where(claimed, redet.valid, keep_valid),
        )
        return (grid_new, slots_new, scored_new, score_new, dmg_new, it + 1)

    init = (grid, slots, jnp.asarray(False), state.score, state.damage,
            jnp.asarray(0, jnp.int32))
    (grid, _, _, score, damage, _) = lax.while_loop(loop_cond, loop_body,
                                                    init)

    return GameState(x=grid[G], score=score, damage=damage,
                     t=t0 + dt, key=key)
