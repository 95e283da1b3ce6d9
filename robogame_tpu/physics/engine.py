"""TPU-native game step: RK4 sub-step grid + event-driven collision loop.

Capability spec from the reference (re-designed, not ported):

* ``GameSim::updateSim`` (/root/reference/src/GameSim.cpp:126-171): populate a
  51-point sub-step state grid with RK4 (dt_col = dt/50), then repeatedly
  (<= COLLISION_COUNTER_LIM) find the earliest predicted collision, resolve
  it, re-simulate the affected entities' remaining grid points, and re-check
  only those entities.
* Detection (/root/reference/src/GameSim.cpp:360-511): per entity, scan grid
  columns from ``base_idx`` for the first column with any wall/inter-agent
  overlap, backtrack the exact collision time (linear for walls, constant-
  velocity quadratic for circles), and record it iff t_col - t < dt.
* Resolution (/root/reference/src/GameSim.cpp:219-358): elastic two-body
  impulse / sign-conditioned wall velocity flip, goal scoring with a
  ``scored`` latch that zeroes the puck and skips further puck events,
  player-player damage accrual, and overlap corrections (1.01 de-penetration
  at resolve time, OVERLAP_BUFFER=1.1 at grid fix-up time, both along the
  *unnormalized* relative position vector -- a reference quirk replicated
  here because it is parity-visible).

TPU-first design: the sequential C++ event loop becomes a ``lax.while_loop``
whose carry holds one pending-collision *slot per entity* (the reference's
``insertCollisions`` records at most one imminent collision per checked
entity).  All detection work inside an iteration is fully vectorized over
(grid columns x entities x 9 candidate types); batching over games is plain
``vmap``.  Everything is branch-free (masked selects), static-shaped, and
dtype-parameterized (f32 on TPU, f64 for the parity harness).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import INTER_AGENT, PUCK, SimParams
from ..state import GameState, undecided
from .dynamics import entity_consts, rk4_step

_INF = 1.0e9  # "no collision" sentinel (matches Collision() ctor t=1e9,
              # /root/reference/include/Collision.h:9)


class _Slots(NamedTuple):
    """Pending earliest collision per detecting entity."""
    t: jax.Array       # (5,) collision time (INF if none)
    j: jax.Array       # (5,) int32 other entity (-1 for walls)
    ctype: jax.Array   # (5,) int32 collision type (WALL_* or INTER_AGENT)
    valid: jax.Array   # (5,) bool


def _safe_div(num, den):
    ok = den != 0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), _INF)


def _detect(grid, base_idx, t0, params: SimParams, radius):
    """Vectorized equivalent of ``GameSim::insertCollisions`` for ALL
    entities at once; the caller masks which slots to actually update.

    Returns a :class:`_Slots` of each entity's first qualifying collision
    scanning grid columns ``base_idx..G``.
    """
    G = params.grid_points
    dtype = grid.dtype
    dtcol = jnp.asarray(params.dt_col, dtype)
    halfx = jnp.asarray(params.arena_x / 2.0, dtype)
    halfy = jnp.asarray(params.arena_y / 2.0, dtype)

    pos_k = grid[1:, :, 0:2]                    # (G, 5, 2) column k = 1..G
    pos_m = grid[:-1, :, 0:2]                   # column k-1
    vel_m = grid[:-1, :, 2:4]
    r = radius                                  # (5,)
    t_m = t0 + dtcol * jnp.arange(G, dtype=dtype)[:, None]   # (G, 1)

    # --- wall candidates, order UP, DOWN, RIGHT, LEFT (= collision ids 0-3,
    #     checked in this order with strict < in the reference) ---
    def wall(axis, sign, bound):
        overlap = sign * pos_k[:, :, axis] + r >= bound        # (G, 5)
        v = vel_m[:, :, axis]
        approaching = sign * v > 0
        # UP: tau = (Y/2 - r - p)/v ; DOWN: (-Y/2 + r - p)/v ; etc.
        tau = jnp.maximum(0.0, _safe_div((bound - r) * sign - pos_m[:, :, axis], v))
        t_col = t_m + tau
        return jnp.where(overlap & approaching, t_col, _INF)

    cand_walls = jnp.stack([
        wall(1, 1.0, halfy),     # UP:    p.y + r >= Y/2,  v.y > 0
        wall(1, -1.0, halfy),    # DOWN:  p.y - r <= -Y/2, v.y < 0
        wall(0, 1.0, halfx),     # RIGHT
        wall(0, -1.0, halfx),    # LEFT
    ], axis=-1)                                             # (G, 5, 4)

    # --- inter-agent candidates, other-entity order ascending (matches the
    #     reference's entities_ iteration, GameSim.cpp:466-498) ---
    dp_k = pos_k[:, None, :, :] - pos_k[:, :, None, :]      # [g, e, o] = o - e
    dist_k = jnp.linalg.norm(dp_k, axis=-1)                 # (G, 5, 5)
    sigma = r[:, None] + r[None, :]                         # (5, 5)
    overlap_k = dist_k <= sigma

    dp_m = pos_m[:, None, :, :] - pos_m[:, :, None, :]
    dv_m = vel_m[:, None, :, :] - vel_m[:, :, None, :]
    b = jnp.sum(dp_m * dv_m, axis=-1)                       # Δp·Δv
    dvv = jnp.sum(dv_m * dv_m, axis=-1)
    dpp = jnp.sum(dp_m * dp_m, axis=-1)
    disc = b * b - dvv * (dpp - sigma * sigma)
    ok = overlap_k & (b < 0) & (disc >= 0)
    tau = jnp.maximum(0.0, _safe_div(-(b + jnp.sqrt(jnp.maximum(disc, 0.0))),
                                     dvv))
    t_pair = t_m[:, :, None] + tau                          # (G, 5, 5)
    eye = jnp.eye(grid.shape[1], dtype=bool)
    cand_pairs = jnp.where(ok & ~eye, t_pair, _INF)         # (G, 5, 5)

    # --- first-minimum per column (reference uses strict <, so the first
    #     candidate in check order wins ties; argmin picks the first min) ---
    cands = jnp.concatenate([cand_walls, cand_pairs], axis=-1)   # (G, 5, 9)
    tmin = jnp.min(cands, axis=-1)                               # (G, 5)
    cidx = jnp.argmin(cands, axis=-1).astype(jnp.int32)          # (G, 5)

    # first column >= base_idx whose min candidate qualifies (t_col - t < dt)
    cols = jnp.arange(1, G + 1)[:, None]                          # (G, 1)
    qualify = (tmin - t0 < jnp.asarray(params.dt, dtype)) & (cols >= base_idx)
    first = jnp.argmax(qualify, axis=0)                           # (5,)
    found = jnp.any(qualify, axis=0)

    ent = jnp.arange(grid.shape[1])
    sel_t = tmin[first, ent]
    sel_c = cidx[first, ent]
    is_pair = sel_c >= 4
    return _Slots(
        t=jnp.where(found, sel_t, _INF),
        j=jnp.where(is_pair, sel_c - 4, -1).astype(jnp.int32),
        ctype=jnp.where(is_pair, INTER_AGENT, sel_c).astype(jnp.int32),
        valid=found,
    )


def _pair_overlap_correction(p_i, p_j, r_i, r_j, buffer):
    """De-penetration along the *unnormalized* relative position vector
    (reference quirk, /root/reference/src/GameSim.cpp:263-264,587-588).

    Float evaluation order matches the reference expression
    ``buffer * r/(r_i+r_j) * overlap * pij`` term by term so float64 runs
    track the C++ oracle bit-tightly."""
    pij = p_j - p_i
    overlap = r_i + r_j - jnp.linalg.norm(pij)
    apply = overlap > 0
    coef_i = jnp.where(apply, buffer * r_i / (r_i + r_j) * overlap, 0.0)
    coef_j = jnp.where(apply, buffer * r_j / (r_i + r_j) * overlap, 0.0)
    return p_i - coef_i * pij, p_j + coef_j * pij


def _wall_overlap_correction(x, r, ctype, halfx, halfy, buffer):
    """Wall fix-up with a proper unit normal
    (/root/reference/src/GameSim.cpp:594-623). ``ctype`` selects the wall."""
    p = x[0:2]
    overlaps = jnp.stack([p[1] + r - halfy,    # UP
                          -p[1] + r - halfy,   # DOWN
                          p[0] + r - halfx,    # RIGHT
                          -p[0] + r - halfx])  # LEFT
    dirs = jnp.asarray([[0.0, -1.0], [0.0, 1.0], [-1.0, 0.0], [1.0, 0.0]],
                       dtype=x.dtype)
    w = jnp.clip(ctype, 0, 3)
    overlap = overlaps[w]
    corr = jnp.where(overlap > 0, buffer * overlap, 0.0) * dirs[w]
    return x.at[0:2].add(jnp.where(ctype < 4, corr, jnp.zeros_like(corr)))


def _iter_noise(key, counter, n_cols, stochastic, w, dtype):
    """Per-event-loop-iteration noise draws (players only).

    Returns (res_noise (4,2,2), prop_noise (4,2,2), scan_noise (G,4,5,2)).
    The reference draws fresh normals inside every RK4 stage during collision
    handling too (/root/reference/src/GameSim.cpp:66-67); the exact stream
    differs (std RNG vs threefry) so equivalence is statistical, and exact at
    w_stdev = 0 (the parity configs).
    """
    if not stochastic:
        return None, None, None
    k = jax.random.fold_in(key, counter)
    k1, k2, k3 = jax.random.split(k, 3)
    rn = w * jax.random.normal(k1, (4, 2, 2), dtype=dtype)
    pn = w * jax.random.normal(k2, (4, 2, 2), dtype=dtype)
    sn = w * jax.random.normal(k3, (n_cols, 4, 5, 2), dtype=dtype)
    sn = sn * jnp.array([1, 1, 1, 1, 0], dtype=dtype)[None, None, :, None]
    return rn, pn, sn


@functools.partial(jax.jit, static_argnames=("params",))
def step(state: GameState, controls: jax.Array,
         params: SimParams) -> GameState:
    """One control step (dt seconds) of the full game physics.

    ``controls``: (4, 2) commanded velocities for [A1, A2, B1, B2]
    (the puck input is identically zero, /root/reference/src/GameSim.cpp:188).
    A decided game (score reached winning_score) is a no-op, mirroring the
    ``undecided`` gate in ``GameSim::run`` (/root/reference/src/GameSim.cpp:118-124).

    ``params.engine`` selects the implementation: "event" (this module,
    reference-exact) or "sweep" (physics/sweep.py, TPU-throughput).
    """
    if (params.engine == "pallas_exact" or
            (params.engine == "pallas" and not params.stochastic)):
        # the pallas kernels are natively batched; single-state calls wrap
        # into a batch of one (padded to a 128-lane tile internally)
        from .pallas_step import step_pallas_batch
        batched = jax.tree.map(lambda a: a[None], state)
        out = step_pallas_batch(batched, jnp.asarray(controls)[None],
                                params)
        return jax.tree.map(lambda a: a[0], out)
    if params.engine in ("sweep", "pallas"):
        from .sweep import _update_sweep
        new_state = _update_sweep(state, controls, params)
    else:
        new_state = _update_sim(state, controls, params)
    keep = undecided(state, params)
    out = jax.tree.map(lambda n, o: jnp.where(keep, n, o), new_state, state)
    # Time still advances key for reproducibility even when frozen:
    return out


def _update_sim(state: GameState, controls, params: SimParams) -> GameState:
    G = params.grid_points
    dtype = params.jdtype
    tau, drag, radius, mass = entity_consts(params)
    dtcol = jnp.asarray(params.dt_col, dtype)
    dt = jnp.asarray(params.dt, dtype)
    halfx = jnp.asarray(params.arena_x / 2.0, dtype)
    halfy = jnp.asarray(params.arena_y / 2.0, dtype)
    buf = jnp.asarray(params.overlap_buffer, dtype)
    w = jnp.asarray(params.noise, dtype)

    controls = jnp.asarray(controls, dtype).reshape(4, 2)
    inputs = jnp.concatenate([controls, jnp.zeros((1, 2), dtype)], axis=0)
    t0 = state.t

    key, kpop, kloop = jax.random.split(state.key, 3)

    # ------------------------------------------------------------------
    # 1. Populate the sub-step state grid (GameSim.cpp:173-217)
    # ------------------------------------------------------------------
    if params.stochastic:
        noise = w * jax.random.normal(kpop, (G, 4, 5, 2), dtype=dtype)
        noise = noise * jnp.array([1, 1, 1, 1, 0], dtype=dtype)[None, None, :,
                                                                None]
    else:
        noise = jnp.zeros((G, 1, 1, 1), dtype=dtype)

    def populate(x, stage_noise):
        if params.stochastic:
            nz = tuple(stage_noise[s] for s in range(4))
        else:
            nz = None
        nxt = rk4_step(x, inputs, dtcol, tau, drag, nz)
        return nxt, nxt

    _, cols = lax.scan(populate, state.x, noise)
    grid = jnp.concatenate([state.x[None], cols], axis=0)    # (G+1, 5, 4)

    # ------------------------------------------------------------------
    # 2. Event-driven collision loop (GameSim.cpp:136-150)
    # ------------------------------------------------------------------
    slots = _detect(grid, jnp.asarray(1, jnp.int32), t0, params, radius)

    def rk4_pair(xs, us, dts, ents, nz):
        """RK4 for a gathered 2-row entity batch with per-row dt."""
        return rk4_step(xs, us, dts, tau[ents], drag[ents], nz)

    def loop_cond(c):
        (_, slots_c, _, _, _, _, counter, _) = c
        return jnp.any(slots_c.valid) & (counter <
                                         params.collision_counter_lim)

    def loop_body(c):
        (grid_c, slots_c, base_c, scored_c, score_c, dmg_c, counter,
         key_c) = c

        # --- pop earliest; ties -> highest entity index (the reference's
        # descending sort keeps insertion order among equals and pops the
        # back; first-round insertion order is ascending entity id) ---
        t_eff = jnp.where(slots_c.valid, slots_c.t, _INF)
        e_pop = (4 - jnp.argmin(t_eff[::-1])).astype(jnp.int32)
        tcol = t_eff[e_pop]
        j_pop = slots_c.j[e_pop]
        ctype = slots_c.ctype[e_pop]
        is_pair = ctype == INTER_AGENT

        # scored latch: drop puck events without re-checking
        # (GameSim.cpp:229-231)
        puck_involved = (e_pop == PUCK) | (is_pair & (j_pop == PUCK))
        skip = puck_involved & scored_c
        live = ~skip

        rn, pn, sn = _iter_noise(kloop, counter, G, params.stochastic, w,
                                 dtype)
        if params.stochastic:
            # the puck's dynamics draw no noise (GameSim.cpp:90-96)
            ents_pre = jnp.stack([e_pop, jnp.where(is_pair, j_pop, 0)])
            pmask = (ents_pre != PUCK).astype(dtype)[None, :, None]
            rn = rn * pmask
            pn = pn * pmask

        # --- simulate the two involved entities up to t_col ---
        km1 = jnp.floor((tcol - t0) / dtcol).astype(jnp.int32)
        base_new = km1 + 1
        e_j = jnp.where(is_pair, j_pop, 0).astype(jnp.int32)  # safe index
        ents = jnp.stack([e_pop, e_j])
        xs_m = grid_c[km1, ents]                              # (2, 4)
        us = inputs[ents]
        dt_t = tcol - (t0 + km1.astype(dtype) * dtcol)
        xs_t = rk4_pair(xs_m, us, dt_t, ents, rn)

        r_i, r_j = radius[e_pop], radius[e_j]
        m_i, m_j = mass[e_pop], mass[e_j]

        # --- INTER_AGENT branch (GameSim.cpp:242-298) ---
        p_i, p_j = _pair_overlap_correction(xs_t[0, 0:2], xs_t[1, 0:2],
                                            r_i, r_j,
                                            jnp.asarray(1.01, dtype))
        v1, v2 = xs_t[0, 2:4], xs_t[1, 2:4]
        d12 = p_i - p_j
        den = jnp.sum(d12 * d12)
        den_safe = jnp.where(den > 0, den, 1.0)
        # elastic impulse (GameSim.cpp:272-274); evaluation order follows the
        # reference expression  v1 - 2*m_j/(m_i+m_j) * dot/den * d12
        dot_v = jnp.sum((v1 - v2) * d12)
        vi_new = v1 - 2.0 * m_j / (m_i + m_j) * dot_v / den_safe * d12
        # j's update uses (v2-v1)·(p2-p1)/|p2-p1|² (p2-p1) == dot_v/den*(-d12)
        vj_new = v2 - 2.0 * m_i / (m_i + m_j) * dot_v / den_safe * (-d12)
        xi_pair = jnp.concatenate([p_i, vi_new])
        xj_pair = jnp.concatenate([p_j, vj_new])

        dmg_on = live & is_pair & (e_pop != PUCK) & (e_j != PUCK)
        dv2 = 0.01 * jnp.sum((v1 - v2) * (v1 - v2))
        di = jnp.clip(e_pop, 0, 3)
        dj = jnp.clip(e_j, 0, 3)
        dmg_new = dmg_c.at[di, dj].add(jnp.where(dmg_on, m_i * dv2, 0.0))
        dmg_new = dmg_new.at[dj, di].add(jnp.where(dmg_on, m_j * dv2, 0.0))

        # --- WALL branch (GameSim.cpp:300-343) ---
        vx, vy = xs_t[0, 2], xs_t[0, 3]
        flip_y = ((ctype == 0) & (vy > 0)) | ((ctype == 1) & (vy < 0))
        flip_x = ((ctype == 2) & (vx > 0)) | ((ctype == 3) & (vx < 0))
        x_wall = xs_t[0].at[2].multiply(jnp.where(flip_x, -1.0, 1.0))
        x_wall = x_wall.at[3].multiply(jnp.where(flip_y, -1.0, 1.0))

        py = xs_t[0, 1]
        gh2 = jnp.asarray(params.goal_height / 2.0, dtype)
        goal = ((~is_pair) & (e_pop == PUCK)
                & ((ctype == 2) | (ctype == 3))
                & (py < gh2) & (py > -gh2))
        # WALL_RIGHT -> team A scores, WALL_LEFT -> team B
        # (GameSim.cpp:324)
        inc = jnp.where(goal & live & ~scored_c,
                        jnp.where(ctype == 2,
                                  jnp.array([1, 0], jnp.int32),
                                  jnp.array([0, 1], jnp.int32)),
                        jnp.zeros(2, jnp.int32))
        score_new = score_c + inc
        scored_new = scored_c | (goal & live)

        # --- value at grid column base_new ---
        xres = jnp.stack([jnp.where(is_pair, xi_pair, x_wall),
                          xj_pair])
        xprop = rk4_pair(xres, us, dtcol - dt_t, ents, pn)
        # pair: correct overlap between the two at the base column
        pi_c, pj_c = _pair_overlap_correction(xprop[0, 0:2], xprop[1, 0:2],
                                              r_i, r_j, buf)
        xi_base_pair = xprop[0].at[0:2].set(pi_c)
        xj_base = xprop[1].at[0:2].set(pj_c)
        # wall: correct against the same wall; goal: zero the puck
        xi_base_wall = _wall_overlap_correction(xprop[0], r_i, ctype, halfx,
                                                halfy, buf)
        xi_base = jnp.where(is_pair, xi_base_pair,
                            jnp.where(goal, jnp.zeros(4, dtype),
                                      xi_base_wall))

        col = grid_c[base_new]
        col = col.at[e_pop].set(jnp.where(live, xi_base, col[e_pop]))
        write_j = live & is_pair
        col = col.at[e_j].set(jnp.where(write_j, xj_base, col[e_j]))
        grid1 = grid_c.at[base_new].set(col)

        # --- re-propagate affected entities over remaining columns with
        #     per-column overlap fix-ups (GameSim.cpp:292-297,336-340) ---
        aff = ((jnp.arange(5) == e_pop) |
               (is_pair & (jnp.arange(5) == e_j))) & live

        def reprop(prev, xs):
            c_idx, old_col, col_noise = xs
            if params.stochastic:
                nz = tuple(col_noise[s] for s in range(4))
            else:
                nz = None
            prop = rk4_step(prev, inputs, dtcol, tau, drag, nz)
            m = aff & (c_idx > base_new)
            val = jnp.where(m[:, None], prop, old_col)
            # corrections only on re-propagated columns
            pi2, pj2 = _pair_overlap_correction(val[e_pop, 0:2],
                                                val[e_j, 0:2], r_i, r_j, buf)
            val_pair = val.at[e_pop, 0:2].set(pi2).at[e_j, 0:2].set(pj2)
            val_wall = val.at[e_pop].set(
                _wall_overlap_correction(val[e_pop], r_i, ctype, halfx,
                                         halfy, buf))
            corrected = jnp.where(is_pair, val_pair, val_wall)
            val = jnp.where((aff[e_pop] & (c_idx > base_new)), corrected, val)
            return val, val

        cidx = jnp.arange(1, G + 1)
        scan_noise = sn if params.stochastic else jnp.zeros((G, 1, 1, 1),
                                                            dtype)
        _, new_cols = lax.scan(reprop, grid1[0],
                               (cidx, grid1[1:], scan_noise))
        grid_new = jnp.concatenate([grid1[:1], new_cols], axis=0)

        # --- slot bookkeeping: drop events touching affected entities,
        #     re-check only affected entities (GameSim.cpp:347-357) ---
        ids = jnp.arange(5)
        touched = ((ids == e_pop) | (is_pair & (ids == e_j)))
        j_touched = ((slots_c.j == e_pop) |
                     (is_pair & (slots_c.j == e_j))) & (slots_c.j >= 0)
        valid_kept = slots_c.valid & ~touched & ~j_touched

        redetect = _detect(grid_new, base_new, t0, params, radius)
        upd = aff
        slots_new = _Slots(
            t=jnp.where(upd, redetect.t, slots_c.t),
            j=jnp.where(upd, redetect.j, slots_c.j),
            ctype=jnp.where(upd, redetect.ctype, slots_c.ctype),
            valid=jnp.where(upd, redetect.valid, valid_kept),
        )
        # skip case: only invalidate the popped slot
        pop_only = slots_c._replace(
            valid=slots_c.valid & ~(ids == e_pop))
        slots_out = jax.tree.map(
            lambda a, b: jnp.where(skip, a, b), pop_only, slots_new)

        base_out = jnp.where(skip, base_c, base_new)
        return (grid_new, slots_out, base_out, scored_new, score_new,
                dmg_new, counter + 1, key_c)

    init = (grid, slots, jnp.asarray(1, jnp.int32),
            jnp.asarray(False), state.score, state.damage,
            jnp.asarray(1, jnp.int32), kloop)
    (grid, _, _, _, score, damage, _, _) = lax.while_loop(
        loop_cond, loop_body, init)

    # ------------------------------------------------------------------
    # 3. Commit final grid column (GameSim.cpp:152-158)
    # ------------------------------------------------------------------
    return GameState(x=grid[G], score=score, damage=damage,
                     t=t0 + dt, key=key)
