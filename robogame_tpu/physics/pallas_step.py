"""Pallas TPU mega-kernel for the sweep game step.

The sweep engine (physics/sweep.py) is already structured for TPU, but as
an XLA op graph every one of its ~10^2 small ops per event-loop iteration
round-trips (B, ...) tensors through HBM.  This kernel runs the ENTIRE
control step -- closed-form grid populate, collision detection, parallel
disjoint-event resolution, tail re-propagation -- inside VMEM, with the
game batch laid out along the 128-wide lane dimension:

* one tile = 128 games; the per-tile working set (the 51-column sub-step
  grid, stored as 20 per-component (G+1, 128) VMEM buffers) lives on-chip
  for the whole step;
* grid populate and post-collision tail re-propagation are per-component
  MXU matmuls against a precomputed affine table [Fpow | Spow] (RK4 on
  the LTI dynamics is a constant affine map, see sweep.py) --
  re-propagation from a per-lane base column b uses the algebraic identity
  x_k = Fpow[k] z + Spow[k] u with z = Finvpow[b] (x_b - Spow[b] u), so a
  lane-varying re-propagation start needs no lane-varying matrix;
* all event bookkeeping (selection, impulses, wall flips, scoring) is
  elementwise over lanes; "gathers" are one-hot masked sums over columns.

Mosaic lowering constraints shaped the implementation: no scatter ops
(static per-row updates instead), no rank>1 bool tensors (f32 0/1 masks),
no reductions over offset-layout slices (hence the per-component 2D
buffers and pltpu.roll for predecessor columns).

Semantics match physics/sweep.py with one simplification: slots are fully
re-detected every iteration (the sweep engine keeps stale slots for
untouched entities; a full re-detect over unchanged columns returns the
same slot, so the difference only reorders rare multi-collision pileups).
Stochastic mode generates the populate-pass noise contribution outside
the kernel (sweep.populate_noise) and passes it in as an input plane.

Reference capability spec: GameSim::updateSim
(/root/reference/src/GameSim.cpp:126-171) -- constants and quirks as in
engine.py / sweep.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PUCK, SimParams
from ..state import GameState
from .sweep import _affine_tables_np, _substep_affine_np


def _substep_scalars(params: SimParams):
    """The one-substep RK4 affine map collapsed to 4 scalars per entity.

    The damped-double-integrator F/S (sweep._substep_affine_np) are sparse
    and x/y-symmetric: F = [[1,0,a,0],[0,1,0,a],[0,0,b,0],[0,0,0,b]],
    S = [[c,0],[0,c],[d,0],[0,d]].  The exact kernel's sequential feedback
    loop uses these scalars directly -- one fixed-dtcol propagation is then
    8 multiply-adds per role instead of a full RK4 evaluation."""
    F, S, _ = _substep_affine_np(params)
    a = [float(F[e][0, 2]) for e in range(5)]
    b = [float(F[e][2, 2]) for e in range(5)]
    c = [float(S[e][0, 0]) for e in range(5)]
    d = [float(S[e][2, 0]) for e in range(5)]
    return a, b, c, d

TILE = 128
_INF = 1.0e9
NC = 20      # state components: 5 entities x 4

# Incremental re-detection experiment (VERDICT r4 #5): detect() can run
# over pl.when-gated column blocks, skipping whole blocks below every
# live lane's re-detect base.  MEASURED NEGATIVE on TPU (r5 ablation,
# tools/bench_grind.py): corner grind one-phase B=2048 reads 426k
# steps/s with 8-row blocks / 480k with 16-row vs 540k monolithic --
# the gate is min(base) over 128 lanes, and with random per-game corner
# assignments one early-base lane per tile keeps every block live, so
# the blocking overhead (per-block branch + merge) is all cost and no
# skip.  Default is therefore the monolithic scan everywhere; the
# blocked variant stays behind this flag for the equivalence test and
# future narrower-tile experiments.  (None = auto: monolithic.)
_FORCE_BLOCKED_DETECT = None
_DETECT_BLOCK = 8


# ---------------------------------------------------------------------------
# Compile-time constant tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _tables(key):
    params = SimParams(**dict(key))
    G = params.grid_points
    Fpow, Spow, _ = _affine_tables_np(params)      # (G+1,5,4,4), (G+1,5,4,2)
    F, _, _ = _substep_affine_np(params)
    Finv = np.stack([np.linalg.inv(F[e]) for e in range(5)])
    Finvpow = np.zeros((G + 1, 5, 4, 4))
    Finvpow[0] = np.eye(4)
    for d in range(1, G + 1):
        Finvpow[d] = np.einsum("eij,ejk->eik", Finv, Finvpow[d - 1])

    # per-component affine tables: M[c] (G+1, 32) maps [x(20);u(10);pad2]
    # to grid column values of component c = e*4 + i
    M = np.zeros((NC, G + 1, 32))
    for e in range(5):
        for i in range(4):
            c = e * 4 + i
            M[c, :, e * 4:e * 4 + 4] = Fpow[:, e, i, :]
            M[c, :, 20 + e * 2:20 + e * 2 + 2] = Spow[:, e, i, :]
    # z tables, pre-transposed: FI (80, G+1), SP (40, G+1)
    FI = Finvpow.reshape(G + 1, 80).T.copy()
    SP = Spow.reshape(G + 1, 40).T.copy()
    return (M.astype(np.float32), FI.astype(np.float32),
            SP.astype(np.float32))


def _table_key(params: SimParams):
    return (("dt", params.dt), ("grid_points", params.grid_points),
            ("tau_player", params.tau_player),
            ("tau_puck", params.tau_puck))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _make_kernel(params: SimParams, mode: str = "full", cap: int = None,
                 blocked_detect: bool = True):
    """mode: 'full' (one pass, finalize), 'export' (finalize AND dump the
    event-loop state -- grid planes + carry -- so unconverged games can be
    compacted and finished by a 'resume' kernel), 'resume' (skip populate,
    restart the loop from imported grid+carry), 'exact' (event-ORDER-exact
    loop: each lane resolves its single globally-earliest event per
    iteration with sequential feedback re-propagation -- the reference's
    GameSim::updateSim semantics, /root/reference/src/GameSim.cpp:136-150
    -- instead of the throughput mode's parallel disjoint resolution),
    'exact_export'/'exact_resume' (the exact loop's two-phase
    compact-and-resume variants; the event-loop state round-trips through
    the 48-row carry INCLUDING the slot lists, so stale-slot semantics
    survive compaction).  See step_pallas_batch / _twophase_planes."""
    stochastic = params.stochastic and mode in ("full", "export",
                                                "exact", "exact_export")
    is_resume = mode in ("resume", "exact_resume")
    is_export = mode in ("export", "exact_export")
    is_exact = mode.startswith("exact")
    # exact modes additionally consume a per-substep re-propagation noise
    # plane inside the feedback loop (ALL exact modes incl. resume -- the
    # loop runs there too; populate noise only where populate runs)
    reprop_noise = params.stochastic and is_exact
    G = params.grid_points
    dt = params.dt
    dtcol = params.dt_col
    halfx = params.arena_x / 2.0
    halfy = params.arena_y / 2.0
    gh2 = params.goal_height / 2.0
    buf = params.overlap_buffer
    radii = params.radii
    masses = params.masses
    taus = params.taus
    drags = params.drags
    if is_exact:
        # mirror engine.py's loop budget: the reference counter starts at
        # 1 and the loop runs while counter < collision_counter_lim, so
        # at most lim-1 EVENTS resolve per lane per control step
        # (/root/reference/include/GameSim.h:7, GameSim.cpp:136).  `cap`
        # (two-phase) is given directly in events.
        iters = (cap if cap is not None
                 else params.collision_counter_lim - 1)
    else:
        iters = cap if cap is not None else params.sweep_iters
    E = 5
    if is_exact:
        sub_a, sub_b, sub_c, sub_d = _substep_scalars(params)

    winning_score = float(params.winning_score)

    def kernel(M_ref, FI_ref, SP_ref, x_ref, u_ref, meta_ref, dmgin_ref,
               *rest):
        # meta_ref (8,TILE): rows 0/1 scores, 2 sim time; dmgin_ref (16,T)
        # rest: [noise_ref (stochastic, full/export)],
        #       [gridin_ref, carryin_ref (resume)], xout_ref, aux_ref,
        #       [gridout_ref, carryout_ref (export)], gc...
        rest = list(rest)
        noise_ref = rest.pop(0) if stochastic else None
        rnoise_ref = rest.pop(0) if reprop_noise else None
        if is_resume:
            gridin_ref = rest.pop(0)
            carryin_ref = rest.pop(0)
        xout_ref = rest.pop(0)
        aux_ref = rest.pop(0)
        if is_export:
            gridout_ref = rest.pop(0)
            carryout_ref = rest.pop(0)
        gc = rest[:NC]
        # exact mode: 8 extra (G+1, TILE) scratch slabs holding the two
        # involved entities' re-propagated columns ("role i" = the popped
        # entity, "role j" = its pair partner), scattered into gc after
        # the sequential feedback loop
        role = rest[NC:NC + 8] if is_exact else None
        # stochastic exact: 8 more scratch planes for the role-premixed
        # re-propagation noise (per-substep contributions, players only)
        nmix = rest[NC + 8:NC + 16] if reprop_noise else None
        # detect's running first-qualifying state (all modes): rows
        # e*3 + [kfirst, t, meta] -- persists across the block scan
        dst = rest[-1]
        # decided-game freeze (GameSim::run gate, GameSim.cpp:118-124),
        # applied in-kernel so step glue needs no extra XLA ops
        undec = ((meta_ref[0] < winning_score) &
                 (meta_ref[1] < winning_score))                 # (TILE,)
        # gc: NC scratch buffers, each (G+1, TILE) -- grid component planes
        if is_resume:
            for c in range(NC):
                gc[c][:] = gridin_ref[c]
        else:
            z0 = jnp.concatenate(
                [x_ref[:], u_ref[:], jnp.zeros((2, TILE), jnp.float32)],
                axis=0)
            for c in range(NC):
                val = jnp.dot(M_ref[c], z0,
                              precision=lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
                if stochastic:
                    val = val + noise_ref[c]
                gc[c][:] = val

        kcol = jax.lax.broadcasted_iota(jnp.int32, (G + 1, TILE), 0)
        kcol_f = kcol.astype(jnp.float32)
        col_ok = kcol >= 1
        colok_f = jnp.where(col_ok, 1.0, 0.0)

        def _prev(slab):
            return pltpu.roll(slab, 1, axis=0)

        def detect(base, ms=None):
            """First qualifying collision per entity; base (E,TILE) i32.
            Returns lists (len E) of (TILE,): t, j, ctype, valid.

            Incremental re-detection (``ms``, a SCALAR i32): the candidate
            scan runs over 8-row column blocks, and whole blocks strictly
            below ``ms`` are skipped with ``pl.when`` -- valid because a
            column k can only qualify with k >= base[e], so when every
            live lane's base is past the block it contributes nothing.
            The exact loop passes ms = min over live lanes of base_new;
            on sustained grinding (one event per grid column, lanes in
            near-lockstep) this skips most of the detect work of late
            event-loop iterations.  ms=None scans every block (initial
            detect, parallel mode).  Running first-qualifying state
            persists across blocks in the ``dst`` scratch rows
            (e*3 + [kfirst, t, meta]); blocks ascend, so merging
            first-found-wins preserves the reference's column order."""
            # hoist the predecessor-column rolls: one roll per component
            # (20) instead of one per pair-slab operand (~80 + walls)
            cur = [gc[c][:] for c in range(NC)]
            prv = [_prev(v) for v in cur]
            ninf = jnp.full((1, TILE), G + 1.0, jnp.float32)
            for e in range(E):
                dst[3 * e:3 * e + 1, :] = ninf          # kfirst: none
                dst[3 * e + 1:3 * e + 2, :] = jnp.full((1, TILE), _INF,
                                                       jnp.float32)
                dst[3 * e + 2:3 * e + 3, :] = jnp.zeros((1, TILE),
                                                        jnp.float32)

            def scan_block(lo, h):
                kb = (jax.lax.broadcasted_iota(jnp.int32, (h, TILE), 0)
                      + lo)
                kb_f = kb.astype(jnp.float32)
                okb = jnp.where(kb >= 1, 1.0, 0.0)
                curb = [c[lo:lo + h] for c in cur]
                prvb = [p[lo:lo + h] for p in prv]
                t_m = (kb_f - 1.0) * dtcol
                # pair candidate times are symmetric -- compute each
                # unordered pair once (10 slabs instead of 20)
                pair_tc = {}
                for i in range(E):
                    for o in range(i + 1, E):
                        px = curb[i * 4 + 0]
                        py = curb[i * 4 + 1]
                        qx = curb[o * 4 + 0]
                        qy = curb[o * 4 + 1]
                        px_m = prvb[i * 4 + 0]
                        py_m = prvb[i * 4 + 1]
                        vx_m = prvb[i * 4 + 2]
                        vy_m = prvb[i * 4 + 3]
                        qx_m = prvb[o * 4 + 0]
                        qy_m = prvb[o * 4 + 1]
                        wx_m = prvb[o * 4 + 2]
                        wy_m = prvb[o * 4 + 3]
                        sig = radii[i] + radii[o]
                        dxk = qx - px
                        dyk = qy - py
                        over = dxk * dxk + dyk * dyk <= sig * sig
                        dxm = qx_m - px_m
                        dym = qy_m - py_m
                        dvx = wx_m - vx_m
                        dvy = wy_m - vy_m
                        b = dxm * dvx + dym * dvy
                        dvv = dvx * dvx + dvy * dvy
                        dpp = dxm * dxm + dym * dym
                        disc = b * b - dvv * (dpp - sig * sig)
                        ok = over & (b < 0) & (disc >= 0) & (dvv > 0)
                        den = jnp.where(dvv == 0, 1.0, dvv)
                        tau = jnp.maximum(
                            0.0,
                            -(b + jnp.sqrt(jnp.maximum(disc, 0.0))) / den)
                        pair_tc[(i, o)] = jnp.where(ok, t_m + tau, _INF)

                for e in range(E):
                    px = curb[e * 4 + 0]
                    py = curb[e * 4 + 1]
                    px_m = prvb[e * 4 + 0]
                    py_m = prvb[e * 4 + 1]
                    vx_m = prvb[e * 4 + 2]
                    vy_m = prvb[e * 4 + 3]
                    r = radii[e]

                    best_t = None
                    # (ctype, partner) packed: meta = 16c + j+1
                    best_m = None

                    def consider(tc, cid, jid):
                        nonlocal best_t, best_m
                        better = tc < best_t
                        best_m = jnp.where(better,
                                           float(16 * cid + jid + 1),
                                           best_m)
                        best_t = jnp.where(better, tc, best_t)

                    # walls (check order UP, DOWN, RIGHT, LEFT = ctype
                    # 0..3).  The two walls of an axis are mutually
                    # exclusive (the approach test selects by velocity
                    # sign), so each axis is ONE fused candidate with a
                    # sign-selected ctype -- same result and tie-break
                    # order as four separate checks.
                    for cid0, (pk, pm, vm, bound) in enumerate([
                            (py, py_m, vy_m, halfy),
                            (px, px_m, vx_m, halfx)]):
                        toward = jnp.where(vm >= 0, 1.0, -1.0)
                        overlap = toward * pk + r >= bound
                        den = jnp.where(vm == 0, 1.0, vm)
                        tau = jnp.maximum(
                            0.0, ((bound - r) * toward - pm) / den)
                        tc = jnp.where(overlap & (vm != 0), t_m + tau,
                                       _INF)
                        cidv = jnp.where(vm >= 0, jnp.float32(2 * cid0),
                                         jnp.float32(2 * cid0 + 1))
                        if best_t is None:
                            best_t = tc
                            best_m = 16.0 * cidv
                        else:
                            better = tc < best_t
                            best_m = jnp.where(better, 16.0 * cidv,
                                               best_m)
                            best_t = jnp.where(better, tc, best_t)

                    # partners, ascending entity order
                    for o in range(E):
                        if o == e:
                            continue
                        consider(pair_tc[(min(e, o), max(e, o))], 4, o)

                    # first qualifying column in this block via the
                    # 0/1-weight blend
                    qf = (jnp.where(best_t < dt, 1.0, 0.0) * okb *
                          jnp.where(kb >= base[e][None, :], 1.0, 0.0))
                    ksel = (G + 1.0) + (kb_f - (G + 1.0)) * qf
                    kfirst_b = jnp.min(ksel, axis=0)
                    oh = jnp.where(kb_f == kfirst_b[None, :], 1.0, 0.0)
                    t_b = jnp.sum(best_t * oh, axis=0)
                    m_b = jnp.sum(best_m * oh, axis=0)
                    # merge: earlier blocks win (first qualifying column)
                    kprev = dst[3 * e]
                    tk = jnp.where((kfirst_b <= G) & (kprev > G), 1.0,
                                   0.0)
                    dst[3 * e:3 * e + 1, :] = (
                        tk * kfirst_b + (1.0 - tk) * kprev)[None, :]
                    dst[3 * e + 1:3 * e + 2, :] = (
                        tk * t_b + (1.0 - tk) * dst[3 * e + 1])[None, :]
                    dst[3 * e + 2:3 * e + 3, :] = (
                        tk * m_b + (1.0 - tk) * dst[3 * e + 2])[None, :]

            # blocked_detect=False (interpret mode): one full-height
            # block == the monolithic scan (identical math, none of the
            # 7x trace blow-up that makes interpret-mode tests crawl)
            bh = _DETECT_BLOCK
            blocks = ([(lo, min(bh, G + 1 - lo))
                       for lo in range(0, G + 1, bh)]
                      if blocked_detect else [(0, G + 1)])
            for lo, h in blocks:
                if ms is None or not blocked_detect:
                    scan_block(lo, h)
                else:
                    @pl.when(ms < lo + h)
                    def _(lo=lo, h=h):
                        scan_block(lo, h)

            t_list, j_list, c_list, v_list = [], [], [], []
            for e in range(E):
                kfirst = dst[3 * e]
                found = kfirst <= G
                sel_t = dst[3 * e + 1]
                sel_m = dst[3 * e + 2].astype(jnp.int32)
                sel_c = sel_m >> 4
                sel_j = (sel_m & 15) - 1
                t_list.append(jnp.where(found, sel_t, _INF))
                c_list.append(jnp.where(found, sel_c, 0))
                j_list.append(jnp.where(found, sel_j, -1))
                v_list.append(found)
            return t_list, j_list, c_list, v_list

        def gather_cols(km1):
            """All NC component values at per-lane column km1: list of
            (TILE,)."""
            oh = jnp.where(kcol == km1[None, :], 1.0, 0.0)
            return [jnp.sum(gc[c][:] * oh, axis=0) for c in range(NC)]

        def rk4(px, py, vx, vy, ux, uy, tau, drag, h):
            def f(vx_, vy_):
                return ((ux - drag * vx_) / tau, (uy - drag * vy_) / tau)
            a1x, a1y = f(vx, vy)
            k1 = (vx, vy, a1x, a1y)
            a2x, a2y = f(vx + a1x * h / 2, vy + a1y * h / 2)
            k2 = (vx + a1x * h / 2, vy + a1y * h / 2, a2x, a2y)
            a3x, a3y = f(vx + a2x * h / 2, vy + a2y * h / 2)
            k3 = (vx + a2x * h / 2, vy + a2y * h / 2, a3x, a3y)
            a4x, a4y = f(vx + a3x * h, vy + a3y * h)
            k4 = (vx + a3x * h, vy + a3y * h, a4x, a4y)
            out = []
            for comp in range(4):
                d = (k1[comp] + 2 * k2[comp] + 2 * k3[comp] +
                     k4[comp]) * (h / 6.0)
                out.append((px, py, vx, vy)[comp] + d)
            return out

        def detect_stacked(base, scored):
            """detect() + drop events involving an already-scored puck
            (the scored latch, GameSim.cpp:229-231), stacked for the
            while-loop carry (valid as f32 -- rank-2 bools don't lower)."""
            t, j, c, v = detect(base)
            sv = []
            for a in range(E):
                pv = (a == PUCK) | ((c[a] == 4) & (j[a] == PUCK))
                keep = v[a] & ~(pv & scored)
                sv.append(jnp.where(keep, 1.0, 0.0))
            return (jnp.stack(t), jnp.stack(j), jnp.stack(c),
                    jnp.stack(sv))

        def loop_cond(carry):
            (_, _, _, sv_s, _, _, _, _, _, _, it) = carry
            return jnp.any(sv_s > 0.5) & (it < iters)

        def body(carry):
            (st_s, sj_s, sc_s, sv_s, scored_f, incA, incB, dmg, base,
             actv, it) = carry
            scored = scored_f > 0.5
            st = [st_s[a] for a in range(E)]
            sj = [sj_s[a] for a in range(E)]
            sc = [sc_s[a] for a in range(E)]
            sv = [sv_s[a] > 0.5 for a in range(E)]

            # --- selection: local-min over the conflict graph ------------
            te = [jnp.where(sv[a], st[a], _INF) for a in range(E)]
            is_pair = [sc[a] == 4 for a in range(E)]
            jj = [jnp.where(is_pair[a], sj[a], a) for a in range(E)]
            inv = [[(a == ent) | (is_pair[a] & (jj[a] == ent))
                    for ent in range(E)] for a in range(E)]
            take = []
            for a in range(E):
                beaten = jnp.zeros((TILE,), bool)
                for b in range(E):
                    if b == a:
                        continue
                    share = jnp.zeros((TILE,), bool)
                    for ent in range(E):
                        share = share | (inv[a][ent] & inv[b][ent])
                    conf = share & sv[a] & sv[b]
                    earlier = conf & ((te[b] < te[a]) |
                                      ((te[b] == te[a]) & (b < a)))
                    beaten = beaten | earlier
                take.append(sv[a] & ~beaten)

            live = take        # scored-puck events already dropped

            # --- resolve all live slots (slot index == entity i) ---------
            ent_val = [None] * E
            ent_base = [None] * E
            ent_claim = [jnp.zeros((TILE,), bool) for _ in range(E)]
            ent_ctype = [None] * E
            ent_pair = [None] * E      # f32 0/1
            ent_partner = [None] * E
            new_scored = scored
            any_goalA = jnp.zeros((TILE,), bool)
            any_goalB = jnp.zeros((TILE,), bool)
            dmg_rows = [dmg[r] for r in range(16)]

            for a in range(E):
                km1 = jnp.clip((te[a] / dtcol).astype(jnp.int32), 0, G - 1)
                basea = km1 + 1
                cols = gather_cols(km1)
                xi = [cols[a * 4 + c] for c in range(4)]
                moh = [jnp.where(jj[a] == o, 1.0, 0.0) for o in range(E)]
                xjv = [sum(moh[o] * cols[o * 4 + c] for o in range(E))
                       for c in range(4)]
                tau_j = sum(moh[o] * taus[o] for o in range(E))
                drag_j = sum(moh[o] * drags[o] for o in range(E))
                r_j = sum(moh[o] * radii[o] for o in range(E))
                m_j = sum(moh[o] * masses[o] for o in range(E))
                u_i = (u_ref[a * 2], u_ref[a * 2 + 1])
                u_jx = sum(moh[o] * u_ref[o * 2] for o in range(E))
                u_jy = sum(moh[o] * u_ref[o * 2 + 1] for o in range(E))

                dt_t = jnp.clip(te[a] - km1.astype(jnp.float32) * dtcol,
                                0.0, dtcol)
                xi_t = rk4(*xi, *u_i, taus[a], drags[a], dt_t)
                xj_t = rk4(*xjv, u_jx, u_jy, tau_j, drag_j, dt_t)

                r_i, m_i = radii[a], masses[a]
                # pair: de-penetrate (1.01) + elastic impulse
                pijx = xj_t[0] - xi_t[0]
                pijy = xj_t[1] - xi_t[1]
                pn = jnp.sqrt(pijx * pijx + pijy * pijy)
                ovl = r_i + r_j - pn
                app = ovl > 0
                rsum = jnp.where(r_i + r_j > 0, r_i + r_j, 1.0)
                ci = jnp.where(app, 1.01 * r_i / rsum * ovl, 0.0)
                cj = jnp.where(app, 1.01 * r_j / rsum * ovl, 0.0)
                p_ix = xi_t[0] - ci * pijx
                p_iy = xi_t[1] - ci * pijy
                p_jx = xj_t[0] + cj * pijx
                p_jy = xj_t[1] + cj * pijy
                d12x = p_ix - p_jx
                d12y = p_iy - p_jy
                den = d12x * d12x + d12y * d12y
                den = jnp.where(den > 0, den, 1.0)
                rvx = xi_t[2] - xj_t[2]
                rvy = xi_t[3] - xj_t[3]
                dot = (rvx * d12x + rvy * d12y) / den
                msum = m_i + m_j
                vi_nx = xi_t[2] - 2.0 * m_j / msum * dot * d12x
                vi_ny = xi_t[3] - 2.0 * m_j / msum * dot * d12y
                vj_nx = xj_t[2] + 2.0 * m_i / msum * dot * d12x
                vj_ny = xj_t[3] + 2.0 * m_i / msum * dot * d12y

                dmg_on = (live[a] & is_pair[a] & (a != PUCK) &
                          (jj[a] != PUCK))
                dv2 = 0.01 * (rvx * rvx + rvy * rvy)
                if a != PUCK:
                    for o in range(4):
                        m = dmg_on & (jj[a] == o)
                        dmg_rows[a * 4 + o] = dmg_rows[a * 4 + o] + \
                            jnp.where(m, m_i * dv2, 0.0)
                        dmg_rows[o * 4 + a] = dmg_rows[o * 4 + a] + \
                            jnp.where(m, m_j * dv2, 0.0)

                # wall: sign-conditioned flip + goal
                ct = sc[a]
                flip_y = (((ct == 0) & (xi_t[3] > 0)) |
                          ((ct == 1) & (xi_t[3] < 0)))
                flip_x = (((ct == 2) & (xi_t[2] > 0)) |
                          ((ct == 3) & (xi_t[2] < 0)))
                w_vx = jnp.where(flip_x, -xi_t[2], xi_t[2])
                w_vy = jnp.where(flip_y, -xi_t[3], xi_t[3])

                goal = jnp.zeros((TILE,), bool)
                if a == PUCK:
                    goal = ((~is_pair[a]) & ((ct == 2) | (ct == 3)) &
                            (xi_t[1] < gh2) & (xi_t[1] > -gh2) & live[a])
                    any_goalA = any_goalA | (goal & ~scored & (ct == 2))
                    any_goalB = any_goalB | (goal & ~scored & (ct == 3))
                    new_scored = new_scored | goal

                xi_res = [jnp.where(is_pair[a], p_ix, xi_t[0]),
                          jnp.where(is_pair[a], p_iy, xi_t[1]),
                          jnp.where(is_pair[a], vi_nx, w_vx),
                          jnp.where(is_pair[a], vi_ny, w_vy)]
                xj_res = [p_jx, p_jy, vj_nx, vj_ny]
                rem = dtcol - dt_t
                xi_b = rk4(*xi_res, *u_i, taus[a], drags[a], rem)
                xj_b = rk4(*xj_res, u_jx, u_jy, tau_j, drag_j, rem)
                # base-column overlap corrections
                pbx = xj_b[0] - xi_b[0]
                pby = xj_b[1] - xi_b[1]
                pn2 = jnp.sqrt(pbx * pbx + pby * pby)
                ov2 = r_i + r_j - pn2
                ap2 = ov2 > 0
                ci2 = jnp.where(ap2, buf * r_i / rsum * ov2, 0.0)
                cj2 = jnp.where(ap2, buf * r_j / rsum * ov2, 0.0)
                xi_b_pair = [xi_b[0] - ci2 * pbx, xi_b[1] - ci2 * pby,
                             xi_b[2], xi_b[3]]
                xj_b = [xj_b[0] + cj2 * pbx, xj_b[1] + cj2 * pby,
                        xj_b[2], xj_b[3]]
                ovw = [xi_b[1] + r_i - halfy, -xi_b[1] + r_i - halfy,
                       xi_b[0] + r_i - halfx, -xi_b[0] + r_i - halfx]
                dirx = [0.0, 0.0, -1.0, 1.0]
                diry = [-1.0, 1.0, 0.0, 0.0]
                cwx = jnp.zeros((TILE,), jnp.float32)
                cwy = jnp.zeros((TILE,), jnp.float32)
                for w in range(4):
                    on = (ct == w) & (ovw[w] > 0)
                    cwx = cwx + jnp.where(on, buf * ovw[w] * dirx[w], 0.0)
                    cwy = cwy + jnp.where(on, buf * ovw[w] * diry[w], 0.0)
                xi_b_wall = [xi_b[0] + cwx, xi_b[1] + cwy, xi_b[2], xi_b[3]]
                xi_base = [jnp.where(is_pair[a], xi_b_pair[c],
                                     jnp.where(goal, 0.0, xi_b_wall[c]))
                           for c in range(4)]

                # --- claim entities -------------------------------------
                cl = live[a]
                ent_claim[a] = ent_claim[a] | cl

                def upd(prev, new, mask):
                    return new if prev is None else [
                        jnp.where(mask, new[c], prev[c])
                        for c in range(4)]

                if ent_val[a] is None:
                    ent_val[a] = [jnp.where(cl, v, 0.0) for v in xi_base]
                    ent_base[a] = jnp.where(cl, basea, 0)
                    ent_ctype[a] = jnp.where(cl, ct, 0)
                    ent_pair[a] = jnp.where(is_pair[a] & cl, 1.0, 0.0)
                    ent_partner[a] = jnp.where(cl, jj[a], a)
                else:
                    ent_val[a] = [jnp.where(cl, xi_base[c], ent_val[a][c])
                                  for c in range(4)]
                    ent_base[a] = jnp.where(cl, basea, ent_base[a])
                    ent_ctype[a] = jnp.where(cl, ct, ent_ctype[a])
                    ent_pair[a] = jnp.where(
                        cl, jnp.where(is_pair[a], 1.0, 0.0), ent_pair[a])
                    ent_partner[a] = jnp.where(cl, jj[a], ent_partner[a])
                for o in range(E):
                    if o == a:
                        continue
                    m = live[a] & is_pair[a] & (jj[a] == o)
                    ent_claim[o] = ent_claim[o] | m
                    if ent_val[o] is None:
                        ent_val[o] = [jnp.where(m, v, 0.0) for v in xj_b]
                        ent_base[o] = jnp.where(m, basea, 0)
                        ent_ctype[o] = jnp.where(m, 4, 0)
                        ent_pair[o] = jnp.where(m, 1.0, 0.0)
                        ent_partner[o] = jnp.where(m, a, o)
                    else:
                        ent_val[o] = [jnp.where(m, xj_b[c], ent_val[o][c])
                                      for c in range(4)]
                        ent_base[o] = jnp.where(m, basea, ent_base[o])
                        ent_ctype[o] = jnp.where(m, 4, ent_ctype[o])
                        ent_pair[o] = jnp.where(m, 1.0, ent_pair[o])
                        ent_partner[o] = jnp.where(m, a, ent_partner[o])

            # --- z = Finvpow[base](x_base - Spow[base] u) per entity -----
            z_rows = []
            for e in range(E):
                boh = jnp.where(kcol == ent_base[e][None, :], 1.0, 0.0)
                fi = jnp.dot(FI_ref[:], boh,
                             precision=lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)   # (80,T)
                sp = jnp.dot(SP_ref[:], boh,
                             precision=lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)   # (40,T)
                xb = [ent_val[e][c] -
                      (sp[e * 8 + c * 2 + 0] * u_ref[e * 2] +
                       sp[e * 8 + c * 2 + 1] * u_ref[e * 2 + 1])
                      for c in range(4)]
                for i in range(4):
                    acc = jnp.zeros((TILE,), jnp.float32)
                    for j in range(4):
                        acc = acc + fi[e * 16 + i * 4 + j] * xb[j]
                    z_rows.append(acc)
            zu = jnp.concatenate(
                [jnp.stack(z_rows), u_ref[:],
                 jnp.zeros((2, TILE), jnp.float32)], axis=0)       # (32,T)

            # --- per-component tail matmul + corrections + update --------
            tail = [jnp.dot(M_ref[c], zu,
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                    for c in range(NC)]                      # (G+1,TILE) x20
            corr = list(tail)
            for e in range(E):
                r_e = radii[e]
                ex = tail[e * 4 + 0]
                ey = tail[e * 4 + 1]
                poh = [jnp.where(ent_partner[e] == o, 1.0, 0.0)
                       for o in range(E)]
                pxp = sum(poh[o][None] * tail[o * 4 + 0] for o in range(E))
                pyp = sum(poh[o][None] * tail[o * 4 + 1] for o in range(E))
                r_p = sum(poh[o] * radii[o] for o in range(E))
                dx = pxp - ex
                dy = pyp - ey
                pn = jnp.sqrt(dx * dx + dy * dy)
                ov = (r_e + r_p)[None] - pn
                rs = jnp.where(r_e + r_p > 0, r_e + r_p, 1.0)[None]
                ce = jnp.where(ov > 0, buf * r_e / rs * ov, 0.0)
                pairx = ex - ce * dx
                pairy = ey - ce * dy
                ct = ent_ctype[e]
                ovw = [ey + r_e - halfy, -ey + r_e - halfy,
                       ex + r_e - halfx, -ex + r_e - halfx]
                dirx = [0.0, 0.0, -1.0, 1.0]
                diry = [-1.0, 1.0, 0.0, 0.0]
                wx = ex
                wy = ey
                for w in range(4):
                    on = (ct == w)[None] & (ovw[w] > 0)
                    wx = wx + jnp.where(on, buf * ovw[w] * dirx[w], 0.0)
                    wy = wy + jnp.where(on, buf * ovw[w] * diry[w], 0.0)
                isp = ent_pair[e][None] > 0.5
                corr[e * 4 + 0] = jnp.where(isp, pairx, wx)
                corr[e * 4 + 1] = jnp.where(isp, pairy, wy)

            # blend with f32 0/1 weights: same exact-selection trick as
            # the exact-mode scatter (nested broadcast-bool vselects
            # measured ~7x slower)
            for e in range(E):
                cb = ent_base[e][None, :]
                clm_f = jnp.where(ent_claim[e], 1.0, 0.0)[None, :]
                mgt = clm_f * jnp.where(kcol > cb, 1.0, 0.0)
                meq = clm_f * jnp.where(kcol == cb, 1.0, 0.0)
                wg = 1.0 - mgt - meq
                for c in range(e * 4, e * 4 + 4):
                    gc[c][:] = (mgt * corr[c] + meq * tail[c]
                                + wg * gc[c][:])

            base_new = jnp.stack(
                [jnp.where(ent_claim[e], ent_base[e], base[e])
                 for e in range(E)])
            dmg_new = jnp.stack(dmg_rows)
            one = jnp.float32(1.0)
            zero = jnp.float32(0.0)
            incA2 = incA + jnp.where(any_goalA, one, zero)
            incB2 = incB + jnp.where(any_goalB, one, zero)
            scored2 = jnp.where(new_scored, one, zero)
            # per-lane activity: iterations in which this lane had a live
            # event (exported for activity-sorted batching, see
            # step_pallas_batch(with_activity=True))
            lane_live = jnp.zeros((TILE,), bool)
            for a in range(E):
                lane_live = lane_live | (sv_s[a] > 0.5)
            actv2 = actv + jnp.where(lane_live, one, zero)
            st2, sj2, sc2, sv2 = detect_stacked(base_new, new_scored)
            return (st2, sj2, sc2, sv2, scored2, incA2, incB2, dmg_new,
                    base_new, actv2, it + 1)

        # ------------------------------------------------------------------
        # exact mode: one globally-earliest event per lane per iteration
        # (engine.py loop_body / GameSim.cpp:136-150 semantics)
        # ------------------------------------------------------------------
        def cond_exact(carry):
            (_, _, _, sv_s, _, _, _, _, _, it) = carry
            return jnp.any(sv_s > 0.5) & (it < iters)

        def body_exact(carry):
            (st_s, sj_s, sc_s, sv_s, scored_f, incA, incB, dmg, actv,
             it) = carry
            scored = scored_f > 0.5
            sv = [sv_s[a] > 0.5 for a in range(E)]
            te = [jnp.where(sv[a], st_s[a], _INF) for a in range(E)]

            # --- pop earliest; ties -> highest entity index (the
            # reference's descending sort pops the back; engine.py:284-285)
            take = []
            for a in range(E):
                beaten = jnp.zeros((TILE,), bool)
                for b in range(E):
                    if b == a:
                        continue
                    beaten = beaten | (sv[b] & ((te[b] < te[a]) |
                                                ((te[b] == te[a]) &
                                                 (b > a))))
                take.append(sv[a] & ~beaten)
            any_take = jnp.zeros((TILE,), bool)
            for a in range(E):
                any_take = any_take | take[a]

            ihot = [jnp.where(take[a], 1.0, 0.0) for a in range(E)]
            t_pop = sum(jnp.where(take[a], st_s[a], 0.0) for a in range(E))
            ct = sum(jnp.where(take[a], sc_s[a], 0) for a in range(E))
            is_pair = ct == 4
            j_raw = sum(jnp.where(take[a], sj_s[a], 0) for a in range(E))
            e_j = jnp.where(is_pair, j_raw, 0)          # safe index
            e_pop_v = sum(jnp.where(take[a], a, 0) for a in range(E))
            jhot = [jnp.where(e_j == o, 1.0, 0.0) for o in range(E)]

            # scored latch: pop + skip consumes a counter iteration
            # (GameSim.cpp:229-231 / engine.py:291-295)
            puck_inv = take[PUCK] | (is_pair & (e_j == PUCK))
            skip = puck_inv & scored
            live = any_take & ~skip

            # --- gather the two involved entities at column km1 ----------
            km1 = jnp.clip((t_pop / dtcol).astype(jnp.int32), 0, G - 1)
            base_new = km1 + 1
            cols = gather_cols(km1)
            xi = [sum(ihot[e] * cols[e * 4 + c] for e in range(E))
                  for c in range(4)]
            xj = [sum(jhot[o] * cols[o * 4 + c] for o in range(E))
                  for c in range(4)]
            r_i = sum(ihot[e] * radii[e] for e in range(E))
            m_i = sum(ihot[e] * masses[e] for e in range(E))
            tau_i = sum(ihot[e] * taus[e] for e in range(E))
            drag_i = sum(ihot[e] * drags[e] for e in range(E))
            u_i = (sum(ihot[e] * u_ref[e * 2] for e in range(E)),
                   sum(ihot[e] * u_ref[e * 2 + 1] for e in range(E)))
            r_j = sum(jhot[o] * radii[o] for o in range(E))
            m_j = sum(jhot[o] * masses[o] for o in range(E))
            tau_j = sum(jhot[o] * taus[o] for o in range(E))
            drag_j = sum(jhot[o] * drags[o] for o in range(E))
            u_j = (sum(jhot[o] * u_ref[o * 2] for o in range(E)),
                   sum(jhot[o] * u_ref[o * 2 + 1] for o in range(E)))
            # tau_i is 0 only where no slot popped (masked out downstream)
            tau_i = jnp.where(tau_i > 0, tau_i, 1.0)
            tau_j = jnp.where(tau_j > 0, tau_j, 1.0)

            # role-mixed one-substep affine scalars + control terms for the
            # feedback loop (see _substep_scalars)
            fa_i = sum(ihot[e] * sub_a[e] for e in range(E))
            fb_i = sum(ihot[e] * sub_b[e] for e in range(E))
            fa_j = sum(jhot[o] * sub_a[o] for o in range(E))
            fb_j = sum(jhot[o] * sub_b[o] for o in range(E))
            su_i = (sum(ihot[e] * sub_c[e] for e in range(E)) * u_i[0],
                    sum(ihot[e] * sub_c[e] for e in range(E)) * u_i[1],
                    sum(ihot[e] * sub_d[e] for e in range(E)) * u_i[0],
                    sum(ihot[e] * sub_d[e] for e in range(E)) * u_i[1])
            su_j = (sum(jhot[o] * sub_c[o] for o in range(E)) * u_j[0],
                    sum(jhot[o] * sub_c[o] for o in range(E)) * u_j[1],
                    sum(jhot[o] * sub_d[o] for o in range(E)) * u_j[0],
                    sum(jhot[o] * sub_d[o] for o in range(E)) * u_j[1])

            if reprop_noise:
                # role-premix the per-substep noise contributions so the
                # feedback loop reads one (1,TILE) row per component per
                # column (puck rows of the plane are zero, so a puck role
                # mixes to zero noise -- GameSim.cpp:90-96 draws none)
                for c in range(4):
                    nmix[c][:] = sum(ihot[e][None, :] *
                                     rnoise_ref[e * 4 + c]
                                     for e in range(E))
                    nmix[4 + c][:] = sum(jhot[o][None, :] *
                                         rnoise_ref[o * 4 + c]
                                         for o in range(E))

            dt_t = t_pop - km1.astype(jnp.float32) * dtcol
            xi_t = rk4(*xi, *u_i, tau_i, drag_i, dt_t)
            xj_t = rk4(*xj, *u_j, tau_j, drag_j, dt_t)
            if reprop_noise:
                # the reference draws fresh noise in BOTH partial-substep
                # propagations of the event (sim-to-t_col and the
                # remainder, GameSim.cpp:242-254 via RK4_player; combined
                # scale w*sqrt(dt_t^2+rem^2) ~ one substep) -- critically
                # BEFORE the impulse, so collision velocities (and the
                # |dv|^2 damage they produce) carry that substep's
                # diffusion.  Inject one substep draw (the otherwise-
                # unused rnoise row at base_new) at t_col; it propagates
                # through the resolve to the base column.  Without it the
                # exact kernel's grinding damage ran ~10% low
                # (corner+noise campaign r5, damage z=+10).
                boh = jnp.where(kcol == base_new[None, :], 1.0, 0.0)
                xi_t = [xi_t[c] + jnp.sum(nmix[c][:] * boh, axis=0)
                        for c in range(4)]
                xj_t = [xj_t[c] + jnp.sum(nmix[4 + c][:] * boh, axis=0)
                        for c in range(4)]

            # --- INTER_AGENT: de-penetrate (1.01) + elastic impulse ------
            pijx = xj_t[0] - xi_t[0]
            pijy = xj_t[1] - xi_t[1]
            pn = jnp.sqrt(pijx * pijx + pijy * pijy)
            ovl = r_i + r_j - pn
            app = ovl > 0
            rsum = jnp.where(r_i + r_j > 0, r_i + r_j, 1.0)
            ci = jnp.where(app, 1.01 * r_i / rsum * ovl, 0.0)
            cj = jnp.where(app, 1.01 * r_j / rsum * ovl, 0.0)
            p_ix = xi_t[0] - ci * pijx
            p_iy = xi_t[1] - ci * pijy
            p_jx = xj_t[0] + cj * pijx
            p_jy = xj_t[1] + cj * pijy
            d12x = p_ix - p_jx
            d12y = p_iy - p_jy
            den = d12x * d12x + d12y * d12y
            den = jnp.where(den > 0, den, 1.0)
            rvx = xi_t[2] - xj_t[2]
            rvy = xi_t[3] - xj_t[3]
            dot = (rvx * d12x + rvy * d12y) / den
            msum = jnp.where(m_i + m_j > 0, m_i + m_j, 1.0)
            vi_nx = xi_t[2] - 2.0 * m_j / msum * dot * d12x
            vi_ny = xi_t[3] - 2.0 * m_j / msum * dot * d12y
            vj_nx = xj_t[2] + 2.0 * m_i / msum * dot * d12x
            vj_ny = xj_t[3] + 2.0 * m_i / msum * dot * d12y

            # --- damage (GameSim.cpp:276-283) ----------------------------
            dmg_rows = [dmg[r] for r in range(16)]
            dv2 = 0.01 * (rvx * rvx + rvy * rvy)
            for a in range(4):
                for o in range(4):
                    if a == o:
                        continue
                    m = live & is_pair & take[a] & (e_j == o)
                    dmg_rows[a * 4 + o] = dmg_rows[a * 4 + o] + \
                        jnp.where(m, masses[a] * dv2, 0.0)
                    dmg_rows[o * 4 + a] = dmg_rows[o * 4 + a] + \
                        jnp.where(m, masses[o] * dv2, 0.0)

            # --- WALL: sign-conditioned flip + goal ----------------------
            flip_y = (((ct == 0) & (xi_t[3] > 0)) |
                      ((ct == 1) & (xi_t[3] < 0)))
            flip_x = (((ct == 2) & (xi_t[2] > 0)) |
                      ((ct == 3) & (xi_t[2] < 0)))
            w_vx = jnp.where(flip_x, -xi_t[2], xi_t[2])
            w_vy = jnp.where(flip_y, -xi_t[3], xi_t[3])
            goal = ((~is_pair) & take[PUCK] & ((ct == 2) | (ct == 3)) &
                    (xi_t[1] < gh2) & (xi_t[1] > -gh2))
            one = jnp.float32(1.0)
            zero = jnp.float32(0.0)
            ginc = goal & live & ~scored
            incA2 = incA + jnp.where(ginc & (ct == 2), one, zero)
            incB2 = incB + jnp.where(ginc & (ct == 3), one, zero)
            new_scored = scored | (goal & live)

            # --- value at grid column base_new ---------------------------
            xi_res = [jnp.where(is_pair, p_ix, xi_t[0]),
                      jnp.where(is_pair, p_iy, xi_t[1]),
                      jnp.where(is_pair, vi_nx, w_vx),
                      jnp.where(is_pair, vi_ny, w_vy)]
            xj_res = [p_jx, p_jy, vj_nx, vj_ny]
            rem = dtcol - dt_t
            xi_b = rk4(*xi_res, *u_i, tau_i, drag_i, rem)
            xj_b = rk4(*xj_res, *u_j, tau_j, drag_j, rem)
            pbx = xj_b[0] - xi_b[0]
            pby = xj_b[1] - xi_b[1]
            pn2 = jnp.sqrt(pbx * pbx + pby * pby)
            ov2 = r_i + r_j - pn2
            ap2 = ov2 > 0
            ci2 = jnp.where(ap2, buf * r_i / rsum * ov2, 0.0)
            cj2 = jnp.where(ap2, buf * r_j / rsum * ov2, 0.0)
            xi_b_pair = [xi_b[0] - ci2 * pbx, xi_b[1] - ci2 * pby,
                         xi_b[2], xi_b[3]]
            xj_b = [xj_b[0] + cj2 * pbx, xj_b[1] + cj2 * pby,
                    xj_b[2], xj_b[3]]
            ovw = [xi_b[1] + r_i - halfy, -xi_b[1] + r_i - halfy,
                   xi_b[0] + r_i - halfx, -xi_b[0] + r_i - halfx]
            dirx = [0.0, 0.0, -1.0, 1.0]
            diry = [-1.0, 1.0, 0.0, 0.0]
            cwx = jnp.zeros((TILE,), jnp.float32)
            cwy = jnp.zeros((TILE,), jnp.float32)
            for w in range(4):
                on = (ct == w) & (ovw[w] > 0)
                cwx = cwx + jnp.where(on, buf * ovw[w] * dirx[w], 0.0)
                cwy = cwy + jnp.where(on, buf * ovw[w] * diry[w], 0.0)
            xi_b_wall = [xi_b[0] + cwx, xi_b[1] + cwy, xi_b[2], xi_b[3]]
            xi_base = tuple(
                jnp.where(is_pair, xi_b_pair[c],
                          jnp.where(goal, 0.0, xi_b_wall[c]))
                for c in range(4))
            xj_base = tuple(xj_b)

            # --- sequential feedback re-propagation over the remaining
            # columns with per-column overlap fix-ups (engine.py:392-416,
            # GameSim.cpp:292-297,336-340).  Unlike the throughput mode's
            # feedback-FREE affine tail, each column propagates from the
            # previous column's CORRECTED value.
            def col_body(k, rcarry):
                ri, rj = rcarry
                # fixed-dtcol RK4 on the LTI dynamics == the sparse affine
                # map (8 madds/role; identical to rk4() up to f32 op order)
                pi = (ri[0] + fa_i * ri[2] + su_i[0],
                      ri[1] + fa_i * ri[3] + su_i[1],
                      fb_i * ri[2] + su_i[2],
                      fb_i * ri[3] + su_i[3])
                pj = (rj[0] + fa_j * rj[2] + su_j[0],
                      rj[1] + fa_j * rj[3] + su_j[1],
                      fb_j * rj[2] + su_j[2],
                      fb_j * rj[3] + su_j[3])
                if reprop_noise:
                    # fresh per-substep noise on re-propagated columns
                    # (the reference's in-loop RK4 draws; engine.py
                    # ``sn``).  Rows are PER-COLUMN: successive events of
                    # one control step re-read the same rows where the
                    # reference redraws -- rotating the reads by the
                    # iteration index was tried (r5) and measured WORSE
                    # at campaign power (corner+noise 10.9% -> 13.5%),
                    # so the per-column scheme stays.
                    pi = tuple(pi[c] + nmix[c][pl.ds(k, 1), :][0]
                               for c in range(4))
                    pj = tuple(pj[c] + nmix[4 + c][pl.ds(k, 1), :][0]
                               for c in range(4))
                # pair overlap correction (buf) between the two
                dx = pj[0] - pi[0]
                dy = pj[1] - pi[1]
                d = jnp.sqrt(dx * dx + dy * dy)
                ov = r_i + r_j - d
                go = ov > 0
                cie = jnp.where(go, buf * r_i / rsum * ov, 0.0)
                cje = jnp.where(go, buf * r_j / rsum * ov, 0.0)
                pi_pair = [pi[0] - cie * dx, pi[1] - cie * dy, pi[2], pi[3]]
                pj_pair = [pj[0] + cje * dx, pj[1] + cje * dy, pj[2], pj[3]]
                # wall correction on i against the SAME wall
                ow = [pi[1] + r_i - halfy, -pi[1] + r_i - halfy,
                      pi[0] + r_i - halfx, -pi[0] + r_i - halfx]
                wx = pi[0]
                wy = pi[1]
                for w in range(4):
                    on = (ct == w) & (ow[w] > 0)
                    wx = wx + jnp.where(on, buf * ow[w] * dirx[w], 0.0)
                    wy = wy + jnp.where(on, buf * ow[w] * diry[w], 0.0)
                pi_wall = [wx, wy, pi[2], pi[3]]
                ci_corr = [jnp.where(is_pair, pi_pair[c], pi_wall[c])
                           for c in range(4)]
                gate = live & (k > base_new)
                ri2 = tuple(jnp.where(gate, ci_corr[c], ri[c])
                            for c in range(4))
                rj2 = tuple(jnp.where(gate & is_pair, pj_pair[c], rj[c])
                            for c in range(4))
                # dynamic single-row stores: a full-plane masked select per
                # slab here cost ~8 x (G+1) rows per column -- the dominant
                # cost of the feedback loop (measured r4)
                for c in range(4):
                    role[c][pl.ds(k, 1), :] = ri2[c][None, :]
                    role[4 + c][pl.ds(k, 1), :] = rj2[c][None, :]
                return (ri2, rj2)

            # manual unroll: fori_loop trip overhead is significant at
            # these tiny (TILE,) bodies (lax's unroll= breaks Mosaic
            # lowering, so unroll by hand)
            _U = 5 if G % 5 == 0 else 1

            def col_chunk(kk, rcarry):
                k0 = 1 + kk * _U
                for d in range(_U):
                    rcarry = col_body(k0 + d, rcarry)
                return rcarry

            lax.fori_loop(0, G // _U, col_chunk, (xi_base, xj_base))

            # --- scatter role slabs into the grid planes -----------------
            # Blend with f32 0/1 weights instead of nested rank-2-bool
            # vselects (the select form measured 7x slower -- broadcast
            # bool masks lower badly).  The weights are exactly 0 or 1,
            # so each element is 1*x + 0*y + 0*z = x: exact selection
            # (modulo canonicalizing -0.0 to +0.0, which nothing
            # downstream distinguishes).
            rowm = kcol >= base_new[None, :]
            role_v = [role[c][:] for c in range(8)]
            rowm_f = jnp.where(rowm, 1.0, 0.0)
            for e in range(E):
                mi1 = jnp.where(take[e] & live, 1.0, 0.0)[None, :]
                mj1 = jnp.where(is_pair & (e_j == e) & live,
                                1.0, 0.0)[None, :]
                mi_f = mi1 * rowm_f
                mj_f = mj1 * rowm_f
                wg = 1.0 - mi_f - mj_f
                for c in range(4):
                    gc[e * 4 + c][:] = (
                        mi_f * role_v[c]
                        + mj_f * role_v[4 + c]
                        + wg * gc[e * 4 + c][:])

            # --- slot bookkeeping (engine.py:419-439): drop slots touching
            # affected entities WITHOUT recompute (reference quirk),
            # re-detect only the affected entities from base_new.
            # Incremental: whole 8-column detect blocks below every live
            # lane's base are skipped (see detect(ms=...))
            ms = jnp.min(jnp.where(live, base_new, G + 1))
            st_r, sj_r, sc_r, sv_r = detect([base_new] * E, ms=ms)
            st2l, sj2l, sc2l, sv2l = [], [], [], []
            for e in range(E):
                touched_e = (e_pop_v == e) | (is_pair & (e_j == e))
                jt = (((sj_s[e] == e_pop_v) |
                       (is_pair & (sj_s[e] == e_j))) & (sj_s[e] >= 0))
                valid_kept = sv[e] & ~touched_e & ~jt
                aff_e = touched_e & live
                st_n = jnp.where(aff_e, st_r[e], st_s[e])
                sj_n = jnp.where(aff_e, sj_r[e], sj_s[e])
                sc_n = jnp.where(aff_e, sc_r[e], sc_s[e])
                sv_n = jnp.where(aff_e, jnp.where(sv_r[e], 1.0, 0.0),
                                 jnp.where(valid_kept, 1.0, 0.0))
                # skip case: only invalidate the popped slot
                sv_skip = jnp.where(take[e], 0.0, sv_s[e])
                upd = any_take & ~skip
                st2l.append(jnp.where(upd, st_n, st_s[e]))
                sj2l.append(jnp.where(upd, sj_n, sj_s[e]))
                sc2l.append(jnp.where(upd, sc_n, sc_s[e]))
                sv2l.append(jnp.where(upd, sv_n,
                                      jnp.where(skip, sv_skip, sv_s[e])))

            actv2 = actv + jnp.where(any_take, one, zero)
            scored2 = jnp.where(new_scored, one, zero)
            return (jnp.stack(st2l), jnp.stack(sj2l), jnp.stack(sc2l),
                    jnp.stack(sv2l), scored2, incA2, incB2,
                    jnp.stack(dmg_rows), actv2, it + 1)

        if is_exact:
            # row 0 of the role slabs is never written by the feedback
            # loop (columns 1..G) but rides through the scatter's
            # 0-weight blend -- zero it once so uninitialized VMEM
            # (possibly NaN) cannot poison 0*x products
            for c in range(8):
                role[c][0:1, :] = jnp.zeros((1, TILE), jnp.float32)
            if mode == "exact_resume":
                # slots + carry imported verbatim: stale-slot semantics
                # survive compaction (rows: 0-4 st, 5-9 sj, 10-14 sc,
                # 15-19 sv, 20 scored, 21 incA, 22 incB, 23-38 dmg,
                # 39 actv)
                init = (carryin_ref[0:5],
                        carryin_ref[5:10].astype(jnp.int32),
                        carryin_ref[10:15].astype(jnp.int32),
                        carryin_ref[15:20],
                        carryin_ref[20], carryin_ref[21],
                        carryin_ref[22],
                        carryin_ref[23:39],
                        carryin_ref[39],
                        jnp.asarray(0, jnp.int32))
            else:
                base0 = jnp.ones((E, TILE), jnp.int32)
                t0l, j0l, c0l, v0l = detect([base0[e] for e in range(E)])
                init = (jnp.stack(t0l), jnp.stack(j0l), jnp.stack(c0l),
                        jnp.stack([jnp.where(v0l[a], 1.0, 0.0)
                                   for a in range(E)]),
                        jnp.zeros((TILE,), jnp.float32),
                        jnp.zeros((TILE,), jnp.float32),
                        jnp.zeros((TILE,), jnp.float32),
                        jnp.zeros((16, TILE), jnp.float32),
                        jnp.zeros((TILE,), jnp.float32),
                        jnp.asarray(0, jnp.int32))
            out = jax.lax.while_loop(cond_exact, body_exact, init)
            (st_f, sj_f, sc_f, sv_f, scored_f, incA, incB, dmg, actv,
             it_ran) = out
            if is_export:
                for c in range(NC):
                    gridout_ref[c] = gc[c][:]
                carryout_ref[:] = jnp.concatenate(
                    [st_f, sj_f.astype(jnp.float32),
                     sc_f.astype(jnp.float32), sv_f,
                     scored_f[None], incA[None], incB[None], dmg,
                     actv[None],
                     jnp.zeros((8, TILE), jnp.float32)], axis=0)
        else:
            if mode == "resume":
                base0 = jnp.stack([carryin_ref[e].astype(jnp.int32)
                                   for e in range(E)])
                scored0 = carryin_ref[5]
                incA0 = carryin_ref[6]
                incB0 = carryin_ref[7]
                dmg0 = jnp.stack([carryin_ref[8 + r] for r in range(16)])
                actv0 = carryin_ref[24]
            else:
                scored0 = jnp.zeros((TILE,), jnp.float32)
                incA0 = incB0 = jnp.zeros((TILE,), jnp.float32)
                dmg0 = jnp.zeros((16, TILE), jnp.float32)
                base0 = jnp.ones((E, TILE), jnp.int32)
                actv0 = jnp.zeros((TILE,), jnp.float32)
            st0, sj0, sc0, sv0 = detect_stacked(base0, scored0 > 0.5)
            init = (st0, sj0, sc0, sv0, scored0, incA0, incB0, dmg0, base0,
                    actv0, jnp.asarray(0, jnp.int32))
            # while-loop: a tile with no pending events exits immediately
            # instead of paying all `iters` rounds
            out = jax.lax.while_loop(loop_cond, body, init)
            (_, _, _, sv_f, scored_f, incA, incB, dmg, base_f, actv,
             it_ran) = out

        # frozen lanes keep their inputs; live lanes advance
        xfin = jnp.stack([gc[c][G, :] for c in range(NC)])
        xout_ref[:] = jnp.where(undec[None, :], xfin, x_ref[:])
        u01 = jnp.where(undec, 1.0, 0.0)
        # pending: lanes whose event loop hit the cap with work left
        pend = jnp.zeros((TILE,), bool)
        for a in range(E):
            pend = pend | (sv_f[a] > 0.5)
        pend_f = jnp.where(pend & undec, 1.0, 0.0)
        meta_out = jnp.concatenate(
            [(meta_ref[0] + u01 * incA)[None],
             (meta_ref[1] + u01 * incB)[None],
             (meta_ref[2] + u01 * jnp.float32(dt))[None],
             actv[None],                        # row 3: event-iteration count
             jnp.full((1, TILE), it_ran.astype(jnp.float32)),  # row 4: trips
             pend_f[None],                      # row 5: pending at cap
             jnp.zeros((2, TILE), jnp.float32)], axis=0)
        dmg_out = dmgin_ref[:] + u01[None, :] * dmg
        aux_ref[:] = jnp.concatenate([meta_out, dmg_out], axis=0)

        if mode == "export":
            for c in range(NC):
                gridout_ref[c] = gc[c][:]
            carryout_ref[:] = jnp.concatenate(
                [base_f.astype(jnp.float32), scored_f[None], incA[None],
                 incB[None], dmg, actv[None],
                 jnp.zeros((7, TILE), jnp.float32)], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("params", "with_activity"))
def step_pallas_batch(states: GameState, controls: jax.Array,
                      params: SimParams, with_activity: bool = False):
    """Batched control step via the Pallas kernel.

    states: batch-leading GameState (B, ...); controls (B, 4, 2).
    B is padded to a multiple of 128 internally.

    With ``with_activity`` returns ``(new_states, activity)`` where
    ``activity`` (B,) f32 counts the event-loop iterations in which this
    game had a live collision -- the per-game iteration demand used by
    :func:`rollout_pallas_sorted` to pack event-heavy games into the same
    lane tiles.

    Stochastic mode: the populate-pass noise contribution is generated
    OUTSIDE the kernel (jax.random through the exact stage-noise
    covariance, physics/sweep.populate_noise) and passed in as an input
    plane -- same statistical model as the sweep engine (no noise on
    post-collision re-propagation).
    """
    B = states.score.shape[0]
    planes, new_keys = _to_planes(states, params)
    u = _u_plane(controls, B)
    if params.engine == "pallas_exact":
        # event-ORDER-exact mode; stochastic runs add the populate noise
        # plane plus the per-substep re-propagation noise plane consumed
        # by the feedback loop (reference noise structure, see
        # sweep.repropagation_noise)
        npl = _noise_plane(states, params)
        rpl = _rnoise_plane(states, params)
        if params.two_phase:
            x, meta, dmg = _twophase_planes_exact(planes, u, params,
                                                  npl, rpl)
        else:
            x, meta, dmg = _kernel_call(planes, u, params, npl,
                                        mode="exact", rnoise_plane=rpl)
    elif params.two_phase:
        x, meta, dmg = _twophase_planes(planes, u, params,
                                        _noise_plane(states, params))
    else:
        x, meta, dmg = _kernel_call(planes, u, params,
                                    _noise_plane(states, params))
    out = _from_planes((x, meta, dmg), states, new_keys, params)
    if with_activity:
        return out, meta[3, :B]
    return out


def _twophase_planes(planes, u, params: SimParams, noise_plane=None):
    """Compact-and-resume event loop over lane-major planes.

    ~90% of games finish their collision chains within ~2 loop
    iterations, but the while-loop exits per 128-lane tile, so the ~7-9%
    of games with long within-step chains (transient, near-zero step-to-
    step persistence -- sorting by history cannot help) make nearly every
    tile pay the full ``sweep_iters`` trip count.  Phase 1 caps everyone
    at ``phase1_iters`` and exports the event-loop state (grid planes +
    carry); the still-pending games are then gathered into a
    ``B/compact_frac``-lane batch and finished by a resume-mode kernel at
    the remaining depth, results scattered back.  Identical semantics to
    the one-phase kernel whenever at most ``B/compact_frac`` games chain
    past phase 1 (always, in measured MC workloads -- see
    tests/test_pallas.py::test_twophase_*).

    Overflow guard: when MORE than ``B/compact_frac`` games are still
    pending after phase 1 (adversarial pile-up-heavy batches), the
    compacted resume would silently truncate the unselected games at
    ``phase1_iters`` events instead of ``sweep_iters``.  The pending
    count (meta row 5) is checked and a rarely-taken ``lax.cond`` branch
    re-runs the resume over the FULL batch in that case, so two-phase is
    exactly one-phase-equivalent at every pending count (the XLA
    conditional executes only the taken branch, so the common path pays
    nothing)."""
    x_in, meta_in, dmg_in = planes
    Bp = x_in.shape[1]
    p1 = params.phase1_iters
    (x1, meta1, dmg1), grid, carry = _kernel_call(
        planes, u, params, noise_plane, mode="export", cap=p1)
    K = min(Bp, max(TILE,
                    (Bp // params.compact_frac + TILE - 1) // TILE * TILE))
    pending = meta1[5]
    idx = jnp.argsort(-pending)[:K]
    gat = lambda a: jnp.take(a, idx, axis=-1)
    x2, meta2, dmg2 = _kernel_call(
        (gat(x_in), gat(meta_in), gat(dmg_in)), gat(u), params,
        mode="resume", cap=params.sweep_iters - p1,
        grid_in=gat(grid), carry_in=gat(carry))
    merged = (x1.at[:, idx].set(x2), meta1.at[:, idx].set(meta2),
              dmg1.at[:, idx].set(dmg2))
    if K >= Bp:
        return merged       # budget covers the whole batch; cannot overflow

    def _full_resume(_):
        # per-lane elementwise resume: lanes in idx recompute the exact
        # values the compacted resume produced, overflow lanes get their
        # genuine full-depth results
        return _kernel_call(planes, u, params, mode="resume",
                            cap=params.sweep_iters - p1,
                            grid_in=grid, carry_in=carry)

    n_pend = jnp.sum(pending > 0.5)
    return lax.cond(n_pend > K, _full_resume, lambda _: merged, None)


def _twophase_planes_exact(planes, u, params: SimParams,
                           noise_plane=None, rnoise_plane=None):
    """Two-phase compact-and-resume for the event-ORDER-exact loop.

    Same shape as :func:`_twophase_planes` -- phase 1 caps every lane at
    ``phase1_iters`` EVENTS, pending games (any valid slot left) are
    compacted into B/compact_frac lanes and finished at the remaining
    event budget, results scattered back, with the full-batch-resume
    overflow guard.  The event-loop state that round-trips through the
    export/import carry INCLUDES the per-entity slot lists, so the
    reference's stale-slot semantics survive compaction and the result
    is exactly one-phase-equal at every pending count
    (tests/test_pallas_exact.py::test_exact_twophase_bitwise)."""
    x_in, meta_in, dmg_in = planes
    Bp = x_in.shape[1]
    p1 = params.phase1_iters
    ev_total = params.collision_counter_lim - 1
    (x1, meta1, dmg1), grid, carry = _kernel_call(
        planes, u, params, noise_plane, mode="exact_export",
        cap=min(p1, ev_total), rnoise_plane=rnoise_plane)
    if p1 >= ev_total:
        return (x1, meta1, dmg1)     # phase 1 already covers the budget
    K = min(Bp, max(TILE,
                    (Bp // params.compact_frac + TILE - 1) // TILE * TILE))
    pending = meta1[5]
    idx = jnp.argsort(-pending)[:K]
    gat = lambda a: jnp.take(a, idx, axis=-1)
    rn_g = None if rnoise_plane is None else gat(rnoise_plane)
    x2, meta2, dmg2 = _kernel_call(
        (gat(x_in), gat(meta_in), gat(dmg_in)), gat(u), params,
        mode="exact_resume", cap=ev_total - p1,
        grid_in=gat(grid), carry_in=gat(carry), rnoise_plane=rn_g)
    merged = (x1.at[:, idx].set(x2), meta1.at[:, idx].set(meta2),
              dmg1.at[:, idx].set(dmg2))
    if K >= Bp:
        return merged

    def _full_resume(_):
        return _kernel_call(planes, u, params, mode="exact_resume",
                            cap=ev_total - p1,
                            grid_in=grid, carry_in=carry,
                            rnoise_plane=rnoise_plane)

    n_pend = jnp.sum(pending > 0.5)
    return lax.cond(n_pend > K, _full_resume, lambda _: merged, None)


def rollout_pallas_sorted(states: GameState, u_seq: jax.Array,
                          params: SimParams,
                          resort_every: int = 1) -> GameState:
    """Multi-step rollout with activity-sorted batching.

    The kernel's event while-loop exits per 128-game lane tile, so one
    grinding game keeps its whole tile iterating; with stragglers
    scattered uniformly every tile pays near the worst-case trip count.
    Here the game batch is kept ordered by a decayed per-game activity
    score (event-loop iteration demand, exported by the kernel), so
    event-heavy games share tiles and quiet tiles exit after one detect.
    Re-sorting is a (B,)-argsort plus a gather of the tiny state pytree.

    Semantics are exactly step_pallas_batch's -- sorting only permutes
    lane assignment, and results are returned in the original game order.

    u_seq: (n_steps, B, 4, 2) per-step controls (open-loop schedules).
    """
    B = states.score.shape[0]
    idx0 = jnp.arange(B)

    def take(tree, ord_):
        return jax.tree.map(lambda a: jnp.take(a, ord_, axis=0), tree)

    def body(carry, uk):
        s, idx, act = carry
        s2, a_now = step_pallas_batch(s, jnp.take(uk, idx, axis=0),
                                      params, with_activity=True)
        act = 0.5 * act + a_now            # decayed demand estimate
        ord_ = jnp.argsort(-act)
        return (take(s2, ord_), jnp.take(idx, ord_),
                jnp.take(act, ord_)), None

    def body_nosort(carry, uk):
        s, idx, act = carry
        s2, a_now = step_pallas_batch(s, jnp.take(uk, idx, axis=0),
                                      params, with_activity=True)
        return (s2, idx, 0.5 * act + a_now), None

    if resort_every == 1:
        (final, idx, _), _ = lax.scan(
            body, (states, idx0, jnp.zeros((B,), jnp.float32)), u_seq)
    else:
        n = u_seq.shape[0]
        chunks = u_seq[: (n // resort_every) * resort_every].reshape(
            (-1, resort_every) + u_seq.shape[1:])

        def outer(carry, uc):
            carry, _ = lax.scan(body_nosort, carry, uc[:-1])
            carry, _ = body(carry, uc[-1])
            return carry, None

        carry = (states, idx0, jnp.zeros((B,), jnp.float32))
        carry, _ = lax.scan(outer, carry, chunks)
        carry, _ = lax.scan(body_nosort, carry,
                            u_seq[(n // resort_every) * resort_every:])
        final, idx, _ = carry
    return take(final, jnp.argsort(idx))


def _pad(a, B):
    Bp = ((B + TILE - 1) // TILE) * TILE
    if Bp == B:
        return a
    return jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, Bp - B),))


def _to_planes(states: GameState, params: SimParams):
    """GameState (B-leading) -> lane-major planes (x, meta, dmg)."""
    B = states.score.shape[0]
    x = _pad(states.x.astype(jnp.float32).reshape(B, 20).T, B)
    meta = jnp.concatenate(
        [states.score.astype(jnp.float32).T,
         states.t.astype(jnp.float32)[None],
         jnp.zeros((5, B), jnp.float32)], axis=0)
    meta = _pad(meta, B)
    dmg = _pad(states.damage.astype(jnp.float32).reshape(B, 16).T, B)
    new_keys = states.key
    if params.stochastic:
        keys = jax.vmap(jax.random.split)(states.key)
        new_keys = keys[:, 0]
    return (x, meta, dmg), new_keys


def _u_plane(controls, B):
    u = jnp.concatenate(
        [jnp.asarray(controls, jnp.float32).reshape(B, 8),
         jnp.zeros((B, 2), jnp.float32)], axis=1).T
    return _pad(u, B)


def _noise_plane(states: GameState, params: SimParams):
    if not params.stochastic:
        return None
    from .sweep import populate_noise
    B = states.score.shape[0]
    G = params.grid_points
    keys = jax.vmap(jax.random.split)(states.key)
    f32p = params.replace(dtype="float32")
    contrib = jax.vmap(lambda k: populate_noise(k, f32p))(keys[:, 1])
    plane = jnp.transpose(contrib, (2, 3, 1, 0)).reshape(16, G, B)
    plane = jnp.concatenate(
        [jnp.zeros((16, 1, B), jnp.float32), plane], axis=1)
    plane = jnp.concatenate(
        [plane, jnp.zeros((4, G + 1, B), jnp.float32)], axis=0)
    Bp = ((B + TILE - 1) // TILE) * TILE
    if Bp != B:
        plane = jnp.pad(plane, ((0, 0), (0, 0), (0, Bp - B)))
    return plane


def _rnoise_plane(states: GameState, params: SimParams):
    """Per-substep re-propagation noise contributions as a kernel input
    plane (NC, G+1, Bp): rows e*4+c for players (puck rows zero); ALL
    G+1 columns hold iid substep draws (the kernel's iteration-rotated
    reads must never land on a draw-free row).  Stream is independent
    of the populate plane (fold_in on the same per-step key)."""
    if not params.stochastic:
        return None
    from .sweep import repropagation_noise
    B = states.score.shape[0]
    G = params.grid_points
    keys = jax.vmap(jax.random.split)(states.key)
    k2 = jax.vmap(lambda k: jax.random.fold_in(k, 7))(keys[:, 1])
    f32p = params.replace(dtype="float32")
    contrib = jax.vmap(
        lambda k: repropagation_noise(k, f32p, n=G + 1))(k2)
    plane = jnp.transpose(contrib, (2, 3, 1, 0)).reshape(16, G + 1, B)
    plane = jnp.concatenate(
        [plane, jnp.zeros((4, G + 1, B), jnp.float32)], axis=0)
    Bp = ((B + TILE - 1) // TILE) * TILE
    if Bp != B:
        plane = jnp.pad(plane, ((0, 0), (0, 0), (0, Bp - B)))
    return plane


def _from_planes(planes, states: GameState, new_keys,
                 params: SimParams) -> GameState:
    x, meta, dmg = planes
    B = states.score.shape[0]
    return GameState(
        x=x[:, :B].T.reshape(B, 5, 4).astype(params.jdtype),
        score=meta[0:2, :B].T.astype(jnp.int32),
        damage=dmg[:, :B].T.reshape(B, 4, 4).astype(params.jdtype),
        t=meta[2, :B].astype(params.jdtype),
        key=new_keys,
    )


def _kernel_call(planes, u, params: SimParams, noise_plane=None,
                 mode: str = "full", cap: int = None, grid_in=None,
                 carry_in=None, rnoise_plane=None):
    """One kernel invocation over lane-major planes.

    Returns (xout, meta, dmg) and, in 'export' mode, additionally the
    event-loop state (grid planes (NC, G+1, Bp), carry (32, Bp)) for
    compaction + 'resume' (see step_pallas_batch_twophase)."""
    x, meta, dmg = planes
    Bp = x.shape[1]
    G = params.grid_points
    M, FI, SP = _tables(_table_key(params))
    M, FI, SP = jnp.asarray(M), jnp.asarray(FI), jnp.asarray(SP)

    grid_spec = pl.BlockSpec((NC, G + 1, TILE), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    lane = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)

    is_exact = mode.startswith("exact")
    reprop = params.stochastic and is_exact
    carry_rows = 48 if is_exact else 32
    extra_in = []
    extra_specs = []
    if params.stochastic and mode in ("full", "export",
                                      "exact", "exact_export"):
        extra_in = [noise_plane]
        extra_specs = [grid_spec]
    if reprop:
        extra_in += [rnoise_plane]
        extra_specs += [grid_spec]
    if mode in ("resume", "exact_resume"):
        extra_in += [grid_in, carry_in]
        extra_specs += [grid_spec, lane(carry_rows)]

    out_specs = (lane(20), lane(24))
    out_shape = [
        jax.ShapeDtypeStruct((20, Bp), jnp.float32),
        jax.ShapeDtypeStruct((24, Bp), jnp.float32),
    ]
    if mode in ("export", "exact_export"):
        out_specs = out_specs + (grid_spec, lane(carry_rows))
        out_shape += [jax.ShapeDtypeStruct((NC, G + 1, Bp), jnp.float32),
                      jax.ShapeDtypeStruct((carry_rows, Bp), jnp.float32)]

    interpret = jax.default_backend() == "cpu"
    blocked = (False if _FORCE_BLOCKED_DETECT is None
               else _FORCE_BLOCKED_DETECT)
    kernel = _make_kernel(params, mode=mode, cap=cap,
                          blocked_detect=blocked)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec((NC, G + 1, 32), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((80, G + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((40, G + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            lane(20), lane(10), lane(8), lane(16),
        ] + extra_specs,
        out_specs=out_specs,
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((G + 1, TILE), jnp.float32)
                        for _ in range(NC + (8 if is_exact else 0)
                                       + (8 if reprop else 0))]
                       + [pltpu.VMEM((16, TILE), jnp.float32)],
        interpret=interpret,
    )(M, FI, SP, x, u, meta, dmg, *extra_in)
    if mode in ("export", "exact_export"):
        xout, aux, grid_out, carry_out = out
        return (xout, aux[0:8], aux[8:24]), grid_out, carry_out
    xout, aux = out
    return xout, aux[0:8], aux[8:24]


# NOTE: a fully-fused multi-step runner (lax.scan whose carry stays in
# lane-major planes, body = one kernel call) was measured at parity with
# the per-step path -- the XLA glue around the kernel is not the
# bottleneck -- and wedged the tunneled-TPU runtime in round-1 testing,
# so it is not shipped; step_pallas_batch in a host-level scan is the
# supported pattern.
