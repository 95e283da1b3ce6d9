"""Exact MIQP obstacle avoidance: branch & bound over the big-M side
binaries.

Capability spec: /root/reference/py/src/NonLinearOptimizer.py:59-109
(``intercepting_with_obs_avoidance_bb``) — effort-only objective
``sum_k |u_k|^2``, terminal *equality* to ``xf``, input/arena boxes, and per
knot k and obstacle o the axis-separation disjunction (exactly one of
``p_x >= o_x+s``, ``p_x <= o_x-s``, ``p_y >= o_y+s``, ``p_y <= o_y-s``;
reference ``avoid_obstacle_bigm`` at NonLinearOptimizer.py:210-219), i.e.
the keep-out region is the **l-inf box** of half-width ``s``.  The
reference solves this with Drake's ``MixedIntegerBranchAndBound`` over OSQP
— host-side, data-dependent search.

TPU-native split: the *search* stays on the host (as in the reference),
but every node **relaxation is a fixed-shape batched ADMM QP** on device —
frontier nodes are solved in vmapped batches, so the accelerator always
sees the same compiled program.  Relaxed (undecided) pairs simply drop
their disjunction, which is a valid lower bound (the big-M relaxation with
all four binaries free admits the whole arena).  Branching picks the
most-violated (obstacle, knot) pair and fixes each of the four sides.

``obstacles.intercepting_with_obs_avoidance_bb`` (solve-then-fix) remains
the jittable incumbent used in-game; this module provides the exact
optimum and the optimality-gap evidence (tests/test_miqp.py).
"""

from __future__ import annotations

import functools
import heapq
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimParams
from ..ops.qp import solve_qp
from .obstacles import _build_parts
from .trajopt import Trajectory, MAX_TRAJ

_BIG = 1e9
# side codes per (obstacle, knot) pair
FREE, XMIN, XMAX, YMIN, YMAX = -1, 0, 1, 2, 3


@functools.partial(jax.jit, static_argnames=("params", "N", "M",
                                             "qp_iters"))
def _solve_nodes(sides, x0, xf, obs, obs_s, obs_mask, params: SimParams,
                 N: int, M: int, qp_iters: int = 250):
    """Batch-solve node relaxations.  ``sides``: (B, M, N) int32 in
    {-1 free, 0..3 fixed side}.  Returns per node: U (B, 2N), effort
    objective, converged flag, final primal residual, and the knot
    positions (B, N, 2)."""
    dtype = x0.dtype
    parts = _build_parts(x0, xf, jnp.asarray(params.dt, dtype), params, N,
                         0.0, 1.0, True)
    sel_gam = (parts.sel @ parts.gam).reshape(N, 2, -1)     # (N, 2, 2N)
    p0_part = (parts.sel @ (parts.phi @ x0)).reshape(N, 2)  # (N, 2)

    def one(sides_mn):
        # rows: for each (m, k) one row; free/masked rows disabled
        code = sides_mn                                     # (M, N)
        is_x = (code == XMIN) | (code == XMAX)
        sign = jnp.where((code == XMIN) | (code == YMIN), 1.0, -1.0)
        axis = jnp.where(is_x, 0, 1)
        nrm = jax.nn.one_hot(axis, 2, dtype=dtype) * sign[..., None]
        rows = jnp.einsum("mnc,ncu->mnu", nrm, sel_gam)     # (M, N, 2N)
        o_ax = jnp.take_along_axis(
            jnp.broadcast_to(obs[:, None, :], (M, N, 2)),
            axis[..., None], -1)[..., 0]
        p0_ax = jnp.take_along_axis(
            jnp.broadcast_to(p0_part[None], (M, N, 2)),
            axis[..., None], -1)[..., 0]
        # sign*(p_ax - o_ax) >= s  =>  sign*p_ax >= s + sign*o_ax
        rhs = obs_s[:, None] + sign * o_ax - sign * p0_ax
        active = (code >= 0) & obs_mask[:, None]
        rows = jnp.where(active[..., None], rows, 0.0)
        lo = jnp.where(active, rhs, -1.0).reshape(-1)
        hi = jnp.where(active, _BIG, 1.0).reshape(-1)
        A = jnp.concatenate([parts.A_fix, rows.reshape(M * N, -1)], axis=0)
        lo_f = jnp.concatenate([parts.lo_fix, lo])
        hi_f = jnp.concatenate([parts.hi_fix, hi])
        sol = solve_qp(parts.H, parts.g, A, lo_f, hi_f, iters=qp_iters,
                       scale_rows=True)
        p = p0_part + (sel_gam @ sol.x)                     # (N, 2)
        return sol.x, jnp.dot(sol.x, sol.x), sol.converged, sol.prim_res, p

    with jax.default_matmul_precision("float32"):
        return jax.vmap(one)(sides)


def _violations(p, obs, obs_s, obs_mask):
    """l-inf keep-out violation per (m, k): s - max(|dx|, |dy|), >0 means
    the knot is inside the box."""
    d = np.abs(p[None, :, :] - obs[:, None, :])             # (M, N, 2)
    linf = d.max(axis=-1)
    v = obs_s[:, None] - linf
    return np.where(obs_mask[:, None], v, -1.0)


def solve_bb_exact(p0, v0, pf, vf, obs, obs_s, obs_mask,
                   params: SimParams, n_steps: int,
                   qp_iters: int = 250, feas_tol: float = 2e-3,
                   gap_tol: float = 1e-4, max_nodes: int = 4096,
                   batch: int = 16, bound_eps: float = 1e-3):
    """Best-first branch & bound to the exact MIQP optimum (modulo the
    node QP accuracy; see tests/test_qp_fuzz.py for that envelope).

    Host-side search like the reference's MixedIntegerBranchAndBound
    (/root/reference/py/src/NonLinearOptimizer.py:103-108); node
    relaxations are solved on device in fixed-shape batches.  Returns
    ``(Trajectory, info)`` with ``info['nodes']``, ``info['objective']``,
    ``info['lower_bound']``.

    Exactness hardening (ADVICE r2): an unconverged node relaxation is
    NOT proof of infeasibility -- such nodes are re-solved once at 4x
    ``qp_iters`` before the subtree is pruned; and because the ADMM
    objective is inexact, node lower bounds carry a relative margin
    ``f * (1 - bound_eps) - bound_eps`` when used for pruning."""
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    x0 = jnp.concatenate([jnp.asarray(p0, dtype), jnp.asarray(v0, dtype)])
    xf = jnp.concatenate([jnp.asarray(pf, dtype), jnp.asarray(vf, dtype)])
    obs_j = jnp.asarray(obs, dtype)
    s_j = jnp.asarray(obs_s, dtype)
    mask_j = jnp.asarray(obs_mask, bool)
    N, M = int(n_steps), int(obs_j.shape[0])

    obs_np = np.asarray(obs, float)
    s_np = np.asarray(obs_s, float)
    mask_np = np.asarray(obs_mask, bool)

    # knot 0 is pinned to x0: if x0 itself violates a keep-out the MIQP is
    # infeasible (the reference raises; we return success=False)
    v0_viol = _violations(np.asarray(p0, float)[None], obs_np, s_np,
                          mask_np)
    if (v0_viol > feas_tol).any():
        return _pack_host(np.zeros(2 * N), N, params, False), dict(
            nodes=0, objective=np.inf, lower_bound=np.inf,
            status="infeasible_x0")

    def solve_batch(sides_list, iters=qp_iters):
        sides = jnp.asarray(np.stack(sides_list), jnp.int32)
        U, f, conv, prim, p = _solve_nodes(sides, x0, xf, obs_j, s_j,
                                           mask_j, params, N, M, iters)
        return (np.asarray(U), np.asarray(f), np.asarray(conv),
                np.asarray(prim), np.asarray(p))

    root = np.full((M, N), FREE, np.int32)
    # heap entries: (lower_bound, tiebreak, sides)
    heap = [(0.0, 0, root)]
    tie = itertools.count(1)
    best_f = np.inf
    best_U = None
    n_solved = 0
    while heap and n_solved < max_nodes:
        todo = []
        while heap and len(todo) < batch:
            lb, _, sides = heapq.heappop(heap)
            if lb >= best_f - gap_tol:
                continue
            todo.append((lb, sides))
        if not todo:
            break
        U, f, conv, prim, p = solve_batch([s for _, s in todo])
        n_solved += len(todo)
        # escalated re-solve of unconverged nodes BEFORE pruning: a
        # feasible-but-slow-converging relaxation must not kill a subtree
        # that may hold the true optimum
        bad = [i for i in range(len(todo))
               if not conv[i] and prim[i] > 1e-2]
        if bad:
            U2, f2, conv2, prim2, p2 = solve_batch(
                [todo[i][1] for i in bad], iters=4 * qp_iters)
            n_solved += len(bad)
            for bi, i in enumerate(bad):
                U[i], f[i], p[i] = U2[bi], f2[bi], p2[bi]
                conv[i], prim[i] = conv2[bi], prim2[bi]
        for i, (lb_parent, sides) in enumerate(todo):
            if not conv[i] and prim[i] > 1e-2:
                continue  # still infeasible at 4x iters -> prune subtree
            node_lb = max(float(f[i]) * (1.0 - bound_eps) - bound_eps,
                          lb_parent)
            if node_lb >= best_f - gap_tol:
                continue
            viol = _violations(p[i], obs_np, s_np, mask_np)
            # ignore violations on pairs already fixed (QP enforces them)
            viol = np.where(sides >= 0, -1.0, viol)
            worst = np.unravel_index(np.argmax(viol), viol.shape)
            if viol[worst] <= feas_tol:
                # relaxation solution already satisfies every disjunction
                if conv[i] and f[i] < best_f:
                    best_f, best_U = float(f[i]), U[i]
                continue
            for side in (XMIN, XMAX, YMIN, YMAX):
                child = sides.copy()
                child[worst] = side
                heapq.heappush(heap, (node_lb, next(tie), child))
    lb_rem = min([h[0] for h in heap], default=best_f)
    info = dict(nodes=n_solved, objective=best_f,
                lower_bound=min(best_f, lb_rem),
                status="optimal" if not heap else "node_limit")
    ok = best_U is not None
    return _pack_host(best_U if ok else np.zeros(2 * N), N, params,
                      ok), info


def solve_enumerate(p0, v0, pf, vf, obs, obs_s, obs_mask,
                    params: SimParams, n_steps: int, qp_iters: int = 250,
                    chunk: int = 256):
    """Brute-force ground truth for tiny instances: solve the QP for every
    complete side assignment (4^(M_active*N)) and return the best feasible
    objective.  Test-only oracle for solve_bb_exact."""
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    x0 = jnp.concatenate([jnp.asarray(p0, dtype), jnp.asarray(v0, dtype)])
    xf = jnp.concatenate([jnp.asarray(pf, dtype), jnp.asarray(vf, dtype)])
    obs_j = jnp.asarray(obs, dtype)
    s_j = jnp.asarray(obs_s, dtype)
    mask_j = jnp.asarray(obs_mask, bool)
    N, M = int(n_steps), int(obs_j.shape[0])
    act = [m for m in range(M) if np.asarray(obs_mask)[m]]
    pairs = [(m, k) for m in act for k in range(N)]
    best = np.inf
    for start in range(0, 4 ** len(pairs), chunk):
        codes = range(start, min(start + chunk, 4 ** len(pairs)))
        sides_list = []
        for c in codes:
            s = np.full((M, N), FREE, np.int32)
            for (m, k) in pairs:
                s[m, k] = c % 4
                c //= 4
            sides_list.append(s)
        sides = jnp.asarray(np.stack(sides_list), jnp.int32)
        _, f, conv, prim, _ = _solve_nodes(sides, x0, xf, obs_j, s_j,
                                           mask_j, params, N, M, qp_iters)
        f = np.asarray(f)
        ok = np.asarray(conv) & (np.asarray(prim) < 1e-3)
        if ok.any():
            best = min(best, float(f[ok].min()))
    return best


def _pack_host(U, N, params, success):
    u = np.zeros((2, MAX_TRAJ))
    u[:, :N] = np.asarray(U).reshape(N, 2).T
    if not success:
        u[:] = 0.0
    return Trajectory(u=jnp.asarray(u),
                      length=jnp.asarray(N if success else 1, jnp.int32),
                      success=jnp.asarray(success),
                      T=jnp.asarray(N * params.dt))
