#!/usr/bin/env python
"""Reconcile the r4 campaign's corner-grinding damage bias (VERDICT r4
missing #2).

``artifacts/dist_equiv_r4.json`` row "corner: exact-vs-event50" showed
total-damage rel-diff 6.6% with z=-6.9 at 4096 games x 100 steps — in
tension with the exact kernel's unbiasedness claim.  That comparison was
CROSS-PLATFORM: the event-engine references were dumped on CPU
(``--dump-refs``) while the exact kernel ran on TPU, and f32 CPU-vs-TPU
arithmetic differs at roundoff, which on the chaotic grinder family
decorrelates trajectories.  Decorrelation alone cannot shift a *mean* —
but systematic arithmetic differences (FMA contraction, transcendental
rounding) conceivably could.  This tool settles the attribution with a
controlled experiment at the full campaign workload (same seeds, same
schedules as r4):

  A. event@CPU  vs event@TPU   — identical semantics, platform-only diff
  B. exact@TPU  vs event@TPU   — identical platform, semantics-only diff
  C. exact@TPU  vs event@CPU   — the r4 campaign mode (reproduction)

If A reproduces the bias magnitude and B is unbiased, the r4 row is a
platform artifact and the kernel's semantics claim stands; if B is
biased, there is a genuine ordering/semantic gap to fix.

Run (two passes, one per platform — the CPU pass has no TPU watchdog):
  python tools/reconcile_bias.py --phase cpu            # event@CPU dump
  python tools/reconcile_bias.py --phase tpu            # event@TPU + exact@TPU dumps
  python tools/reconcile_bias.py --phase compare \
      --json artifacts/bias_reconcile_r5.json
Dumps are cached under --cache PREFIX (default /tmp/recon_r5) so each
phase is resumable.
"""

import argparse
import json
import os
import sys
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import dist_equiv  # noqa: E402  (make_states/make_sched/rollout/compare)


def workload(G, steps):
    from robogame_tpu.config import SimParams
    params = SimParams(dtype="float32")
    states = dist_equiv.make_states(G, None, params)
    sched = dist_equiv.make_sched(
        "corner", G, steps, seed=zlib.crc32(b"corner") % 2**31)
    return params, states, sched


def roll_and_dump(engine, path, params, states, sched, block,
                  game_block=None, step_chunk=None):
    if os.path.exists(path):
        print(f"# cached: {path}", flush=True)
        return
    import time
    G = states.score.shape[0]
    n = sched.shape[0]
    if game_block is None:
        f, t = dist_equiv.rollout(engine, states, sched, params,
                                  block=block)
    else:
        # corner grinding runs the event engine's while-loops at the full
        # 50-event cap (~160 steps/s on TPU); pieces of game_block games x
        # step_chunk steps keep every XLA execution well under the
        # tunneled worker's ~60-90 s watchdog (NOTES.md r3)
        import jax
        t0 = time.time()
        outs = []
        for lo in range(0, G, game_block):
            hi = min(lo + game_block, G)
            bp = f"{path}.blk{lo}.npz"     # per-block resume cache: the
            if os.path.exists(bp):         # tunneled worker crashes kill
                outs.append(dist_equiv.load_final(bp))  # the client
                continue
            cur = jax.tree.map(lambda a: a[lo:hi], states)
            for s0 in range(0, n, step_chunk):
                cur, _ = dist_equiv.rollout(
                    engine, cur, sched[s0:s0 + step_chunk, lo:hi],
                    params, block=0)
            fin = dist_equiv._Final(np.asarray(cur.x),
                                    np.asarray(cur.score),
                                    np.asarray(cur.damage))
            dist_equiv.dump_final(bp, fin)
            outs.append(fin)
            if lo % (game_block * 8) == 0:
                print(f"#   {engine} {hi}/{G} games "
                      f"({time.time()-t0:.0f}s)", flush=True)
        f = dist_equiv._Final(
            np.concatenate([o.x for o in outs], axis=0),
            np.concatenate([o.score for o in outs], axis=0),
            np.concatenate([o.damage for o in outs], axis=0))
        t = time.time() - t0
    dist_equiv.dump_final(path, f)
    print(f"# {engine}: {G*n/t:.0f} steps/s -> {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["cpu", "tpu", "compare", "perturb"])
    ap.add_argument("--games", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--block", type=int, default=2000)
    ap.add_argument("--cache", default="/tmp/recon_r5")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    c = args.cache
    paths = dict(event_cpu=f"{c}_event_cpu.npz",
                 event_tpu=f"{c}_event_tpu.npz",
                 exact_tpu=f"{c}_exact_tpu.npz")

    if args.phase == "compare":
        f = {k: dist_equiv.load_final(p) for k, p in paths.items()}
        records = [
            dist_equiv.compare(f["event_cpu"], f["event_tpu"],
                               "corner: event_cpu-vs-event_tpu (platform only)"),
            dist_equiv.compare(f["event_tpu"], f["exact_tpu"],
                               "corner: exact_tpu-vs-event_tpu (same platform)"),
            dist_equiv.compare(f["event_cpu"], f["exact_tpu"],
                               "corner: exact_tpu-vs-event_cpu (r4 campaign mode)"),
        ]
        if args.json:
            with open(args.json, "w") as fh:
                json.dump(dict(games=args.games, steps=args.steps,
                               records=records), fh, indent=1)
            print(f"# wrote {args.json}", flush=True)
        return

    if args.phase in ("cpu", "perturb"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    params, states, sched = workload(args.games, args.steps)
    print(f"# platform={jax.devices()[0].platform} G={args.games} "
          f"steps={args.steps}", flush=True)

    if args.phase == "perturb":
        # The decisive control: identical code, identical platform,
        # identical schedules -- initial states perturbed by ONE ULP
        # (x *= 1 + 2^-23).  r5 measured: 100-step corner damage mean
        # shifts 40% (z=+39.5) while the 30-step horizon is stable
        # (0.28%, z=0.05) and scores/goals/KS stay matched -- the
        # long-horizon grinding damage mean is governed by
        # roundoff-scale contact dynamics (the pile-up settles onto the
        # contact manifold where overlap tests flicker at ulp scale), so
        # cross-engine or cross-platform comparisons of it measure
        # arithmetic realization, not semantics.
        eps = np.float32(1.0 + 2.0 ** -23)
        states_p = states._replace(x=states.x * eps)
        recs = []
        for steps in (30, args.steps):
            f0, _ = dist_equiv.rollout("event", states, sched[:steps],
                                       params, block=args.block)
            fp, _ = dist_equiv.rollout("event", states_p, sched[:steps],
                                       params, block=args.block)
            recs.append(dist_equiv.compare(
                f0, fp,
                f"corner {steps}step: event_cpu-vs-event_cpu+1ulp"))
        if args.json:
            with open(args.json, "w") as fh:
                json.dump(dict(games=args.games, records=recs), fh,
                          indent=1)
        return

    if args.phase == "cpu":
        roll_and_dump("event", paths["event_cpu"], params, states, sched,
                      block=args.block)
    else:
        roll_and_dump("pallas_exact", paths["exact_tpu"],
                      params, states, sched, block=args.block)
        roll_and_dump("event", paths["event_tpu"], params, states, sched,
                      block=args.block, game_block=64, step_chunk=50)


if __name__ == "__main__":
    main()
