"""Checkpoint / resume for long sweeps.

The reference has no checkpointing; the closest analogues are the fully
deterministic ``reset(seed)`` and the persisted ``configuration.txt``
(SURVEY.md §5).  Here the entire experiment state is one pytree -- the
(batched) :class:`~robogame_tpu.state.GameState` plus optional policy
carries -- so a checkpoint is just that pytree on disk.  Long pod-slice
Monte-Carlo sweeps checkpoint every N control steps and resume
mid-trajectory after preemption.

Format: a single ``.npz`` with flattened leaves + a JSON treedef header.
No framework dependencies (orbax also works on these pytrees; this keeps
restore possible with plain numpy).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_checkpoint(path: str, tree, meta: dict | None = None) -> None:
    """Save any pytree of arrays (device arrays are pulled to host)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    header = dict(treedef=str(treedef), n_leaves=len(leaves),
                  meta=meta or {})
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __header__=json.dumps(header), **arrays)
    os.replace(tmp, path)       # atomic on POSIX


def load_checkpoint(path: str, like):
    """Restore into the structure of ``like`` (a pytree with the same
    treedef as the saved one).  Returns (tree, meta)."""
    with np.load(path, allow_pickle=False) as z:
        header = json.loads(str(z["__header__"]))
        leaves = [z[f"leaf_{i}"] for i in range(header["n_leaves"])]
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, target structure "
            f"expects {treedef.num_leaves}")
    return jax.tree_util.tree_unflatten(treedef, leaves), header["meta"]


def checkpointed_scan(step_fn, state, n_steps: int, path: str,
                      every: int = 200, meta: dict | None = None):
    """Host-driven loop with periodic checkpoints: runs ``step_fn``
    (jitted, state -> state) in chunks of ``every`` steps via lax.scan,
    writing a checkpoint between chunks.  Resumes from ``path`` if it
    exists (matching structure required)."""
    import jax.numpy as jnp
    from jax import lax

    start = 0
    if os.path.exists(path):
        state, saved = load_checkpoint(path, state)
        start = int(saved.get("step", 0))

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def chunk(s, k):
        def body(c, _):
            return step_fn(c), None
        out, _ = lax.scan(body, s, None, length=k)
        return out

    done = start
    while done < n_steps:
        k = min(every, n_steps - done)
        state = chunk(state, k)
        jax.block_until_ready(jax.tree_util.tree_leaves(state)[0])
        done += k
        m = dict(meta or {})
        m["step"] = done
        save_checkpoint(path, state, m)
    return state
