"""Checkpoint / resume for world state and scene parameters.

The reference has no checkpointing (its demos at most ``torch.save`` learned
parameters — SURVEY.md §5.4).  Because every dynamic quantity here is a
PyTree of arrays, save/restore is exact and trivial: ``save_pytree`` writes
one ``.npz`` with the flattened leaves; ``load_pytree`` restores into the
same treedef.  For large sharded world batches, ``save_pytree`` gathers to
host; orbax can be swapped in by passing these PyTrees directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SUFFIX = "__leaf"


def save_pytree(path, tree):
    """Save any PyTree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"{i}{_SUFFIX}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(path, __treedef__=np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8), **arrays)


def load_pytree(path, like):
    """Load a PyTree saved by :func:`save_pytree` into the structure (and
    dtypes/shardings) of ``like``.

    The stored treedef repr is validated against ``like`` — loading a
    checkpoint into a structurally different tree would silently scatter
    leaves into the wrong fields (ADVICE r1)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree.flatten(like)
    if "__treedef__" in data:
        stored = bytes(data["__treedef__"]).decode()
        if stored != repr(treedef):
            raise ValueError(
                "checkpoint treedef mismatch:\n"
                f"  stored: {stored}\n  target: {treedef!r}")
    n_stored = sum(1 for k in data.files if k.endswith(_SUFFIX))
    if n_stored != len(leaves_like):
        raise ValueError(
            f"checkpoint has {n_stored} leaves, target structure has "
            f"{len(leaves_like)}")
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"{i}{_SUFFIX}"]
        leaves.append(jnp.asarray(arr, dtype=jnp.asarray(ref).dtype))
    return jax.tree.unflatten(treedef, leaves)


def save_world(path, state, params=None):
    """Checkpoint a WorldState (and optionally SceneParams)."""
    save_pytree(path, (state, params))


def load_world(path, like_state, like_params=None):
    state, params = load_pytree(path, (like_state, like_params))
    return (state, params) if like_params is not None else (state, None)
