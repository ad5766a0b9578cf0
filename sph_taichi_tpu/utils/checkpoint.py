"""Checkpoint / resume — a capability the reference lacks (SURVEY §5).

Serializes the full SimState pytree + step counter to a compressed npz;
resume reloads and continues the scan.  Used by the driver every
``--checkpoint_interval`` frames and by preemption-tolerant long runs.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from sph_taichi_tpu.state import Particles, SimState


def save_checkpoint(path, state: SimState):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(a) for i, a in enumerate(leaves)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path, like: SimState) -> SimState:
    """Reload into the same pytree structure as `like` (shape-checked)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = []
    for i, ref in enumerate(leaves):
        a = data[f"leaf_{i}"]
        if tuple(a.shape) != tuple(ref.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {a.shape} != expected {ref.shape}")
        new_leaves.append(jnp.asarray(a, dtype=ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
