"""Full-state checkpointing.

The reference saves Gaussians as PLY and the deform net as a torch
state_dict, and does NOT checkpoint optimizer state (SURVEY.md §5).  We
save the ENTIRE TrainState pytree (params + Adam moments + densify stats
+ rng) as one npz, so resume is exact — an improvement the functional
state makes trivial.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_train_state(path: str, state, iteration: int = 0,
                     iteration_node: int = 0) -> None:
    leaves, _ = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__iteration__"] = np.asarray(iteration)
    arrays["__iteration_node__"] = np.asarray(iteration_node)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_train_state(path: str, template):
    """template: a TrainState with the right structure/shapes (e.g. from
    init_train_state with the same config).  Returns
    (state, iteration, iteration_node)."""
    with np.load(path) as z:
        leaves, treedef = _flatten(template)
        new_leaves = []
        for i, leaf in enumerate(leaves):
            a = z[f"leaf_{i}"]
            assert a.shape == np.shape(leaf), (
                f"leaf {i}: checkpoint {a.shape} vs template "
                f"{np.shape(leaf)} — config mismatch?")
            new_leaves.append(jax.numpy.asarray(a, np.asarray(leaf).dtype))
        it = int(z["__iteration__"])
        it_node = int(z["__iteration_node__"])
    return jax.tree_util.tree_unflatten(treedef, new_leaves), it, it_node
