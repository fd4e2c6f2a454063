"""Full-state checkpointing.

The reference saves Gaussians as PLY and the deform net as a torch
state_dict, and does NOT checkpoint optimizer state (SURVEY.md §5).  We
save the ENTIRE TrainState pytree (params + Adam moments + densify stats
+ rng) as one npz, so resume is exact — an improvement the functional
state makes trivial.

Arrays are keyed by their TREE PATH (format 2), not position: a leaf
added to or moved within the state dataclasses (e.g. the round-4
``active_sh_degree`` meta->data move) then fails loudly with the missing
key's name instead of silently loading the wrong array into a
shape-coincident leaf (ADVICE r4).  Format-1 (positional ``leaf_{i}``)
checkpoints are still loadable; they carry the original hazard, so the
loader verifies count+shape and says which format it used.
"""
from __future__ import annotations

import os

import jax
import numpy as np

FORMAT = 2


def _path_leaves(state):
    """[(path_str, leaf)] plus the treedef, in flatten order."""
    pl, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = []
    for path, leaf in pl:
        key = jax.tree_util.keystr(path)
        out.append((key, leaf))
    return out, treedef


def save_train_state(path: str, state, iteration: int = 0,
                     iteration_node: int = 0) -> None:
    pl, _ = _path_leaves(state)
    arrays = {}
    for key, leaf in pl:
        k = "leaf:" + key
        assert k not in arrays, f"duplicate tree path {key!r}"
        arrays[k] = np.asarray(leaf)
    arrays["__format__"] = np.asarray(FORMAT)
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
        pl, treedef = _path_leaves(template)
        fmt = int(z["__format__"]) if "__format__" in z else 1
        new_leaves = []
        if fmt >= 2:
            for key, leaf in pl:
                k = "leaf:" + key
                if k not in z:
                    raise KeyError(
                        f"checkpoint {path} has no array for tree path "
                        f"{key!r} — incompatible checkpoint (saved from a "
                        f"different TrainState layout?)")
                a = z[k]
                if a.shape != np.shape(leaf):
                    raise ValueError(
                        f"tree path {key!r}: checkpoint shape {a.shape} vs "
                        f"template {np.shape(leaf)} — config mismatch?")
                new_leaves.append(
                    jax.numpy.asarray(a, np.asarray(leaf).dtype))
        else:
            # legacy positional format (pre round-5): count must match
            # exactly or the state layout has changed since the save
            n_saved = sum(1 for k in z.files if k.startswith("leaf_"))
            if n_saved != len(pl):
                raise ValueError(
                    f"legacy (format-1) checkpoint {path} has {n_saved} "
                    f"leaves but the current TrainState has {len(pl)} — "
                    f"incompatible checkpoint format; re-save with the "
                    f"current code")
            for i, (key, leaf) in enumerate(pl):
                a = z[f"leaf_{i}"]
                if a.shape != np.shape(leaf):
                    raise ValueError(
                        f"legacy leaf {i} (now {key!r}): checkpoint "
                        f"{a.shape} vs template {np.shape(leaf)} — "
                        f"incompatible checkpoint format (positional "
                        f"layout changed); re-save with the current code")
                new_leaves.append(
                    jax.numpy.asarray(a, np.asarray(leaf).dtype))
        it = int(z["__iteration__"])
        it_node = int(z["__iteration_node__"])
    return jax.tree_util.tree_unflatten(treedef, new_leaves), it, it_node
