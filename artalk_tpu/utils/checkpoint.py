"""Parameter pytree persistence: flat-key .npz (portable) and orbax (sharded).

The reference only ever loads torch .pt checkpoints (inference.py:24-28);
this framework converts those once (tools/convert_checkpoint.py ->
utils/convert.py) and then round-trips its own pytrees here.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

SEP = "//"


def _flatten(tree: Any) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_params(params: Any, path: str) -> None:
    """Save a parameter pytree as a flat-key compressed .npz."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **_flatten(params))


def load_params(path: str, like: Any | None = None) -> Any:
    """Load a flat-key .npz back into a pytree.

    If ``like`` (a template pytree, e.g. from model.init) is given, the arrays
    are restructured to its treedef and shapes are validated; otherwise a
    nested dict is rebuilt from the flat keys.
    """
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    if like is not None:
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        paths = jax.tree_util.tree_flatten_with_path(like)[0]
        leaves = []
        for (path, leaf_like) in paths:
            key = SEP.join(
                str(p.key) if hasattr(p, "key") else str(p.idx) for p in path)
            if key not in flat:
                raise KeyError(f"checkpoint missing parameter {key!r}")
            arr = flat[key]
            if arr.shape != leaf_like.shape:
                raise ValueError(
                    f"shape mismatch for {key!r}: ckpt {arr.shape} vs model {leaf_like.shape}")
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    # rebuild nested dicts (list indices become string keys)
    tree: dict = {}
    for key, arr in flat.items():
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def save_params_orbax(params: Any, path: str) -> None:
    """Orbax checkpoint (async-capable, sharding-aware) for production use."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
