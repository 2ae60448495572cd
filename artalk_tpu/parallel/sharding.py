"""Parameter sharding rules (GSPMD-style: annotate, let XLA insert collectives).

Tensor-parallel layout for the transformer stacks (Megatron-style column/row
split, expressed purely through PartitionSpecs):

- q/k/v projections: shard the output (head) dimension on ``tp``
- attention output projection: shard the input dimension on ``tp`` (XLA
  inserts the psum)
- MLP: fc1 column-split, fc2 row-split
- everything else (embeddings, norms, the tiny VAE/style towers): replicated

Activations are sharded batch-on-``dp`` by the train/infer steps; within a
layer XLA propagates the head sharding automatically.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: str, ndim: int) -> P:
    """Sharding spec from a parameter's flattened path."""
    # AR transformer blocks: stacked (depth, in, out) weights
    if "blocks" in path:
        if any(f"{n}//w" in path for n in ("q", "k", "v", "fc1")):
            return P(*([None] * (ndim - 1) + ["tp"]))       # column parallel
        if any(f"{n}//b" in path for n in ("q", "v", "fc1")):
            return P(*([None] * (ndim - 1) + ["tp"]))
        if "proj//w" in path or "fc2//w" in path:
            return P(*([None] * (ndim - 2) + ["tp", None]))  # row parallel
        return P()
    # wav2vec encoder layers: same pattern
    if "audio_encoder" in path and "layers" in path:
        if any(f"{n}//w" in path for n in ("q", "k", "v", "fc1")):
            return P(*([None] * (ndim - 1) + ["tp"]))
        if any(f"{n}//b" in path for n in ("q", "k", "v", "fc1")):
            return P(*([None] * (ndim - 1) + ["tp"]))
        if "out//w" in path or "fc2//w" in path:
            return P(*([None] * (ndim - 2) + ["tp", None]))
        return P()
    return P()  # replicated


def _path_str(path) -> str:
    return "//".join(str(p.key) if hasattr(p, "key") else str(p.idx) for p in path)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings matching ``params``."""
    def leaf_sharding(path, leaf):
        return NamedSharding(mesh, _spec_for(_path_str(path), leaf.ndim))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place parameters onto the mesh according to the rules."""
    return jax.device_put(params, param_shardings(params, mesh))


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Batch data sharded on dp along ``axis``, replicated elsewhere."""
    spec = [None] * ndim
    spec[axis] = "dp"
    return NamedSharding(mesh, P(*spec))
