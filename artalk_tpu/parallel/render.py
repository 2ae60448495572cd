"""Render-tier scale-out: frame-parallel mesh rendering over the dp axis.

Mesh preview frames are independent (no cross-frame carry, unlike the
GAGAvatar chunk scan's forehead EMA), so a clip shards embarrassingly over
the ``dp`` axis of a :func:`artalk_tpu.parallel.mesh.make_mesh` mesh: each
device scans its contiguous block of frames through the full raster+shade
pipeline and the (B, H, W, 3) output comes back dp-sharded with zero
collectives. This is the render-tier analogue of the decode tier's
dp-sharded batched decode (docs/DEPLOYMENT.md) -- on a v5e-8 one clip
renders ~8x faster, or 8 clips render concurrently.

Ragged clips are padded to a device multiple with repeats of the last frame
and trimmed after; the per-device compiled step therefore has one static
shape per (padded B / ndev) value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def render_frames_dp(renderer, verts: jnp.ndarray, mesh: Mesh,
                     axis: str = "dp") -> jnp.ndarray:
    """(B, V, 3) world verts -> (B, H, W, 3) RGB, frames sharded over
    ``axis``. Bit-identical to ``renderer(verts)`` (same per-frame math,
    no cross-device reductions)."""
    ndev = mesh.shape[axis]
    b = verts.shape[0]
    pad = (-b) % ndev
    if pad:
        verts = jnp.concatenate(
            [verts, jnp.tile(verts[-1:], (pad, 1, 1))], axis=0)

    spec = P(axis)
    # check_vma=False: pallas_call does not annotate varying-mesh-axes on
    # its out_shape, which trips shard_map's vma validation; the body has
    # no collectives, so there is nothing for the check to protect.
    fn = jax.shard_map(renderer._render_batch_impl, mesh=mesh,
                       in_specs=(spec,), out_specs=spec, check_vma=False)
    imgs = fn(verts)
    return imgs[:b]
