"""Device mesh construction.

The reference has no distributed layer at all (SURVEY 2.4: zero hits for any
distributed framework; batch-1 single-GPU inference). This framework scales
through a ``jax.sharding.Mesh``: XLA inserts ICI collectives from sharding
annotations. Axes:

- ``dp``: data parallel (independent clips / batch elements)
- ``tp``: tensor parallel (attention heads + MLP shards within a layer)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Defaults to all devices on the dp axis. tp should divide the head counts
    in play (12 AR heads, 16 wav2vec heads -> tp in {1, 2, 4}).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} needs more than {n} devices"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))
