"""Tunnel-safe device timing helpers.

Single home for the dispatch-pipelined measurement discipline (CLAUDE.md):
every dispatch->``device_get`` cycle over the dev tunnel pays ~27 ms of RTT
and ``block_until_ready`` is unreliable there, so a measurement must enqueue
``n`` async calls and fetch only the LAST (small) result, then divide.
``bench.py`` and the ``tools/profile_*`` scripts all time through this module
so the subtle pattern cannot drift between them.
"""

from __future__ import annotations

import time
from typing import Callable

import jax


def pipelined_ms(enqueue: Callable, n: int, repeats: int = 3) -> float:
    """Median per-call device milliseconds.

    enqueue(i, prev) -> a (small) device value; called ``n`` times per repeat
    without synchronizing, then only the final value is fetched. The caller
    must have warmed/compiled the function already (fetch one result first).
    """
    medians = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = enqueue(i, out)
        jax.device_get(out)
        medians.append((time.perf_counter() - t0) / n * 1000.0)
    medians.sort()
    return medians[len(medians) // 2]


def timed(name: str, fn: Callable, *args, iters: int = 10,
          label_width: int = 44) -> float:
    """Compile+warm ``fn(*args)``, measure it pipelined, print one line."""
    jax.device_get(fn(*args))  # compile + warmup (device_get, not block_until_ready)
    ms = pipelined_ms(lambda i, prev: fn(*args), n=iters, repeats=1)
    print(f"{name:<{label_width}s} {ms:9.2f} ms")
    return ms
