"""Honest device timing through the axon relay.

Discovered round 1: `block_until_ready` does NOT fence device execution on
this PJRT relay — only fetching a value does. `device_time` therefore
chains each iteration on the previous one's output (a zero-valued scalar
folded into the next input, so the device cannot reorder) and ends with a
scalar fetch that transitively depends on every iteration.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_time(fn: Callable, x, iters: int = 20, warmup: int = 2) -> float:
    """Mean seconds per call of ``fn(x)`` with true device fencing.

    fn must map one array to one array (any shapes).
    """
    jfn = jax.jit(fn)

    def chained(z, carry):
        out = jfn(z * (1.0 + 0.0 * carry))
        return jnp.sum(out) * 0.0, out

    carry = jnp.float32(0.0)
    for _ in range(warmup):
        carry, out = chained(x, carry)
    float(carry)  # fence warmup

    t0 = time.time()
    for _ in range(iters):
        carry, out = chained(x, carry)
    float(carry)  # fence: depends on all iterations
    return (time.time() - t0) / iters
