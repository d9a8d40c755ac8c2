"""Shared slope-protocol timer for the hardware probe tools.

One canonical copy of the measurement protocol CLAUDE.md treats as
hard-won (review r5: it existed verbatim in bench_esvit_floor,
bench_nest_floor, and megakernel_price — a protocol fix applied to one
copy would silently leave the others stale).

Two-length slope: time a jitted lax.scan over n and over 3n iterations
(the same staged buffers cycled — data still varies per iteration, so
nothing hoists) and return (t(3n) - t(n)) / 2n milliseconds. The
per-DISPATCH costs (the axon tunnel's ~24-45 ms turnaround + the single
fetch) appear in both runs identically and cancel; dividing them into few
iterations instead inflated stage-level numbers up to 2x (PERF.md round-4
microbench protocol lesson). Each length runs best-of-3.
"""

from __future__ import annotations

import time

import numpy as np


def time_scan_ms(fn, xs):
    """ms per fn(x) call, slope-timed over the leading axis of xs."""
    import jax
    import jax.numpy as jnp

    n = xs.shape[0]

    @jax.jit
    def run(xs):
        def body(_, x):
            return None, jnp.sum(fn(x).astype(jnp.float32))
        return jax.lax.scan(body, None, xs)[1]

    xs3 = jnp.concatenate([xs, xs, xs], axis=0)
    np.asarray(run(xs))   # compile+warm length n
    np.asarray(run(xs3))  # compile+warm length 3n
    best1 = best3 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(xs))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run(xs3))
        best3 = min(best3, time.perf_counter() - t0)
    return (best3 - best1) / (2 * n) * 1e3
