"""Profiling hooks: jax.profiler traces + honest step timing.

The reference's only tracing is ad-hoc ``time.time()`` prints around the
critic loop (``/root/reference/stage_1_train_fn.py:114, 151-152``);
SURVEY.md §5 asks for ``jax.profiler`` trace hooks and fenced timings.

On tunneled platforms where ``block_until_ready`` does not synchronize,
``fence`` falls back to a host readback of one scalar leaf.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def fence(tree) -> None:
    """Ensure the computation behind ``tree`` has finished."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return
    jax.block_until_ready(leaves)
    # readback fence (see bench.py): a no-op on platforms where
    # block_until_ready already synchronized
    np.asarray(jax.numpy.ravel(leaves[0])[0])


@contextlib.contextmanager
def step_timer(name: str, result: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if result is not None:
        result[name] = dt
    else:
        print(f"[timer] {name}: {dt * 1000:.2f} ms", flush=True)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard's profile
    plugin / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
