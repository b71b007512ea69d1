"""Profiling and timing helpers.

The reference's only performance tooling is its criterion harness
(``benches/pq.rs``, ``benches/linalg.rs``); the TPU-native equivalents are
``jax.profiler`` traces (viewable in XProf/TensorBoard) plus wall-clock
helpers that synchronize correctly — on this environment's tunneled chips
``block_until_ready`` returns at enqueue time, so honest timing requires a
host fetch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "device_sync", "benchmark"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace of the enclosed block.

    View with ``tensorboard --logdir <log_dir>`` (or XProf).  Usage::

        with trace("/tmp/jax-trace"):
            pq = train_pq(key, x, 16, 8, 25)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(tree: Any) -> None:
    """Force completion of every array in ``tree`` with a host fetch.

    ``jax.block_until_ready`` is insufficient over remote-tunneled devices
    (it resolves when the work is enqueued, not finished); summing one
    element of each leaf to the host is a true barrier.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype"):
            # Slice one element along every axis BEFORE flattening:
            # ravel-first materializes a full copy of the array (XLA
            # reshape is a physical copy), which at multi-GB leaf sizes
            # is an OOM waiting to happen next to the live buffer.
            first = leaf[tuple(slice(0, 1) for _ in range(leaf.ndim))]
            jnp.sum(jnp.ravel(first).astype(jnp.float32)).item()


def benchmark(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median-free simple benchmark: mean seconds per call of ``fn(*args)``
    after ``warmup`` compile/warm calls, synchronized via host fetch."""
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    device_sync(out)
    return (time.perf_counter() - t0) / iters
