"""Smoke tests for the profiling/timing helpers."""

import jax
import jax.numpy as jnp

from reductive_tpu.utils.profiling import benchmark, device_sync, trace


def test_device_sync_pytree():
    tree = {"a": jnp.ones((4, 4)), "b": (jnp.zeros(3), None), "c": 7}
    device_sync(tree)  # must not raise on mixed pytrees


def test_benchmark_returns_positive_time():
    f = jax.jit(lambda x: x @ x.T)
    x = jnp.ones((64, 64))
    dt = benchmark(f, x, iters=2)
    assert dt > 0


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # A plugins/profile/<ts> directory with at least one file appears.
    produced = list(tmp_path.rglob("*"))
    assert any(p.is_file() for p in produced)
