"""Tests for codebook artifact save/load."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reductive_tpu import Pq
from reductive_tpu import io as rio


def test_roundtrip_plain(tmp_path):
    key = jax.random.PRNGKey(0)
    pq = Pq(codebooks=jax.random.normal(key, (4, 16, 8), dtype=jnp.float32))
    path = tmp_path / "pq.npz"
    rio.save(path, pq)
    loaded = rio.load(path)
    np.testing.assert_array_equal(np.asarray(loaded.codebooks), np.asarray(pq.codebooks))
    assert loaded.projection is None


def test_roundtrip_with_projection(tmp_path):
    key = jax.random.PRNGKey(1)
    kc, kp = jax.random.split(key)
    proj, _ = jnp.linalg.qr(jax.random.normal(kp, (32, 32), dtype=jnp.float32))
    pq = Pq(
        codebooks=jax.random.normal(kc, (4, 16, 8), dtype=jnp.float32),
        projection=proj,
    )
    path = tmp_path / "opq.npz"
    rio.save(path, pq)
    loaded = rio.load(path)
    np.testing.assert_array_equal(np.asarray(loaded.projection), np.asarray(proj))

    # The roundtripped model encodes identically.
    x = jax.random.normal(key, (10, 32), dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(pq.quantize_batch(x)), np.asarray(loaded.quantize_batch(x))
    )


def test_dtype_preserved(tmp_path):
    pq = Pq(codebooks=jnp.ones((2, 4, 3), dtype=jnp.float64))
    path = tmp_path / "pq64.npz"
    rio.save(path, pq)
    assert rio.load(path).codebooks.dtype == jnp.float64


def test_load_rejects_foreign_npz(tmp_path):
    path = tmp_path / "other.npz"
    np.savez(path, foo=np.zeros(3))
    with pytest.raises(ValueError, match="not a reductive-tpu"):
        rio.load(path)


def test_save_is_atomic(tmp_path):
    # A pre-existing artifact must survive intact if overwritten.
    pq1 = Pq(codebooks=jnp.ones((1, 2, 2)))
    pq2 = Pq(codebooks=2.0 * jnp.ones((1, 2, 2)))
    path = tmp_path / "pq.npz"
    rio.save(path, pq1)
    rio.save(path, pq2)
    np.testing.assert_array_equal(np.asarray(rio.load(path).codebooks), 2.0)
    assert not (tmp_path / "pq.npz.tmp").exists()


def test_ivf_roundtrip_preserves_dropped_ids(tmp_path):
    """An IVF artifact keeps its build metadata: a reloaded dropped-rows
    index still reports which corpus rows it is missing."""
    from reductive_tpu.ivf import build_ivf, ivf_search, train_ivf_pq

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (200, 8), dtype=jnp.float32)
    coarse, pq = train_ivf_pq(key, x, 4, 2, 3, use_kernel=False,
                              train_sample=None)
    index = build_ivf(coarse, pq, x, capacity=10, use_kernel=False,
                      on_overflow="drop")
    assert index.dropped_ids.size > 0
    path = tmp_path / "ivf.npz"
    rio.save(path, index)
    back = rio.load(path)
    np.testing.assert_array_equal(back.dropped_ids, index.dropped_ids)
    # And a drop-free index round-trips with the empty default.
    full = build_ivf(coarse, pq, x, use_kernel=False)
    rio.save(path, full)
    assert rio.load(path).dropped_ids.size == 0
    # Search still works on the reloaded index.
    _, ids = ivf_search(back, x[:2], top_k=5, nprobe=2, use_kernel=False)
    assert np.asarray(ids).shape == (2, 5)


def test_ivf_roundtrip_after_add_remove(tmp_path):
    # A mutated index (adds into freed holes) persists and reloads with
    # identical search behavior.
    import numpy as np

    from reductive_tpu.ivf import (
        build_ivf, ivf_add, ivf_remove, ivf_search, train_ivf_pq,
    )

    key = jax.random.PRNGKey(50)
    x = jax.random.normal(key, (200, 8), dtype=jnp.float32)
    coarse, rpq = train_ivf_pq(key, x, 4, 2, 3, use_kernel=False,
                               train_sample=None)
    index = build_ivf(coarse, rpq, x, use_kernel=False)
    index = ivf_remove(index, np.arange(0, 200, 5))
    index = ivf_add(index, x[:30] + 0.5, use_kernel=False)

    path = tmp_path / "ivf.npz"
    rio.save(str(path), index)
    loaded = rio.load(str(path))
    np.testing.assert_array_equal(
        np.asarray(loaded.cell_ids), np.asarray(index.cell_ids)
    )
    q = x[:5]
    d0, i0 = ivf_search(index, q, top_k=3, nprobe=4, use_kernel=False)
    d1, i1 = ivf_search(loaded, q, top_k=3, nprobe=4, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)
