"""Tests for OPQ and GaussianOpq: eigenvalue bucketing golden fixtures and
the seeded statistical quality gates.

Ports the reference's inline tests (reference: ``src/pq/opq.rs:275-339``
and ``src/pq/gaussian_opq.rs:71-108``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reductive_tpu import train_gaussian_opq, train_opq
from reductive_tpu.pq import bucket_eigenvalues, create_projection_matrix


def avg_euclidean_loss(instances, pq):
    codes = pq.quantize_batch(instances, dtype=jnp.uint8)
    reconstructions = pq.reconstruct_batch(codes)
    dists = jnp.sqrt(jnp.sum((instances - reconstructions) ** 2, axis=1))
    return float(jnp.mean(dists))


def test_bucket_eigenvalues():
    # reference: src/pq/opq.rs:303-311
    eigenvalues = np.array([0.2, 0.6, 0.4, 0.1, 0.3, 0.5])
    assert bucket_eigenvalues(eigenvalues, 3) == [[1, 3], [5, 0], [2, 4]]


def test_bucket_large_eigenvalues():
    # reference: src/pq/opq.rs:313-320
    eigenvalues = np.array([11174.0, 23450.0, 30835.0, 1557.0, 32425.0, 5154.0])
    assert bucket_eigenvalues(eigenvalues, 3) == [[4, 3], [2, 5], [1, 0]]


def test_bucket_eigenvalues_uneven():
    # reference: src/pq/opq.rs:322-328
    eigenvalues = np.array([0.2, 0.6, 0.4, 0.1, 0.3, 0.5])
    with pytest.raises(ValueError, match="multiple of the number of buckets"):
        bucket_eigenvalues(eigenvalues, 4)


def test_bucket_eigenvalues_validation():
    with pytest.raises(ValueError, match="zero buckets"):
        bucket_eigenvalues(np.array([1.0, 2.0]), 0)
    with pytest.raises(ValueError, match="At least one eigenvalue"):
        bucket_eigenvalues(np.array([1.0]), 2)
    with pytest.raises(ValueError, match="positive eigenvalues"):
        bucket_eigenvalues(np.array([-1.0, 2.0]), 2)


def test_projection_matrix_is_orthonormal():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (128, 12), dtype=jnp.float32)
    proj = create_projection_matrix(x, 4)
    assert proj.shape == (12, 12)
    np.testing.assert_allclose(
        np.asarray(proj.T @ proj), np.eye(12), atol=1e-5
    )


def test_quantize_with_opq():
    # reference: src/pq/opq.rs:331-339 — loss is around 0.09.
    key = jax.random.PRNGKey(42)
    data_key, train_key = jax.random.split(key)
    instances = jax.random.uniform(data_key, (256, 20), dtype=jnp.float32)
    pq = train_opq(train_key, instances, 10, 7, 10)
    loss = avg_euclidean_loss(instances, pq)
    assert loss < 0.1, f"loss {loss} not under reference gate 0.1"


def test_quantize_with_gaussian_opq():
    # reference: src/pq/gaussian_opq.rs:99-108 — loss is around 0.1.
    key = jax.random.PRNGKey(42)
    data_key, train_key = jax.random.split(key)
    instances = jax.random.uniform(data_key, (256, 20), dtype=jnp.float32)
    pq = train_gaussian_opq(train_key, instances, 10, 7, 10, 1)
    loss = avg_euclidean_loss(instances, pq)
    assert loss < 0.12, f"loss {loss} not under reference gate 0.12"


def test_opq_projection_roundtrip_orthonormal():
    # The learned rotation must stay orthonormal through the Procrustes
    # updates (R = U V^T is always orthonormal).
    key = jax.random.PRNGKey(7)
    data_key, train_key = jax.random.split(key)
    instances = jax.random.uniform(data_key, (128, 8), dtype=jnp.float32)
    pq = train_opq(train_key, instances, 4, 4, 5)
    R = np.asarray(pq.projection)
    np.testing.assert_allclose(R.T @ R, np.eye(8), atol=1e-4)


def test_polar_orthogonalize_matches_svd():
    """Newton-Schulz polar factor == the SVD Procrustes solution U V^T for
    full-rank input, and stays orthonormal even when ill-conditioned."""
    from reductive_tpu.pq.opq import polar_orthogonalize

    for seed, d in [(0, 8), (1, 64), (2, 128)]:
        M = jax.random.normal(jax.random.PRNGKey(seed), (d, d), dtype=jnp.float32)
        R = polar_orthogonalize(M)
        u, _, vt = jnp.linalg.svd(M)
        np.testing.assert_allclose(np.asarray(R), np.asarray(u @ vt), atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(R.T @ R), np.eye(d), atol=5e-6
        )
    # condition number 1e6: orthonormality must survive
    M = jnp.diag(jnp.logspace(-3, 3, 16)) @ jax.random.normal(
        jax.random.PRNGKey(9), (16, 16)
    )
    R = polar_orthogonalize(M)
    np.testing.assert_allclose(np.asarray(R.T @ R), np.eye(16), atol=1e-4)
