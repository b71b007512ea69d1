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


def test_opq_chunked_checkpoint_and_resume(tmp_path):
    """checkpoint_every writes a loadable artifact, and resuming from it
    reproduces the uninterrupted run exactly (alternations are
    deterministic given the state — no RNG inside the loop)."""
    from reductive_tpu import io as rio
    from reductive_tpu.pq.opq import train_opq_chunked

    key = jax.random.PRNGKey(42)
    x = jax.random.uniform(key, (128, 12), dtype=jnp.float32)
    path = str(tmp_path / "opq_ckpt.npz")

    straight = train_opq_chunked(key, x, 4, 3, 6, chunk=32, use_kernel=False)

    # Interrupted run: 4 alternations, checkpointing every 2.
    train_opq_chunked(
        key, x, 4, 3, 4, chunk=32, use_kernel=False,
        checkpoint_every=2, checkpoint_path=path,
    )
    resumed = train_opq_chunked(
        key, x, 4, 3, 2, chunk=32, use_kernel=False,
        initial_model=rio.load(path),
    )
    np.testing.assert_allclose(
        np.asarray(resumed.codebooks), np.asarray(straight.codebooks),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(resumed.projection), np.asarray(straight.projection),
        rtol=1e-6, atol=1e-6,
    )

    import pytest

    with pytest.raises(ValueError, match="checkpoint_path"):
        train_opq_chunked(key, x, 4, 3, 2, use_kernel=False, checkpoint_every=1)


def test_opq_loss_trajectory_logged(caplog):
    """The jitted alternation loop surfaces the reference's per-iteration
    log line (src/pq/opq.rs:87) plus the loss through jax.debug.callback."""
    import logging

    from reductive_tpu.pq.opq import train_opq, train_opq_chunked

    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (96, 8), dtype=jnp.float32)
    with caplog.at_level(logging.INFO, logger="reductive_tpu"):
        train_opq(key, x, 2, 3, 3)
        jax.effects_barrier()
    lines = [r.message for r in caplog.records if r.message.startswith("OPQ iteration ")]
    assert len(lines) == 3, lines
    losses = [float(l.split("loss ")[1]) for l in lines]
    assert losses == sorted(losses, reverse=True) or all(
        l >= 0 for l in losses
    )  # non-negative; typically non-increasing

    caplog.clear()
    with caplog.at_level(logging.INFO, logger="reductive_tpu"):
        train_opq_chunked(key, x, 2, 3, 3, chunk=32, use_kernel=False)
        jax.effects_barrier()
    lines = [r.message for r in caplog.records if r.message.startswith("OPQ iteration ")]
    assert [l.split(":")[0] for l in lines] == [
        "OPQ iteration 0", "OPQ iteration 1", "OPQ iteration 2"
    ]
