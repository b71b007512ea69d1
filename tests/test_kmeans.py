"""Golden-fixture and statistical tests for the k-means engine.

Ports the reference's inline unit tests (reference:
``src/kmeans.rs:362-519``): assignment/update truth tables, the exact
``7/6`` MSE fixture, and the 3-Gaussian-spheres recovery gate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reductive_tpu.kmeans import (
    KMeansPlusPlusCentroids,
    LossConvergence,
    NIterations,
    RandomInstanceCentroids,
    cluster_assignment,
    cluster_assignments,
    kmeans,
    kmeans_iteration,
    kmeans_with_centroids,
    mean_squared_error,
    update_centroids,
)


def test_correct_cluster_assignments():
    # reference: src/kmeans.rs:380-400
    centroids = jnp.array(
        [[0.5, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0], [0.0, 1.0, 1.0]]
    )
    instances = jnp.array(
        [
            [0.0, 0.5, 0.0],
            [0.0, 0.0, 2.0],
            [1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0],
            [0.0, -2.0, 0.0],
            [0.0, 0.7, 0.7],
            [0.0, 0.0, 0.0],
        ]
    )
    np.testing.assert_array_equal(
        cluster_assignments(centroids, instances), [0, 2, 0, 2, 1, 3, 0]
    )
    # Single-instance entry agrees.
    for i, expected in enumerate([0, 2, 0, 2, 1, 3, 0]):
        assert int(cluster_assignment(centroids, instances[i])) == expected


def test_correct_update_centroids():
    # reference: src/kmeans.rs:402-435
    instances = jnp.array(
        [
            [-1.0, -1.0, 0.0],
            [1.0, 1.0, 0.0],
            [-2.0, -1.0, 0.0],
            [0.0, 0.0, 0.0],
            [0.0, 0.0, 1.0],
            [0.0, 0.0, 2.0],
        ]
    )
    assignments = jnp.array([1, 0, 1, 0, 2, 2])
    updated = update_centroids(instances, assignments, 3)
    np.testing.assert_array_equal(
        updated, [[0.5, 0.5, 0.0], [-1.5, -1.0, 0.0], [0.0, 0.0, 1.5]]
    )


def test_empty_cluster_becomes_zero_vector():
    # Empty-cluster semantics (reference: src/kmeans.rs:181,194-196): a
    # centroid with no assigned instances is the zero vector.
    instances = jnp.array([[1.0, 1.0], [3.0, 3.0]])
    assignments = jnp.array([0, 0])
    updated = update_centroids(instances, assignments, 3)
    np.testing.assert_array_equal(updated, [[2.0, 2.0], [0.0, 0.0], [0.0, 0.0]])


def test_correct_mean_squared_error():
    # reference: src/kmeans.rs:504-519 — MSE is exactly 7/6 (normalized by
    # n * d, not n).
    centroids = jnp.array([[-1.0, 2.0, 0.0], [0.0, -1.0, 1.0]])
    instances = jnp.array([[-1.0, 1.0, 1.0], [0.0, 1.0, 0.0]])
    mse = mean_squared_error(centroids, instances, jnp.array([1, 0]))
    assert float(mse) == pytest.approx(7.0 / 6.0)


def gaussian_spheres(key, centers, n_samples=11, sigma=0.01):
    """3 tight Gaussian spheres around integer centers (reference data
    generator: ``src/kmeans.rs:437-457``)."""
    centers = jnp.asarray(centers, dtype=jnp.float64)
    noise = sigma * jax.random.normal(
        key, (centers.shape[0], n_samples, centers.shape[1]), dtype=jnp.float64
    )
    return (centers[:, None, :] + noise).reshape(-1, centers.shape[1])


def test_k_means_3():
    # reference: src/kmeans.rs:459-479 — k-means recovers the integer
    # centers exactly after rounding, under a fixed seed.
    key = jax.random.PRNGKey(42)
    data_key, init_key = jax.random.split(key)
    data = gaussian_spheres(data_key, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    centroids, _ = kmeans(init_key, data, 3, NIterations(10))
    rounded = sorted(np.asarray(jnp.round(centroids)).astype(int).tolist())
    assert rounded == [[0, 0], [1, 0], [1, 1]]


def test_k_means_3_axis1():
    # reference: src/kmeans.rs:481-502 — axis-1 (instances as columns)
    # symmetry.
    key = jax.random.PRNGKey(42)
    data_key, init_key = jax.random.split(key)
    data = gaussian_spheres(data_key, [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    centroids, _ = kmeans(init_key, data.T, 3, NIterations(10), instance_axis=1)
    rounded = sorted(np.asarray(jnp.round(centroids)).astype(int).tolist())
    assert rounded == [[0, 0], [1, 0], [1, 1]]


def test_kmeans_iteration_loss_decreases():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (200, 8))
    centroids = RandomInstanceCentroids()(jax.random.PRNGKey(1), x, 16)
    losses = []
    for _ in range(5):
        centroids, loss = kmeans_iteration(x, centroids)
        losses.append(float(loss))
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:]))


def test_loss_convergence_stop():
    # k-means++ seeding avoids the bad local minima that plain random
    # seeding can hit on widely separated spheres.
    key = jax.random.PRNGKey(3)
    data_key, init_key = jax.random.split(key)
    data = gaussian_spheres(data_key, [[0.0, 0.0], [5.0, 0.0], [5.0, 5.0]])
    centroids, loss = kmeans(
        init_key,
        data,
        3,
        LossConvergence(max_iterations=100, rel_tol=1e-9),
        init=KMeansPlusPlusCentroids(),
    )
    rounded = sorted(np.asarray(jnp.round(centroids)).astype(int).tolist())
    assert rounded == [[0, 0], [5, 0], [5, 5]]
    assert float(loss) < 1e-3


def test_kmeans_plus_plus_init():
    key = jax.random.PRNGKey(7)
    data_key, init_key = jax.random.split(key)
    data = gaussian_spheres(data_key, [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    centroids, _ = kmeans(
        init_key, data, 3, NIterations(10), init=KMeansPlusPlusCentroids()
    )
    rounded = sorted(np.asarray(jnp.round(centroids)).astype(int).tolist())
    assert rounded == [[0, 0], [10, 0], [10, 10]]


def test_kmeans_validation():
    x = jnp.zeros((5, 2))
    with pytest.raises(ValueError, match="cannot be larger"):
        kmeans(jax.random.PRNGKey(0), x, 0, NIterations(1))
    with pytest.raises(ValueError, match="cannot be larger"):
        kmeans(jax.random.PRNGKey(0), x, 6, NIterations(1))
    with pytest.raises(ValueError, match="lengths differ"):
        kmeans_with_centroids(x, jnp.zeros((2, 3)), NIterations(1))
    with pytest.raises(ValueError, match="zero centroids"):
        kmeans_with_centroids(x, jnp.zeros((0, 2)), NIterations(1))


def test_random_instance_centroids_distinct():
    x = jnp.arange(20.0).reshape(10, 2)
    centroids = RandomInstanceCentroids()(jax.random.PRNGKey(0), x, 8)
    rows = {tuple(np.asarray(r).tolist()) for r in centroids}
    assert len(rows) == 8  # all distinct instances


def test_kmeans_with_centroids_chunked_matches_in_memory():
    """The corpus-scale single-quantizer Lloyd's (fused-stats machinery
    with m=1) reproduces the in-memory driver to float tolerance."""
    from reductive_tpu.kmeans import kmeans_with_centroids_chunked

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (500, 8), dtype=jnp.float32)
    init = x[:7]
    ref_c, ref_loss = kmeans_with_centroids(x, init, 5)
    got_c, got_loss = kmeans_with_centroids_chunked(
        x, init, 5, chunk=128, use_kernel=False
    )
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c), atol=1e-5)
    assert abs(float(got_loss) - float(ref_loss)) < 1e-5


def test_random_distinct_indices():
    from reductive_tpu.kmeans import random_distinct_indices

    # Large-n rejection path: distinct, in range, deterministic.
    key = jax.random.PRNGKey(0)
    idx = random_distinct_indices(key, 1_000_000, 64)
    arr = np.asarray(idx)
    assert len(set(arr.tolist())) == 64
    assert arr.min() >= 0 and arr.max() < 1_000_000
    np.testing.assert_array_equal(
        arr, np.asarray(random_distinct_indices(key, 1_000_000, 64))
    )
    # Small-n path (exact permutation): all distinct at n close to k.
    idx2 = random_distinct_indices(jax.random.PRNGKey(1), 10, 9)
    assert len(set(np.asarray(idx2).tolist())) == 9
    # Roughly uniform over a small range (chi-square-ish sanity).
    counts = np.zeros(50)
    for i in range(200):
        s = np.asarray(random_distinct_indices(jax.random.PRNGKey(i), 100_000, 8))
        counts[s // 2000] += 1
    assert counts.min() > 0  # every bucket of 2% hit at least once

    # The sort-based dedup preserves first-occurrence draw order exactly:
    # replicate the candidate draws and dedup them in numpy.
    key = jax.random.PRNGKey(7)
    n, k = 5_000, 256  # n > 16k, small n so duplicates actually occur
    cand = np.asarray(jax.random.randint(key, (4 * k,), 0, n))
    seen, expected = set(), []
    for v in cand.tolist():
        if v not in seen:
            seen.add(v)
            expected.append(v)
        if len(expected) == k:
            break
    got = np.asarray(random_distinct_indices(key, n, k))
    np.testing.assert_array_equal(got, np.asarray(expected))

    # Large k stays memory-feasible (the former pairwise-equality matrix
    # would be (4k)^2 bools — 1 GB at k=8192, 64 GB at k=65536).
    big = np.asarray(random_distinct_indices(jax.random.PRNGKey(3), 10_000_000, 8192))
    assert len(set(big.tolist())) == 8192


def test_kmeans_iteration_and_with_centroids_axis1():
    """instance_axis=1 (instances as columns) mirrors the reference's Axis
    parameter on the single-iteration and from-centroids drivers too."""
    x = jax.random.uniform(jax.random.PRNGKey(0), (100, 6), dtype=jnp.float32)
    init = x[:5]
    c0, l0 = kmeans_iteration(x, init)
    c1, l1 = kmeans_iteration(x.T, init, instance_axis=1)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    assert float(l0) == float(l1)
    c0, l0 = kmeans_with_centroids(x, init, 4)
    c1, l1 = kmeans_with_centroids(x.T, init, 4, instance_axis=1)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    assert float(l0) == float(l1)
