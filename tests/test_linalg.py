"""Golden-fixture tests for the linalg layer.

Ports the reference's inline unit tests (reference:
``src/linalg.rs:246-314``) — the exact hand-computed values must come out
of the JAX ops.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from reductive_tpu.linalg import (
    covariance,
    euclidean_distance,
    squared_euclidean_distance,
)


def test_covariance():
    # reference: src/linalg.rs:252-260
    x = jnp.array([[0.0, 2.0], [1.0, 1.0], [2.0, 0.0]])
    np.testing.assert_array_equal(covariance(x, 0), [[1.0, -1.0], [-1.0, 1.0]])
    np.testing.assert_array_equal(covariance(x.T, 1), [[1.0, -1.0], [-1.0, 1.0]])


def test_covariance_zero_observations():
    with pytest.raises(ValueError, match="zero observations"):
        covariance(jnp.zeros((0, 3)), 0)


def test_euclidean_distance_vec_vec():
    # reference: src/linalg.rs:263-267
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([0.0, 2.0, 0.0])
    assert float(euclidean_distance(a, b)) == pytest.approx(math.sqrt(10.0))


def test_euclidean_distance_vec_mat():
    # reference: src/linalg.rs:270-276
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 2.0]])
    np.testing.assert_allclose(
        euclidean_distance(a, b),
        [math.sqrt(14.0), math.sqrt(10.0), math.sqrt(6.0)],
        atol=1e-6,
    )


def test_euclidean_distance_mat_mat():
    # reference: src/linalg.rs:279-289
    a = jnp.array([[1.0, 2.0, 3.0], [3.0, 2.0, 1.0]])
    b = jnp.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 2.0]])
    np.testing.assert_allclose(
        euclidean_distance(a, b),
        [
            [math.sqrt(14.0), math.sqrt(10.0), math.sqrt(6.0)],
            [math.sqrt(6.0), math.sqrt(10.0), math.sqrt(14.0)],
        ],
        atol=1e-6,
    )


def test_squared_euclidean_distance_vec_vec():
    # reference: src/linalg.rs:292-296
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([0.0, 2.0, 0.0])
    assert float(squared_euclidean_distance(a, b)) == 10.0


def test_squared_euclidean_distance_vec_mat():
    # reference: src/linalg.rs:299-303
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 2.0]])
    np.testing.assert_array_equal(squared_euclidean_distance(a, b), [14.0, 10.0, 6.0])


def test_squared_euclidean_distance_mat_mat():
    # reference: src/linalg.rs:306-313
    a = jnp.array([[1.0, 2.0, 3.0], [3.0, 2.0, 1.0]])
    b = jnp.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 2.0]])
    np.testing.assert_array_equal(
        squared_euclidean_distance(a, b), [[14.0, 10.0, 6.0], [6.0, 10.0, 14.0]]
    )


def test_length_mismatch_raises():
    with pytest.raises(ValueError, match="different lengths"):
        squared_euclidean_distance(jnp.zeros(3), jnp.zeros(4))
    with pytest.raises(ValueError, match="matrix columns"):
        squared_euclidean_distance(jnp.zeros(3), jnp.zeros((2, 4)))
    with pytest.raises(ValueError, match="different numbers of columns"):
        squared_euclidean_distance(jnp.zeros((2, 3)), jnp.zeros((2, 4)))
