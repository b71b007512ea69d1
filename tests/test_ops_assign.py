"""Tests for the fused Pallas encode kernel.

Runs in Pallas interpreter mode on CPU; the einsum path in
``reductive_tpu.pq.primitives`` is the correctness oracle.  The kernel's
packed-key argmin coarsens distances by the low ``ceil(log2 k)`` mantissa
bits, so random-data tests assert *distance optimality* (the chosen
centroid is within a hair of the best) rather than bit-equal indices;
well-separated golden fixtures must match exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reductive_tpu.kmeans import cluster_assignments
from reductive_tpu.linalg import squared_euclidean_distance
from reductive_tpu.ops import assign_nearest, pq_encode
from reductive_tpu.pq import primitives


def chosen_distances(codebooks, x, codes):
    """Per-(row, subquantizer) squared distance of the chosen centroid."""
    m, k, ds = codebooks.shape
    xs = x.reshape(x.shape[0], m, ds)
    chosen = jnp.take_along_axis(
        codebooks[None], codes.astype(jnp.int32)[:, :, None, None], axis=2
    )[:, :, 0, :]
    return jnp.sum((xs - chosen) ** 2, axis=2)


@pytest.mark.parametrize("n,m,k,ds", [(64, 4, 16, 8), (100, 2, 8, 3), (257, 8, 32, 4)])
def test_pq_encode_near_optimal(n, m, k, ds):
    key = jax.random.PRNGKey(0)
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    codebooks = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)

    exact = primitives.quantize_batch(codebooks, x, dtype=jnp.int32)
    got = pq_encode(
        codebooks, x, block_n=64, dtype=jnp.int32,
        compute_dtype=jnp.float32, interpret=True,
    )
    d_exact = chosen_distances(codebooks, x, exact)
    d_got = chosen_distances(codebooks, x, got)
    # Chosen centroids must be optimal up to the key coarsening (2^-15 rel).
    np.testing.assert_allclose(d_got, d_exact, rtol=1e-3, atol=1e-5)
    # And the overwhelming majority of indices must agree outright.
    agree = float(jnp.mean((got == exact).astype(jnp.float32)))
    assert agree > 0.99, f"only {agree:.3f} of codes agree with the einsum path"


def test_pq_encode_partial_tile():
    # n not a multiple of block_n: padded columns must not corrupt output.
    key = jax.random.PRNGKey(1)
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (33, 8), dtype=jnp.float32)
    codebooks = jax.random.normal(kc, (2, 4, 4), dtype=jnp.float32)
    exact = primitives.quantize_batch(codebooks, x, dtype=jnp.int32)
    got = pq_encode(
        codebooks, x, block_n=32, dtype=jnp.int32,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_array_equal(got, exact)


def test_pq_encode_golden_codebook():
    # The reference's predefined-codebook truth table (src/pq/pq.rs:378-417):
    # distances are well separated, so codes must match exactly.
    codebooks = jnp.array(
        [
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            [[1.0, -1.0, 0.0], [0.0, 1.0, 0.0]],
        ],
        dtype=jnp.float32,
    )
    vectors = jnp.array(
        [
            [0.0, 2.0, 0.0, -0.5, 0.0, 0.0],
            [1.0, -0.2, 0.0, 0.5, 0.5, 0.0],
            [-0.2, 0.2, 0.0, 0.0, -2.0, 0.0],
            [1.0, 0.2, 0.0, 0.0, -2.0, 0.0],
        ],
        dtype=jnp.float32,
    )
    got = pq_encode(
        codebooks, vectors, block_n=8, dtype=jnp.int32,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_array_equal(got, [[1, 1], [0, 1], [1, 0], [0, 0]])


def test_pq_encode_tie_breaks_to_first_index():
    # Duplicate centroids (e.g. empty clusters that became zero vectors)
    # produce exact distance ties; the reference picks the first index
    # (src/kmeans.rs:119-125) and so must the kernel's packed key.
    codebooks = jnp.array([[[1.0, 1.0], [5.0, 5.0], [1.0, 1.0]]], jnp.float32)
    x = jnp.array([[1.0, 1.0], [0.9, 1.1]], jnp.float32)
    got = pq_encode(
        codebooks, x, block_n=8, dtype=jnp.int32,
        compute_dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_array_equal(got, [[0], [0]])


def test_assign_nearest_matches_kmeans_assign():
    key = jax.random.PRNGKey(2)
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (120, 16), dtype=jnp.float32)
    centroids = jax.random.normal(kc, (10, 16), dtype=jnp.float32)
    expected = cluster_assignments(centroids, x)
    got = assign_nearest(
        centroids, x, block_n=64, compute_dtype=jnp.float32, interpret=True
    )
    d_exact = squared_euclidean_distance(x, centroids)
    picked = jnp.take_along_axis(d_exact, got[:, None].astype(jnp.int32), axis=1)[:, 0]
    best = jnp.min(d_exact, axis=1)
    np.testing.assert_allclose(picked, best, rtol=1e-3, atol=1e-5)
    agree = float(jnp.mean((got == expected).astype(jnp.float32)))
    assert agree > 0.99


def test_pq_encode_narrow_dtype_rejected():
    codebooks = jnp.zeros((1, 257, 4), dtype=jnp.float32)
    with pytest.raises(OverflowError):
        pq_encode(codebooks, jnp.zeros((4, 4)), dtype=jnp.uint8, interpret=True)


def test_kernels_wide_codebook_k_gt_256():
    """k > 256 exercises >8 packed index bits and uint16 codes across all
    three kernels (encode / stats / decode)."""
    from reductive_tpu.ops import pq_assign_stats, pq_decode

    n, m, k, ds = 400, 2, 300, 4
    kx, kc = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)

    codes = pq_encode(cb, x, dtype=jnp.uint16, compute_dtype=jnp.float32, interpret=True)
    assert codes.dtype == jnp.uint16
    exact = primitives.quantize_batch(cb, x, dtype=jnp.int32)
    # near-optimality (packed-key coarsening): chosen centroid within a
    # hair of the best
    d_kernel = chosen_distances(cb, x, codes)
    d_exact = chosen_distances(cb, x, exact)
    assert float(jnp.max(d_kernel - d_exact)) < 1e-3

    sums, counts = pq_assign_stats(cb, x, interpret=True)
    assert float(jnp.sum(counts)) == n * m

    rec = pq_decode(cb, codes, splits=3, interpret=True)
    ref = primitives.reconstruct_batch(cb, codes.astype(jnp.int32), method="gather")
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(ref))

    # uint8 must be rejected for k > 256 (reference: primitives.rs:31-34)
    with pytest.raises(OverflowError):
        pq_encode(cb, x, dtype=jnp.uint8, interpret=True)



def test_pq_encode_verified_bit_exact_oracle():
    """pq_encode_verified equals the exact einsum oracle on EVERY code
    (the plain exact kernel only promises ~99.99% agreement)."""
    from reductive_tpu.ops import pq_encode_verified
    from reductive_tpu.pq import primitives

    key = jax.random.PRNGKey(31)
    kc, kx = jax.random.split(key)
    m, k, ds, n = 4, 16, 4, 3000
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    got = pq_encode_verified(cb, x, block_n=256, interpret=True)
    want = primitives.quantize_batch(cb, x, dtype=jnp.uint8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pq_encode_verified_exact_ties_first_index():
    """Duplicated centroids produce exact distance ties; the verified
    encode must flag them and resolve to the first index like the
    reference (src/kmeans.rs:149-156)."""
    from reductive_tpu.ops import pq_encode_verified
    from reductive_tpu.pq import primitives

    key = jax.random.PRNGKey(32)
    m, k, ds, n = 2, 8, 4, 500
    cb = np.array(jax.random.normal(key, (m, k, ds), dtype=jnp.float32))
    cb[:, 5] = cb[:, 2]  # exact duplicate -> ties must resolve to 2
    cb[:, 7] = cb[:, 0]
    cb = jnp.asarray(cb)
    x = cb[0, jnp.arange(n) % k] + 0.0  # rows exactly ON tied centroids
    x = jnp.concatenate([x, cb[1, jnp.arange(n) % k]], axis=1)
    got = np.asarray(pq_encode_verified(cb, x, block_n=128, interpret=True))
    want = np.asarray(primitives.quantize_batch(cb, x, dtype=jnp.uint8))
    np.testing.assert_array_equal(got, want)
    assert (got[:, 0] != 5).all() and (got[:, 0] != 7).all()


def test_pq_encode_verified_overflow_fallback():
    """cap_frac ~ 0 forces the flagged count over the cap: the chunked
    full-einsum fallback must still return the bit-exact result."""
    from reductive_tpu.ops import pq_encode_verified
    from reductive_tpu.pq import primitives

    key = jax.random.PRNGKey(33)
    kc, kx = jax.random.split(key)
    m, k, ds, n = 2, 8, 4, 400
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    # Near-coincident rows on centroids: high flag rate.
    x = jnp.tile(cb[0, :2].reshape(-1), (n, m // 1))[:, : m * ds] * 1.0
    x = x + 1e-6 * jax.random.normal(kx, x.shape)
    got = pq_encode_verified(cb, x, block_n=128, cap_frac=1e-9, interpret=True)
    want = primitives.quantize_batch(cb, x, dtype=jnp.uint8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
