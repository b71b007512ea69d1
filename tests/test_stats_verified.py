"""pq_assign_stats_verified: assignment-exact fused statistics.

The plain exact stats kernel promises ~99.99% oracle agreement on
assignments; the verified mode must match the exact einsum oracle's cell
memberships on EVERY row (first-index tie-breaks included), with sums
equal up to f32 accumulation order.
"""

import numpy as np

import jax
import jax.numpy as jnp

from reductive_tpu.ops import pq_assign_stats_verified
from reductive_tpu.pq import primitives


def oracle_stats(cb, x):
    """Exact einsum assignments + f64 one-hot statistics."""
    m, k, ds = cb.shape
    codes = np.asarray(primitives.quantize_batch(cb, x, dtype=jnp.int32))
    xs = np.asarray(x, np.float64).reshape(len(x), m, ds)
    sums = np.zeros((m, k, ds))
    counts = np.zeros((m, k))
    for j in range(m):
        np.add.at(sums[j], codes[:, j], xs[:, j])
        np.add.at(counts[j], codes[:, j], 1.0)
    return sums, counts


def check(cb, x, **kw):
    sums, counts = pq_assign_stats_verified(cb, x, interpret=True, **kw)
    osums, ocounts = oracle_stats(cb, x)
    np.testing.assert_array_equal(np.asarray(counts), ocounts)
    np.testing.assert_allclose(
        np.asarray(sums), osums, rtol=1e-5, atol=1e-5
    )


def test_matches_oracle_on_gaussian_data():
    key = jax.random.PRNGKey(41)
    kc, kx = jax.random.split(key)
    m, k, ds, n = 4, 16, 4, 3000
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    check(cb, x)


def test_matches_oracle_with_exact_ties():
    """Duplicated centroids + rows exactly on them: every tie must land in
    the first-index cell, exactly as the reference scatter-add would
    (src/kmeans.rs:149-156,181-197)."""
    key = jax.random.PRNGKey(42)
    m, k, ds, n = 2, 8, 4, 640
    cb = np.array(jax.random.normal(key, (m, k, ds), dtype=jnp.float32))
    cb[:, 5] = cb[:, 2]
    cb[:, 7] = cb[:, 0]
    cb = jnp.asarray(cb)
    x = jnp.concatenate(
        [cb[0, jnp.arange(n) % k], cb[1, jnp.arange(n) % k]], axis=1
    )
    sums, counts = pq_assign_stats_verified(cb, x, interpret=True)
    # Tied duplicate cells must be empty (first index wins).
    counts = np.asarray(counts)
    assert counts[0, 5] == 0 and counts[0, 7] == 0
    assert counts[1, 5] == 0 and counts[1, 7] == 0
    check(cb, x)


def test_matches_oracle_on_near_tie_grid():
    """Integer-grid data maximizes exact and near ties across cells."""
    key = jax.random.PRNGKey(43)
    kc, kx = jax.random.split(key)
    m, k, ds, n = 2, 8, 4, 1500
    cb = jnp.round(
        2.0 * jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    ) / 2.0
    x = jnp.round(
        2.0 * jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    ) / 2.0
    check(cb, x)


def test_fallback_einsum_stats_chunked_padding():
    """The any-flag-rate fallback pass handles odd n / padded chunks."""
    from reductive_tpu.ops.stats import _einsum_stats_chunked

    kc, kx = jax.random.split(jax.random.PRNGKey(5))
    m, k, ds, n = 3, 9, 2, 777
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    s, c = _einsum_stats_chunked(cb, x, chunk=256)
    so, co = oracle_stats(cb, x)
    np.testing.assert_array_equal(np.asarray(c), co)
    np.testing.assert_allclose(np.asarray(s), so, rtol=1e-5, atol=1e-5)


def test_matches_oracle_wide_codebook():
    """k > 256 exercises >8 packed index bits through the verified path."""
    key = jax.random.PRNGKey(46)
    kc, kx = jax.random.split(key)
    m, k, ds, n = 2, 300, 4, 700
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    check(cb, x)


def test_streamed_trainer_verified_cpu():
    """compute_dtype='verified' flows through the >HBM streamed trainer
    (virtual-corpus source, einsum fallback off-TPU)."""
    from reductive_tpu import SyntheticReader, train_pq_streamed

    r = SyntheticReader(1200, 12, seed=9)
    pq_v = train_pq_streamed(
        jax.random.PRNGKey(3), r, 3, 4, 4, batch_size=512,
        compute_dtype="verified",
    )
    pq_e = train_pq_streamed(
        jax.random.PRNGKey(3), r, 3, 4, 4, batch_size=512,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(pq_v.codebooks), np.asarray(pq_e.codebooks),
        rtol=1e-6, atol=1e-6,
    )


def test_opq_trainer_verified_cpu():
    """compute_dtype='verified' flows through the chunked OPQ trainer."""
    from reductive_tpu import train_opq_chunked

    key = jax.random.PRNGKey(45)
    kx, kt = jax.random.split(key)
    x = jax.random.uniform(kx, (256, 20), dtype=jnp.float32)
    pq_v = train_opq_chunked(kt, x, 4, 4, 4, chunk=128,
                             compute_dtype="verified")
    pq_e = train_opq_chunked(kt, x, 4, 4, 4, chunk=128,
                             compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(pq_v.codebooks), np.asarray(pq_e.codebooks),
        rtol=1e-6, atol=1e-6,
    )


def test_trainer_composition_cpu():
    """compute_dtype='verified' flows through train_pq_chunked (einsum
    fallback off-TPU) and trains to the same quality as exact f32."""
    from reductive_tpu import train_pq_chunked

    key = jax.random.PRNGKey(44)
    kx, kt = jax.random.split(key)
    x = jax.random.uniform(kx, (512, 16), dtype=jnp.float32)
    pq_v = train_pq_chunked(kt, x, 4, 4, 5, chunk=256,
                            compute_dtype="verified")
    pq_e = train_pq_chunked(kt, x, 4, 4, 5, chunk=256,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(pq_v.codebooks), np.asarray(pq_e.codebooks),
        rtol=1e-6, atol=1e-6,
    )
