"""Tests for the fused Pallas decode kernel (interpreter mode on CPU).

The gather path is the correctness oracle.  ``splits=3`` must be
bit-exact: the one-hot side is exact in bfloat16 and each output element
receives exactly one nonzero product, so the three bf16 components of the
codebook reconstruct its f32 entries exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reductive_tpu.ops.decode import pq_decode, split_codebook_bf16
from reductive_tpu.pq import primitives
from reductive_tpu.pq.model import Pq


@pytest.mark.parametrize("n,m,k,ds", [(500, 4, 8, 4), (1000, 16, 256, 8), (257, 2, 3, 5)])
def test_decode_kernel_bit_exact(n, m, k, ds):
    kc, kx = jax.random.split(jax.random.PRNGKey(m))
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.int32)

    exact = primitives.reconstruct_batch(cb, codes, method="gather")
    got = pq_decode(cb, codes, splits=3, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_decode_kernel_fast_mode_bf16_error():
    m, k, ds, n = 8, 64, 4, 500
    kc, kx = jax.random.split(jax.random.PRNGKey(0))
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)

    exact = primitives.reconstruct_batch(cb, codes, method="gather")
    fast = pq_decode(cb, codes, splits=1, interpret=True)
    # Single-split = codebook rounded to bfloat16: ~2^-9 relative.
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), rtol=5e-3, atol=5e-3)


def test_split_codebook_reconstructs_f32():
    cb = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 4), dtype=jnp.float32)
    W = split_codebook_bf16(cb, kp=8, splits=3)
    total = jnp.sum(W.astype(jnp.float32), axis=0)
    # Block-diagonal entries equal the original codebooks exactly.
    for j in range(3):
        np.testing.assert_array_equal(
            np.asarray(total[j * 8 : j * 8 + 5, j * 4 : (j + 1) * 4]),
            np.asarray(cb[j]),
        )


def test_model_reconstruct_method_kernel():
    m, k, ds, n = 4, 16, 8, 100
    kc, kx, kp_ = jax.random.split(jax.random.PRNGKey(2), 3)
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)
    # Orthonormal projection via QR.
    q, _ = jnp.linalg.qr(jax.random.normal(kp_, (m * ds, m * ds)))
    pq = Pq(codebooks=cb, projection=q.astype(jnp.float32))

    ref = pq.reconstruct_batch(codes)
    # interpret-mode kernel on CPU via the primitive directly + projection
    from reductive_tpu.ops.decode import pq_decode as dk

    got = dk(cb, codes, splits=3, interpret=True) @ pq.projection.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_decode_kernel_int8_mode():
    """Weight-only int8 decode: per-column symmetric quantization keeps
    relative error at the bf16-single-pass level (~2^-8)."""
    m, k, ds, n = 8, 64, 4, 600
    kc, kx = jax.random.split(jax.random.PRNGKey(3))
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)

    exact = primitives.reconstruct_batch(cb, codes, method="gather")
    got = pq_decode(cb, codes, splits="int8", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=2e-2, atol=2e-2)
    # error comparable to the bf16 single-split path
    fast = pq_decode(cb, codes, splits=1, interpret=True)
    err_int8 = float(jnp.max(jnp.abs(got - exact)))
    err_bf16 = float(jnp.max(jnp.abs(fast - exact)))
    assert err_int8 < 3 * err_bf16


def test_decode_kernel_packed_u4():
    """Packed-u4 decode equals unpacked decode exactly (same weights,
    permuted row blocks; only the code layout differs) — for the bit-exact
    3-split, the bf16 fast path, and the int8 mode."""
    from reductive_tpu.ops import pack_u4_codes
    from reductive_tpu.ops.decode import pq_decode

    m, k, ds, n = 8, 16, 4, 300
    kc, kx = jax.random.split(jax.random.PRNGKey(4))
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)
    packed = pack_u4_codes(codes)

    for splits in (3, 1, "int8"):
        ref = pq_decode(cb, codes, splits=splits, interpret=True)
        got = pq_decode(cb, packed, splits=splits, packed=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    import pytest

    with pytest.raises(ValueError, match="k <= 16"):
        big = jax.random.normal(kc, (2, 32, 4), dtype=jnp.float32)
        pq_decode(big, jnp.zeros((4, 1), jnp.uint8), packed=True, interpret=True)


@pytest.mark.parametrize("m,kp", [(4, 128), (16, 256), (2, 256)])
def test_multihot_constructions_agree_wide(m, kp):
    # The broadcast construction is exact up to kp=256 (code values are
    # integers < 256, exactly representable in bfloat16); it must match
    # the concat construction bit-for-bit so either can serve kp >= 128.
    from reductive_tpu.ops.decode import _multihot_broadcast, _multihot_concat

    codes = jax.random.randint(jax.random.PRNGKey(kp + m), (137, m), 0, kp)
    codes = codes.astype(jnp.int32)
    a = _multihot_concat(codes, m, kp, jnp.float32)
    b = _multihot_broadcast(codes, m, kp, jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Each row block carries exactly one 1 per segment.
    assert np.all(np.asarray(jnp.sum(b, axis=1)) == m)
