"""SyntheticReader: the device-resident virtual corpus source.

Checks the reader-protocol contract (read / read_rows / batches mutual
consistency) and that the streaming consumers — encode and the >HBM
streamed trainer — produce identical results from the virtual corpus and
from the same rows materialized up front.
"""

import numpy as np

import jax
import jax.numpy as jnp

from reductive_tpu import SyntheticReader, train_pq, train_pq_streamed
from reductive_tpu.data import stream_encode


def test_rows_are_pure_functions_of_index():
    r = SyntheticReader(100, 8, seed=3)
    a = np.asarray(r.read(10, 5))
    b = np.asarray(r.read_rows(np.array([10, 11, 12, 13, 14])))
    np.testing.assert_array_equal(a, b)
    # Re-reading (any order) reproduces the same values.
    c = np.asarray(r.read_rows(np.array([14, 10, 12])))
    np.testing.assert_array_equal(c, a[[4, 0, 2]])
    # A distinct seed is a distinct corpus.
    r2 = SyntheticReader(100, 8, seed=4)
    assert not np.array_equal(np.asarray(r2.read(10, 5)), a)


def test_batches_match_read_and_handle_tail():
    r = SyntheticReader(70, 6, seed=1)
    got = list(r.batches(32))
    assert [off for off, _ in got] == [0, 32, 64]
    assert [b.shape[0] for _, b in got] == [32, 32, 6]
    full = np.concatenate([np.asarray(b) for _, b in got])
    np.testing.assert_array_equal(full, np.asarray(r.read(0, 70)))
    # start/stop window
    win = list(r.batches(32, start=10, stop=50))
    winful = np.concatenate([np.asarray(b) for _, b in win])
    np.testing.assert_array_equal(winful, full[10:50])


def test_distribution_is_clustered():
    r = SyntheticReader(4096, 16, seed=0, n_centers=8, center_scale=4.0)
    x = np.asarray(r.read(0, 4096))
    # Mixture of 8 well-separated Gaussians: overall variance far exceeds
    # the unit within-cluster noise.
    assert x.var() > 2.0
    assert np.isfinite(x).all()


def test_stream_encode_from_virtual_corpus():
    r = SyntheticReader(600, 16, seed=2)
    x = np.asarray(r.read(0, 600))
    pq = train_pq(jax.random.PRNGKey(0), jnp.asarray(x), 4, 4, 5)
    codes_stream = stream_encode(pq, r, batch_size=256, use_kernel=False)
    codes_direct = np.asarray(pq.quantize_batch(jnp.asarray(x)))
    np.testing.assert_array_equal(codes_stream, codes_direct)


def test_resumable_encode_fingerprints_virtual_content(tmp_path):
    """A same-shape virtual corpus with a different seed must invalidate
    the resume sidecar (the fingerprint probes row content, not just
    size)."""
    from reductive_tpu.data import stream_encode_resumable

    out = str(tmp_path / "codes.u8")
    r1 = SyntheticReader(600, 16, seed=2)
    x1 = np.asarray(r1.read(0, 600))
    pq = train_pq(jax.random.PRNGKey(0), jnp.asarray(x1), 4, 4, 5)
    c1 = np.array(stream_encode_resumable(
        pq, r1, out, batch_size=256, use_kernel=False))
    r2 = SyntheticReader(600, 16, seed=3)
    c2 = np.array(stream_encode_resumable(
        pq, r2, out, batch_size=256, use_kernel=False))
    want2 = np.asarray(pq.quantize_batch(jnp.asarray(np.asarray(r2.read(0, 600)))))
    np.testing.assert_array_equal(c2, want2)
    assert not np.array_equal(c1, c2)


def test_streamed_training_from_virtual_corpus():
    r = SyntheticReader(1500, 12, seed=5)
    x = jnp.asarray(np.asarray(r.read(0, 1500)))
    key = jax.random.PRNGKey(7)
    pq_stream = train_pq_streamed(
        key, r, 3, 4, 4, batch_size=512, use_kernel=False
    )
    rec = pq_stream.reconstruct_batch(pq_stream.quantize_batch(x))
    base = float(jnp.mean(jnp.sum(x**2, axis=1)))
    err = float(jnp.mean(jnp.sum((x - rec) ** 2, axis=1)))
    assert err < 0.7 * base  # trained: reconstructions explain the data
