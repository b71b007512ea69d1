"""Host-streamed (>HBM) training: parity with the in-HBM chunked trainers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reductive_tpu import io as rio
from reductive_tpu import (
    train_gaussian_opq_chunked,
    train_gaussian_opq_streamed,
    train_opq_chunked,
    train_opq_streamed,
    train_pq_chunked,
    train_pq_streamed,
)
from reductive_tpu.native import VecsReader, write_fvecs
from reductive_tpu.pq.streamed import streamed_covariance


def make_corpus(tmp_path, key=0, n=2000, d=16):
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(key), (n, d), jnp.float32)
    )
    path = str(tmp_path / "corpus.fvecs")
    write_fvecs(path, x)
    return x, path


def avg_loss(pq, x) -> float:
    rec = pq.reconstruct_batch(pq.quantize_batch(x))
    return float(jnp.mean(jnp.sum((jnp.asarray(x) - rec) ** 2, axis=1)))


def test_streamed_matches_chunked_bitwise(tmp_path):
    """Same key, batch_size == chunk: the disk-streamed trainer reproduces
    the in-HBM chunked trainer exactly (identical initial draws,
    assignment arithmetic, and accumulation order)."""
    x, path = make_corpus(tmp_path)
    key = jax.random.PRNGKey(3)
    pq_c = train_pq_chunked(key, jnp.asarray(x), 4, 3, 5, chunk=512,
                            use_kernel=False)
    with VecsReader(path) as reader:
        pq_s = train_pq_streamed(key, reader, 4, 3, 5, batch_size=512,
                                 use_kernel=False)
    np.testing.assert_array_equal(
        np.asarray(pq_s.codebooks), np.asarray(pq_c.codebooks)
    )


def test_streamed_best_of_attempts(tmp_path):
    x, path = make_corpus(tmp_path, key=1, n=1500)
    key = jax.random.PRNGKey(7)
    pq_c = train_pq_chunked(key, jnp.asarray(x), 2, 4, 4, n_attempts=3,
                            chunk=500, use_kernel=False)
    with VecsReader(path) as reader:
        pq_s = train_pq_streamed(key, reader, 2, 4, 4, n_attempts=3,
                                 batch_size=500, use_kernel=False)
    np.testing.assert_array_equal(
        np.asarray(pq_s.codebooks), np.asarray(pq_c.codebooks)
    )


def test_streamed_covariance_matches_inmemory(tmp_path):
    from reductive_tpu.linalg import covariance

    x, path = make_corpus(tmp_path, key=2, n=800, d=12)
    with VecsReader(path) as reader:
        cov_s = streamed_covariance(reader, batch_size=256)
    cov = covariance(jnp.asarray(x), 0)
    np.testing.assert_allclose(
        np.asarray(cov_s), np.asarray(cov), rtol=1e-4, atol=1e-5
    )


def test_streamed_gaussian_opq(tmp_path):
    """Streamed GaussianOpq: orthonormal projection, objective on par with
    the in-HBM chunked variant (covariance comes from the moment form, so
    bitwise equality is not expected)."""
    x, path = make_corpus(tmp_path, key=4, n=1200, d=16)
    key = jax.random.PRNGKey(11)
    with VecsReader(path) as reader:
        pq_s = train_gaussian_opq_streamed(key, reader, 4, 3, 5,
                                           batch_size=400, use_kernel=False)
    assert pq_s.projection is not None
    R = np.asarray(pq_s.projection, np.float64)
    assert np.max(np.abs(R.T @ R - np.eye(16))) < 1e-3
    pq_c = train_gaussian_opq_chunked(key, jnp.asarray(x), 4, 3, 5,
                                      chunk=400, use_kernel=False)
    l_s, l_c = avg_loss(pq_s, x), avg_loss(pq_c, x)
    assert abs(l_s - l_c) <= 0.05 * l_c, (l_s, l_c)


def test_streamed_opq(tmp_path):
    """Streamed non-parametric OPQ: orthonormal projection and an
    objective on par with the in-HBM chunked alternation."""
    x, path = make_corpus(tmp_path, key=5, n=1200, d=16)
    key = jax.random.PRNGKey(13)
    with VecsReader(path) as reader:
        pq_s = train_opq_streamed(key, reader, 4, 3, 4, batch_size=400,
                                  use_kernel=False)
    R = np.asarray(pq_s.projection, np.float64)
    assert np.max(np.abs(R.T @ R - np.eye(16))) < 1e-3
    pq_c = train_opq_chunked(key, jnp.asarray(x), 4, 3, 4, chunk=400,
                             use_kernel=False)
    l_s, l_c = avg_loss(pq_s, x), avg_loss(pq_c, x)
    assert abs(l_s - l_c) <= 0.05 * l_c, (l_s, l_c)


def test_streamed_checkpoint_resume(tmp_path):
    """Checkpoint after 2 of 4 iterations, resume from the artifact: the
    final model equals the uninterrupted 4-iteration run."""
    x, path = make_corpus(tmp_path, key=6, n=1000)
    key = jax.random.PRNGKey(17)
    ckpt = str(tmp_path / "ckpt.npz")
    with VecsReader(path) as reader:
        full = train_pq_streamed(key, reader, 4, 3, 4, batch_size=300,
                                 use_kernel=False)
        train_pq_streamed(key, reader, 4, 3, 2, batch_size=300,
                          use_kernel=False, checkpoint_every=2,
                          checkpoint_path=ckpt)
        resumed = train_pq_streamed(key, reader, 4, 3, 2, batch_size=300,
                                    use_kernel=False,
                                    initial_model=rio.load(ckpt))
    np.testing.assert_allclose(
        np.asarray(resumed.codebooks), np.asarray(full.codebooks),
        rtol=1e-6, atol=1e-7,
    )


def test_streamed_validation_errors(tmp_path):
    x, path = make_corpus(tmp_path, key=8, n=100)
    with VecsReader(path) as reader:
        with pytest.raises(Exception, match="[Ss]ubquantizer"):
            train_pq_streamed(jax.random.PRNGKey(0), reader, 3, 3, 2,
                              use_kernel=False)  # 16 % 3 != 0
        with pytest.raises(ValueError, match="checkpoint_path"):
            train_pq_streamed(jax.random.PRNGKey(0), reader, 4, 3, 2,
                              use_kernel=False, checkpoint_every=1)
        with pytest.raises(ValueError, match="n_attempts=1"):
            train_pq_streamed(jax.random.PRNGKey(0), reader, 4, 3, 2,
                              n_attempts=2, use_kernel=False,
                              initial_model=train_pq_chunked(
                                  jax.random.PRNGKey(0), jnp.asarray(x),
                                  4, 3, 1, use_kernel=False))


def test_streamed_transfer_dtype_bf16(tmp_path):
    """bf16 wire transfer: the trainer still converges (assignments from
    cast values, f32 statistics) and the objective stays close to f32."""
    x, path = make_corpus(tmp_path, key=9, n=1000)
    key = jax.random.PRNGKey(19)
    with VecsReader(path) as reader:
        pq32 = train_pq_streamed(key, reader, 4, 3, 4, batch_size=300,
                                 use_kernel=False)
        pqbf = train_pq_streamed(key, reader, 4, 3, 4, batch_size=300,
                                 use_kernel=False,
                                 transfer_dtype=jnp.bfloat16)
    l32, lbf = avg_loss(pq32, x), avg_loss(pqbf, x)
    assert abs(l32 - lbf) <= 0.05 * l32, (l32, lbf)


def test_streamed_sharded_matches_single_host(tmp_path):
    """Multi-host streamed composition (SURVEY §7 step 7): each mesh-data
    shard streams its n/H reader slice, statistics psum once per
    iteration.  Same keys => same initial draws as the single-host
    streamed trainer; results match up to f32 partial-sum grouping."""
    from reductive_tpu.parallel import make_mesh, train_pq_streamed_sharded

    x, path = make_corpus(tmp_path, key=5, n=2048, d=16)
    key = jax.random.PRNGKey(11)
    mesh = make_mesh()  # 8 virtual CPU devices
    with VecsReader(path) as reader:
        pq_1h = train_pq_streamed(key, reader, 4, 3, 5, batch_size=256,
                                  use_kernel=False)
        pq_mh = train_pq_streamed_sharded(key, reader, 4, 3, 5,
                                          mesh=mesh, batch_size=128,
                                          use_kernel=False)
        # Ragged shard split is rejected loudly.
        with pytest.raises(ValueError, match="divide evenly"):
            train_pq_streamed_sharded(key, reader, 4, 3, 1, mesh=mesh,
                                      batch_size=128, use_kernel=False,
                                      stop=2041)
    np.testing.assert_allclose(
        np.asarray(pq_mh.codebooks), np.asarray(pq_1h.codebooks), atol=1e-5
    )
    # Quality gate on the original corpus.
    assert avg_loss(pq_mh, x) <= avg_loss(pq_1h, x) * 1.05


def test_streamed_sharded_best_of_attempts(tmp_path):
    from reductive_tpu.parallel import make_mesh, train_pq_streamed_sharded

    x, path = make_corpus(tmp_path, key=6, n=1024, d=16)
    key = jax.random.PRNGKey(13)
    mesh = make_mesh()
    with VecsReader(path) as reader:
        pq_1h = train_pq_streamed(key, reader, 2, 4, 4, n_attempts=3,
                                  batch_size=128, use_kernel=False)
        pq_mh = train_pq_streamed_sharded(key, reader, 2, 4, 4,
                                          n_attempts=3, mesh=mesh,
                                          batch_size=128, use_kernel=False)
    np.testing.assert_allclose(
        np.asarray(pq_mh.codebooks), np.asarray(pq_1h.codebooks), atol=1e-5
    )


def test_stream_encode_sharded_bit_equal(tmp_path):
    """Sharded streamed encode: bit-equal to the single-host stream (and
    to the in-memory batch encode) at any shard count."""
    from reductive_tpu.data import stream_encode
    from reductive_tpu.parallel import make_mesh, stream_encode_sharded

    x, path = make_corpus(tmp_path, key=7, n=1024, d=16)
    key = jax.random.PRNGKey(17)
    pq = train_pq_chunked(key, jnp.asarray(x), 4, 3, 4, chunk=256,
                          use_kernel=False)
    mesh = make_mesh()
    with VecsReader(path) as reader:
        codes_1h = stream_encode(pq, reader, batch_size=256,
                                 use_kernel=False)
        codes_mh = stream_encode_sharded(pq, reader, mesh=mesh,
                                         batch_size=64, use_kernel=False)
    np.testing.assert_array_equal(codes_mh, codes_1h)
    np.testing.assert_array_equal(
        codes_mh, np.asarray(pq.quantize_batch(jnp.asarray(x)))
    )
