"""Tests for ADC search: tables/scores against brute-force reconstruction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reductive_tpu import Pq, train_pq
from reductive_tpu.search import adc_scores, adc_tables, search


def make_pq(key, m=4, k=16, ds=4, projection=False):
    kc, kp = jax.random.split(key)
    cb = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)
    proj = None
    if projection:
        # Random orthonormal projection via QR.
        a = jax.random.normal(kp, (m * ds, m * ds), dtype=jnp.float32)
        proj, _ = jnp.linalg.qr(a)
    return Pq(codebooks=cb, projection=proj)


@pytest.mark.parametrize("projection", [False, True])
def test_adc_matches_bruteforce(projection):
    key = jax.random.PRNGKey(0)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, projection=projection)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (200, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (7, d), dtype=jnp.float32)

    codes = pq.quantize_batch(db, dtype=jnp.uint8)
    tables = adc_tables(pq, queries)
    scores = adc_scores(tables, codes)

    # Brute force: squared distance to the reconstructions (ADC distance is
    # exactly |q - reconstruct(code)|^2 because projections are orthonormal).
    rec = pq.reconstruct_batch(codes)
    expected = jnp.sum((queries[:, None, :] - rec[None, :, :]) ** 2, axis=2)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(expected), atol=1e-3)


def test_adc_scores_chunked_equals_unchunked():
    key = jax.random.PRNGKey(1)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (1000, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (3, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)
    tables = adc_tables(pq, queries)
    full = adc_scores(tables, codes, chunk_size=2048)
    chunked = adc_scores(tables, codes, chunk_size=128)  # 1000 = 7*128 + 104
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-4)


def test_search_topk():
    key = jax.random.PRNGKey(2)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (500, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)
    queries = db[:5] + 0.01  # near-duplicates of known rows

    dists, idx = search(pq, queries, codes, top_k=3)
    assert dists.shape == (5, 3)
    # Ascending order per row.
    assert bool(jnp.all(dists[:, 0] <= dists[:, 1]))
    # The near-duplicate query should rank a vector with the same code first.
    top_codes = jnp.take(codes.astype(jnp.int32), idx[:, 0], axis=0)
    query_codes = pq.quantize_batch(queries, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(top_codes), np.asarray(query_codes))


def test_search_recall_against_exact():
    # Statistical gate: ADC top-1 should usually contain the true nearest
    # neighbor's code region for a trained quantizer.
    key = jax.random.PRNGKey(3)
    kd, kq, kt = jax.random.split(key, 3)
    db = jax.random.normal(kd, (2000, 16), dtype=jnp.float32)
    queries = jax.random.normal(kq, (50, 16), dtype=jnp.float32)
    pq = train_pq(kt, db, 4, 5, 8, 1)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)

    _, idx = search(pq, queries, codes, top_k=10)
    exact = jnp.argmin(
        jnp.sum((queries[:, None, :] - db[None, :, :]) ** 2, axis=2), axis=1
    )
    recall = float(jnp.mean(jnp.any(idx == exact[:, None], axis=1)))
    assert recall > 0.6, f"ADC top-10 recall {recall} too low"


def test_search_validation():
    pq = make_pq(jax.random.PRNGKey(0))
    codes = jnp.zeros((10, 4), dtype=jnp.uint8)
    q = jnp.zeros((1, 16), dtype=jnp.float32)
    with pytest.raises(ValueError, match="top_k"):
        search(pq, q, codes, top_k=0)
    with pytest.raises(ValueError, match="exceeds corpus"):
        search(pq, q, codes, top_k=11)
    with pytest.raises(ValueError, match="does not match"):
        adc_tables(pq, jnp.zeros((1, 8)))


def test_adc_kernel_matches_einsum_scores():
    """The fused multi-hot ADC kernel matches the einsum scorer: splits=3
    to f32 summation order; splits=2 within ~2^-18 table error."""
    from reductive_tpu.ops.adc import adc_scores_kernel

    m, k, ds, n, nq = 8, 32, 4, 700, 7
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(5), 3)
    pq = Pq(codebooks=jax.random.normal(kc, (m, k, ds), dtype=jnp.float32))
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)
    queries = jax.random.normal(kq, (nq, m * ds), dtype=jnp.float32)

    tables = adc_tables(pq, queries)
    ref = adc_scores(tables, codes, chunk_size=256)
    got = adc_scores_kernel(tables, codes, splits=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)
    got2 = adc_scores_kernel(tables, codes, splits=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), rtol=1e-4, atol=1e-2)


def test_search_kernel_method_same_topk():
    """search(method='kernel') returns the same neighbors as the einsum
    path on well-separated data."""
    m, k, ds, n, nq = 4, 16, 8, 500, 5
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(6), 3)
    pq = Pq(codebooks=jax.random.normal(kc, (m, k, ds), dtype=jnp.float32))
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    codes = pq.quantize_batch(x)
    queries = jax.random.normal(kq, (nq, m * ds), dtype=jnp.float32)

    # interpret-mode kernel on CPU: call the scorer directly + top_k
    from reductive_tpu.ops.adc import adc_scores_kernel

    tables = adc_tables(pq, queries)
    scores_k = adc_scores_kernel(tables, codes, splits=3, interpret=True)
    d_ref, i_ref = search(pq, queries, codes, top_k=5)
    neg, idx = jax.lax.top_k(-scores_k, 5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(-neg), np.asarray(d_ref), rtol=1e-5, atol=1e-4)


def test_search_kernel_auto_batches_large_query_sets():
    """method='kernel' transparently batches query sets beyond the VMEM
    cap; results match the einsum path per query."""
    m, k, ds, n, nq = 2, 8, 4, 300, 300
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(8), 3)
    pq = Pq(codebooks=jax.random.normal(kc, (m, k, ds), dtype=jnp.float32))
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    codes = pq.quantize_batch(x)
    queries = jax.random.normal(kq, (nq, m * ds), dtype=jnp.float32)

    import unittest.mock as mock
    from reductive_tpu.ops.adc import adc_scores_kernel
    from reductive_tpu.search import adc_scores

    # On CPU, reroute the kernel scorer to the einsum scorer (interpret
    # mode is too slow for 2x300 queries); the point under test is the
    # host-side query batching in search().
    from reductive_tpu.search import _search_jit

    try:
        with mock.patch(
            "reductive_tpu.ops.adc.adc_scores_kernel",
            lambda tables, codes, splits, **kw: adc_scores(
                tables, codes, chunk_size=128
            ),
        ):
            d_k, i_k = search(pq, queries, codes, top_k=5, method="kernel")
    finally:
        # The mocked scorer was traced into the jit cache for
        # method="kernel"; drop it so later calls get the real kernel.
        _search_jit.clear_cache()
    d_e, i_e = search(pq, queries, codes, top_k=5)
    np.testing.assert_array_equal(np.asarray(i_k), np.asarray(i_e))
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_e), rtol=1e-5)


def test_search_streamed_matches_full():
    """stream_chunk search (running top-k carry, no (nq, n) score matrix)
    returns exactly the full-matrix results, including the tail chunk."""
    m, k, ds, n, nq = 4, 16, 4, 1111, 6
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(12), 3)
    pq = Pq(codebooks=jax.random.normal(kc, (m, k, ds), dtype=jnp.float32))
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    codes = pq.quantize_batch(x)
    queries = jax.random.normal(kq, (nq, m * ds), dtype=jnp.float32)

    d_full, i_full = search(pq, queries, codes, top_k=7)
    d_str, i_str = search(pq, queries, codes, top_k=7, stream_chunk=256)
    np.testing.assert_array_equal(np.asarray(i_str), np.asarray(i_full))
    np.testing.assert_allclose(np.asarray(d_str), np.asarray(d_full), rtol=1e-6)


def test_adc_kernel_int8_mode():
    """8-bit-LUT ADC (per-query symmetric table quantization): scores
    within ~1% and near-identical rankings."""
    from reductive_tpu.ops.adc import adc_scores_kernel

    m, k, ds, n, nq = 8, 32, 4, 700, 7
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(5), 3)
    pq = Pq(codebooks=jax.random.normal(kc, (m, k, ds), dtype=jnp.float32))
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)
    queries = jax.random.normal(kq, (nq, m * ds), dtype=jnp.float32)

    tables = adc_tables(pq, queries)
    ref = adc_scores(tables, codes, chunk_size=256)
    got = adc_scores_kernel(tables, codes, splits="int8", interpret=True)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.02
    _, i_ref = jax.lax.top_k(-ref, 5)
    _, i_got = jax.lax.top_k(-got, 5)
    overlap = np.mean([
        len(set(np.asarray(i_ref[q]).tolist()) & set(np.asarray(i_got[q]).tolist())) / 5
        for q in range(nq)
    ])
    assert overlap > 0.85


def test_search_auto_streams_large_corpora(monkeypatch):
    """A default-args search over a corpus whose (nq, n) score matrix
    would be huge must auto-route to the streamed scorer — and return the
    same results as the dense path."""
    from reductive_tpu import search as search_mod

    assert search_mod._resolve_stream_chunk(16, 1000, None) is None
    assert (
        search_mod._resolve_stream_chunk(16, 10_000_000, None)
        == search_mod._DEFAULT_STREAM_CHUNK
    )
    assert search_mod._resolve_stream_chunk(16, 10_000_000, 4096) == 4096
    # The auto chunk never exceeds the corpus itself.
    monkeypatch.setattr(search_mod, "_STREAM_SCORE_ELEMS", 1000)
    assert search_mod._resolve_stream_chunk(16, 2000, None) == 2000

    m, k, ds, n, nq = 4, 16, 3, 3000, 5
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(2), 3)
    pq = Pq(codebooks=jax.random.normal(kc, (m, k, ds), dtype=jnp.float32))
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)
    queries = jax.random.normal(kq, (nq, m * ds), dtype=jnp.float32)

    d_dense, i_dense = search_mod.search(pq, queries, codes, top_k=7)
    # Tiny threshold: the same call now auto-streams in 512-row chunks.
    monkeypatch.setattr(search_mod, "_STREAM_SCORE_ELEMS", 64)
    monkeypatch.setattr(search_mod, "_DEFAULT_STREAM_CHUNK", 512)
    d_auto, i_auto = search_mod.search(pq, queries, codes, top_k=7)
    np.testing.assert_array_equal(np.asarray(i_dense), np.asarray(i_auto))
    np.testing.assert_allclose(
        np.asarray(d_dense), np.asarray(d_auto), rtol=1e-5, atol=1e-5
    )


def test_packed_u4_roundtrip_and_native_layout():
    """Device pack/unpack round-trips and matches the native pack_u4 byte
    layout (even code in the low nibble)."""
    from reductive_tpu import native
    from reductive_tpu.ops import pack_u4_codes, unpack_u4_codes

    codes = jax.random.randint(jax.random.PRNGKey(0), (37, 8), 0, 16).astype(jnp.uint8)
    packed = pack_u4_codes(codes)
    assert packed.shape == (37, 4)
    np.testing.assert_array_equal(
        np.asarray(unpack_u4_codes(packed)), np.asarray(codes)
    )
    np.testing.assert_array_equal(
        np.asarray(packed).ravel(),
        native.pack_u4(np.asarray(codes)),
    )
    with pytest.raises(ValueError, match="even m"):
        pack_u4_codes(codes[:, :7])


@pytest.mark.parametrize("splits", [2, "int8"])
def test_adc_kernel_packed_u4(splits):
    """Packed-u4 scoring equals unpacked scoring exactly (same tables,
    same kernel arithmetic — only the code layout differs)."""
    from reductive_tpu.ops import pack_u4_codes
    from reductive_tpu.ops.adc import adc_scores_kernel

    m, k, ds, n, nq = 8, 16, 4, 500, 5
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(11), 3)
    pq = Pq(codebooks=jax.random.normal(kc, (m, k, ds), dtype=jnp.float32))
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)
    queries = jax.random.normal(kq, (nq, m * ds), dtype=jnp.float32)

    tables = adc_tables(pq, queries)
    ref = adc_scores_kernel(tables, codes, splits=splits, interpret=True)
    got = adc_scores_kernel(
        tables, pack_u4_codes(codes), splits=splits, packed=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-5)

    with pytest.raises(ValueError, match="k <= 16"):
        big = Pq(codebooks=jax.random.normal(kc, (2, 32, 4), dtype=jnp.float32))
        t2 = adc_tables(big, jax.random.normal(kq, (2, 8), dtype=jnp.float32))
        adc_scores_kernel(t2, jnp.zeros((4, 1), jnp.uint8), packed=True, interpret=True)


def test_search_packed_u4_end_to_end():
    """search(packed=True) returns the same neighbors as the unpacked
    kernel search, in dense and streamed modes."""
    from reductive_tpu.ops import pack_u4_codes
    from reductive_tpu.search import search

    m, k, ds, n, nq = 8, 16, 4, 1200, 4
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(13), 3)
    pq = Pq(codebooks=jax.random.normal(kc, (m, k, ds), dtype=jnp.float32))
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)
    queries = jax.random.normal(kq, (nq, m * ds), dtype=jnp.float32)
    packed = pack_u4_codes(codes)

    import unittest.mock as mock

    from reductive_tpu.ops.adc import adc_scores_kernel
    from reductive_tpu.search import _search_jit, _search_streamed_jit

    # Interpret-mode kernels on the CPU test platform.
    try:
        with mock.patch(
            "reductive_tpu.ops.adc.adc_scores_kernel",
            lambda t, c, splits, packed=False: adc_scores_kernel(
                t, c, splits=splits, packed=packed, interpret=True
            ),
        ):
            d_ref, i_ref = search(pq, queries, codes, top_k=7, method="kernel")
            d_pk, i_pk = search(
                pq, queries, packed, top_k=7, method="kernel", packed=True
            )
            d_st, i_st = search(
                pq, queries, packed, top_k=7, method="kernel", packed=True,
                stream_chunk=256,
            )
    finally:
        _search_jit.clear_cache()
        _search_streamed_jit.clear_cache()
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pk))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_st))
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_pk), rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="kernel"):
        search(pq, queries, packed, top_k=3, packed=True, method="einsum")


def test_search_refine_exact_rescoring():
    """refine_with re-scores ADC candidates with exact distances: the
    returned distances equal brute-force squared distances, and recall of
    the true nearest neighbor is at least the pure-ADC recall (strictly
    better on corpora where quantization error flips rankings)."""
    m, k, ds, n, nq = 4, 8, 2, 4000, 32
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(21), 3)
    x = jax.random.normal(kx, (n, m * ds), dtype=jnp.float32)
    pq = train_pq(kc, x, m, 3, 8)
    codes = pq.quantize_batch(x)
    # Queries = perturbed corpus rows: each has one planted true neighbor.
    planted = np.arange(0, nq * 100, 100)
    queries = x[planted] + 0.05 * jax.random.normal(kq, (nq, m * ds))

    d_adc, i_adc = search(pq, queries, codes, top_k=1)
    d_ref, i_ref = search(pq, queries, codes, top_k=1, refine_with=x,
                          refine_factor=16)

    # Exact distances: refined results must match brute force on top-1.
    full = np.asarray(
        jnp.sum((queries[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    )
    true_nn = full.argmin(axis=1)
    recall_adc = float(np.mean(np.asarray(i_adc)[:, 0] == true_nn))
    recall_ref = float(np.mean(np.asarray(i_ref)[:, 0] == true_nn))
    assert recall_ref >= recall_adc
    assert recall_ref > 0.9
    # Returned refined distances are true squared distances.
    np.testing.assert_allclose(
        np.asarray(d_ref)[:, 0],
        full[np.arange(nq), np.asarray(i_ref)[:, 0]],
        rtol=1e-4, atol=1e-4,
    )

    with pytest.raises(ValueError, match="rows"):
        search(pq, queries, codes, top_k=1, refine_with=x[:-1])
    with pytest.raises(ValueError, match="refine_factor"):
        search(pq, queries, codes, top_k=1, refine_with=x, refine_factor=0)


def test_search_decode_method_matches_einsum():
    """method="decode" (decode + dense matmul scoring) returns the same
    neighbors as the einsum scorer, dense and streamed."""
    m, k, ds, n, nq = 4, 16, 4, 900, 5
    kc, kx, kq = jax.random.split(jax.random.PRNGKey(31), 3)
    pq = Pq(codebooks=jax.random.normal(kc, (m, k, ds), dtype=jnp.float32))
    codes = jax.random.randint(kx, (n, m), 0, k).astype(jnp.uint8)
    queries = jax.random.normal(kq, (nq, m * ds), dtype=jnp.float32)

    d_e, i_e = search(pq, queries, codes, top_k=7)
    d_d, i_d = search(pq, queries, codes, top_k=7, method="decode")
    d_s, i_s = search(pq, queries, codes, top_k=7, method="decode",
                      stream_chunk=256)
    np.testing.assert_array_equal(np.asarray(i_e), np.asarray(i_d))
    np.testing.assert_array_equal(np.asarray(i_e), np.asarray(i_s))
    np.testing.assert_allclose(np.asarray(d_e), np.asarray(d_d),
                               rtol=1e-4, atol=1e-4)

    # With a projection too (decode path rotates the queries).
    kp = jax.random.PRNGKey(32)
    R, _ = jnp.linalg.qr(jax.random.normal(kp, (m * ds, m * ds)))
    pqr = Pq(codebooks=pq.codebooks, projection=R.astype(jnp.float32))
    codes_r = pqr.quantize_batch(queries.repeat(40, axis=0))
    d_e2, i_e2 = search(pqr, queries, codes_r, top_k=5)
    d_d2, i_d2 = search(pqr, queries, codes_r, top_k=5, method="decode")
    np.testing.assert_array_equal(np.asarray(i_e2), np.asarray(i_d2))


def test_refine_from_reader_matches_in_memory(tmp_path):
    """refine_with accepts an on-disk reader: candidate rows are fetched
    from disk and the result equals the device-resident refine."""
    from reductive_tpu import train_pq
    from reductive_tpu.native import VecsReader, write_fvecs
    from reductive_tpu.search import search

    key = jax.random.PRNGKey(80)
    x = jax.random.normal(key, (3000, 16), dtype=jnp.float32)
    write_fvecs(str(tmp_path / "c.fvecs"), np.asarray(x))
    pq = train_pq(key, x, 4, 4, 5)
    codes = pq.quantize_batch(x)
    q = x[:7] + 0.01 * jax.random.normal(jax.random.PRNGKey(81), (7, 16))
    d_mem, i_mem = search(pq, q, codes, top_k=5, refine_with=x,
                          refine_factor=4)
    with VecsReader(str(tmp_path / "c.fvecs")) as reader:
        d_dk, i_dk = search(pq, q, codes, top_k=5, refine_with=reader,
                            refine_factor=4)
    np.testing.assert_array_equal(np.asarray(i_dk), np.asarray(i_mem))
    np.testing.assert_allclose(np.asarray(d_dk), np.asarray(d_mem),
                               rtol=1e-6, atol=1e-6)


def test_ivf_refine_from_reader(tmp_path):
    """ivf_search(refine_with=reader) completes the disk-resident serving
    loop: build from disk, search, refine from disk."""
    from reductive_tpu.ivf import build_ivf, ivf_search, train_ivf_pq
    from reductive_tpu.native import VecsReader, write_fvecs

    key = jax.random.PRNGKey(82)
    kc, kn = jax.random.split(key)
    centers = jax.random.normal(kc, (8, 16)) * 3.0
    x = (centers[:, None, :] + 0.2 * jax.random.normal(kn, (8, 150, 16))
         ).reshape(-1, 16).astype(jnp.float32)
    write_fvecs(str(tmp_path / "c.fvecs"), np.asarray(x))
    with VecsReader(str(tmp_path / "c.fvecs")) as reader:
        coarse, rpq = train_ivf_pq(key, reader, 8, 4, 4, use_kernel=False,
                                   train_sample=512)
        index = build_ivf(coarse, rpq, reader, capacity="auto",
                          use_kernel=False)
        q = x[:5]
        d_dk, i_dk = ivf_search(index, q, top_k=5, nprobe=4,
                                use_kernel=False, refine_with=reader)
    d_mem, i_mem = ivf_search(index, q, top_k=5, nprobe=4,
                              use_kernel=False, refine_with=x)
    np.testing.assert_array_equal(np.asarray(i_dk), np.asarray(i_mem))
    # Exact refine of a query that IS a corpus row returns distance ~0.
    assert float(np.asarray(d_dk)[0, 0]) < 1e-6


@pytest.mark.parametrize("projection", [False, True])
def test_dot_metric_tables_match_bruteforce_ip(projection):
    # metric="dot" tables sum to the exact negated inner product with the
    # reconstruction (projections preserve inner products).
    key = jax.random.PRNGKey(11)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, projection=projection)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (150, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (5, d), dtype=jnp.float32)

    codes = pq.quantize_batch(db, dtype=jnp.uint8)
    scores = adc_scores(adc_tables(pq, queries, metric="dot"), codes)
    rec = pq.reconstruct_batch(codes)
    expected = -jnp.einsum("qd,nd->qn", queries, rec, precision="highest")
    np.testing.assert_allclose(np.asarray(scores), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("method", ["einsum", "decode"])
def test_search_dot_metric_topk(method):
    # Every scoring method ranks by descending inner product under
    # metric="dot" and agrees with the brute-force MIPS answer.
    key = jax.random.PRNGKey(12)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, m=4, k=16, ds=8)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (400, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (6, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)

    rec = pq.reconstruct_batch(codes)
    ip = jnp.einsum("qd,nd->qn", queries, rec, precision="highest")
    exp_idx = np.asarray(jax.lax.top_k(ip, 10)[1])

    dist, idx = search(pq, queries, codes, top_k=10, method=method,
                       splits=2, metric="dot")
    # Scores ascend (negated IP) and the sets agree (ties can permute).
    assert np.all(np.diff(np.asarray(dist), axis=1) >= -1e-5)
    for q in range(queries.shape[0]):
        got, want = set(np.asarray(idx)[q].tolist()), set(exp_idx[q].tolist())
        assert len(got & want) >= 9, (q, got, want)


def test_adc_kernel_dot_metric_interpret():
    # The fused kernel consumes dot-metric tables unchanged (bf16 splits
    # and the int8 affine LUT both handle negative table entries).
    from reductive_tpu.ops.adc import adc_scores_kernel

    key = jax.random.PRNGKey(18)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, m=4, k=16, ds=8)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (300, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (5, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)

    tables = adc_tables(pq, queries, metric="dot")
    ref = adc_scores(tables, codes)
    got = adc_scores_kernel(tables, codes, splits=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    got8 = adc_scores_kernel(tables, codes, splits="int8", interpret=True)
    # int8 LUT ranking survives: top-10 overlap vs exact tables.
    for q in range(queries.shape[0]):
        want = set(np.asarray(jax.lax.top_k(-ref, 10)[1])[q].tolist())
        have = set(np.asarray(jax.lax.top_k(-got8, 10)[1])[q].tolist())
        assert len(want & have) >= 8, (q, want, have)


def test_search_dot_metric_refine_exact_mips():
    # refine_with re-ranks by the TRUE inner product against the original
    # vectors; the returned scores are exact negated IPs.
    key = jax.random.PRNGKey(13)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, m=4, k=16, ds=8)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (300, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (4, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)

    dist, idx = search(pq, queries, codes, top_k=5, metric="dot",
                       refine_with=db, refine_factor=8)
    true_ip = jnp.einsum("qd,nd->qn", queries, db, precision="highest")
    got_ip = np.take_along_axis(np.asarray(true_ip), np.asarray(idx), axis=1)
    np.testing.assert_allclose(np.asarray(dist), -got_ip, rtol=1e-5, atol=1e-5)
    # Candidate-set-limited MIPS: the refined top-1 must be the best of
    # the refine pool, and with factor 8 on smooth data it should nearly
    # always be the global argmax.
    exact_top1 = np.asarray(jnp.argmax(true_ip, axis=1))
    assert np.mean(np.asarray(idx)[:, 0] == exact_top1) >= 0.75


def test_search_dot_metric_streamed_matches_dense():
    key = jax.random.PRNGKey(14)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, m=4, k=16, ds=8)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (1000, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (3, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)

    d0, i0 = search(pq, queries, codes, top_k=7, metric="dot")
    d1, i1 = search(pq, queries, codes, top_k=7, metric="dot",
                    stream_chunk=256)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_cosine_via_normalization():
    # The documented cosine recipe: normalize corpus before encoding and
    # queries before searching; dot == cosine on the unit sphere.
    key = jax.random.PRNGKey(16)
    kq, kx, kpq = jax.random.split(key, 3)
    pq_key = jax.random.PRNGKey(17)
    d = 32
    db = jax.random.normal(kx, (500, d), dtype=jnp.float32)
    db = db / jnp.linalg.norm(db, axis=1, keepdims=True)
    queries = jax.random.normal(kq, (4, d), dtype=jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)

    pq = train_pq(pq_key, db, 8, 4, 8, 1)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)
    _, idx = search(pq, queries, codes, top_k=5, metric="dot",
                    refine_with=db, refine_factor=8)
    cos = jnp.einsum("qd,nd->qn", queries, db, precision="highest")
    exact_top1 = np.asarray(jnp.argmax(cos, axis=1))
    assert np.mean(np.asarray(idx)[:, 0] == exact_top1) >= 0.75


def test_search_metric_validation():
    pq = make_pq(jax.random.PRNGKey(0))
    codes = jnp.zeros((10, 4), jnp.uint8)
    q = jnp.zeros((1, pq.reconstructed_len), jnp.float32)
    with pytest.raises(ValueError, match="unknown metric"):
        search(pq, q, codes, top_k=1, metric="l1")
    with pytest.raises(ValueError, match="unknown metric"):
        adc_tables(pq, q, metric="cosine")


@pytest.mark.parametrize("metric", ["l2", "dot"])
def test_search_sharded_matches_single_device(metric):
    # Corpus-sharded exhaustive search returns exactly the single-device
    # scores (global top-k is contained in the union of shard top-ks).
    from reductive_tpu.parallel import make_mesh
    from reductive_tpu.search import search_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    key = jax.random.PRNGKey(31)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, m=4, k=16, ds=8)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (800, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (5, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)

    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    d_sh, i_sh = search_sharded(pq, queries, codes, top_k=7, mesh=mesh,
                                metric=metric)
    d_1, i_1 = search(pq, queries, codes, top_k=7, metric=metric)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_1),
                               rtol=1e-5, atol=1e-5)
    # Ties may permute ids between equal scores; compare as sets.
    for q in range(queries.shape[0]):
        assert set(np.asarray(i_sh)[q].tolist()) == set(
            np.asarray(i_1)[q].tolist()
        )


def test_search_sharded_validation():
    from reductive_tpu.parallel import make_mesh
    from reductive_tpu.search import search_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    pq = make_pq(jax.random.PRNGKey(0))
    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    q = jnp.zeros((1, pq.reconstructed_len), jnp.float32)
    with pytest.raises(ValueError, match="per-shard corpus"):
        search_sharded(pq, q, jnp.zeros((8, 4), jnp.uint8), top_k=3,
                       mesh=mesh)
    # top_k bounded by the true (pre-padding) corpus, not the padded one.
    with pytest.raises(ValueError, match="per-shard corpus"):
        search_sharded(pq, q, jnp.zeros((2, 4), jnp.uint8), top_k=3,
                       mesh=mesh)


@pytest.mark.parametrize("metric", ["l2", "dot"])
def test_search_sharded_pads_non_divisible_corpus(metric):
    # A prime-sized corpus is padded to the next multiple of the axis and
    # the padded rows masked out of the merge: results equal the
    # single-device search exactly (VERDICT r3 weak #6).
    from reductive_tpu.parallel import make_mesh
    from reductive_tpu.search import search_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    key = jax.random.PRNGKey(41)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, m=4, k=16, ds=8)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (797, d), dtype=jnp.float32)  # prime
    queries = jax.random.normal(kq, (5, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)

    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    d_sh, i_sh = search_sharded(pq, queries, codes, top_k=7, mesh=mesh,
                                metric=metric)
    d_1, i_1 = search(pq, queries, codes, top_k=7, metric=metric)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_1),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(i_sh) >= 0)
    assert np.all(np.asarray(i_sh) < 797)
    for q in range(queries.shape[0]):
        assert set(np.asarray(i_sh)[q].tolist()) == set(
            np.asarray(i_1)[q].tolist()
        )


def test_search_wide_codebook_u16_codes():
    # k > 256 forces uint16 codes; the einsum scorer, streamed scorer,
    # and refine must all handle them.
    key = jax.random.PRNGKey(51)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, m=2, k=300, ds=4)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (500, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (3, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint16)
    assert int(np.asarray(codes).max()) > 255

    d0, i0 = search(pq, queries, codes, top_k=5)
    d1, i1 = search(pq, queries, codes, top_k=5, stream_chunk=128)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    rec = pq.reconstruct_batch(codes)
    exact = jnp.sum((queries[:, None, :] - rec[None, :, :]) ** 2, axis=2)
    np.testing.assert_array_equal(
        np.asarray(i0), np.asarray(jax.lax.top_k(-exact, 5)[1])
    )
    dr, ir = search(pq, queries, codes, top_k=5, refine_with=db)
    assert np.isfinite(np.asarray(dr)).all()


def test_search_sharded_auto_streams(monkeypatch):
    # The per-shard auto-streaming guard: with a tiny dense budget the
    # sharded path must switch to the streamed scorer and stay exact.
    from reductive_tpu import search as search_mod
    from reductive_tpu.parallel import make_mesh
    from reductive_tpu.search import search_sharded

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-device CPU mesh")
    monkeypatch.setattr(search_mod, "_STREAM_SCORE_ELEMS", 64)
    monkeypatch.setattr(search_mod, "_DEFAULT_STREAM_CHUNK", 64)
    key = jax.random.PRNGKey(52)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq, m=4, k=16, ds=8)
    db = jax.random.normal(kx, (800, pq.reconstructed_len), jnp.float32)
    queries = jax.random.normal(kq, (3, pq.reconstructed_len), jnp.float32)
    codes = pq.quantize_batch(db, dtype=jnp.uint8)
    mesh = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    d_sh, i_sh = search_sharded(pq, queries, codes, top_k=5, mesh=mesh)
    d_1, _ = search(pq, queries, codes, top_k=5, stream_chunk=None)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_1),
                               rtol=1e-5, atol=1e-5)


def test_search_method_auto_resolution(monkeypatch):
    """``method="auto"`` picks the fused kernel exactly when the backend
    is TPU and the codes are u8/packed; everywhere else it must produce
    the einsum scorer's results (here: CPU -> einsum, bit-identical to an
    explicit einsum call; and a fake-TPU backend with u16 codes must
    also stay on einsum rather than handing wide codes to the kernel)."""
    import reductive_tpu.search as search_mod

    key = jax.random.PRNGKey(11)
    kq, kx, kpq = jax.random.split(key, 3)
    pq = make_pq(kpq)
    d = pq.reconstructed_len
    db = jax.random.normal(kx, (300, d), dtype=jnp.float32)
    queries = jax.random.normal(kq, (5, d), dtype=jnp.float32)
    codes = pq.quantize_batch(db)
    assert codes.dtype == jnp.uint8

    d_auto, i_auto = search(pq, queries, codes, top_k=7)
    d_ein, i_ein = search(pq, queries, codes, top_k=7, method="einsum")
    np.testing.assert_array_equal(np.asarray(i_auto), np.asarray(i_ein))
    np.testing.assert_array_equal(np.asarray(d_auto), np.asarray(d_ein))

    # Fake a TPU backend: u8 codes must route to the kernel (observed via
    # the kernel's VMEM query batcher being consulted), u16 must not.
    calls = []
    monkeypatch.setattr(search_mod.jax, "default_backend", lambda: "tpu")
    import reductive_tpu.ops.adc as adc_mod

    real_mqb = adc_mod.max_query_batch
    monkeypatch.setattr(
        adc_mod, "max_query_batch",
        lambda *a, **k: calls.append(a) or real_mqb(*a, **k),
    )
    try:
        search(pq, queries, codes, top_k=7)
    except Exception:
        pass  # the kernel itself cannot run on CPU; routing is the test
    assert calls, "auto on TPU with u8 codes must resolve to the kernel"

    calls.clear()
    codes16 = codes.astype(jnp.uint16)
    search(pq, queries, codes16, top_k=7)  # einsum handles u16 fine
    assert not calls, "auto must not hand non-u8 codes to the kernel"
