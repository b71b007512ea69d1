"""IVF-PQ tests: build invariants, exhaustive-probe equivalence, recall."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reductive_tpu import Pq, train_pq
from reductive_tpu.ivf import IvfPq, build_ivf, ivf_search, train_ivf_pq


def clustered_data(key, n_clusters=16, per=200, d=16, spread=0.15):
    kc, kn = jax.random.split(key)
    centers = jax.random.normal(kc, (n_clusters, d)) * 3.0
    noise = jax.random.normal(kn, (n_clusters, per, d)) * spread
    return (centers[:, None, :] + noise).reshape(-1, d).astype(jnp.float32)


def test_build_invariants():
    """Every corpus row lands in exactly one cell slot; stored codes are
    the residual encodings of their rows."""
    key = jax.random.PRNGKey(0)
    x = clustered_data(key)
    n = x.shape[0]
    coarse, pq = train_ivf_pq(key, x, 8, 4, 4, use_kernel=False,
                              train_sample=None)
    index = build_ivf(coarse, pq, x, use_kernel=False)

    ids = np.asarray(index.cell_ids)
    valid = ids >= 0
    flat = ids[valid]
    assert len(flat) == n
    assert len(set(flat.tolist())) == n  # every row exactly once

    # Spot-check stored codes vs recomputed residual encodings.
    from reductive_tpu.kmeans import cluster_assignments

    rows = np.asarray(flat[:50])
    assign = cluster_assignments(coarse, x[rows])
    res = x[rows] - jnp.take(coarse, assign, axis=0)
    expect = np.asarray(pq.quantize_batch(res))
    got = np.asarray(index.cell_codes)[valid][:50]
    np.testing.assert_array_equal(got, expect)


def test_full_probe_matches_bruteforce():
    """With nprobe = n_cells, IVF search ranks exactly like brute force
    over the residual reconstructions (the same approximation)."""
    key = jax.random.PRNGKey(1)
    x = clustered_data(key, n_clusters=8, per=100)
    C = 8
    coarse, pq = train_ivf_pq(key, x, C, 4, 4, use_kernel=False,
                              train_sample=None)
    index = build_ivf(coarse, pq, x, use_kernel=False)

    kq = jax.random.PRNGKey(2)
    queries = x[::97][:9] + 0.05 * jax.random.normal(kq, (9, x.shape[1]))

    d_ivf, i_ivf = ivf_search(index, queries, top_k=5, nprobe=C)

    # Brute-force oracle: approx distance to centroid + residual recon.
    from reductive_tpu.kmeans import cluster_assignments

    assign = cluster_assignments(coarse, x)
    res = x - jnp.take(coarse, assign, axis=0)
    codes = pq.quantize_batch(res)
    rec = jnp.take(coarse, assign, axis=0) + pq.reconstruct_batch(codes)
    d2 = jnp.sum((queries[:, None, :] - rec[None, :, :]) ** 2, axis=-1)
    neg, idx = jax.lax.top_k(-d2, 5)
    np.testing.assert_array_equal(np.asarray(i_ivf), np.asarray(idx))
    np.testing.assert_allclose(
        np.asarray(d_ivf), np.asarray(-neg), rtol=1e-3, atol=1e-3
    )


def test_recall_with_few_probes():
    """On clustered data, a few probes recover the planted neighbors."""
    key = jax.random.PRNGKey(3)
    x = clustered_data(key, n_clusters=32, per=100, d=16)
    coarse, pq = train_ivf_pq(key, x, 32, 4, 4, use_kernel=False,
                              train_sample=None)
    index = build_ivf(coarse, pq, x, use_kernel=False)

    kq = jax.random.PRNGKey(4)
    planted = np.arange(0, 3200, 100)
    queries = x[planted] + 0.02 * jax.random.normal(kq, (32, 16))
    _, idx = ivf_search(index, queries, top_k=10, nprobe=4)
    recall = float(np.mean([
        planted[q] in np.asarray(idx[q]) for q in range(len(planted))
    ]))
    assert recall > 0.9, recall


def test_underfull_cells_pad_with_minus_one():
    """top_k beyond the probed candidates pads with id=-1 / dist=+inf."""
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (20, 8), dtype=jnp.float32)
    pq = train_pq(key, x, 2, 2, 4)
    codes_dummy = pq.quantize_batch(x)
    coarse = x[:4]  # 4 cells, ~5 rows each
    index = build_ivf(coarse, pq, x, use_kernel=False)
    d, i = ivf_search(index, x[:2], top_k=15, nprobe=1)
    i = np.asarray(i)
    d = np.asarray(d)
    assert (i == -1).any()
    assert np.isinf(d[i == -1]).all()
    # Valid entries sort ascending before the padding.
    for row_d, row_i in zip(d, i):
        nv = (row_i >= 0).sum()
        assert (np.diff(row_d[:nv]) >= -1e-6).all()


def test_capacity_cap_overflow_modes(caplog):
    """A bounded build can never lose rows silently: "drop" warns AND
    exposes the ids programmatically, "error" raises, "spill" with
    insufficient total capacity raises instead of dropping."""
    import logging

    key = jax.random.PRNGKey(6)
    x = clustered_data(key, n_clusters=4, per=50, d=8)
    n = x.shape[0]
    coarse, pq = train_ivf_pq(key, x, 4, 2, 3, use_kernel=False,
                              train_sample=None)
    # C*L = 40 < n = 200: only "drop" can produce an index at all.
    with caplog.at_level(logging.WARNING, logger="reductive_tpu"):
        index = build_ivf(coarse, pq, x, capacity=10, use_kernel=False,
                          on_overflow="drop")
    assert index.capacity == 10
    assert any("dropped" in r.message for r in caplog.records)
    ids = np.asarray(index.cell_ids)
    placed = ids[ids >= 0]
    assert index.dropped_ids.size == n - len(placed) > 0
    # dropped + placed partition the corpus exactly.
    assert (
        sorted(placed.tolist() + index.dropped_ids.tolist())
        == list(range(n))
    )

    with pytest.raises(ValueError, match="candidate cells"):
        build_ivf(coarse, pq, x, capacity=10, use_kernel=False,
                  on_overflow="error")
    with pytest.raises(ValueError, match="no spill placement"):
        build_ivf(coarse, pq, x, capacity=10, use_kernel=False,
                  on_overflow="spill")
    with pytest.raises(ValueError, match="on_overflow"):
        build_ivf(coarse, pq, x, capacity=10, use_kernel=False,
                  on_overflow="panic")


def test_spill_places_every_row():
    """With total capacity >= n, the default on_overflow="spill" stores
    every corpus row exactly once even when the per-candidate greedy pass
    overflows, and the stored codes match the storage cell's centroid."""
    key = jax.random.PRNGKey(60)
    x = clustered_data(key, n_clusters=4, per=50, d=8, spread=0.3)
    n = x.shape[0]
    coarse, pq = train_ivf_pq(key, x, 4, 2, 3, use_kernel=False,
                              train_sample=None)
    # Exact-fit total capacity with few overflow candidates: the bounded
    # pass is guaranteed to leave leftovers on clustered data, the spill
    # pass must place them all.
    index = build_ivf(coarse, pq, x, capacity=50, overflow_candidates=2,
                      use_kernel=False)
    assert index.dropped_ids.size == 0
    ids = np.asarray(index.cell_ids)
    flat = ids[ids >= 0]
    assert len(flat) == n and len(set(flat.tolist())) == n

    cells, slots = np.nonzero(ids >= 0)
    rows = ids[cells, slots]
    res = x[rows] - jnp.take(coarse, cells, axis=0)
    expect = np.asarray(pq.quantize_batch(res))
    np.testing.assert_array_equal(
        np.asarray(index.cell_codes)[cells, slots], expect
    )


def test_ivf_index_is_a_pytree():
    key = jax.random.PRNGKey(7)
    x = clustered_data(key, n_clusters=4, per=40, d=8)
    coarse, pq = train_ivf_pq(key, x, 4, 2, 3, use_kernel=False,
                              train_sample=None)
    index = build_ivf(coarse, pq, x, use_kernel=False)
    leaves = jax.tree_util.tree_leaves(index)
    assert len(leaves) >= 4
    rebuilt = jax.tree_util.tree_map(lambda a: a, index)
    np.testing.assert_array_equal(
        np.asarray(rebuilt.cell_ids), np.asarray(index.cell_ids)
    )


def test_ivf_artifact_roundtrip(tmp_path):
    """IvfPq persists through the io artifact and searches identically."""
    from reductive_tpu import io as rio

    key = jax.random.PRNGKey(8)
    x = clustered_data(key, n_clusters=4, per=60, d=8)
    coarse, pq = train_ivf_pq(key, x, 4, 2, 3, use_kernel=False,
                              train_sample=None)
    index = build_ivf(coarse, pq, x, use_kernel=False)
    path = str(tmp_path / "ivf.npz")
    rio.save(path, index)
    loaded = rio.load(path)
    assert isinstance(loaded, IvfPq)
    q = x[:3]
    d0, i0 = ivf_search(index, q, top_k=5, nprobe=2, use_kernel=False)
    d1, i1 = ivf_search(loaded, q, top_k=5, nprobe=2, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-6)


def test_auto_capacity_overflow_placement():
    """capacity="auto" bounds L near the mean cell size; overflow rows
    land in secondary candidate cells (encoded against that centroid) and
    every row is still stored exactly once."""
    key = jax.random.PRNGKey(9)
    x = clustered_data(key, n_clusters=8, per=150, d=8, spread=0.4)
    n = x.shape[0]
    coarse, pq = train_ivf_pq(key, x, 8, 2, 3, use_kernel=False,
                              train_sample=None)
    index = build_ivf(coarse, pq, x, capacity="auto", use_kernel=False)
    assert index.capacity == int(np.ceil(1.25 * n / 8))

    ids = np.asarray(index.cell_ids)
    flat = ids[ids >= 0]
    assert len(flat) == n and len(set(flat.tolist())) == n

    # Stored codes are consistent with the *storage* cell's centroid.
    C, L = ids.shape
    cells, slots = np.nonzero(ids >= 0)
    rows = ids[cells, slots]
    res = x[rows] - jnp.take(coarse, cells, axis=0)
    expect = np.asarray(pq.quantize_batch(res))
    np.testing.assert_array_equal(np.asarray(index.cell_codes)[cells, slots], expect)

    # Search still finds planted neighbors.
    kq = jax.random.PRNGKey(10)
    planted = np.arange(0, n, 150)
    queries = x[planted] + 0.02 * jax.random.normal(kq, (len(planted), 8))
    _, idx = ivf_search(index, queries, top_k=10, nprobe=3, use_kernel=False)
    recall = float(np.mean([
        planted[q] in np.asarray(idx[q]) for q in range(len(planted))
    ]))
    assert recall > 0.8, recall


def test_ivf_search_sharded_matches_single_device():
    """Cells sharded over the virtual mesh: the merged result is at least
    as good as the single-device search (superset of probed cells), and
    exactly equal when nprobe covers everything."""
    from reductive_tpu.parallel import make_mesh
    from reductive_tpu.ivf import ivf_search_sharded

    key = jax.random.PRNGKey(11)
    x = clustered_data(key, n_clusters=16, per=60, d=8)
    coarse, pq = train_ivf_pq(key, x, 16, 2, 3, use_kernel=False,
                              train_sample=None)
    index = build_ivf(coarse, pq, x, capacity="auto", use_kernel=False)
    mesh = make_mesh()  # 8 virtual CPU devices -> 2 cells per shard
    queries = x[:6]

    # Full coverage: nprobe = cells per shard probes every cell globally.
    d_sh, i_sh = ivf_search_sharded(
        index, queries, top_k=5, nprobe=2, mesh=mesh, use_kernel=False,
    )
    d_1d, i_1d = ivf_search(index, queries, top_k=5, nprobe=16,
                            use_kernel=False)
    np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_1d))
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_1d),
                               rtol=1e-5, atol=1e-5)

    # Partial probing: sharded candidates are a superset of the
    # single-device probes at the same nprobe, so its top-1 distance is
    # never worse.
    d_sh1, _ = ivf_search_sharded(
        index, queries, top_k=1, nprobe=1, mesh=mesh, use_kernel=False,
    )
    d_1d1, _ = ivf_search(index, queries, top_k=1, nprobe=1,
                          use_kernel=False)
    assert np.all(np.asarray(d_sh1) <= np.asarray(d_1d1) + 1e-5)

    import pytest

    with pytest.raises(ValueError, match="divide"):
        bad = build_ivf(coarse[:10], pq, x[:100], use_kernel=False)
        ivf_search_sharded(bad, queries, top_k=1, nprobe=1, mesh=mesh)
    with pytest.raises(ValueError, match="per-shard"):
        ivf_search_sharded(index, queries, top_k=1, nprobe=3, mesh=mesh)


def test_ivf_opq_residuals_and_refine():
    """residual_quantizer="gaussian_opq" carries a projection through
    build and search; refine_with re-scores IVF candidates exactly."""
    key = jax.random.PRNGKey(12)
    x = clustered_data(key, n_clusters=8, per=100, d=16)
    n = x.shape[0]
    coarse, rpq = train_ivf_pq(
        key, x, 8, 4, 3, use_kernel=False, train_sample=None,
        residual_quantizer="gaussian_opq",
    )
    assert rpq.projection is not None
    index = build_ivf(coarse, rpq, x, capacity="auto", use_kernel=False)

    kq = jax.random.PRNGKey(13)
    planted = np.arange(0, n, 100)
    queries = x[planted] + 0.02 * jax.random.normal(kq, (len(planted), 16))

    # Projection path: full probe matches brute force over the same
    # approximation (centroid + R^T recon).
    d_ivf, i_ivf = ivf_search(index, queries, top_k=5, nprobe=8,
                              use_kernel=False)
    ids = np.asarray(index.cell_ids)
    cells, slots = np.nonzero(ids >= 0)
    rows = ids[cells, slots]
    rec = np.asarray(rpq.reconstruct_batch(
        jnp.asarray(np.asarray(index.cell_codes)[cells, slots])
    ))
    approx = np.zeros_like(np.asarray(x))
    approx[rows] = np.asarray(coarse)[cells] + rec
    d2 = np.sum(
        (np.asarray(queries)[:, None, :] - approx[None, :, :]) ** 2, axis=-1
    )
    expect_idx = np.argsort(d2, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i_ivf), expect_idx)

    # Exact refine returns true distances and at-least-as-good recall.
    d_ref, i_ref = ivf_search(index, queries, top_k=5, nprobe=8,
                              use_kernel=False, refine_with=x,
                              refine_factor=8)
    full = np.sum(
        (np.asarray(queries)[:, None, :] - np.asarray(x)[None, :, :]) ** 2,
        axis=-1,
    )
    np.testing.assert_allclose(
        np.asarray(d_ref)[:, 0],
        full[np.arange(len(planted)), np.asarray(i_ref)[:, 0]],
        rtol=1e-4, atol=1e-4,
    )
    with pytest.raises(ValueError, match="residual_quantizer"):
        train_ivf_pq(key, x, 8, 4, 3, use_kernel=False,
                     residual_quantizer="opq2")


def test_build_from_reader_matches_in_memory(tmp_path):
    """build_ivf from an on-disk reader (>HBM path) produces the exact
    same index as the in-memory build on the same corpus."""
    from reductive_tpu.native import VecsReader, write_fvecs

    key = jax.random.PRNGKey(70)
    x = clustered_data(key, n_clusters=8, per=120, d=16, spread=0.3)
    path = str(tmp_path / "corpus.fvecs")
    write_fvecs(path, np.asarray(x))

    coarse, pq = train_ivf_pq(key, x, 8, 4, 4, use_kernel=False,
                              train_sample=None)
    mem = build_ivf(coarse, pq, x, capacity="auto", use_kernel=False,
                    batch=256)
    with VecsReader(path) as reader:
        disk = build_ivf(coarse, pq, reader, capacity="auto",
                         use_kernel=False, batch=256)
    np.testing.assert_array_equal(
        np.asarray(disk.cell_ids), np.asarray(mem.cell_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(disk.cell_codes), np.asarray(mem.cell_codes)
    )
    np.testing.assert_allclose(
        np.asarray(disk.cell_norms), np.asarray(mem.cell_norms),
        rtol=1e-6, atol=1e-6,
    )


def test_build_from_reader_drop_mode(tmp_path):
    """Reader-path pass 2 handles holes (dropped rows) via host filter +
    zero padding; stored rows partition exactly as in the array path."""
    from reductive_tpu.native import VecsReader, write_fvecs

    key = jax.random.PRNGKey(71)
    x = clustered_data(key, n_clusters=4, per=50, d=8)
    n = x.shape[0]
    path = str(tmp_path / "corpus.fvecs")
    write_fvecs(path, np.asarray(x))
    coarse, pq = train_ivf_pq(key, x, 4, 2, 3, use_kernel=False,
                              train_sample=None)
    mem = build_ivf(coarse, pq, x, capacity=10, use_kernel=False,
                    on_overflow="drop", batch=64)
    with VecsReader(path) as reader:
        disk = build_ivf(coarse, pq, reader, capacity=10, use_kernel=False,
                         on_overflow="drop", batch=64)
    np.testing.assert_array_equal(
        np.asarray(disk.cell_ids), np.asarray(mem.cell_ids)
    )
    np.testing.assert_array_equal(disk.dropped_ids, mem.dropped_ids)
    assert disk.dropped_ids.size > 0


def test_train_ivf_pq_from_reader(tmp_path):
    """train_ivf_pq accepts a reader: sampled training from disk, then a
    streamed build + search end-to-end without the corpus in memory."""
    from reductive_tpu.native import VecsReader, write_fvecs

    key = jax.random.PRNGKey(72)
    x = clustered_data(key, n_clusters=16, per=100, d=16)
    n = x.shape[0]
    path = str(tmp_path / "corpus.fvecs")
    write_fvecs(path, np.asarray(x))
    with VecsReader(path) as reader:
        coarse, pq = train_ivf_pq(key, reader, 16, 4, 4, use_kernel=False,
                                  train_sample=512)
        index = build_ivf(coarse, pq, reader, capacity="auto",
                          use_kernel=False)
    assert index.dropped_ids.size == 0
    ids = np.asarray(index.cell_ids)
    flat = ids[ids >= 0]
    assert len(flat) == n and len(set(flat.tolist())) == n
    kq = jax.random.PRNGKey(73)
    planted = np.arange(0, n, 100)
    queries = x[planted] + 0.02 * jax.random.normal(kq, (len(planted), 16))
    _, idx = ivf_search(index, queries, top_k=10, nprobe=4, use_kernel=False)
    recall = float(np.mean([
        planted[q] in np.asarray(idx[q]) for q in range(len(planted))
    ]))
    assert recall > 0.85, recall
