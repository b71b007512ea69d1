"""Measured (not argued) parity against an independent reference implementation.

``tests/reference_numpy.py`` re-implements the reference's exact training
algorithms in plain numpy — per-subquantizer sequential k-means in the
reference's loop order, LAPACK eigh/svd OPQ, f32 — sharing nothing with
the device path except the conformance RNG draw stream.  These tests
assert the device trainers' end-to-end objectives match that independent
implementation within the BASELINE.md 1e-5 relative gate on the three
reference quality-gate scenarios (256x20 U(0,1), m=10, k=128, 10 iters,
seeds 42/1/7 — src/pq/pq.rs:431-440, opq.rs:331-339,
gaussian_opq.rs:99-108) plus larger shapes.

A real algorithmic divergence (wrong update rule, loss normalization,
tie-break, or alternation order) moves objectives by far more than 1e-5;
measured agreement here is ~1e-7 (see the committed values in each
test's docstring).

OPQ is the one exception, with a documented looser bound: its
alternating minimization amplifies single argmin near-tie flips (f32
rounding differs legitimately between the device's Newton-Schulz polar
update and LAPACK's SVD), so individual scenarios occasionally land at
~2e-4 while the median stays at ~3e-7 — both are asserted.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import reference_numpy as R
from reductive_tpu import conformance as C


def _device_loss(model, x) -> float:
    rec = model.reconstruct_batch(model.quantize_batch(x))
    return float(jnp.mean(jnp.sqrt(jnp.sum((jnp.asarray(x) - rec) ** 2, axis=1))))


# ---------------------------------------------------------------------------
# The emulator itself is pinned to the reference's hand-computed fixtures
# (so the parity comparison below is anchored to the reference, not merely
# to internal consistency).
# ---------------------------------------------------------------------------


def test_emulator_cluster_assignments_fixture():
    """kmeans.rs:380-400 truth table."""
    centroids = np.array(
        [[0.5, 0, 0], [0, -1, 0], [0, 0, 1], [0, 1, 1]], np.float32
    )
    instances = np.array(
        [[0, 0.5, 0], [0, 0, 2], [1, 0, 0], [0, 0, 1], [0, -2, 0],
         [0, 0.7, 0.7], [0, 0, 0]],
        np.float32,
    )
    np.testing.assert_array_equal(
        R.cluster_assignments(centroids, instances), [0, 2, 0, 2, 1, 3, 0]
    )


def test_emulator_update_centroids_fixture():
    """kmeans.rs:402-435 truth table (incl. the empty-cluster zero rule)."""
    centroids = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    instances = np.array(
        [[-1, -1, 0], [1, 1, 0], [-2, -1, 0], [0, 0, 0], [0, 0, 1],
         [0, 0, 2]],
        np.float32,
    )
    R.update_centroids(centroids, instances, np.array([1, 0, 1, 0, 2, 2]))
    np.testing.assert_array_equal(
        centroids,
        np.array([[0.5, 0.5, 0], [-1.5, -1, 0], [0, 0, 1.5]], np.float32),
    )
    # Empty cluster -> zero vector (kmeans.rs:181,194-196).
    R.update_centroids(centroids, instances, np.array([0, 0, 0, 0, 0, 0]))
    np.testing.assert_array_equal(centroids[1:], np.zeros((2, 3), np.float32))


def test_emulator_mse_fixture():
    """kmeans.rs:504-519: MSE is exactly 7/6 (normalized by n*d)."""
    centroids = np.array([[-1, 2, 0], [0, -1, 1]], np.float64)
    instances = np.array([[-1, 1, 1], [0, 1, 0]], np.float64)
    assert R.mean_squared_error(centroids, instances, np.array([1, 0])) == 7 / 6


def test_emulator_bucket_eigenvalues_fixtures():
    """opq.rs:303-328: both greedy-bucketing goldens."""
    assert R.bucket_eigenvalues(
        np.array([0.2, 0.6, 0.4, 0.1, 0.3, 0.5], np.float32), 3
    ) == [[1, 3], [5, 0], [2, 4]]
    assert R.bucket_eigenvalues(
        np.array([11174.0, 23450.0, 30835.0, 1557.0, 32425.0, 5154.0],
                 np.float32), 3
    ) == [[4, 3], [2, 5], [1, 0]]


# ---------------------------------------------------------------------------
# Device vs independent-numpy objective parity
# ---------------------------------------------------------------------------

GATE = dict(shape=(256, 20), m=10, bits=7, iters=10)

PQ_SCENARIOS = [
    # (shape, m, bits, iters, attempts, seed) — three reference gates plus
    # larger shapes, one with best-of-attempts selection in play.
    ((256, 20), 10, 7, 10, 1, 42),
    ((256, 20), 10, 7, 10, 1, 1),
    ((256, 20), 10, 7, 10, 1, 7),
    ((2048, 32), 8, 5, 8, 2, 9),
    ((512, 64), 16, 6, 6, 1, 123),
]


@pytest.mark.parametrize("shape,m,bits,iters,attempts,seed", PQ_SCENARIOS)
def test_pq_objective_matches_independent_numpy(
    shape, m, bits, iters, attempts, seed
):
    """Measured agreement ~1e-7 relative (gate requires 1e-5)."""
    x, master = C.reference_test_instances(seed, shape)
    _, master_np = C.reference_test_instances(seed, shape)
    loss_np = R.avg_euclidean_loss(
        x, R.train_pq(x, m, bits, iters, attempts, master_np)
    )
    model = C.train_pq_conformant(x, m, bits, iters, attempts, master=master)
    loss_dev = _device_loss(model, x)
    assert abs(loss_dev - loss_np) <= 1e-5 * loss_np, (loss_dev, loss_np)


@pytest.mark.parametrize("seed", [42, 1, 7])
def test_gaussian_opq_objective_matches_independent_numpy(seed):
    """Measured agreement ~3e-7 relative (gate requires 1e-5)."""
    g = GATE
    x, master = C.reference_test_instances(seed, g["shape"])
    _, master_np = C.reference_test_instances(seed, g["shape"])
    proj, cb = R.train_gaussian_opq(
        x, g["m"], g["bits"], g["iters"], 1, master_np
    )
    loss_np = R.avg_euclidean_loss(x, cb, proj)
    model = C.train_gaussian_opq_conformant(
        x, g["m"], g["bits"], g["iters"], 1, master=master
    )
    loss_dev = _device_loss(model, x)
    assert abs(loss_dev - loss_np) <= 1e-5 * loss_np, (loss_dev, loss_np)


OPQ_SCENARIOS = [
    ((256, 20), 10, 7, 10, 42),
    ((256, 20), 10, 7, 10, 1),
    ((256, 20), 10, 7, 10, 7),
    ((512, 32), 8, 4, 5, 11),
    ((1024, 16), 4, 5, 6, 5),
]


@pytest.mark.parametrize("shape,m,bits,iters,seed", OPQ_SCENARIOS)
def test_opq_objective_matches_independent_numpy(shape, m, bits, iters, seed):
    """Per-scenario 1e-5 gate (BASELINE.md).  Conformance-mode OPQ uses the
    reference's exact LAPACK-SVD Procrustes update
    (``conformance._opq_alternate_exact``), so the Newton–Schulz near-tie
    argmin flips that used to push some seeds to ~2e-4 are gone; measured
    agreement is back at the ~1e-7 arithmetic level."""
    x, master = C.reference_test_instances(seed, shape)
    _, master_np = C.reference_test_instances(seed, shape)
    proj, cb = R.train_opq(x, m, bits, iters, master_np)
    loss_np = R.avg_euclidean_loss(x, cb, proj)
    model = C.train_opq_conformant(x, m, bits, iters, master=master)
    loss_dev = _device_loss(model, x)
    rel = abs(loss_dev - loss_np) / loss_np
    assert rel <= 1e-5, (shape, seed, loss_dev, loss_np, rel)
