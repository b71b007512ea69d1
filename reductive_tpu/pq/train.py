"""Plain product-quantizer training: batched k-means over the subquantizer axis.

TPU-native counterpart of the reference's ``TrainPq for Pq``
(reference: ``src/pq/pq.rs:196-250``).  The reference fans the ``m``
independent subquantizer k-means trainings out over a rayon thread pool
(``src/pq/pq.rs:226-241``) and repeats each one ``n_attempts`` times,
keeping the minimum-loss attempt (``src/pq/pq.rs:168-188``).  Here both the
``m`` axis and the attempts axis are **batch axes of one jitted tensor
program**: a double-``vmap`` over ``(n_attempts, m)`` runs every k-means
simultaneously as a single ``(n_attempts, m, k, ds)`` computation — no host
threads, no retracing across attempts, and the MXU sees large batched
matmuls instead of ``m`` small sequential ones.

RNG discipline: the reference seeds one XorShift stream per subquantizer
from a master ChaCha8 RNG (``src/pq/pq.rs:221-224``); here each
``(attempt, subquantizer)`` pair gets an independent fold of the caller's
PRNG key — the counter-based JAX equivalent of uncorrelated streams.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import Array

logger = logging.getLogger("reductive_tpu")

from ..errors import check_quantizer_invariants
from ..kmeans import NIterations, RandomInstanceCentroids, kmeans_with_centroids
from .model import Pq

__all__ = ["train_pq", "train_pq_subspace", "train_pq_subspace_with_centroids"]


def _subquantizer_initial_centroids(key: Array, xs: Array, k: int) -> Array:
    """Initial centroids for one subquantizer: ``k`` distinct random
    instances of the ``(n, ds)`` subvector slice (reference:
    ``subquantizer_initial_centroids``, ``src/pq/pq.rs:117-136`` →
    ``RandomInstanceCentroids``, ``src/kmeans.rs:52-87``)."""
    n = xs.shape[0]
    indices = jax.random.choice(key, n, shape=(k,), replace=False)
    return jnp.take(xs, indices, axis=0)


@partial(jax.jit, static_argnames=("k", "n_attempts"))
def _train_codebooks(
    key: Array, xs: Array, k: int, n_iterations, n_attempts: int
) -> tuple[Array, Array]:
    """Train all ``m`` subquantizers, ``n_attempts`` times each, in one
    compiled program.

    ``xs`` is the instance tensor reshaped to ``(n, m, ds)``.  Returns the
    best-of-attempts ``(m, k, ds)`` codebooks and the per-subquantizer
    losses ``(m,)``.  ``n_iterations`` is a runtime value, so one
    compilation per ``(shape, k, n_attempts)`` serves every iteration
    count.
    """
    n, m, ds = xs.shape
    xs_m = jnp.moveaxis(xs, 1, 0)  # (m, n, ds)
    keys = jax.random.split(key, n_attempts * m).reshape(n_attempts, m, 2)

    def one(key, x_sq):
        centroids = _subquantizer_initial_centroids(key, x_sq, k)
        return kmeans_with_centroids(x_sq, centroids, NIterations(n_iterations))

    # vmap over subquantizers, then over attempts: (a, m, k, ds), (a, m)
    codebooks, losses = jax.vmap(jax.vmap(one, in_axes=(0, 0)), in_axes=(0, None))(
        keys, xs_m
    )
    return _best_of_attempts(codebooks, losses)


def _best_of_attempts(codebooks: Array, losses: Array) -> tuple[Array, Array]:
    """Keep the minimum-loss attempt per subquantizer; argmin ties break to
    the first attempt, matching the reference's min_by_key scan
    (src/pq/pq.rs:183-187).  ``codebooks`` is ``(a, m, k, ds)``, ``losses``
    ``(a, m)``."""
    best = jnp.argmin(losses, axis=0)  # (m,)
    best_codebooks = jnp.take_along_axis(
        codebooks, best[None, :, None, None], axis=0
    )[0]
    best_losses = jnp.take_along_axis(losses, best[None, :], axis=0)[0]
    return best_codebooks, best_losses


@jax.jit
def train_pq_subspace_with_centroids(
    xs: Array, initial: Array, n_iterations
) -> tuple[Array, Array]:
    """Train all subquantizers from explicitly supplied initial centroids.

    ``xs`` is ``(n, m, ds)`` instance data; ``initial`` is
    ``(n_attempts, m, k, ds)`` initial centroids — one full set per
    (attempt, subquantizer).  Runs the same double-vmapped Lloyd's program
    as :func:`train_pq` and keeps the best attempt per subquantizer.  This
    is the entry the conformance mode uses after replicating the
    reference's centroid draws on the host
    (``reductive_tpu.conformance``)."""
    xs_m = jnp.moveaxis(xs, 1, 0)  # (m, n, ds)

    def one(centroids, x_sq):
        return kmeans_with_centroids(x_sq, centroids, NIterations(n_iterations))

    codebooks, losses = jax.vmap(jax.vmap(one, in_axes=(0, 0)), in_axes=(0, None))(
        initial, xs_m
    )
    return _best_of_attempts(codebooks, losses)


def train_pq(
    key: Array,
    instances: Array,
    n_subquantizers: int,
    n_subquantizer_bits: int,
    n_iterations: int,
    n_attempts: int = 1,
) -> Pq:
    """Train a plain product quantizer (reference: ``TrainPq::train_pq_using``,
    ``src/pq/pq.rs:201-250``).

    Each of the ``n_subquantizers`` subquantizers gets ``2**n_subquantizer_bits``
    centroids, trained with ``n_iterations`` Lloyd's iterations; each is
    trained ``n_attempts`` times and the minimum-loss attempt is kept.
    Raises a :class:`~reductive_tpu.errors.ReductiveError` subclass on
    invalid hyperparameters.
    """
    n, d = instances.shape
    check_quantizer_invariants(
        n_subquantizers, n_subquantizer_bits, n_iterations, n_attempts, n, d
    )
    k = 2 ** n_subquantizer_bits
    ds = d // n_subquantizers
    # Phase marker mirroring the reference's per-subquantizer log
    # (src/pq/pq.rs:159) — here all m train at once in one program.
    logger.info(
        "Training %d PQ subquantizers (k=%d, %d iterations, %d attempts)",
        n_subquantizers, k, n_iterations, n_attempts,
    )
    xs = instances.reshape(n, n_subquantizers, ds)
    codebooks, losses = _train_codebooks(key, xs, k, n_iterations, n_attempts)
    if logger.isEnabledFor(logging.INFO):
        logger.info(
            "Per-subquantizer losses: %s",
            [round(float(l), 6) for l in losses],
        )
    return Pq(codebooks=codebooks, projection=None)


def train_pq_subspace(
    key: Array, xs: Array, k: int, n_iterations: int, n_attempts: int
) -> tuple[Array, Array]:
    """Lower-level entry returning raw ``(m, k, ds)`` codebooks and per-
    subquantizer losses for pre-reshaped ``(n, m, ds)`` data.  Used by the
    OPQ trainers, which manage projection and validation themselves."""
    return _train_codebooks(key, xs, k, n_iterations, n_attempts)
