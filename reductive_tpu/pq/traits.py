"""Trait-style training surface mirroring the reference's ``TrainPq``.

The reference exposes training through marker types implementing the
``TrainPq`` trait (``src/pq/traits.rs:15-72``): ``Pq::train_pq(...)``
seeds a ChaCha8 RNG **from entropy** (``traits.rs:36-44``) while
``train_pq_using(..., rng)`` takes the caller's RNG; ``Opq`` and
``GaussianOpq`` are train-only marker types (``src/pq/opq.rs:27-37``,
``src/pq/gaussian_opq.rs:18-25``) producing a ``Pq``.

This module provides the literal equivalents so a reference user can
switch one-for-one::

    from reductive_tpu.pq import Opq, PqTrainer, GaussianOpq

    pq = PqTrainer.train_pq(10, 7, 10, 1, instances)          # entropy seed
    pq = Opq.train_pq_using(10, 7, 10, 1, instances, key)     # explicit key
    pq = GaussianOpq.train_pq(10, 7, 10, 1, instances)

The argument order matches the reference exactly:
``(n_subquantizers, n_subquantizer_bits, n_iterations, n_attempts,
instances[, key])``.  The functional API (:func:`train_pq` & co., key
first) remains the primary JAX-idiomatic surface.
"""

from __future__ import annotations

import os

import jax
from jax import Array

from .model import Pq
from .opq import train_gaussian_opq, train_opq
from .train import train_pq

__all__ = ["PqTrainer", "Opq", "GaussianOpq", "entropy_key"]


def entropy_key() -> Array:
    """A PRNG key seeded from OS entropy — the counterpart of the
    reference's ``ChaCha8Rng::from_entropy()`` (``traits.rs:42``)."""
    return jax.random.PRNGKey(int.from_bytes(os.urandom(8), "little") >> 1)


def _trait(train_fn):
    class _Trainer:
        @staticmethod
        def train_pq(
            n_subquantizers: int,
            n_subquantizer_bits: int,
            n_iterations: int,
            n_attempts: int,
            instances: Array,
        ) -> Pq:
            """Entropy-seeded training (reference: ``TrainPq::train_pq``,
            ``traits.rs:26-45``)."""
            return train_fn(
                entropy_key(), instances, n_subquantizers,
                n_subquantizer_bits, n_iterations, n_attempts,
            )

        @staticmethod
        def train_pq_using(
            n_subquantizers: int,
            n_subquantizer_bits: int,
            n_iterations: int,
            n_attempts: int,
            instances: Array,
            key: Array,
        ) -> Pq:
            """Training with a caller-supplied PRNG key (reference:
            ``TrainPq::train_pq_using``, ``traits.rs:48-72``)."""
            return train_fn(
                key, instances, n_subquantizers,
                n_subquantizer_bits, n_iterations, n_attempts,
            )

    return _Trainer


class PqTrainer(_trait(train_pq)):
    """``TrainPq for Pq`` (reference: ``src/pq/pq.rs:196-250``)."""


class Opq(_trait(train_opq)):
    """Train-only marker type for non-parametric OPQ (reference:
    ``src/pq/opq.rs:27-37``); ``n_attempts`` is ignored as in the
    reference."""


class GaussianOpq(_trait(train_gaussian_opq)):
    """Train-only marker type for closed-form OPQ (reference:
    ``src/pq/gaussian_opq.rs:18-25``)."""
