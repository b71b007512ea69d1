"""Streaming encode pipeline: disk → host batches → device → codes.

Production encode jobs process corpora far larger than HBM (BASELINE.json
config #5: 100M 768-d vectors).  This pipeline streams the corpus in
fixed-size batches through the fused encode kernel with double buffering:
JAX dispatch is asynchronous, so while the device encodes batch *i* the
host is already mmap-reading and converting batch *i+1* (the native
``VecsReader``), and completed code blocks drain to host memory a couple
of batches behind.  The last partial batch is zero-padded to the batch
shape so a single compiled program serves the whole stream (no retraces).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .pq.model import Pq

__all__ = ["stream_encode", "stream_encode_batches"]


def _encode_fn(pq: Pq, dtype, use_kernel: bool):
    if use_kernel:
        from .ops.assign import pq_encode

        def fn(codebooks, projection, x):
            if projection is not None:
                x = jnp.dot(x, projection, precision="highest")
            return pq_encode(codebooks, x, dtype=dtype)
    else:
        from .pq import primitives

        def fn(codebooks, projection, x):
            if projection is not None:
                x = jnp.dot(x, projection, precision="highest")
            return primitives.quantize_batch(codebooks, x, dtype=dtype)

    return jax.jit(fn, static_argnames=())


def stream_encode_batches(
    pq: Pq,
    batches: Iterable[Tuple[int, np.ndarray]],
    *,
    batch_size: int,
    dtype=jnp.uint8,
    use_kernel: Optional[bool] = None,
    max_in_flight: int = 2,
) -> Iterator[Tuple[int, np.ndarray]]:
    """Encode a stream of ``(offset, (b, d) float32)`` batches.

    Yields ``(offset, (b, m) codes)`` in order.  Up to ``max_in_flight``
    device batches stay queued, overlapping host IO, host→device copies,
    and compute.  Batches smaller than ``batch_size`` (the tail) are
    padded on device entry and trimmed on exit.
    """
    if use_kernel is None:
        use_kernel = jax.default_backend() != "cpu"
    fn = _encode_fn(pq, dtype, use_kernel)
    codebooks, projection = pq.codebooks, pq.projection

    pending: list[Tuple[int, int, jax.Array]] = []

    def drain_one():
        off, valid, codes = pending.pop(0)
        return off, np.asarray(codes)[:valid]

    for off, batch in batches:
        b = batch.shape[0]
        if b < batch_size:
            batch = np.concatenate(
                [batch, np.zeros((batch_size - b, batch.shape[1]), batch.dtype)]
            )
        codes = fn(codebooks, projection, jnp.asarray(batch))
        pending.append((off, b, codes))
        if len(pending) > max_in_flight:
            yield drain_one()
    while pending:
        yield drain_one()


def stream_encode(
    pq: Pq,
    reader,
    *,
    batch_size: int = 1 << 18,
    dtype=jnp.uint8,
    use_kernel: Optional[bool] = None,
    start: int = 0,
    stop: Optional[int] = None,
) -> np.ndarray:
    """Encode an entire on-disk dataset to a ``(n, m)`` code matrix.

    ``reader`` is a :class:`reductive_tpu.native.VecsReader` (or anything
    with ``n``/``batches()``).  Memory high-water: one output code matrix
    plus ``max_in_flight`` input batches.
    """
    stop = reader.n if stop is None else min(stop, reader.n)
    n = stop - start
    out = np.empty((n, pq.quantized_len), dtype=np.dtype(dtype))
    if hasattr(reader, "prefetch_batches"):
        # Native prefetch executor: a producer thread reads + converts
        # ahead.  copy=True — device_put may stage the host buffer
        # asynchronously, and the ring slot is recycled on the next step;
        # the memcpy is cheap next to the conversion it overlaps.
        batches = reader.prefetch_batches(batch_size, start, stop, copy=True)
    else:
        batches = reader.batches(batch_size, start, stop)
    for off, codes in stream_encode_batches(
        pq,
        batches,
        batch_size=batch_size,
        dtype=dtype,
        use_kernel=use_kernel,
    ):
        out[off - start:off - start + codes.shape[0]] = codes
    return out
