"""IVF-PQ: inverted-file search with residual product quantization.

Exhaustive ADC scans every code (``reductive_tpu.search``); production
corpora at 100M+ vectors use a **coarse quantizer** to prune the scan:
vectors are bucketed by nearest coarse centroid, PQ-encoded as
**residuals** against that centroid (Jégou et al., 2011, §V — residual
encoding roughly squares the effective codebook resolution), and a query
scores only the ``nprobe`` nearest cells.  The reference ships no search
at all; this is the capability extension that makes the serving story
complete at scale.

TPU-first design decisions:

* **Static-shape cells.**  Classic IVF keeps ragged per-cell lists —
  hostile to XLA.  Here every cell is a fixed-capacity row block of one
  dense ``(C, L, m)`` code tensor plus ``(C, L)`` ids (``-1`` = empty
  slot, masked at score time).  ``L`` defaults to the build-time maximum
  cell size, so nothing spills and the memory overhead is bounded by the
  cell-balance ratio (the coarse k-means keeps that small on real data).
* **Coarse scoring is one matmul** (norm-expansion distances), and the
  per-(query, probe) residual ADC tables are one small einsum — both MXU
  work.  Candidate scoring gathers table entries for the probed cells'
  codes; at ``nprobe/C`` of a few percent this replaces a full-corpus
  multihot matmul with ~100x less scored work.
* **Everything under one jit** with static ``(nprobe, top_k, L)`` — no
  data-dependent shapes anywhere.

Build is a one-time host-side pass (numpy scatter into the dense cells);
training reuses the library's own k-means and chunked PQ trainers.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import Array

from .pq.model import Pq

logger = logging.getLogger("reductive_tpu")

__all__ = ["IvfPq", "train_ivf_pq", "build_ivf", "ivf_search"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IvfPq:
    """An IVF-PQ index: coarse centroids + residual PQ + dense cells.

    ``cell_codes[c, l]`` is the PQ code of the ``l``-th vector assigned to
    coarse cell ``c`` (encoded from the residual ``x - centroid[c]``);
    ``cell_ids[c, l]`` is its original corpus row, or ``-1`` for an empty
    slot.  A registered pytree — flows through jit/shard_map and
    checkpoints like any parameter structure.
    """

    coarse_centroids: Array  # (C, d)
    pq: Pq                   # residual quantizer, codebooks (m, k, ds)
    cell_codes: Array        # (C, L, m) uint8/uint16
    cell_ids: Array          # (C, L) int32, -1 = empty
    cell_norms: Array        # (C, L) f32: ||centroid + recon(code)||^2

    @property
    def n_cells(self) -> int:
        return self.coarse_centroids.shape[0]

    @property
    def capacity(self) -> int:
        return self.cell_codes.shape[1]


def train_ivf_pq(
    key: Array,
    instances: Array,
    n_cells: int,
    n_subquantizers: int,
    n_subquantizer_bits: int,
    *,
    coarse_iterations: int = 10,
    pq_iterations: int = 10,
    train_sample: Optional[int] = 262_144,
    chunk: int = 32768,
    use_kernel: Optional[bool] = None,
) -> Tuple[Array, Pq]:
    """Train the two quantization stages: coarse k-means centroids and a
    PQ over the **residuals** ``x - centroid[assign(x)]``.

    Reuses the library's own machinery — the chunked Lloyd's driver for
    the coarse stage and :func:`train_pq_chunked` for the residual PQ.
    ``train_sample`` caps the rows used for training (both stages are
    statistical; a quarter-million rows train 4096 cells well); the full
    corpus is only touched at :func:`build_ivf` time.
    """
    from .kmeans import (
        KMeansPlusPlusCentroids,
        kmeans_with_centroids_chunked,
        random_distinct_indices,
    )
    from .pq.train import train_pq_chunked

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    n, d = instances.shape
    kc, ks, kp = jax.random.split(key, 3)
    x_train = instances
    if train_sample is not None and n > train_sample:
        idx = random_distinct_indices(ks, n, train_sample)
        x_train = jnp.take(instances, idx, axis=0)

    logger.info(
        "IVF-PQ training: %d coarse cells (%d iters) + residual PQ m=%d k=%d",
        n_cells, coarse_iterations, n_subquantizers, 2 ** n_subquantizer_bits,
    )
    # k-means++ seeding: random-instance init leaves dead/merged coarse
    # centroids (coupon-collector), which skews cell sizes — and the
    # dense-cell capacity (hence probe cost) scales with the LARGEST
    # cell.  D^2-weighted seeding keeps max/mean cell size small.
    init = KMeansPlusPlusCentroids()(kc, x_train, n_cells)
    coarse, _ = kmeans_with_centroids_chunked(
        x_train, init, coarse_iterations,
        chunk=chunk, use_kernel=use_kernel,
    )

    residuals = x_train - jnp.take(
        coarse, _assign_coarse(coarse, x_train, use_kernel), axis=0
    )
    pq = train_pq_chunked(
        kp, residuals, n_subquantizers, n_subquantizer_bits, pq_iterations,
        chunk=chunk, use_kernel=use_kernel,
    )
    return coarse, pq


def _assign_coarse(coarse: Array, x: Array, use_kernel: bool) -> Array:
    if use_kernel:
        from .ops.assign import assign_nearest

        return assign_nearest(coarse, x)
    from .kmeans import cluster_assignments

    return cluster_assignments(coarse, x)


def build_ivf(
    coarse: Array,
    pq: Pq,
    instances: Array,
    *,
    capacity: Optional[int] = None,
    dtype=jnp.uint8,
    batch: int = 262_144,
    use_kernel: Optional[bool] = None,
) -> IvfPq:
    """Assign, residual-encode, and scatter the corpus into dense cells.

    One streaming pass over ``instances`` (``batch`` rows at a time on
    device: coarse assign + residual PQ encode), then a host-side numpy
    scatter into the ``(C, L, m)`` cell tensor.  ``capacity`` defaults to
    the largest cell (nothing dropped); a smaller explicit capacity
    truncates overfull cells (the dropped rows are logged — use a larger
    ``n_cells`` or capacity if that matters).
    """
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    n, d = instances.shape
    C = coarse.shape[0]
    m = pq.quantized_len

    assign_np = np.empty((n,), np.int32)
    codes_np = np.empty((n, m), np.dtype(dtype))
    for off in range(0, n, batch):
        xb = instances[off : off + batch]
        ab = _assign_coarse(coarse, xb, use_kernel)
        rb = xb - jnp.take(coarse, ab, axis=0)
        if use_kernel:
            from .ops.assign import pq_encode

            cb = pq_encode(pq.codebooks, rb, dtype=dtype)
        else:
            cb = pq.quantize_batch(rb, dtype=dtype)
        assign_np[off : off + batch] = np.asarray(ab)
        codes_np[off : off + batch] = np.asarray(cb)

    counts = np.bincount(assign_np, minlength=C)
    L = int(counts.max()) if capacity is None else int(capacity)
    dropped = int(np.maximum(counts - L, 0).sum())
    if dropped:
        logger.warning(
            "IVF build: %d rows exceed cell capacity %d and were dropped "
            "(max cell %d); raise capacity or n_cells", dropped, L, counts.max(),
        )

    # Stable grouping: rank of each row within its cell, in corpus order.
    order = np.argsort(assign_np, kind="stable")
    sorted_assign = assign_np[order]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(n) - starts[sorted_assign]
    keep = rank < L

    cell_codes = np.zeros((C, L, m), dtype=np.dtype(dtype))
    cell_ids = np.full((C, L), -1, dtype=np.int32)
    cell_codes[sorted_assign[keep], rank[keep]] = codes_np[order][keep]
    cell_ids[sorted_assign[keep], rank[keep]] = order[keep]

    # Per-slot approximation norms: g = ||centroid + recon(code)||^2 —
    # the precomputed term of the IVFADC score decomposition
    # ||q - c - rec||^2 = ||q||^2 + g - 2 q.c - 2 q.rec
    # (Jegou et al., 2011, Eq. 13), so search needs no per-probe tables.
    cell_norms = np.zeros((C, L), np.float32)
    coarse_np = np.asarray(coarse)
    kept_cells = sorted_assign[keep]
    kept_rank = rank[keep]
    kept_codes = codes_np[order][keep]
    for off in range(0, len(kept_codes), batch):
        cc = kept_cells[off : off + batch]
        rec = np.asarray(
            pq.reconstruct_batch(jnp.asarray(kept_codes[off : off + batch]))
        )
        full = coarse_np[cc] + rec
        cell_norms[cc, kept_rank[off : off + batch]] = np.einsum(
            "nd,nd->n", full, full
        )

    logger.info(
        "IVF build: %d rows -> %d cells, capacity %d (mean %.0f, util %.0f%%)",
        n, C, L, counts.mean(), 100.0 * n / (C * L),
    )
    return IvfPq(
        coarse_centroids=coarse,
        pq=pq,
        cell_codes=jnp.asarray(cell_codes),
        cell_ids=jnp.asarray(cell_ids),
        cell_norms=jnp.asarray(cell_norms),
    )


@functools.partial(
    jax.jit, static_argnames=("top_k", "nprobe", "use_kernel", "splits")
)
def ivf_search(
    index: IvfPq,
    queries: Array,
    top_k: int = 10,
    *,
    nprobe: int = 8,
    use_kernel: Optional[bool] = None,
    splits: int = 2,
) -> Tuple[Array, Array]:
    """Top-``top_k`` approximate neighbors per query, scanning only the
    ``nprobe`` nearest coarse cells.

    Returns ``(distances, ids)`` of shape ``(nq, top_k)``: approximate
    squared distances and original corpus rows.  Fewer than ``top_k``
    hits in the probed cells pads with ``id=-1`` / ``distance=+inf``.

    Scoring uses the IVFADC decomposition (Jégou et al., 2011, Eq. 13)
    ``||q - c - rec||^2 = ||q||^2 + g - 2 q.c - 2 q.rec`` with ``g``
    precomputed at build time, so the hot path is pure MXU work with no
    element gathers: one coarse matmul, one fused-kernel **decode** of
    the gathered candidate codes (``splits`` forwards to
    :func:`reductive_tpu.ops.pq_decode` — 2 is near-exact), and one
    batched dot against the (rotated) queries.  The scanned fraction is
    ``nprobe / C`` of the corpus.  ``use_kernel=None`` picks the fused
    decode on TPU and the einsum decode elsewhere.
    """
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    coarse = index.coarse_centroids
    cb = index.pq.codebooks
    m, k, ds = cb.shape
    d = m * ds
    nq = queries.shape[0]
    L = index.capacity

    # Stage 1: nearest coarse cells — one MXU matmul feeding both the
    # distances (for probe selection) and the q.c terms (for scoring).
    qc = jnp.dot(queries, coarse.T, precision="highest")      # (nq, C)
    q_sqn = jnp.sum(queries * queries, axis=1)                # (nq,)
    c_sqn = jnp.sum(coarse * coarse, axis=1)                  # (C,)
    coarse_d2 = q_sqn[:, None] + c_sqn[None, :] - 2.0 * qc
    _, probe = jax.lax.top_k(-coarse_d2, nprobe)              # (nq, np)
    qc_g = jnp.take_along_axis(qc, probe, axis=1)             # (nq, np)

    # Stage 2: gather the probed cells (contiguous row blocks — cheap).
    codes_g = jnp.take(index.cell_codes, probe, axis=0)       # (nq, np, L, m)
    ids_g = jnp.take(index.cell_ids, probe, axis=0)           # (nq, np, L)
    norms_g = jnp.take(index.cell_norms, probe, axis=0)       # (nq, np, L)

    # Stage 3: q.rec via decode + one batched dot (both MXU).  The
    # reconstruction lives in the residual PQ's (possibly rotated)
    # space, so dot against the correspondingly rotated queries.
    flat_codes = codes_g.reshape(nq * nprobe * L, m)
    if use_kernel:
        from .ops.decode import pq_decode

        rec = pq_decode(cb, flat_codes, splits=splits)        # rotated space
    else:
        from .pq import primitives

        rec = primitives.reconstruct_batch(cb, flat_codes, method="gather")
    qr = (
        jnp.dot(queries, index.pq.projection, precision="highest")
        if index.pq.projection is not None
        else queries
    )
    dot = jnp.einsum(
        "qid,qd->qi",
        rec.reshape(nq, nprobe * L, d),
        qr,
        precision="highest",
        preferred_element_type=jnp.float32,
    ).reshape(nq, nprobe, L)

    scores = (
        q_sqn[:, None, None] + norms_g - 2.0 * qc_g[:, :, None] - 2.0 * dot
    )
    scores = jnp.where(ids_g >= 0, scores, jnp.inf)  # mask empty slots

    # Stage 4: global top_k across all probed candidates (padded to
    # top_k with +inf / -1 when the probed cells hold fewer).
    flat_scores = scores.reshape(nq, -1)
    flat_ids = ids_g.reshape(nq, -1)
    kk = min(top_k, flat_scores.shape[1])
    neg, sel = jax.lax.top_k(-flat_scores, kk)
    dists = -neg
    ids = jnp.take_along_axis(flat_ids, sel, axis=1)
    if kk < top_k:
        pad = top_k - kk
        dists = jnp.concatenate(
            [dists, jnp.full((nq, pad), jnp.inf, dists.dtype)], axis=1
        )
        ids = jnp.concatenate(
            [ids, jnp.full((nq, pad), -1, ids.dtype)], axis=1
        )
    return dists, ids
