"""Fused assign+statistics Pallas kernel: one pass of Lloyd's over HBM.

The k-means training hot loop needs, per iteration, the per-centroid
instance sums and counts under nearest-centroid assignment (reference:
assign ``src/kmeans.rs:133-159`` + scatter-add update
``src/kmeans.rs:166-198``).  Computing codes first and scatter-adding
afterwards costs a second pass over the instances plus an HBM-materialized
one-hot; this kernel does the whole thing in one sweep:

* scores via the same block-diagonal MXU matmul as the encode kernel
  (``reductive_tpu.ops.assign``), transposed so the per-subquantizer min
  runs across sublanes;
* the argmin one-hot is recovered **exactly** from the packed sortable
  keys — the centroid index lives in the low bits, so ``key == min(key)``
  has exactly one winner per instance (first-index tie-break included);
* the one-hot (still in VMEM) immediately feeds a second MXU matmul
  ``onehot @ x`` whose block-diagonal slices are the per-centroid sums;
  both matmuls and the accumulators use f32 accumulation;
* sums/counts accumulate across grid steps in a VMEM-resident
  ``(m*kp, d)`` f32 scratch (~2 MB at the flagship shape) — the (m, n, k)
  distance tensor and the (m, n, k) one-hot never exist anywhere.

The redundant off-diagonal columns of ``onehot @ x`` are the same
16x-padding trade as the encode kernel's block-diagonal weights: with a
contraction/output granularity of 128 lanes, computing the full ``(m*kp,
d)`` product *is* the MXU-optimal mapping of m tiny ``(k, ds)`` updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .assign import (
    _round_up,
    pack_block_diagonal,
    scores_3pass,
    trunc_split2_bf16_stacked,
    trunc_split3_bf16,
)

__all__ = ["pq_assign_stats"]


def _stats_kernel(
    x_ref, wt_ref, csqn_ref, sums_ref, counts_ref, *,
    n, m, kp, groups, idx_mask, block_n, compute_dtype, matmul_precision,
):
    i = pl.program_id(0)
    exact = compute_dtype == jnp.float32

    @pl.when(i == 0)
    def _init():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)

    # Rows past n in the final (padded) block must not contribute — mask
    # both the instances (padding may be anything, including NaN) and the
    # one-hot columns.
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, block_n), 1) + i * block_n < n
    )
    valid_rows = (
        jax.lax.broadcasted_iota(jnp.int32, (block_n, 1), 0) + i * block_n < n
    )
    x = jnp.where(valid_rows, x_ref[:], 0.0).astype(compute_dtype)  # (bn, d)
    if exact:
        # Exact mode, 6 MXU passes/element instead of HIGHEST x2 = 12 (the
        # change that took exact-mode Lloyd's from 12.3M vec/s to the
        # committed number):
        # * the instance-sum matmul runs as three single-pass bf16
        #   products against an exact mantissa-truncation 3-split of x —
        #   the one-hot side is exactly 0/1 in bf16, so every product is
        #   exact and the result matches a HIGHEST f32 matmul up to f32
        #   accumulation order;
        # * the score matmul runs through the same
        #   :func:`reductive_tpu.ops.assign.scores_3pass` as the encode
        #   kernel (bit-identical packed keys between the two kernels).
        x_splits = trunc_split3_bf16(x)
    per = m // groups
    rows = per * kp
    for g in range(groups):
        sl = slice(g * rows, (g + 1) * rows)
        if exact:
            s = scores_3pass(
                wt_ref[0, sl, :], wt_ref[1, sl, :], x_splits[0], x_splits[1]
            )
        else:
            s = jax.lax.dot_general(
                wt_ref[sl, :],
                x,
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=matmul_precision,
                preferred_element_type=jnp.float32,
            )  # (rows, bn); W holds 2c, so s is already the doubled cross term
        dists = csqn_ref[:].reshape(m * kp, 1)[g * rows:(g + 1) * rows] - s
        ib = pltpu.bitcast(dists, jnp.int32)
        c31 = jnp.int32(31)
        c1 = jnp.int32(1)
        key = ib ^ jax.lax.shift_right_logical(
            jax.lax.shift_right_arithmetic(ib, c31), c1
        )
        seg_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % kp
        key = (key & ~idx_mask) | seg_iota
        # Exact one-hot: the packed index makes each column's min unique.
        key3 = key.reshape(per, kp, block_n)
        mins = jnp.min(key3, axis=1, keepdims=True)  # (per, 1, bn)
        onehot = (key3 == mins).reshape(rows, block_n).astype(compute_dtype)
        onehot = onehot * valid.astype(compute_dtype)  # zero padded columns
        if exact:
            onehot_b = onehot.astype(jnp.bfloat16)  # 0/1: exact in bf16
            ps = jnp.zeros((rows, x.shape[1]), jnp.float32)
            for xs in x_splits:
                ps += jax.lax.dot_general(
                    onehot_b,
                    xs,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            ps = jax.lax.dot_general(
                onehot,
                x,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=matmul_precision,
                preferred_element_type=jnp.float32,
            )  # (rows, d)
        sums_ref[g * rows:(g + 1) * rows, :] += ps
        counts_ref[g * rows:(g + 1) * rows, :] += jnp.sum(
            onehot.astype(jnp.float32), axis=1, keepdims=True
        )


def _choose_stats_tiling(m, kp, d, compute_itemsize, exact=False):
    """Pick (block_n, groups) within the VMEM budget: resident W + sums
    accumulator + x tile (+ the exact mode's three bf16 x-splits) + ~4
    transient (rows, block_n) buffers."""
    budget = 13 * (1 << 20)
    w_bytes = m * kp * d * compute_itemsize
    acc_bytes = m * kp * (d + 8) * 4
    # 1024-row blocks measured ~8% faster than 2048 at the flagship shape
    # (the kernel is VPU-bound on the one-hot build, and smaller score
    # tiles pipeline better against the two matmuls).
    for bn in (1024, 2048, 512, 256, 128):
        x_bytes = bn * d * (4 + compute_itemsize) + (3 * bn * d * 2 if exact else 0)
        for groups in [g for g in range(1, m + 1) if m % g == 0]:
            rows = (m // groups) * kp
            buf_bytes = rows * bn * 4 * 4 + rows * d * 4
            if w_bytes + acc_bytes + x_bytes + buf_bytes <= budget:
                return bn, groups
    raise ValueError(
        f"no VMEM-feasible tiling for m={m}, k~{kp}, d={d}; "
        "use the chunked einsum path"
    )


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def pq_assign_stats(
    codebooks: Array,
    x: Array,
    *,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Per-centroid instance sums ``(m, k, ds)`` and counts ``(m, k)``
    under nearest-centroid assignment, in one fused pass over ``x``.

    This is the Lloyd's-iteration workhorse for corpora where the
    ``(m, n, k)`` distance tensor cannot be materialized.  ``compute_dtype``
    selects the f32-exact or bfloat16-throughput mode; accumulation is f32
    either way and counts are exact in both modes (0/1 values, integer
    sums far below 2^24).

    The exact mode costs 6 MXU passes per element instead of the naive
    HIGHEST x2 = 12: the score matmul runs at ``Precision.HIGH`` (3-pass,
    products to ~2^-32 — far below the packed-key argmin's own 2^-15
    tie coarsening, so assignments are unchanged), and the instance-sum
    matmul runs as three single-pass bf16 products against an exact
    mantissa-truncation 3-split of ``x`` (every product exact; the result
    matches a HIGHEST f32 matmul up to f32 accumulation order).
    """
    m, k, ds = codebooks.shape
    n, d = x.shape
    if d != m * ds:
        raise ValueError(
            f"Quantizer and vector length mismatch: input has {d} columns, "
            f"quantizer reconstructs {m * ds}"
        )
    kp_probe = _round_up(k, 8)
    exact = compute_dtype == jnp.float32
    try:
        block_n, groups = _choose_stats_tiling(
            m, kp_probe, d, jnp.dtype(compute_dtype).itemsize, exact=exact
        )
    except ValueError:
        if m < 2:
            raise
        # The (m*kp, d) accumulator outgrew VMEM (large k*d): split the
        # subquantizer axis — each half reads only its own column slice,
        # so the only cost is a second pass over x (bandwidth-cheap).
        h = m // 2
        s1, c1 = pq_assign_stats(
            codebooks[:h], x[:, : h * ds],
            compute_dtype=compute_dtype, interpret=interpret,
        )
        s2, c2 = pq_assign_stats(
            codebooks[h:], x[:, h * ds :],
            compute_dtype=compute_dtype, interpret=interpret,
        )
        return (
            jnp.concatenate([s1, s2], axis=0),
            jnp.concatenate([c1, c2], axis=0),
        )
    W, c_sqn, kp = pack_block_diagonal(codebooks, compute_dtype, scale=2.0)
    Wt = W.T
    if exact:
        Wt = trunc_split2_bf16_stacked(Wt)  # (2, m*kp, d) bf16
    idx_bits = max(1, (kp - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1
    matmul_precision = None
    kernel = functools.partial(
        _stats_kernel,
        n=n,
        m=m,
        kp=kp,
        groups=groups,
        idx_mask=idx_mask,
        block_n=block_n,
        compute_dtype=compute_dtype,
        matmul_precision=matmul_precision,
    )
    sums_full, counts_full = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, block_n),),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            (
                pl.BlockSpec((2, m * kp, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
                if exact
                else pl.BlockSpec((m * kp, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
            ),
            pl.BlockSpec((1, m * kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m * kp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * kp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m * kp, d), jnp.float32),
            jax.ShapeDtypeStruct((m * kp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, Wt, c_sqn)

    # Extract the block-diagonal slices: sums[j] = sums_full[j*kp:j*kp+k,
    # j*ds:(j+1)*ds], counts[j] = counts_full[j*kp:j*kp+k].  Statistics
    # stay f32 regardless of the corpus dtype (exact counts, accumulated
    # sums).
    sums3 = sums_full.reshape(m, kp, d)
    counts = counts_full.reshape(m, kp)[:, :k]
    blocks = jnp.stack(
        [jax.lax.dynamic_slice(sums3[j], (0, j * ds), (kp, ds)) for j in range(m)]
    )  # (m, kp, ds)
    return blocks[:, :k, :], counts
