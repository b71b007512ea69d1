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

__all__ = ["pq_assign_stats", "pq_assign_stats_verified"]


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


def _choose_stats_tiling(m, kp, d, compute_itemsize, exact=False,
                         budget=13 * (1 << 20)):
    """Pick (block_n, groups) within the VMEM budget: resident W + sums
    accumulator + x tile (+ the exact mode's three bf16 x-splits) + ~4
    transient (rows, block_n) buffers."""
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


def _stats_verify_kernel(
    x_ref, wt_ref, csqn_ref, esq_ref, sums_ref, counts_ref, codes_ref,
    flags_ref, *, n, m, kp, groups, idx_mask, block_n,
):
    """Exact-mode stats kernel + per-row verification flags + codes.

    Identical score/one-hot/sum math to :func:`_stats_kernel`'s exact
    path, plus the top-2 margin test of
    :func:`reductive_tpu.ops.assign._encode_verify_kernel`: a row is
    flagged when any subquantizer's f32 top-2 margin falls within the
    sound 3-pass split-error bound, and the kernel's chosen codes are
    emitted so the caller can *move* a mis-assigned row's contribution
    between cells instead of recomputing the whole pass.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)

    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, block_n), 1) + i * block_n < n
    )
    valid_rows = (
        jax.lax.broadcasted_iota(jnp.int32, (block_n, 1), 0) + i * block_n < n
    )
    x = jnp.where(valid_rows, x_ref[:], 0.0).astype(jnp.float32)  # (bn, d)
    x_splits = trunc_split3_bf16(x)
    d = x.shape[1]
    ds = d // m
    # ||x_j||^2 per (subquantizer, row) for the error bound.
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (m, d), 1) // ds
        == jax.lax.broadcasted_iota(jnp.int32, (m, d), 0)
    ).astype(jnp.float32)
    xn2 = jax.lax.dot_general(
        sel, x * x, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (m, bn)

    per = m // groups
    rows = per * kp
    rowflag = jnp.zeros((1, block_n), jnp.int32)
    for g in range(groups):
        sl = slice(g * rows, (g + 1) * rows)
        s = scores_3pass(
            wt_ref[0, sl, :], wt_ref[1, sl, :], x_splits[0], x_splits[1]
        )
        dists = csqn_ref[:].reshape(m * kp, 1)[g * rows:(g + 1) * rows] - s
        ib = pltpu.bitcast(dists, jnp.int32)
        c31 = jnp.int32(31)
        c1 = jnp.int32(1)
        key = ib ^ jax.lax.shift_right_logical(
            jax.lax.shift_right_arithmetic(ib, c31), c1
        )
        seg_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % kp
        key = (key & ~idx_mask) | seg_iota
        key3 = key.reshape(per, kp, block_n)
        kmins = jnp.min(key3, axis=1, keepdims=True)
        onehot_b = key3 == kmins  # exactly one winner per (sq, row)
        # Margin flags (see _encode_verify_kernel for the bound).
        d3 = dists.reshape(per, kp, block_n)
        m1 = jnp.min(jnp.where(onehot_b, d3, jnp.inf), axis=1)
        m2 = jnp.min(jnp.where(onehot_b, jnp.inf, d3), axis=1)
        margin = m2 - m1
        sm = margin * jnp.abs(margin)
        bound = 4.0 * esq_ref[g * per:(g + 1) * per, :] * xn2[
            g * per:(g + 1) * per, :
        ]
        flags = (sm <= bound).astype(jnp.int32)
        rowflag = jnp.maximum(rowflag, jnp.max(flags, axis=0, keepdims=True))
        mins = kmins.reshape(per, block_n)
        for j in range(per):
            codes_ref[g * per + j, :] = mins[j] & idx_mask
        onehot = (
            onehot_b.reshape(rows, block_n) & valid
        ).astype(jnp.bfloat16)  # 0/1: exact in bf16
        ps = jnp.zeros((rows, d), jnp.float32)
        for xs in x_splits:
            ps += jax.lax.dot_general(
                onehot,
                xs,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        sums_ref[g * rows:(g + 1) * rows, :] += ps
        counts_ref[g * rows:(g + 1) * rows, :] += jnp.sum(
            onehot.astype(jnp.float32), axis=1, keepdims=True
        )
    flags_ref[0, :] = rowflag[0]


def _einsum_stats_chunked(codebooks: Array, x: Array, chunk: int = 16384):
    """Oracle statistics: exact einsum assignments + f32 'highest' one-hot
    sums, streamed in ``chunk``-row slices.  The any-flag-rate-correct
    fallback of :func:`pq_assign_stats_verified`."""
    from ..pq import primitives

    m, k, ds = codebooks.shape
    n, d = x.shape
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    mask = (jnp.arange(n + pad) < n).astype(jnp.float32)

    def body(carry, args):
        s, c = carry
        xc, mc = args
        codes = primitives.quantize_batch(codebooks, xc, dtype=jnp.int32)
        oh = jax.nn.one_hot(codes.T, k, dtype=jnp.float32) * mc[None, :, None]
        x3 = xc.astype(jnp.float32).reshape(-1, m, ds).transpose(1, 0, 2)
        s = s + jnp.einsum("mck,mcd->mkd", oh, x3, precision="highest")
        c = c + jnp.sum(oh, axis=1)
        return (s, c), None

    init = (
        jnp.zeros((m, k, ds), jnp.float32),
        jnp.zeros((m, k), jnp.float32),
    )
    (sums, counts), _ = jax.lax.scan(
        body, init,
        (xp.reshape(-1, chunk, d), mask.reshape(-1, chunk)),
    )
    return sums, counts


@functools.partial(
    jax.jit, static_argnames=("cap_frac", "interpret")
)
def pq_assign_stats_verified(
    codebooks: Array,
    x: Array,
    *,
    cap_frac: float = 1 / 16,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Assignment-exact fused statistics: sums/counts whose cell
    memberships equal the exact-f32-einsum oracle's (first-index
    tie-breaks included), at near the 6-pass exact kernel's throughput.

    The plain exact mode (``pq_assign_stats(compute_dtype=jnp.float32)``)
    carries ~2^-17 score error + 2^-15 packed-key tie coarsening
    (99.994% oracle agreement at the flagship shape).  Here every row
    where that error could have changed an argmin is margin-flagged
    in-kernel (sound bound, measured ~3% of rows); the flagged rows are
    re-scored with the exact einsum, and rows whose assignment changed
    have their contribution *moved* between cells — counts become
    exactly the oracle's, sums equal the oracle's up to f32 accumulation
    order.  If the flagged count ever exceeds ``cap_frac * n``
    (pathological near-tie data), the whole pass falls back to the
    chunked einsum oracle — correct at any flag rate.

    Composes with the chunked/streamed trainers via
    ``compute_dtype="verified"``.
    """
    from ..pq import primitives

    m, k, ds = codebooks.shape
    n, d = x.shape
    if d != m * ds:
        raise ValueError(
            f"Quantizer and vector length mismatch: input has {d} columns, "
            f"quantizer reconstructs {m * ds}"
        )
    kp_probe = _round_up(k, 8)
    # Tighter budget than the plain kernel: the margin/flag computation
    # keeps ~3 extra (rows, block_n)-sized transients live per group.
    block_n, groups = _choose_stats_tiling(
        m, kp_probe, d, 4, exact=True, budget=10 * (1 << 20)
    )
    W, c_sqn, kp = pack_block_diagonal(codebooks, jnp.float32, scale=2.0)
    Wt = trunc_split2_bf16_stacked(W.T)
    idx_bits = max(1, (kp - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1
    cn = jnp.sqrt(jnp.einsum("mkd,mkd->mk", codebooks, codebooks,
                             precision="highest"))
    esq = (((2.0 ** -14) * 2.0 * jnp.max(cn, axis=1)) ** 2)[:, None].astype(
        jnp.float32
    )

    kernel = functools.partial(
        _stats_verify_kernel, n=n, m=m, kp=kp, groups=groups,
        idx_mask=idx_mask, block_n=block_n,
    )
    sums_full, counts_full, codes_t, flags = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, block_n),),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m * kp, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m * kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m * kp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m * kp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m * kp, d), jnp.float32),
            jax.ShapeDtypeStruct((m * kp, 1), jnp.float32),
            jax.ShapeDtypeStruct((m, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(x.astype(jnp.float32), Wt, c_sqn, esq)

    sums3 = sums_full.reshape(m, kp, d)
    counts = counts_full.reshape(m, kp)[:, :k]
    sums = jnp.stack(
        [jax.lax.dynamic_slice(sums3[j], (0, j * ds), (kp, ds)) for j in range(m)]
    )[:, :k, :]

    # Move flagged rows whose exact argmin differs from the kernel's.
    # Compaction is scatter-free (the same fix that took
    # pq_encode_verified from 20.7 to 31.5M vec/s): XLA TPU scatters
    # serialize, and jnp.nonzero pays ~13 ms of internal scatter at
    # n=1M, so the flagged rows are collected with top_k over the
    # flag-masked negated iota instead (~2 ms).  A 4x mid-tier cap
    # softens the full-fallback cliff for moderately tie-heavy data.
    row_flag = flags[0] > 0
    count = jnp.sum(row_flag)
    chunk = min(16384, max(256, n))
    cap = min(max(chunk, -(-int(n * cap_frac) // chunk) * chunk), n)
    cap2 = min(4 * cap, n)
    iota = jax.lax.iota(jnp.int32, n)
    masked = jnp.where(row_flag, -iota, jnp.int32(-n - 1))

    def corrected(cap):
        def go():
            neg, _ = jax.lax.top_k(masked, cap)
            rows = -neg  # first `cap` flagged rows ascending; pads = n + 1
            valid = (jnp.arange(cap) < count).astype(jnp.float32)
            xf = jnp.take(x, rows, axis=0, mode="fill",
                          fill_value=0).astype(jnp.float32)  # (cap, d)
            # Pad rows gather row 0's codes but contribute nothing (their
            # diff is zeroed by `valid`).
            old = jnp.take(codes_t, jnp.clip(rows, 0, n - 1), axis=1)
            pad = (-cap) % chunk
            xfp = jnp.pad(xf, ((0, pad), (0, 0)))
            new = jax.lax.map(
                lambda xc: primitives.quantize_batch(codebooks, xc, dtype=jnp.int32),
                xfp.reshape(-1, chunk, d),
            ).reshape(-1, m)[:cap].T  # (m, cap)
            diff = (
                jax.nn.one_hot(new, k, dtype=jnp.float32)
                - jax.nn.one_hot(old, k, dtype=jnp.float32)
            ) * valid[None, :, None]  # (m, cap, k)
            x3 = xf.reshape(cap, m, ds).transpose(1, 0, 2)  # (m, cap, ds)
            dsum = jnp.einsum("mck,mcd->mkd", diff, x3, precision="highest")
            return sums + dsum, counts + jnp.sum(diff, axis=1)
        return go

    fallback = lambda: _einsum_stats_chunked(codebooks, x, chunk)  # noqa: E731
    return jax.lax.cond(
        count <= cap,
        corrected(cap),
        (lambda: jax.lax.cond(count <= cap2, corrected(cap2), fallback))
        if cap2 > cap
        else fallback,
    )
