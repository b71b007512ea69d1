"""Fused PQ-decode Pallas kernel: codes → reconstructions at MXU rate.

The reference decodes row-at-a-time with scalar gathers
(``src/pq/primitives.rs:150-173``); the XLA one-hot einsum path
(:func:`reductive_tpu.pq.primitives.reconstruct_batch`) is ~5x faster than
a TPU gather but pays a 16x lane-padding tax (per-subquantizer output is
only ``ds`` lanes wide) plus the 6-pass f32 ``HIGHEST`` matmul.  This
kernel restates decode as the transpose of the encode kernel's
block-diagonal trick — ``onehot(codes) @ W`` where ``W`` is the
``(m*kp, d)`` block-diagonal codebook — so the MXU runs one full-depth,
full-width matmul per block.

Exactness without 6 passes: the one-hot side is exactly representable in
bfloat16 (0/1), and each output element receives exactly **one** nonzero
product (column ``c`` of the block-diagonal ``W`` is nonzero only in its
own subquantizer's row segment, where the one-hot has a single 1).  So
splitting ``W = W0 + W1 + W2`` into three bfloat16 components (8 mantissa
bits each, Dekker-style residuals covering f32's 24) makes
``sum_s onehot @ W_s`` reproduce the f32 codebook entries **bit-exactly**
with 3 throughput-mode matmuls instead of 6.  ``splits=1`` is the serving
fast path: reconstructions rounded to bfloat16 precision (~2^-9
relative), ~3x faster again.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .assign import _round_up

__all__ = ["pq_decode", "split_bf16", "split_codebook_bf16"]


def lane_multihot(codes, m: int, kp: int, dtype) -> Array:
    """Per-subquantizer one-hot along lanes: ``(bn, m*kp)`` with a 1 at
    lane ``j*kp + codes[i, j]`` for each subquantizer ``j``.  The in-VMEM
    building block shared by the decode and ADC kernels.

    Two constructions: for ``kp >= 128`` (full lane tiles) each segment is
    compared separately and concatenated; for ``kp < 128`` that would pad
    every ``(bn, kp)`` piece to 128 lanes (16 MB of transients at m=16,
    kp=16, bn=2048 — a VMEM OOM; Mosaic also rejects the
    ``(bn, m, kp) -> (bn, m*kp)`` reshape that would avoid it), so the
    expected code is *broadcast per segment* by one tiny MXU dot against
    a segment-selector matrix and compared against a segment-local iota
    in a single full-width pass (code values < 128 are exact in bf16, so
    the f32 equality is exact).

    Codes arrive in their storage dtype (u8 for k <= 256) and are widened
    here, INSIDE the kernel: converting at the pallas_call boundary made
    XLA materialize an int32 copy of the whole corpus when the call sat
    in a scan body (``convert(slice(x))`` is hoisted to
    ``slice(convert(x))`` — a 10 GB allocation against the 104.9M-code
    config-#5 corpus) and quadrupled the kernel's code DMA traffic."""
    codes = codes.astype(jnp.int32)
    if kp >= 128:
        return _multihot_concat(codes, m, kp, dtype)
    return _multihot_broadcast(codes, m, kp, dtype)


def _multihot_concat(codes, m: int, kp: int, dtype) -> Array:
    """Per-segment compare + concatenate (needs ``kp`` a lane-tile multiple
    to avoid padding each piece to 128 lanes)."""
    bn = codes.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bn, kp), 1)
    return jnp.concatenate(
        [(lane == codes[:, j][:, None]).astype(dtype) for j in range(m)],
        axis=1,
    )


def _multihot_broadcast(codes, m: int, kp: int, dtype) -> Array:
    """One full-width pass: broadcast each segment's code value across its
    ``kp`` lanes with a tiny MXU dot and compare against a segment-local
    iota.  Exact only while code values are exactly representable in
    bfloat16, i.e. ``kp <= 256``."""
    bn = codes.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bn, m * kp), 1)
    sub = (lane % kp).astype(jnp.float32)
    # E[r, c] = 1 where column c belongs to segment r: expected = codes @ E.
    colseg = jax.lax.broadcasted_iota(jnp.int32, (m, m * kp), 1) // kp
    rowidx = jax.lax.broadcasted_iota(jnp.int32, (m, m * kp), 0)
    E = (colseg == rowidx).astype(jnp.bfloat16)
    expected = jax.lax.dot_general(
        codes.astype(jnp.bfloat16),
        E,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, m*kp): the segment's code value on every one of its lanes
    return (sub == expected).astype(dtype)


def lane_multihot_packed(packed, m: int, kp: int, dtype):
    """Multi-hot from a *packed-u4* code block ``(bn, m/2)``: nibbles are
    split in VMEM and the one-hot blocks are emitted low-nibbles-first
    (all even subquantizers, then all odd) — the caller permutes the
    weight/table row blocks to match (:func:`packed_block_perm`), so no
    lane interleave is ever needed (Mosaic lowers lane-granular shuffles
    poorly)."""
    packed = packed.astype(jnp.int32)  # widen in VMEM (see lane_multihot)
    codes_perm = jnp.concatenate([packed & 0xF, (packed >> 4) & 0xF], axis=1)
    return lane_multihot(codes_perm, m, kp, dtype)


def packed_block_perm(m: int):
    """Subquantizer-block order produced by :func:`lane_multihot_packed`:
    even indices first, then odd."""
    return list(range(0, m, 2)) + list(range(1, m, 2))


def fit_block_n(block_n: int, resident: int, per_row: int, what: str,
                fallback: str, budget: int = 13 * (1 << 20)) -> int:
    """Shrink ``block_n`` until resident + block_n * per_row bytes fit the
    VMEM budget; raise an informative error when even 128 rows cannot."""
    while block_n > 128 and resident + block_n * per_row > budget:
        block_n //= 2
    if resident + 128 * per_row > budget:
        raise ValueError(
            f"no VMEM-feasible tiling for {what}; {fallback}"
        )
    return block_n


def split_bf16(W: Array, splits: int) -> Array:
    """Split an f32 matrix into ``splits`` stacked bfloat16 components
    whose f32 sum reconstructs it (exactly, for ``splits=3``,
    Dekker-style residuals)."""
    parts = []
    residual = W.astype(jnp.float32)
    for _ in range(splits):
        # The optimization barrier stops XLA from folding the bf16
        # round-trip into identity under --xla_allow_excess_precision
        # (which would zero every residual and silently drop exactness).
        p = jax.lax.optimization_barrier(residual.astype(jnp.bfloat16))
        parts.append(p)
        residual = residual - p.astype(jnp.float32)
    return jnp.stack(parts)


def pack_block_diag_f32(codebooks: Array, kp: int) -> Array:
    """The block-diagonal ``(m*kp, d)`` f32 codebook matrix (centroid rows
    padded to ``kp``, zeros off-diagonal) shared by the decode weight
    splits and the int8 weight quantizer."""
    m, k, ds = codebooks.shape
    W = jnp.zeros((m * kp, m * ds), dtype=jnp.float32)
    for j in range(m):
        W = jax.lax.dynamic_update_slice(
            W, codebooks[j].astype(jnp.float32), (j * kp, j * ds)
        )
    return W


def split_codebook_bf16(codebooks: Array, kp: int, splits: int) -> Array:
    """Pack ``(m, k, ds)`` codebooks into ``splits`` stacked bfloat16
    block-diagonal ``(m*kp, d)`` matrices whose f32 sum is exactly the
    original (for ``splits=3``)."""
    return split_bf16(pack_block_diag_f32(codebooks, kp), splits)


def _decode_kernel(codes_ref, w_ref, out_ref, *, m, kp, splits, packed=False):
    mh = lane_multihot_packed if packed else lane_multihot
    onehot = mh(codes_ref[:], m, kp, jnp.bfloat16)  # (bn, m*kp)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for s in range(splits):
        acc += jax.lax.dot_general(
            onehot,
            w_ref[s],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc


def _decode_kernel_int8(codes_ref, w_ref, scale_ref, out_ref, *, m, kp, packed=False):
    """Weight-only int8: the multi-hot is exact in int8, the quantized
    matrix is built once on the host side; int32 accumulation then a
    per-column affine dequant (``scale_ref`` row 0 = scale, row 1 =
    additive offset — zero for symmetric decode weights, ``m * min`` for
    affine ADC tables)."""
    mh = lane_multihot_packed if packed else lane_multihot
    onehot = mh(codes_ref[:], m, kp, jnp.int8)
    acc = jax.lax.dot_general(
        onehot,
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = acc.astype(jnp.float32) * scale_ref[0:1, :] + scale_ref[1:2, :]


@functools.partial(
    jax.jit, static_argnames=("splits", "block_n", "interpret", "packed")
)
def pq_decode(
    codebooks: Array,
    codes: Array,
    *,
    splits: int | str = 3,
    block_n: int | None = None,
    interpret: bool = False,
    packed: bool = False,
) -> Array:
    """Decode ``(n, m)`` codes to ``(n, d)`` reconstructions with the fused
    kernel.

    ``splits=3`` (default) is **bit-exact** against the f32 gather path;
    ``splits=1`` rounds the codebook to bfloat16 (~2^-9 relative error
    per entry); ``splits="int8"`` is the weight-only int8 serving mode —
    per-column symmetric quantization, so absolute error is ~2^-8 of each
    *column's max* (equal to the bf16 pass for well-scaled codebooks, but
    worse for columns with wide dynamic range) with the matmul at int8
    rate (measured 108.9M vs 90.9M vec/s at 1M×128).  Counterpart of the
    reference's ``reconstruct_batch`` (``src/pq/primitives.rs:150-173``).

    ``packed=True`` decodes a **packed-u4** code matrix (``(n, m/2)``
    bytes from :func:`reductive_tpu.ops.packing.pack_u4_codes`; requires
    ``k <= 16`` and even ``m``): nibbles are unpacked in VMEM and the
    weight row blocks are permuted to match — identical output to the
    unpacked decode at half the code HBM.
    """
    m, k, ds = codebooks.shape
    d = m * ds
    n = codes.shape[0]
    if packed:
        if m % 2 != 0:
            raise ValueError(f"packed u4 codes require even m, got {m}")
        if k > 16:
            raise ValueError(f"packed u4 codes require k <= 16, got {k}")
        if codes.ndim != 2 or codes.shape[1] != m // 2:
            raise ValueError(
                f"packed codes have shape {codes.shape}, expected (n, {m // 2})"
            )
    elif codes.ndim != 2 or codes.shape[1] != m:
        raise ValueError(
            f"Quantization length does not match number of subquantizers: "
            f"{codes.shape} vs m={m}"
        )
    kp = _round_up(k, 8)

    def _perm_rows(Wf):
        # Reorder kp-row blocks to the packed multi-hot's lo-then-hi order.
        return Wf.reshape(m, kp, d)[jnp.asarray(packed_block_perm(m))].reshape(
            m * kp, d
        )

    if splits == "int8":
        Wf = pack_block_diag_f32(codebooks, kp)
        scale = jnp.max(jnp.abs(Wf), axis=0) / 127.0  # per output column
        if packed:
            Wf = _perm_rows(Wf)
        W = jnp.round(Wf / jnp.maximum(scale, 1e-30)).astype(jnp.int8)
        scale_offset = jnp.stack([scale, jnp.zeros_like(scale)])  # (2, d)
        n_splits, w_itemsize = 1, 1
    else:
        Wf = pack_block_diag_f32(codebooks, kp)
        if packed:
            Wf = _perm_rows(Wf)
        W = split_bf16(Wf, splits)
        n_splits, w_itemsize = splits, 2

    if block_n is None:
        # onehot (bn, m*kp) bf16 is the dominant transient; keep it ~4 MB.
        block_n = max(128, min(2048, (4 << 20) // (m * kp * 2) // 128 * 128))
    block_n = fit_block_n(
        block_n,
        resident=n_splits * m * kp * d * w_itemsize,  # resident weights
        # kp<128 multihot carries full-width iota/expected transients.
        per_row=m * kp * 2 + (m * kp * 12 if kp < 128 else 0) + d * 8 + m * 4,
        what=f"m={m}, k~{kp}, d={d}, splits={splits}",
        fallback="use the gather/onehot path "
                 "(reductive_tpu.pq.primitives.reconstruct_batch)",
    )

    cm = m // 2 if packed else m  # code columns per row block
    if splits == "int8":
        kernel = functools.partial(_decode_kernel_int8, m=m, kp=kp, packed=packed)
        out = pl.pallas_call(
            kernel,
            grid=(pl.cdiv(n, block_n),),
            in_specs=[
                pl.BlockSpec((block_n, cm), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m * kp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
            interpret=interpret,
        )(codes, W, scale_offset)
        return out.astype(codebooks.dtype)

    kernel = functools.partial(_decode_kernel, m=m, kp=kp, splits=splits, packed=packed)
    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, block_n),),
        in_specs=[
            pl.BlockSpec((block_n, cm), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (splits, m * kp, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(codes, W)
    return out.astype(codebooks.dtype)
