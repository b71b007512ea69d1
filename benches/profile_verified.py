"""Decompose pq_encode_verified's overhead vs the plain 3-pass kernel.

Round-3 measurement (results_v5e_r3.json, config2): verified 20.7M vec/s
vs 43.5M for the exact 3-pass kernel it wraps — a 2.1x penalty to
re-score ~3% of rows.  This script times each stage at the flagship
shape to locate the cost:

  a. pq_encode(compute_dtype=f32)          — the 3-pass floor
  b. verify kernel alone (codes + flags)   — kernel-side flag overhead
  c. nonzero + gather + exact re-encode    — the fix stage
  d. full pq_encode_verified               — end to end

Usage: python benches/profile_verified.py [--n 1048576] [--caps 1/16 ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import functools
import json

import jax
import jax.numpy as jnp

from reductive_tpu.ops import assign as A
from reductive_tpu.utils.profiling import benchmark


def verify_kernel_only(codebooks, x, block_n=None):
    """The pallas_call stage of pq_encode_verified, without the fix."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k, ds = codebooks.shape
    n, d = x.shape
    W, c_sqn, kp = A.pack_block_diagonal(codebooks, jnp.float32, scale=2.0)
    Wt = A.trunc_split2_bf16_stacked(W.T)
    bn, groups = A._choose_tiling(m, kp, d, 4, block_n, exact=True)
    idx_bits = max(1, (kp - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1
    cn = jnp.sqrt(jnp.einsum("mkd,mkd->mk", codebooks, codebooks,
                             precision="highest"))
    esq = (((2.0 ** -14) * 2.0 * jnp.max(cn, axis=1)) ** 2)[:, None].astype(
        jnp.float32)
    kernel = functools.partial(
        A._encode_verify_kernel, m=m, kp=kp, groups=groups,
        idx_mask=idx_mask, block_n=bn,
    )
    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(n, bn),),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m * kp, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m * kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
    )(x, Wt, c_sqn, esq)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 20)
    p.add_argument("--d", type=int, default=128)
    p.add_argument("--m", type=int, default=16)
    p.add_argument("--bits", type=int, default=8)
    args = p.parse_args()
    n, d, m, k = args.n, args.d, args.m, 1 << args.bits

    kx, kc = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (n, d), jnp.float32)
    codebooks = jax.random.normal(kc, (m, k, d // m), jnp.float32)
    out = {}

    dt = benchmark(
        lambda: A.pq_encode(codebooks, x, compute_dtype=jnp.float32), iters=10)
    out["a_3pass_exact"] = {"ms": round(dt * 1e3, 2),
                            "mvec_s": round(n / dt / 1e6, 1)}

    vk = jax.jit(verify_kernel_only)
    codes, flags = vk(codebooks, x)
    dt = benchmark(lambda: vk(codebooks, x), iters=10)
    nflag = int(jnp.sum(flags[0] > 0))
    out["b_verify_kernel"] = {"ms": round(dt * 1e3, 2),
                              "mvec_s": round(n / dt / 1e6, 1),
                              "flag_rate": round(nflag / n, 4)}

    # Fix stage alone: nonzero + gather + chunked exact einsum + scatter.
    from reductive_tpu.pq import primitives

    cap_frac = 1 / 16
    chunk = 16384
    cap = max(chunk, int(n * cap_frac) // chunk * chunk)

    @jax.jit
    def fix(codes_t, flags, x):
        codes = codes_t.T
        row_flag = flags[0] > 0
        (rows,) = jnp.nonzero(row_flag, size=cap, fill_value=0)
        xs = jnp.take(x, rows, axis=0)
        outc = jax.lax.map(
            lambda xc: primitives.quantize_batch(codebooks, xc,
                                                 dtype=jnp.int32),
            xs.reshape(-1, chunk, d),
        ).reshape(-1, m)
        return codes.at[rows].set(outc)

    fix(codes, flags, x).block_until_ready()
    dt = benchmark(lambda: fix(codes, flags, x), iters=10)
    out["c_fix_stage"] = {"ms": round(dt * 1e3, 2), "cap_rows": cap}

    dt = benchmark(lambda: A.pq_encode_verified(codebooks, x), iters=10)
    out["d_full_verified"] = {"ms": round(dt * 1e3, 2),
                              "mvec_s": round(n / dt / 1e6, 1)}

    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
