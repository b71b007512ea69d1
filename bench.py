"""Headline benchmark: PQ encode throughput on one TPU chip.

Measures the fused Pallas kernel on the reference's flagship encode shape
(BASELINE.md / BASELINE.json): d=128 vectors, m=16 subquantizers, k=256
centroids, uint8 codes.  The driver-set north star is >=100M vectors/sec
on a 16-chip v5e-16; encode is embarrassingly parallel across chips
(zero collectives — see ``reductive_tpu.parallel.encode_sharded``), so the
per-chip share of that target is 6.25M vec/s.  ``vs_baseline`` reports the
multiple of that per-chip share.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "vectors/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _sync(x) -> float:
    """Force completion with a host fetch (block_until_ready alone does not
    synchronize through the axon remote tunnel)."""
    return float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    from reductive_tpu.ops import pq_encode
    from reductive_tpu.pq import primitives

    on_tpu = jax.devices()[0].platform != "cpu"
    m, k, ds = 16, 256, 8
    d = m * ds
    # 8M rows: the large-batch serving regime — fixed per-dispatch
    # overhead (~2-3 ms through a tunneled host link) amortizes and
    # the kernel rate shows (144M vs ~100M vec/s at 1M batches).
    n = 8_000_000 if on_tpu else 20_000

    key = jax.random.PRNGKey(0)
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (n, d), dtype=jnp.float32)
    codebooks = jax.random.normal(kc, (m, k, ds), dtype=jnp.float32)

    if on_tpu:
        fn = jax.jit(lambda c, x: pq_encode(c, x, block_n=2048, dtype=jnp.uint8))
    else:  # CPU fallback: einsum path (Mosaic unavailable)
        fn = jax.jit(lambda c, x: primitives.quantize_batch(c, x, dtype=jnp.uint8))

    _sync(fn(codebooks, x))  # compile + warm
    iters = 4 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(codebooks, x)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters

    vec_per_sec = n / dt
    per_chip_target = 100e6 / 16  # v5e-16 north star, per chip
    print(
        json.dumps(
            {
                "metric": "pq_encode_throughput_d128_m16_k256_per_chip",
                "value": round(vec_per_sec, 1),
                "unit": "vectors/sec/chip",
                # Multiple of the north star's PER-CHIP SHARE (100M / 16
                # chips): encode is zero-collective, so the linear-scaling
                # assumption behind the division is stated, not hidden.
                "vs_baseline": round(vec_per_sec / per_chip_target, 3),
                "baseline_note": "v5e-16 target / 16 chips; encode is "
                "embarrassingly parallel (zero collectives)",
            }
        )
    )


if __name__ == "__main__":
    main()
