"""Benchmark suite: the reference's criterion harness shapes plus the
BASELINE.json workload configs, on real hardware.

The reference defines benchmark *shapes* but stores no numbers
(``benches/pq.rs``, ``benches/linalg.rs`` — see BASELINE.md).  This runner
measures the TPU build on those same shapes plus the five driver-set
workload configs, and prints one JSON line per benchmark (plus a summary
file when ``--out`` is given).

Usage:  python benches/run.py [--quick] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def sync(x) -> None:
    """Force completion with a host fetch (works through the axon tunnel)."""
    jnp.sum(jnp.asarray(x, dtype=jnp.float32) if x.dtype != jnp.float32 else x).item()


def timeit(fn, *args, iters=5):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters


RESULTS = []


def record(name, seconds, unit="ms", extra=None):
    value = seconds * 1e3 if unit == "ms" else seconds
    entry = {"bench": name, "value": round(value, 4), "unit": unit}
    if extra:
        entry.update(extra)
    RESULTS.append(entry)
    print(json.dumps(entry))


def bench_linalg(quick):
    """Reference shapes: benches/linalg.rs:8-59."""
    from reductive_tpu.linalg import covariance, squared_euclidean_distance

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (50, 100), dtype=jnp.float32)
    cov = jax.jit(lambda x: covariance(x, 0))
    record("covariance_axis0_50x100", timeit(cov, a))

    a1 = jax.random.normal(key, (100, 50), dtype=jnp.float32)
    cov1 = jax.jit(lambda x: covariance(x, 1))
    record("covariance_axis1_100x50", timeit(cov1, a1))

    u = jax.random.normal(key, (200, 50), dtype=jnp.float32)
    v = jax.random.normal(key, (50, 50), dtype=jnp.float32)
    # ix2_ix2: one matrix x matrix call (benches/linalg.rs:52-59).
    sq = jax.jit(squared_euclidean_distance)
    record("squared_euclidean_distance_200x50_50x50", timeit(sq, u, v))
    # ix1_ix1 / ix1_ix2 (benches/linalg.rs:24-50): the reference loops the
    # vec x vec / vec x mat paths row-by-row on the host; the TPU-idiomatic
    # equivalent vmaps the same single-vector code paths into one dispatch
    # (10,000 / 200 calls' worth of work respectively).
    ix1_ix1 = jax.jit(
        lambda u, v: jax.vmap(
            lambda a: jax.vmap(lambda b: squared_euclidean_distance(a, b))(v)
        )(u)
    )
    record(
        "squared_euclidean_distance_ix1_ix1_200x50_50x50",
        timeit(ix1_ix1, u, v),
        extra={"note": "vec x vec path vmapped over all 10k row pairs"},
    )
    ix1_ix2 = jax.jit(
        lambda u, v: jax.vmap(lambda a: squared_euclidean_distance(a, v))(u)
    )
    record(
        "squared_euclidean_distance_ix1_ix2_200x50_50x50",
        timeit(ix1_ix2, u, v),
        extra={"note": "vec x mat path vmapped over 200 rows"},
    )


def bench_reference_pq_shapes(quick):
    """Reference shapes: benches/pq.rs:8-55 — 100x128, m=16, k=16 (4 bit)."""
    from reductive_tpu.pq import primitives

    key = jax.random.PRNGKey(1)
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (100, 128), dtype=jnp.float32)
    cb = jax.random.normal(kc, (16, 16, 8), dtype=jnp.float32)
    enc = jax.jit(lambda c, x: primitives.quantize_batch(c, x, dtype=jnp.uint8))
    record("pq_quantize_batch_100x128_m16_k16", timeit(enc, cb, x))
    codes = enc(cb, x)
    dec = jax.jit(primitives.reconstruct_batch)
    record("pq_reconstruct_batch_100x16", timeit(dec, cb, codes))

    # One-by-one harnesses (benches/pq.rs:15-25,35-46): the reference
    # loops quantize_vector / reconstruct over rows; here the same
    # single-vector code paths are vmapped into one dispatch.
    enc1 = jax.jit(
        lambda c, x: jax.vmap(lambda v: primitives.quantize(c, v, dtype=jnp.uint8))(x)
    )
    record(
        "pq_quantize_rowwise_100x128_m16_k16", timeit(enc1, cb, x),
        extra={"note": "single-vector quantize path vmapped over 100 rows"},
    )
    dec1 = jax.jit(lambda c, q: jax.vmap(lambda row: primitives.reconstruct(c, row))(q))
    record(
        "pq_reconstruct_rowwise_100x16", timeit(dec1, cb, codes),
        extra={"note": "single-vector reconstruct path vmapped over 100 rows"},
    )


def bench_config1(quick):
    """PQ m=4, k=256 on 10k x 64 Gaussian: train + encode + reconstruct."""
    from reductive_tpu import train_pq

    key = jax.random.PRNGKey(2)
    kx, kt = jax.random.split(key)
    n = 2_000 if quick else 10_000
    x = jax.random.normal(kx, (n, 64), dtype=jnp.float32)

    t0 = time.perf_counter()
    pq = train_pq(kt, x, 4, 8, 10, 1)
    sync(pq.codebooks)
    record("config1_train_pq_m4_k256_10kx64", time.perf_counter() - t0,
           extra={"note": "includes jit compile"})

    enc = jax.jit(lambda p, x: p.quantize_batch(x))
    codes = enc(pq, x)
    record("config1_encode", timeit(enc, pq, x))
    dec = jax.jit(lambda p, c: p.reconstruct_batch(c))
    record("config1_reconstruct", timeit(dec, pq, codes))
    rec = dec(pq, codes)
    mse = float(jnp.mean((x - rec) ** 2))
    RESULTS.append({"bench": "config1_recon_mse", "value": round(mse, 6), "unit": "mse"})
    print(json.dumps(RESULTS[-1]))


def bench_config2(quick):
    """PQ m=16, k=256 on 1M SIFT-style 128-d vectors: the headline encode."""
    from reductive_tpu.ops import pq_encode

    key = jax.random.PRNGKey(3)
    kx, kc = jax.random.split(key)
    n = 100_000 if quick else 1_000_000
    x = jax.random.normal(kx, (n, 128), dtype=jnp.float32)
    cb = jax.random.normal(kc, (16, 256, 8), dtype=jnp.float32)
    fast = jax.jit(lambda c, x: pq_encode(c, x, dtype=jnp.uint8))
    dt = timeit(fast, cb, x, iters=8)
    record("config2_encode_1Mx128_m16_k256_kernel", dt,
           extra={"vectors_per_sec": round(n / dt, 1)})

    if jax.devices()[0].platform != "cpu":
        from reductive_tpu.ops import pq_decode

        codes = fast(cb, x)
        for splits, name in ((3, "exact"), (1, "fast"), ("int8", "int8")):
            dec = lambda: pq_decode(cb, codes, splits=splits)
            dt = timeit(lambda: dec(), iters=8)
            record(f"config2_decode_1Mx128_kernel_{name}", dt,
                   extra={"vectors_per_sec": round(n / dt, 1)})


def bench_config3(quick):
    """GaussianOpq m=20, k=256 on 300-d embeddings (closed-form rotation).

    (BASELINE.json says m=16 on 300-d, but 300 % 16 != 0 violates the
    reference's own divisibility invariant — src/pq/pq.rs:84-89 — so the
    nearest valid config m=20, ds=15 is used.)
    """
    from reductive_tpu import train_gaussian_opq

    key = jax.random.PRNGKey(4)
    kx, kt = jax.random.split(key)
    n = 4_000 if quick else 50_000
    x = jax.random.normal(kx, (n, 300), dtype=jnp.float32)
    t0 = time.perf_counter()
    pq = train_gaussian_opq(kt, x, 20, 8, 10, 1)
    sync(pq.codebooks)
    record("config3_train_gaussian_opq_m20_k256_300d", time.perf_counter() - t0,
           extra={"note": "includes jit compile"})


def bench_config4(quick):
    """Opq full alternating optimization, m=24, k=256 on 768-d embeddings."""
    from reductive_tpu import train_opq

    key = jax.random.PRNGKey(5)
    kx, kt = jax.random.split(key)
    n = 4_000 if quick else 20_000
    x = jax.random.normal(kx, (n, 768), dtype=jnp.float32)
    t0 = time.perf_counter()
    pq = train_opq(kt, x, 24, 8, 5 if quick else 10)
    sync(pq.codebooks)
    record("config4_train_opq_m24_k256_768d", time.perf_counter() - t0,
           extra={"note": "includes jit compile"})


def bench_config5(quick):
    """Streaming encode + ADC search on a 768-d corpus."""
    from reductive_tpu import Pq
    from reductive_tpu.data import stream_encode_batches
    from reductive_tpu.search import search

    key = jax.random.PRNGKey(6)
    kx, kc, kq = jax.random.split(key, 3)
    # NOTE: in this environment host->device goes through a network tunnel,
    # so the streaming phase measures tunnel bandwidth, not the encode
    # pipeline (on a real TPU VM the same path rides PCIe).  Keep the
    # streamed corpus small; config2 measures on-device encode throughput.
    n = 20_000 if quick else 65_536
    batch = 16_384
    d, m, k = 768, 24, 256
    cb = jax.random.normal(kc, (m, k, d // m), dtype=jnp.float32)
    pq = Pq(codebooks=cb)

    import numpy as np

    rng = np.random.default_rng(0)
    chunks = [
        (off, rng.standard_normal((min(batch, n - off), d)).astype(np.float32))
        for off in range(0, n, batch)
    ]
    t0 = time.perf_counter()
    codes = np.concatenate(
        [c for _, c in stream_encode_batches(pq, iter(chunks), batch_size=batch)]
    )
    dt = time.perf_counter() - t0
    record("config5_stream_encode_768d", dt,
           extra={"vectors_per_sec": round(n / dt, 1),
                  "note": "includes compile; tunnel-bound host->device here"})

    queries = jax.random.normal(kq, (16, d), dtype=jnp.float32)
    codes_j = jnp.asarray(codes)
    if not quick:
        # Search over a larger on-device corpus than was streamed.  The
        # fused kernel keeps distances in VMEM — the einsum path would
        # materialize a ~10 GB (n, m, k) tensor at this shape.
        from reductive_tpu.ops import pq_encode

        extra_codes = pq_encode(
            pq.codebooks,
            jax.random.normal(kx, (500_000 - n, d), dtype=jnp.float32),
            dtype=jnp.uint8,
        )
        codes_j = jnp.concatenate([codes_j, extra_codes])
        n = codes_j.shape[0]
    fn = lambda: search(pq, queries, codes_j, top_k=10)[1]
    dt = timeit(lambda: fn(), iters=3)
    record("config5_adc_search_16q", dt,
           extra={"corpus": n, "queries_x_vectors_per_sec": round(16 * n / dt, 1)})
    if jax.devices()[0].platform != "cpu":
        fnk = lambda: search(pq, queries, codes_j, top_k=10, method="kernel")[1]
        dt = timeit(lambda: fnk(), iters=3)
        record("config5_adc_search_16q_kernel", dt,
               extra={"corpus": n, "queries_x_vectors_per_sec": round(16 * n / dt, 1)})
        fn8 = lambda: search(pq, queries, codes_j, top_k=10, method="kernel",
                             splits="int8")[1]
        dt = timeit(lambda: fn8(), iters=3)
        record("config5_adc_search_16q_int8lut", dt,
               extra={"corpus": n, "queries_x_vectors_per_sec": round(16 * n / dt, 1)})


def bench_config6(quick):
    """Large-corpus Lloyd's iteration via the fused assign+stats kernel:
    1M x 128, m=16, k=256 — a shape whose (m, n, k) distance tensor (16 GB)
    cannot be materialized on one chip."""
    from reductive_tpu.pq.train import lloyd_iteration_chunked

    key = jax.random.PRNGKey(7)
    n = 100_000 if quick else 1_000_000
    m, k, ds = 16, 256, 8
    x = jax.random.normal(key, (n, m * ds), dtype=jnp.float32)
    cb = jax.random.normal(jax.random.PRNGKey(8), (m, k, ds), dtype=jnp.float32)
    sumsq = jnp.sum(x.reshape(n, m, ds) ** 2, axis=(0, 2))

    on_tpu = jax.devices()[0].platform != "cpu"
    for cd, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        fn = lambda: lloyd_iteration_chunked(
            x, cb, sumsq, use_kernel=on_tpu, compute_dtype=cd
        )
        dt = timeit(lambda: fn(), iters=3 if quick else 8)
        record(f"config6_lloyd_iteration_1Mx128_{name}", dt,
               extra={"vectors_per_sec": round(n / dt, 1)})
        if not on_tpu:
            break  # CPU fallback path has no dtype split worth timing

    # Full chunked OPQ alternation (stats + streamed Procrustes) at scale.
    import functools

    from reductive_tpu.pq.opq import _opq_iteration_chunked

    R = jnp.eye(m * ds, dtype=jnp.float32)
    step = jax.jit(functools.partial(
        _opq_iteration_chunked, chunk=32768, use_kernel=on_tpu,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    ))
    dt = timeit(lambda: step(x, R, cb), iters=2 if quick else 5)
    record("config6_opq_alternation_1Mx128", dt,
           extra={"vectors_per_sec": round(n / dt, 1)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes (CPU/CI)")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated bench group names")
    args = ap.parse_args()

    groups = {
        "linalg": bench_linalg,
        "refshapes": bench_reference_pq_shapes,
        "config1": bench_config1,
        "config2": bench_config2,
        "config3": bench_config3,
        "config4": bench_config4,
        "config5": bench_config5,
        "config6": bench_config6,
    }
    selected = args.only.split(",") if args.only else list(groups)
    for name in selected:
        groups[name](args.quick)

    if args.out:
        Path(args.out).write_text(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
