"""Generate the vendored RNG / sampling golden fixtures.

The 1e-5 parity gate (BASELINE.md) rests on the conformance stack
(``reductive_tpu.conformance``) reproducing the reference's RNG streams
bit-for-bit: ChaCha8 master (``rand_chacha`` 0.3 semantics, seeded via
``rand_core`` 0.6's ``seed_from_u64``), per-subquantizer XorShift forks
(``rand_xorshift`` 0.3), Lemire rejection sampling (``rand`` 0.8
``UniformInt``), and the ``UniformFloat<f32>`` corpus fill.  No Rust
toolchain exists in this environment, so the streams cannot be diffed
against a live reference run; instead this script pins every stage as a
committed JSON artifact.  ``tests/test_conformance.py::test_golden_rng_streams``
regenerates each stage from the implementation and asserts exact
equality — any drift in a refactor (word order, fill order, fork order,
rejection-zone arithmetic, index packing) fails loudly instead of merely
nudging a loss inside a tolerance band.

Stages pinned per seed (42, 1, 7 — the reference test seed plus two):

* ``seed_bytes``       — the PCG32 ``seed_from_u64`` expansion (hex).
* ``chacha8_words``    — first 64 keystream u32 words of the master.
* ``xorshift_seeds``   — the 16-byte fork seeds for m=10 subquantizers
                         drawn off a fresh master (hex).
* ``xorshift_words``   — first 16 u32 outputs of the first fork.
* ``uniform_head``     — first 8 f32 values of the (256, 20) gate corpus
                         (bit-exact: ``(u >> 9) * 2^-23``).
* ``uniform_sha256``   — digest of the full corpus bytes.
* ``pq_indices_sha256``/``pq_indices_head`` — the (1, 10, 128)
                         initial-centroid index tensor of the PQ gate
                         scenario, drawn from the post-corpus master
                         exactly as ``train_pq_conformant`` consumes it.
* ``opq_indices_sha256``/``opq_indices_head`` — the (10, 128) direct
                         master draws of the OPQ gate scenario.

Run from the repo root:  python tests/goldens/generate_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from reductive_tpu.conformance import (
    ChaCha8Rng,
    XorShiftRng,
    _pq_initial_indices,
    _seed_from_u64,
    distinct_indices,
    uniform_array_f32,
)

SEEDS = (42, 1, 7)
GATE_SHAPE = (256, 20)  # the reference quality-gate corpus (src/pq/pq.rs:431-436)
GATE_M, GATE_K = 10, 128  # m=10 subquantizers, 7 bits


def one_seed(seed: int) -> dict:
    entry = {"seed_bytes": _seed_from_u64(seed, 32).hex()}

    master = ChaCha8Rng.seed_from_u64(seed)
    entry["chacha8_words"] = [int(w) for w in master.next_words(64)]

    master = ChaCha8Rng.seed_from_u64(seed)
    forks = [XorShiftRng.from_rng(master) for _ in range(GATE_M)]
    entry["xorshift_seeds"] = [
        b"".join(int(v).to_bytes(4, "little") for v in (f.x, f.y, f.z, f.w)).hex()
        for f in forks
    ]
    entry["xorshift_words"] = [forks[0].next_u32() for _ in range(16)]

    # The gate corpus and the exact index draws the conformant trainers
    # consume (master state continues past the corpus generation, as in
    # the reference tests which pass &mut rng after generating the data).
    master = ChaCha8Rng.seed_from_u64(seed)
    corpus = uniform_array_f32(master, GATE_SHAPE)
    entry["uniform_head"] = [float(v) for v in corpus.ravel()[:8]]
    entry["uniform_sha256"] = hashlib.sha256(corpus.tobytes()).hexdigest()

    pq_idx = _pq_initial_indices(master, GATE_SHAPE[0], GATE_M, GATE_K, 1)
    entry["pq_indices_head"] = [int(v) for v in pq_idx.ravel()[:16]]
    entry["pq_indices_sha256"] = hashlib.sha256(
        pq_idx.astype(np.int64).tobytes()
    ).hexdigest()

    # OPQ draws directly off the master (no forks), one subquantizer after
    # another (src/pq/opq.rs:138-159) — regenerate the post-corpus state.
    master = ChaCha8Rng.seed_from_u64(seed)
    uniform_array_f32(master, GATE_SHAPE)
    opq_idx = np.stack(
        [distinct_indices(master, GATE_SHAPE[0], GATE_K) for _ in range(GATE_M)]
    )
    entry["opq_indices_head"] = [int(v) for v in opq_idx.ravel()[:16]]
    entry["opq_indices_sha256"] = hashlib.sha256(
        opq_idx.astype(np.int64).tobytes()
    ).hexdigest()

    # End-to-end gate objectives (mean Euclidean reconstruction loss, the
    # reference's avg_euclidean_loss metric — src/pq/pq.rs:365-376) from
    # the conformant trainers at this seed.  Recorded on the CPU backend;
    # asserted at 1e-3 relative (float-summation-order across backends).
    import jax.numpy as jnp

    from reductive_tpu.conformance import (
        reference_test_instances,
        train_gaussian_opq_conformant,
        train_opq_conformant,
        train_pq_conformant,
    )

    def avg_loss(pq, x):
        rec = pq.reconstruct_batch(pq.quantize_batch(x))
        return float(
            jnp.mean(jnp.sqrt(jnp.sum((jnp.asarray(x) - rec) ** 2, axis=1)))
        )

    for name, trainer in (
        ("pq", train_pq_conformant),
        ("opq", train_opq_conformant),
        ("gaussian_opq", train_gaussian_opq_conformant),
    ):
        x, master = reference_test_instances(seed, GATE_SHAPE)
        model = trainer(x, GATE_M, 7, 10, 1, master=master)
        entry[f"{name}_objective"] = avg_loss(model, x)
    return entry


def main() -> None:
    out = {
        "description": "Pinned conformance-RNG streams; see generate_goldens.py",
        "gate": {"shape": list(GATE_SHAPE), "m": GATE_M, "k": GATE_K},
        "seeds": {str(s): one_seed(s) for s in SEEDS},
    }
    path = Path(__file__).parent / "rng_reference.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
