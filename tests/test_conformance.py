"""Conformance-mode tests: the reference's RNG streams, replicated exactly.

Validates the generator stack bottom-up — the ChaCha permutation core
against the independent implementation in the ``cryptography`` package —
and then runs the reference's three seeded quality-gate scenarios
(``src/pq/pq.rs:431-440``, ``src/pq/opq.rs:331-339``,
``src/pq/gaussian_opq.rs:99-108``) through the conformant trainers, which
draw the *same initial-centroid instances in the same order* as the
reference does at the same seed.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from reductive_tpu import conformance as C


# ---------------------------------------------------------------------------
# Generator stack
# ---------------------------------------------------------------------------


def test_chacha_core_matches_cryptography_package():
    """The ChaCha permutation (20 rounds, Bernstein 64+64 counter/stream
    layout) must reproduce an independent ChaCha20 keystream, including
    counter placement and block sequencing."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    key = bytes(range(32))
    key_words = np.frombuffer(key, dtype="<u4").astype(np.uint32)
    stream = 0x1122334455667788

    for counter in (0, 5, 0xFFFFFFFF):
        mine = C.chacha_blocks(
            key_words, counter=counter, stream=stream, n_blocks=4, rounds=20
        ).astype("<u4").tobytes()
        nonce = counter.to_bytes(8, "little") + stream.to_bytes(8, "little")
        theirs = (
            Cipher(algorithms.ChaCha20(key, nonce), mode=None)
            .encryptor()
            .update(bytes(256))
        )
        assert mine == theirs


def test_seed_from_u64_snapshot():
    """Pin the PCG32 seed expansion of ``rand_core``'s ``seed_from_u64``
    (constants and XSH-RR output function from the rand_core 0.6 source)."""
    assert (
        C._seed_from_u64(42, 32).hex()
        == "a48fa17b58323d0aeab8a1cc690114b82b8cc87518b4f7548d446ea1e4df20f2"
    )
    # The 16-byte expansion (XorShift seeding) is the 32-byte prefix.
    assert C._seed_from_u64(42, 16) == C._seed_from_u64(42, 32)[:16]


def test_chacha8_word_stream_consistency():
    """next_u32 / next_u64 / fill_bytes / next_words all walk the same
    word-aligned keystream, across refill boundaries."""
    a = C.ChaCha8Rng.seed_from_u64(7)
    b = C.ChaCha8Rng.seed_from_u64(7)
    words = a.next_words(2048)  # spans multiple refill chunks
    got = []
    for _ in range(256):
        got.append(b.next_u32())
    for _ in range(256):
        v = b.next_u64()
        got += [v & 0xFFFFFFFF, v >> 32]
    got += list(np.frombuffer(b.fill_bytes(4 * 1280), dtype="<u4"))
    assert np.array_equal(words, np.array(got, dtype=np.uint32))


def test_xorshift_algorithm():
    """Marsaglia xorshift128 recurrence, checked step-by-step, plus the
    rand_xorshift all-zero-seed escape and next_u64 word order."""
    rng = C.XorShiftRng(2, 3, 5, 7)
    x, w = 2, 7
    t = (x ^ (x << 11)) & 0xFFFFFFFF
    expected = w ^ (w >> 19) ^ t ^ (t >> 8)
    assert rng.next_u32() == expected
    assert (rng.x, rng.y, rng.z) == (3, 5, 7)

    zero = C.XorShiftRng.from_seed(bytes(16))
    assert (zero.x, zero.y, zero.z, zero.w) == (0xBAD5EED,) * 4

    a = C.XorShiftRng(2, 3, 5, 7)
    b = C.XorShiftRng(2, 3, 5, 7)
    lo, hi = b.next_u32(), b.next_u32()
    assert a.next_u64() == lo | (hi << 32)


def test_xorshift_from_rng_consumes_four_words():
    master = C.ChaCha8Rng.seed_from_u64(1)
    peek = C.ChaCha8Rng.seed_from_u64(1).next_words(8)
    fork = C.XorShiftRng.from_rng(master)
    expected = np.frombuffer(
        peek[:4].astype("<u4").tobytes(), dtype="<u4"
    )
    assert (fork.x, fork.y, fork.z, fork.w) == tuple(int(v) for v in expected)
    # Master continues from word 4.
    assert master.next_u32() == int(peek[4])


def test_sample_uniform_int_power_of_two_is_top_bits():
    """For n = 256 the Lemire zone is the full u64 range (no rejection) and
    the sample is exactly the top 8 bits of the draw."""
    rng = C.XorShiftRng.seed_from_u64(3)
    mirror = C.XorShiftRng.seed_from_u64(3)
    for _ in range(64):
        v = mirror.next_u64()
        assert C.sample_uniform_int(rng, 256) == v >> 56


def test_sample_uniform_int_range_and_determinism():
    rng = C.ChaCha8Rng.seed_from_u64(9)
    draws = [C.sample_uniform_int(rng, 20) for _ in range(500)]
    assert all(0 <= d < 20 for d in draws)
    rng2 = C.ChaCha8Rng.seed_from_u64(9)
    assert draws == [C.sample_uniform_int(rng2, 20) for _ in range(500)]
    # All 20 values appear in 500 draws (sanity of uniformity).
    assert len(set(draws)) == 20


def test_uniform_f32_formula_and_fill_order():
    rng = C.ChaCha8Rng.seed_from_u64(5)
    arr = C.uniform_array_f32(rng, (3, 4))
    mirror = C.ChaCha8Rng.seed_from_u64(5)
    words = mirror.next_words(12)
    expected = ((words >> np.uint32(9)).astype(np.float32) * np.float32(2.0 ** -23))
    assert arr.dtype == np.float32
    assert np.array_equal(arr.ravel(), expected)  # row-major fill
    assert np.all((arr >= 0) & (arr < 1))


def test_distinct_indices():
    rng = C.XorShiftRng.seed_from_u64(11)
    idx = C.distinct_indices(rng, 50, 50 - 1)
    assert len(set(idx.tolist())) == 49
    assert idx.min() >= 0 and idx.max() < 50


# ---------------------------------------------------------------------------
# End-to-end: the reference's seeded quality gates, conformant streams
# ---------------------------------------------------------------------------


def _avg_euclidean_loss(x, pq):
    codes = pq.quantize_batch(jnp.asarray(x), dtype=jnp.uint8)
    rec = np.asarray(pq.reconstruct_batch(codes))
    return float(np.mean(np.linalg.norm(x - rec, axis=1)))


def test_reference_instances_deterministic():
    x, _ = C.reference_test_instances(42)
    y, _ = C.reference_test_instances(42)
    assert x.shape == (256, 20) and x.dtype == np.float32
    assert np.array_equal(x, y)
    assert 0.45 < x.mean() < 0.55


def test_quantize_with_pq_conformant():
    """Reference scenario ``quantize_with_pq`` (``src/pq/pq.rs:431-440``):
    seed 42, 256x20 U(0,1), m=10, 7 bits, 10 iterations.  The reference
    observes ~0.077 (gate <0.08); the conformant run measures 0.0757."""
    x, master = C.reference_test_instances(42)
    pq = C.train_pq_conformant(x, 10, 7, 10, 1, master=master)
    loss = _avg_euclidean_loss(x, pq)
    assert loss < 0.08
    assert abs(loss - 0.0757) < 2e-3  # pin the measured conformant value


def test_quantize_with_opq_conformant():
    """Reference scenario ``quantize_with_opq`` (``src/pq/opq.rs:331-339``):
    observed ~0.09 (gate <0.1); conformant run measures 0.0910 (pinned
    bit-tightly in tests/goldens/rng_reference.json)."""
    x, master = C.reference_test_instances(42)
    pq = C.train_opq_conformant(x, 10, 7, 10, 1, master=master)
    loss = _avg_euclidean_loss(x, pq)
    assert loss < 0.1
    assert abs(loss - 0.0910) < 2e-3


def test_quantize_with_gaussian_opq_conformant():
    """Reference scenario ``quantize_with_gaussian_opq``
    (``src/pq/gaussian_opq.rs:99-108``): observed ~0.1 (gate <0.12);
    conformant run measures 0.1005."""
    x, master = C.reference_test_instances(42)
    pq = C.train_gaussian_opq_conformant(x, 10, 7, 10, 1, master=master)
    loss = _avg_euclidean_loss(x, pq)
    assert loss < 0.12
    assert abs(loss - 0.1005) < 2e-3


def test_conformant_matches_initial_centroid_trainer():
    """The conformant path is exactly ``train_pq_subspace_with_centroids``
    on host-replicated draws: re-deriving the draws by hand gives the same
    codebooks."""
    from reductive_tpu.pq.train import train_pq_subspace_with_centroids

    x, master = C.reference_test_instances(42, shape=(64, 8))
    mirror = C.ChaCha8Rng.seed_from_u64(42)
    C.uniform_array_f32(mirror, (64, 8))  # advance identically

    m, k, n_iter = 4, 4, 5
    pq = C.train_pq_conformant(x, m, 2, n_iter, 1, master=master)

    rngs = [C.XorShiftRng.from_rng(mirror) for _ in range(m)]
    xs = x.reshape(64, m, 2)
    initial = np.stack(
        [
            np.stack([xs[C.distinct_indices(rngs[sq], 64, k), sq, :] for sq in range(m)])
        ]
    )
    codebooks, _ = train_pq_subspace_with_centroids(
        jnp.asarray(xs), jnp.asarray(initial), n_iter
    )
    assert np.array_equal(np.asarray(pq.codebooks), np.asarray(codebooks))


# ---------------------------------------------------------------------------
# Vendored golden streams (tests/goldens/rng_reference.json)
# ---------------------------------------------------------------------------


def test_golden_rng_streams():
    """Every stage of the conformance stack must reproduce the committed
    golden fixtures bit-for-bit at seeds 42/1/7 — a refactor that drifts
    any RNG or sampling detail (word order, fill order, fork order,
    rejection-zone arithmetic) fails here exactly, not merely by nudging
    a loss inside a tolerance band.  Fixture provenance:
    tests/goldens/generate_goldens.py."""
    import hashlib
    import json
    from pathlib import Path

    golden = json.loads(
        (Path(__file__).parent / "goldens" / "rng_reference.json").read_text()
    )
    shape = tuple(golden["gate"]["shape"])
    m, k = golden["gate"]["m"], golden["gate"]["k"]

    for seed_str, g in golden["seeds"].items():
        seed = int(seed_str)
        assert C._seed_from_u64(seed, 32).hex() == g["seed_bytes"]

        master = C.ChaCha8Rng.seed_from_u64(seed)
        np.testing.assert_array_equal(
            master.next_words(64),
            np.asarray(g["chacha8_words"], dtype=np.uint32),
        )

        master = C.ChaCha8Rng.seed_from_u64(seed)
        forks = [C.XorShiftRng.from_rng(master) for _ in range(m)]
        seeds_hex = [
            b"".join(
                int(v).to_bytes(4, "little") for v in (f.x, f.y, f.z, f.w)
            ).hex()
            for f in forks
        ]
        assert seeds_hex == g["xorshift_seeds"]
        assert [forks[0].next_u32() for _ in range(16)] == g["xorshift_words"]

        master = C.ChaCha8Rng.seed_from_u64(seed)
        corpus = C.uniform_array_f32(master, shape)
        np.testing.assert_array_equal(
            corpus.ravel()[:8].astype(np.float64),
            np.asarray(g["uniform_head"], dtype=np.float64),
        )  # bit-exact: the f32 values round-trip exactly through JSON doubles
        assert hashlib.sha256(corpus.tobytes()).hexdigest() == g["uniform_sha256"]

        # The exact index tensor train_pq_conformant consumes (post-corpus
        # master state, XorShift forks in subquantizer order).
        pq_idx = C._pq_initial_indices(master, shape[0], m, k, 1)
        assert [int(v) for v in pq_idx.ravel()[:16]] == g["pq_indices_head"]
        assert (
            hashlib.sha256(pq_idx.astype(np.int64).tobytes()).hexdigest()
            == g["pq_indices_sha256"]
        )

        # The OPQ draws: directly off the master, no forks
        # (src/pq/opq.rs:138-159).
        master = C.ChaCha8Rng.seed_from_u64(seed)
        C.uniform_array_f32(master, shape)
        opq_idx = np.stack(
            [C.distinct_indices(master, shape[0], k) for _ in range(m)]
        )
        assert [int(v) for v in opq_idx.ravel()[:16]] == g["opq_indices_head"]
        assert (
            hashlib.sha256(opq_idx.astype(np.int64).tobytes()).hexdigest()
            == g["opq_indices_sha256"]
        )


@pytest.mark.parametrize("name", ["pq", "opq", "gaussian_opq"])
def test_golden_gate_objectives(name):
    """The end-to-end gate objectives at seeds 42/1/7 must reproduce the
    recorded values to 1e-3 relative (float-summation order is the only
    permitted variation) — and all land inside the reference's stated
    bands (~0.077 / ~0.09 / ~0.1, src/pq/pq.rs:431-440, opq.rs:331-339,
    gaussian_opq.rs:99-108)."""
    import json
    from pathlib import Path

    golden = json.loads(
        (Path(__file__).parent / "goldens" / "rng_reference.json").read_text()
    )
    shape = tuple(golden["gate"]["shape"])
    m = golden["gate"]["m"]
    trainer = {
        "pq": C.train_pq_conformant,
        "opq": C.train_opq_conformant,
        "gaussian_opq": C.train_gaussian_opq_conformant,
    }[name]
    band = {"pq": 0.08, "opq": 0.10, "gaussian_opq": 0.12}[name]

    for seed_str, g in golden["seeds"].items():
        x, master = C.reference_test_instances(int(seed_str), shape)
        model = trainer(x, m, 7, 10, 1, master=master)
        rec = model.reconstruct_batch(model.quantize_batch(x))
        loss = float(
            jnp.mean(jnp.sqrt(jnp.sum((jnp.asarray(x) - rec) ** 2, axis=1)))
        )
        recorded = g[f"{name}_objective"]
        assert abs(loss - recorded) <= 1e-3 * recorded, (seed_str, loss, recorded)
        assert loss < band
