"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real multi-chip TPU hardware is not available in CI; instead the suite
forces the CPU platform with 8 virtual XLA devices so every sharding /
collective code path (``Mesh`` + ``shard_map`` + ``psum``) executes for
real — the stand-in for the multi-host tests the reference never had
(see SURVEY.md §4).  Must be set before JAX initializes.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's sitecustomize forces jax_platforms to "axon,cpu" (the
# tunneled TPU), which would silently route every "CPU" test through the
# network-attached chip.  Override it after import — the env var alone is
# not enough.
jax.config.update("jax_platforms", "cpu")

# Golden fixtures from the reference use f64 in the k-means tests
# (reference: src/kmeans.rs:437); enable x64 so both f32 and f64 paths
# are exercised.  Explicit dtypes are used everywhere in the library.
jax.config.update("jax_enable_x64", True)
