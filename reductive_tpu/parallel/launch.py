"""Multi-host (pod) initialization helpers.

One process per host drives its local chips; `jax.distributed.initialize`
wires the processes into one global runtime, after which every entry in
this package works unchanged — `jax.devices()` spans the pod, meshes built
by :func:`reductive_tpu.parallel.make_mesh` cover all chips, and the psum'd
centroid statistics ride ICI within a slice / DCN across slices.

Typical pod launch (same script on every host)::

    from reductive_tpu.parallel import initialize_distributed, make_mesh

    initialize_distributed()          # env-driven on Cloud TPU
    mesh = make_mesh()                # 1-D data mesh over all pod chips
    pq = train_pq_chunked_sharded(key, shard, ..., mesh=mesh)

On Cloud TPU the coordinator address / process count / process id are
discovered from the TPU environment automatically; elsewhere pass them
explicitly.  Encode-style jobs need no coordination at all — each host can
run :func:`reductive_tpu.data.stream_encode_resumable` on its own corpus
shard and restart independently (deterministic given the codebook
artifact).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize_distributed"]

_initialized = False

# Environment variables that signal this process is part of a MULTI-host
# deployment.  If one indicates more than one host and auto-discovery
# still fails, silently falling back to single-process would make every
# host train on its own shard alone and produce divergent models — so we
# raise instead.  Signals that are also set on single-host workers
# (TPU_WORKER_ID=0, a one-entry TPU_WORKER_HOSTNAMES) deliberately do
# NOT trigger: a single-host deployment where the backend is already up
# must keep the warn-and-continue behavior.
_MULTIHOST_ENV_SIGNALS = (
    "TPU_WORKER_HOSTNAMES",        # >1 comma-separated hosts
    "MEGASCALE_NUM_SLICES",        # >1 slices
    "MEGASCALE_COORDINATOR_ADDRESS",  # presence = cross-slice coordination
    "JAX_COORDINATOR_ADDRESS",     # presence = explicit launch coordination
    "COORDINATOR_ADDRESS",
)


def _multihost_intent() -> Optional[str]:
    """The first environment signal indicating MULTI-host membership."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return "TPU_WORKER_HOSTNAMES"
    slices = os.environ.get("MEGASCALE_NUM_SLICES", "")
    try:
        if int(slices) > 1:
            return "MEGASCALE_NUM_SLICES"
    except ValueError:
        pass
    for name in (
        "MEGASCALE_COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS",
        "COORDINATOR_ADDRESS",
    ):
        if os.environ.get(name):
            return name
    return None


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Idempotent wrapper around ``jax.distributed.initialize``.

    Call once per process before touching devices.  With no arguments the
    Cloud TPU environment supplies the topology; single-process runs (the
    common local/test case) skip initialization entirely.
    """
    global _initialized
    if _initialized:
        return
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
        _initialized = True
    except (RuntimeError, ValueError) as e:
        if explicit:
            raise
        signal = _multihost_intent()
        if signal is not None:
            # The environment says this host is part of a pod; a silent
            # single-process fallback would mean every host trains on its
            # own shard alone and produces a divergent model.  Fail.
            raise RuntimeError(
                f"jax.distributed.initialize failed ({e}) but the "
                f"environment signals multi-host membership ({signal} is "
                "set). Refusing the silent single-process fallback — pass "
                "coordinator_address/num_processes/process_id explicitly."
            ) from e
        # No multi-host signal anywhere (the common local/test case, or a
        # backend already initialized in-session): run single-process.
        import logging

        logging.getLogger("reductive_tpu").warning(
            "jax.distributed.initialize failed (%s); continuing "
            "single-process (no multi-host environment signals present).",
            e,
        )
