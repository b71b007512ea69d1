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

from typing import Optional

import jax

__all__ = ["initialize_distributed"]

_initialized = False


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
        # No discoverable multi-process topology (or the backend is
        # already up in a single-process session): run single-process.
        # Warn loudly — on a real pod a swallowed failure here would mean
        # every host silently trains on its own shard alone.
        import logging

        logging.getLogger("reductive_tpu").warning(
            "jax.distributed.initialize failed (%s); continuing "
            "single-process. If this is a multi-host pod, pass the "
            "topology explicitly — training would otherwise silently "
            "cover only this host's shard.",
            e,
        )
