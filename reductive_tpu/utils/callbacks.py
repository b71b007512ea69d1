"""Backend capability probe for host callbacks.

Per-iteration loss logging from inside jitted training loops uses
``jax.debug.callback``.  Not every PJRT backend implements host
send/recv callbacks (notably remote-tunneled devices raise
``UNIMPLEMENTED: ... does not support host send/recv callbacks`` at
execution time), and a missing capability must degrade to silence, not
break training.  The probe compiles and runs a one-element program with
a no-op callback once per process and caches the verdict.
"""

from __future__ import annotations

import functools
import logging

__all__ = ["host_callbacks_supported"]


@functools.lru_cache(maxsize=None)
def host_callbacks_supported() -> bool:
    """True when the default backend can execute ``jax.debug.callback``.

    The result is cached for the process; the probe costs one tiny
    compile the first time a caller wants iteration logging.
    """
    import jax
    import jax.numpy as jnp

    try:
        def probe(x):
            jax.debug.callback(lambda v: None, x)
            return x + 1

        out = jax.jit(probe)(jnp.zeros((), jnp.float32))
        float(out)  # host fetch: forces execution even through tunnels
        jax.effects_barrier()
        return True
    except Exception as e:  # UNIMPLEMENTED from the backend, or similar
        logging.getLogger("reductive_tpu").info(
            "Host callbacks unavailable on this backend (%s); per-iteration "
            "loss logging from jitted loops is disabled.",
            type(e).__name__,
        )
        return False
