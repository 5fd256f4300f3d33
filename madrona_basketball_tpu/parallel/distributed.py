"""Multi-host bring-up.

The reference has no distributed backend at all (SURVEY §2.6 — its only
inter-process mechanism is self-play's subprocess + checkpoint files).
Here multi-host is JAX-native: every host calls
`jax.distributed.initialize()`, after which `jax.devices()` spans the
whole slice and the ordinary data-mesh sharding (parallel/mesh.py) rides
ICI/DCN with XLA-inserted collectives.

Typical pod-slice launch (same command on every host):

    python -m madrona_basketball_tpu.cli --data-parallel --distributed ...
"""

from __future__ import annotations

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize multi-host JAX; returns the global device count.

    With no arguments, relies on the TPU environment's automatic
    coordinator discovery (GCE metadata / megascale env), which is the
    normal path on Cloud TPU pod slices.  No-ops gracefully when already
    initialized or single-process.
    """
    # No-op when already initialized.  Preferred probe is the public
    # jax.distributed.is_initialized() (present since jax 0.4.x); the
    # private-client fallback covers older releases.
    try:
        if jax.distributed.is_initialized():
            return len(jax.devices())
    except AttributeError:
        try:
            from jax._src import distributed as _dist
            if getattr(_dist.global_state, "client", None) is not None:
                return len(jax.devices())
        except Exception:
            pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:
        # Double-init manifests as RuntimeError; the wording ("once" /
        # "already", checked against jax 0.9.0) is unstable across
        # releases, so only treat it as benign after re-probing the
        # public flag.
        try:
            if jax.distributed.is_initialized():
                return len(jax.devices())
        except AttributeError:
            pass
        msg = str(e).lower()
        if "once" not in msg and "already" not in msg:
            raise
    except ValueError as e:
        if coordinator_address or num_processes or process_id is not None:
            raise  # explicit-but-incomplete config is a real error
        # No coordinator discoverable and none requested: not on a
        # multi-host slice — single-process is the right degradation,
        # the data mesh just spans local devices.
        import warnings
        warnings.warn(f"jax.distributed not initialized ({e}); "
                      "continuing single-process", stacklevel=2)
    return len(jax.devices())
