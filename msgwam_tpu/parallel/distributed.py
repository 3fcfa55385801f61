"""Multi-host (DCN) setup.

Single-host multi-chip needs nothing — ``jax.devices()`` sees the whole
ICI-connected slice.  For multi-host pods (BASELINE config 5 at scale), JAX
needs one ``jax.distributed.initialize`` per process before first use; this
wrapper standardizes that and returns the global mesh helpers.

Communication pattern stays unchanged: the per-RHS flux ``psum`` rides ICI
within a slice; only ensemble members should ever be split across DCN
(members never communicate), so lay the ``('ensemble', 'rays')`` mesh out
with ``ensemble`` as the outer (slower, DCN-crossing) axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (no-op if already initialized or if all
    arguments are None and no cluster environment is detected)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise


def global_mesh(axes: Sequence[int], names: Sequence[str]):
    """Mesh over all global devices; ``ensemble`` (if present) should be the
    first/outermost axis so it maps across hosts."""
    return jax.make_mesh(tuple(axes), tuple(names))
