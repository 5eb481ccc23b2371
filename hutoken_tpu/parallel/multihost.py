"""Multi-host (DCN) runtime setup.

The reference has no distributed backend (pthread shared memory only);
here multi-host runs are the standard JAX multi-process runtime: every
host runs the same program, `jax.distributed.initialize` wires the
processes, and the global device mesh spans all chips.  The merge-rank
table is a few MB and is replicated per chip; corpora are sharded over
the global ``data`` axis, so encode needs no cross-host communication
and training psums histograms over ICI first by mesh order.
"""

from __future__ import annotations

from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process JAX runtime (no-op if already initialized).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for manual setups.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise


def global_data_mesh():
    """1-D ``data`` mesh over every chip of every host."""
    from .mesh import data_mesh

    return data_mesh()
