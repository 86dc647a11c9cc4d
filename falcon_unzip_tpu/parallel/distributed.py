"""Multi-host initialization + host-role helpers.

Role parity: the reference's multi-node story is pwatcher submitting jobs
to SGE/Slurm over a shared filesystem (SURVEY.md §1 L7).  Here multi-host
is jax.distributed: every host runs the same program, the global mesh
spans all hosts' devices, and collectives ride ICI within a slice / DCN
across hosts.  No scheduler integration is needed — launch one process
per host (GKE/JobSet, gcloud, or mpirun) and call ``initialize()``.

Host-side division of labor (SURVEY.md §2c):
- every host parses its shard of the read inputs (data-parallel IO),
- device programs run SPMD over the global mesh,
- host 0 gathers final FASTA emission (``is_primary_host``).
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or standard env vars.

    Env fallbacks: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID (also auto-detected on TPU pods from the metadata
    server by jax itself when no args are given).  With no args, no env,
    and no pod metadata (single-machine runs, incl. the CPU test mesh
    and the tunneled single-chip), this sets up an explicit one-process
    world instead of letting jax error out.
    """
    import jax
    ca = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    np_ = num_processes or _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if ca:
        jax.distributed.initialize(coordinator_address=ca,
                                   num_processes=np_, process_id=pid)
    else:
        try:
            jax.distributed.initialize()   # pod metadata auto-detect
        except ValueError:
            import socket
            with socket.socket() as s:     # grab a free local port
                s.bind(("localhost", 0))
                port = s.getsockname()[1]
            jax.distributed.initialize(
                coordinator_address=f"localhost:{port}",
                num_processes=1, process_id=0)
    logger.info("jax.distributed up: process %d/%d, %d local / %d global "
                "devices", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v else None


def is_primary_host() -> bool:
    import jax
    return jax.process_index() == 0


def host_shard(n_items: int) -> tuple[int, int]:
    """[start, end) slice of n_items owned by this host (contiguous)."""
    import jax
    p = jax.process_index()
    np_ = jax.process_count()
    per = -(-n_items // np_)
    return min(p * per, n_items), min((p + 1) * per, n_items)
