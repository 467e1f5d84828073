"""Multi-host initialisation (SURVEY.md §5.8).

The reference's inter-node story is SLURM jobs + shared storage — no
collective runtime.  Here multi-host scaling is JAX-native:
``jax.distributed.initialize`` forms the process group (DCN), after
which every host sees the global device set and the mesh helpers in
:mod:`blackbox_tpu.parallel.mesh` shard night batches across hosts
(frames over DCN, tiles over ICI).  Defaults resolve from the SLURM
environment, so the cluster adapter's sbatch scripts need no extra
plumbing (reference blackbox_slurm_ilifu.py:87-383 analogue).
"""

from __future__ import annotations

import logging
import os
import re

log = logging.getLogger("blackbox_tpu")


def _first_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist ('n[01-03],m05' -> 'n01')."""
    m = re.match(r"([^,\[]+)(\[([^\]]+)\])?", nodelist)
    if not m:
        return nodelist.split(",")[0]
    base, _, rng = m.groups()
    if not rng:
        return base
    first = re.split("[,-]", rng)[0]
    return base + first


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   port: int = 8476) -> bool:
    """Initialise jax.distributed from args or the SLURM environment.

    Returns True if a multi-host group was formed, False for
    single-host runs (no-op).  Idempotent per process.
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("SLURM_NTASKS", "1") or 1)
    if num_processes <= 1:
        return False
    if process_id is None:
        process_id = int(os.environ.get("SLURM_PROCID", "0") or 0)
    if coordinator is None:
        nodelist = os.environ.get("SLURM_JOB_NODELIST", "")
        host = _first_host(nodelist) if nodelist else "127.0.0.1"
        coordinator = f"{host}:{port}"
    log.info("jax.distributed.initialize(%s, n=%d, id=%d)",
             coordinator, num_processes, process_id)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
