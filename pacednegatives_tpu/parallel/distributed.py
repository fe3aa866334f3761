"""Multi-host (DCN) initialization.

Replaces the reference's torch.distributed/NCCL process-group setup
(inherited in utilities/trainer.py:51; Lightning spawns it implicitly) with
``jax.distributed.initialize``: one call per host, after which
``jax.devices()`` spans the full pod slice and every mesh/pjit construct in
this framework works unchanged — data-parallel batches shard across hosts
over DCN, everything else rides ICI.

Call ``maybe_initialize_distributed()`` at entry-point start. It is a no-op
on a single host (the only configuration this environment can execute;
multi-chip semantics are validated on the virtual CPU mesh instead — see
tests/conftest.py and __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or standard env vars.

    Env contract (matching jax's own auto-detection plus explicit overrides):
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or any cluster
    environment jax auto-detects (GKE/TPU pod metadata). Returns True if
    distributed init ran.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        # Single-host, or a TPU pod environment jax can auto-detect.
        if os.environ.get("TPU_WORKER_HOSTNAMES", "localhost") not in (
            "", "localhost",
        ):
            jax.distributed.initialize()
            return True
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v else None
