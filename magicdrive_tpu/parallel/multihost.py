"""Multi-host utilities — the jax-native counterpart of the reference's
torch.distributed object gathers (ref:perception/common/ddp_utils.py:5-16,
used by distributed val-set generation ref:val_set_gen.py:149-160).
"""
from __future__ import annotations

from typing import Any, List, Optional

import jax
import numpy as np


def initialize_if_needed(coordinator: Optional[str] = None) -> None:
    """jax.distributed.initialize once per process (no-op single-host)."""
    if jax.process_count() > 1 or coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator)


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather a picklable object from every host (order = process index).

    Single-host returns [obj] without touching the device.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    import pickle

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # pad to the max length across hosts, then gather
    n = np.array([len(payload)], np.int32)
    all_n = multihost_utils.process_allgather(n)
    max_n = int(all_n.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[: len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(bytes(gathered[i][: int(all_n[i])]))
            for i in range(jax.process_count())]


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (the accelerate wait_for_everyone analogue,
    ref:base_runner.py:300)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
