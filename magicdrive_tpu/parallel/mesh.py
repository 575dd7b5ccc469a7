"""Device mesh + shardings.

Replaces the reference's NCCL/accelerate DDP stack (SURVEY.md §2.4, §5.8:
ref:tools/train.py:70-77, ref:perception/common/ddp_utils.py:5-16) with a
`jax.sharding.Mesh` and named-axis shardings:

* ``dp``   — data parallel over the sample batch axis. Gradient all-reduce is
             inserted by XLA from the sharding; no DDP wrapper.
* ``view`` — the camera-view axis (the reference's "sequence" analogue,
             SURVEY.md §5.7). Sharding it spreads the 6 views of a sample
             across devices; cross-view attention's neighbor gather lowers to
             an ICI collective-permute.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` —
device enumeration then spans hosts and the same code runs on a slice.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("dp", "view"),
              devices=None) -> Mesh:
    """Build a mesh. Default: all devices on ``dp``, ``view`` unsharded."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    need = int(np.prod(shape))
    assert need <= n, f"mesh {shape} needs {need} devices, have {n}"
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, with_view: bool = False) -> NamedSharding:
    """Sharding for (B, N, ...) batch tensors."""
    if with_view and "view" in mesh.axis_names and mesh.shape["view"] > 1:
        return NamedSharding(mesh, P("dp", "view"))
    return NamedSharding(mesh, P("dp"))


def shard_batch(batch: dict, mesh: Mesh, n_cam: Optional[int] = None) -> dict:
    """Place a host batch onto the mesh, sample-sharded over dp.

    Tensors with a leading batch axis get P("dp"); the singleton
    ``uncond_ids`` is replicated. When ``n_cam`` is given and the mesh has a
    non-trivial ``view`` axis, tensors whose second axis is the camera axis
    are additionally view-sharded P("dp", "view") — the inference analogue of
    the dp×view training placement (the ring-permute cross-view path,
    docs/sharding.md).
    """
    view = ("view" in mesh.axis_names and mesh.shape["view"] > 1
            and n_cam is not None)
    out = {}
    for k, v in batch.items():
        if k == "uncond_ids" or getattr(v, "ndim", 0) == 0:
            out[k] = jax.device_put(v, replicated(mesh))
        elif view and v.ndim >= 2 and v.shape[1] == n_cam:
            out[k] = jax.device_put(v, NamedSharding(mesh, P("dp", "view")))
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P("dp")))
    return out
