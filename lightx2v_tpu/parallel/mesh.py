"""Device mesh construction.

Replaces the reference's NCCL process-group init (lightx2v/infer.py:28-30,
server/distributed_utils.py:13-34) with a ``jax.sharding.Mesh``. Axes:

* ``dp``  — data/CFG parallel (batch axis; cond/uncond pairs);
* ``sp``  — sequence parallel (video tokens; Ulysses all-to-all / ring);
* ``tp``  — tensor parallel (attention heads + FFN shards).

The reference supports sp via Ulysses/ring monkey-patching; dp via its
multi-server launcher; tp over attention heads (partial_heads). Here they
are one mesh. ICI-facing axes should be the innermost (fastest-varying)
for torus locality; XLA handles placement from device order.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "sp", "tp")


def build_mesh(mesh_shape: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """mesh_shape e.g. {"sp": 4}, {"dp": 2, "sp": 4}. Missing axes get 1.
    With no shape, all devices go to ``sp`` (the reference's default
    torchrun layout)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = dict(mesh_shape or {})
    if not shape:
        shape = {"sp": n}
    sizes = [int(shape.get(a, 1)) for a in AXES]
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {n}")
    # an explicit shape uses exactly that many devices (extra devices idle)
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1), AXES)


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def mesh_axis_size(mesh: Mesh, axis: str) -> int:
    return dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
