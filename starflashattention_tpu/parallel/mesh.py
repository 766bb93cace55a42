"""Device-mesh construction helpers.

Axis convention across the package:
- ``"data"``  — batch (data parallel); no collectives in the forward pass.
- ``"model"`` — tensor parallel: attention heads + MLP intermediate + KV cache
  heads; 2 psums/layer ride ICI.
- ``"seq"``   — KV-sequence shard for the cross-chip split-KV decode
  (distributed_decode.py).

Multi-host: call :func:`init_distributed` first (jax.distributed.initialize),
then meshes span all hosts' devices; XLA routes intra-slice collectives over
ICI and inter-slice over DCN.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: dict[str, int] | None = None,
    *,
    devices=None,
) -> Mesh:
    """Build a Mesh from ``{axis_name: size}`` (size -1 = absorb the rest).

    ``make_mesh({"data": 2, "model": 4})`` on 8 devices → 2×4 mesh.
    Default: all devices on a single ``"model"`` axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"model": n}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis size may be -1")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))


def init_distributed(coordinator_address: str | None = None, **kwargs) -> None:
    """Multi-host init (jax.distributed.initialize). No-op if already
    initialized or single-host."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
    except RuntimeError:
        pass  # already initialized
