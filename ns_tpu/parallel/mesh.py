"""Device mesh construction and presets.

New capability mandated by the north star (the reference has no
parallelism of any kind — SURVEY.md §2): scale-out is jax.sharding.Mesh +
shard_map with XLA collectives over ICI, not message-passing ports.

Axis vocabulary used across ns_tpu:
  ensemble — data-parallel axis over independent trajectories / batch
             (BASELINE.json: batch-64 ensembles at 1024^2 on v4-32)
  x        — spatial decomposition of field rows (halo-exchange domain)
  y        — optional second spatial axis
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

# named presets: axis layout per target topology
MESH_PRESETS: dict[str, dict[str, int]] = {
    # 32-chip v4 pod slice: 8-way ensembles x 4-way spatial rows
    "v4-32": {"ensemble": 8, "x": 4},
    # one host of 8 (tests / v5e-8): 4-way ensembles x 2-way spatial
    "host-8": {"ensemble": 4, "x": 2},
    # single chip
    "single": {"ensemble": 1, "x": 1},
}


def make_mesh(axes: Mapping[str, int] | str | None = None,
              devices: Sequence | None = None) -> Mesh:
    """Build a Mesh from {axis_name: size} (or a preset name). Sizes must
    multiply to the device count; pass axes=None to put every device on an
    'ensemble' axis."""
    devs = list(devices) if devices is not None else jax.devices()
    if isinstance(axes, str):
        axes = MESH_PRESETS[axes]
    if axes is None:
        axes = {"ensemble": len(devs)}
    sizes = tuple(axes.values())
    if int(np.prod(sizes)) != len(devs):
        raise ValueError(
            f"mesh axes {dict(axes)} need {int(np.prod(sizes))} devices, "
            f"have {len(devs)}")
    arr = mesh_utils.create_device_mesh(sizes, devices=devs)
    return Mesh(arr, tuple(axes.keys()))
