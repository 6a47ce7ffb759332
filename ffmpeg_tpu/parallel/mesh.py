"""Device mesh and sharding layout for multi-chip VVC decode.

Maps the reference's concurrency axes (SURVEY §2.5) onto a JAX mesh:
  'frame' — frame/GOP-level pipeline parallelism (P1): independent
            frames decode on different chips; DPB refs become
            cross-shard reads when inter prediction lands.
  'tile'  — spatial sharding within a frame (P2/P5): TU batches and
            plane stripes; filter-stage halos ride ICI collectives.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, frame_axis: int | None = None
              ) -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if frame_axis is None:
        frame_axis = 2 if n % 2 == 0 and n > 1 else 1
    tile_axis = n // frame_axis
    return Mesh(np.array(devs).reshape(frame_axis, tile_axis),
                ("frame", "tile"))


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-frames arrays: leading axis over 'frame'."""
    return NamedSharding(mesh, P("frame"))


def tu_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(F, N, h, w) TU blocks: frames over 'frame', TUs over 'tile'."""
    return NamedSharding(mesh, P("frame", "tile"))


def plane_sharding(mesh: Mesh) -> NamedSharding:
    """(F, H, W) planes: frames over 'frame', columns over 'tile'."""
    return NamedSharding(mesh, P("frame", None, "tile"))
