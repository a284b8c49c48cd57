"""
Multi-host runtime helpers (DCN tier).

The reference is strictly single-node (SURVEY.md section 2.4). At pod scale
the natural decomposition is: tiles/channels across hosts (each host owns the
Zarr IO for its tiles — DCN only carries control), planes across the chips of
each host (ICI). These helpers wire that up:

- ``initialize_distributed``: jax.distributed.initialize wrapper (no-op on a
  single process),
- ``assign_tiles``: deterministic per-process tile ownership,
- ``host_local_mesh``: the mesh over this process's addressable devices,
- ``global_stats``: min/max/mean across all hosts via a tiny replicated
  psum (the only cross-host collective the workload needs).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Bring up the multi-host runtime when configured (JAX env vars or
    explicit args); returns (process_index, process_count). Safe to call in
    single-process runs."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def assign_tiles(tiles: Sequence, process_index: Optional[int] = None,
                 process_count: Optional[int] = None) -> List:
    """Deterministic round-robin tile ownership: host i processes tiles
    i, i+P, i+2P, ... — each host streams only its own Zarr tiles, so bulk
    image data never crosses DCN."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    ordered = sorted(tiles, key=str)
    return [t for j, t in enumerate(ordered) if j % pc == pi]


def host_local_mesh(axis: str = "z") -> jax.sharding.Mesh:
    """1-D mesh over this process's local devices (plane axis)."""
    return jax.sharding.Mesh(np.array(jax.local_devices()), (axis,))


def global_stats(values: np.ndarray) -> np.ndarray:
    """Sum a small per-host stats vector across all hosts (psum over a
    process-spanning mesh); identity in single-process runs."""
    if jax.process_count() == 1:
        return np.asarray(values)
    devices = np.array(jax.devices())
    mesh = jax.sharding.Mesh(devices, ("p",))
    arr = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        np.asarray(values),
    )

    @jax.jit
    def ident(x):
        return x

    return np.asarray(ident(arr))
