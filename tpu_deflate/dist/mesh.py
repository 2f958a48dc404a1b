"""Device mesh and topology management (SURVEY.md §2.2 build component).

The reference has no distribution; the TPU framework scales by sharding
the *member/lane* axis of the batched codec kernels over a
``jax.sharding.Mesh``. One logical axis (``data``) suffices for the codec
(members are independent); a second axis (``host``) is kept for multi-host
pod slices so collectives can be constrained to ICI within a host and DCN
across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_codec_mesh(n_devices: int | None = None, *, axis: str = "data") -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_pod_mesh(hosts: int, chips_per_host: int) -> Mesh:
    """2-D (host, data) mesh for multi-host slices."""
    devs = np.array(jax.devices()[: hosts * chips_per_host]).reshape(
        hosts, chips_per_host
    )
    return Mesh(devs, ("host", "data"))


def lane_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (lane/member) dimension, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_lanes(n_lanes: int, n_shards: int) -> int:
    """Lanes padded up so the lane axis divides evenly across shards."""
    return -(-n_lanes // n_shards) * n_shards
