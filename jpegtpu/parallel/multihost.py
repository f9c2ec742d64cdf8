"""Multi-host orchestration over jax.distributed.

The single-controller mesh mechanics of `parallel.sharding` extend to
multiple hosts unchanged: initialize the distributed runtime, build a
global mesh over every chip in the slice/pod, and run the same
shard_map'd encode — XLA routes the per-shard all_gather over ICI within
a slice and DCN across hosts (SURVEY.md §5.8).

This container exposes one host, so these helpers are exercised by the
virtual-device tests and the multichip dry run; on a real pod they are
the entry point.

Usage (same program on every host):

    from jpegtpu.parallel import multihost
    multihost.initialize()                      # jax.distributed handshake
    mesh = multihost.global_mesh()              # all chips, 1-D 'shard' axis
    data = encode_grayscale_sharded(img, cfg, mesh=mesh)  # identical API
    if multihost.is_coordinator():
        open(out, 'wb').write(data)
"""
from __future__ import annotations

import jax

from .sharding import make_mesh


def initialize(**kwargs) -> None:
    """jax.distributed.initialize with env-driven defaults. Safe to call
    once per process before any jax computation; no-op on a single host
    with no coordinator configured."""
    import os

    if jax.process_count() > 1:
        return  # already initialized
    if "JAX_COORDINATOR_ADDRESS" in os.environ or kwargs:
        jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "shard"):
    """1-D mesh over every device in the job (all hosts)."""
    return make_mesh(devices=jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0


def local_shard_indices(mesh) -> list[int]:
    """Mesh positions owned by this host — the shards whose bytes this
    host will contribute when assembling the final stream."""
    local = set(jax.local_devices())
    return [i for i, d in enumerate(mesh.devices.flat) if d in local]
