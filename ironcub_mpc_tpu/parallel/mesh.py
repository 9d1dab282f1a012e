"""Device-mesh helpers for scenario-parallel MPC.

The reference has no distributed computing at all (single-process control
loop); these axes exist only in the TPU build. Conventions:

- axis ``"scenario"`` — data parallelism over Monte-Carlo rollouts; the
  primary scale axis. Shardings ride ICI within a slice and DCN across
  hosts via standard jax.distributed initialization.
- axis ``"kkt"`` — optional tensor parallelism *inside* one QP solve:
  constraint rows of the ADMM operator are sharded and reductions use
  ``psum`` (see :mod:`.tp_admm`). Only worth it for big horizon blow-ups;
  off (size 1) for the stock 588-var problem.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_scenario: int | None = None, n_kkt: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_scenario is None:
        n_scenario = n // n_kkt
    assert n_scenario * n_kkt == n, (n_scenario, n_kkt, n)
    arr = np.asarray(devices).reshape(n_scenario, n_kkt)
    return Mesh(arr, ("scenario", "kkt"))


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over scenarios, replicate the rest."""
    return NamedSharding(mesh, P("scenario"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def multihost_init():
    """Initialize jax.distributed when launched across hosts (no-op on a
    single process). Call before creating meshes in multi-host deployments."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
