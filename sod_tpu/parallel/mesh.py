"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's dormant ``DistributedSampler`` scaffolding
(``datasets/base_dataset.py:138-164``; see SURVEY §2 parallelism table).

The workload is data-parallel: batch dimension sharded over a 1-D ``data``
mesh axis riding ICI; parameters and optimizer state replicated; loss and
metric reductions become XLA ``psum``s inserted automatically under jit.
The same helpers drive the virtual 8-device CPU mesh in tests and the
driver's ``dryrun_multichip``.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# every flag that routes compute through a single-shard Pallas kernel —
# ONE list so a future fused flag is added in one place and every mesh
# guard (tp/pp/sp/p3/fsdp-full) picks it up together
PALLAS_FLAGS = ("use_pallas_attention", "use_fused_train",
                "use_fused_mlp", "use_fused_eval")


def assert_xla_path(cfg, requires: str, why: str) -> None:
    """Raise when any Pallas/fused flag is set.  Shared by every mesh
    path whose program cannot contain single-shard Pallas kernels
    (``assert_tp/pp/sp/p3/fsdp_compatible``)."""
    bad = [f for f in PALLAS_FLAGS if getattr(cfg, f, False)]
    if bad:
        raise ValueError(f"{requires}: disable {bad} — {why}")


def make_mesh(n_data: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D data-parallel mesh over ``n_data`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(f"requested {n_data} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_data]), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch pytree with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
