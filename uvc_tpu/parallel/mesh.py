"""Device-mesh utilities for the calling pipeline.

The caller's sharding layout (SURVEY.md §2 parallelism table):
  dp - data parallel over region batches
  sp - sequence parallel over positions within a region batch; per-column
       statistics are position-local (halos are baked into the pileup
       tensorization with MAX_INSERT_SIZE + MAX_STR_N_BASES overlaps), so
       no collective is needed during the column model; reductions for
       record counts/metrics ride psum at the end.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def factor_mesh(n_devices: int):
    """Factor n into (dp, sp), square-ish with dp <= sp."""
    dp = 1
    for d in range(int(n_devices ** 0.5), 0, -1):
        if n_devices % d == 0:
            dp = d
            break
    return dp, n_devices // dp


def make_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    dp, sp = factor_mesh(len(devices))
    return Mesh(np.array(devices).reshape(dp, sp), ("dp", "sp"))


def plane_sharding(mesh, ndim):
    """Sharding for a model plane [P, ...]: the position axis is
    data-parallel over the whole mesh (halos handled upstream in the
    pileup tensorization)."""
    return NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names),
                                             *([None] * (ndim - 1))))


def replicated(mesh):
    return NamedSharding(mesh, PartitionSpec())
