"""Data-parallel device mesh (GSPMD / jax.sharding).

TPU-native replacement for the reference's single-process
torch.nn.DataParallel (reference caspr/train.py:131-132; SURVEY §2.3):
the batch axis is sharded across a 1-D `dp` mesh over ICI, parameters are
replicated, and XLA inserts the gradient all-reduce (psum) automatically
when the jitted train step constrains outputs to replicated sharding.
No NCCL-style explicit collectives are needed — that is the point.

The same code runs single-chip (mesh of one device) and on a virtual
multi-device CPU mesh for tests (conftest forces 8 host devices).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DP_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the dp mesh axis."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put every array leaf with its batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
