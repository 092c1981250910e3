"""Data-parallel device mesh (GSPMD / jax.sharding).

TPU-native replacement for the reference's single-process
torch.nn.DataParallel (reference caspr/train.py:131-132; SURVEY §2.3):
the batch axis is sharded across a 1-D `dp` mesh over ICI, parameters are
replicated, and XLA inserts the gradient all-reduce (psum) automatically
when the jitted train step constrains outputs to replicated sharding.
No NCCL-style explicit collectives are needed — that is the point.

The same code runs single-chip (mesh of one device) and on a virtual
multi-device CPU mesh for tests (conftest forces 8 host devices).

Multi-slice (beyond the reference's capability): with ``num_slices > 1``
the mesh becomes 2-D ``(dcn, dp)`` with devices grouped by slice along the
outer axis.  The batch axis is sharded over BOTH axes, so the gradient
all-reduce XLA inserts decomposes hierarchically — reduce-scatter/
all-gather over ICI within a slice, and the small per-axis reduce across
slices rides the DCN fabric.  No code in the train step changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
DCN_AXIS = "dcn"


def make_mesh(
    devices: Optional[Sequence] = None, *, num_slices: Optional[int] = None
) -> Mesh:
    """1-D ``(dp,)`` mesh, or ``(dcn, dp)`` for multi-slice DP.

    ``num_slices=None`` infers slice structure from the devices'
    ``slice_index`` attribute (set by the runtime on real multi-slice
    topologies); pass it explicitly to shape a virtual test mesh.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if num_slices is None:
        slices = {getattr(d, "slice_index", None) or 0 for d in devices}
        num_slices = len(slices)
    if num_slices <= 1:
        return Mesh(np.array(devices), (DP_AXIS,))
    if len(devices) % num_slices:
        raise ValueError(
            f"{len(devices)} devices do not divide into {num_slices} slices"
        )
    # group by slice so the inner dp axis stays on ICI
    devices = sorted(
        devices,
        key=lambda d: (getattr(d, "slice_index", None) or 0, d.id),
    )
    arr = np.array(devices).reshape(num_slices, -1)
    return Mesh(arr, (DCN_AXIS, DP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across every data-parallel mesh axis."""
    axes = tuple(a for a in (DCN_AXIS, DP_AXIS) if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put every array leaf with its batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
