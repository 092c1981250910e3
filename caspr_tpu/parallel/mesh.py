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

Sequence/point parallelism (also beyond the reference): ``sp_size > 1``
adds an inner ``sp`` mesh axis and ``shard_batch_points`` splits the
POINT axis of the inputs across it, on top of batch-over-dp.  The
pointwise-heavy stages (per-point MLPs, the CNF decode, TNOCS losses)
then run point-sharded; where an op genuinely needs all points of a
cloud (FPS, ball query, 3-NN), GSPMD inserts the all-gather of the
small coordinate tensors.  This is what lets the reference's batch-5
full recipe scale past 5 chips, and single-sequence reconstruct scale
at all — DataParallel has no answer there.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
DCN_AXIS = "dcn"
SP_AXIS = "sp"


def make_mesh(
    devices: Optional[Sequence] = None,
    *,
    num_slices: Optional[int] = None,
    sp_size: int = 1,
) -> Mesh:
    """``(dp,)`` / ``(dcn, dp)`` / ``(dp, sp)`` / ``(dcn, dp, sp)`` mesh.

    ``num_slices=None`` infers slice structure from the devices'
    ``slice_index`` attribute (set by the runtime on real multi-slice
    topologies); pass it explicitly to shape a virtual test mesh.
    ``sp_size`` carves an inner sequence/point-parallel axis out of each
    slice's devices (innermost, so sp collectives ride the shortest ICI
    paths).
    """
    devices = list(devices) if devices is not None else jax.devices()
    if num_slices is None:
        slices = {getattr(d, "slice_index", None) or 0 for d in devices}
        num_slices = len(slices)
    if len(devices) % max(num_slices, 1):
        raise ValueError(
            f"{len(devices)} devices do not divide into {num_slices} slices"
        )
    if sp_size > 1 and (len(devices) // max(num_slices, 1)) % sp_size:
        raise ValueError(
            f"per-slice device count is not divisible by sp_size={sp_size}"
        )
    if num_slices <= 1:
        if sp_size <= 1:
            return Mesh(np.array(devices), (DP_AXIS,))
        arr = np.array(devices).reshape(-1, sp_size)
        return Mesh(arr, (DP_AXIS, SP_AXIS))
    # group by slice so the inner dp/sp axes stay on ICI
    devices = sorted(
        devices,
        key=lambda d: (getattr(d, "slice_index", None) or 0, d.id),
    )
    if sp_size <= 1:
        arr = np.array(devices).reshape(num_slices, -1)
        return Mesh(arr, (DCN_AXIS, DP_AXIS))
    arr = np.array(devices).reshape(num_slices, -1, sp_size)
    return Mesh(arr, (DCN_AXIS, DP_AXIS, SP_AXIS))


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


def batch_point_sharding(mesh: Mesh, ndim: int, point_axis: int = 2):
    """Batch axis over the dp axes AND the point axis over ``sp``.

    0-d leaves replicate; leaves with ``ndim <= point_axis`` shard their
    leading (batch) axis only — leaves are batch-leading by the same
    contract ``shard_batch`` assumes."""
    axes = tuple(a for a in (DCN_AXIS, DP_AXIS) if a in mesh.axis_names)
    if ndim == 0:
        return NamedSharding(mesh, P())
    spec = [None] * ndim
    spec[0] = axes
    if SP_AXIS in mesh.axis_names and ndim > point_axis:
        spec[point_axis] = SP_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch_points(mesh: Mesh, tree, point_axis: int = 2):
    """Device_put leaves with the leading (batch) axis over dp and the
    point axis over sp.  Leaves without a point axis (e.g. (B, T)
    timestamp arrays) shard batch only; 0-d leaves replicate."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, batch_point_sharding(mesh, x.ndim, point_axis)
        ),
        tree,
    )


def global_batch_points(mesh: Mesh, tree, point_axis: int = 2):
    """Assemble each process's LOCAL batch rows into the global sharded
    array (multi-host: every process holds batch_size/process_count rows,
    see data.SequenceLoader num_shards).  Single-process this places
    exactly like ``shard_batch_points``."""
    if jax.process_count() == 1:
        return shard_batch_points(mesh, tree, point_axis)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            batch_point_sharding(mesh, x.ndim, point_axis), x
        )

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
