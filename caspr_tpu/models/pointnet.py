"""Global space-time PointNet feature extractor.

Functional re-design of the reference's PointNetfeat (reference
caspr/models/pointnet.py:18-46): three 1x1 convs with GroupNorm(16), a
global max-pool, and the global feature broadcast back and concatenated
with the first-layer per-point features.  Channels-last: every conv is a
dense matmul on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import conv1x1, conv1x1_init, group_norm, group_norm_init

NUM_GROUPS = 16


def pointnetfeat_init(
    key, input_dim: int = 4, out_size: int = 1024, layer_sizes=(64, 128)
):
    k = jax.random.split(key, 6)
    d0, d1 = layer_sizes
    return {
        "conv1": conv1x1_init(k[0], input_dim, d0),
        "conv2": conv1x1_init(k[1], d0, d1),
        "conv3": conv1x1_init(k[2], d1, out_size),
        "bn1": group_norm_init(k[3], d0),
        "bn2": group_norm_init(k[4], d1),
        "bn3": group_norm_init(k[5], out_size),
    }


def pointnetfeat_apply_split(params, x):
    """x: (B, L, input_dim) -> (global (B, out_size), point_feat (B, L, d0)).

    The unbroadcast form: callers that consume the global feature through a
    linear layer (TPointNet2's fusion conv) can apply their global-weight
    block to the (B, out_size) vector once per sequence instead of
    materializing the (B, L, out_size) broadcast — see
    models/tpointnet2.tpointnet2_apply."""
    h = jax.nn.relu(group_norm(params["bn1"], conv1x1(params["conv1"], x), NUM_GROUPS))
    point_feat = h
    h = jax.nn.relu(group_norm(params["bn2"], conv1x1(params["conv2"], h), NUM_GROUPS))
    h = group_norm(params["bn3"], conv1x1(params["conv3"], h), NUM_GROUPS)
    return jnp.max(h, axis=1), point_feat


def pointnetfeat_apply(params, x):
    """x: (B, L, input_dim) -> (B, L, out_size + layer_sizes[0]).

    Output channel order matches reference pointnet.py:44-46: broadcast
    global feature first, then the per-point (layer-1) features.
    """
    global_feat, point_feat = pointnetfeat_apply_split(params, x)
    global_rep = jnp.broadcast_to(
        global_feat[:, None, :],
        (point_feat.shape[0], point_feat.shape[1], global_feat.shape[-1]),
    )
    return jnp.concatenate([global_rep, point_feat], axis=-1)
