"""TPointNet++: canonicalizing encoder producing T-NOCS regression and the
spacetime latent z0.

Functional re-design of reference caspr/models/tpointnet2.py:8-123:
  - a global space-time PointNet over all T*N (x,y,z,t) points
  - a per-frame PointNet++ over xyz (with quadratic/pairwise input
    augmentation, tpointnet2.py:81-90)
  - two 1x1-conv + GroupNorm(16) fusion layers to the 1600-d per-point
    latent, a sigmoid T-NOCS head, and a global max-pool to z0
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..nn import conv1x1, conv1x1_init, group_norm, group_norm_init
from .pointnet import (
    pointnetfeat_apply,
    pointnetfeat_apply_split,
    pointnetfeat_init,
)
from .pointnet2 import PointNet2Config, pointnet2_init, pointnet2_apply

NUM_GROUPS = 16


@dataclass(frozen=True)
class TPointNet2Config:
    radii_list: Tuple[float, ...] = (0.02, 0.05, 0.1, 0.2, 0.4, 0.8)
    local_feat_size: int = 512
    out_feat_size: int = 1600
    augment_quad: bool = True
    augment_pairs: bool = True
    tnocs_point_size: int = 4
    regress_tnocs: bool = True
    global_feat_size: int = 1024
    space_time_pt_feat: int = 64
    sa_points: Tuple[int, ...] = (1024, 512, 256, 64, 16)
    ball_samples: Tuple[int, int] = (16, 32)

    def pointnet2_config(self) -> PointNet2Config:
        in_features = (3 if self.augment_quad else 0) + (
            3 if self.augment_pairs else 0
        )
        return PointNet2Config(
            in_features=in_features,
            num_classes=self.local_feat_size,
            max_feat_prop_size=self.local_feat_size,
            radii_list=tuple(self.radii_list),
            sa_points=tuple(self.sa_points),
            ball_samples=tuple(self.ball_samples),
        )

    @property
    def per_point_out_size(self) -> int:
        return self.global_feat_size + self.space_time_pt_feat + self.local_feat_size


def tpointnet2_init(key, cfg: TPointNet2Config):
    keys = jax.random.split(key, 8)
    d = cfg.per_point_out_size
    params = {
        "local_extract": pointnet2_init(keys[0], cfg.pointnet2_config()),
        "global_extract": pointnetfeat_init(
            keys[1], input_dim=4, out_size=cfg.global_feat_size
        ),
        "conv1": conv1x1_init(keys[2], d, d),
        "conv2": conv1x1_init(keys[3], d, cfg.out_feat_size),
        "bn1": group_norm_init(keys[4], d),
        "bn2": group_norm_init(keys[5], cfg.out_feat_size),
    }
    if cfg.regress_tnocs:
        params["conv3"] = conv1x1_init(
            keys[6], cfg.out_feat_size, cfg.tnocs_point_size
        )
    return params


def augment_input(spatial, augment_quad: bool, augment_pairs: bool):
    """Quadratic/pairwise channel augmentation in the reference's channel
    order x,y,z,x2,y2,z2,xz,xy,yz (tpointnet2.py:81-90)."""
    parts = [spatial]
    if augment_quad:
        parts.append(spatial * spatial)
    if augment_pairs:
        x, y, z = spatial[..., 0:1], spatial[..., 1:2], spatial[..., 2:3]
        parts.extend([x * z, x * y, z * y])
    return jnp.concatenate(parts, axis=-1)


def tpointnet2_apply(params, cfg: TPointNet2Config, x):
    """x: (B, T, N, 4) space-time cloud -> (z0 (B, out_feat), tnocs (B,T,N,4)
    or None).

    The T axis folds into the batch for the per-frame PointNet++ and into
    the point axis for the global PointNet and final max-pool — the
    reference's sequence-scaling strategy (tpointnet2.py:75,79,111).
    """
    b, t, n, _ = x.shape

    global_in = x.reshape(b, t * n, 4)

    spatial = x.reshape(b * t, n, 4)[..., :3]
    local_in = augment_input(spatial, cfg.augment_quad, cfg.augment_pairs)
    local_feat = pointnet2_apply(
        params["local_extract"], cfg.pointnet2_config(), local_in
    )
    local_feat = local_feat.reshape(b, t * n, cfg.local_feat_size)

    if os.environ.get("CASPR_TPU_FACTORED_FUSION", "1") == "1":
        # Factored fusion conv1.  Channel order is
        # [local (512) | global_rep (1024) | point_feat (64)]
        # (local first, then the PointNetfeat output, tpointnet2.py:96) —
        # and the global_rep block is CONSTANT across all T*N points of a
        # sequence.  Splitting conv1's weight columns applies the global
        # block to the (B, 1024) vector once per sequence instead of
        # broadcasting it over 20480 points: the concat + broadcast
        # (2 x (B, T*N, 1600+1024) HBM round-trips) disappear and conv1's
        # per-point contraction narrows 1600 -> 576 input channels.
        # Same math as the dense conv up to f32 summation order.
        gvec, point_feat = pointnetfeat_apply_split(
            params["global_extract"], global_in
        )
        dl = cfg.local_feat_size
        dg = cfg.global_feat_size
        w = params["conv1"]["weight"]  # (out, in) torch layout
        h = (
            conv1x1({"weight": w[:, :dl]}, local_feat)
            + conv1x1({"weight": w[:, dl + dg:]}, point_feat)
            + conv1x1(
                {"weight": w[:, dl:dl + dg],
                 "bias": params["conv1"]["bias"]}, gvec
            )[:, None, :]
        )
        feat = jax.nn.relu(group_norm(params["bn1"], h, NUM_GROUPS))
    else:
        global_feat = pointnetfeat_apply(params["global_extract"], global_in)
        # local first, then global (tpointnet2.py:96)
        feat = jnp.concatenate([local_feat, global_feat], axis=-1)
        feat = jax.nn.relu(
            group_norm(params["bn1"], conv1x1(params["conv1"], feat), NUM_GROUPS)
        )
    feat = group_norm(params["bn2"], conv1x1(params["conv2"], feat), NUM_GROUPS)

    tnocs = None
    if cfg.regress_tnocs:
        tnocs_out = conv1x1(params["conv3"], jax.nn.relu(feat))
        tnocs = jax.nn.sigmoid(tnocs_out[..., : cfg.tnocs_point_size])
        tnocs = tnocs.reshape(b, t, n, cfg.tnocs_point_size)

    z0 = jnp.max(feat, axis=1)
    return z0, tnocs


def tnocs_l1_loss(pred, gt):
    """Unreduced per-point L1, matching reference tpointnet2.py:117-123."""
    return jnp.abs(pred - gt)
