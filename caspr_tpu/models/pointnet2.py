"""PointNet++ multi-scale-grouping segmentation backbone, TPU-native.

Functional re-design of the reference's Kaolin-adapted PointNet2feat
(reference caspr/models/pointnet2.py:14-249): five set-abstraction (SA)
levels with two grouping scales each, five feature-propagation (FP) levels,
and a final per-point head.  The CUDA kernels (furthest point sampling,
ball query/grouping, three_nn/three_interpolate) are supplied by
caspr_tpu.ops; everything else is dense matmul + GroupNorm work that XLA
maps onto the MXU.

Architecture facts replicated (with reference lines):
  - SA output sizes 1024/512/256/64/16 and per-scale MLP dims
    (pointnet2.py:64-146, batchnorm=False branch)
  - radii pairs slide over a 6-radius list; 16 and 32 ball samples
    (pointnet2.py:72-141)
  - mini-PointNet per scale: GroupNorm(16) after every conv, ReLU on all
    but the last, max-pool over the ball (pointnet2.py:649-699)
  - FP levels: inverse-squared-distance 3-NN interpolation with 1e-8 eps,
    concat skip features, [512, 512] conv+GN+ReLU stacks
    (pointnet2.py:148-202,483-525)
  - final head: conv-GN-ReLU-conv to num_classes (pointnet2.py:204-215)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn import conv1x1, conv1x1_init, group_norm, group_norm_init
from ..ops import (
    ball_query,
    ball_query_pair,
    farthest_point_sampling,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)

NUM_GROUPS = 16


@dataclass(frozen=True)
class SALevel:
    num_points_out: int
    scales: Tuple[Tuple[float, int, Tuple[int, ...]], ...]  # (radius, K, mlp)


@dataclass(frozen=True)
class PointNet2Config:
    in_features: int = 6
    num_classes: int = 512
    max_feat_prop_size: int = 512
    radii_list: Tuple[float, ...] = (0.02, 0.05, 0.1, 0.2, 0.4, 0.8)
    use_xyz_feature: bool = True
    # SA output counts / ball sizes; reference values by default
    # (pointnet2.py:64-146).  Overridable for small-scale tests.
    sa_points: Tuple[int, ...] = (1024, 512, 256, 64, 16)
    ball_samples: Tuple[int, int] = (16, 32)

    def sa_levels(self) -> List[SALevel]:
        r = self.radii_list
        p = self.sa_points
        k1, k2 = self.ball_samples
        # dims are the batchnorm=False variants the reference instantiates
        # (pointnet2.py:120-121,138)
        return [
            SALevel(p[0], ((r[0], k1, (16, 16, 32)), (r[1], k2, (32, 32, 64)))),
            SALevel(p[1], ((r[1], k1, (32, 32, 64)), (r[2], k2, (32, 32, 64)))),
            SALevel(p[2], ((r[2], k1, (64, 64, 128)), (r[3], k2, (64, 96, 128)))),
            SALevel(p[3], ((r[3], k1, (128, 256, 256)), (r[4], k2, (128, 256, 256)))),
            SALevel(p[4], ((r[4], k1, (256, 256, 512)), (r[5], k2, (256, 256, 512)))),
        ]

    def sa_out_dims(self) -> List[int]:
        return [sum(s[2][-1] for s in lvl.scales) for lvl in self.sa_levels()]

    def fp_dims(self) -> List[Tuple[int, List[int]]]:
        """[(in_features, layer_dims)] for the 5 FP levels, mirroring
        reference pointnet2.py:148-202 (all layer dims resolve to
        max(x, num_classes))."""
        sa_out = self.sa_out_dims()
        mfp, nc = self.max_feat_prop_size, self.num_classes
        dims = [
            max(mfp, nc),
            max(mfp, nc),
            max(mfp // 2, nc),
            max(mfp // 2, nc),
            max(mfp // 4, nc),
        ]
        skips = [sa_out[3], sa_out[2], sa_out[1], sa_out[0], self.in_features]
        prev = [sa_out[4]]
        specs = []
        for i in range(5):
            specs.append((skips[i] + prev[-1], [dims[i]] * 2))
            prev.append(dims[i])
        return specs


def _mini_pointnet_init(key, in_ch: int, dims: Sequence[int]):
    """conv+GN stack with max-pool at the end (PointNetFeatureExtractor with
    global_feat=True, batchnorm=False)."""
    all_dims = [in_ch] + list(dims)
    keys = jax.random.split(key, 2 * len(dims))
    return {
        "convs": [
            conv1x1_init(keys[2 * i], all_dims[i], all_dims[i + 1])
            for i in range(len(dims))
        ],
        "norms": [
            group_norm_init(keys[2 * i + 1], all_dims[i + 1])
            for i in range(len(dims))
        ],
    }


def _mini_pointnet_apply(params, x):
    """x: (B', K, C_in) -> (B', feat). ReLU on all but the last conv,
    GroupNorm on every conv, then max over the K ball samples."""
    n = len(params["convs"])
    for i in range(n):
        x = group_norm(params["norms"][i], conv1x1(params["convs"][i], x), NUM_GROUPS)
        if i < n - 1:
            x = jax.nn.relu(x)
    return jnp.max(x, axis=1)


def _unit_pointnet_init(key, in_ch: int, dims: Sequence[int]):
    all_dims = [in_ch] + list(dims)
    keys = jax.random.split(key, 2 * len(dims))
    return {
        "convs": [
            conv1x1_init(keys[2 * i], all_dims[i], all_dims[i + 1])
            for i in range(len(dims))
        ],
        "norms": [
            group_norm_init(keys[2 * i + 1], all_dims[i + 1])
            for i in range(len(dims))
        ],
    }


def _unit_pointnet_apply(params, x):
    """FP conv stack: GN + ReLU after every conv (pointnet2.py:467-481)."""
    for conv, norm in zip(params["convs"], params["norms"]):
        x = jax.nn.relu(group_norm(norm, conv1x1(conv, x), NUM_GROUPS))
    return x


def pointnet2_init(key, cfg: PointNet2Config):
    levels = cfg.sa_levels()
    keys = jax.random.split(key, len(levels) + 6 + 3)
    params = {"set_abstractions": [], "feature_propagators": []}
    in_ch = cfg.in_features + (3 if cfg.use_xyz_feature else 0)
    for li, lvl in enumerate(levels):
        scale_keys = jax.random.split(keys[li], len(lvl.scales))
        params["set_abstractions"].append(
            {
                "scales": [
                    _mini_pointnet_init(sk, in_ch, dims)
                    for sk, (_, _, dims) in zip(scale_keys, lvl.scales)
                ]
            }
        )
        in_ch = sum(s[2][-1] for s in lvl.scales) + (
            3 if cfg.use_xyz_feature else 0
        )
    for fi, (fp_in, fp_dims) in enumerate(cfg.fp_dims()):
        params["feature_propagators"].append(
            _unit_pointnet_init(keys[len(levels) + fi], fp_in, fp_dims)
        )
    final_in = cfg.fp_dims()[-1][1][-1]
    params["final_conv1"] = conv1x1_init(keys[-3], final_in, final_in)
    params["final_norm"] = group_norm_init(keys[-2], final_in)
    params["final_conv2"] = conv1x1_init(keys[-1], final_in, cfg.num_classes)
    return params


def _sa_impl(cfg, sp, xyz, new_xyz, k) -> str:
    """Pick the SA-scale implementation:
    'factored' | 'fused2' | 'fused' | 'xla'.

    Default (CASPR_TPU_SA=auto): the pure-XLA factored-conv1 scale
    (ops/sa_fused2.sa_scale_factored) on TPU — it narrows the grouped
    gather to d1 channels and moves conv1 to the N source points, and
    measured ~2.5x closer to the full-f32 ground truth than the plain
    composition.  'fused2' (the v2 Pallas kernel: same math plus in-VMEM
    convs/GN/max) and 'fused' (the v1 kernel) are opt-in experiments —
    both are documented negative results at eval density (BENCHMARKS.md);
    'xla' is the plain unfactored composition."""
    import os

    from ..ops.pointops import _use_pallas

    if not cfg.use_xyz_feature or not _use_pallas():
        return "xla"
    mode = os.environ.get("CASPR_TPU_SA", "auto")
    if os.environ.get("CASPR_TPU_FUSED_SA", "0") == "1":
        mode = "fused"
    if mode == "fused":
        from ..ops.sa_fused import can_fuse_sa

        cs = sp["convs"][0]["weight"].shape[1]  # 3 rel-xyz + C channels
        if can_fuse_sa(sp, xyz.shape[1], cs, new_xyz.shape[1], k, NUM_GROUPS):
            return "fused"
        return "xla"
    if mode == "fused2":
        from ..ops.sa_fused2 import can_fuse_sa2

        if can_fuse_sa2(sp, xyz.shape[1], new_xyz.shape[1], k, NUM_GROUPS):
            return "fused2"
        return "xla"
    if mode == "fused3":
        from ..ops.sa_fused2 import can_fuse_sa3

        if can_fuse_sa3(sp, xyz.shape[1], new_xyz.shape[1], k, NUM_GROUPS):
            return "fused3"
        return "factored" if len(sp["convs"]) == 3 else "xla"
    if mode in ("auto", "factored") and len(sp["convs"]) == 3:
        return "factored"
    return "xla"


def _factored_fp() -> bool:
    """CASPR_TPU_FACTORED_FP=1 (default) applies FP conv1's interp-
    channel block on the coarse level's points before the 3-NN
    interpolation (see the call site for the linearity argument);
    =0 keeps the reference interp-then-concat-then-conv order."""
    import os

    return os.environ.get("CASPR_TPU_FACTORED_FP", "1") == "1"


def _hier_fps() -> bool:
    """CASPR_TPU_FPS=hier (default) collapses the SA cascade's five FPS
    runs into one via the prefix property; =level runs FPS per level like
    the reference CUDA kernel (for A/B and tie-sensitivity checks)."""
    import os

    mode = os.environ.get("CASPR_TPU_FPS", "hier")
    if mode not in ("hier", "level"):
        raise ValueError(
            f"CASPR_TPU_FPS={mode!r}: expected 'hier' or 'level'"
        )
    return mode == "hier"


def pointnet2_apply(params, cfg: PointNet2Config, points):
    """points: (B, N, 3 + in_features) -> per-point features (B, N, num_classes).

    Mirrors reference PointNet2feat.forward (pointnet2.py:217-249):
    SA cascade downsampling 1024->...->16, then FP cascade interpolating
    back up with skip connections, then the final conv head.

    FPS prefix collapse: greedy farthest-point sampling has the prefix
    property — at step i the selected point maximizes the min-distance
    over ALL remaining points, so it also maximizes over any subset that
    contains it; hence FPS run on the first-m points of an FPS ordering
    (same start point, index 0, as the reference CUDA kernel at
    reference caspr/models/pointnet2.py:384) reproduces that ordering's
    next prefix exactly.  Distance ties (duplicate points from
    repeat-padding) are also exact: the subset's lowest-index tie-break
    selects the lane with the lowest FPS-ordering position, which is
    the point the full run picked at that step (tested on duplicated
    clouds).  Each SA level's input IS the previous level's
    FPS-ordered gather, so once one real FPS has run, every later
    level's sample is a free slice instead of an O(M)-sequential-step
    kernel: 1872 -> 1024 dependent iterations at the 2048-point eval
    protocol, 848 -> 512 at the 1024-point train resolution (where the
    first level's M == N identity shortcut is NOT an FPS ordering and
    the second level still runs the real kernel).
    """
    xyz = points[..., :3]
    features = points[..., 3:] if points.shape[-1] > 3 else None

    xyz_list = [xyz]
    feat_list = [features]
    fps_ordered = False  # is `xyz` currently in FPS selection order?
    for lvl, lvl_params in zip(cfg.sa_levels(), params["set_abstractions"]):
        m, n = lvl.num_points_out, xyz.shape[1]
        if fps_ordered and m <= n and _hier_fps():
            new_xyz = xyz[:, :m]
        else:
            idx = farthest_point_sampling(xyz, m)
            new_xyz = gather_points(xyz, idx)
            if m < n:
                fps_ordered = True  # gather order = FPS selection order
            elif m > n:
                fps_ordered = False  # repeat-padded: ordering broken
        scale_feats = []
        if len(lvl.scales) == 2:
            # both grouping scales share the centers and sources — the
            # dual-radius fused kernel computes the (M, N) distances and
            # prefix sum once (ops.pointops.ball_query_pair)
            (r1, k1, _), (r2, k2, _) = lvl.scales
            gidxs = list(ball_query_pair(xyz, new_xyz, r1, k1, r2, k2))
        else:
            gidxs = [
                ball_query(xyz, new_xyz, radius, k)
                for (radius, k, _) in lvl.scales
            ]
        for (radius, k, dims), sp, gidx in zip(
                lvl.scales, lvl_params["scales"], gidxs):
            impl = _sa_impl(cfg, sp, xyz, new_xyz, k)
            if impl == "factored":
                from ..ops.sa_fused2 import sa_scale_factored

                scale_feats.append(
                    sa_scale_factored(sp, xyz, features, new_xyz, gidx,
                                      NUM_GROUPS)
                )
                continue
            if impl == "fused2":
                from ..ops.sa_fused2 import fused_sa_scale2

                scale_feats.append(
                    fused_sa_scale2(sp, xyz, features, new_xyz, gidx, k,
                                    NUM_GROUPS)
                )
                continue
            if impl == "fused3":
                from ..ops.sa_fused2 import fused_sa_scale3

                scale_feats.append(
                    fused_sa_scale3(sp, xyz, features, new_xyz, gidx, k,
                                    NUM_GROUPS)
                )
                continue
            if impl == "fused":
                from ..ops.sa_fused import fused_sa_scale

                h3 = fused_sa_scale(
                    sp, xyz, features, new_xyz, gidx, k, NUM_GROUPS
                )
                scale_feats.append(h3)
                continue
            grouped = group_points(
                xyz, new_xyz, features, gidx, cfg.use_xyz_feature
            )  # (B, M, K, C_in)
            b, m, kk, cin = grouped.shape
            h = _mini_pointnet_apply(sp, grouped.reshape(b * m, kk, cin))
            scale_feats.append(h.reshape(b, m, -1))
        features = jnp.concatenate(scale_feats, axis=-1)
        xyz = new_xyz
        xyz_list.append(xyz)
        feat_list.append(features)

    # feature propagation from coarsest back to the input resolution
    target = len(xyz_list) - 2
    for fp_params in params["feature_propagators"]:
        q_xyz = xyz_list[target]
        s_xyz = xyz_list[target + 1]
        d2, idx = three_nn(q_xyz, s_xyz)
        inv = 1.0 / (d2 + 1e-8)
        w = inv / jnp.sum(inv, axis=-1, keepdims=True)
        src = feat_list[target + 1]
        skip = feat_list[target]
        conv0 = fp_params["convs"][0]
        c_src = src.shape[-1]
        d_out = conv0["weight"].shape[0]
        if _factored_fp() and d_out <= c_src:
            # Factored FP conv1 (the factored-fusion trick applied to
            # feature propagation): 3-NN interpolation is a per-query
            # linear combination with scalar weights, so it commutes
            # with the channel matmul —
            #   conv1(concat([interp(F), skip]))
            #     == interp(F @ Wi^T) + skip @ Ws^T + b.
            # The wide interp-channel matmul runs on the COARSE level's
            # rows (N_src < N_q for every FP level), the interp moves
            # conv-output channels (never more than C_src under the
            # d_out <= c_src guard), and the concat HBM round-trip is
            # deleted.  The reference computes interp-then-concat-then-
            # conv (reference caspr/models/pointnet2.py:505-519); same
            # math up to f32 summation order (equivalence + gradient
            # test in tests/test_models.py).
            g = conv1x1({"weight": conv0["weight"][:, :c_src]}, src)
            h = three_interpolate(g, idx, w)
            if skip is not None:
                h = h + conv1x1({"weight": conv0["weight"][:, c_src:]}, skip)
            h = h + conv0["bias"]
            h = jax.nn.relu(
                group_norm(fp_params["norms"][0], h, NUM_GROUPS))
            for conv, norm in zip(fp_params["convs"][1:],
                                  fp_params["norms"][1:]):
                h = jax.nn.relu(group_norm(norm, conv1x1(conv, h),
                                           NUM_GROUPS))
            feat_list[target] = h
        else:
            interp = three_interpolate(src, idx, w)
            h = interp if skip is None else jnp.concatenate(
                [interp, skip], -1)
            feat_list[target] = _unit_pointnet_apply(fp_params, h)
        target -= 1

    h = feat_list[0]
    h = jax.nn.relu(
        group_norm(params["final_norm"], conv1x1(params["final_conv1"], h), NUM_GROUPS)
    )
    return conv1x1(params["final_conv2"], h)
