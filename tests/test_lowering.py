"""TPU cross-lowering regression gate (fast subset of
tools/lowering_smoke.py): jax.export runs the full Pallas->Mosaic
dialect lowering for platform 'tpu' on the CPU host, so a kernel whose
block specs or ops violate Mosaic lowering rules fails HERE instead of
at compile time on hardware.  (Necessary-not-sufficient: late Mosaic
pipeline errors still need the device.)"""

import os

import jax
import jax.numpy as jnp
import pytest
from jax import export as jexp

from caspr_tpu.ops import pointops


def _lower_tpu(fn, *args):
    exp = jexp.export(jax.jit(fn), platforms=("tpu",))(*args)
    assert "tpu_custom_call" in exp.mlir_module()


@pytest.fixture()
def pallas_env(monkeypatch):
    monkeypatch.setenv("CASPR_TPU_KERNELS", "pallas")


def test_gather_orientations_lower_for_tpu(pallas_env, monkeypatch):
    src = jnp.zeros((4, 1024, 35), jnp.float32)
    idx = jnp.zeros((4, 640), jnp.int32)
    for orientation in ("split", "onehot", "dma", "shuf"):
        monkeypatch.setenv("CASPR_TPU_GATHER", orientation)
        monkeypatch.setenv(
            "CASPR_TPU_GATHER_MAXC", "64"
        )  # route C=35 through the kernels
        _lower_tpu(pointops.gather_points, src, idx)


def test_encoder_kernels_lower_for_tpu(pallas_env):
    from caspr_tpu.models.pointnet2 import (
        PointNet2Config,
        pointnet2_apply,
        pointnet2_init,
    )

    cfg = PointNet2Config()  # full reference dims (the shapes that matter)
    params = pointnet2_init(jax.random.PRNGKey(0), cfg)
    pts = jnp.zeros((1, 2048, 9), jnp.float32)
    _lower_tpu(lambda p, x: pointnet2_apply(p, cfg, x), params, pts)
