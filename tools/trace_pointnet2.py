"""Capture a jax.profiler trace of pointnet2_apply on the current device
and print the top ops by self time from the xplane proto.

Usage: python tools/trace_pointnet2.py [/tmp/trace_dir]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from caspr_tpu.models.pointnet2 import PointNet2Config, pointnet2_apply, pointnet2_init

B = int(os.environ.get("B", "160"))
N = 2048


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pn2_trace"
    cfg = PointNet2Config()
    key = jax.random.PRNGKey(0)
    params = pointnet2_init(key, cfg)
    pts = jax.random.uniform(key, (B, N, 3 + cfg.in_features)) * 0.8

    fn = jax.jit(lambda x: pointnet2_apply(params, cfg, x))
    out = fn(pts)
    np.asarray(out[(0, 0, 0)])  # sync

    jax.profiler.start_trace(out_dir)
    for i in range(3):
        out = fn((pts + i * 1e-6).astype(pts.dtype))
    np.asarray(out[(0, 0, 0)])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", paths)
    if not paths:
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        print(f"== plane: {plane.name} ({len(plane.lines)} lines)")
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
        top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
        for name, ms in top:
            if ms > 0.5:
                print(f"  {ms:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
