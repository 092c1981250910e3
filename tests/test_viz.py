"""Viz export tests: PLY round trip, scene export artifacts, HTML viewer,
color helpers."""

import os

import numpy as np

from caspr_tpu.viz import (
    export_pcl_seq,
    get_error_colors,
    get_logprob_colors,
    get_sphere_samp_colors,
    np_to_list,
    save_ply,
    shift_pcl_list,
)
from caspr_tpu.viz.export import nocs_cube_points
from caspr_tpu.viz.html_viewer import export_html_viewer


def _read_ply(path):
    with open(path) as f:
        lines = f.read().splitlines()
    n = int(next(l for l in lines if l.startswith("element vertex")).split()[-1])
    start = lines.index("end_header") + 1
    pts, cols = [], []
    for l in lines[start : start + n]:
        vals = l.split()
        pts.append([float(v) for v in vals[:3]])
        if len(vals) > 3:
            cols.append([int(v) for v in vals[3:6]])
    return np.array(pts), np.array(cols)


def test_save_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.randn(20, 3).astype(np.float32)
    cols = rng.rand(20, 3).astype(np.float32)
    p = os.path.join(tmp_path, "x.ply")
    save_ply(p, pts, cols)
    rpts, rcols = _read_ply(p)
    np.testing.assert_allclose(rpts, pts, atol=1e-5)
    # colors quantize to uint8 by truncation: up to 1/255 absolute error
    np.testing.assert_allclose(rcols / 255.0, cols, atol=1.0 / 255 + 1e-6)


def test_export_scene_artifacts(tmp_path):
    rng = np.random.RandomState(1)
    seqs = [[rng.randn(30, 3) for _ in range(3)] for _ in range(2)]
    rgbs = [[np.abs(rng.rand(30, 3)) for _ in range(3)] for _ in range(2)]
    d = export_pcl_seq(str(tmp_path), "scene", seqs, rgbs, fps=3)
    files = set(os.listdir(d))
    assert {"frame_0000.ply", "frame_0001.ply", "frame_0002.ply"} <= files
    assert "viewer.html" in files
    assert "animation.gif" in files or "contact_sheet.png" in files
    pts, _ = _read_ply(os.path.join(d, "frame_0000.ply"))
    assert pts.shape == (60, 3)  # two 30-pt tracks merged


def test_html_viewer_standalone(tmp_path):
    rng = np.random.RandomState(2)
    seqs = [[rng.randn(10, 3).astype(np.float32) for _ in range(2)]]
    p = os.path.join(tmp_path, "v.html")
    export_html_viewer(p, seqs, None, fps=2, track_names=["gt"])
    html = open(p).read()
    assert "webgl" in html and '"num_frames": 2' in html
    assert "http" not in html.split("<script>")[1]  # no external resources


def test_color_helpers_shapes():
    rng = np.random.RandomState(3)
    pred = rng.rand(40, 3)
    gt = rng.rand(40, 3)
    c = get_error_colors(pred, gt)
    assert c.shape == (40, 3) and c.min() >= 0 and c.max() <= 1
    lp = rng.rand(4, 40) * 8
    cl = get_logprob_colors(lp)
    assert len(cl) == 4 and cl[0].shape == (40, 3)
    cs = get_sphere_samp_colors(np.round(rng.rand(4, 40), 1))
    assert len(cs) == 4 and cs[0].shape == (40, 3)


def test_np_to_list_and_cubes():
    arr = np.arange(2 * 3 * 5 * 4, dtype=np.float32).reshape(2, 3, 5, 4)
    lst = np_to_list(arr)
    assert len(lst) == 3 and lst[0].shape == (5, 3)
    shifted = shift_pcl_list(lst, [1.0, 0.0, 0.0])
    np.testing.assert_allclose(shifted[0][:, 0] - lst[0][:, 0], 1.0)
    cube = nocs_cube_points()
    assert cube.shape == (12 * 24, 3)
    assert cube.min() >= 0.0 and cube.max() <= 1.0
