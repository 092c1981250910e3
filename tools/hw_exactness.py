"""On-device numeric exactness gate for every default-dispatched kernel.

The r3 battery shipped a gather default that was bit-WRONG on hardware
while every CPU/interpret test passed (the backend's forced
``--xla_allow_excess_precision`` elided the cast-based bf16 splits — see
ops/pallas_kernels.split3_bf16).  This tool re-derives each kernel's
output against a pure-f32 oracle ON THE REAL DEVICE and exits nonzero on
any violation, so a numerically wrong flag can never ship as a default
again.  Wired in as hw_battery.sh stage 0.5; also runnable standalone.

Budget thresholds (not vibes):
  gather (split/onehot/shuf): bit-exact (0.0) vs take_along_axis
  chamfer (batched):       <= 1e-5 rel vs float64 brute force (value is
                           the exact f32 diff-form; selection slack is
                           tie-gap bounded)
  EMD (Pallas forward):    <= max(2x XLA's error, 2e-4) rel vs a float64
                           oracle (the annealed matching is iterative —
                           faithful impls diverge ~1e-4 from each other)
  ball query (fused-d2):   index sets may differ from the XLA path only
                           by points within f32 rounding of the radius
                           boundary (<= 1e-5 on |d2 - r^2|)
  three_interpolate:       <= 2e-4 rel (designed 4-pass scheme drops an
                           O(2^-16) term; see _interp3_kernel docstring)
  sa_scale_factored:       <= 5e-2 rel vs HIGHEST-precision reference
                           (GroupNorm amplifies default-precision matmul
                           rounding on low-variance groups either way)
  fused CNF dynamics:      <= 1e-3 rel vs the XLA jvp composition
  hier FPS:                identical indices to per-level FPS
  fused-d2 ball query:     identical neighbor indices to the XLA d2 path
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, err, tol):
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: err={err:.3e} tol={tol:.0e}",
          flush=True)
    if not ok:
        FAILURES.append(name)


def crash(name, exc):
    print(f"FAIL {name}: {type(exc).__name__}: {exc}"[:300], flush=True)
    FAILURES.append(name)


def _emd_f64_oracle(x1, x2, num_iters_pow=7):
    """float64 numpy transcription of ops.metrics._approx_match +
    _match_cost (same annealing schedule / epsilons)."""
    n, m = x1.shape[0], x2.shape[0]
    d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
    big = float(max(n, m))
    match = np.zeros((n, m))
    sat_l = np.full((n,), big / n)
    sat_r = np.full((m,), big / m)
    levels = np.concatenate(
        [-np.power(4.0, np.arange(num_iters_pow, -2, -1, dtype=np.float64)),
         np.zeros((1,))])
    for level in levels:
        w = np.exp(level * d2) * sat_r[None, :]
        w_sum = w.sum(1, keepdims=True) + 1e-9
        w = w * (sat_l[:, None] / w_sum)
        col = w.sum(0) + 1e-9
        scale = np.minimum(sat_r / col, 1.0)
        w = w * scale[None, :]
        match = match + w
        sat_l = np.maximum(sat_l - w.sum(1), 0.0)
        sat_r = np.maximum(sat_r - w.sum(0), 0.0)
    d = np.sqrt(np.maximum(d2, 1e-20))
    return (match * d).sum()


def main():
    rng = np.random.default_rng(0)

    # --- gather orientations: must be BIT-exact -------------------------
    from caspr_tpu.ops.pallas_kernels import (
        _gather_rows_call, _gather_rows_split_call)
    b, n, r = 8, 2048, 8192
    for c in (3, 8, 16, 32):
        src = jnp.asarray(rng.standard_normal((b, n, c), dtype=np.float32) * 4)
        idx = jnp.asarray(rng.integers(0, n, (b, r)), dtype=jnp.int32)
        ref = np.asarray(jnp.take_along_axis(
            src, idx[:, :, None].astype(jnp.int32), axis=1))
        for name, fn in (("gather_split", _gather_rows_split_call),
                         ("gather_onehot", _gather_rows_call)):
            try:
                err = float(np.abs(np.asarray(fn(src, idx)) - ref).max())
                check(f"{name} C={c}", err, 0.0)
            except Exception as e:  # Mosaic rejection is also a failure
                crash(f"{name} C={c}", e)

    # --- shuf gather: exact f32 lane-shuffle moves, incl. the big-C
    # regime the MXU kernels cannot reach (FP-interp tables) -------------
    from caspr_tpu.ops.pallas_kernels import _gather_rows_shuf_call
    for (nn2, c2, r2) in ((2048, 3, 8192), (2048, 32, 8192),
                          (1024, 512, 2048), (512, 67, 1000)):
        src = jnp.asarray(
            rng.standard_normal((4, nn2, c2), dtype=np.float32) * 4)
        idx = jnp.asarray(rng.integers(0, nn2, (4, r2)), dtype=jnp.int32)
        ref = np.asarray(jnp.take_along_axis(
            src, idx[:, :, None].astype(jnp.int32), axis=1))
        try:
            err = float(
                np.abs(np.asarray(_gather_rows_shuf_call(src, idx)) - ref)
                .max())
            check(f"gather_shuf N={nn2} C={c2}", err, 0.0)
        except Exception as e:
            crash(f"gather_shuf N={nn2} C={c2}", e)

    # --- packed-emit shuf gather (lanes-folded layout): bit-exact vs the
    # row gather reshaped (same f32 moves, different physical layout).
    # NOT default-dispatched: the backend Mosaic compiler rejects the
    # epilogue's sublane->lane fold (r5c stage 60, exit 1 at every
    # shape), so pointops gates it on CASPR_TPU_GATHER_PACKED_EMIT=1;
    # check it only when someone re-arms it. --------------------------
    if os.environ.get("CASPR_TPU_GATHER_PACKED_EMIT", "0") == "1":
        from caspr_tpu.ops.pallas_kernels import (
            _gather_rows_shuf_packed_call)
        for (nn3, c3, k3) in ((2048, 16, 16), (2048, 32, 32), (1024, 64, 16)):
            r3 = 1024 * k3
            src = jnp.asarray(
                rng.standard_normal((4, nn3, c3), dtype=np.float32) * 4)
            idx = jnp.asarray(rng.integers(0, nn3, (4, r3)), dtype=jnp.int32)
            ref = np.asarray(jnp.take_along_axis(
                src, idx[:, :, None].astype(jnp.int32), axis=1)).reshape(
                    4, r3 // k3, k3 * c3)
            try:
                err = float(np.abs(np.asarray(
                    _gather_rows_shuf_packed_call(src, idx, k3)) - ref).max())
                check(f"gather_shuf_packed C={c3} K={k3}", err, 0.0)
            except Exception as e:
                crash(f"gather_shuf_packed C={c3} K={k3}", e)
    else:
        # keep the RNG stream position stable whether or not the
        # opt-in branch runs (later checks draw from the same stream)
        for (nn3, c3, k3) in ((2048, 16, 16), (2048, 32, 32), (1024, 64, 16)):
            rng.standard_normal((4, nn3, c3), dtype=np.float32)
            rng.integers(0, nn3, (4, 1024 * k3))

    # --- lanes-packed SA conv stack vs the row-form loop ----------------
    from caspr_tpu.models.pointnet2 import _mini_pointnet_init
    from caspr_tpu.ops.sa_packed import sa_stack_packed

    for (dims, kk) in (((16, 16, 32), 16), ((32, 32, 64), 32)):
        sp = _mini_pointnet_init(jax.random.PRNGKey(2), 9, dims)
        h = jnp.asarray(
            rng.standard_normal((512, kk, dims[0]), dtype=np.float32))

        def _rows_stack(sp, h):
            from caspr_tpu.models.pointnet2 import group_norm

            x = h
            for i in range(len(sp["convs"])):
                if i > 0:
                    w = jnp.transpose(sp["convs"][i]["weight"])
                    x = jnp.matmul(
                        x, w, preferred_element_type=jnp.float32
                    ) + sp["convs"][i]["bias"]
                x = group_norm(sp["norms"][i], x, 16)
                if i < len(sp["convs"]) - 1:
                    x = jax.nn.relu(x)
            return jnp.max(x, axis=1)

        try:
            # Two-part check (r5c recalibration): the LAYOUT math is
            # gated tight under HIGHEST matmuls (both forms reduce to
            # the same f32 terms — measured 1.9e-7 on device); the
            # SHIPPED default-precision form is gated loose vs the
            # HIGHEST reference because GroupNorm amplifies bf16-matmul
            # rounding on low-variance groups (same rationale and
            # tolerance as the sa_scale_factored check above; measured
            # 1.2e-3 at dims=(32,32,64)).
            with jax.default_matmul_precision("highest"):
                want_hi = np.asarray(jax.jit(_rows_stack)(sp, h))
                got_hi = np.asarray(jax.jit(sa_stack_packed)(sp, h))
            scale = float(np.abs(want_hi).max()) or 1.0
            err_hi = float(np.abs(got_hi - want_hi).max()) / scale
            check(f"sa_stack_packed layout (HIGHEST) dims={dims}",
                  err_hi, 1e-5)
            got = np.asarray(jax.jit(sa_stack_packed)(sp, h))
            err = float(np.abs(got - want_hi).max()) / scale
            check(f"sa_stack_packed shipped dims={dims}", err, 5e-2)
        except Exception as e:
            crash(f"sa_stack_packed dims={dims}", e)

    # --- DMA gather at its one legal regime (lane-aligned C) -------------
    from caspr_tpu.ops.pallas_kernels import _gather_rows_dma_call
    src = jnp.asarray(rng.standard_normal((4, 1024, 128), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, 1024, (4, 4096)), dtype=jnp.int32)
    ref = np.asarray(jnp.take_along_axis(
        src, idx[:, :, None].astype(jnp.int32), axis=1))
    try:
        err = float(np.abs(np.asarray(_gather_rows_dma_call(src, idx)) - ref)
                    .max())
        check("gather_dma C=128", err, 0.0)
    except Exception as e:
        crash("gather_dma C=128", e)

    # --- three_interpolate (pallas + dense) -----------------------------
    from caspr_tpu.ops.pallas_kernels import three_interpolate_pallas
    from caspr_tpu.ops.pointops import _three_interpolate_dense
    for (m, nn_, c) in ((256, 1024, 256), (64, 2048, 512)):
        feats = jnp.asarray(rng.standard_normal((4, m, c), dtype=np.float32) * 4)
        idx = jnp.asarray(rng.integers(0, m, (4, nn_, 3)), dtype=jnp.int32)
        w = rng.random((4, nn_, 3), dtype=np.float32)
        w = jnp.asarray(w / w.sum(-1, keepdims=True))
        ref = np.asarray(jnp.sum(
            jnp.take_along_axis(
                feats[:, None], idx[..., None].transpose(0, 2, 1, 3), axis=2
            ).transpose(0, 2, 1, 3) * w[..., None], axis=2))
        scale = np.abs(ref).max()
        from caspr_tpu.ops.pallas_kernels import three_interpolate_shuf
        for name, fn, tol in (
                ("interp_pallas", three_interpolate_pallas, 2e-4),
                ("interp_dense", _three_interpolate_dense, 2e-4),
                # shuf: exact f32 gathers + f32 MAC — f32 rounding only
                ("interp_shuf", three_interpolate_shuf, 2e-6)):
            try:
                err = float(np.abs(np.asarray(fn(feats, idx, w)) - ref).max())
                check(f"{name} M={m} C={c}", err / scale, tol)
            except Exception as e:
                crash(f"{name} M={m} C={c}", e)

    # --- factored SA scale vs HIGHEST-precision reference ---------------
    try:
        from caspr_tpu.models.pointnet2 import PointNet2Config, pointnet2_init
        from caspr_tpu.ops.pointops import ball_query
        from caspr_tpu.ops.sa_fused2 import sa_scale_factored, _xla_reference
        cfg = PointNet2Config(in_features=0, use_xyz_feature=True)
        params = pointnet2_init(jax.random.PRNGKey(0), cfg)
        sp = params["set_abstractions"][0]["scales"][0]  # SA1 scale 0
        _, bq_k, _ = cfg.sa_levels()[0].scales[0]
        # probe at ~16 points per ball: under-filled balls make GroupNorm
        # stats degenerate and BOTH implementations chaotic vs GT (59% at
        # ~2 points/ball, equally for factored and reference — measured
        # r4), so only the healthy-occupancy regime separates a real
        # accuracy regression from GN noise amplification
        radius = 0.2
        xyz = jnp.asarray(rng.random((8, 512, 3), dtype=np.float32) * 0.8)
        new_xyz = xyz[:, :128]
        gidx = ball_query(xyz, new_xyz, radius, bq_k)
        got = np.asarray(sa_scale_factored(sp, xyz, None, new_xyz, gidx))
        ref = np.asarray(_xla_reference(sp, xyz, None, new_xyz, gidx, 16))
        with jax.default_matmul_precision("highest"):
            gt = np.asarray(_xla_reference(sp, xyz, None, new_xyz, gidx, 16))
        scale = max(float(np.abs(gt).max()), 1e-6)
        e_fac = float(np.abs(got - gt).max()) / scale
        e_ref = float(np.abs(ref - gt).max()) / scale
        # GroupNorm amplifies default-precision matmul rounding in BOTH
        # paths; the invariant worth gating is that the factored path is
        # no LESS accurate than the plain composition it replaces (r2
        # measured it ~2.5x MORE accurate).
        print(f"     sa factored-vs-GT={e_fac:.3e} reference-vs-GT={e_ref:.3e}",
              flush=True)
        check("sa_scale_factored SA1", e_fac, max(2.0 * e_ref, 1e-3))
    except Exception as e:
        crash("sa_scale_factored SA1", e)

    # --- fused CNF dynamics vs XLA jvp composition -----------------------
    try:
        from caspr_tpu.models.cnf import CNFConfig, odenet_init
        from caspr_tpu.ops.cnf_fused import (
            _reference_dynamics, fused_concatsquash_dynamics)
        ccfg = CNFConfig(zdim=64, dims=(128, 128, 128))
        op = odenet_init(jax.random.PRNGKey(1), ccfg)
        bt, npts = 16, 512
        tc = jnp.asarray(
            np.concatenate([rng.random((bt, 1)), rng.standard_normal((bt, 64))],
                           axis=1).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((bt, npts, 3), dtype=np.float32))
        e = jnp.asarray(
            rng.integers(0, 2, (bt, npts, 3)).astype(np.float32) * 2 - 1)
        dx_f, div_f = map(np.asarray, fused_concatsquash_dynamics(op, tc, y, e))
        dx_r, div_r = map(np.asarray, _reference_dynamics(op, tc, y, e))
        sc = max(float(np.abs(dx_r).max()), float(np.abs(div_r).max()), 1e-6)
        err = max(float(np.abs(dx_f - dx_r).max()),
                  float(np.abs(div_f - div_r).max())) / sc
        check("cnf_fused dynamics", err, 1e-3)
    except Exception as e:
        crash("cnf_fused dynamics", e)

    # --- manual (stream-stacked) dynamics VJP vs autodiff on device -------
    # Pure XLA either way (no Mosaic risk), but the on-device matmul
    # precision policy differs from CPU — gate where it ships.
    try:
        from caspr_tpu.ops.cnf_fused import _manual_dynamics_vjp
        ct_dx = jnp.asarray(
            rng.standard_normal((bt, npts, 3), dtype=np.float32))
        ct_div = jnp.asarray(
            rng.standard_normal((bt, npts), dtype=np.float32))

        @jax.jit
        def _auto_vjp(op_, tc_, y_):
            _, vjp = jax.vjp(
                lambda p, c, yy: _reference_dynamics(p, c, yy, e),
                op_, tc_, y_)
            return vjp((ct_dx, ct_div))

        _man_vjp = jax.jit(
            lambda p, c, yy: _manual_dynamics_vjp(p, c, yy, e, ct_dx, ct_div))

        def _tree_err(got_, want_):
            err_ = 0.0
            for a, b in zip(jax.tree_util.tree_leaves(got_),
                            jax.tree_util.tree_leaves(want_)):
                a, b = np.asarray(a), np.asarray(b)
                sc = max(float(np.abs(b).max()), 1e-6)
                err_ = max(err_, float(np.abs(a - b).max()) / sc)
            return err_

        # Two-part check (same pattern as sa_stack_packed): under
        # HIGHEST both compositions reduce to the same f32 terms — the
        # MATH is gated tight; the SHIPPED default-precision form takes
        # bf16 one-pass matmul rounding in a different summation order
        # than autodiff, so it is gated to be no worse than ~2x the
        # autodiff path's own deviation from the HIGHEST reference.
        with jax.default_matmul_precision("highest"):
            want_hi = _auto_vjp(op, tc, y)
            got_hi = _man_vjp(op, tc, y)
        check("cnf manual VJP math (HIGHEST)", _tree_err(got_hi, want_hi),
              2e-5)
        e_man = _tree_err(_man_vjp(op, tc, y), want_hi)
        e_auto = _tree_err(_auto_vjp(op, tc, y), want_hi)
        print(f"     manual-vs-HIGHEST={e_man:.3e} "
              f"autodiff-vs-HIGHEST={e_auto:.3e}", flush=True)
        check("cnf manual VJP shipped", e_man, max(2.0 * e_auto, 1e-3))
    except Exception as e:
        crash("cnf manual dynamics VJP", e)

    # --- fused primal-only (sampling) dynamics ----------------------------
    try:
        from caspr_tpu.ops.cnf_fused import (
            _reference_primal, fused_concatsquash_primal)
        dx_p = np.asarray(fused_concatsquash_primal(op, tc, y))
        dx_pr = np.asarray(_reference_primal(op, tc, y))
        sc = max(float(np.abs(dx_pr).max()), 1e-6)
        err = float(np.abs(dx_p - dx_pr).max()) / sc
        check("cnf_primal dynamics", err, 1e-3)
    except Exception as e:
        crash("cnf_primal dynamics", e)

    # --- hierarchical FPS == per-level FPS --------------------------------
    try:
        from caspr_tpu.ops.pointops import farthest_point_sampling
        pts = jnp.asarray(rng.random((8, 2048, 3), dtype=np.float32))
        full = farthest_point_sampling(pts, 1024)
        sub = farthest_point_sampling(pts, 256)
        err = float((np.asarray(full)[:, :256] != np.asarray(sub)).sum())
        check("fps prefix property", err, 0.0)
    except Exception as e:
        crash("fps prefix property", e)

    # --- dual-radius ball query == two single-radius calls ----------------
    # Same _d2_from_coords path in both kernels, so selections must be
    # IDENTICAL (no boundary slack needed, unlike the XLA-path check).
    try:
        from caspr_tpu.ops.pallas_kernels import (
            ball_query_pair_pallas, ball_query_pallas)
        xyzp = jnp.asarray(rng.random((8, 1024, 3), dtype=np.float32))
        qryp = xyzp[:, :256]
        i1, i2 = ball_query_pair_pallas(xyzp, qryp, 0.1, 16, 0.25, 32)
        w1 = ball_query_pallas(xyzp, qryp, 0.1, 16)
        w2 = ball_query_pallas(xyzp, qryp, 0.25, 32)
        err = float((np.asarray(i1) != np.asarray(w1)).sum()
                    + (np.asarray(i2) != np.asarray(w2)).sum())
        check("ball_query_pair vs singles", err, 0.0)
    except Exception as e:
        crash("ball_query_pair vs singles", e)

    # --- batched chamfer vs float64 brute-force oracle --------------------
    # These two kernels (chamfer + EMD) DEFINE the reported quality
    # metrics; the r4 verdict flagged that the gate's "every
    # default-dispatched kernel" philosophy excluded exactly them.
    try:
        from caspr_tpu.ops.metrics import chamfer_distance
        bb, nn_, mm = 6, 2048, 2048
        p = rng.standard_normal((bb, nn_, 3)).astype(np.float32) * 0.3
        g = rng.standard_normal((bb, mm, 3)).astype(np.float32) * 0.3
        # near-tie stressor: duplicate a gt point at ~1e-6 displacement so
        # argmin selection noise is exercised (select-then-refine bounds
        # the value error by the tie gap)
        g[0, 1] = g[0, 0] + 1e-6
        p[0, 0] = g[0, 0] + 5e-7
        d1, d2 = chamfer_distance(jnp.asarray(p), jnp.asarray(g))
        d1, d2 = np.asarray(d1, np.float64), np.asarray(d2, np.float64)
        err = 0.0
        for i in range(bb):
            diff = (p[i].astype(np.float64)[:, None, :]
                    - g[i].astype(np.float64)[None, :, :])
            dd = (diff * diff).sum(-1)
            ref1, ref2 = dd.min(1), dd.min(0)
            sc = max(ref1.mean(), ref2.mean())
            err = max(err,
                      float(np.abs(d1[i] - ref1).max() / sc),
                      float(np.abs(d2[i] - ref2).max() / sc))
        # budget: f32 rounding of the exact diff-form value (~1e-7 rel)
        # plus a tie-gap-bounded selection slack
        check("chamfer batched vs f64 oracle", err, 1e-5)
    except Exception as e:
        crash("chamfer batched vs f64 oracle", e)

    # --- Pallas EMD forward vs a float64 oracle of the algorithm ----------
    # The annealed matching is ITERATIVE (10 exp/rescale rounds), so two
    # faithful implementations legitimately diverge ~1e-4 relative on
    # ambiguous cloud pairs (r5 probe: pallas-vs-f64 8.3e-5, xla-vs-f64
    # 6.7e-5 — comparable).  The gated invariant is therefore each
    # device path's error AGAINST THE F64 ORACLE, with the Pallas kernel
    # allowed no worse than 2x the XLA composition it replaces.
    try:
        from jax import lax

        from caspr_tpu.ops.metrics import (
            _approx_match, _match_cost, _emd_fwd_impl)
        bb = 4
        a_np = rng.standard_normal((bb, 2048, 3)).astype(np.float32) * 0.3
        c_np = rng.standard_normal((bb, 2048, 3)).astype(np.float32) * 0.3
        a, c_ = jnp.asarray(a_np), jnp.asarray(c_np)
        got = np.asarray(_emd_fwd_impl(a, c_), np.float64)

        def one(args):
            x1, x2 = args
            return _match_cost(x1, x2, _approx_match(x1, x2))

        xla_v = np.asarray(lax.map(one, (a, c_)), np.float64)
        ref = np.array([
            _emd_f64_oracle(a_np[i].astype(np.float64),
                            c_np[i].astype(np.float64)) for i in range(bb)])
        sc = max(float(np.abs(ref).max()), 1e-9)
        e_pl = float(np.abs(got - ref).max() / sc)
        e_xla = float(np.abs(xla_v - ref).max() / sc)
        print(f"     emd pallas-vs-f64={e_pl:.3e} xla-vs-f64={e_xla:.3e}",
              flush=True)
        check("emd pallas vs f64 oracle", e_pl, max(2.0 * e_xla, 2e-4))
    except Exception as e:
        crash("emd pallas vs f64 oracle", e)

    # --- fused-d2 ball query == XLA d2 path (boundary-aware) --------------
    # Both paths compute d2 at HIGHEST precision, but their f32 rounding
    # can flip the inclusion of a point sitting AT the radius boundary
    # (|d2 - r^2| within f32 noise); one flip shifts every later slot of
    # that row, so raw index identity is data-dependent (r4's stream had
    # no boundary points; r5's did — 31 slots).  The gated invariant:
    # the two index SETS per row may differ only by points whose true
    # (f64) distance is within f32 rounding of the boundary.
    try:
        from caspr_tpu.ops.pointops import ball_query
        radius, kk = 0.2, 32
        xyz_np = rng.random((8, 1024, 3), dtype=np.float32)
        xyz = jnp.asarray(xyz_np)
        qry = xyz[:, :256]
        os.environ["CASPR_TPU_FUSED_D2"] = "1"
        a = np.asarray(ball_query(xyz, qry, radius, kk))
        os.environ["CASPR_TPU_FUSED_D2"] = "0"
        b_ = np.asarray(ball_query(xyz, qry, radius, kk))
        os.environ.pop("CASPR_TPU_FUSED_D2")
        # Both impls fill slots in ascending point-index order, so ONE
        # boundary flip shifts every later slot of that row; on a
        # SATURATED row (> kk true neighbors) the shift also displaces
        # the row's last legitimately-inside point — which then shows up
        # in the symmetric difference far from the boundary.  The gated
        # invariant is therefore per differing point:
        #   * within f32 rounding of the boundary (|d2-r2| <= 1e-5): OK
        #   * strictly INSIDE but excluded by an impl whose row is full
        #     (kk distinct indices): saturation displacement, OK
        #   * anything else (outside point included, inside point
        #     dropped from an unsaturated row): genuine selection error
        bad = 0.0
        n_flips = n_sat = 0
        r2 = radius * radius
        for bi, mi in zip(*np.nonzero((a != b_).any(axis=2))):
            sa_, sb = set(a[bi, mi].tolist()), set(b_[bi, mi].tolist())
            for pt in sa_.symmetric_difference(sb):
                d2v = ((xyz_np[bi, pt].astype(np.float64)
                        - xyz_np[bi, mi].astype(np.float64)) ** 2).sum()
                if abs(d2v - r2) <= 1e-5:
                    n_flips += 1
                    continue
                excl = sb if pt in sa_ else sa_
                if d2v < r2 and len(excl) == kk:
                    n_sat += 1
                    continue
                bad = max(bad, abs(d2v - r2))
        if n_flips or n_sat:
            print(f"     ball_query boundary flips={n_flips} "
                  f"saturation displacements={n_sat} "
                  f"worst unexplained |d2-r2|={bad:.3e}", flush=True)
        # f32 rounding of an O(1)-coordinate d2 is ~1e-7; anything beyond
        # 1e-5 from the boundary (and not a saturation displacement) is a
        # genuine selection error
        check("ball_query fused-d2 (boundary-aware)", bad, 1e-5)
    except Exception as e:
        crash("ball_query fused-d2 (boundary-aware)", e)

    print(f"\n{'EXACTNESS GATE FAILED: ' + ', '.join(FAILURES) if FAILURES else 'EXACTNESS GATE PASSED'}",
          flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
