"""Benchmark: CaSPR inference throughput on the paper protocol.

Measures full reconstruct (encode -> latent ODE -> CNF decode) throughput
in 10-frame x 2048-point sequences/sec on one chip — the reference's
headline eval setting (reference README.md:84, caspr/utils/
evaluations.py:26-27,108-115).

Headline = TRAINED weights (artifacts/demo_trained.pkl, a 300-epoch demo
checkpoint committed to the repo): a trained CNF takes ~2.4x more solver
steps than a random-init one (decoder NFE ~62 vs ~26), so random-init
throughput would overstate production speed.  Falls back to random init
(and says so in the metric name) if the checkpoint is missing.

``vs_baseline``: the reference publishes no numbers and its CUDA stack
cannot run here, so the ratio is computed against a *derived upper bound*
on the reference's V100 throughput — FLOP-count of its per-NFE work
against V100 fp32 peak, crediting it zero overhead (see
reference_v100_bound and BASELINE.md "Derived throughput bound").  The
printed ratio is therefore a LOWER bound on the true speedup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax

try:
    from caspr_tpu.utils.runtime import enable_compile_cache
except ImportError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from caspr_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp

# throughput batch (saturation point; the reference protocol used 2 on a
# 16GB V100).  CASPR_BENCH_BATCH overrides for saturation sweeps.
# r4b sweep on v5e: b16 24.57 / b24 28.41 / b32 29.33 / b48 OOM / b64 OOM.
# r5: the lane-shuffle gather deleted the split kernel's 3x bf16 tables,
# so b48 fits under r5-defaults and is the new saturation point
# (35.18 seqs/sec vs 33.38 at b32, battery_r5/48 vs 47); b64 still OOMs.
# The fallback chain retries at b32 if 48 ever OOMs on a tighter-HBM run.
try:
    BATCH = int(os.environ.get("CASPR_BENCH_BATCH", "48"))
except ValueError:
    BATCH = 48
T, N = 10, 2048
CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "artifacts", "demo_trained.pkl")


def reference_v100_bound(nfe_cnf: float) -> float:
    """Upper bound on the reference stack's V100 seqs/sec at this NFE.

    Per CNF dynamics evaluation the reference executes (per sequence):
      - the 4-layer concatsquash ODEnet forward over T*N points
        (reference caspr/models/odefunc.py:119-138; dims 3-512-512-512-3,
        three matmuls per layer but the hyper_gate/hyper_bias ones are
        context-sized and negligible)
      - the Hutchinson divergence via torch.autograd.grad *inside* the
        dynamics (odefunc.py:13-31) — a full backward through the net,
        ~2x the forward FLOPs.
    Crediting the reference V100 fp32 peak (15.7 TFLOP/s) with zero
    overhead for the Python-level torchdiffeq stepping (cnf.py:100-119
    runs each RK stage as ~dozens of kernel launches), zero time for the
    encoder/latent ODE/memory traffic, gives a throughput it cannot
    exceed; dividing our measurement by it lower-bounds the speedup.
    """
    dims = [(3, 512), (512, 512), (512, 512), (512, 3)]
    fwd_flops_per_seq = 2 * T * N * sum(a * b for a, b in dims)
    flops_per_seq = 3.0 * fwd_flops_per_seq * max(nfe_cnf, 1.0)
    v100_fp32_peak = 15.7e12
    return v100_fp32_peak / flops_per_seq


def reference_v100_train_bound(
    nfe_fwd: float, nfe_bwd: float, b: int = 5, t: int = 5, n: int = 1024
) -> float:
    """Upper bound on the reference stack's V100 train-step rate
    (steps/sec) at the measured NFE split, by the same derived-bound
    method as reference_v100_bound (BASELINE.md): count ONLY the CNF
    dynamics matmul FLOPs the reference cannot avoid, credit V100 fp32
    peak with zero overhead for everything else (encoder, latent ODE,
    TNOCS loss, optimizer, Python-level RK stepping, memory traffic).

    Per forward NFE the reference runs the concatsquash net forward plus
    the Hutchinson divergence's torch.autograd.grad (a full backward
    through the net, ~2x forward: reference caspr/models/odefunc.py:13-31)
    = ~3x net-forward FLOPs.  Per adjoint (backward) NFE it additionally
    differentiates that divergence-carrying graph w.r.t. state, params
    and context (torchdiffeq adjoint; the VJP of a graph costs >= 2x the
    graph's forward) — credited at only 6x net-forward FLOPs, i.e. the
    VJP alone with the graph recompute free.  Undercounting the
    reference's FLOPs makes the returned rate an over-estimate of what a
    V100 could do, so dividing our measured rate by it LOWER-bounds the
    true train-step speedup.
    """
    dims = [(3, 512), (512, 512), (512, 512), (512, 3)]
    f_step = 2.0 * b * t * n * sum(a_ * b_ for a_, b_ in dims)
    flops_per_step = 3.0 * f_step * max(nfe_fwd, 1.0) + 6.0 * f_step * max(
        nfe_bwd, 0.0
    )
    v100_fp32_peak = 15.7e12
    return v100_fp32_peak / flops_per_step


def model_flops_per_seq(nfe_cnf: float, nfe_ode: float) -> float:
    """Useful model FLOPs per 10x2048 sequence (matmul work only, the
    MFU convention): encoder + latent-ODE solve + CNF decode at the
    measured NFE.  Gather/one-hot helper matmuls are overhead, not model
    math, and are excluded — so the reported MFU is conservative."""
    from caspr_tpu.models.pointnet2 import PointNet2Config

    tn = T * N
    # PointNet global feature (4 -> 64 -> 128 -> 1024) over all T*N points
    flops = 2 * tn * (4 * 64 + 64 * 128 + 128 * 1024)
    # PointNet++ backbone, per frame.  conv1 of each SA scale is factored
    # through the gather (ops/sa_fused2.py) and runs over the N source
    # points; conv2/3 run over the M*K grouped rows.
    p2 = PointNet2Config()
    n_pts = N
    cin = p2.in_features + 3
    for lvl in p2.sa_levels():
        m = min(lvl.num_points_out, n_pts)
        for _, k, dims in lvl.scales:
            d1, d2, d3 = dims
            flops += 2 * T * (n_pts * cin * d1 + m * k * (d1 * d2 + d2 * d3))
        cin = sum(s[2][-1] for s in lvl.scales) + 3
        n_pts = m
    sizes = [N] + [min(p, N) for p in p2.sa_points]
    for fi, (fp_in, fp_dims) in enumerate(p2.fp_dims()):
        rows = sizes[len(sizes) - 2 - fi]
        flops += 2 * T * rows * (fp_in * fp_dims[0] + fp_dims[0] * fp_dims[1])
    flops += 2 * T * N * (512 * 512 + 512 * 512)  # final head
    # TPointNet2 fusion convs: 1600 -> 1600 -> 1600 over T*N points
    flops += 2 * tn * (1600 * 1600 + 1600 * 1600) + 2 * tn * 1600 * 4
    # latent ODE: 64 -> 512 -> 512 -> 512 -> 64 MLP per NFE
    flops += (
        2 * (64 * 512 + 512 * 512 + 512 * 512 + 512 * 64) * max(nfe_ode, 1.0)
    )
    # CNF decode: concatsquash stack per NFE.  The sampling path (r4
    # default) integrates the primal only — no log-density is requested,
    # so the Hutchinson tangent's 2x is counted only when
    # CASPR_TPU_SAMPLE_DIV=1 restores the reference's
    # integrate-everything behavior (models/cnf.py::cnf_block_apply).
    dims = [(3, 512), (512, 512), (512, 512), (512, 3)]
    tangent = 2 if os.environ.get("CASPR_TPU_SAMPLE_DIV", "0") == "1" else 1
    flops += tangent * 2 * tn * sum(a * b for a, b in dims) * max(nfe_cnf, 1.0)
    return flops


V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)


# Progressive kernel-preset fallback: if a Mosaic compile rejects a
# default kernel on real hardware, the bench must still produce its JSON
# line — each failure re-execs with the next (previously proven) preset.
# r5-defaults = r4 set + the lane-shuffle gather (CASPR_TPU_GATHER=shuf)
# and the dual-radius ball query, every default validated by
# tools/hw_exactness.py on the device.
PRESETS = [
    ("r5-defaults", {}),
    # same kernels at the pre-r5 saturation batch: the first fallback if
    # b48 ever OOMs (HBM headroom at b48 is ~1G; tunnel-side allocator
    # variance could tip it on a bad day)
    ("r5-defaults-b32", {"CASPR_BENCH_BATCH": "32"}),
    ("r2-proven", {
        "CASPR_BENCH_BATCH": "32",
        "CASPR_TPU_GATHER": "onehot",
        "CASPR_TPU_FUSED_D2": "0",
        "CASPR_TPU_INTERP": "dense",
    }),
    ("xla", {"CASPR_TPU_KERNELS": "xla", "CASPR_BENCH_BATCH": "32"}),
]


def main(preset: str = "r5-defaults"):
    # test hooks for the fallback chain (no device work): FAIL_BELOW
    # makes earlier presets raise, SMOKE prints a stub record
    try:
        fail_below = int(os.environ.get("CASPR_BENCH_FAIL_BELOW", "-1"))
    except ValueError:
        fail_below = -1
    if preset in [p for p, _ in PRESETS[:fail_below + 1]]:
        raise RuntimeError(f"test hook: preset {preset} forced to fail")
    if os.environ.get("CASPR_BENCH_SMOKE", "0") == "1":
        print(json.dumps({"metric": "smoke", "value": 0, "unit": "none",
                          "vs_baseline": 0, "kernel_preset": preset}))
        return

    from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init

    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(0)
    params, state = caspr_init(key, cfg)

    trained = False
    if os.path.exists(CKPT):
        from caspr_tpu.train.checkpoint import load_checkpoint, load_weights

        ck = load_checkpoint(CKPT)
        params = load_weights(params, ck["params"])
        state = jax.tree_util.tree_map(jnp.asarray, ck["state"])
        trained = True

    x = jax.random.uniform(key, (BATCH, T, N, 4))
    times = jnp.broadcast_to(jnp.linspace(0.0, 5.0, T), (BATCH, T))
    x = x.at[..., 3].set(times[:, :, None])
    timestamps = jnp.linspace(0.0, 1.0, T)

    @jax.jit
    def recon(params, state, x, k):
        _, _, pred, _, nfe = model.reconstruct(
            params, state, x, k, num_points=N, timestamps=timestamps
        )
        return pred, nfe

    def sync(arr):
        # 1-element host transfer: reliable sync on the remote TPU backend
        import numpy as _np
        _np.asarray(arr[(0,) * arr.ndim])

    # warmup / compile
    pred, nfe = recon(params, state, x, key)
    sync(pred)
    nfe_ode = float(nfe[0])
    nfe_cnf = float(nfe[1])

    iters = 5
    start = time.perf_counter()
    for i in range(iters):
        pred, nfe = recon(params, state, x, jax.random.fold_in(key, i))
    sync(pred)  # FIFO device queue: last-result sync covers all iterations
    elapsed = time.perf_counter() - start

    seqs_per_sec = BATCH * iters / elapsed
    metric = "reconstruct_throughput_10x2048"
    if not trained:
        metric += "_random_init"
    flops_per_sec = seqs_per_sec * model_flops_per_seq(nfe_cnf, nfe_ode)
    record = {
        "metric": metric,
        "value": round(seqs_per_sec, 4),
        "unit": "seqs/sec/chip",
        "vs_baseline": round(
            seqs_per_sec / reference_v100_bound(nfe_cnf), 4
        ),
        "model_flops_per_sec": round(flops_per_sec / 1e12, 3),
        "model_flops_unit": "TFLOP/s",
        "mfu_bf16": round(flops_per_sec / V5E_BF16_PEAK, 4),
        "nfe_cnf": round(nfe_cnf, 1),
        "kernel_preset": preset,
        # which sampling-decode path produced the headline (ADVICE r4:
        # logged runs should record the active trace-time mode)
        "decode_mode": (
            "stacked_dx_div"
            if os.environ.get("CASPR_TPU_SAMPLE_DIV", "0") == "1"
            else "primal_only"
        ),
    }
    if os.environ.get("CASPR_BENCH_TRAIN", "1") == "1":
        # The reference's defining cost is TRAINING (~5 days on 4 GPUs,
        # reference README.md:144) — the driver artifact carries the
        # train-step measurement alongside reconstruct throughput.
        # CASPR_BENCH_TRAIN=0 opts out (e.g. on a cold compile cache,
        # where the extra jit costs a 10-25 min single-core compile).
        ms, nfe_fwd_cnf, nfe_bwd_cnf = measure_train_step()
        record["train_step_ms"] = round(ms, 1)
        record["train_seqs_per_sec"] = round(5 * 1e3 / ms, 2)
        bound = reference_v100_train_bound(nfe_fwd_cnf, nfe_bwd_cnf) * 5
        record["train_vs_baseline"] = round(
            record["train_seqs_per_sec"] / bound, 4
        )
        record["train_nfe_cnf_fwd"] = round(nfe_fwd_cnf, 1)
        record["train_nfe_cnf_bwd"] = round(nfe_bwd_cnf, 1)
    print(json.dumps(record))


def measure_train_step(b=5, t=5, n=1024, iters=5):
    """Full train step (fwd + continuous-adjoint bwd + Adam) at the
    reference full-pipeline recipe shapes (reference README.md:127-136).
    Default-on in the bench JSON (CASPR_BENCH_TRAIN=0 opts out on a cold
    compile cache); measured history lives in BENCHMARKS.md.

    Returns (step_ms, cnf_nfe_forward, cnf_nfe_backward) — the NFE split
    feeds the derived V100 train bound."""
    import numpy as np

    from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init
    from caspr_tpu.train.loop import make_optimizer, make_train_step

    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(0)
    params, state = caspr_init(key, cfg)
    tx = make_optimizer(1e-4)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, 0.01, 100.0)

    def batch(i):
        kx, kt = jax.random.split(jax.random.fold_in(key, i))
        x = jax.random.uniform(kx, (b, t, n, 4))
        times = jnp.sort(jax.random.uniform(kt, (b, t)), axis=1)
        times = times - times[:, :1]
        x = x.at[..., 3].set(times[:, :, None] * 5.0)
        tgt = jax.random.uniform(kt, (b, t, n, 4))
        tgt = tgt.at[..., 3].set(times[:, :, None])
        return x, tgt

    x, tgt = batch(0)
    params, opt_state, state, metrics = step(
        params, opt_state, state, x, tgt, key
    )
    np.asarray(metrics["loss"])
    nfe_total_cnf = float(np.floor(np.asarray(metrics["nfe"][1])))
    nfe_fwd_cnf = float(np.floor(np.asarray(metrics["nfe_forward"][1])))
    start = time.perf_counter()
    for i in range(1, iters + 1):
        x, tgt = batch(i)
        params, opt_state, state, metrics = step(
            params, opt_state, state, x, tgt, jax.random.fold_in(key, 100 + i)
        )
    np.asarray(metrics["loss"])
    ms = (time.perf_counter() - start) / iters * 1e3
    return ms, nfe_fwd_cnf, max(nfe_total_cnf - nfe_fwd_cnf, 0.0)


if __name__ == "__main__":
    import subprocess
    import sys

    _idx = int(os.environ.get("CASPR_BENCH_PRESET_IDX", "0"))
    try:
        main(preset=PRESETS[_idx][0])
    except Exception as _e:  # noqa: BLE001 — any kernel failure falls back
        if _idx + 1 < len(PRESETS):
            _name, _env = PRESETS[_idx + 1]
            print(
                f"bench preset {PRESETS[_idx][0]} failed "
                f"({type(_e).__name__}: {str(_e)[:200]}); retrying with "
                f"{_name}",
                file=sys.stderr,
            )
            _envs = dict(os.environ)
            _envs.update(_env)
            _envs["CASPR_BENCH_PRESET_IDX"] = str(_idx + 1)
            sys.exit(subprocess.call(
                [sys.executable, os.path.abspath(__file__)], env=_envs
            ))
        raise
