"""Cross-lower the TPU kernel configurations on the CPU host to catch
Pallas->Mosaic lowering rejections BEFORE hardware is available.

jax.export runs the full jax lowering pipeline for the target platform
(including every pallas_call's Mosaic-dialect lowering) without needing
the target backend, so a config that fails here would fail at compile
time on the TPU too.  It does NOT run the Mosaic->binary compile, so a
pass here is NECESSARY-NOT-SUFFICIENT — the r3 battery proved it: the
blk gather and the small-C DMA gather both passed this gate and were
rejected by the backend compiler ("Multiple source vregs along gather
dimension" / lane-alignment).  Two complements close the gap:

  * ``AOT=1``: compile each case against the LIVE TPU toolchain
    (jit(...).lower().compile() — full Mosaic->binary, VMEM budgeting,
    no execution, no input data).  Needs the tunnel; full-model cases
    cost 10-25 min cold on this single-core host but populate the
    persistent compile cache, making subsequent real runs warm.
  * ``tools/hw_exactness.py`` (battery stage 1): compiles AND runs every
    default-dispatched kernel at real site shapes against f32 oracles —
    the cheap kernel-granular gate; run it first when the tunnel is up.

Each case builds fresh jitted functions (kernel dispatch reads env at
trace time).  Shapes are the real ones: reconstruct at the 10x2048
bench protocol (B=16), encode at N=2048, train step at the reference
recipe (B5 T5 N1024).

Env: CASES=name1,name2 restricts to named cases; default runs all.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

AOT = os.environ.get("AOT", "0") == "1"
if not AOT:
    # CPU host (the sitecustomize force-selects the remote axon TPU).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import export as jexp

# (name, env overrides, program)
CASES = [
    # the unmeasured r3 DEFAULTS at the bench protocol + train recipe
    ("defaults_recon", {}, "recon"),
    ("defaults_encode", {}, "encode"),
    ("defaults_train_adjoint", {}, "train"),
    # opt-ins awaiting the battery
    # (r4) the exhaustion warning is now a +0.5 NFE marker — pure device
    # arithmetic, so discrete mode cross-lowers AND runs on axon with no
    # CASPR_TPU_ODE_WARN knob needed.
    ("train_discrete", {"CASPR_TPU_ODE_BWD": "discrete"}, "train"),
    ("train_cnf_bwd_pallas", {"CASPR_TPU_CNF_BWD": "pallas"}, "train"),
    ("gather_dma", {"CASPR_TPU_GATHER": "dma"}, "encode"),
    ("gather_dma_allc", {"CASPR_TPU_GATHER_DMA_ALLC": "1"}, "encode"),
    # gather_blk RETIRED: Mosaic rejects the lane-shuffle kernel at every
    # tested shape (r3 battery); dispatch now raises ValueError for it.
    # 'shuf' (r5) is its working 128-lane-subtile formulation.
    ("gather_shuf", {"CASPR_TPU_GATHER": "shuf"}, "encode"),
    # rows-major emission variant: in-kernel subtile transposes replace
    # the caller's HBM moveaxis (r5 A/B)
    ("gather_shuf_rows", {"CASPR_TPU_GATHER": "shuf",
                          "CASPR_TPU_GATHER_SHUF_ROWS": "1"}, "encode"),
    ("gather_onehot", {"CASPR_TPU_GATHER": "onehot"}, "encode"),
    # lanes-packed SA conv stack + packed-emit gather (ops/sa_packed.py)
    ("sa_stack_packed", {"CASPR_TPU_SA_STACK": "packed"}, "encode"),
    ("sa_bf16_acts", {"CASPR_TPU_SA_BF16_ACTS": "1"}, "encode"),
    ("matmul_cast", {"CASPR_TPU_MATMUL_CAST": "1"}, "recon"),
    # the recon path defaults to the primal-only sampling kernel (r4);
    # CASPR_TPU_SAMPLE_DIV=1 restores the stacked (dx, div) kernel there
    ("recon_sample_div", {"CASPR_TPU_SAMPLE_DIV": "1"}, "recon"),
    ("cnf_tile512", {"CASPR_TPU_SAMPLE_DIV": "1",
                     "CASPR_TPU_CNF_TILE": "512"}, "recon"),
    ("cnf_tile2048", {"CASPR_TPU_SAMPLE_DIV": "1",
                      "CASPR_TPU_CNF_TILE": "2048"}, "recon"),
    ("cnf_primal_tile512", {"CASPR_TPU_CNF_PRIMAL_TILE": "512"}, "recon"),
    ("cnf_primal_tile2048", {"CASPR_TPU_CNF_PRIMAL_TILE": "2048"}, "recon"),
    ("fps_level", {"CASPR_TPU_FPS": "level"}, "encode"),
    ("fused_sa2", {"CASPR_TPU_SA": "fused2"}, "encode"),
    ("fused_sa3", {"CASPR_TPU_SA": "fused3"}, "encode"),
    ("interp_dense", {"CASPR_TPU_INTERP": "dense"}, "encode"),
    # shuf is the r5 default (covered by defaults_encode); the MXU
    # interpolation-matrix kernel stays dispatchable
    ("interp_pallas", {"CASPR_TPU_INTERP": "pallas"}, "encode"),
]

_BASE_ENV = {
    "CASPR_TPU_KERNELS": "pallas",  # dispatch reads env at trace time
}


def _lower(fn, args, name):
    if AOT:
        # full backend compile on the live TPU toolchain (no execution);
        # catches what export-lowering can't — Mosaic binary rejections,
        # VMEM budget overflows — and warms the persistent compile cache
        jax.jit(fn).lower(*args).compile()
        print(f"  ok: {name} AOT-compiled for the live TPU backend",
              flush=True)
        return
    exp = jexp.export(jax.jit(fn), platforms=("tpu",))(*args)
    n_calls = exp.mlir_module().count("tpu_custom_call")
    print(f"  ok: {name} lowered for tpu ({n_calls} tpu_custom_call sites)",
          flush=True)


def run_case(name, env, program):
    from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init

    print(f"=== {name} ({program}) env={env}", flush=True)
    old = {}
    for k, v in {**_BASE_ENV, **env}.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        cfg = CaSPRConfig()  # full reference dims
        model = CaSPRModel(cfg)
        key = jax.random.PRNGKey(0)
        params, state = caspr_init(key, cfg)
        if program == "encode":
            x = jnp.zeros((2, 10, 2048, 4), jnp.float32)
            _lower(lambda p, xx: model.encode(p, xx), (params, x), name)
        elif program == "recon":
            observed = jnp.zeros((16, 10, 2048, 4), jnp.float32)
            ts = jnp.linspace(0.0, 1.0, 10)

            def recon(p, s, obs, t, k):
                _, _, pred, _, nfe = model.reconstruct(
                    p, s, obs, k, num_points=2048, timestamps=t,
                    constant_in_time=False)
                return pred, nfe

            _lower(recon, (params, state, observed, ts, key), name)
        elif program == "train":
            from caspr_tpu.train.loop import make_optimizer, make_train_step

            tx = make_optimizer(1e-4)
            opt_state = tx.init(params)
            b, t, n = 5, 5, 1024
            x = jnp.zeros((b, t, n, 4), jnp.float32)
            tgt = jnp.zeros((b, t, n, 4), jnp.float32)
            step = make_train_step(model, tx, cnf_loss_weight=0.01,
                                   tnocs_loss_weight=100.0)
            _lower(step, (params, opt_state, state, x, tgt, key), name)
        return True
    except Exception:
        print(f"  FAIL: {name}", flush=True)
        traceback.print_exc()
        return False
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    if AOT:
        from caspr_tpu.utils.runtime import enable_compile_cache

        enable_compile_cache()
    only = os.environ.get("CASES", "")
    sel = [c for c in CASES if not only or c[0] in only.split(",")]
    results = {}
    for name, env, program in sel:
        results[name] = run_case(name, env, program)
    print("\n== lowering smoke summary ==")
    for name, ok in results.items():
        print(f"  {'PASS' if ok else 'FAIL'}  {name}")
    if not all(results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
