"""AOT-export the flagship CaSPR inference functions for serving.

Serializes `model.reconstruct` (encode + latent ODE + CNF decode at the
10x2048 protocol) and `model.encode` (T-NOCS canonicalization) as
portable StableHLO artifacts via jax.export — the TPU-native deployment
story: a serving host deserializes the artifact and calls it with a
params pytree, with no dependency on this repo's Python (only jax).
Cross-platform lowering means the TPU artifact (Pallas kernels embedded
as Mosaic custom calls) can be produced from any host, including this
CPU-only one.

Usage:
    python tools/export_model.py --out exported/ [--weights ckpt.pkl]
        [--batch 16] [--platform tpu cpu] [--steps 10] [--points 2048]

Artifacts: <out>/caspr_reconstruct_<platform>.jaxexport and
           <out>/caspr_encode_<platform>.jaxexport, plus MANIFEST.txt.
Load with:
    from jax import export
    exp = export.deserialize(open(path, 'rb').read())
    pred, nfe = exp.call(params, state, observed, timestamps, key)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
from jax import export as jexp


def export_model(model, params, state, *, batch, steps, points, platform,
                 out_dir, loose_platform=False, check=False):
    """Export reconstruct + encode for one platform; returns file paths.

    ``loose_platform`` disables the artifact's platform safety check —
    needed to run a 'tpu' artifact on TPU shims that register under a
    different platform name (e.g. this container's 'axon' tunnel).
    ``check`` deserializes each artifact and calls it on the current
    backend right away (smoke the full serve path)."""
    key = jax.random.PRNGKey(0)
    observed = jnp.zeros((batch, steps, points, 4), jnp.float32)
    timestamps = jnp.linspace(0.0, 1.0, steps)

    # Kernel dispatch reads CASPR_TPU_KERNELS at trace time: force the
    # Pallas paths into TPU artifacts and the XLA paths into CPU ones,
    # restoring the caller's env afterwards (so `--platform tpu cpu`
    # exports both correctly in one process).
    prev_kernels = os.environ.get("CASPR_TPU_KERNELS")
    os.environ["CASPR_TPU_KERNELS"] = (
        "pallas" if platform == "tpu" else "xla"
    )

    def reconstruct(params, state, observed, timestamps, key):
        _, _, pred, _, nfe = model.reconstruct(
            params, state, observed, key,
            num_points=points, timestamps=timestamps,
            constant_in_time=False,
        )
        return pred, nfe

    def encode(params, observed):
        return model.encode(params, observed)

    os.makedirs(out_dir, exist_ok=True)
    disabled = (
        [jexp.DisabledSafetyCheck.platform()] if loose_platform else []
    )
    paths = []
    for name, fn, args in (
        ("reconstruct", reconstruct, (params, state, observed, timestamps,
                                      key)),
        ("encode", encode, (params, observed)),
    ):
        exp = jexp.export(
            jax.jit(fn), platforms=(platform,), disabled_checks=disabled
        )(*args)
        path = os.path.join(out_dir, f"caspr_{name}_{platform}.jaxexport")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        paths.append(path)
        print(f"{name} [{platform}]: {os.path.getsize(path)/1e6:.1f} MB "
              f"-> {path}")
        if check:
            import numpy as np

            out = jexp.deserialize(open(path, "rb").read()).call(*args)
            leaves = jax.tree_util.tree_leaves(out)
            print(f"  check: called ok, out[0] shape {leaves[0].shape}, "
                  f"finite={bool(np.all(np.isfinite(np.asarray(leaves[0]))))}")
    if prev_kernels is None:
        os.environ.pop("CASPR_TPU_KERNELS", None)
    else:
        os.environ["CASPR_TPU_KERNELS"] = prev_kernels
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="exported")
    ap.add_argument("--weights", default="")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--platform", nargs="+", default=["tpu"])
    ap.add_argument("--loose-platform-check", action="store_true",
                    help="Disable the artifact's platform safety check "
                         "(run 'tpu' artifacts on differently-named TPU "
                         "shims, e.g. the axon tunnel).")
    ap.add_argument("--check", action="store_true",
                    help="Deserialize and call each artifact right away.")
    args = ap.parse_args()

    if "tpu" in args.platform and not args.check:
        # cross-lowering needs no TPU; keep tracing on the host CPU
        # (export_model forces the right kernel paths per platform)
        jax.config.update("jax_platforms", "cpu")

    from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init
    from caspr_tpu.train import load_checkpoint, load_weights

    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    params, state = caspr_init(jax.random.PRNGKey(0), cfg)
    if args.weights:
        ckpt = load_checkpoint(args.weights)
        params = load_weights(params, ckpt["params"])
        if ckpt.get("state"):
            state = jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b, a.dtype), state, ckpt["state"]
            )

    manifest = [f"caspr-tpu export: batch={args.batch} steps={args.steps} "
                f"points={args.points} weights={args.weights or 'random'}"]
    for platform in args.platform:
        manifest += export_model(
            model, params, state, batch=args.batch, steps=args.steps,
            points=args.points, platform=platform, out_dir=args.out,
            loose_platform=args.loose_platform_check, check=args.check,
        )
    with open(os.path.join(args.out, "MANIFEST.txt"), "w") as f:
        f.write("\n".join(str(m) for m in manifest) + "\n")


if __name__ == "__main__":
    main()
