"""Checkpoint-parity harness (BASELINE.md procedure, ready for weights).

Given a released reference PyTorch checkpoint (.pth), this converts it,
loads it into the TPU model, and runs the T-NOCS regression + observed
shape-reconstruction evals on the demo set — the "CD/EMD within 1%" check
from BASELINE.md.  The reference weights are not downloadable in this
environment (zero egress); run this as soon as a .pth is present:

    python tools/parity_check.py --weights pretrained_weights/cars_model.pth \
        --data-cfg data/configs/demo.cfg --out /tmp/parity
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import numpy as np

from caspr_tpu.data import DynamicPCLDataset, SequenceLoader
from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init
from caspr_tpu.train.checkpoint import load_checkpoint, load_weights
from caspr_tpu.utils import evaluations as ev
from caspr_tpu.utils.evaluations import test_shape_recon, test_tnocs_regression


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help=".pth or .pkl checkpoint")
    ap.add_argument("--data-cfg", default="data/configs/demo.cfg")
    ap.add_argument("--out", default="./parity_out")
    ap.add_argument("--batch-size", type=int, default=3)
    ap.add_argument("--matmul-precision", default="highest",
                    help="f32 matmuls for closest CUDA-parity numerics")
    args = ap.parse_args()

    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    os.makedirs(args.out, exist_ok=True)
    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    params, state = caspr_init(jax.random.PRNGKey(0), cfg)

    ckpt = load_checkpoint(args.weights)
    params = load_weights(params, ckpt["params"])
    if ckpt.get("state"):
        state = jax.tree_util.tree_map(
            lambda a, b: jax.numpy.asarray(b, a.dtype), state, ckpt["state"]
        )
    print(f"Loaded {args.weights}")

    ds = DynamicPCLDataset(
        args.data_cfg, split="test", num_pts=ev.PROTOCOL_NUM_PTS,
        seq_len=ev.PROTOCOL_NUM_STEPS, shift_time_to_zero=True,
        random_point_sample=False,
    )
    loader = SequenceLoader(ds, batch_size=args.batch_size, pad_last=True)

    log_out = os.path.join(args.out, "parity_tnocs.txt")
    space, time_err = test_tnocs_regression(model, params, state, loader, log_out)
    print(f"T-NOCS: spatial {space:.6f}, time {time_err:.6f}")

    log_out = os.path.join(args.out, "parity_recon.txt")
    test_shape_recon(
        model, params, state, loader, log_out,
        ev.ALL_OBSERVED_STEPS, ev.ALL_UNOBSERVED_STEPS,
        key=jax.random.PRNGKey(0),
    )
    print("Record the reference stack's numbers on the same data and compare "
          "(target: CD/EMD within 1%, BASELINE.md).")


if __name__ == "__main__":
    main()
