"""Checkpoint save/load with the reference's artifact semantics
(reference caspr/train.py:177-190 + caspr/utils/torch_utils.py:27-60):
`time_model_<epoch>` periodic saves, `BEST_time_model` early-stop save,
tolerant partial loads with missing/unexpected-key warnings, and an
encoder-only load from a full checkpoint.

Checkpoints are pickled pytrees of numpy arrays (.pkl).  Reference PyTorch
.pth checkpoints are converted on the fly via caspr_tpu.compat."""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, state, opt_state=None, epoch: int = 0,
                    extra: Optional[Dict[str, Any]] = None):
    payload = {
        "params": _to_numpy(params),
        "state": _to_numpy(state),
        "epoch": epoch,
    }
    if opt_state is not None:
        payload["opt_state"] = _to_numpy(opt_state)
    if extra:
        payload["extra"] = extra
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Load a checkpoint; reference .pth files are converted transparently."""
    if path.endswith(".pth") or path.endswith(".pt"):
        from ..compat.torch_convert import convert_torch_checkpoint

        params, state = convert_torch_checkpoint(path)
        return {"params": params, "state": state, "epoch": 0}
    with open(path, "rb") as f:
        return pickle.load(f)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = tree
    return out


def load_weights(target_params, loaded_params):
    """Tolerant merge of loaded into target (torch_utils.py:27-44 semantics):
    keys missing from the load are kept at their current value with a
    warning; unexpected keys are ignored with a warning; shape mismatches
    are treated as unexpected."""
    tgt_flat = _flatten(target_params)
    src_flat = _flatten(loaded_params)
    missing = [k for k in tgt_flat if k not in src_flat]
    unexpected = [k for k in src_flat if k not in tgt_flat]
    mismatched = [
        k
        for k in src_flat
        if k in tgt_flat and tuple(np.shape(src_flat[k])) != tuple(np.shape(tgt_flat[k]))
    ]
    if missing:
        print("WARNING: keys not found in the given checkpoint - ignoring...")
        print(missing)
    if unexpected or mismatched:
        print("WARNING: checkpoint keys not in the current model - ignoring...")
        print(unexpected + mismatched)
    skip = set(unexpected) | set(mismatched)

    def merge(path, leaf):
        key = ".".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path
        )
        if key in src_flat and key not in skip:
            return jax.numpy.asarray(src_flat[key], dtype=leaf.dtype).reshape(
                leaf.shape
            )
        return leaf

    return jax.tree_util.tree_map_with_path(merge, target_params)


def load_encoder_weights_from_full(target_params, loaded_params):
    """Load only encoder weights out of a full-model checkpoint
    (torch_utils.py:46-60)."""
    if "encoder" not in loaded_params:
        raise KeyError("checkpoint has no 'encoder' subtree")
    new_params = dict(target_params)
    new_params["encoder"] = load_weights(
        target_params["encoder"], loaded_params["encoder"]
    )
    return new_params
