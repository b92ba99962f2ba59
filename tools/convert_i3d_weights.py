#!/usr/bin/env python
"""Convert pretrained I3D checkpoints (PyTorch / TorchScript state dicts) into
the .npz variable bundle consumed by camc2v_tpu.eval.fvd.FVDScorer.

reference context: 03_evaluation.py:77-130 loads TorchScript I3D nets from the
external LDenninger/FVD repo ('videogpt' = i3d_torchscript.pt logits variant,
'stylegan' = pooled features). Those weight files are data dependencies; this
tool maps their parameter names onto the flax InceptionI3D module.

Usage: python tools/convert_i3d_weights.py --torch i3d.pt --out i3d_flax.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def convert(torch_path: str, out_path: str) -> None:
    import torch

    sys.path.insert(0, ".")
    from camc2v_tpu.eval.fvd import InceptionI3D
    import jax
    import jax.numpy as jnp

    obj = torch.load(torch_path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
    else:
        sd = obj
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}

    model = InceptionI3D()
    template = model.init(jax.random.key(0), jnp.zeros((1, 9, 224, 224, 3)))

    flat = jax.tree_util.tree_flatten_with_path(template)
    leaves, treedef = flat
    target = {}
    for path, leaf in leaves:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        target[key] = leaf

    def torch_to_flax_key(k: str) -> str | None:
        # torchscript I3D names look like 'Conv3d_1a_7x7.conv3d.weight',
        # 'Mixed_3b.b0.conv3d.weight', '...bn.weight' etc.
        k = k.replace("module.", "")
        parts = k.split(".")
        if parts[-2] == "conv3d":
            leaf = {"weight": "kernel", "bias": "bias"}[parts[-1]]
            return "params/" + "/".join(parts[:-2]) + f"/Conv_0/{leaf}"
        if parts[-2] == "bn":
            col = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                   "running_mean": ("batch_stats", "mean"), "running_var": ("batch_stats", "var")}
            c, leaf = col.get(parts[-1], (None, None))
            if c is None:
                return None
            return f"{c}/" + "/".join(parts[:-2]) + f"/BatchNorm_0/{leaf}"
        return None

    mapped, missed = 0, []
    new = dict(target)
    for k, v in sd.items():
        fk = torch_to_flax_key(k)
        if fk is None or fk not in target:
            missed.append(k)
            continue
        arr = v
        if arr.ndim == 5:  # torch conv3d (O, I, kt, kh, kw) -> (kt, kh, kw, I, O)
            arr = arr.transpose(2, 3, 4, 1, 0)
        if tuple(arr.shape) != tuple(target[fk].shape):
            missed.append(f"{k} (shape {arr.shape} vs {target[fk].shape})")
            continue
        new[fk] = arr.astype(np.float32)
        mapped += 1

    # rebuild pytree and store as a plain nested dict (pickle-free-ish npz)
    import flax

    ordered = [new["/".join(str(getattr(kk, "key", kk)) for kk in path)] for path, _ in leaves]
    variables = jax.tree_util.tree_unflatten(treedef, ordered)
    state = flax.serialization.to_state_dict(jax.device_get(variables))
    np.savez_compressed(out_path, variables=np.asarray(state, dtype=object))
    print(f"mapped {mapped} tensors ({len(missed)} unmatched) -> {out_path}")
    if missed[:5]:
        print("first unmatched:", missed[:5])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    convert(args.torch, args.out)
