"""torch checkpoint -> flax variables conversion.

The reference ships ``.pth`` checkpoints saved from an ``nn.DataParallel``
wrapper (``module.*`` key prefix, ref semantic_segmentation.py:28-32,
core/utils/checkpoint.py:36-64).  This module converts those state dicts —
including BatchNorm running statistics — into the flax variable tree of
our NHWC models, and offers a file-level ``.pth -> .npz`` converter so TPU
jobs never need torch at runtime.

Mapping rules (torch -> flax):
  * drop the DataParallel ``module.`` prefix
  * ``layer1.0.conv1.weight``    -> params/layer1_0/conv1/kernel (OIHW->HWIO)
  * ``...bn.weight / bias``      -> params/.../bn/scale, bias
  * ``...bn.running_mean / var`` -> batch_stats/.../bn/mean, var
  * ``num_batches_tracked``      -> dropped
  * integer path components are fused into their parent with '_'
    (torch ModuleList/Sequential indices -> our explicit child names)
"""
from __future__ import annotations

import os.path as osp
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _to_numpy(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _fuse_indices(parts: Tuple[str, ...]) -> Tuple[str, ...]:
    """Fuse numeric path components into the preceding name.

    ``('layer1', '0', 'conv1')`` -> ``('layer1_0', 'conv1')`` — matching our
    module naming convention (see models/resnet.py docstring).
    """
    fused = []
    for p in parts:
        if p.isdigit() and fused:
            fused[-1] = f"{fused[-1]}_{p}"
        else:
            fused.append(p)
    return tuple(fused)


def torch_state_dict_to_flax(
    state_dict: Mapping[str, Any],
) -> Dict[str, Dict[str, Any]]:
    """Convert a torch state dict into ``{'params': ..., 'batch_stats': ...}``."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for key, tensor in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        path = _fuse_indices(tuple(parts[:-1]))
        value = _to_numpy(tensor)

        if leaf == "weight":
            if value.ndim == 4:
                # conv OIHW -> HWIO (grouped convs keep I = in/groups)
                _set_path(params, path + ("kernel",), value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:
                # linear (unused by the seg models, handled for completeness)
                _set_path(params, path + ("kernel",), value.transpose(1, 0))
            else:
                _set_path(params, path + ("scale",), value)  # BN gamma
        elif leaf == "bias":
            _set_path(params, path + ("bias",), value)
        elif leaf == "running_mean":
            _set_path(batch_stats, path + ("mean",), value)
        elif leaf == "running_var":
            _set_path(batch_stats, path + ("var",), value)
        else:
            raise ValueError(f"Unrecognized torch parameter leaf: {key}")

    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str, model_key: str = "model") -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint and convert its model weights.

    The reference checkpoints store the model under the 'model' key
    (ref semantic_segmentation.py:31-32, checkpoint.py:36-64).
    """
    import torch  # local import: torch is a conversion-time-only dependency

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt[model_key] if isinstance(ckpt, dict) and model_key in ckpt else ckpt
    return torch_state_dict_to_flax(state_dict)


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        _set_path(tree, tuple(key.split("/")), value)
    return tree


def save_npz(variables: Mapping[str, Any], path: str) -> None:
    """Persist a flax variable tree as a flat .npz archive."""
    np.savez(path, **_flatten(variables))


def load_npz(path: str) -> Dict[str, Any]:
    """Load a flax variable tree saved by :func:`save_npz`."""
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def resolve_last_checkpoint(path: str) -> str:
    """Resolve a reference-style checkpoint location to a ``.pth`` file.

    The reference's trainer writes ``<name>.pth`` plus a ``last_checkpoint``
    pointer file holding that (possibly relative) filename
    (ref core/utils/checkpoint.py:102-129).  Given a training output
    DIRECTORY, follow the pointer; given a file path, return it unchanged.
    """
    import os

    if osp.isdir(path):
        pointer = osp.join(path, "last_checkpoint")
        if not osp.exists(pointer):
            raise FileNotFoundError(
                f"{path} is a directory without a last_checkpoint pointer"
            )
        with open(pointer) as f:
            named = f.read().strip()
        if not os.path.isabs(named):
            named = osp.join(path, named)
        return named
    return path


def convert_pth_to_npz(pth_path: str, npz_path: str | None = None) -> str:
    """One-time ``.pth -> .npz`` file conversion (SURVEY.md section 5).

    ``pth_path`` may also be a reference training output directory — its
    ``last_checkpoint`` pointer is followed (ref checkpoint.py:102-129).
    """
    pth_path = resolve_last_checkpoint(pth_path)
    if npz_path is None:
        npz_path = osp.splitext(pth_path)[0] + ".npz"
    save_npz(load_torch_checkpoint(pth_path), npz_path)
    return npz_path


def main():  # pragma: no cover - CLI utility
    import argparse

    parser = argparse.ArgumentParser(description="Convert a torch .pth checkpoint to .npz")
    parser.add_argument("pth", help="path to the torch checkpoint")
    parser.add_argument("--out", default=None, help="output .npz path")
    args = parser.parse_args()
    out = convert_pth_to_npz(args.pth, args.out)
    print(f"wrote {out}")


if __name__ == "__main__":  # pragma: no cover
    main()
