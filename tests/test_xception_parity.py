"""Xception65 parity vs the reference torch module (read-only import).

The reference ships Xception65 unwired (ref models/build.py:9-10); we wire
it, so pin its numerics against the reference torch implementation with a
name-mapped weight conversion.
"""
import sys

import numpy as np
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference/src/network")

from vision_semantic_segmentation_tpu.models import Xception65, torch_state_dict_to_flax


def _remap_keys(sd):
    """Reference torch names -> our flax module names."""
    out = {}
    for key, value in sd.items():
        parts = key.split(".")
        top, idx = parts[0], parts[1]
        rest = parts[2:]

        if top == "entry_flow_modules":
            name = {
                "0": "entry_conv1", "1": "entry_conv2",
                "2": "entry_block1", "3": "entry_block2", "4": "entry_block3",
            }[idx]
        elif top == "middle_flow_modules":
            name = f"middle_block{int(idx)}"
        elif top == "exit_flow_modules":
            name = {"0": "exit_block", "1": "exit_conv0", "2": "exit_conv1",
                    "3": "exit_conv2"}[idx]
        else:
            raise KeyError(key)

        if rest and rest[0] == "residual_group1":
            # indices 0/2 are sepconvs (1/3 are ReLU) -> residual_0/1
            rest = [f"residual_{int(rest[1]) // 2}"] + rest[2:]
        elif rest and rest[0] == "residual_group2":
            # last module of group2 is the strided sepconv -> residual_<k-1>
            rest = ["residual_2"] + rest[2:]

        out[".".join([name] + rest)] = value
    return out


def _load_reference_xception():
    """Load the reference xception module directly (its package __init__
    pulls in torchvision, which is absent here)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_xception",
        "/root/reference/src/network/deeplab_v3_plus/models/backbone/xception.py",
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


class TestXceptionParity:
    def test_matches_reference_torch(self, rng):
        TorchXception65 = _load_reference_xception().Xception65

        torch.manual_seed(4)
        ref = TorchXception65(in_channels=3, return_low_level_feature=True)
        ref.eval()

        variables = jax.tree.map(
            jnp.asarray, torch_state_dict_to_flax(_remap_keys(ref.state_dict()))
        )

        model = Xception65()
        x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
        ours = model.apply(variables, jnp.asarray(x), train=False)

        with torch.no_grad():
            xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
            feat_ref, low_ref = ref(xt)

        np.testing.assert_allclose(
            np.asarray(ours["low_feature"]),
            low_ref.numpy().transpose(0, 2, 3, 1),
            atol=1e-4,
        )
        # randomly-initialized sum-skip middle blocks blow activations up to
        # ~1e7, so compare the top feature in relative terms
        feat_ref = feat_ref.numpy().transpose(0, 2, 3, 1)
        rel = np.abs(np.asarray(ours["feature"]) - feat_ref).max() / np.abs(feat_ref).max()
        assert rel < 1e-5, f"relative feature mismatch {rel:.2e}"
