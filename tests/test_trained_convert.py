"""Trained-checkpoint conversion drill (VERDICT r03 #2).

The ``.pth -> .npz`` converter was previously validated only against
randomly-initialized torch oracles.  This module closes the remaining
path: a composed torch FLAGSHIP (torchvision ResNeXt50-os8 backbone +
the reference's own ASPP/Decoder modules, wired per ref
deeplab_v3_plus.py:51-71) is actually TRAINED for dozens of SGD steps —
so BatchNorm running statistics move off their init and every scale is
optimizer-shaped — then saved EXACTLY the reference's way: through the
reference's own ``Checkpoint`` class (``nn.DataParallel`` wrapper ->
``module.*``-prefixed keys, ``{'model': ..., 'optimizer': ...}`` payload,
``last_checkpoint`` pointer file; ref core/utils/checkpoint.py:36-129,
semantic_segmentation.py:28-32).  The converted variables must reproduce
the torch eval forward.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, "/root/reference/src/network")  # read-only oracles

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from vision_semantic_segmentation_tpu.models import DeepLabV3Plus  # noqa: E402
from vision_semantic_segmentation_tpu.models.convert import (  # noqa: E402
    convert_pth_to_npz,
    load_npz,
    resolve_last_checkpoint,
)


class ComposedFlagship(nn.Module):
    """torchvision ResNeXt50(os8) + reference ASPP/Decoder, reference wiring
    (ref deeplab_v3_plus.py:51-71 at the deployed widths, base_cfg.py:96-112)."""

    def __init__(self):
        super().__init__()
        from torch_oracle import make_oracle
        from deeplab_v3_plus.models.aspp import (
            AtrousSpatialPyramidPoolingModule,
        )
        from deeplab_v3_plus.models.decoder import Decoder as TorchDecoder

        self.backbone = make_oracle("resnext50_32x4d", (False, True, True))
        self.aspp = AtrousSpatialPyramidPoolingModule(
            in_channels=2048, out_channels=256,
            atrous_channels=(256, 256, 256, 256),
            atrous_kernel_size=(1, 3, 3, 3), atrous_dilation=(1, 12, 24, 36),
            dropout=0.5)
        self.decoder = TorchDecoder(
            in_channels=256, out_channels=19, low_level_in_channels=256,
            low_level_out_channels=48, refine_channels=(256, 256),
            refine_kernel_size=(3, 3))

    def forward(self, x):
        feat, low = self.backbone(x)
        feat = self.aspp(feat)
        logits = self.decoder(feat, low)
        return F.interpolate(
            logits, size=x.shape[2:], mode="bilinear", align_corners=True
        )


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    """Train the composed flagship on CPU and save it the reference's way."""
    from core.utils.checkpoint import Checkpoint  # the reference's own class

    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    model = ComposedFlagship()
    # the reference deploys through nn.DataParallel: 'module.*' keys
    # (ref semantic_segmentation.py:28); on a CUDA-less host DataParallel
    # forwards through the bare module but keeps the prefixed state dict
    wrapped = nn.DataParallel(model)
    optimizer = torch.optim.SGD(
        wrapped.parameters(), lr=0.01, momentum=0.9, weight_decay=1e-4
    )
    loss_fn = nn.CrossEntropyLoss(ignore_index=255)

    # small synthetic task: blobs of class-colored noise
    images = rng.standard_normal((4, 3, 65, 65)).astype(np.float32)
    labels = rng.integers(0, 19, (4, 65, 65)).astype(np.int64)
    labels[0, :5] = 255
    x = torch.from_numpy(images)
    y = torch.from_numpy(labels)

    wrapped.train()
    losses = []
    for it in range(30):
        i = it % 2
        optimizer.zero_grad()
        logits = wrapped(x[2 * i : 2 * i + 2])
        loss = loss_fn(logits, y[2 * i : 2 * i + 2])
        loss.backward()
        optimizer.step()
        losses.append(float(loss))

    # BN running stats must have moved off their init: the drill is about
    # TRAINED statistics, not init values
    bn = model.backbone.bn1
    assert float(bn.running_mean.abs().max()) > 1e-3
    assert float((bn.running_var - 1).abs().max()) > 1e-3
    assert int(bn.num_batches_tracked) == 30

    save_dir = tmp_path_factory.mktemp("ref_ckpt")
    ckpt = Checkpoint(wrapped, optimizer=optimizer, save_dir=str(save_dir))
    ckpt.save("model_0030", epoch=30)

    wrapped.eval()
    with torch.no_grad():
        ref_out = wrapped(x[:1]).numpy()
    return {
        "save_dir": str(save_dir),
        "input": images[:1],
        "ref_out": ref_out,
        "losses": losses,
    }


class TestTrainedConversion:
    def test_pointer_resolves_reference_layout(self, trained_checkpoint):
        path = resolve_last_checkpoint(trained_checkpoint["save_dir"])
        assert path.endswith("model_0030.pth") and os.path.exists(path)

    def test_trained_forward_parity(self, trained_checkpoint, tmp_path):
        """JAX forward on the CONVERTED trained weights == torch eval
        forward — moving BN statistics, optimizer payload in the .pth,
        module.* prefixes and the last_checkpoint pointer all digested."""
        npz = convert_pth_to_npz(
            trained_checkpoint["save_dir"], str(tmp_path / "flagship.npz")
        )
        variables = jax.tree.map(jnp.asarray, load_npz(npz))

        model = DeepLabV3Plus(out_channels=19)  # defaults ARE the flagship
        x = np.transpose(trained_checkpoint["input"], (0, 2, 3, 1))
        ours = np.asarray(
            model.apply(variables, jnp.asarray(x), train=False,
                        upsample_pred=True)
        )
        ref = np.transpose(trained_checkpoint["ref_out"], (0, 2, 3, 1))
        np.testing.assert_allclose(ours, ref, atol=2e-3)
        # and the training did something: loss moved
        losses = trained_checkpoint["losses"]
        assert losses[-1] < losses[0]

    def test_batch_stats_roundtrip_trained_values(self, trained_checkpoint, tmp_path):
        """The converted batch_stats are the torch running stats, not init."""
        npz = convert_pth_to_npz(
            trained_checkpoint["save_dir"], str(tmp_path / "bs.npz")
        )
        variables = load_npz(npz)
        mean = variables["batch_stats"]["backbone"]["bn1"]["mean"]
        var = variables["batch_stats"]["backbone"]["bn1"]["var"]
        assert np.abs(mean).max() > 1e-3
        assert np.abs(var - 1.0).max() > 1e-3
