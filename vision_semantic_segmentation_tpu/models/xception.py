"""Modified Aligned Xception-65, NHWC flax.linen.

Rebuild of the reference's written-but-unwired backbone
(`/root/reference/src/network/deeplab_v3_plus/models/backbone/xception.py:9-326`):
entry flow (2 convs + 3 conv-skip blocks), middle flow (16 sum-skip
blocks), exit flow (1 conv-skip block + 3 separable convs).  Residual
separable convs use TF "same" padding; blocks optionally expose the
pre-activation low-level feature.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBNReLU, DepthwiseSeparableConv

Array = jnp.ndarray


class XceptionBlock(nn.Module):
    """k separable convs + a conv/sum/none shortcut (ref xception.py:9-152).

    The residual path applies an entry ReLU, then k-1 separable convs each
    followed by ReLU, then a final separable conv without trailing ReLU.
    ``return_residual_features`` exposes the feature right before that last
    conv's preceding ReLU (the DeepLab low-level tap).
    """

    residual_channels: Sequence[int]
    residual_kernel_size: Sequence[int]
    residual_stride: Sequence[int]
    residual_dilation: Sequence[int]
    skip_type: Optional[str] = None  # 'conv' | 'sum' | None
    skip_channels: int = 0
    skip_kernel: int = 1
    skip_stride: int = 1
    entry_relu: bool = True
    return_residual_features: bool = False
    add_residual_padding: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        k = len(self.residual_channels)
        residual = nn.relu(x) if self.entry_relu else x
        low_level = None

        for i in range(k - 1):
            residual = DepthwiseSeparableConv(
                features=self.residual_channels[i],
                kernel_size=self.residual_kernel_size[i],
                stride=self.residual_stride[i],
                dilation=self.residual_dilation[i],
                padding="same",
                depthwise_bn=True,
                pointwise_bn=True,
                dtype=self.dtype,
                name=f"residual_{i}",
            )(residual, train)
            low_level = residual  # pre-ReLU tap (ref xception.py:133-136)
            residual = nn.relu(residual)

        if self.add_residual_padding:
            # Extra (0,1,0,1) zero pad before the strided conv so the
            # residual and the 1x1/2 shortcut sizes agree (ref :101-102).
            residual = jnp.pad(residual, ((0, 0), (0, 1), (0, 1), (0, 0)))
        residual = DepthwiseSeparableConv(
            features=self.residual_channels[-1],
            kernel_size=self.residual_kernel_size[-1],
            stride=self.residual_stride[-1],
            dilation=self.residual_dilation[-1],
            padding="same",
            depthwise_bn=True,
            pointwise_bn=True,
            dtype=self.dtype,
            name=f"residual_{k - 1}",
        )(residual, train)

        if self.skip_type == "conv":
            shortcut = ConvBNReLU(
                features=self.skip_channels,
                kernel_size=self.skip_kernel,
                stride=self.skip_stride,
                padding="same",
                bn=True,
                dtype=self.dtype,
                name="skip_connection",
            )(x, train)
        elif self.skip_type == "sum":
            shortcut = x
        else:
            shortcut = 0

        out = residual + shortcut
        if self.return_residual_features:
            return out, low_level
        return out


class Xception65(nn.Module):
    """Xception-65 feature extractor (ref xception.py:167-310).

    Returns ``{"feature" (2048ch, os16), "low_feature" (256ch, os4)}`` to
    match the backbone contract of the DeepLab head.
    """

    output_stride: int = 16
    dtype: Optional[jnp.dtype] = None
    # Rematerialize each Xception block under the backward pass (same
    # contract as resnet.ResNetBackbone.remat): forward bit-identical,
    # grads to f32 reassociation noise, peak activation memory bounded
    # at block boundaries.
    remat: bool = False

    out_channels = 2048
    low_level_channels = 256

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Dict[str, Array]:
        if self.output_stride != 16:
            raise NotImplementedError("Xception65 is built at output stride 16")
        block_cls = (
            nn.remat(XceptionBlock, static_argnums=(2,))
            if self.remat
            else XceptionBlock
        )

        # Entry flow stem
        x = ConvBNReLU(32, kernel_size=3, stride=2, bn=True, relu=True,
                       dtype=self.dtype, name="entry_conv1")(x, train)
        x = ConvBNReLU(64, kernel_size=3, stride=1, padding="same", bn=True,
                       relu=True, dtype=self.dtype, name="entry_conv2")(x, train)

        # Entry flow blocks (strided conv-skip)
        x = block_cls(
            residual_channels=(128, 128, 128), residual_kernel_size=(3, 3, 3),
            residual_stride=(1, 1, 2), residual_dilation=(1, 1, 1),
            skip_type="conv", skip_channels=128, skip_kernel=1, skip_stride=2,
            add_residual_padding=True, dtype=self.dtype, name="entry_block1",
        )(x, train)
        x, low_feature = block_cls(
            residual_channels=(256, 256, 256), residual_kernel_size=(3, 3, 3),
            residual_stride=(1, 1, 2), residual_dilation=(1, 1, 1),
            skip_type="conv", skip_channels=256, skip_kernel=1, skip_stride=2,
            return_residual_features=True, add_residual_padding=True,
            dtype=self.dtype, name="entry_block2",
        )(x, train)
        x = block_cls(
            residual_channels=(728, 728, 728), residual_kernel_size=(3, 3, 3),
            residual_stride=(1, 1, 2), residual_dilation=(1, 1, 1),
            skip_type="conv", skip_channels=728, skip_kernel=1, skip_stride=2,
            add_residual_padding=True, dtype=self.dtype, name="entry_block3",
        )(x, train)

        # Middle flow: 16 identity-skip blocks
        for i in range(16):
            x = block_cls(
                residual_channels=(728, 728, 728), residual_kernel_size=(3, 3, 3),
                residual_stride=(1, 1, 1), residual_dilation=(1, 1, 1),
                skip_type="sum", dtype=self.dtype, name=f"middle_block{i}",
            )(x, train)

        # Exit flow
        x = block_cls(
            residual_channels=(728, 1024, 1024), residual_kernel_size=(3, 3, 3),
            residual_stride=(1, 1, 1), residual_dilation=(1, 1, 1),
            skip_type="conv", skip_channels=1024, skip_kernel=1, skip_stride=1,
            dtype=self.dtype, name="exit_block",
        )(x, train)
        for i, ch in enumerate((1536, 1536, 2048)):
            x = DepthwiseSeparableConv(
                features=ch, kernel_size=3, padding="same",
                depthwise_bn=True, depthwise_relu=True,
                pointwise_bn=True, pointwise_relu=True,
                dtype=self.dtype, name=f"exit_conv{i}",
            )(x, train)

        return {"feature": x, "low_feature": low_feature}
