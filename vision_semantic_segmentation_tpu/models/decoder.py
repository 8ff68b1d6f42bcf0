"""DeepLabV3+ decoder, NHWC flax.linen.

Rebuild of `/root/reference/src/network/deeplab_v3_plus/models/decoder.py:9-57`:
reduce the low-level feature with a 1x1 conv, upsample the ASPP output to
its size (align_corners=True), concatenate, refine with depthwise-separable
convs (unpadded, as in the reference), and classify with a 1x1 conv.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_align_corners
from .layers import ConvBNReLU, DepthwiseSeparableConv

Array = jnp.ndarray


class Decoder(nn.Module):
    out_channels: int
    low_level_out_channels: int = 48
    refine_channels: Sequence[int] = (256, 256)
    refine_kernel_size: Sequence[int] = (3, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feature: Array, low_level_feature: Array, train: bool = False) -> Array:
        assert len(self.refine_channels) == len(self.refine_kernel_size)

        low = ConvBNReLU(
            features=self.low_level_out_channels, kernel_size=1, bn=True, relu=True,
            dtype=self.dtype, name="low_level_conv",
        )(low_level_feature, train)

        feature = resize_align_corners(feature, (low.shape[-3], low.shape[-2]))
        x = jnp.concatenate([feature, low], axis=-1)

        # NOTE: the reference's refine convs use the torch default padding=0,
        # so each 3x3 shrinks the map by 2 pixels (ref decoder.py:33-37).
        # This is load-bearing for output shapes and is kept verbatim.
        for i, (ch, k) in enumerate(zip(self.refine_channels, self.refine_kernel_size)):
            x = DepthwiseSeparableConv(
                features=ch, kernel_size=k,
                depthwise_bn=True, pointwise_bn=True,
                depthwise_relu=True, pointwise_relu=True,
                dtype=self.dtype, name=f"refine_layers_{i}",
            )(x, train)
        x = ConvBNReLU(
            features=self.out_channels, kernel_size=1, dtype=self.dtype,
            name=f"refine_layers_{len(self.refine_channels)}",
        )(x, train)
        return x
