"""Atrous Spatial Pyramid Pooling, NHWC flax.linen.

Rebuild of `/root/reference/src/network/deeplab_v3_plus/models/aspp.py:11-103`:
a plain conv branch, k-1 depthwise-separable atrous branches, and a global
average-pool branch upsampled with align_corners=True; concatenated then
fused by a 1x1 conv + dropout.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_align_corners
from .layers import ConvBNReLU, DepthwiseSeparableConv

Array = jnp.ndarray


class ASPP(nn.Module):
    out_channels: int = 256
    atrous_channels: Sequence[int] = (256, 256, 256, 256)
    atrous_kernel_size: Sequence[int] = (1, 3, 3, 3)
    atrous_dilation: Sequence[int] = (1, 6, 12, 18)
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        num = len(self.atrous_channels)
        assert num == len(self.atrous_kernel_size) == len(self.atrous_dilation)

        # padding keeps each branch at the input spatial size
        # (ref aspp.py:45-49: pad 0 when dilation 1 else pad = dilation)
        outs = []
        for i in range(num):
            d = self.atrous_dilation[i]
            pad = 0 if d == 1 else d
            if i == 0:
                branch = ConvBNReLU(
                    features=self.atrous_channels[0],
                    kernel_size=self.atrous_kernel_size[0],
                    dilation=d,
                    padding=pad,
                    bn=True,
                    relu=True,
                    dtype=self.dtype,
                    name="module_pyramid_0",
                )
            else:
                branch = DepthwiseSeparableConv(
                    features=self.atrous_channels[i],
                    kernel_size=self.atrous_kernel_size[i],
                    dilation=d,
                    padding=pad,
                    depthwise_bn=True,
                    pointwise_bn=True,
                    depthwise_relu=True,
                    pointwise_relu=True,
                    dtype=self.dtype,
                    name=f"module_pyramid_{i}",
                )
            outs.append(branch(x, train))

        # Image-pooling branch: global average -> 1x1 conv -> upsample
        # (ref aspp.py:66-70,86-88); named global_avg_pool_1 because the
        # torch Sequential's index 0 is the parameter-free pool.
        pooled = jnp.mean(x, axis=(-3, -2), keepdims=True)
        pooled = ConvBNReLU(
            features=256, kernel_size=1, bn=True, relu=True, dtype=self.dtype,
            name="global_avg_pool_1",
        )(pooled, train)
        target_hw = (outs[0].shape[-3], outs[0].shape[-2])
        pooled = resize_align_corners(pooled, target_hw)
        outs.append(pooled)

        x = jnp.concatenate(outs, axis=-1)
        x = ConvBNReLU(
            features=self.out_channels, kernel_size=1, bn=True, relu=True,
            dtype=self.dtype, name="conv",
        )(x, train)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x
