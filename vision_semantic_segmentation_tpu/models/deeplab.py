"""DeepLabV3+ segmentation model, NHWC flax.linen.

Rebuild of `/root/reference/src/network/deeplab_v3_plus/models/deeplab_v3_plus.py:10-71`:
backbone -> ASPP -> decoder, with the atrous dilation schedule widened for
output-stride 8 ([1,12,24,36]) vs 16 ([1,6,12,18]) and optional
align_corners=True upsampling of the logits to the input size.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_align_corners
from .aspp import ASPP
from .decoder import Decoder
from .resnet import build_backbone

Array = jnp.ndarray


class DeepLabV3Plus(nn.Module):
    out_channels: int
    backbone: str = "resnext50_32x4d"
    output_stride: int = 8
    aspp_out_channels: int = 256
    aspp_atrous_channels: Sequence[int] = (256, 256, 256, 256)
    aspp_atrous_kernel_size: Sequence[int] = (1, 3, 3, 3)
    aspp_dropout: float = 0.5
    decoder_low_level_out_channels: int = 48
    decoder_refine_channels: Sequence[int] = (256, 256)
    decoder_refine_kernel_size: Sequence[int] = (3, 3)
    dtype: Optional[jnp.dtype] = None
    # per-block backbone rematerialization (see resnet.ResNetBackbone.remat)
    remat_backbone: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False, upsample_pred: bool = True) -> Array:
        """Args:
            x: (N, H, W, 3) image batch (normalized).
            upsample_pred: bilinearly upsample logits to the input size
                (ref deeplab_v3_plus.py:66-69).
        Returns:
            (N, H', W', out_channels) logits.
        """
        input_hw = (x.shape[-3], x.shape[-2])

        if self.output_stride == 16:
            atrous_dilation = (1, 6, 12, 18)
        elif self.output_stride == 8:
            atrous_dilation = (1, 12, 24, 36)
        else:
            raise NotImplementedError(f"output_stride {self.output_stride}")

        features = build_backbone(
            self.backbone, self.output_stride, dtype=self.dtype, module_name="backbone",
            remat=self.remat_backbone,
        )(x, train)

        feature = ASPP(
            out_channels=self.aspp_out_channels,
            atrous_channels=self.aspp_atrous_channels,
            atrous_kernel_size=self.aspp_atrous_kernel_size,
            atrous_dilation=atrous_dilation,
            dropout=self.aspp_dropout,
            dtype=self.dtype,
            name="aspp",
        )(features["feature"], train)

        logits = Decoder(
            out_channels=self.out_channels,
            low_level_out_channels=self.decoder_low_level_out_channels,
            refine_channels=self.decoder_refine_channels,
            refine_kernel_size=self.decoder_refine_kernel_size,
            dtype=self.dtype,
            name="decoder",
        )(feature, features["low_feature"], train)

        if upsample_pred:
            logits = resize_align_corners(logits.astype(jnp.float32), input_hw)
        return logits


def deeplab_from_cfg(
    cfg, dtype: Optional[jnp.dtype] = None, remat_backbone: bool = False
) -> DeepLabV3Plus:
    """Construct the model from a network config node (demo or train tree)."""
    backbone = cfg.MODEL.BACKBONE
    if backbone == "resnet":  # reference's deeplab default alias
        backbone = "resnet50"
    return DeepLabV3Plus(
        out_channels=cfg.DATASET.NUM_CLASSES,
        backbone=backbone,
        output_stride=cfg.MODEL.OUTPUT_STRIDE,
        aspp_out_channels=cfg.MODEL.ASPP.OUT_CHANNELS,
        aspp_atrous_channels=tuple(cfg.MODEL.ASPP.ATROUS_CHANNELS),
        aspp_atrous_kernel_size=tuple(cfg.MODEL.ASPP.ATROUS_KERNEL_SIZE),
        aspp_dropout=cfg.MODEL.ASPP.DROPOUT,
        decoder_low_level_out_channels=cfg.MODEL.DECODER.LOW_LEVEL_OUT_CHANNELS,
        decoder_refine_channels=tuple(cfg.MODEL.DECODER.REFINE_CHANNELS),
        decoder_refine_kernel_size=tuple(cfg.MODEL.DECODER.REFINE_KERNEL_SIZE),
        dtype=dtype,
        remat_backbone=remat_backbone,
    )
