"""ResNet / ResNeXt backbone family, NHWC flax.linen.

Feature-extractor rebuild of the reference backbone
(`/root/reference/src/network/deeplab_v3_plus/models/backbone/resnet.py:8-127`
+ build.py:4-22): a torchvision-compatible ResNet with the classifier head
removed that returns ``{"feature" (2048ch), "low_feature" (256ch)}`` and
supports output-stride control via stride->dilation replacement
(os16 = dilate layer4, os8 = dilate layers 3+4).

Module/parameter naming intentionally mirrors the torchvision attribute
paths (``layer1_0 / conv2 / bn3 / downsample_0`` ...) so pretrained torch
checkpoints convert mechanically (see models/convert.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BlockDiagGroupedConv, kaiming_normal_out

Array = jnp.ndarray


class BasicBlock(nn.Module):
    """2-conv residual block (resnet18/34). expansion = 1."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    expansion = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv_kw = dict(use_bias=False, dtype=self.dtype, kernel_init=kaiming_normal_out)
        bn_kw = dict(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((self.dilation,) * 2,) * 2, kernel_dilation=(self.dilation,) * 2,
                      name="conv1", **conv_kw)(x)
        out = nn.BatchNorm(name="bn1", **bn_kw)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((self.dilation,) * 2,) * 2,
                      kernel_dilation=(self.dilation,) * 2, name="conv2", **conv_kw)(out)
        out = nn.BatchNorm(name="bn2", **bn_kw)(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               name="downsample_0", **conv_kw)(x)
            identity = nn.BatchNorm(name="downsample_1", **bn_kw)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """3-conv bottleneck block (resnet50+/resnext). expansion = 4.

    width = planes * (base_width / 64) * groups, grouped 3x3 — the
    torchvision parameterization that makes resnext50_32x4d = groups 32,
    width_per_group 4 (ref backbone/resnet.py:116-127).
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        conv_kw = dict(use_bias=False, dtype=self.dtype, kernel_init=kaiming_normal_out)
        bn_kw = dict(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups

        identity = x
        out = nn.Conv(width, (1, 1), name="conv1", **conv_kw)(x)
        out = nn.BatchNorm(name="bn1", **bn_kw)(out)
        out = nn.relu(out)
        if self.groups > 1:
            # block-diagonal dense grouped conv: identical numerics, ~6x
            # faster than XLA's grouped lowering on TPU.  (The nominal-FLOP
            # per-group einsum variant, layers.GroupedConvEinsum, measured
            # 1.5x SLOWER than block-diag despite 32x fewer FLOPs — the
            # 9-tap patch materialization traffic dominates.)
            out = BlockDiagGroupedConv(
                features=width, kernel_size=(3, 3), groups=self.groups,
                strides=(self.stride, self.stride),
                padding=((self.dilation,) * 2,) * 2,
                kernel_dilation=(self.dilation,) * 2,
                dtype=self.dtype, kernel_init=kaiming_normal_out, name="conv2",
            )(out)
        else:
            out = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                          padding=((self.dilation,) * 2,) * 2, kernel_dilation=(self.dilation,) * 2,
                          name="conv2", **conv_kw)(out)
        out = nn.BatchNorm(name="bn2", **bn_kw)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), name="conv3", **conv_kw)(out)
        out = nn.BatchNorm(name="bn3", **bn_kw)(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride), name="downsample_0", **conv_kw)(x)
            identity = nn.BatchNorm(name="downsample_1", **bn_kw)(identity)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """ResNet feature extractor returning high + low level features.

    Args mirror torchvision's ``ResNet`` so any family member is a config:
        block: "basic" or "bottleneck"
        layers: blocks per stage, e.g. (3, 4, 6, 3)
        replace_stride_with_dilation: one flag per stage 2/3/4
    """

    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    width_per_group: int = 64
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False, False)
    dtype: Optional[jnp.dtype] = None
    # Rematerialize each residual block under the backward pass
    # (nn.remat per block): residuals are kept only at block boundaries
    # and block internals recompute in the backward sweep.  Forward is
    # bit-identical; grads agree to f32 reassociation noise (XLA
    # reschedules the recomputed backward).  Trades ~1 extra forward of
    # FLOPs for the dominant activation-memory term.  TPU-specific (no
    # reference equivalent — the reference trains without checkpointing,
    # ref train.py).
    remat: bool = False

    @property
    def out_channels(self) -> int:
        return 512 * (4 if self.block == "bottleneck" else 1)

    @property
    def low_level_channels(self) -> int:
        return 64 * (4 if self.block == "bottleneck" else 1)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Dict[str, Array]:
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        expansion = block_cls.expansion
        if self.remat:
            # static_argnums=(2,) marks ``train`` (self=0, x=1) static so
            # the bool never becomes a tracer inside the checkpointed body.
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        conv_kw = dict(use_bias=False, dtype=self.dtype, kernel_init=kaiming_normal_out)
        bn_kw = dict(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        # Stem: 7x7/2 conv + BN + ReLU + 3x3/2 maxpool (torchvision layout)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), name="conv1", **conv_kw)(x)
        x = nn.BatchNorm(name="bn1", **bn_kw)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # Stage plan replicating torchvision _make_layer's stride/dilation
        # bookkeeping: when a stage is dilated its stride moves into the
        # dilation of *subsequent* blocks, while the stage's first block
        # keeps the previous dilation (ref backbone/build.py:12-16 os8/os16).
        inplanes = 64
        dilation = 1
        low_feature = None
        stage_planes = (64, 128, 256, 512)
        stage_strides = (1, 2, 2, 2)
        dilate_flags = (False,) + tuple(self.replace_stride_with_dilation)

        for stage_idx in range(4):
            planes = stage_planes[stage_idx]
            stride = stage_strides[stage_idx]
            previous_dilation = dilation
            if dilate_flags[stage_idx]:
                dilation *= stride
                stride = 1
            for block_idx in range(self.layers[stage_idx]):
                first = block_idx == 0
                needs_down = first and (stride != 1 or inplanes != planes * expansion)
                kwargs: Dict[str, Any] = dict(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=previous_dilation if first else dilation,
                    downsample=needs_down,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )
                if self.block == "bottleneck":
                    kwargs.update(groups=self.groups, base_width=self.width_per_group)
                x = block_cls(**kwargs)(x, train)
                if first:
                    inplanes = planes * expansion
            if stage_idx == 0:
                low_feature = x

        return {"feature": x, "low_feature": low_feature}


# -- family factories (ref backbone/resnet.py:56-177) ------------------------
_FAMILY = {
    "resnet18": dict(block="basic", layers=(2, 2, 2, 2)),
    "resnet34": dict(block="basic", layers=(3, 4, 6, 3)),
    "resnet50": dict(block="bottleneck", layers=(3, 4, 6, 3)),
    "resnet101": dict(block="bottleneck", layers=(3, 4, 23, 3)),
    "resnet152": dict(block="bottleneck", layers=(3, 8, 36, 3)),
    "resnext50_32x4d": dict(block="bottleneck", layers=(3, 4, 6, 3), groups=32, width_per_group=4),
    "resnext101_32x8d": dict(block="bottleneck", layers=(3, 4, 23, 3), groups=32, width_per_group=8),
    "wide_resnet50_2": dict(block="bottleneck", layers=(3, 4, 6, 3), width_per_group=128),
    "wide_resnet101_2": dict(block="bottleneck", layers=(3, 4, 23, 3), width_per_group=128),
}

__all_backbones__ = sorted(_FAMILY)


def build_backbone(
    name: str,
    output_stride: int,
    dtype: Optional[jnp.dtype] = None,
    module_name: Optional[str] = None,
    remat: bool = False,
) -> ResNetBackbone:
    """Backbone dispatcher (ref backbone/build.py:4-22).

    output_stride 16 dilates stage 4; output_stride 8 dilates stages 3+4.
    """
    if name not in _FAMILY:
        raise NotImplementedError(f"Unknown backbone {name!r}")
    if output_stride == 16:
        dilate = (False, False, True)
    elif output_stride == 8:
        dilate = (False, True, True)
    elif output_stride == 32:
        dilate = (False, False, False)
    else:
        raise NotImplementedError(f"Unsupported output stride {output_stride}")
    return ResNetBackbone(
        replace_stride_with_dilation=dilate, dtype=dtype, name=module_name,
        remat=remat, **_FAMILY[name]
    )
