"""Conv building blocks for the segmentation model family.

flax.linen equivalents of the reference's composite conv modules
(`/root/reference/src/network/core/nn/modules/conv.py:48-146`): a Conv2d
with optional BatchNorm/ReLU (bias disabled when BN is on), TF-style
"same" padding, and a depthwise-separable variant.  Layout is NHWC —
the TPU-native layout — with HWIO kernels.
"""
from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
IntPair = Union[int, Tuple[int, int]]


def _pair(v: IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def same_padding(kernel_size: IntPair, stride: IntPair, dilation: IntPair):
    """TF "SAME" padding amounts, matching the reference's formula.

    ``pad_total = dilation*k - dilation + 1 - stride`` clipped at zero, split
    with the extra pixel on the bottom/right (ref conv.py:6-41).
    Returns ((top, bottom), (left, right)).
    """
    k = np.array(_pair(kernel_size))
    s = np.array(_pair(stride))
    d = np.array(_pair(dilation))
    total = np.clip(d * k - d + 1 - s, 0, None)
    lo = total // 2
    hi = total - lo
    return ((int(lo[0]), int(hi[0])), (int(lo[1]), int(hi[1])))


# Trace-time default for routing eligible depthwise convs through the
# Pallas kernel (ops/pallas/depthwise.py) when the module's own
# ``use_pallas`` is left False.  Read when the module traces — flip it
# before building/jitting, not between dispatches.
PALLAS_DEPTHWISE = False

# torchvision-compatible default initializer (kaiming normal, fan_out, relu)
kaiming_normal_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# reference core/nn/init.py:4-29 equivalents (leaky_relu nonlinearity, a=0)
kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
xavier_uniform = nn.initializers.xavier_uniform()
xavier_normal = nn.initializers.xavier_normal()


class BlockDiagGroupedConv(nn.Module):
    """Grouped conv executed as dense conv(s) with block-diagonal kernels.

    XLA lowers ``feature_group_count > 1`` convolutions very poorly on TPU
    (measured 11x slower than dense for ResNeXt's 32-group 3x3s): each
    group becomes a sliver of the 128x128 MXU.  Expanding the grouped
    kernel to its block-diagonal dense equivalent is numerically identical
    (off-block weights are exact zeros) and runs at dense-conv speed for
    ~G-times the nominal FLOPs — a large net win for small channel groups.

    Tile-diagonal refinement: the MXU consumes the dense C x C kernel as a
    (C/128) x (C/128) grid of 128x128 lane tiles, and a block-diagonal
    kernel is nonzero only on the diagonal tiles (group boundaries align
    with the 128-lane tile whenever 128 % (C/G) == 0).  So instead of one
    dense C -> C conv, run T = C/128 independent dense 128 -> 128 convs —
    one per diagonal tile — cutting FLOPs by T (8x for ResNeXt50's layer4,
    where block-diag dense burns 32x nominal) at identical numerics and
    perfect MXU tiling.  Enabled automatically when shapes allow.

    The parameter keeps flax's grouped-kernel shape (kh, kw, in/g, out), so
    converted torch checkpoints load unchanged.
    """

    features: int
    kernel_size: Tuple[int, int]
    groups: int
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    kernel_dilation: Tuple[int, int] = (1, 1)
    dtype: Optional[jnp.dtype] = None
    kernel_init: nn.initializers.Initializer = None
    lane_tile: int = 128  # MXU lane width; the tile-diagonal chunk size

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        g = self.groups
        cg = in_ch // g
        co = self.features // g
        kh, kw = self.kernel_size
        init = self.kernel_init or kaiming_normal_out
        kernel = self.param("kernel", init, (kh, kw, cg, self.features))
        dtype = self.dtype or x.dtype

        def conv(lhs, rhs):
            return jax.lax.conv_general_dilated(
                lhs,
                rhs.astype(dtype),
                window_strides=self.strides,
                padding=self.padding,
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        # tile-diagonal: T chunks of exactly one lane tile, each holding
        # g/T whole groups (requires group edges on lane-tile edges)
        tile = self.lane_tile
        T = in_ch // tile if in_ch % tile == 0 else 1
        if T > 1 and g % T == 0 and self.features % T == 0:
            gpt = g // T  # groups per tile
            cin_t = in_ch // T  # == gpt * cg == tile
            cout_t = self.features // T  # == gpt * co
            # (kh, kw, cg, g*co) -> (kh, kw, cg, T, gpt, co); the output
            # axis is group-major so it factors as (T, gpt, co)
            k6 = kernel.reshape(kh, kw, cg, T, gpt, co)
            eye = jnp.eye(gpt, dtype=kernel.dtype)
            # per-tile block-diagonal dense kernels (kh, kw, T, cin_t, cout_t)
            dense_t = jnp.einsum("hwitgo,pg->hwtpigo", k6, eye).reshape(
                kh, kw, T, cin_t, cout_t
            )
            xc = x.astype(dtype)
            outs = [
                conv(
                    jax.lax.slice_in_dim(xc, t * cin_t, (t + 1) * cin_t, axis=3),
                    dense_t[:, :, t],
                )
                for t in range(T)
            ]
            return jnp.concatenate(outs, axis=-1)

        # expand to block-diagonal dense: dense[.., p*cg+i, g*co+o] =
        # kernel[.., i, g*co+o] iff p == g
        k5 = kernel.reshape(kh, kw, cg, g, co)
        eye = jnp.eye(g, dtype=kernel.dtype)
        dense = jnp.einsum("hwigo,pg->hwpigo", k5, eye).reshape(
            kh, kw, in_ch, self.features
        )
        return conv(x.astype(dtype), dense)


class ShiftedDepthwiseConv(nn.Module):
    """Depthwise conv as shifted multiply-adds (VPU-native).

    Numerically identical to ``nn.Conv(feature_group_count=C)`` with the
    same parameter layout (kernel (kh, kw, 1, C), optional bias), but each
    tap is an elementwise multiply-add over the shifted input — a shape
    XLA fuses into a single vectorized pass instead of its slow grouped
    lowering.

    ``use_pallas=True`` opts the 3x3 stride-1 pad==dilation case (ASPP's
    atrous branches) into the single-HBM-read full-plane Pallas kernel
    (ops/pallas/depthwise.py).  OFF by default: it only TIES the shifted
    form on v5e — the op is VPU/relayout-bound, not HBM-bound (see that
    module's docstring for numbers).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: nn.initializers.Initializer = None
    use_pallas: bool = False

    def _pallas_applicable(self, x: Array, dtype) -> bool:
        from ..ops.pallas import depthwise as pdw

        kh, kw = self.kernel_size
        dh, dw = self.dilation
        d = dh
        return (
            (kh, kw) == (3, 3)
            and self.strides == (1, 1)
            and dh == dw
            and self.padding == ((d, d), (d, d))
            and x.shape[0] == 1
            and pdw.supports(
                x.shape[1], x.shape[2], x.shape[3], d, jnp.dtype(dtype).itemsize
            )
        )

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        init = self.kernel_init or kaiming_normal_out
        kernel = self.param("kernel", init, (kh, kw, 1, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )

        dtype = self.dtype or x.dtype

        if (self.use_pallas or PALLAS_DEPTHWISE) and self._pallas_applicable(
            x, dtype
        ):
            from ..ops.pallas.depthwise import depthwise3x3_dilated

            acc = depthwise3x3_dilated(
                x.astype(dtype), kernel, self.dilation[0],
                interpret=jax.default_backend() == "cpu",
            )
            if bias is not None:
                acc = acc + bias.astype(dtype)
            return acc

        xc = x.astype(dtype)
        kc = kernel.astype(dtype)
        (ph0, ph1), (pw0, pw1) = self.padding
        xp = jnp.pad(xc, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
        dh, dw = self.dilation
        sh, sw = self.strides
        out_h = (xp.shape[1] - ((kh - 1) * dh + 1)) // sh + 1
        out_w = (xp.shape[2] - ((kw - 1) * dw + 1)) // sw + 1

        acc = None
        for i in range(kh):
            for j in range(kw):
                sl = xp[
                    :,
                    i * dh : i * dh + (out_h - 1) * sh + 1 : sh,
                    j * dw : j * dw + (out_w - 1) * sw + 1 : sw,
                    :,
                ]
                term = sl * kc[i, j, 0]
                acc = term if acc is None else acc + term
        if bias is not None:
            acc = acc + bias.astype(dtype)
        return acc


class GroupedConvEinsum(nn.Module):
    """Grouped conv as a per-group im2col batched matmul.

    Contracts K = kh*kw*(in/G) per group at the *nominal* grouped FLOPs.
    MEASURED SLOWER than BlockDiagGroupedConv on v5e (19.3 vs 12.8 ms for
    the ResNeXt50-os8 backbone at 720x960): the 9-tap patch materialization
    traffic outweighs the 32x FLOP saving.  Kept as the reference
    implementation for future layouts/hardware; parameter layout matches
    nn.Conv's grouped kernel (kh, kw, in/G, out).
    """

    features: int
    kernel_size: Tuple[int, int]
    groups: int
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    kernel_dilation: Tuple[int, int] = (1, 1)
    dtype: Optional[jnp.dtype] = None
    kernel_init: nn.initializers.Initializer = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        g = self.groups
        cg = in_ch // g
        co = self.features // g
        kh, kw = self.kernel_size
        init = self.kernel_init or kaiming_normal_out
        kernel = self.param("kernel", init, (kh, kw, cg, self.features))

        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)
        (ph0, ph1), (pw0, pw1) = self.padding
        xp = jnp.pad(xc, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
        dh, dw = self.kernel_dilation
        sh, sw = self.strides
        out_h = (xp.shape[1] - ((kh - 1) * dh + 1)) // sh + 1
        out_w = (xp.shape[2] - ((kw - 1) * dw + 1)) // sw + 1

        taps = []
        for i in range(kh):
            for j in range(kw):
                taps.append(
                    xp[
                        :,
                        i * dh : i * dh + (out_h - 1) * sh + 1 : sh,
                        j * dw : j * dw + (out_w - 1) * sw + 1 : sw,
                        :,
                    ]
                )
        # (B, Ho, Wo, kh*kw, G, cg) -> (B, Ho, Wo, G, kh*kw*cg)
        patches = jnp.stack(taps, axis=3).reshape(
            xc.shape[0], out_h, out_w, kh * kw, g, cg
        )
        patches = jnp.moveaxis(patches, 3, 4).reshape(
            xc.shape[0], out_h, out_w, g, kh * kw * cg
        )
        # kernel (kh, kw, cg, G*co) -> (G, kh*kw*cg, co), matching the
        # (tap-major, in-channel-minor) patch flattening
        kmat = (
            kernel.astype(dtype)
            .reshape(kh * kw, cg, g, co)
            .transpose(2, 0, 1, 3)
            .reshape(g, kh * kw * cg, co)
        )
        out = jnp.einsum("bhwgk,gko->bhwgo", patches, kmat)
        return out.reshape(xc.shape[0], out_h, out_w, self.features)


class ConvBNReLU(nn.Module):
    """Conv2d with optional BN and ReLU (ref conv.py:48-100).

    Attributes:
        features: output channels.
        kernel_size: int or (kh, kw).
        bn: add BatchNorm (conv bias disabled when True, ref conv.py:72).
        relu: add ReLU.
        padding: int pairs, or "same" for the TF formula above.
    """

    features: int
    kernel_size: IntPair = 1
    stride: IntPair = 1
    padding: Union[str, IntPair] = 0
    dilation: IntPair = 1
    groups: int = 1
    bn: bool = False
    bn_momentum: float = 0.1
    relu: bool = False
    dtype: Optional[jnp.dtype] = None
    kernel_init: nn.initializers.Initializer = kaiming_normal_out

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.padding == "same":
            pad = same_padding(self.kernel_size, self.stride, self.dilation)
        else:
            p = _pair(self.padding)
            pad = ((p[0], p[0]), (p[1], p[1]))

        in_ch = x.shape[-1]
        if self.groups == in_ch and self.features == in_ch:
            # Depthwise conv: XLA's feature_group_count lowering is slow on
            # TPU (same failure mode as grouped convs), so run it as
            # explicit shifted multiply-adds on the VPU — XLA fuses the
            # taps into one pass.  Parameter layout matches nn.Conv.
            x = ShiftedDepthwiseConv(
                features=self.features,
                kernel_size=_pair(self.kernel_size),
                strides=_pair(self.stride),
                padding=pad,
                dilation=_pair(self.dilation),
                use_bias=not self.bn,
                dtype=self.dtype,
                kernel_init=self.kernel_init,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=_pair(self.kernel_size),
                strides=_pair(self.stride),
                padding=pad,
                kernel_dilation=_pair(self.dilation),
                feature_group_count=self.groups,
                use_bias=not self.bn,
                dtype=self.dtype,
                kernel_init=self.kernel_init,
                name="conv",
            )(x)
        if self.bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.bn_momentum,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DepthwiseSeparableConv(nn.Module):
    """Depthwise conv followed by a pointwise 1x1 conv (ref conv.py:103-145)."""

    features: int
    kernel_size: IntPair = 3
    stride: IntPair = 1
    padding: Union[str, IntPair] = 0
    dilation: IntPair = 1
    depthwise_bn: bool = False
    pointwise_bn: bool = False
    bn_momentum: float = 0.1
    depthwise_relu: bool = False
    pointwise_relu: bool = False
    dtype: Optional[jnp.dtype] = None
    kernel_init: nn.initializers.Initializer = kaiming_normal_out

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        in_ch = x.shape[-1]
        x = ConvBNReLU(
            features=in_ch,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=in_ch,
            bn=self.depthwise_bn,
            bn_momentum=self.bn_momentum,
            relu=self.depthwise_relu,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="depthwise_cnn",
        )(x, train)
        x = ConvBNReLU(
            features=self.features,
            kernel_size=1,
            bn=self.pointwise_bn,
            bn_momentum=self.bn_momentum,
            relu=self.pointwise_relu,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="pointwise_cnn",
        )(x, train)
        return x
