"""Int8 post-training quantization (PTQ) for the segmentation backbone.

The reference serves the network in fp32 on CUDA and has no quantized
path (ref semantic_segmentation.py:51-57).  On the v5e the backbone's
big pointwise convs are HBM-bandwidth-bound in bf16 (they measure ~102
TFLOP/s ~= their roofline; scripts/probe_bn_fusion.py), so no bf16
kernel can speed them up — but int8 halves the traffic AND doubles the
MXU peak (394 TOPS).  Measured per-conv speedups incl. the requantize
epilogue: 1.44-1.79x at the production shapes
(scripts/probe_int8_conv.py); int8 roofline for the whole backbone is
7.5 ms vs 26.8 ms measured bf16 (scripts/roofline_backbone.py).

Design (TPU-first, pure-functional):

  * The float flax modules and their checkpoints stay untouched —
    quantization is an OFFLINE transform of the standard ``variables``
    dict into a ``qpack`` pytree (int8 HWIO kernels, per-output-channel
    weight scales, folded BN affines, calibrated activation scales).
  * ``quant_backbone_apply`` is a pure function mirroring
    ``ResNetBackbone.__call__``'s structure (models/resnet.py:138-189)
    with int8 tensors flowing BETWEEN the convs of a block: conv1 and
    conv2 emit int8 directly (their requantize epilogue folds the ReLU
    into the [0, 127] clip), conv3/downsample emit float for the
    residual add.  One quantize pass per block (conv1's input).
  * Symmetric int8, per-tensor activation scales (absmax calibration),
    per-output-channel weight scales.  Conv accumulation is int32
    (max |sum| <= 9*2048*127^2 < 2^31).
  * The grouped 3x3s keep the tile-diagonal dense execution
    (models/layers.py::BlockDiagGroupedConv) with int8 tile kernels —
    the block-diagonal zeros quantize to exact int8 zeros.
  * ``float_backbone_apply`` is the same walker with a float executor;
    it must match the flax backbone EXACTLY (pinned in
    tests/test_quant.py) — the guard against structural drift — and it
    doubles as the calibration pass (records per-site input absmax as
    scalars, so calibration never materializes intermediates).

The stem (7x7 on 3 channels) and everything outside the backbone
(ASPP/decoder) stay bf16: the stem gains nothing from int8, and the
ASPP depthwise branches are VPU-bound where int8 does not help.
``quantize_deeplab`` / ``quant_deeplab_apply`` compose the quantized
backbone with the float ASPP + decoder applied from the same variables.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .aspp import ASPP
from .decoder import Decoder
from .resnet import BasicBlock, Bottleneck, ResNetBackbone

Array = jnp.ndarray

_EPS = 1e-5  # resnet.py BatchNorm epsilon
_TINY = 1e-12


# --------------------------------------------------------------------------
# small numeric helpers


def _to_int8(x: Array, scale: Array) -> Array:
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)


def _conv(x, w, stride=(1, 1), padding=((0, 0), (0, 0)), dilation=(1, 1),
          prefer=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer,
    )


def _bn_affine(bn_params, bn_stats):
    """Inference BN as (scale, bias) per channel, f32."""
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    mean = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    s = gamma / jnp.sqrt(var + _EPS)
    return s, beta - mean * s


def _expand_tile_diag(kernel: Array, groups: int, lane_tile: int = 128):
    """Grouped kernel (kh, kw, cg, features) -> per-tile dense kernels
    (kh, kw, T, tile, features/T), matching BlockDiagGroupedConv's
    tile-diagonal factorization (models/layers.py:105-129).  Works for
    any dtype (int8 zeros are exact)."""
    kh, kw, cg, features = kernel.shape
    in_ch = cg * groups
    T = in_ch // lane_tile if in_ch % lane_tile == 0 else 1
    if not (T > 1 and groups % T == 0 and features % T == 0):
        T = 1
    if T == 1:
        # single dense block-diagonal kernel
        k5 = kernel.reshape(kh, kw, cg, groups, features // groups)
        eye = jnp.eye(groups, dtype=jnp.float32)
        dense = jnp.einsum(
            "hwigo,pg->hwpigo", k5.astype(jnp.float32), eye
        ).reshape(kh, kw, in_ch, features)
        return dense.astype(kernel.dtype)[:, :, None], 1
    gpt = groups // T
    cin_t = in_ch // T
    cout_t = features // T
    k6 = kernel.reshape(kh, kw, cg, T, gpt, features // groups)
    eye = jnp.eye(gpt, dtype=jnp.float32)
    dense_t = jnp.einsum(
        "hwitgo,pg->hwtpigo", k6.astype(jnp.float32), eye
    ).reshape(kh, kw, T, cin_t, cout_t)
    # (kh, kw, T, cin_t, cout_t)
    return dense_t.astype(kernel.dtype), T


# --------------------------------------------------------------------------
# structural walker — mirrors ResNetBackbone.__call__ exactly


def _stage_plan(module: ResNetBackbone):
    """Replicates the stride/dilation bookkeeping of resnet.py:152-185."""
    block_cls = Bottleneck if module.block == "bottleneck" else BasicBlock
    expansion = block_cls.expansion
    inplanes = 64
    dilation = 1
    stage_planes = (64, 128, 256, 512)
    stage_strides = (1, 2, 2, 2)
    dilate_flags = (False,) + tuple(module.replace_stride_with_dilation)
    plan = []
    for stage_idx in range(4):
        planes = stage_planes[stage_idx]
        stride = stage_strides[stage_idx]
        previous_dilation = dilation
        if dilate_flags[stage_idx]:
            dilation *= stride
            stride = 1
        for block_idx in range(module.layers[stage_idx]):
            first = block_idx == 0
            needs_down = first and (stride != 1 or inplanes != planes * expansion)
            plan.append(dict(
                name=f"layer{stage_idx + 1}_{block_idx}",
                planes=planes,
                stride=stride if first else 1,
                dilation=previous_dilation if first else dilation,
                downsample=needs_down,
                stage=stage_idx,
            ))
            if first:
                inplanes = planes * expansion
    return block_cls, plan


def _walk(module: ResNetBackbone, variables, x: Array,
          conv_fn: Callable[..., Array], dtype) -> Dict[str, Array]:
    """Run the backbone structure with ``conv_fn`` executing every
    conv+BN(+ReLU) site.  conv_fn(site, x, relu, emit_int8, *, kernel,
    bn, stride, padding, dilation, groups) -> y."""
    params = variables["params"]
    stats = variables["batch_stats"]

    # ---- stem (always float; bf16 compute like the flax path) ----
    h = _conv(x.astype(dtype), params["conv1"]["kernel"].astype(dtype),
              stride=(2, 2), padding=((3, 3), (3, 3)))
    s, b = _bn_affine(params["bn1"], stats["bn1"])
    h = jax.nn.relu(h.astype(jnp.float32) * s + b).astype(dtype)
    h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    block_cls, plan = _stage_plan(module)
    low_feature = None
    for blk in plan:
        name = blk["name"]
        bp, bs = params[name], stats[name]
        d = blk["dilation"]
        st = blk["stride"]
        pad = ((d, d), (d, d))

        def run(cname, x_in, relu, emit_int8, stride=(1, 1),
                padding=((0, 0), (0, 0)), dilation=(1, 1), groups=1,
                bn_suffix=None):
            return conv_fn(
                f"{name}/{cname}", x_in, relu, emit_int8,
                kernel=bp[cname]["kernel"],
                bn=(bp[bn_suffix], bs[bn_suffix]),
                stride=stride, padding=padding, dilation=dilation,
                groups=groups,
            )

        identity = h
        if block_cls is Bottleneck:
            out = run("conv1", h, True, True, bn_suffix="bn1")
            out = run("conv2", out, True, True, stride=(st, st), padding=pad,
                      dilation=(d, d), groups=module.groups, bn_suffix="bn2")
            out = run("conv3", out, False, False, bn_suffix="bn3")
        else:
            out = run("conv1", h, True, True, stride=(st, st), padding=pad,
                      dilation=(d, d), bn_suffix="bn1")
            out = run("conv2", out, False, False, padding=pad,
                      dilation=(d, d), bn_suffix="bn2")
        if blk["downsample"]:
            identity = run("downsample_0", h, False, False, stride=(st, st),
                           bn_suffix="downsample_1")
        h = jax.nn.relu(
            out.astype(jnp.float32) + identity.astype(jnp.float32)
        ).astype(dtype)
        if blk["stage"] == 0:
            low_feature = h  # last stage-0 block's output wins

    return {"feature": h, "low_feature": low_feature}


# --------------------------------------------------------------------------
# float executor (structural twin of the flax path + calibration)


def _make_float_conv_fn(module: ResNetBackbone, dtype, record=None):
    groups_expand = module.groups

    def conv_fn(site, x, relu, emit_int8, *, kernel, bn, stride, padding,
                dilation, groups):
        if record is not None:
            record[site] = jnp.max(jnp.abs(x.astype(jnp.float32)))
        xc = x.astype(dtype)
        if groups > 1:
            dense_t, T = _expand_tile_diag(kernel.astype(dtype), groups)
            if T == 1:
                y = _conv(xc, dense_t[:, :, 0], stride, padding, dilation)
            else:
                cin_t = xc.shape[-1] // T
                outs = [
                    _conv(
                        jax.lax.slice_in_dim(
                            xc, t * cin_t, (t + 1) * cin_t, axis=3
                        ),
                        dense_t[:, :, t], stride, padding, dilation,
                    )
                    for t in range(T)
                ]
                y = jnp.concatenate(outs, axis=-1)
        else:
            y = _conv(xc, kernel.astype(dtype), stride, padding, dilation)
        s, b = _bn_affine(*bn)
        yf = y.astype(jnp.float32) * s + b
        if relu:
            yf = jax.nn.relu(yf)
        return yf.astype(dtype)

    return conv_fn


def float_backbone_apply(module: ResNetBackbone, variables, x: Array,
                         dtype=jnp.float32) -> Dict[str, Array]:
    """The walker with a float executor — must equal
    ``module.apply(variables, x, train=False)`` (pinned in tests)."""
    return _walk(module, variables, x, _make_float_conv_fn(module, dtype),
                 dtype)


def calibrate_backbone(module: ResNetBackbone, variables, frames,
                       dtype=jnp.float32) -> Dict[str, float]:
    """Per-site input absmax over calibration frames (NHWC f32 batches).

    Returns scalar floats only — no intermediate is ever materialized
    beyond the forward itself.
    """
    def stats_fn(v, x):
        record: Dict[str, Array] = {}
        _walk(module, v, x,
              _make_float_conv_fn(module, dtype, record=record), dtype)
        return record

    # AOT lower+compile: the first-call jit dispatch path costs minutes
    # for programs this size in the dev environment (ROUND_NOTES r03)
    compiled: Dict[Tuple[int, ...], Any] = {}
    acc: Dict[str, float] = {}
    for f in frames:
        x = jnp.asarray(f)
        fn = compiled.get(x.shape)
        if fn is None:
            fn = jax.jit(stats_fn).lower(variables, x).compile()
            compiled[x.shape] = fn
        r = jax.device_get(fn(variables, x))
        for k, v in r.items():
            acc[k] = max(acc.get(k, 0.0), float(v))
    return acc


# --------------------------------------------------------------------------
# quantization transform


def quantize_backbone(module: ResNetBackbone, variables,
                      act_absmax: Dict[str, float]) -> Dict[str, Any]:
    """Build the qpack pytree from float variables + calibration stats.

    Per quantized site: w_q (int8, expanded tile kernels for grouped),
    w_scale (cout,), bn folded (scale, bias), in_scale scalar, and for
    int8-emitting sites the out_scale (= the consumer's in_scale)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    block_cls, plan = _stage_plan(module)

    qpack: Dict[str, Any] = {}

    def quantize_site(name, cname, bn_suffix, emit_to: Optional[str],
                      groups=1):
        site = f"{name}/{cname}"
        kernel = np.asarray(params[name][cname]["kernel"], np.float32)
        if groups > 1:
            dense_t, T = _expand_tile_diag(jnp.asarray(kernel), groups)
            dense_t = np.asarray(
                jax.device_get(dense_t), np.float32
            )  # (kh, kw, T, cin_t, cout_t)
            w_scale = np.maximum(
                np.abs(dense_t).max(axis=(0, 1, 3)), _TINY
            ) / 127.0  # (T, cout_t)
            w_q = np.clip(
                np.round(dense_t / w_scale[None, None, :, None, :]),
                -127, 127,
            ).astype(np.int8)
            w_scale_flat = w_scale.reshape(-1)  # concat over tiles == cout
        else:
            w_scale_flat = np.maximum(
                np.abs(kernel).max(axis=(0, 1, 2)), _TINY
            ) / 127.0
            w_q = np.clip(
                np.round(kernel / w_scale_flat), -127, 127
            ).astype(np.int8)
        s, b = jax.device_get(
            _bn_affine(params[name][bn_suffix], stats[name][bn_suffix])
        )
        in_scale = max(act_absmax[site], _TINY) / 127.0
        entry = dict(
            w_q=jnp.asarray(w_q),
            w_scale=jnp.asarray(w_scale_flat, jnp.float32),
            bn_scale=jnp.asarray(s, jnp.float32),
            bn_bias=jnp.asarray(b, jnp.float32),
            in_scale=jnp.float32(in_scale),
        )
        if emit_to is not None:
            entry["out_scale"] = jnp.float32(
                max(act_absmax[emit_to], _TINY) / 127.0
            )
        qpack[site] = entry

    for blk in plan:
        name = blk["name"]
        if block_cls is Bottleneck:
            quantize_site(name, "conv1", "bn1", f"{name}/conv2")
            quantize_site(name, "conv2", "bn2", f"{name}/conv3",
                          groups=module.groups)
            quantize_site(name, "conv3", "bn3", None)
        else:
            quantize_site(name, "conv1", "bn1", f"{name}/conv2")
            quantize_site(name, "conv2", "bn2", None)
        if blk["downsample"]:
            quantize_site(name, "downsample_0", "downsample_1", None)
    return qpack


# --------------------------------------------------------------------------
# quantized executor


def _make_quant_conv_fn(module: ResNetBackbone, qpack, dtype):
    def conv_fn(site, x, relu, emit_int8, *, kernel, bn, stride, padding,
                dilation, groups):
        q = qpack[site]
        in_scale = q["in_scale"]
        if x.dtype == jnp.int8:
            xq = x
        else:
            xq = _to_int8(x, in_scale)

        if groups > 1:
            w_q = q["w_q"]  # (kh, kw, T, cin_t, cout_t)
            T = w_q.shape[2]
            cin_t = xq.shape[-1] // T
            outs = [
                _conv(
                    jax.lax.slice_in_dim(xq, t * cin_t, (t + 1) * cin_t,
                                         axis=3),
                    w_q[:, :, t], stride, padding, dilation,
                    prefer=jnp.int32,
                )
                for t in range(T)
            ]
            y32 = jnp.concatenate(outs, axis=-1)
        else:
            y32 = _conv(xq, q["w_q"], stride, padding, dilation,
                        prefer=jnp.int32)

        total_scale = in_scale * q["w_scale"] * q["bn_scale"]  # (cout,)
        bias = q["bn_bias"]
        if emit_int8:
            out_scale = q["out_scale"]
            yf = y32.astype(jnp.float32) * (total_scale / out_scale) + (
                bias / out_scale
            )
            lo = 0.0 if relu else -127.0  # ReLU folds into the clip
            return jnp.clip(jnp.round(yf), lo, 127).astype(jnp.int8)
        yf = y32.astype(jnp.float32) * total_scale + bias
        if relu:
            yf = jax.nn.relu(yf)
        return yf.astype(dtype)

    return conv_fn


def quant_backbone_apply(module: ResNetBackbone, variables, qpack, x: Array,
                         dtype=jnp.bfloat16) -> Dict[str, Array]:
    """Int8 backbone forward.  jit with ``module``/``dtype`` static."""
    return _walk(module, variables, x,
                 _make_quant_conv_fn(module, qpack, dtype), dtype)


# --------------------------------------------------------------------------
# DeepLab-level composition


def _aspp_decoder_modules(model):
    """Standalone ASPP/Decoder twins of the submodules DeepLabV3Plus
    builds inline (models/deeplab.py:58-75) — applied with the sliced
    variables of the same names."""
    if model.output_stride == 16:
        atrous = (1, 6, 12, 18)
    elif model.output_stride == 8:
        atrous = (1, 12, 24, 36)
    else:
        raise NotImplementedError(f"output_stride {model.output_stride}")
    aspp = ASPP(
        out_channels=model.aspp_out_channels,
        atrous_channels=model.aspp_atrous_channels,
        atrous_kernel_size=model.aspp_atrous_kernel_size,
        atrous_dilation=atrous,
        dropout=model.aspp_dropout,
        dtype=model.dtype,
    )
    decoder = Decoder(
        out_channels=model.out_channels,
        low_level_out_channels=model.decoder_low_level_out_channels,
        refine_channels=model.decoder_refine_channels,
        refine_kernel_size=model.decoder_refine_kernel_size,
        dtype=model.dtype,
    )
    return aspp, decoder


def _sub_variables(variables, name):
    sub = {"params": variables["params"][name]}
    if "batch_stats" in variables and name in variables["batch_stats"]:
        sub["batch_stats"] = variables["batch_stats"][name]
    return sub


def backbone_module(model) -> ResNetBackbone:
    from .resnet import build_backbone

    return build_backbone(model.backbone, model.output_stride,
                          dtype=model.dtype)


def quantize_deeplab(model, variables, frames) -> Dict[str, Any]:
    """Calibrate on ``frames`` (NHWC f32, preprocessed like inference
    inputs) and quantize the backbone.  Returns the qpack."""
    bb = backbone_module(model)
    bvars = _sub_variables(variables, "backbone")
    absmax = calibrate_backbone(bb, bvars, frames,
                                dtype=model.dtype or jnp.float32)
    return quantize_backbone(bb, bvars, absmax)


def save_qpack(qpack: Dict[str, Any], path: str) -> None:
    """Serialize a qpack to .npz (keys flattened as ``site|field``)."""
    flat = {}
    for site, entry in qpack.items():
        for field, v in entry.items():
            flat[f"{site}|{field}"] = np.asarray(jax.device_get(v))
    np.savez_compressed(path, **flat)


def load_qpack(path: str) -> Dict[str, Any]:
    """Load a qpack written by :func:`save_qpack`."""
    qpack: Dict[str, Any] = {}
    with np.load(path) as z:
        for key in z.files:
            site, field = key.rsplit("|", 1)
            qpack.setdefault(site, {})[field] = jnp.asarray(z[key])
    return qpack


def quant_deeplab_apply(model, variables, qpack, x: Array,
                        upsample_pred: bool = False) -> Array:
    """Full DeepLabV3+ forward with the int8 backbone: logits like
    ``model.apply(variables, x, train=False, upsample_pred=...)``."""
    from ..ops.resize import resize_align_corners

    dtype = model.dtype or jnp.float32
    bb = backbone_module(model)
    feats = quant_backbone_apply(bb, _sub_variables(variables, "backbone"),
                                 qpack, x, dtype=dtype)
    aspp, decoder = _aspp_decoder_modules(model)
    feature = aspp.apply(_sub_variables(variables, "aspp"),
                         feats["feature"], False)
    logits = decoder.apply(_sub_variables(variables, "decoder"),
                           feature, feats["low_feature"], False)
    if upsample_pred:
        logits = resize_align_corners(
            logits.astype(jnp.float32), (x.shape[-3], x.shape[-2])
        )
    return logits
