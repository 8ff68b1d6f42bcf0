"""On-device batched training augmentation (TPU-native input pipeline).

The reference augments per-sample on the host with PIL inside DataLoader
workers (ref data/transforms.py: RandomSizeAndCrop -> RandomHorizontalFlip
-> ToTensor -> Normalize, composed by ref data/build.py:10-40).  On a TPU
host that costs CPU time on the training critical path and uploads
normalized float32 batches.  This module moves the whole chain into the
jitted train step:

  * the host supplies RAW fixed-shape uint8 batches (4x fewer bytes
    host->device than normalized f32);
  * random scale -> pad -> crop -> horizontal flip -> normalize runs as
    one vmapped affine gather per sample (static shapes, dynamic scale /
    crop-origin VALUES — jit-safe);
  * randomness comes from the step's threaded PRNG key, so augmentation
    is reproducible and sharding-invariant (per-sample keys are split
    from one key; under SPMD the batch axis is global).

Semantics mirror ``RandomSizeAndCrop(size, scale, ignore_index,
crop_nopad=False)`` + ``RandomHorizontalFlip(p)`` + ``ToTensor`` +
``Normalize(imagenet)`` exactly at the coordinate level (truncated
scaled size ``int(side * s)``, pad ``(target - side)//2 + 1`` when the
scaled image is smaller, inclusive crop-origin range, image padding
black / label padding ignore_index — ref transforms.py:110-179).  One
documented interpolation deviation: PIL antialiases bilinear DOWNSCALES
(triangle filter with radius = 1/scale); this path uses classic 4-tap
bilinear at every scale (the standard accelerator formulation — for an
augmentation distribution the difference is sub-quantization noise).
Label resampling is PIL-NEAREST-exact — ``floor((i + 0.5) * src/dst)`` —
except when a sample center lands exactly on a pixel boundary (possible
iff ``dst/gcd(src, dst)`` is odd), where 8-bit PIL takes the lower
neighbor; a one-pixel tie-break on a measure-zero set of scales.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..inference.predictor import IMAGENET_MEAN, IMAGENET_STD

Array = jnp.ndarray


def sample_augment_params(
    key: Array,
    image_hw: Tuple[int, int],
    size: Tuple[int, int],
    scale: Tuple[float, float] = (0.5, 2.0),
    flip_p: float = 0.5,
    pre_size: Optional[int] = None,
) -> Dict[str, Array]:
    """Draw one sample's augmentation parameters (all scalar jnp values).

    Mirrors the host chain's RNG decisions: scale amount (uniform,
    ref transforms.py:170-172), crop origin (inclusive randint over the
    padded extent, ref :148-149), flip (bernoulli).
    """
    h0, w0 = image_hw
    th, tw = size
    kscale, ky, kx, kflip = jax.random.split(key, 4)

    base = 1.0 if not pre_size else float(pre_size) / float(min(h0, w0))
    s = base * jax.random.uniform(
        kscale, (), minval=float(scale[0]), maxval=float(scale[1])
    )
    # PIL: (w, h) = int(side * scale_amt) — truncation, floor >= 1
    h = jnp.maximum(jnp.floor(h0 * s), 1.0).astype(jnp.int32)
    w = jnp.maximum(jnp.floor(w0 * s), 1.0).astype(jnp.int32)
    # pad mode (crop_nopad=False): (target - side)//2 + 1 each border when
    # the scaled image is smaller than the crop (ref transforms.py:135-141)
    pad_h = jnp.where(th > h, (th - h) // 2 + 1, 0)
    pad_w = jnp.where(tw > w, (tw - w) // 2 + 1, 0)
    h2 = h + 2 * pad_h
    w2 = w + 2 * pad_w
    # python random.randint is INCLUSIVE of both ends -> maxval = range + 1
    y1 = jax.random.randint(ky, (), 0, h2 - th + 1)
    x1 = jax.random.randint(kx, (), 0, w2 - tw + 1)
    flip = jax.random.bernoulli(kflip, float(flip_p))
    return {
        "h": h, "w": w, "pad_h": pad_h, "pad_w": pad_w,
        "y1": y1, "x1": x1, "flip": flip,
    }


def apply_augment(
    image_u8: Array,
    label: Array,
    params: Dict[str, Array],
    size: Tuple[int, int],
    ignore_index: int = 255,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> Tuple[Array, Array]:
    """Apply one sample's scale/pad/crop/flip/normalize as a fused gather.

    Args:
        image_u8: (H0, W0, 3) uint8.
        label: (H0, W0) integer class ids.
        params: from :func:`sample_augment_params` (scalars may be traced).
    Returns:
        (size[0], size[1], 3) float32 normalized image,
        (size[0], size[1]) int32 label (padding = ignore_index).
    """
    h0, w0 = image_u8.shape[0], image_u8.shape[1]
    th, tw = size
    h, w = params["h"], params["w"]
    ty, tx = jnp.mgrid[0:th, 0:tw]
    # flip mirrors the final crop's columns (== RandomHorizontalFlip after
    # the crop, ref transforms.py:78-88)
    tx = jnp.where(params["flip"], tw - 1 - tx, tx)
    # target pixel -> scaled-image coords (may land in the padding)
    xs = tx + params["x1"] - params["pad_w"]
    ys = ty + params["y1"] - params["pad_h"]
    inside = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)

    # scaled-image pixel -> source coords, PIL center convention
    sx = w0 / w.astype(jnp.float32)
    sy = h0 / h.astype(jnp.float32)
    fx = (xs.astype(jnp.float32) + 0.5) * sx - 0.5
    fy = (ys.astype(jnp.float32) + 0.5) * sy - 0.5

    # image: classic 4-tap bilinear, edge-clamped
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w0 - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w0 - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h0 - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h0 - 1)
    img = image_u8.astype(jnp.float32)
    top = img[y0i, x0i] * (1.0 - wx) + img[y0i, x1i] * wx
    bot = img[y1i, x0i] * (1.0 - wx) + img[y1i, x1i] * wx
    bilin = top * (1.0 - wy) + bot * wy
    # pad is black BEFORE normalization (ref RandomCrop.pad_color=(0,0,0)),
    # i.e. 0 in [0,1] space, then ImageNet-normalized like any pixel
    img01 = jnp.where(inside[..., None], bilin / 255.0, 0.0)
    mean_np = np.asarray(mean, np.float32)
    std_np = np.asarray(std, np.float32)
    out_img = (img01 - mean_np) / std_np

    # label: PIL-NEAREST resize (floor((i + 0.5) * src/dst)), pad = ignore
    lx = jnp.clip(jnp.floor((xs.astype(jnp.float32) + 0.5) * sx), 0, w0 - 1)
    ly = jnp.clip(jnp.floor((ys.astype(jnp.float32) + 0.5) * sy), 0, h0 - 1)
    lab = label[ly.astype(jnp.int32), lx.astype(jnp.int32)].astype(jnp.int32)
    out_lab = jnp.where(inside, lab, ignore_index)
    return out_img, out_lab


def make_device_augment(
    size,
    scale: Tuple[float, float] = (0.5, 2.0),
    flip_p: float = 0.5,
    ignore_index: int = 255,
    pre_size: Optional[int] = None,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> Callable[[Array, Dict[str, Array]], Dict[str, Array]]:
    """Build ``augment(rng, batch) -> batch`` for ``make_train_step``.

    Input batch: ``image`` (B, H0, W0, 3) uint8, ``label`` (B, H0, W0)
    integer.  Output: ``image`` (B, th, tw, 3) float32 normalized,
    ``label`` (B, th, tw) int32.  Any extra batch keys pass through.
    """
    if isinstance(size, int):
        size = (size, size)
    size = (int(size[0]), int(size[1]))

    def augment(rng: Array, batch: Dict[str, Array]) -> Dict[str, Array]:
        image, label = batch["image"], batch["label"]
        if image.dtype != jnp.uint8:
            raise TypeError(
                "device augment expects RAW uint8 image batches (host "
                "transform should only Resize) — got "
                f"{image.dtype}; disable TRAIN.DEVICE_AUGMENT.ENABLED or "
                "drop ToTensor/Normalize from TRAIN.AUGMENTATION"
            )
        hw = (image.shape[1], image.shape[2])
        keys = jax.random.split(rng, image.shape[0])

        def one(key, img, lab):
            params = sample_augment_params(
                key, hw, size, scale=scale, flip_p=flip_p, pre_size=pre_size
            )
            return apply_augment(
                img, lab, params, size,
                ignore_index=ignore_index, mean=mean, std=std,
            )

        out_img, out_lab = jax.vmap(one)(keys, image, label)
        out = dict(batch)
        out["image"] = out_img
        out["label"] = out_lab
        return out

    return augment


def device_augment_from_cfg(cfg) -> Optional[Callable]:
    """TRAIN.DEVICE_AUGMENT config node -> augment fn (None when disabled)."""
    node = getattr(cfg.TRAIN, "DEVICE_AUGMENT", None)
    if node is None or not node.ENABLED:
        return None
    return make_device_augment(
        size=node.SIZE,
        scale=tuple(node.SCALE),
        flip_p=node.FLIP_P,
        ignore_index=node.IGNORE_INDEX,
        pre_size=node.PRE_SIZE or None,
    )
