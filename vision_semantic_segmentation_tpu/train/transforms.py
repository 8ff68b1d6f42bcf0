"""Joint image+label transforms for segmentation training.

Rebuild of `/root/reference/src/network/deeplab_v3_plus/data/transforms.py:16-424`
(itself derived from NVIDIA's public joint_transforms): every transform
maps a ``{"image", "label"}`` sample dict; images interpolate BILINEAR,
labels NEAREST, everywhere.  Host-side PIL/numpy — augmentation is data
pipeline work, not TPU work.  ``ToTensor`` emits NHWC float32 (the TPU
layout) instead of torch CHW; ``Normalize`` folds /255 + ImageNet stats.
Randomness flows through ``numpy.random`` seeded by utils.seed.
"""
from __future__ import annotations

import numbers
import random
import warnings
from typing import Dict, Tuple

import numpy as np
import PIL.Image
import PIL.ImageOps

Sample = Dict[str, object]


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, sample: Sample) -> Sample:
        for t in self.transforms:
            sample = t(sample)
        return sample

    def __repr__(self):
        inner = "\n".join(f"    {t}" for t in self.transforms)
        return f"{type(self).__name__}(\n{inner}\n)"


class ToTensor:
    """PIL pair -> numpy arrays: image (H, W, 3) float32, label (H, W) float32."""

    def __call__(self, sample: Sample) -> Sample:
        image = np.asarray(sample["image"], dtype=np.float32)
        label = np.asarray(sample["label"], dtype=np.float32)
        return {"image": image, "label": label}


class Normalize:
    """Scale to [0,1] then standardize with ImageNet stats (ref :56-78)."""

    def __init__(self, mean, std, inplace: bool = False):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, sample: Sample) -> Sample:
        image = np.asarray(sample["image"], dtype=np.float32)
        image = (image / 255.0 - self.mean) / self.std
        return {"image": image, "label": sample["label"]}


def _pair(size) -> Tuple[int, int]:
    return (int(size), int(size)) if isinstance(size, numbers.Number) else tuple(size)


class Resize:
    def __init__(self, size):
        self.size = _pair(size)

    def __call__(self, sample: Sample) -> Sample:
        image, label = sample["image"], sample["label"]
        assert image.size == label.size
        return {
            "image": image.resize(self.size, PIL.Image.BILINEAR),
            "label": label.resize(self.size, PIL.Image.NEAREST),
        }


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.prob = p

    def __call__(self, sample: Sample) -> Sample:
        if random.random() < self.prob:
            return {
                "image": sample["image"].transpose(PIL.Image.FLIP_LEFT_RIGHT),
                "label": sample["label"].transpose(PIL.Image.FLIP_LEFT_RIGHT),
            }
        return sample


class RandomRotate:
    def __init__(self, degrees):
        if isinstance(degrees, numbers.Number):
            if degrees < 0:
                raise ValueError("degrees must be positive")
            self.degrees = (-degrees, degrees)
        else:
            if len(degrees) != 2:
                raise ValueError("degrees must have length 2")
            self.degrees = tuple(degrees)

    def __call__(self, sample: Sample) -> Sample:
        angle = random.uniform(*self.degrees)
        return {
            "image": sample["image"].rotate(angle, PIL.Image.BILINEAR),
            "label": sample["label"].rotate(angle, PIL.Image.NEAREST),
        }


class RandomCrop:
    """Random crop; pads (or shrinks, with nopad) when the image is smaller.

    (ref :158-242 including the centroid-covering option)
    """

    def __init__(self, size, ignore_index: int = 0, nopad: bool = True):
        self.size = _pair(size)
        self.ignore_index = ignore_index
        self.nopad = nopad
        self.pad_color = (0, 0, 0)

    def __call__(self, sample: Sample, centroid=None) -> Sample:
        image, label = sample["image"], sample["label"]
        assert image.size == label.size
        w, h = image.size
        th, tw = self.size
        if w == tw and h == th:
            return sample

        if self.nopad:
            if th > h or tw > w:
                shorter = min(w, h)
                th, tw = shorter, shorter
        else:
            pad_h = (th - h) // 2 + 1 if th > h else 0
            pad_w = (tw - w) // 2 + 1 if tw > w else 0
            if pad_h or pad_w:
                border = (pad_w, pad_h, pad_w, pad_h)
                image = PIL.ImageOps.expand(image, border=border, fill=self.pad_color)
                label = PIL.ImageOps.expand(label, border=border, fill=self.ignore_index)
                w, h = image.size

        if centroid is not None:
            c_x, c_y = centroid
            x1 = min(w - tw, max(0, random.randint(c_x - tw, c_x)))
            y1 = min(h - th, max(0, random.randint(c_y - th, c_y)))
        else:
            x1 = 0 if w == tw else random.randint(0, w - tw)
            y1 = 0 if h == th else random.randint(0, h - th)
        return {
            "image": image.crop((x1, y1, x1 + tw, y1 + th)),
            "label": label.crop((x1, y1, x1 + tw, y1 + th)),
        }


class RandomSizeAndCrop:
    """Random scale then random crop (ref :245-298)."""

    def __init__(self, size, scale=(0.5, 2), ignore_index=0, crop_nopad=False, pre_size=None):
        self.size = _pair(size)
        if scale[0] > scale[1]:
            warnings.warn("scale range should be (min, max)")
        self.crop = RandomCrop(self.size, ignore_index=ignore_index, nopad=crop_nopad)
        self.scale = scale
        self.pre_size = pre_size

    def __call__(self, sample: Sample, centroid=None) -> Sample:
        image, label = sample["image"], sample["label"]
        assert image.size == label.size
        scale_amt = 1.0 if self.pre_size is None else self.pre_size / min(image.size)
        scale_amt *= random.uniform(*self.scale)
        w, h = [int(i * scale_amt) for i in image.size]
        if centroid is not None:
            centroid = [int(c * scale_amt) for c in centroid]
        sample = {
            "image": image.resize((w, h), PIL.Image.BILINEAR),
            "label": label.resize((w, h), PIL.Image.NEAREST),
        }
        return self.crop(sample, centroid)


class FixScaleCenterCrop:
    """Scale preserving aspect ratio so the crop fits, then center crop (ref :301-352)."""

    def __init__(self, size):
        self.size = _pair(size)

    def __call__(self, sample: Sample) -> Sample:
        image, label = sample["image"], sample["label"]
        width, height = image.size
        c_height, c_width = self.size
        ratio = max(c_width / width, c_height / height)
        s_width, s_height = int(width * ratio), int(height * ratio)
        image = image.resize((s_width, s_height), PIL.Image.BILINEAR)
        label = label.resize((s_width, s_height), PIL.Image.NEAREST)
        x1 = (s_width - c_width) // 2
        y1 = (s_height - c_height) // 2
        return {
            "image": image.crop((x1, y1, x1 + c_width, y1 + c_height)),
            "label": label.crop((x1, y1, x1 + c_width, y1 + c_height)),
        }


class CenterCropWithPad:
    """Center crop, padding when the image is smaller (ref :355-400)."""

    def __init__(self, size, ignore_index: int = 255):
        self.size = _pair(size)
        self.ignore_index = ignore_index

    def __call__(self, sample: Sample) -> Sample:
        image, label = sample["image"], sample["label"]
        assert image.size == label.size
        w, h = image.size
        tw, th = self.size
        pad_x = tw - w if w < tw else 0
        pad_y = th - h if h < th else 0
        if pad_x or pad_y:
            image = PIL.ImageOps.expand(image, border=(pad_x, pad_y, pad_x, pad_y), fill=0)
            label = PIL.ImageOps.expand(
                label, border=(pad_x, pad_y, pad_x, pad_y), fill=self.ignore_index
            )
            w, h = image.size
        x1 = int(round((w - tw) / 2.0))
        y1 = int(round((h - th) / 2.0))
        return {
            "image": image.crop((x1, y1, x1 + tw, y1 + th)),
            "label": label.crop((x1, y1, x1 + tw, y1 + th)),
        }


class MaxSizeCenterCrop:
    """Center crop only when larger than a max size (ref :403-424)."""

    def __init__(self, size, ignore_index: int = 255):
        self.size = _pair(size)
        self.center_crop = CenterCropWithPad(size, ignore_index)

    def __call__(self, sample: Sample) -> Sample:
        image = sample["image"]
        w, h = image.size
        tw, th = self.size
        if w > tw or h > th:
            return self.center_crop(sample)
        return sample
