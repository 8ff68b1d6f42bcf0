"""Mapillary Vistas dataset reader (ref data/dataset/mapillary.py:11-79)."""
from __future__ import annotations

import json
import os.path as osp
from typing import Dict

from PIL import Image

from .base import Dataset


class MapillaryVistas(Dataset):
    SUBDIR = {"train": "training", "test": "testing", "val": "validation"}

    def __init__(self, root_dir: str, type: str, transform=None):
        assert type in ("train", "test", "val")
        self.root_dir = osp.abspath(root_dir)
        self.transform = transform
        self.type = type

        with open(osp.join(self.root_dir, "config.json")) as f:
            self.labels = json.load(f)["labels"]

        self.image_dir = osp.join(self.root_dir, self.SUBDIR[type], "images")
        self.label_dir = osp.join(self.root_dir, self.SUBDIR[type], "labels")
        self.image_ids = sorted(self.get_filenames(self.image_dir))

    def __len__(self):
        return len(self.image_ids)

    def __getitem__(self, index: int) -> Dict:
        image_id = self.image_ids[index]
        sample = {
            "image": Image.open(osp.join(self.image_dir, f"{image_id}.jpg")),
            "label": Image.open(osp.join(self.label_dir, f"{image_id}.png")),
        }
        if self.transform is not None:
            sample = self.transform(sample)
        return sample
