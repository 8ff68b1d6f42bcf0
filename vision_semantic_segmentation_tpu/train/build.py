"""Dataloader + transform builders (ref data/build.py:10-104)."""
from __future__ import annotations


import jax

from . import transforms as T
from .datasets import BDDSegmentation, DataLoader, MapillaryVistas, VOCSegmentation


def build_transform(augmentation):
    """Tuple-of-(name | (name, *args)) -> Compose (ref data/build.py:10-40)."""
    transform_list = []
    for method in augmentation:
        if isinstance(method, (tuple, list)):
            name, args = method[0], list(method[1:])
        else:
            name, args = method, None
        if not hasattr(T, name):
            raise NotImplementedError(f"Unknown transform {name!r}")
        cls = getattr(T, name)
        transform_list.append(cls(*args) if args else cls())
    return T.Compose(transform_list)


def build_dataloader(cfg, mode: str = "train", distributed: bool = False) -> DataLoader:
    """Mode-driven dataset + loader construction (ref data/build.py:43-104).

    ``distributed=True`` shards the dataset across JAX processes (the
    DistributedSampler equivalent); batch_size is then per host, same
    caveat as the reference (ref :90-91).
    """
    if mode == "train":
        batch_size = cfg.TRAIN.BATCH_SIZE
        augmentation = cfg.TRAIN.AUGMENTATION
    elif mode == "val":
        batch_size = cfg.VALIDATE.BATCH_SIZE
        augmentation = cfg.VALIDATE.AUGMENTATION
    elif mode == "test":
        batch_size = cfg.TEST.BATCH_SIZE
        augmentation = cfg.TEST.AUGMENTATION
    else:
        raise NotImplementedError(f"Unknown mode {mode!r}")

    transform = build_transform(augmentation)

    name = cfg.DATASET.NAME
    if name == "Pascal":
        dataset = VOCSegmentation(cfg.DATASET.ROOT_DIR, type=mode, transform=transform)
    elif name == "BDD":
        dataset = BDDSegmentation(
            cfg.DATASET.ROOT_DIR, type=mode, transform=transform, ignore_index=255
        )
    elif name == "Mapillary":
        dataset = MapillaryVistas(cfg.DATASET.ROOT_DIR, type=mode, transform=transform)
    else:
        raise NotImplementedError(f"Unsupported dataset: {name}")

    is_train = mode == "train"
    num_shards = jax.process_count() if distributed else 1
    shard_index = jax.process_index() if distributed else 0

    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=is_train,
        drop_last=is_train and cfg.DATALOADER.DROP_LAST,
        num_workers=cfg.DATALOADER.NUM_WORKERS,
        num_shards=num_shards,
        shard_index=shard_index,
    )
