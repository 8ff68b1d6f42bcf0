"""Segmentation video demo.

Rebuild of `/root/reference/src/network/deeplab_v3_plus/video_generator.py:85-241`:
run the network over a video file, blend the colorized prediction with the
frame, and write an ``.avi``.  The per-frame path reuses the jitted
predictor (preprocess+forward+argmax fused on device); only encode/decode
stay on host.
"""
from __future__ import annotations

import os.path as osp
import time
from typing import Optional, Tuple

import numpy as np

from ..inference.predictor import SemanticSegmentation, colorize_labels, postprocess_labels
from ..ops.colormap import MAPILLARY_19_PALETTE


def generate_video(
    cfg,
    video_path: str,
    output_dir: str,
    output_name: str = "",
    predictor: Optional[SemanticSegmentation] = None,
    palette: Optional[np.ndarray] = None,
    blend: float = 0.5,
    resize_hw: Optional[Tuple[int, int]] = None,
    max_frames: Optional[int] = None,
) -> str:
    """Segment a video and write the blended overlay (ref :85-192).

    Args:
        cfg: network demo config (used when ``predictor`` is None).
        blend: overlay opacity of the colorized prediction.
        resize_hw: optional (h, w) processing resolution.

    Returns the output video path.
    """
    import cv2

    if predictor is None:
        predictor = SemanticSegmentation(cfg)
    if palette is None:
        # select by TRAIN_DATASET / DATASET_CONFIG like the reference's
        # demo (ref video_generator.py:24-27, 96-101)
        from ..train.datasets.visualization import palette_from_cfg

        palette = palette_from_cfg(cfg)

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"Cannot open video {video_path!r}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 10.0

    name = output_name or osp.splitext(osp.basename(video_path))[0]
    out_path = osp.join(output_dir, f"{name}.avi")

    writer = None
    frame_count = 0
    model_time = 0.0
    while True:
        ok, frame_bgr = cap.read()
        if not ok:
            break
        if resize_hw is not None:
            frame_bgr = cv2.resize(frame_bgr, (resize_hw[1], resize_hw[0]))
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)

        tic = time.perf_counter()
        labels = predictor.segmentation(rgb, upsample_pred=False)
        labels = np.asarray(postprocess_labels(labels, rgb.shape[:2]))
        model_time += time.perf_counter() - tic

        colored = np.asarray(colorize_labels(labels, palette))
        overlay = (frame_bgr * (1 - blend) + colored[..., ::-1] * blend).astype(np.uint8)

        if writer is None:
            h, w = overlay.shape[:2]
            writer = cv2.VideoWriter(
                out_path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h)
            )
        writer.write(overlay)
        frame_count += 1
        if max_frames is not None and frame_count >= max_frames:
            break

    cap.release()
    if writer is not None:
        writer.release()
    if frame_count:
        print(
            f"Wrote {frame_count} frames to {out_path} "
            f"({frame_count / max(model_time, 1e-9):.1f} model FPS)"
        )
    return out_path
