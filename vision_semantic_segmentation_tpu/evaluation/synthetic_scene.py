"""Synthetic benchmark scene: exact-ground-truth golden bag generator.

The reference's integration test drives a RECORDED bag through both nodes
and scores ``global_map.png`` IoU against hand-annotated BEV ground truth
(ref README.md:190-196, test/test_semantic_mapping.py:117-161).  That
recording and its annotations are external artifacts; this module is the
framework's self-contained counterpart — a synthetic urban scene
(road / crosswalk / lane regions) with *exact* geometric ground truth:

1. ground truth written in the evaluator's ``bev-5cm-*.jpg`` contract
   (:func:`write_ground_truth`);
2. camera frames ray-cast through the real camera-1 calibration and
   vehicle extrinsics, plus a cell-center point map (:func:`render_frame`,
   :func:`make_point_map`) — a fully synthetic bag;
3. a real DeepLabV3+ trained in-process to segment the scene's input
   colors (:func:`train_segmenter`), at any backbone / output stride /
   input resolution — so quality can be scored per SERVING OPERATING
   POINT (runtime/serving_pareto.py), not just at one fixture config.

Used by tests/test_e2e_golden.py (the e2e quality gate) and by
``autotune --serving`` (the fps x golden-mIoU Pareto sweep).

All region edges are multiples of 0.4 m from the boundary minimum so they
align with both the 0.2 m grid cells and the 8-px JPEG blocks of the 5 cm
ground-truth images (exact ground truth survives JPEG + 4x downsample).
"""
from __future__ import annotations

import os.path as osp
from typing import Optional, Sequence, Tuple

import numpy as np

# --------------------------------------------------------------------------
# Scene definition (map coords = world + PCD_ORIGIN_OFFSET, meters)
# --------------------------------------------------------------------------
RES = 0.2
BOUNDARY = [[100.0, 140.0], [800.0, 840.0]]
GRID_HW = (200, 200)

# scene class ids: 0 background, 1 road, 2 crosswalk, 3 lane, 4 sky
BG, ROAD, CROSS, LANE, SKY = 0, 1, 2, 3, 4
# distinct *input* colors the network learns to segment
INPUT_COLORS = np.array(
    [[60, 60, 60], [105, 105, 105], [200, 60, 60], [240, 240, 80], [70, 130, 180]],
    dtype=np.uint8,
)
# network class ids (mapillary-19) per scene class: cfg.LABELS=[2,1,8,10,3]
# maps network ids road=2, crosswalk=1, lane=8; background/sky to ids the
# mapping ignores (ref base_cfg.py:47-57)
NET_IDS = np.array([5, 2, 1, 8, 0], dtype=np.int32)

# full camera-1 calibration resolution (geometry/camera.py::camera_setup_1)
FULL_HW = (1440, 1920)


def scene_class(mx, my):
    """Evaluate the scene at map coords (vectorized)."""
    cls = np.full(np.shape(mx), BG, dtype=np.int32)
    road = (mx >= 104.0) & (mx < 136.0) & (my >= 804.0) & (my < 836.0)
    cls[road] = ROAD
    lane = road & (
        ((my >= 812.4) & (my < 813.2)) | ((my >= 826.8) & (my < 827.6))
    )
    cls[lane] = LANE
    cross = (mx >= 112.0) & (mx < 117.6) & (my >= 808.0) & (my < 832.0)
    cls[cross] = CROSS
    return cls


def write_ground_truth(gt_dir: str):
    """Emit the evaluator's bev-5cm-{road,crosswalks,lanes,mask}.jpg layers.

    5 cm/px over the 40 m x 40 m scene -> 800x800; rows index x like the
    generated maps (ref test_semantic_mapping.py:45-69).
    """
    import cv2

    n = 800
    r = (np.arange(n) + 0.5) * 0.05
    mx = BOUNDARY[0][0] + r[:, None] * np.ones((1, n))
    my = BOUNDARY[1][0] + np.ones((n, 1)) * r[None, :]
    cls = scene_class(mx, my)
    quality = [cv2.IMWRITE_JPEG_QUALITY, 100]
    for name, cid in [("road", ROAD), ("crosswalks", CROSS), ("lanes", LANE)]:
        layer = np.where(cls == cid, 255, 0).astype(np.uint8)
        img = np.repeat(layer[:, :, None], 3, axis=2)
        cv2.imwrite(osp.join(gt_dir, f"bev-5cm-{name}.jpg"), img, quality)
    mask = np.full((n, n, 3), 255, np.uint8)
    cv2.imwrite(osp.join(gt_dir, "bev-5cm-mask.jpg"), mask, quality)
    return cls


def pose(mx, my, yaw):
    """Map-coord vehicle pose -> world-frame (position, quaternion xyzw)."""
    from ..mapping import PCD_ORIGIN_OFFSET

    position = np.array(
        [mx - PCD_ORIGIN_OFFSET[0], my - PCD_ORIGIN_OFFSET[1], 0.0]
    )
    quaternion = np.array([0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)])
    return position, quaternion


def render_frame(position, quaternion, scale=2, cam=None, palette=None):
    """Ray-cast the scene through a camera at a vehicle pose.

    Returns (image_rgb_full, net_labels_full) at the calibration's full
    1920x1440 resolution (rendered at 1/scale and pixel-replicated; the
    <= scale px edge error is ~2 cm on the ground at these depths).

    ``cam`` defaults to camera 1; ``palette`` overrides the per-scene-class
    RGB colors (default INPUT_COLORS — the colors the network learns;
    pass mapping label colors to synthesize perfect semantic images).
    """
    import jax.numpy as jnp

    from ..geometry.camera import camera_setup_1
    from ..geometry.transforms import pose_to_matrix
    from ..mapping import PCD_ORIGIN_OFFSET
    from ..mapping.engine import velodyne_to_baselink

    cam = cam or camera_setup_1()
    colors = INPUT_COLORS if palette is None else np.asarray(palette, np.uint8)
    w, h = cam.im_size
    rw, rh = w // scale, h // scale
    xs = (np.arange(rw) + 0.5) * scale - 0.5
    ys = (np.arange(rh) + 0.5) * scale - 0.5
    px, py = np.meshgrid(xs, ys)
    pix = np.stack([px.ravel(), py.ravel(), np.ones(px.size)])

    d_velo = cam.R.T @ (np.linalg.inv(cam.K) @ pix)   # rays, velodyne frame
    c_velo = (-cam.R.T @ cam.t).ravel()
    T = np.asarray(
        pose_to_matrix(jnp.asarray(position), jnp.asarray(quaternion)),
        dtype=np.float64,
    ) @ velodyne_to_baselink()
    d_w = T[:3, :3] @ d_velo
    c_w = T[:3, :3] @ c_velo + T[:3, 3]

    denom = np.where(d_w[2] == 0, -1e-12, d_w[2])
    s = -c_w[2] / denom
    ground = (d_w[2] < 0) & (s > 0)
    mx = c_w[0] + s * d_w[0] + PCD_ORIGIN_OFFSET[0]
    my = c_w[1] + s * d_w[1] + PCD_ORIGIN_OFFSET[1]
    cls = scene_class(mx, my)
    cls[~ground] = SKY

    img = colors[cls].reshape(rh, rw, 3)
    labels = NET_IDS[cls].reshape(rh, rw)
    img = np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)
    labels = np.repeat(np.repeat(labels, scale, axis=0), scale, axis=1)
    return img, labels


def make_poses():
    """9 viewpoints (3x3 lattice, 10 m spacing) x 10 yaw steps.

    Camera 1's ground footprint per frame is a ~46 deg wedge centered
    ~13 deg left of the body axis, blind inside ~5.8 m (measured through
    the real calibration).  The lattice keeps every cell within ~7.1 m of
    some viewpoint, so RANGE_MAX can drop to 12 m: far-range radial
    label quantization (0.4-0.9 m/px at 16 m) was the lane-IoU ceiling —
    9 viewpoints + 12 m range + 144x192 training lifts lane IoU from
    0.31 to 0.89 (measured sweep, ROUND_NOTES r03)."""
    poses = []
    viewpoints = [
        (110, 810), (110, 830), (130, 810), (130, 830), (120, 820),
        (120, 810), (120, 830), (110, 820), (130, 820),
    ]
    for cmx, cmy in viewpoints:
        for k in range(10):
            poses.append(pose(cmx, cmy, yaw=k * np.pi / 5))
    return poses


def make_point_map():
    """Static 'reduced_map' point cloud: one point per grid cell center,
    z=0, intensity 8 (inside [2,14] so the lane boost never fires)."""
    from ..mapping import PCD_ORIGIN_OFFSET

    i, j = np.meshgrid(np.arange(GRID_HW[0]), np.arange(GRID_HW[1]), indexing="ij")
    mx = BOUNDARY[0][0] + (i.ravel() + 0.5) * RES
    my = BOUNDARY[1][0] + (j.ravel() + 0.5) * RES
    return np.stack(
        [
            mx - PCD_ORIGIN_OFFSET[0],
            my - PCD_ORIGIN_OFFSET[1],
            np.zeros(mx.size),
            np.full(mx.size, 8.0),
        ]
    ).astype(np.float32)


# --------------------------------------------------------------------------
# Per-operating-point helpers
# --------------------------------------------------------------------------

def scaled_hw(image_scale: float) -> Tuple[int, int]:
    """Network input size at an IMAGE_SCALE (the pipeline's resize_area
    target, runtime/pipeline.py::_build_segmentation)."""
    if image_scale >= 1.0:
        return FULL_HW
    return int(FULL_HW[0] * image_scale), int(FULL_HW[1] * image_scale)


def subsample_labels(labels_full: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-pixel-center subsample of a full-res label map (labels must
    never be interpolated).  Matches area-resize pixel centers: index
    floor((i + 0.5) * full / out - 0.5)."""
    oh, ow = out_hw
    fh, fw = labels_full.shape[:2]
    yi = np.clip(np.floor((np.arange(oh) + 0.5) * fh / oh - 0.5), 0, fh - 1).astype(int)
    xi = np.clip(np.floor((np.arange(ow) + 0.5) * fw / ow - 0.5), 0, fw - 1).astype(int)
    return labels_full[np.ix_(yi, xi)]


def scene_network_cfg(
    weight_path: str = "",
    backbone: str = "resnet18",
    output_stride: int = 16,
    compute_dtype: str = "float32",
):
    """App config with the scene's network overrides (ref base_cfg.py:91)."""
    from ..config import get_cfg_defaults

    cfg = get_cfg_defaults()
    net = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    net.MODEL.BACKBONE = backbone
    net.MODEL.OUTPUT_STRIDE = int(output_stride)
    net.MODEL.COMPUTE_DTYPE = compute_dtype
    net.MODEL.WEIGHT = weight_path
    return cfg


def apply_scene_mapping_cfg(cfg, image_scale: float = 0.1,
                            upsample_pred: bool = True):
    """Set the scene's mapping geometry + serving knobs on an app config."""
    cfg.MAPPING.RESOLUTION = RES
    cfg.MAPPING.BOUNDARY = BOUNDARY
    cfg.MAPPING.POINT_BUCKET = 2 ** 16
    # every cell is within ~7.1 m of some lattice viewpoint; capping the
    # range keeps far, heavily-quantized observations out of the evidence
    cfg.MAPPING.PCD.RANGE_MAX = 12.0
    cfg.VISION_SEM_SEG.IMAGE_SCALE = float(image_scale)
    cfg.VISION_SEM_SEG.UNDISTORT = False  # frames are rendered pinhole
    cfg.VISION_SEM_SEG.UPSAMPLE_PRED = bool(upsample_pred)
    return cfg


def _mapped_crops(
    images: np.ndarray,
    targets: np.ndarray,
    crop_hw: Tuple[int, int],
    per_frame: int,
    mapped_classes: Tuple[int, ...],
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray]:
    """Class-BALANCED random crops alternating with uniform-random ones.

    At serving scales >~0.27 a full frame exceeds the training memory
    envelope (b8 @ 513^2 f32 already OOMs the 16 GB HBM —
    scripts/probe_train_step.py); crops keep the ground sampling
    distance, so the train/serve scale-match discipline (fixture
    finding, r02) still holds.  Two measured failure modes shape the
    sampling policy (both r04, scale 1.0):

    * Centered crops CYCLE through the mapped classes present in each
      frame instead of centering on a random mapped-union pixel: the
      union is ~95% road, so thin classes can land in ~one crop of the
      whole set — the net then memorizes that single crop (0.997 recall
      on the EXACT train crops, measured) with zero generalization
      pressure (held-out lane recall 0.008, map IoU 0).
    * Every other crop is uniform-random: with ONLY class-centered
      crops the background is so under-represented that the net
      over-predicts the mapped classes outside them (precision 0.00 /
      2.47M false-positive crosswalk pixels on held-out views)."""
    ch, cw = crop_hw
    imgs, labs = [], []
    for img, lab in zip(images, targets):
        h, w = lab.shape
        present = [c for c in mapped_classes if (lab == c).any()]
        locs = {c: np.nonzero(lab == c) for c in present}
        ci = 0
        for j in range(per_frame):
            if present and j % 2 == 0:
                ys, xs = locs[present[ci % len(present)]]
                ci += 1
                k = int(rng.integers(ys.size))
                cy, cx = int(ys[k]), int(xs[k])
            else:
                cy = int(rng.integers(h)) if h > ch else h // 2
                cx = int(rng.integers(w)) if w > cw else w // 2
            y0 = int(np.clip(cy - ch // 2, 0, h - ch))
            x0 = int(np.clip(cx - cw // 2, 0, w - cw))
            imgs.append(img[y0 : y0 + ch, x0 : x0 + cw])
            labs.append(lab[y0 : y0 + ch, x0 : x0 + cw])
    return np.stack(imgs), np.stack(labs)


def train_segmenter(
    frames: Sequence[np.ndarray],
    labels: Sequence[np.ndarray],
    weight_path: str,
    backbone: str = "resnet18",
    output_stride: int = 16,
    max_steps: int = 150,
    min_steps: int = 100,
    lr: float = 3e-3,
    mapped_classes: Tuple[int, ...] = (2, 1, 8),
    target_recall: float = 0.93,
    quality_floor: Optional[Tuple[float, float]] = (0.97, 0.85),
    batch_size: Optional[int] = None,
    val_frames: Optional[Sequence[np.ndarray]] = None,
    val_labels: Optional[Sequence[np.ndarray]] = None,
    val_target: Optional[float] = None,
    log=None,
) -> float:
    """Overfit DeepLabV3+ to the scene colors; save .npz weights.

    Uses the package's real model builder and fused train step — the same
    code path as the Trainer, minus the data pipeline.  ``frames`` are
    float RGB images AT THE SERVING RESOLUTION (CNNs are not
    scale-invariant: a train/infer resolution or resampling mismatch
    measurably collapses the thin-lane class — fixture finding, r02), and
    ``labels`` their nearest-subsampled network-class maps.

    Stops on PER-CLASS recall of the mapped classes — overall accuracy
    alone lets the tiny lane class (~1% of pixels) stay unlearned — with
    a ``min_steps`` floor: held-out recall keeps improving well after the
    train-batch gate clears (road 0.73 -> 0.94 between steps 50 and 100,
    measured), and map completeness tracks held-out road recall.
    ``quality_floor=(acc, min_recall)`` raises if the net failed to
    overfit; pass None to skip (callers that score quality downstream).

    ``val_frames``/``val_labels`` (held-out VIEWS of the scene) arm a
    generalization gate: once the train-batch gate clears, training
    continues until running-stats eval recall AND precision on the
    held-out crops reach ``val_target`` (default: ``target_recall``; or
    until ``max_steps``).  Train-batch metrics alone can lie — at scale
    1.0 a net reached 0.997 on its exact train crops while held-out
    lane recall was 0.008 (r04).  A laxer 0.85 gate measurably
    under-trains the small-scale points (scale-0.5 map lane IoU 0.80 vs
    0.97 — fewer observations per cell leave less Bayesian-fusion
    correction, so the gate must match the train target).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..inference.predictor import IMAGENET_MEAN, IMAGENET_STD
    from ..models.build import build_model
    from ..models.convert import save_npz
    from ..parallel.train_step import TrainState, make_train_step

    if val_target is None:
        val_target = target_recall
    cfg = scene_network_cfg(backbone=backbone, output_stride=output_stride)
    model, _, _, _ = build_model(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK, dtype=jnp.float32)

    # the predictor normalizes uint8/255 by ImageNet stats; train on the
    # identical preprocessing so the checkpoint transfers
    images = (np.stack(frames).astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    targets = np.stack(labels).astype(np.int32)
    h, w = targets.shape[1:3]
    crop_hw = (min(h, 513), min(w, 513))
    val_images = val_targets = None
    if val_frames is not None:
        val_images = (
            np.stack(val_frames).astype(np.float32) / 255.0 - IMAGENET_MEAN
        ) / IMAGENET_STD
        val_targets = np.stack(val_labels).astype(np.int32)
    if crop_hw != (h, w):
        # large serving scales: train on class-balanced 513^2 crops at
        # the SAME ground sampling distance (see _mapped_crops); at
        # least one centered crop per mapped class per frame
        per_frame = max(2 * len(mapped_classes), -(-16 // images.shape[0]))
        images, targets = _mapped_crops(
            images, targets, crop_hw, per_frame, mapped_classes,
            np.random.default_rng(11),
        )
        if val_images is not None:
            val_images, val_targets = _mapped_crops(
                val_images, val_targets, crop_hw, per_frame,
                mapped_classes, np.random.default_rng(101),
            )
        if batch_size is None:
            batch_size = 4  # b8 @ 513^2 f32 OOMs 16 GB HBM (probe_train_step)
    n = images.shape[0]
    b = n if batch_size is None else min(int(batch_size), n)
    # host slices upload per step; at large serving scales a full-res
    # all-frames batch would not fit device memory, so b bounds it
    batches = [
        {
            "image": images[i : i + b] if i + b <= n
            else np.concatenate([images[i:], images[: i + b - n]]),
            "label": targets[i : i + b] if i + b <= n
            else np.concatenate([targets[i:], targets[: i + b - n]]),
        }
        for i in range(0, n, b)
    ]

    # AOT (lower+compile) both programs: un-jitted init runs eagerly at
    # ~0.4 s/op through a device tunnel, and the jit DISPATCH path's
    # compile machinery costs minutes where AOT takes tens of seconds for
    # the same program (ROUND_NOTES r03)
    init = jax.jit(lambda k, x: model.init(k, x, train=False))
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, *images.shape[1:]), jnp.float32)
    variables = init.lower(key, x0).compile()(key, jnp.asarray(images[:1]))
    tx = optax.adam(lr)
    state = TrainState.create(model, variables, tx, jax.random.PRNGKey(1))
    step_fn = make_train_step(num_classes=19)
    step = jax.jit(step_fn).lower(state, batches[0]).compile()

    eval_step = None
    if val_images is not None:
        eval_step = jax.jit(
            lambda p, s, x: jnp.argmax(
                model.apply(
                    {"params": p, "batch_stats": s}, x, train=False
                ),
                -1,
            )
        ).lower(
            state.params, state.batch_stats, jnp.asarray(val_images[:b])
        ).compile()

    def _val_gate():
        """Running-stats recall AND precision on the held-out crops.

        Classes absent from the val crops are skipped for recall, but a
        false-positive flood of an absent class still holds the gate
        (precision counts whenever the class is predicted)."""
        nv = val_images.shape[0]
        preds = []
        for i in range(0, nv, b):
            xs = val_images[i : i + b]
            pad = b - xs.shape[0]
            if pad:
                xs = np.concatenate([xs, val_images[:pad]])
            out = np.asarray(
                eval_step(state.params, state.batch_stats, jnp.asarray(xs))
            )
            preds.append(out[: b - pad] if pad else out)
        pred = np.concatenate(preds)
        ok, stats = True, {}
        for c in mapped_classes:
            tp = int(((pred == c) & (val_targets == c)).sum())
            support = int((val_targets == c).sum())
            predicted = int((pred == c).sum())
            r = tp / support if support else float("nan")
            p = tp / predicted if predicted else float("nan")
            stats[c] = (round(r, 4), round(p, 4))
            if support and (r < val_target or not (p >= val_target)):
                ok = False
            # absent class: only a MATERIAL false-positive flood (>0.2%
            # of val pixels) holds the gate — a few stray pixels of a
            # class the val views don't see must not pin it open
            if (
                not support
                and predicted > 0.002 * val_targets.size
                and p < val_target
            ):
                ok = False
        return ok, stats

    acc, recalls, precisions = 0.0, {}, {}
    val_ok, next_val = eval_step is None, 0
    for it in range(max_steps):
        state, metrics = step(state, batches[it % len(batches)])
        conf = np.asarray(metrics["confusion"])
        acc = float(np.trace(conf) / max(conf.sum(), 1.0))
        # a class ABSENT from this batch (balanced crops don't guarantee
        # every class every batch) must not read as recall 0.0 — that
        # spuriously failed the overfit floor on a final batch without
        # crosswalk pixels (r05 sweep finding); carry the last batch
        # that actually contained the class
        for c in mapped_classes:
            support = float(conf[c].sum())
            if support > 0:
                recalls[c] = float(conf[c, c] / support)
        # gate on precision too: a recall-only stop passes a net that
        # over-predicts the mapped classes outside their true extent,
        # which collapses map IoU via false positives (r04 finding)
        for c in mapped_classes:
            predicted = float(conf[:, c].sum())
            if predicted > 0:
                precisions[c] = float(conf[c, c] / predicted)
        if log and (it + 1) % 50 == 0:
            log(
                f"  train step {it + 1}: acc={acc:.3f} recalls={recalls} "
                f"precisions={precisions}"
            )
        train_gate = (
            len(recalls) == len(mapped_classes)
            and len(precisions) == len(mapped_classes)
            and min(recalls.values()) >= target_recall
            and min(precisions.values()) >= target_recall
            and it >= min_steps - 1
        )
        if train_gate and not val_ok and it >= next_val:
            val_ok, vstats = _val_gate()
            next_val = it + 25  # bound the eval cost while converging
            if log:
                log(
                    f"  val step {it + 1}: ok={val_ok} "
                    f"(recall, precision)={vstats}"
                )
        if train_gate and val_ok:
            break
    if eval_step is not None and not val_ok and log:
        log(
            f"  WARNING: held-out gate never reached {val_target} within "
            f"{max_steps} steps; saving anyway (score will reflect it)"
        )
    if quality_floor is not None:
        # Re-measure at the FINAL params over one full batch cycle: the
        # carried per-batch stats above can be up to len(batches)-1
        # steps stale (and were computed with older params), so the
        # floor must not assert on them.  step() computes its confusion
        # at pre-update params, so discarding the returned state gives a
        # clean read of exactly the weights being saved.
        agg = None
        for b in batches:
            _, m = step(state, b)
            conf = np.asarray(m["confusion"])
            agg = conf if agg is None else agg + conf
        acc = float(np.trace(agg) / max(agg.sum(), 1.0))
        recalls = {
            c: float(agg[c, c] / agg[c].sum())
            for c in mapped_classes if agg[c].sum() > 0
        }
        acc_floor, recall_floor = quality_floor
        floor_recalls = [recalls.get(c, 0.0) for c in mapped_classes]
        assert acc >= acc_floor and min(floor_recalls) >= recall_floor, (
            f"segmenter failed to overfit the scene: acc={acc:.3f} {recalls}"
        )
    save_npz({"params": state.params, "batch_stats": state.batch_stats}, weight_path)
    return acc


def build_scene_bag(bag_path: str, images, poses) -> str:
    """Write the rendered frames + cell-center cloud as an .npz bag."""
    from ..runtime.io import FrameRecord, save_frames

    pcd = make_point_map()
    frames = [
        FrameRecord(
            pcd=pcd,
            pcd_frame_id="world",
            semantic_image=images[i],
            position=poses[i][0],
            quaternion=poses[i][1],
            camera="camera1",
            stamp=float(i),
        )
        for i in range(len(poses))
    ]
    save_frames(frames, bag_path)
    return bag_path
