"""The probabilistic BEV mapping engine — fused, on-device.

TPU-native rebuild of the mapping math in
`/root/reference/src/mapping.py:292-488` (and its replay twin
mapping_replay.py:214-319).  Where the reference runs three host-side numpy
stages per frame (project_pcd -> label gather -> per-class masked
scatter-add loop), this engine compiles ONE jitted program per camera that
takes the HBM-resident grid plus the frame tensors and performs:

    pose -> T_origin_to_velodyne -> project points -> gather labels from
    the semantic image -> match palette -> cell hash -> scatter-add of
    confusion-matrix columns -> LiDAR lane-intensity boost

entirely on device.  Dynamic point counts are handled by padding to a
static bucket with a validity mask folded into drop-indices
(SURVEY.md section 7 "hard parts").

Determinism: XLA scatter-add on TPU applies updates in a fixed order for a
given compiled program, so replays are bit-identical — the property the
reference achieves by single-threaded numpy.
"""
from __future__ import annotations

import dataclasses
import os.path as osp
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Camera, camera_setup_1, camera_setup_6
from ..geometry.homography import find_homography, warp_perspective
from ..geometry.transforms import (
    euler_matrix,
    homogenize,
    mm,
    pose_to_matrix,
    se3_inverse,
)
from ..ops.colormap import colors_to_labels

Array = jnp.ndarray


def getattr_cfg(cfg, dotted: str, default):
    """Fetch a dotted config key, tolerating older configs without it."""
    node = cfg
    for part in dotted.split("."):
        if part not in node:
            return default
        node = node[part]
    return node


# Fixed global map origin: min x/y of the point-cloud map, so all grid
# coordinates are positive (ref mapping.py:228-236, 404)
PCD_ORIGIN_OFFSET = np.array([1369.0496826171875, 562.84814453125, 0.0])


def velodyne_to_baselink() -> np.ndarray:
    """Tuned velodyne->baselink extrinsic (ref mapping.py:165-170)."""
    T = euler_matrix(0.0, 0.140, 0.0)
    T[0:3, 3] = [2.64, 0.0, 1.98]
    return T


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """BEV grid geometry (ref mapping.py:110-117).

    ``boundary`` is [[xmin, xmax], [ymin, ymax]] in meters; rows index x,
    columns index y (the reference's map[x_cell, y_cell] convention).
    """

    boundary: Tuple[Tuple[float, float], Tuple[float, float]]
    resolution: float
    num_classes: int

    @property
    def height(self) -> int:
        return int((self.boundary[0][1] - self.boundary[0][0]) / self.resolution)

    @property
    def width(self) -> int:
        return int((self.boundary[1][1] - self.boundary[1][0]) / self.resolution)

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.height, self.width, self.num_classes)

    @classmethod
    def from_cfg(cls, cfg) -> "GridSpec":
        b = cfg.MAPPING.BOUNDARY
        return cls(
            boundary=((b[0][0], b[0][1]), (b[1][0], b[1][1])),
            resolution=cfg.MAPPING.RESOLUTION,
            num_classes=len(cfg.LABELS_NAMES),
        )


def pad_points(pcd: np.ndarray, bucket: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a (4, N) point cloud to (4, bucket) with a validity mask.

    Keeps shapes static for jit; overflow points beyond the bucket are
    dropped (callers should size the bucket above the sensor's max).
    """
    n = pcd.shape[1]
    if n > bucket:
        pcd = pcd[:, :bucket]
        n = bucket
    out = np.zeros((4, bucket), dtype=np.float32)
    out[:, :n] = pcd
    valid = np.zeros((bucket,), dtype=bool)
    valid[:n] = True
    return out, valid


class SemanticMappingEngine:
    """Stateless-core mapping engine; the grid is explicit functional state.

    Usage:
        engine = SemanticMappingEngine(cfg)
        grid = engine.init_grid()
        grid, point_labels, point_mask = engine.step(
            grid, pcd, valid, semantic_rgb, position, quaternion,
            camera="camera1")
    """

    def __init__(
        self,
        cfg,
        evidence: Optional[np.ndarray] = None,
        duplicate_semantics: str = "reference",
        cameras: Optional[Dict[str, Camera]] = None,
    ):
        """Args:
            duplicate_semantics: 'reference' collapses duplicate (cell,
                class) hits per frame like the reference's fancy-index +=
                (ref mapping.py:424); 'accumulate' adds evidence per point.
            cameras: extra/override camera calibrations (e.g. TF-derived
                extrinsics via geometry.camera.camera_from_extrinsic,
                mirroring ref mapping.py:142-163).  Merged over the built-in
                setups 1/6; must be set before the first step() for that
                camera (each camera's projection compiles once).
        """
        from .confusion import evidence_matrix

        assert duplicate_semantics in ("reference", "accumulate")
        self.duplicate_semantics = duplicate_semantics
        self.cfg = cfg
        # 0 = dense update over the whole grid; > 0 = pose-centered window
        # of that many cells (see _build_update). Points outside the window
        # are dropped, so size it >= ~2.2 * RANGE_MAX / RESOLUTION.
        self.update_window = int(getattr_cfg(cfg, "MAPPING.UPDATE_WINDOW", 0))
        self.grid_spec = GridSpec.from_cfg(cfg)
        self.label_names = list(cfg.LABELS_NAMES)
        self.label_colors = np.array(cfg.LABEL_COLORS, dtype=np.uint8)
        self.lane_channel = (
            self.label_names.index("lane") if "lane" in self.label_names else -1
        )
        self.use_intensity = bool(cfg.MAPPING.PCD.USE_INTENSITY)
        self.range_max = float(cfg.MAPPING.PCD.RANGE_MAX)
        self.point_bucket = int(cfg.MAPPING.POINT_BUCKET)

        if evidence is None:
            evidence = evidence_matrix(cfg, len(self.label_names))
        # (C, C): column i is the additive evidence for observed class i
        self.evidence = np.asarray(evidence, dtype=np.float32)

        self.T_velodyne_to_baselink = velodyne_to_baselink()
        self.cameras: Dict[str, Camera] = {
            "camera1": camera_setup_1(),
            "camera6": camera_setup_6(),
        }
        if cameras:
            self.cameras.update(cameras)

        # Evidence-fold implementation: False (default) = XLA matmul.
        # The fused Pallas fold (ops/pallas/fold.py) HALVES the isolated
        # dense update (11.8 -> 6.2 ms) but REGRESSES the composed fused
        # step (+5.7 ms: the custom-call boundary breaks XLA's fusions
        # around the scatter inside the scanned program) — measured r03,
        # kept opt-in for standalone/update-dominated workloads.
        self.use_pallas_fold = False

        # Sort backend for the packed-key dedupe fast path: 'bitonic'
        # (default, XLA's jnp.sort) or 'radix' (ops/sort.py — O(n) LSD
        # passes instead of the O(n log^2 n) bitonic network; opt-in
        # until scripts/probe_radix_sort.py picks a winner on hardware).
        self.sort_method = str(getattr_cfg(cfg, "MAPPING.SORT_METHOD", "bitonic"))

        # Evidence-fold dataflow: 'matmul' (default) densifies per-key
        # observations into a (C, gh*gw) buffer and folds with one MXU
        # matmul; 'scatter' skips the dense buffer entirely — per-point
        # evidence COLUMNS are segment-summed per CELL and one unique-cell
        # scatter adds (C,)-vector deltas straight into the grid, so the
        # update touches only the ~N hit cells instead of streaming
        # C*gh*gw observation floats twice (opt-in until
        # scripts/probe_update_breakdown.py picks a winner on hardware;
        # numerics agree to f32 reassociation of <= C+1 addends per cell).
        self.fold_method = str(getattr_cfg(cfg, "MAPPING.FOLD_METHOD", "matmul"))

        # One compiled step / sequence runner per (camera, pcd-frame)
        # combination — a fresh jax.jit wrapper per call would lose jit's
        # compilation cache and re-trace every chunk of a long replay
        self._step_fns: Dict[Tuple[str, bool], callable] = {}
        self._runner_fns: Dict[Tuple[str, bool], callable] = {}

    # -- state --------------------------------------------------------------
    def init_grid(self) -> Array:
        """Fresh evidence grid in the device layout: planar (C, H, W).

        TPU memory tiles the last TWO dims to (8, 128); an (H, W, 5) layout
        pads the 5-channel minor dim to 128 lanes — 25.6x the memory (the
        full-route 5000x7000x5 grid would "occupy" 17.9 GB).  Channels-first
        keeps the big W axis on the lanes.  Use :meth:`to_hwc` to get the
        reference's (H, W, C) view for rendering/eval on host.
        """
        spec = self.grid_spec
        return jnp.zeros((spec.num_classes, spec.height, spec.width), dtype=jnp.float32)

    @staticmethod
    def to_hwc(grid) -> np.ndarray:
        """Planar device grid -> reference (H, W, C) numpy layout."""
        return np.moveaxis(np.asarray(grid), 0, -1)

    # -- grid checkpointing ---------------------------------------------------
    # The reference's log-odds map lives and dies with the process (its
    # stitcher merges RENDERED maps post-hoc, stitching.py); here the raw
    # evidence grid checkpoints to .npz so long routes map incrementally
    # across sessions — the mapping counterpart of train AUTO_RESUME.
    def save_grid(self, path: str, grid) -> str:
        """Checkpoint the evidence grid + its geometry to ``path`` (.npz).

        Returns the path actually written (np.savez appends '.npz' when
        missing — normalize up front so a later load with the same string
        finds the file).
        """
        if not path.endswith(".npz"):
            path += ".npz"
        spec = self.grid_spec
        np.savez_compressed(
            path,
            grid=np.asarray(grid, dtype=np.float32),
            boundary=np.asarray(spec.boundary, dtype=np.float64),
            resolution=np.float64(spec.resolution),
            label_names=np.asarray(self.label_names),
        )
        return path

    def load_grid(self, path: str) -> Array:
        """Load a :meth:`save_grid` checkpoint; validates geometry/labels."""
        if not path.endswith(".npz") and not osp.exists(path):
            path += ".npz"
        with np.load(path, allow_pickle=False) as z:
            spec = self.grid_spec
            boundary = z["boundary"].tolist()
            resolution = float(z["resolution"])
            labels = [str(s) for s in z["label_names"]]
            want_shape = (spec.num_classes, spec.height, spec.width)
            if (
                z["grid"].shape != want_shape
                or boundary != [list(b) for b in spec.boundary]
                or resolution != spec.resolution
                or labels != self.label_names
            ):
                raise ValueError(
                    f"grid checkpoint {path!r} does not match this engine: "
                    f"ckpt grid {z['grid'].shape} boundary {boundary} "
                    f"res {resolution} labels {labels} vs engine "
                    f"{want_shape} {spec.boundary} {spec.resolution} "
                    f"{self.label_names}"
                )
            return jnp.asarray(z["grid"])

    # -- fused frame step ----------------------------------------------------
    def _build_pointwise(
        self,
        camera_id: str,
        pcd_in_velodyne_frame: bool,
        image_is_class_id: bool = False,
        image_full_hw=None,
        distorted_image: bool = False,
        return_pixels: bool = False,
    ):
        """Closure computing per-point (cell, cls, vis, upd, boost).

        Shared between the single-device step, the grid-sharded step
        (parallel/grid_shard.py), and the fused camera+LiDAR pipeline
        (runtime/pipeline.py).  ``image_is_class_id`` switches the label
        image from RGB (palette-matched, the reference dataflow) to a
        direct (H, W) int32 channel-id image (<0 = unmapped) — the
        colorize+match round-trip composed away.

        ``distorted_image=True`` means the label image is in the RAW
        (distorted) camera frame: instead of resampling the whole frame
        (the reference's cv2.undistort, node:85-87 — a 2.7M-pixel bilinear
        gather that costs more than the DeepLab forward on TPU, measured
        66 ms vs 43 ms at 1440x1920), the plumb-bob forward model is
        applied to the ~1e5 projected points (a cheap VPU polynomial) and
        labels are gathered at the distorted pixel.  Geometrically
        equivalent label association; not bit-identical to the image
        resample (each path quantizes at a different stage).
        """
        # NOTE: closure constants are HOST numpy arrays, never jnp device
        # arrays.  A device array captured by a traced function is read
        # back to host during MLIR constant embedding — and this dev
        # environment's TPU tunnel takes ~39 s PER readback (measured,
        # ROUND_NOTES r03): six device constants here cost 236 s of every
        # lowering.  numpy constants embed directly.
        cam = self.cameras[camera_id]
        P = np.asarray(cam.P, dtype=np.float32)
        P_norm = np.asarray(cam.P_norm, dtype=np.float32)
        K = np.asarray(cam.K, dtype=np.float32)
        has_dist = distorted_image and cam.dist is not None
        if distorted_image and cam.dist is None:
            has_dist = False  # pinhole camera: raw frame == rectified frame
        T_v2b = np.asarray(self.T_velodyne_to_baselink, dtype=np.float32)
        label_colors = np.asarray(self.label_colors)
        offset = np.asarray(PCD_ORIGIN_OFFSET[:2, None], dtype=np.float32)
        spec = self.grid_spec
        bmin = np.asarray(
            [[spec.boundary[0][0]], [spec.boundary[1][0]]], dtype=np.float32
        )
        inv_res = 1.0 / spec.resolution
        h, w = spec.height, spec.width
        lane = self.lane_channel
        use_intensity = self.use_intensity and lane >= 0
        range_max = self.range_max

        def pointwise(pcd, valid, image, position, quaternion):
            xyz = pcd[0:3].astype(jnp.float32)
            intensity = pcd[3]

            # pose -> T_origin_to_velodyne (ref mapping.py:368-371)
            if pcd_in_velodyne_frame:
                xyz_velo = xyz
            else:
                T_b2o = pose_to_matrix(position, quaternion).astype(jnp.float32)
                T_o2v = se3_inverse(mm(T_b2o, T_v2b))
                xyz_velo = mm(T_o2v[:3, :3], xyz) + T_o2v[:3, 3:4]

            # perspective projection with int32 truncation (ref :375)
            if has_dist:
                # project to normalized coords, apply the plumb-bob forward
                # model, then intrinsics: labels live in the raw frame
                cam_pts = mm(P_norm, homogenize(xyz_velo))
                z = jnp.where(cam_pts[2] == 0, 1e-9, cam_pts[2])
                xy_n = cam_pts[:2] / z
                xy_d = cam.distort_normalized(xy_n)
                proj2 = mm(K[:2, :2], xy_d) + K[:2, 2:3]
                # far-off-axis points blow the polynomial up; bound before
                # the int cast (they are rejected by the masks anyway)
                ixy = jnp.clip(proj2, -1e6, 1e6).astype(jnp.int32)
            else:
                proj = mm(P, homogenize(xyz_velo))
                ixy = (proj[:2] / proj[2]).astype(jnp.int32)

            # visibility: in front, in range, inside the image (ref :378-383)
            front = (xyz_velo[0] > 0) & (xyz_velo[0] < range_max)
            img_h, img_w = image.shape[0], image.shape[1]
            bound_h, bound_w = image_full_hw if image_full_hw else (img_h, img_w)
            in_img = (
                (ixy[0] >= 0) & (ixy[0] < bound_w) & (ixy[1] >= 0) & (ixy[1] < bound_h)
            )
            vis = valid & front & in_img

            # gather point labels from the semantic image (ref :387)
            gx = jnp.clip(ixy[0], 0, bound_w - 1)
            gy = jnp.clip(ixy[1], 0, bound_h - 1)
            if image_full_hw:
                # nearest-downscale the gather indices (see docstring)
                gx = gx * img_w // bound_w
                gy = gy * img_h // bound_h
            if image_is_class_id:
                cls = image[gy, gx].astype(jnp.int32)
            else:
                rgb = image[gy, gx]  # (N, 3)
                cls = colors_to_labels(rgb, label_colors, fill=-1)

            # grid cell from the point's map-frame x/y (ref :403-411)
            local = xyz[0:2] + offset
            cell_rc = ((local - bmin) * inv_res).astype(jnp.int32)
            on_grid = (
                (cell_rc[0] >= 0)
                & (cell_rc[0] < h)
                & (cell_rc[1] >= 0)
                & (cell_rc[1] < w)
            )
            cell = cell_rc[0] * w + cell_rc[1]

            upd = vis & on_grid & (cls >= 0)
            if use_intensity:
                boost = upd & (cls == lane) & ((intensity < 2) | (intensity > 14))
            else:
                boost = None
            if return_pixels:
                # the (downscaled) gather coordinates, for callers that
                # fetch extra per-point data (e.g. network confidence)
                return cell, cls, vis, upd, boost, gy, gx
            return cell, cls, vis, upd, boost

        return pointwise

    def _build_dense_update(self):
        """Closure applying the sorted segmented-scan update to a slab.

        Returns ``update(grid, cell, cls, intensity, upd, gh, gw)`` where
        ``grid`` is a planar (C, gh, gw) slab and ``cell`` indexes it as
        ``row * gw + col``.  Shared by the single-device step, its windowed
        variant, and the grid-sharded step (parallel/grid_shard.py), so
        every path gets the same duplicate semantics and the fast
        sort + segmented-scan + unique-scatter + MXU-matmul update.
        """
        # (C_chan, C_obs): column i is the additive evidence when class i
        # is observed (ref mapping.py:424 uses confusion_matrix[:, i]).
        # Host numpy on purpose — see the constant-embedding note in
        # _build_pointwise.
        self_evidence = np.asarray(self.evidence, dtype=np.float32)

        # Evidence fold: grid += E @ obs.  The Pallas variant wins in
        # isolation but loses composed (see __init__ comment + ROUND_NOTES
        # r03); default stays XLA.
        use_pallas_fold = bool(self.use_pallas_fold)

        if use_pallas_fold:
            from ..ops.pallas.fold import evidence_fold_add

            def _fold(grid, observations, gh, gw):
                return evidence_fold_add(
                    grid, observations.reshape(num_cls, gh, gw), self_evidence
                )
        else:
            def _fold(grid, observations, gh, gw):
                delta = jnp.matmul(
                    self_evidence,
                    observations.reshape(num_cls, gh * gw),
                    precision=jax.lax.Precision.HIGHEST,
                )
                return grid + delta.reshape(num_cls, gh, gw)
        lane = self.lane_channel
        use_intensity = self.use_intensity and lane >= 0
        dedupe = self.duplicate_semantics == "reference"
        num_cls = self_evidence.shape[0]
        if self.sort_method not in ("bitonic", "radix"):
            raise ValueError(f"unknown sort_method {self.sort_method!r}")
        use_radix = self.sort_method == "radix"
        if self.fold_method not in ("matmul", "scatter"):
            raise ValueError(f"unknown fold_method {self.fold_method!r}")
        use_scatter_fold = self.fold_method == "scatter"
        if use_scatter_fold and use_pallas_fold:
            raise ValueError(
                "fold_method='scatter' bypasses the dense observation "
                "buffer; it cannot combine with use_pallas_fold"
            )
        # rows indexed by OBSERVED class: row i is the additive evidence
        # vector when class i is observed (evidence column i); host numpy
        ev_rows = np.ascontiguousarray(self_evidence.T)

        def _sort_packed(packed, max_packed):
            if use_radix:
                from ..ops.sort import radix_sort

                return radix_sort(packed, key_bits=int(max_packed).bit_length())
            return jnp.sort(packed)

        def _segmented_sum(flags_first, values):
            """Inclusive segmented cumsum over sorted keys (associative).

            ``values`` may carry trailing dims beyond the (N,) flags —
            e.g. the scatter fold's (N, C) evidence rows; the flag
            broadcasts across them.
            """

            def combine(a, b):
                fa, va = a
                fb, vb = b
                f = fb.reshape(fb.shape + (1,) * (va.ndim - fb.ndim))
                return fa | fb, jnp.where(f, vb, va + vb)

            _, summed = jax.lax.associative_scan(combine, (flags_first, values))
            return summed

        def _segmented_max(flags_first, values):
            def combine(a, b):
                fa, va = a
                fb, vb = b
                return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))

            _, out = jax.lax.associative_scan(combine, (flags_first, values))
            return out

        def _scatter_fold(grid, ksort, kvalid, obs_at_last, is_last,
                          bstat_at_last, gh, gw):
            """Fold evidence by scattering per-CELL delta vectors.

            ``obs_at_last`` carries each (cell, class) segment's observation
            total at its last sorted element (1 for dedupe, counts/weights
            otherwise); ``bstat_at_last`` (or None) the lane-boost statistic
            at the same positions.  The (cell, class) hit becomes the
            evidence COLUMN of its class scaled by the total; summing those
            rows per CELL segment gives the cell's (C,) grid delta, applied
            with ONE unique-index scatter onto the planar grid — no
            (C, gh*gw) densify, no full-grid matmul/add pass: HBM traffic
            is O(points), not O(cells).
            """
            n = ksort.shape[0]
            arange_n = jnp.arange(n)
            cls_s = ksort % num_cls
            cell_s = ksort // num_cls
            # observed-class -> evidence-column row; num_cls selects the
            # all-zero row one_hot produces for masked-out positions
            sel = jnp.where(is_last & kvalid, cls_s, num_cls)
            rows = jax.nn.one_hot(sel, num_cls, dtype=grid.dtype)
            vals = jnp.matmul(
                rows * obs_at_last[:, None].astype(grid.dtype),
                ev_rows.astype(grid.dtype),
                precision=jax.lax.Precision.HIGHEST,
            )
            if bstat_at_last is not None:
                lane_pos = is_last & kvalid & (cls_s == lane)
                vals = vals.at[:, lane].add(
                    jnp.where(lane_pos, 2.0 * bstat_at_last, 0.0)
                )
            # keys sort cell-major, so cell segments are contiguous; the
            # sentinel tail lands in its own cell (gh*gw)
            is_first_cell = jnp.concatenate(
                [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]]
            )
            is_last_cell = jnp.concatenate(
                [cell_s[:-1] != cell_s[1:], jnp.ones((1,), bool)]
            )
            totals = _segmented_sum(is_first_cell, vals)
            cidx = jnp.where(is_last_cell & kvalid, cell_s, gh * gw + arange_n)
            gflat = grid.reshape(num_cls, gh * gw)
            gflat = gflat.at[:, cidx].add(
                totals.T, mode="drop", unique_indices=True
            )
            return gflat.reshape(num_cls, gh, gw)

        def _dense_update_dedupe_fast(grid, cell, cls, intensity, upd, gh, gw):
            """The default-path update without argsort or segmented scans.

            For 'reference' dedupe with unweighted evidence, the only
            per-segment statistics needed are (a) segment existence and
            (b) ANY(boost) — so the boost bit packs into the sort key's
            LSB: a plain VALUES sort then puts each (cell, class)
            segment's max-boost element LAST, where the unique-index
            scatter already reads.  Replaces argsort (sorts (key, iota)
            pairs + a gather) with a single-array sort and eliminates the
            boost segmented scan + boost gather entirely — measured 14.1
            -> 11.8 ms for the 2000^2/2^17 dense update on v5e
            (scripts/probe_update_breakdown.py, r03; the remaining cost
            is sort 3.5 + unique-scatters ~3 + evidence matmul/add ~3.7,
            and the skinny (5,5)@(5,4M) matmul is already the FASTEST
            evidence-fold form — elementwise broadcast-sum and unrolled
            scaled-add variants both measured slower).
            """
            sentinel = gh * gw * num_cls
            key = jnp.where(upd, cell * num_cls + jnp.clip(cls, 0), sentinel)
            if use_intensity:
                boost = upd & (cls == lane) & ((intensity < 2) | (intensity > 14))
                packed = key * 2 + boost.astype(jnp.int32)
            else:
                packed = key * 2
            psort = _sort_packed(packed, sentinel * 2)
            ksort = psort // 2
            kvalid = ksort < sentinel
            is_last = jnp.concatenate([ksort[:-1] != ksort[1:], jnp.ones((1,), bool)])

            if use_scatter_fold:
                # segment-last carries max(boost) == ANY(boost): within
                # equal keys the packed sort orders boost=1 last
                bstat = (psort % 2).astype(grid.dtype) if use_intensity else None
                return _scatter_fold(
                    grid, ksort, kvalid, jnp.ones_like(ksort, grid.dtype),
                    is_last, bstat, gh, gw,
                )

            n = ksort.shape[0]
            arange_n = jnp.arange(n)
            cls_s = ksort % num_cls
            cell_s = ksort // num_cls
            obs_idx = jnp.where(is_last & kvalid, cls_s * (gh * gw) + cell_s,
                                sentinel + arange_n)
            observations = jnp.zeros((num_cls * gh * gw,), grid.dtype)
            observations = observations.at[obs_idx].add(
                1.0, mode="drop", unique_indices=True
            )
            grid = _fold(grid, observations, gh, gw)

            if use_intensity:
                # segment-last element carries max(boost) == ANY(boost):
                # within equal keys the packed sort orders boost=1 last
                bstat = (psort % 2).astype(grid.dtype)
                lane_seg = kvalid & (cls_s == lane)
                bidx = jnp.where(is_last & lane_seg, cell_s, gh * gw + arange_n)
                boost_buf = jnp.zeros((gh * gw,), grid.dtype)
                boost_buf = boost_buf.at[bidx].add(
                    2.0 * bstat, mode="drop", unique_indices=True
                )
                grid = grid.at[lane].add(boost_buf.reshape(gh, gw))
            return grid

        def _dense_update(grid, cell, cls, intensity, upd, gh, gw, weights=None):
            # --- TPU-fast Bayesian update (ref :414-424) -------------------
            # XLA lowers a scatter with potentially-duplicate indices to a
            # *serialized* update loop on TPU (measured ~25 ms for a 2^17
            # bucket).  Instead: sort the (cell, class) keys once (bitonic
            # sorts are parallel and cheap), reduce duplicates with a
            # segmented scan, then scatter per-key totals at *unique*
            # indices (vectorizable) into a dense (C, gh*gw) observation
            # buffer, and fold evidence in with ONE MXU matmul:
            #     grid += evidence @ observations
            # packed key (key*2 + boost) must fit int32; beyond ~214M cells
            # fall back to the general sort+scan path
            if dedupe and weights is None and gh * gw * num_cls * 2 + 1 < 2 ** 31:
                return _dense_update_dedupe_fast(
                    grid, cell, cls, intensity, upd, gh, gw
                )
            sentinel = gh * gw * num_cls
            key = jnp.where(upd, cell * num_cls + jnp.clip(cls, 0), sentinel)
            if use_radix:
                from ..ops.sort import radix_sort_with_perm

                ksort, order = radix_sort_with_perm(
                    key, key_bits=int(sentinel).bit_length()
                )
            else:
                order = jnp.argsort(key)
                ksort = key[order]
            kvalid = ksort < sentinel
            is_first = jnp.concatenate([jnp.ones((1,), bool), ksort[1:] != ksort[:-1]])
            is_last = jnp.concatenate([ksort[:-1] != ksort[1:], jnp.ones((1,), bool)])

            if weights is not None:
                # confidence-weighted evidence (softmax-confidence head):
                # a deduped (cell, class) hit carries its strongest point's
                # confidence; per-point mode sums confidences instead of
                # counts.  weights==1 reduces to the unweighted semantics.
                w_sorted = jnp.where(kvalid, weights[order].astype(grid.dtype), 0.0)
                if dedupe:
                    obs_at_last = _segmented_max(is_first, w_sorted)
                else:
                    obs_at_last = _segmented_sum(is_first, w_sorted)
            elif dedupe:
                # PARITY QUIRK (load-bearing): the reference updates with
                # numpy fancy-index ``+=`` (ref mapping.py:424,437), which
                # collapses duplicates — evidence is added once per (cell,
                # class) per frame.  One observation per unique key.
                obs_at_last = jnp.ones_like(ksort, dtype=grid.dtype)
            else:
                # per-point accumulation: per-key counts via segmented scan
                counts = _segmented_sum(is_first, kvalid.astype(grid.dtype))
                obs_at_last = counts

            if use_scatter_fold:
                bstat = None
                if use_intensity:
                    boost = upd & (cls == lane) & (
                        (intensity < 2) | (intensity > 14)
                    )
                    bstat = _segmented_sum(
                        is_first, boost[order].astype(grid.dtype)
                    )
                    if dedupe:
                        bstat = jnp.minimum(bstat, 1.0)
                return _scatter_fold(
                    grid, ksort, kvalid, obs_at_last, is_last, bstat, gh, gw
                )

            n = ksort.shape[0]
            arange_n = jnp.arange(n)
            # unique scatter targets in the planar (C, gh*gw) layout: the
            # (cell, class) key maps to class * gh*gw + cell; disjoint
            # out-of-range slots elsewhere (dropped) -> unique_indices holds
            cls_s = ksort % num_cls
            cell_s = ksort // num_cls
            obs_idx = jnp.where(is_last & kvalid, cls_s * (gh * gw) + cell_s,
                                sentinel + arange_n)
            observations = jnp.zeros((num_cls * gh * gw,), grid.dtype)
            observations = observations.at[obs_idx].add(
                obs_at_last, mode="drop", unique_indices=True
            )
            grid = _fold(grid, observations, gh, gw)

            # --- LiDAR intensity lane boost (ref :427-437) -----------------
            # Retro-reflective returns (paint) have extreme intensities; +2
            # evidence on the lane channel.  Lane-class segments are unique
            # per cell, so the same sorted order serves.
            if use_intensity:
                boost = upd & (cls == lane) & ((intensity < 2) | (intensity > 14))
                boost_sorted = boost[order]
                bstat = _segmented_sum(is_first, boost_sorted.astype(grid.dtype))
                if dedupe:
                    # any boost point in the (cell, lane) segment -> +2 once
                    bstat = jnp.minimum(bstat, 1.0)
                lane_seg = kvalid & ((ksort % num_cls) == lane)
                bidx = jnp.where(is_last & lane_seg, ksort // num_cls, gh * gw + arange_n)
                boost_buf = jnp.zeros((gh * gw,), grid.dtype)
                boost_buf = boost_buf.at[bidx].add(
                    2.0 * bstat, mode="drop", unique_indices=True
                )
                grid = grid.at[lane].add(boost_buf.reshape(gh, gw))

            return grid

        return _dense_update

    def _build_update(self):
        """Closure applying the frame update to the full (C, H, W) grid.

        Shared by the engine step and the fused pipeline.  Windowed mode:
        a frame's visible points span at most ~2x the LiDAR range, so for
        big grids (the 5000x7000 full route) the update operates on a
        pose-centered (C, win, win) slab via dynamic slices instead of
        densifying observations over all H*W cells — making the per-frame
        cost independent of the global grid size.
        """
        _dense_update = self._build_dense_update()
        spec = self.grid_spec
        h, w = spec.height, spec.width
        num_cls = self.evidence.shape[0]
        win = int(self.update_window) if self.update_window else 0
        windowed = 0 < win < max(h, w)
        win_r = min(win, h)
        win_c = min(win, w)

        def _window_update(grid, cell, cls, intensity, upd, weights=None):
            row = cell // w
            col = cell % w
            n_upd = jnp.maximum(jnp.sum(upd), 1)
            # center the window on the mean updated cell (robust for both
            # the world-frame and ego-frame point modes)
            r_mean = jnp.sum(jnp.where(upd, row, 0)) // n_upd
            c_mean = jnp.sum(jnp.where(upd, col, 0)) // n_upd
            r0 = jnp.clip(r_mean - win_r // 2, 0, max(h - win_r, 0))
            c0 = jnp.clip(c_mean - win_c // 2, 0, max(w - win_c, 0))

            lr = row - r0
            lc = col - c0
            in_win = (lr >= 0) & (lr < win_r) & (lc >= 0) & (lc < win_c)
            upd_w = upd & in_win
            local_cell = lr * win_c + lc

            slab = jax.lax.dynamic_slice(grid, (0, r0, c0), (num_cls, win_r, win_c))
            slab = _dense_update(
                slab, local_cell, cls, intensity, upd_w, win_r, win_c,
                weights=weights,
            )
            return jax.lax.dynamic_update_slice(grid, slab, (0, r0, c0))

        if windowed:
            return _window_update
        return lambda grid, cell, cls, intensity, upd, weights=None: _dense_update(
            grid, cell, cls, intensity, upd, h, w, weights=weights
        )

    def _build_step(self, camera_id: str, pcd_in_velodyne_frame: bool):
        pointwise = self._build_pointwise(camera_id, pcd_in_velodyne_frame)
        apply_update = self._build_update()

        # donate the grid so XLA updates it in place — without donation a
        # windowed dynamic_update_slice copies the whole (700MB full-route)
        # grid every frame
        @partial(jax.jit, donate_argnums=(0,))
        def step(grid, pcd, valid, image, position, quaternion):
            cell, cls, vis, upd, _ = pointwise(
                pcd, valid, image, position, quaternion
            )
            grid = apply_update(grid, cell, cls, pcd[3], upd)
            return grid, cls, vis

        return step

    def build_sequence_runner(self, camera: str = "camera1", pcd_frame_id: str = ""):
        """ONE-dispatch fusion of a stacked frame window via ``lax.scan``.

        Cuts per-frame dispatch overhead for offline replay: the grid stays
        in HBM across the window.  ``frames`` is a dict of stacked arrays:
        image (T,Hi,Wi,3) u8, pcd (T,4,N), valid (T,N), position (T,3),
        quaternion (T,4).

        The returned runner is cached per (camera, cloud-frame): repeated
        calls return the SAME jitted wrapper, so a multi-chunk replay
        traces once per distinct frame-stack shape, not once per chunk.
        """
        key = (camera, pcd_frame_id == "velodyne")
        cached = self._runner_fns.get(key)
        if cached is not None:
            return cached
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step(*key)
        step = self._step_fns[key]

        @partial(jax.jit, donate_argnums=(0,))
        def run(grid, frames):
            def body(g, f):
                g, _, _ = step(
                    g, f["pcd"], f["valid"], f["image"], f["position"], f["quaternion"]
                )
                return g, ()

            grid, _ = jax.lax.scan(body, grid, frames)
            return grid

        self._runner_fns[key] = run
        return run

    def step(
        self,
        grid: Array,
        pcd: Array,
        valid: Array,
        image: Array,
        position: Array,
        quaternion: Array,
        camera: str = "camera1",
        pcd_frame_id: str = "",
    ) -> Tuple[Array, Array, Array]:
        """Fuse one frame into the grid.

        Args:
            grid: planar (C, H, W) evidence grid (from ``init_grid``).
            pcd: (4, N) points [x, y, z, intensity] (N static per bucket).
            valid: (N,) mask for padded points.
            image: (Hi, Wi, 3) uint8 semantic RGB image.
            position, quaternion: vehicle pose (unused if pcd is already in
                the velodyne frame, ref mapping.py:366-373).
            camera: 'camera1' | 'camera6'.
            pcd_frame_id: ROS frame id of the cloud; 'velodyne' means
                ego-frame points (points_raw mode).

        Returns:
            (updated grid, per-point class index, per-point visibility).
        """
        key = (camera, pcd_frame_id == "velodyne")
        if key not in self._step_fns:
            self._step_fns[key] = self._build_step(*key)
        return self._step_fns[key](
            grid,
            jnp.asarray(pcd),
            jnp.asarray(valid),
            jnp.asarray(image),
            jnp.asarray(position, dtype=jnp.float32),
            jnp.asarray(quaternion, dtype=jnp.float32),
        )

    # -- planar (homography) fallback ----------------------------------------
    def anchor_points_2(self) -> np.ndarray:
        """Grid-frame anchor pixels used to fit the homography (ref :160-163)."""
        w, h = self.grid_spec.width, self.grid_spec.height
        return np.array(
            [[w, w / 2, w / 2, w], [h / 4, h / 4, h * 3 / 4, h * 3 / 4]], dtype=np.float64
        )

    def discretize_matrix_inv(self) -> np.ndarray:
        """Grid pixel -> local metric coordinates (ref mapping.py:148-153)."""
        spec = self.grid_spec
        return np.array(
            [
                [spec.resolution, 0, spec.boundary[0][0]],
                [0, spec.resolution, spec.boundary[1][1]],
                [0, 0, 1],
            ]
        )

    def update_map_planar(
        self, grid: Array, image: Array, T_local_to_base: np.ndarray, camera: str = "camera1"
    ) -> Array:
        """Project the semantic image onto the ground plane and accumulate.

        Rebuild of ref mapping.py:446-488: anchor grid cells are cast
        local_map -> base_link -> velodyne -> image to fit an image->grid
        homography; the warped semantic image increments matching class
        layers, with cells closer than 8 m in x masked out.

        NOTE (reference defect, preserved *fixed*): the reference compares
        warped pixel values against label *name strings*
        (``image_on_map[:, :, 0] == self.label_names[i]``, ref :474), which
        is always False in python3 — the planar path silently adds nothing.
        We implement the evident intent: match the first color channel.
        """
        cam = self.cameras[camera]
        anchors = self.anchor_points_2()
        pts_map_h = np.vstack([anchors, np.ones((1, anchors.shape[1]))])
        pts_local = self.discretize_matrix_inv() @ pts_map_h
        pts_local[2, :] = 0.0
        pts_local_h = np.vstack([pts_local, np.ones((1, pts_local.shape[1]))])

        T_base_to_velodyne = np.linalg.inv(self.T_velodyne_to_baselink)
        T_local_to_velodyne = T_base_to_velodyne @ np.asarray(T_local_to_base)
        pts_velodyne = T_local_to_velodyne @ pts_local_h
        proj = cam.P @ pts_velodyne
        pts_image = (proj[:2] / proj[2]).T  # (4, 2)

        H = find_homography(pts_image, anchors.T)
        spec = self.grid_spec
        image_on_map = warp_perspective(
            jnp.asarray(image), H, (spec.width, spec.height), mode="nearest"
        )

        sep = int((8 - spec.boundary[0][0]) / spec.resolution)
        col = jnp.arange(spec.width)
        col_ok = (col >= sep)[None, :]

        first_channel = image_on_map[..., 0]
        for i in range(len(self.label_names)):
            match = (first_channel == int(self.label_colors[i, 0])) & col_ok
            grid = grid.at[i].add(match.astype(grid.dtype))
        return jnp.maximum(grid, 0.0)
