"""Deterministic offline replay driver.

Rebuild of `/root/reference/src/mapping_replay.py:146-211` — the ROS-free
benchmark loop (SURVEY.md section 3.5): stream recorded frames through the
fused mapping engine, then smooth, render, save ``global_map_<name>.png``
and score against ground truth.

TPU pipelining: engine steps are dispatched asynchronously (JAX's async
dispatch), so the host prepares and transfers frame i+1 while the device
fuses frame i; the grid lives in HBM for the whole sequence and only the
final rendered map crosses back to the host.
"""
from __future__ import annotations

import os.path as osp
import sys
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config.defaults import resolve_output_dir
from ..mapping.engine import SemanticMappingEngine, pad_points
from ..mapping.renderer import apply_filter, render_bev_map
from ..utils.file_io import makedirs
from ..utils.logger import MyLogger
from .io import FrameRecord, iter_sequence_files, load_frames, load_reference_dump


class MappingReplay:
    """Replays recorded sequences through the mapping engine."""

    def __init__(
        self, cfg, logger: Optional[MyLogger] = None, engine=None,
        frame_parallel: bool = False,
    ):
        """``frame_parallel=True`` fuses homogeneous sequences data-parallel
        across all visible devices (see run_frames_parallel); heterogeneous
        sequences fall back to the sequential window path."""
        self.frame_parallel = bool(frame_parallel)
        self.cfg = cfg
        from ..mapping.engine import getattr_cfg

        # MAPPING.GRID_SHARDS > 1: the grid row-shards over a ('grid',)
        # mesh axis (each device owns a band in its HBM — the config knob
        # for grids beyond one device's memory, SURVEY.md section 5);
        # composes with frame_parallel over a 2D ('data', 'grid') mesh
        self.grid_shards = int(getattr_cfg(cfg, "MAPPING.GRID_SHARDS", 1))
        output_dir = resolve_output_dir(cfg.OUTPUT_DIR, cfg.TASK_NAME)
        if logger is None:
            logger = MyLogger("mapping_replay", save_dir=output_dir, use_timestamp=False)
        self.logger = logger
        self.output_dir = logger.save_dir or output_dir
        self.engine = engine or SemanticMappingEngine(cfg)
        self.input_dir = cfg.MAPPING.INPUT_DIR
        self.label_colors = np.array(cfg.LABEL_COLORS, dtype=np.uint8)

    # -- core loop -----------------------------------------------------------
    @staticmethod
    def _chunk_frames(frames, window: int):
        """Split a frame sequence OR iterator into homogeneous stretches of
        <= window frames (same camera / cloud frame / image shape).  Works
        lazily, so a streaming source (e.g. ``stream_bag_frames``) is
        chunked as it decodes."""

        def frame_key(f):
            return (f.camera, f.pcd_frame_id, np.asarray(f.semantic_image).shape)

        chunk: list = []
        for f in frames:
            if chunk and (len(chunk) >= window or frame_key(f) != frame_key(chunk[0])):
                yield chunk
                chunk = []
            chunk.append(f)
        if chunk:
            yield chunk

    def _stage(self, chunk, min_len: int = 2):
        """Host-side staging of one chunk: pad, stack, start device copies.

        Runs on the prefetch thread so stacking the next window's ~150 MB
        overlaps the device fusing the current one (jax.device_put is
        async; the arrays land in HBM while the previous dispatch runs).
        Chunks shorter than ``min_len`` return None (run_frames dispatches
        single frames through engine.step instead; the fused CLI path
        stages every chunk with ``min_len=1``).
        """
        if len(chunk) < min_len:
            return None
        bucket = self.engine.point_bucket
        padded = [
            pad_points(np.asarray(f.pcd, dtype=np.float32), bucket) for f in chunk
        ]
        return {
            "image": jax.device_put(np.stack([f.semantic_image for f in chunk])),
            "pcd": jax.device_put(np.stack([p for p, _ in padded])),
            "valid": jax.device_put(np.stack([v for _, v in padded])),
            "position": jax.device_put(
                np.stack([np.asarray(f.position, np.float32) for f in chunk])
            ),
            "quaternion": jax.device_put(
                np.stack([np.asarray(f.quaternion, np.float32) for f in chunk])
            ),
        }

    def run_frames(
        self, frames: Sequence[FrameRecord], window: int = 8,
        prefetch: bool = True, init_grid=None, _copy_init: bool = True,
    ):
        """Fuse a frame sequence into a fresh grid; returns the device grid.

        Homogeneous stretches (same camera / image shape / cloud frame) are
        fused ``window`` frames per device dispatch via lax.scan; anything
        irregular falls back to per-frame steps.  With ``prefetch`` the
        next window is padded/stacked/staged to HBM on a worker thread
        while the device fuses the current one (host double-buffering,
        SURVEY.md section 7 "host/device pipelining").  ``init_grid``
        resumes from a checkpointed grid (engine.load_grid) instead of a
        fresh one — evidence is additive, so split replays compose exactly.
        """
        if self.grid_shards > 1:
            return self._run_frames_grid_sharded(frames, init_grid=init_grid)

        engine = self.engine
        # copy, don't alias: the first dispatch DONATES the grid buffer
        # (donate_argnums), which would invalidate the caller's checkpoint
        # array for reuse (save_grid / a second resumed replay).  Internal
        # callers that own the grid (replay_dir's continuous loop threading
        # one grid through N files) skip the copy — 700 MB per file
        # boundary at the full-route grid.
        if init_grid is None:
            grid = engine.init_grid()
        elif _copy_init:
            grid = jnp.array(init_grid, copy=True)
        else:
            grid = jnp.asarray(init_grid)
        bucket = engine.point_bucket
        chunks = list(self._chunk_frames(frames, window))

        from concurrent.futures import ThreadPoolExecutor

        def dispatch(grid, chunk, staged):
            if len(chunk) > 1:
                runner = engine.build_sequence_runner(
                    camera=chunk[0].camera, pcd_frame_id=chunk[0].pcd_frame_id
                )
                return runner(grid, staged)
            f = chunk[0]
            pcd, valid = pad_points(np.asarray(f.pcd, dtype=np.float32), bucket)
            grid, _, _ = engine.step(
                grid, pcd, valid, f.semantic_image, f.position, f.quaternion,
                camera=f.camera, pcd_frame_id=f.pcd_frame_id,
            )
            return grid

        if not prefetch or len(chunks) <= 1:
            for chunk in chunks:
                staged = self._stage(chunk) if len(chunk) > 1 else None
                grid = dispatch(grid, chunk, staged)
            return grid

        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = pool.submit(self._stage, chunks[0])
            for i, chunk in enumerate(chunks):
                staged = pending.result()
                if i + 1 < len(chunks):
                    pending = pool.submit(self._stage, chunks[i + 1])
                grid = dispatch(grid, chunk, staged)
        return grid

    def _run_frames_grid_sharded(self, frames: Sequence[FrameRecord],
                                 init_grid=None):
        """Sequential replay with the grid row-sharded over ('grid',).

        MAPPING.GRID_SHARDS devices each keep one row band HBM-resident
        (parallel/grid_shard.py); frames step one at a time with
        cell-ownership-routed updates — for grids larger than a single
        device's memory.  Matches the unsharded replay (pinned in
        tests/test_runtime.py).
        """
        from ..parallel.grid_shard import init_sharded_grid, make_sharded_step
        from ..parallel.mesh import create_mesh

        devices = jax.devices()
        assert self.grid_shards <= len(devices), (
            f"MAPPING.GRID_SHARDS={self.grid_shards} but only "
            f"{len(devices)} devices are visible"
        )
        mesh = create_mesh(
            axis_names=("grid",), devices=devices[: self.grid_shards]
        )
        engine = self.engine
        grid = init_sharded_grid(engine, mesh)
        if init_grid is not None:
            # resume: lay the checkpointed grid out with the same row-band
            # sharding a fresh one gets
            grid = jax.device_put(np.asarray(init_grid), grid.sharding)
        steps = {}
        for f in frames:
            key = (f.camera, f.pcd_frame_id == "velodyne")
            if key not in steps:
                steps[key] = make_sharded_step(
                    engine, mesh, camera=f.camera,
                    pcd_in_velodyne_frame=key[1],
                )
            pcd, valid = pad_points(
                np.asarray(f.pcd, dtype=np.float32), engine.point_bucket
            )
            grid = steps[key](
                grid, jnp.asarray(pcd), jnp.asarray(valid),
                jnp.asarray(f.semantic_image),
                jnp.asarray(f.position, jnp.float32),
                jnp.asarray(f.quaternion, jnp.float32),
            )
        return grid

    def run_frames_parallel(
        self,
        frames: Sequence[FrameRecord],
        mesh=None,
        axis: str = "data",
        init_grid=None,
    ):
        """Fuse a homogeneous frame sequence data-parallel over a mesh.

        Frames shard over the mesh's ``axis``; each device scans its frames
        into a partial grid and one psum combines them (exact up to f32
        re-association — see parallel/frame_parallel.py).  Use when the bag
        is long and the grid fits per-device; requires all frames to share
        one camera and cloud frame.
        """
        import jax

        from ..parallel.frame_parallel import make_frame_parallel_run, stack_frames
        from ..parallel.mesh import create_mesh

        assert frames, "no frames to replay"
        cameras = {f.camera for f in frames}
        cloud_frames = {f.pcd_frame_id for f in frames}
        assert len(cameras) == 1 and len(cloud_frames) == 1, (
            "frame-parallel replay needs a homogeneous sequence; got "
            f"cameras={cameras}, cloud frames={cloud_frames}"
        )
        velodyne = frames[0].pcd_frame_id == "velodyne"
        if mesh is None and self.grid_shards > 1:
            # sp x fp composed: frames shard over 'data', grid rows over
            # 'grid' (parallel/grid_shard.py::make_sharded_frame_parallel_run)
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.grid_shard import (
                init_sharded_grid,
                make_sharded_frame_parallel_run,
            )

            n_dev = len(jax.devices())
            assert n_dev % self.grid_shards == 0, (
                f"{n_dev} devices do not split into GRID_SHARDS="
                f"{self.grid_shards}"
            )
            mesh2d = create_mesh(
                axis_sizes=(n_dev // self.grid_shards, self.grid_shards),
                axis_names=(axis, "grid"), devices=jax.devices(),
            )
            run = make_sharded_frame_parallel_run(
                self.engine, mesh2d, data_axis=axis,
                camera=frames[0].camera, pcd_in_velodyne_frame=velodyne,
            )
            stacked = stack_frames(self.engine, frames, mesh2d, axis=axis)
            out = run(init_sharded_grid(self.engine, mesh2d), *stacked)
        else:
            if mesh is None:
                mesh = create_mesh(axis_names=(axis,), devices=jax.devices())
            run = make_frame_parallel_run(
                self.engine, mesh, axis=axis, camera=frames[0].camera,
                pcd_in_velodyne_frame=velodyne,
            )
            stacked = stack_frames(self.engine, frames, mesh, axis=axis)
            out = run(self.engine.init_grid(), *stacked)
        if init_grid is not None:
            # evidence is additive: resuming == adding the checkpointed
            # grid once OUTSIDE the psum (inside it would count N_dev times)
            out = out + jax.device_put(np.asarray(init_grid), out.sharding)
        return out

    def finalize(self, grid, name: str = "", use_pallas: Optional[bool] = None) -> np.ndarray:
        """Smooth + render + save + evaluate (ref mapping_replay.py:194-211).

        ``use_pallas`` selects the fused single-pass finalize kernel
        (ops/pallas/render.py); defaults to True on TPU backends.
        """
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from ..ops.pallas.render import render_bev_map_fused, unpack_rgba_image

            packed = render_bev_map_fused(jnp.asarray(grid), self.label_colors)
            color_map = np.asarray(unpack_rgba_image(packed))
        else:
            hwc = jnp.asarray(SemanticMappingEngine.to_hwc(grid))
            color_map = np.asarray(render_bev_map(apply_filter(hwc), self.label_colors))

        makedirs(self.output_dir, exist_ok=True)
        suffix = f"_{name}" if name else ""
        output_file = osp.join(self.output_dir, f"global_map{suffix}.png")
        self._imwrite(output_file, color_map)
        self.logger.log(f"Saved map to {output_file}")

        if self.cfg.GROUND_TRUTH_DIR:
            from ..evaluation.map_eval import MapEvaluator

            evaluator = MapEvaluator(
                ground_truth_dir=self.cfg.GROUND_TRUTH_DIR, logger=self.logger
            )
            evaluator.test_single_map(color_map)
        return color_map

    @staticmethod
    def _imwrite(path: str, array: np.ndarray) -> None:
        import cv2

        # NOTE: like the reference (mapping.py:340), the RGB array is handed
        # to cv2.imwrite unchanged; imread returns the identical array, so
        # the on-disk channel order quirk is round-trip consistent.
        cv2.imwrite(path, array)

    # -- entry points (ref :146-172) -----------------------------------------
    def replay_file(self, path: str, init_grid=None, return_grid: bool = False,
                    _copy_init: bool = True):
        name = osp.splitext(osp.basename(path))[0]
        self.logger.log(f"Loading input file {path}")
        if path.endswith(".npz"):
            frames = load_frames(path)
        else:
            frames = load_reference_dump(path)
        # stack_frames np.stack's the images too, so frame-parallel needs
        # identical image shapes in addition to one (camera, cloud-frame)
        # — mixed-resolution recordings fall back to the sequential path
        # (whose _chunk_frames already splits on shape)
        homogeneous = (
            len({(f.camera, f.pcd_frame_id, f.semantic_image.shape)
                 for f in frames}) == 1
            if frames else False
        )
        if self.frame_parallel and homogeneous:
            grid = self.run_frames_parallel(frames, init_grid=init_grid)
        else:
            grid = self.run_frames(
                frames, init_grid=init_grid, _copy_init=_copy_init
            )
        if return_grid:
            return grid
        return self.finalize(grid, name)

    def replay_dir(
        self,
        input_dir: Optional[str] = None,
        resume_grid: Optional[str] = None,
        save_grid: Optional[str] = None,
    ) -> List[np.ndarray]:
        """Replay every sequence file in ``input_dir``.

        Default: one fresh grid and one rendered map PER FILE (the
        reference's per-recording behavior).  With ``resume_grid`` and/or
        ``save_grid``, ONE grid threads through all files in order —
        seeded from the ``resume_grid`` checkpoint, saved to ``save_grid``
        after the last file — and a single combined map renders: long
        routes map incrementally across sessions (evidence is additive,
        so split replays compose exactly; pinned in tests/test_runtime.py).
        """
        input_dir = input_dir or self.input_dir
        continuous = resume_grid is not None or save_grid is not None
        maps = []
        if continuous:
            grid = self.engine.load_grid(resume_grid) if resume_grid else None
            seen = False
            for path in iter_sequence_files(input_dir):
                seen = True
                # this loop owns every grid it threads (load_grid returns a
                # fresh array; each file's result feeds the next), so skip
                # run_frames' protective copy-before-donation
                grid = self.replay_file(
                    path, init_grid=grid, return_grid=True, _copy_init=False
                )
            if seen:
                if save_grid:
                    written = self.engine.save_grid(save_grid, grid)
                    self.logger.log(f"Saved grid checkpoint to {written}")
                maps.append(self.finalize(grid, "combined"))
        else:
            for path in iter_sequence_files(input_dir):
                maps.append(self.replay_file(path))
        if not maps:
            # a typo'd MAPPING.INPUT_DIR should not be a silent success
            print(
                f"replay: no sequence files (.npz/.pkl/.hkl) found in "
                f"{input_dir!r}", file=sys.stderr,
            )
        return maps


def main():  # pragma: no cover - CLI entry (ref mapping_replay.py:321-329)
    import argparse

    from ..config import get_cfg_defaults

    parser = argparse.ArgumentParser(description="Offline mapping replay")
    parser.add_argument("--cfg", dest="config_file", default="", metavar="FILE")
    args, _ = parser.parse_known_args()

    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    MappingReplay(cfg).replay_dir()


if __name__ == "__main__":  # pragma: no cover
    main()
