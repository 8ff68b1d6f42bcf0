"""Command-line launcher — the L7 orchestration layer.

Replaces the reference's roslaunch files + shell scripts
(`/root/reference/scripts/launch/*.launch`, README.md:113,127) with one
CLI:

    python -m vision_semantic_segmentation_tpu replay  --cfg exp.yaml
    python -m vision_semantic_segmentation_tpu pipeline --cfg exp.yaml --bag seq.npz
    python -m vision_semantic_segmentation_tpu train    --cfg train.yaml [KEY VALUE ...]
    python -m vision_semantic_segmentation_tpu eval     --maps dir --gt dir
    python -m vision_semantic_segmentation_tpu convert  ckpt.pth [--out ckpt.npz]
    python -m vision_semantic_segmentation_tpu export   input.{hkl,pkl,bag} [--out f.npz]
    python -m vision_semantic_segmentation_tpu video    --cfg demo.yaml --video in.mp4
    python -m vision_semantic_segmentation_tpu compile  --cfg exp.yaml --out runner.vsstexp
    python -m vision_semantic_segmentation_tpu autotune --cfg exp.yaml --out tuned.yaml
"""
from __future__ import annotations

import argparse


def _load_app_cfg(config_files):
    """Merge one or more YAML files over the defaults, in order — so an
    `autotune` overlay composes directly: ``--cfg exp.yaml --cfg tuned.yaml``."""
    from .config import get_cfg_defaults

    cfg = get_cfg_defaults()
    if isinstance(config_files, str):
        config_files = [config_files] if config_files else []
    for path in config_files or []:
        cfg.merge_from_file(path)
    return cfg


def cmd_replay(args):
    from .runtime.replay import MappingReplay

    cfg = _load_app_cfg(args.cfg)
    if args.input_dir:
        cfg.MAPPING.INPUT_DIR = args.input_dir
    MappingReplay(
        cfg, frame_parallel=getattr(args, "frame_parallel", False)
    ).replay_dir(
        resume_grid=getattr(args, "resume_grid", None) or None,
        save_grid=getattr(args, "save_grid", None) or None,
    )


def cmd_pipeline(args):
    """Run both nodes in-process over a recorded sequence (camera1_mapping).

    Accepts the native ``.npz`` frame format or a ROS ``.bag`` recording
    (replayed through the rosbag adapter, ref launch/camera1_mapping.launch).
    ``--fused`` runs the single-dispatch production pipeline instead of the
    two-node dataflow: whole frame windows per device dispatch, the grid
    HBM-resident, distortion handled on the projected points.
    """
    from .mapping.engine import SemanticMappingEngine
    from .runtime.bus import TopicBus
    from .runtime.io import load_frames
    from .runtime.node import MappingNode, SegmentationNode
    from .utils.ros_compat import TransformTree

    cfg = _load_app_cfg(args.cfg)
    fused = getattr(args, "fused", False)
    if fused and not getattr(args, "rate", 0):
        return _fused_pipeline(
            cfg, args.bag, confidence=getattr(args, "confidence", False)
        )
    if getattr(args, "rate", 0):
        # online mode at wall-clock rate, overload surfacing as frame
        # drops (the reference's live camera1_mapping.launch behavior).
        # Default: both nodes on their own executor threads; --fused
        # runs ONE FusedOnlineNode (single dispatch per frame — zero
        # drops at a full-rate 12 Hz camera on the v5e where the
        # two-node path tops out at ~10.9 Hz).
        if not args.bag.endswith(".bag"):
            raise SystemExit(
                "--rate needs a ROS .bag recording (its timeline drives the "
                "wall clock); use `export` to convert, or replay .npz "
                "sequences offline without --rate"
            )
        from .runtime.async_bus import run_online

        report = run_online(
            cfg, args.bag, rate=float(args.rate), fused=fused,
            decode_ahead=getattr(args, "decode_ahead", False),
        )
        print(
            f"online replay @ {report.rate}x: {report.published} msgs in "
            f"{report.wall_duration_s:.1f}s (bag {report.bag_duration_s:.1f}s), "
            f"dropped {report.dropped_total} "
            f"({report.drops or 'none'}), max lag {report.max_lag_s * 1e3:.0f} ms"
        )
        return report
    bus = TopicBus()
    SegmentationNode(cfg, bus)
    tf_tree = TransformTree()
    node = MappingNode(cfg, bus, engine=SemanticMappingEngine(cfg), tf_tree=tf_tree)

    if args.bag.endswith(".bag"):
        from .runtime.bag_adapter import play_bag

        # the node already folds /tf bus messages into tf_tree; passing the
        # tree here as well would apply every transform twice
        play_bag(args.bag, bus)
    else:
        frames = load_frames(args.bag)
        # publish clouds on the topic the node actually subscribes to —
        # MAPPING.DEPTH_METHOD selects /reduced_map vs /points_raw
        # (node.py pcd_topic; ref launch remaps the same way)
        pcd_topic = node.pcd_topic or "/reduced_map"
        for f in frames:
            bus.publish(pcd_topic, f.pcd, stamp=f.stamp, frame_id=f.pcd_frame_id)
            bus.publish("/current_pose", (f.position, f.quaternion), stamp=f.stamp)
            bus.publish(f"/{f.camera}/image_raw", f.semantic_image, stamp=f.stamp, frame_id=f.camera)
    if node.grid is not None and node.finalized_map is None:
        node.finalize()


def _fused_pipeline(cfg, bag_path: str, confidence: bool = False):
    """Raw frames -> FusedFramePipeline windows -> finalized map (+ eval).

    Reuses MappingReplay's chunking/staging (host double-buffering comes
    for free) with the fused runner dispatching each staged window.
    Distortion follows ``VISION_SEM_SEG.UNDISTORT``: True means the
    recording is RAW camera frames, handled via the distortion-on-points
    mode; False means frames are already rectified/pinhole, so the
    projection must be pinhole too (applying the plumb-bob model to
    points against a rectified frame would mis-gather near the edges).
    ``confidence`` enables the softmax-confidence-weighted Bayesian
    update (the fused confidence head; extension beyond the reference).
    """
    from .inference.predictor import SemanticSegmentation
    from .mapping.engine import SemanticMappingEngine
    from .runtime.io import load_frames, load_reference_dump
    from .runtime.pipeline import FusedFramePipeline
    from .runtime.replay import MappingReplay

    if bag_path.endswith(".bag"):
        from .runtime.bag_adapter import stream_bag_frames

        # streaming decode: a worker thread deserializes the NEXT frames
        # (image decode + PointCloud2 unpack) behind a bounded queue while
        # the device fuses the current chunk
        frames = stream_bag_frames(bag_path)
    elif bag_path.endswith(".npz"):
        frames = load_frames(bag_path)
    else:
        frames = load_reference_dump(bag_path)
    if not bag_path.endswith(".bag") and not frames:
        raise SystemExit(f"no frames in {bag_path}")

    net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
    predictor = SemanticSegmentation(net_cfg)  # loads MODEL.WEIGHT
    engine = SemanticMappingEngine(cfg)
    undistort = (
        bool(cfg.VISION_SEM_SEG.UNDISTORT)
        if "UNDISTORT" in cfg.VISION_SEM_SEG
        else True
    )
    pipeline = FusedFramePipeline(
        cfg, predictor.variables, engine=engine,
        distortion="points" if undistort else "none",
        confidence_weighting=confidence,
    )
    replay = MappingReplay(cfg, engine=engine)

    grid = pipeline.init_grid()
    n_fused = 0
    for chunk in replay._chunk_frames(frames, window=8):
        n_fused += len(chunk)
        # per-chunk image shape: _chunk_frames splits on it, so a
        # mixed-resolution recording builds one runner per resolution
        # (runners are cached per (camera, hw, cloud-frame) in the pipeline)
        runner = pipeline.build_sequence_runner(
            camera=chunk[0].camera,
            image_hw=tuple(chunk[0].semantic_image.shape[:2]),
            pcd_frame_id=chunk[0].pcd_frame_id,
        )
        # the jitted runner specializes per window length; a remainder
        # chunk (if any) costs one extra compile
        grid = runner(grid, replay._stage(chunk, min_len=1))
    if n_fused == 0:
        raise SystemExit(f"no frames in {bag_path}")
    # render/save/evaluate through the replay finalizer (same artifacts)
    replay.finalize(grid, name="fused")


def cmd_train(args):
    from .config import get_train_cfg_defaults, resolve_output_dir
    from .train.trainer import train
    from .utils.logger import setup_logger

    cfg = get_train_cfg_defaults()
    if args.cfg:
        cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    output_dir = resolve_output_dir(cfg.OUTPUT_DIR, cfg.TASK_NAME)
    logger = setup_logger("train", output_dir)
    train(cfg, output_dir=output_dir, logger=logger)


def cmd_eval(args):
    from .evaluation.map_eval import MapEvaluator

    MapEvaluator(ground_truth_dir=args.gt).full_test(
        dir_path=args.maps, latex_mode=args.latex, verbose=True
    )


def cmd_convert(args):
    from .models.convert import convert_pth_to_npz

    out = convert_pth_to_npz(args.pth, args.out)
    print(f"wrote {out}")


def cmd_export(args):
    """Carry a recorded input over to the native .npz replay format.

    Accepts the reference's hickle dumps (``.hkl``), pickled input lists
    (``.pkl``), and ROS bag recordings (``.bag``).
    """
    import os.path as osp

    from .runtime.io import load_reference_dump, save_frames

    src = args.input
    if src.endswith(".bag"):
        from .runtime.bag_adapter import bag_to_frames

        frames = bag_to_frames(
            src,
            image_topic=args.image_topic,
            pcd_topic=args.pcd_topic,
            pose_topic=args.pose_topic,
        )
    else:
        frames = load_reference_dump(src)
    out = args.out or osp.splitext(src)[0] + ".npz"
    save_frames(frames, out)
    print(f"wrote {out} ({len(frames)} frames)")


def cmd_compile(args):
    """AOT-export the fused production pipeline to a serving artifact.

    Serializes the lowered camera+LiDAR program (runtime/export.py):
    loading it back skips Python tracing and JAX lowering entirely, so a
    serving process boots in seconds.  The artifact pins (camera,
    image size, window length, grid geometry); the model weights stay
    external and are supplied at load time.
    """
    from .inference.predictor import SemanticSegmentation
    from .mapping.engine import SemanticMappingEngine
    from .runtime.export import export_sequence_runner
    from .runtime.pipeline import FusedFramePipeline

    cfg = _load_app_cfg(args.cfg)
    predictor = SemanticSegmentation(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK)
    engine = SemanticMappingEngine(cfg)
    pipeline = FusedFramePipeline(
        cfg, predictor.variables, engine=engine, distortion="points"
    )
    out = export_sequence_runner(
        pipeline, args.out, image_hw=(args.height, args.width),
        window=args.window, camera=args.camera,
    )
    print(f"wrote {out}")


def cmd_quantize(args):
    """Calibrate and export an int8 PTQ pack for the serving path.

    Reads calibration frames from a recorded sequence (.npz or ROS
    .bag), applies the node's preprocessing (IMAGE_SCALE area resize,
    matching what the predictor will see at serving time), calibrates
    activation scales, quantizes the backbone, and writes the qpack
    (models/quant.py).  Serve it by setting
    ``VISION_SEM_SEG.SEM_SEG_NETWORK.MODEL.QPACK`` to the output path.
    """
    import numpy as np

    from .inference.predictor import SemanticSegmentation
    from .models.quant import save_qpack
    from .ops.resize import resize_area

    import jax.numpy as jnp

    cfg = _load_app_cfg(args.cfg)
    src = args.calib
    if src.endswith(".bag"):
        from .runtime.bag_adapter import bag_to_frames

        frames = bag_to_frames(src)
    else:
        from .runtime.io import load_frames

        frames = load_frames(src)
    step = max(1, len(frames) // max(1, args.frames))
    images = [f.semantic_image for f in frames[::step][: args.frames]]

    scale = float(cfg.VISION_SEM_SEG.IMAGE_SCALE)
    if scale < 1.0:
        images = [
            np.asarray(
                resize_area(
                    jnp.asarray(img),
                    (int(img.shape[0] * scale), int(img.shape[1] * scale)),
                )
            ).astype(np.uint8)
            for img in images
        ]

    predictor = SemanticSegmentation(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK)
    predictor.quantize(images)
    save_qpack(predictor.qpack, args.out)
    print(f"wrote {args.out} ({len(images)} calibration frames)")


def cmd_autotune_serving(args):
    """Serving operating-point Pareto (runtime/serving_pareto.py): every
    backbone x OUTPUT_STRIDE x IMAGE_SCALE x UPSAMPLE_PRED point timed
    through the fused production runner on-device, then (unless
    --no-quality) scored for golden-scene map mIoU with a per-point
    trained network.  Writes the recommended point as a YAML overlay and
    (with --json) the full sweep."""
    import os.path as osp

    from .runtime.serving_pareto import (
        SceneArtifacts,
        default_points,
        pareto,
        score_quality,
        serving_overlay_yaml,
        sweep_fps,
        write_json,
    )

    cfg = _load_app_cfg(args.cfg)
    kwargs = {}
    if args.backbones:
        kwargs["backbones"] = [b for b in args.backbones.split(",") if b]
    if args.strides:
        kwargs["strides"] = [int(v) for v in args.strides.split(",") if v]
    if args.scales:
        kwargs["scales"] = [float(v) for v in args.scales.split(",") if v]
    if args.upsample != "both":
        kwargs["upsample"] = (args.upsample == "on",)
    points = default_points(**kwargs)
    print(f"serving sweep: {len(points)} operating points")

    fps_rows = sweep_fps(
        cfg, points,
        image_hw=(args.height, args.width),
        window=args.window, n_windows=args.windows, repeats=args.repeats,
        camera=args.camera, log=print,
    )
    quality_rows = []
    if not args.no_quality:
        scene_dir = args.scene_dir or osp.join(
            osp.dirname(osp.abspath(args.out)) or ".", "serving_scene"
        )
        scene = SceneArtifacts(scene_dir, log=print)
        for point in points:
            try:
                quality_rows.append(score_quality(
                    scene, point, cfg=cfg,
                    train_steps=args.train_steps,
                    train_batch=args.train_batch or None,
                    log=print,
                ))
            except Exception as exc:  # one OOM point must not kill the sweep
                print(f"quality point {point} failed: {exc!r} (skipping)")
    result = pareto(fps_rows, quality_rows, quality_budget=args.budget)
    if result["recommended"] is not None:
        r = result["recommended"]
        print(
            f"recommended: {r['backbone']} os{r['output_stride']} "
            f"scale={r['image_scale']} upsample={r['upsample_pred']} -> "
            f"{r['fps']} fps at miou {r.get('miou')} "
            f"(anchor {result['anchor_miou']})"
        )
        with open(args.out, "w") as f:
            f.write(serving_overlay_yaml(r, result))
        print(f"wrote {args.out}")
    elif fps_rows and args.no_quality:
        fastest = max(fps_rows, key=lambda x: x["fps"])
        print(
            "fps-only sweep (no quality scores): fastest point "
            f"{fastest['backbone']} os{fastest['output_stride']} "
            f"scale={fastest['image_scale']} upsample={fastest['upsample_pred']} "
            f"-> {fastest['fps']} fps; NOT writing an overlay without a "
            "quality budget check"
        )
    if args.json:
        print(f"wrote {write_json(result, args.json)}")
    return result


def cmd_autotune(args):
    """Measure the grid-update backend combinations at THIS config's
    shapes on THIS device and write a YAML overlay selecting the winner.

    The right SORT_METHOD/FOLD_METHOD/UPDATE_WINDOW depend on grid size
    vs points per frame and only compose-level timing decides
    (runtime/tuning.py); the overlay merges on top of the experiment
    config:  `autotune --cfg exp.yaml --out tuned.yaml`, then run with
    `--cfg exp.yaml --cfg tuned.yaml` (repeated --cfg merges in order).
    """
    from .runtime.tuning import tune, write_overlay

    if args.serving:
        return cmd_autotune_serving(args)
    cfg = _load_app_cfg(args.cfg)
    update_windows = (
        [int(v) for v in args.update_windows.split(",") if v != ""]
        if args.update_windows else None
    )
    combos = None
    if args.folds or args.sorts:
        folds = (args.folds or "matmul,scatter").split(",")
        sorts = (args.sorts or "bitonic,radix").split(",")
        combos = [(f, s) for f in folds for s in sorts]
    result = tune(
        cfg,
        image_hw=(args.height, args.width),
        window=args.window,
        n_windows=args.windows,
        repeats=args.repeats,
        combos=combos,
        update_windows=update_windows,
        camera=args.camera,
        distortion=args.distortion,
        log=print,
    )
    best = result["best"]
    print(
        f"best: fold={best['fold']} sort={best['sort']} "
        f"update_window={best['update_window']} -> {best['fps']} fps "
        f"on {result['device_kind']}"
    )
    print(f"wrote {write_overlay(result, args.out)}")
    return result


def cmd_profile(args):
    """Stage-level timing of the fused pipeline at this config's shapes
    on this device: NULL-corrected forward / fusion / e2e ms per frame
    plus throughput (runtime/profiling.py).  The framework counterpart
    of the reference's model_timer (ref core/utils/benchmark.py:17-25)."""
    import json

    from .runtime.profiling import format_report, profile_stages

    cfg = _load_app_cfg(args.cfg)
    result = profile_stages(
        cfg,
        image_hw=(args.height, args.width),
        window=args.window,
        n_windows=args.windows,
        repeats=args.repeats,
        camera=args.camera,
        distortion=args.distortion,
        confidence_weighting=args.confidence,
        log=print,
    )
    print(format_report(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {args.json}")
    return result


def cmd_video(args):
    from .config import get_demo_cfg_defaults, resolve_output_dir

    cfg = get_demo_cfg_defaults()
    if args.cfg:
        cfg.merge_from_file(args.cfg)
    from .runtime.video import generate_video

    output_dir = resolve_output_dir(cfg.OUTPUT_DIR)
    generate_video(cfg, args.video, output_dir, output_name=cfg.OUTPUT_NAME)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="vision_semantic_segmentation_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("replay", help="offline deterministic mapping replay")
    p.add_argument("--cfg", action="append", default=[], metavar="FILE",
                   help="experiment YAML; repeat to merge overlays in order "
                        "(e.g. --cfg exp.yaml --cfg tuned.yaml)")
    p.add_argument("--input-dir", default="")
    p.add_argument(
        "--frame-parallel", action="store_true",
        help="fuse frames data-parallel across all devices (one psum)",
    )
    p.add_argument(
        "--resume-grid", default="", metavar="NPZ",
        help="seed the evidence grid from a checkpoint (threads ONE grid "
             "through all input files -> a single combined map)",
    )
    p.add_argument(
        "--save-grid", default="", metavar="NPZ",
        help="checkpoint the evidence grid after the last input file",
    )
    p.set_defaults(fn=cmd_replay)

    p = sub.add_parser("pipeline", help="run seg+mapping nodes over a recorded bag")
    p.add_argument("--cfg", action="append", default=[], metavar="FILE",
                   help="experiment YAML; repeat to merge overlays in order "
                        "(e.g. --cfg exp.yaml --cfg tuned.yaml)")
    p.add_argument("--bag", required=True, help=".npz sequence or ROS .bag file")
    p.add_argument(
        "--fused", action="store_true",
        help="single-dispatch production pipeline (windowed, HBM grid); "
        "with --rate: one FusedOnlineNode instead of the two-node "
        "topology (one dispatch/frame — sustains a full-rate 12 Hz "
        "camera with zero drops on the v5e)",
    )
    p.add_argument(
        "--rate", type=float, default=0.0, metavar="R",
        help="online mode: play the bag at R x real time through "
        "concurrently-executing nodes; overload drops frames (reported)",
    )
    p.add_argument(
        "--confidence", action="store_true",
        help="with --fused: weight each point's Bayesian evidence by the "
        "network's softmax confidence at its pixel",
    )
    p.add_argument(
        "--decode-ahead", action="store_true", dest="decode_ahead",
        help="with --rate: decode the bag (JPEG, PointCloud2) on a worker "
        "thread overlapping node compute instead of on the pacing thread "
        "(the production feed for compressed bags on a small host)",
    )
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("train", help="train the segmentation network")
    p.add_argument("--cfg", default="", metavar="FILE")
    p.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="score generated maps against ground truth")
    p.add_argument("--maps", default="./global_maps")
    p.add_argument("--gt", default="./ground_truth")
    p.add_argument("--latex", action="store_true")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("convert", help="convert a torch .pth checkpoint to .npz")
    p.add_argument("pth")
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser(
        "export", help="convert a recorded input (.hkl/.pkl/.bag) to .npz"
    )
    p.add_argument("input")
    p.add_argument("--out", default=None)
    p.add_argument("--image-topic", default="/camera1/image_raw")
    p.add_argument("--pcd-topic", default="/reduced_map")
    p.add_argument("--pose-topic", default="/current_pose")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "compile", help="AOT-export the fused pipeline to a serving artifact"
    )
    p.add_argument("--cfg", action="append", default=[], metavar="FILE",
                   help="experiment YAML; repeat to merge overlays in order "
                        "(e.g. --cfg exp.yaml --cfg tuned.yaml)")
    p.add_argument("--out", default="runner.vsstexp")
    p.add_argument("--camera", default="camera1")
    p.add_argument("--height", type=int, default=1440)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--window", type=int, default=16)
    p.set_defaults(fn=cmd_compile)

    p = sub.add_parser(
        "quantize", help="calibrate + export an int8 PTQ pack (serving)"
    )
    p.add_argument("--cfg", action="append", default=[], metavar="FILE",
                   help="experiment YAML; repeat to merge overlays in order "
                        "(e.g. --cfg exp.yaml --cfg tuned.yaml)")
    p.add_argument("--calib", required=True,
                   help="recorded sequence (.npz or .bag) to calibrate on")
    p.add_argument("--frames", type=int, default=8,
                   help="number of calibration frames sampled from it")
    p.add_argument("--out", default="qpack.npz")
    p.set_defaults(fn=cmd_quantize)

    p = sub.add_parser(
        "autotune",
        help="measure grid-update backends at this config's shapes; "
        "write a YAML overlay selecting the winner",
    )
    p.add_argument("--cfg", action="append", default=[], metavar="FILE",
                   help="experiment YAML; repeat to merge overlays in order "
                        "(e.g. --cfg exp.yaml --cfg tuned.yaml)")
    p.add_argument("--out", default="tuned.yaml")
    p.add_argument("--camera", default="camera1")
    p.add_argument("--height", type=int, default=1440)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--window", type=int, default=16,
                   help="frames fused per device dispatch while timing "
                        "(>= 16 keeps per-dispatch overhead amortized)")
    p.add_argument("--windows", type=int, default=2,
                   help="distinct timed windows (fresh data each)")
    p.add_argument("--repeats", type=int, default=3, help="best-of repeats")
    p.add_argument("--update-windows", default="",
                   help="comma list of UPDATE_WINDOW cell sizes to sweep "
                   "(0 = dense); default keeps the config's value")
    p.add_argument("--folds", default="", help="comma list: matmul,scatter")
    p.add_argument("--sorts", default="", help="comma list: bitonic,radix")
    p.add_argument("--distortion", default="auto",
                   choices=["auto", "none", "points"])
    p.add_argument(
        "--serving", action="store_true",
        help="sweep serving OPERATING POINTS instead of grid-update "
        "backends: backbone x OUTPUT_STRIDE x IMAGE_SCALE x UPSAMPLE_PRED, "
        "each timed through the fused runner AND scored for golden-scene "
        "map mIoU; writes the Pareto frontier + a recommended overlay")
    p.add_argument("--backbones", default="",
                   help="[serving] comma list (default resnext50_32x4d,resnet50)")
    p.add_argument("--strides", default="",
                   help="[serving] comma list of OUTPUT_STRIDE (default 8,16)")
    p.add_argument("--scales", default="",
                   help="[serving] comma list of IMAGE_SCALE (default 1.0,0.5,0.355)")
    p.add_argument("--upsample", default="both", choices=["both", "on", "off"],
                   help="[serving] UPSAMPLE_PRED values to sweep")
    p.add_argument("--no-quality", action="store_true",
                   help="[serving] fps sweep only (skip golden-scene training/scoring)")
    p.add_argument("--scene-dir", default="",
                   help="[serving] directory for golden-scene artifacts "
                   "(reused across runs; default <out dir>/serving_scene)")
    p.add_argument("--train-steps", type=int, default=400,
                   help="[serving] max segmenter train steps per point "
                   "(the held-out generalization gate usually stops well "
                   "before the cap at small scales)")
    p.add_argument("--train-batch", type=int, default=0,
                   help="[serving] segmenter train mini-batch (0 = all 8 frames)")
    p.add_argument("--budget", type=float, default=0.95,
                   help="[serving] recommended point must keep this fraction "
                   "of the headline point's golden mIoU")
    p.add_argument("--json", default="",
                   help="[serving] also dump the full sweep as JSON")
    p.set_defaults(fn=cmd_autotune)

    p = sub.add_parser(
        "profile",
        help="stage-level timing (forward/fusion/e2e) of the fused "
        "pipeline at this config's shapes on this device",
    )
    p.add_argument("--cfg", action="append", default=[], metavar="FILE",
                   help="experiment YAML; repeat to merge overlays in order")
    p.add_argument("--camera", default="camera1")
    p.add_argument("--height", type=int, default=1440)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--window", type=int, default=16,
                   help="frames fused per device dispatch while timing "
                        "(>= 16 keeps per-dispatch overhead amortized)")
    p.add_argument("--windows", type=int, default=2,
                   help="distinct timed windows (fresh data each)")
    p.add_argument("--repeats", type=int, default=3, help="best-of repeats")
    p.add_argument("--distortion", default="auto",
                   choices=["auto", "none", "points"])
    p.add_argument("--confidence", action="store_true",
                   help="profile the confidence-weighted fusion path")
    p.add_argument("--json", default="", metavar="FILE",
                   help="also write the result dict as JSON")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("video", help="segmentation overlay video demo")
    p.add_argument("--cfg", default="", metavar="FILE")
    p.add_argument("--video", required=True)
    p.set_defaults(fn=cmd_video)

    args = parser.parse_args(argv)
    _enable_compile_cache()
    return args.fn(args)


def _enable_compile_cache():
    """Point JAX at the persistent compilation cache before any command
    compiles.  Device-heavy subcommands (autotune --serving alone compiles
    ~24 fused-runner programs) would otherwise pay the nondeterministic
    compile service (measured 20 s-19 min per program) again on every
    invocation.  Honors an explicit JAX_COMPILATION_CACHE_DIR; defaults to
    the cache bench.py/warm_cache.py already share."""
    import os

    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/tmp/vss_tpu_jax_cache"
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # CPU-only / stripped installs still get the CLI
        pass


if __name__ == "__main__":
    main()
