"""Online 12 Hz with the tunnel out of the loop (VERDICT r03 #3).

The reference's operating claim: a 12 Hz camera maps with zero drops at
0.1x replay on a CUDA workstation (ref README.md:190-196, node:236).
r03 measured 9/24 drops at 0.1x here and ATTRIBUTED them to the dev
tunnel's ~1-20 MB/s host->device link by arithmetic (8.3 MB frame
uploads vs a 50-55 ms compute budget).  This probe turns that argument
into a measurement by removing the transport, not the framework:

  * 24 DISTINCT camera-resolution frames + clouds + poses are PRE-STAGED
    in HBM (a device-resident camera, standing in for the DMA feed a
    production host provides);
  * the node topology stays REAL: a segmentation executor and a mapping
    executor (runtime/async_bus.py NodeExecutor — per-node worker
    threads, keep-latest depth-1 camera mailbox, counted drops), chained
    through the TopicBus exactly like run_online;
  * the per-node device programs are the SAME math the nodes run
    (segmentation prologue from FusedFramePipeline._build_segmentation,
    projection/gather/update from the engine's builders), AOT-compiled;
    frames are addressed by index, so the only per-frame host<->device
    traffic is the dispatch and a 4-byte completion readback;
  * a publisher paces camera messages at the bag timeline rate (12 Hz at
    1.0x) for a fixed horizon and the report counts drops.

Zero drops at 1.0x == the node-path COMPUTE sustains the reference's
camera rate; any drops are then honestly the pipeline's, not the link's.
One host round-trip per mapped frame (the 4-byte completion barrier)
remains — ~25-40 ms through the dev tunnel, microseconds on a production
host — so ``--scale`` also runs the sweep at a reduced IMAGE_SCALE
operating point where the budget absorbs even the tunnel RTT.

Measured (v5e via the dev tunnel): the two-node topology sustains
10.86 Hz at EVERY setting of --scale (1.0/0.5) and --barrier-every
(1/4/16) — per-frame cost is exactly the two dispatch RTTs (seg node +
map node; each execute call blocks the host for one tunnel round-trip,
measured by the dispatch-cost section below), not compute and not the
barrier.  ``--fused`` chains segmentation+mapping into ONE device
program per frame (one dispatch, one RTT) while keeping the executor/
mailbox/drop machinery — the TPU-native online operating mode when
dispatch latency, not compute, bounds the rate.

Usage: probe_online_device.py [--scale S] [--hz HZ] [--horizon SECONDS]
                              [--barrier-every K] [--fused]
Prints one JSON line.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    argv = sys.argv[1:]

    def arg(name, default, cast=float):
        return cast(argv[argv.index(name) + 1]) if name in argv else default
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vss_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from vision_semantic_segmentation_tpu.config import get_cfg_defaults
    from vision_semantic_segmentation_tpu.mapping.engine import (
        SemanticMappingEngine,
    )
    from vision_semantic_segmentation_tpu.runtime.async_bus import (
        NodeExecutor, TopicBus,
    )
    from vision_semantic_segmentation_tpu.runtime.pipeline import (
        FusedFramePipeline,
    )
    from vision_semantic_segmentation_tpu.runtime.tuning import (
        generate_windows, init_variables,
    )

    hz = arg("--hz", 12.0)
    fused = "--fused" in argv
    n_frames = 24
    horizon_s = arg("--horizon", 8.0)  # ~96 camera messages at 12 Hz
    image_scale = arg("--scale", 1.0)
    barrier_every = arg("--barrier-every", 1, int)
    image_hw = (1440, 1920)

    cfg = get_cfg_defaults()
    cfg.MAPPING.POINT_BUCKET = 2 ** 16
    cfg.VISION_SEM_SEG.UNDISTORT = True  # production path (points mode)
    cfg.VISION_SEM_SEG.IMAGE_SCALE = image_scale

    print("building device-resident frames + AOT node programs...",
          flush=True)
    variables = init_variables(cfg.VISION_SEM_SEG.SEM_SEG_NETWORK)
    engine = SemanticMappingEngine(cfg)
    pipeline = FusedFramePipeline(
        cfg, variables, engine=engine, distortion="points"
    )

    # device-resident camera: distinct frames pre-staged in HBM
    windows = generate_windows(cfg, image_hw, window=n_frames, n_windows=1)
    frames_dev = windows[0]

    # -- segmentation node program: frame index -> channel image (device) --
    seg_prologue = pipeline._build_segmentation("camera1", image_hw)
    table = np.asarray(pipeline.channel_table)

    def seg_program(variables, images, i):
        logits = seg_prologue(variables, images[i])
        net = jnp.argmax(logits, axis=-1)[0].astype(jnp.int32)
        return jnp.asarray(table)[jnp.clip(net, 0, table.shape[0] - 1)]

    # -- mapping node program: channel image + frame index -> grid update --
    pointwise = engine._build_pointwise(
        "camera1", False, image_is_class_id=True, image_full_hw=image_hw,
        distorted_image=True,
    )
    update = engine._build_update()

    def map_program(grid, channel_img, pcds, valids, positions, quats, i):
        cell, cls, vis, upd, _ = pointwise(
            pcds[i], valids[i], channel_img, positions[i], quats[i]
        )
        return update(grid, cell, cls, pcds[i][3], upd)

    # -- fused node program: frame index -> grid update (ONE dispatch) -----
    def fused_program(variables, grid, images, pcds, valids, positions,
                      quats, i):
        ch = seg_program(variables, images, i)
        cell, cls, vis, upd, _ = pointwise(
            pcds[i], valids[i], ch, positions[i], quats[i]
        )
        return update(grid, cell, cls, pcds[i][3], upd)

    sd = jax.ShapeDtypeStruct
    spec = engine.grid_spec
    grid_sd = sd((spec.num_classes, spec.height, spec.width), jnp.float32)
    var_sd = jax.tree.map(lambda a: sd(a.shape, a.dtype), pipeline.variables)
    frame_sds = (
        sd(frames_dev["image"].shape, jnp.uint8),
        sd(frames_dev["pcd"].shape, frames_dev["pcd"].dtype),
        sd(frames_dev["valid"].shape, frames_dev["valid"].dtype),
        sd(frames_dev["position"].shape, jnp.float32),
        sd(frames_dev["quaternion"].shape, jnp.float32),
    )
    ch_hw = jax.eval_shape(
        lambda v, x: seg_program(v, x, jnp.int32(0)),
        pipeline.variables, frames_dev["image"],
    )

    t0 = time.perf_counter()
    if fused:
        fused_aot = (
            jax.jit(fused_program, donate_argnums=(1,))
            .lower(var_sd, grid_sd, *frame_sds, sd((), jnp.int32))
            .compile()
        )
    else:
        seg_aot = (
            jax.jit(seg_program)
            .lower(var_sd, frame_sds[0], sd((), jnp.int32))
            .compile()
        )
        map_aot = (
            jax.jit(map_program, donate_argnums=(0,))
            .lower(grid_sd, sd(ch_hw.shape, ch_hw.dtype), *frame_sds[1:],
                   sd((), jnp.int32))
            .compile()
        )

    # warm (first execution can stall through the tunnel)
    grid0 = pipeline.init_grid()
    if fused:
        grid0 = fused_aot(
            pipeline.variables, grid0, frames_dev["image"],
            frames_dev["pcd"], frames_dev["valid"],
            frames_dev["position"], frames_dev["quaternion"], jnp.int32(0),
        )
    else:
        ch = seg_aot(pipeline.variables, frames_dev["image"], jnp.int32(0))
        grid0 = map_aot(
            grid0, ch, frames_dev["pcd"], frames_dev["valid"],
            frames_dev["position"], frames_dev["quaternion"], jnp.int32(0),
        )
    float(jnp.sum(grid0[:2, :2]))
    warmup_s = time.perf_counter() - t0

    # -- measure the per-dispatch HOST cost (the tunnel's enqueue RTT) ------
    # jax dispatch is asynchronous, but through the dev tunnel each execute
    # call still blocks the host for one RPC round-trip.  Timing N
    # back-to-back dispatches with a single trailing readback separates
    # "host time to enqueue" from device compute; on a production host this
    # is microseconds and the numbers below collapse to ~0.
    reps = 12
    dispatch = {}
    g = grid0
    if fused:
        t0 = time.perf_counter()
        for k in range(reps):
            g = fused_aot(
                pipeline.variables, g, frames_dev["image"],
                frames_dev["pcd"], frames_dev["valid"],
                frames_dev["position"], frames_dev["quaternion"],
                jnp.int32(k % n_frames),
            )
        dispatch["fused_dispatch_ms"] = round(
            (time.perf_counter() - t0) / reps * 1e3, 1)
    else:
        t0 = time.perf_counter()
        for k in range(reps):
            ch = seg_aot(pipeline.variables, frames_dev["image"],
                         jnp.int32(k % n_frames))
        dispatch["seg_dispatch_ms"] = round(
            (time.perf_counter() - t0) / reps * 1e3, 1)
        t0 = time.perf_counter()
        for k in range(reps):
            g = map_aot(
                g, ch, frames_dev["pcd"], frames_dev["valid"],
                frames_dev["position"], frames_dev["quaternion"],
                jnp.int32(k % n_frames),
            )
        dispatch["map_dispatch_ms"] = round(
            (time.perf_counter() - t0) / reps * 1e3, 1)
    t0 = time.perf_counter()
    float(jnp.sum(g[:1, :1, :1]))
    drain_readback_ms = (time.perf_counter() - t0) * 1e3
    grid0 = g
    print(
        f"warmup {warmup_s:.1f}s; host dispatch cost: {dispatch} "
        f"(+{drain_readback_ms:.0f} ms drain); starting {hz} Hz playback "
        f"for {horizon_s}s", flush=True)

    # -- the two-node online topology ---------------------------------------
    bus = TopicBus()
    seg_exec = NodeExecutor("segmentation")
    map_exec = NodeExecutor("mapping")
    state = {"grid": grid0, "mapped": 0, "seg_done": 0}

    def on_camera(msg):
        i = msg.data
        ch = seg_aot(pipeline.variables, frames_dev["image"], jnp.int32(i))
        state["seg_done"] += 1
        bus.publish("/camera1/semantic_idx", (i, ch), stamp=msg.stamp)

    def on_semantic(msg):
        i, ch = msg.data
        state["grid"] = map_aot(
            state["grid"], ch, frames_dev["pcd"], frames_dev["valid"],
            frames_dev["position"], frames_dev["quaternion"], jnp.int32(i),
        )
        # 4-byte completion barrier: without it the dispatch queue would
        # buffer and the mailboxes could never overflow (false zero-drop).
        # Amortized every K frames (--barrier-every) the device queue is
        # still bounded at K frames of latency, but the node pays the
        # tunnel's ~25-40 ms readback RTT only once per K — on a
        # production host (us-scale dispatch) K is irrelevant; through
        # the dev tunnel 2 RTTs/frame alone exceed the 83 ms budget.
        state["mapped"] += 1
        if state["mapped"] % barrier_every == 0:
            float(jnp.sum(state["grid"][:1, :1, :1]))

    def on_camera_fused(msg):
        i = msg.data
        state["grid"] = fused_aot(
            pipeline.variables, state["grid"], frames_dev["image"],
            frames_dev["pcd"], frames_dev["valid"],
            frames_dev["position"], frames_dev["quaternion"], jnp.int32(i),
        )
        state["seg_done"] += 1
        state["mapped"] += 1
        if state["mapped"] % barrier_every == 0:
            float(jnp.sum(state["grid"][:1, :1, :1]))

    if fused:
        map_exec.subscribe(
            bus, "/camera1/image_idx", on_camera_fused, queue_size=1
        )
    else:
        seg_exec.subscribe(bus, "/camera1/image_idx", on_camera, queue_size=1)
        map_exec.subscribe(
            bus, "/camera1/semantic_idx", on_semantic, queue_size=1
        )

    n_msgs = int(horizon_s * hz)
    start = time.perf_counter()
    for k in range(n_msgs):
        target = start + k / hz
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        bus.publish("/camera1/image_idx", k % n_frames, stamp=k / hz)
    publish_s = time.perf_counter() - start
    if not fused:
        seg_exec.join()
    map_exec.join()
    total_s = time.perf_counter() - start
    if not fused:
        seg_exec.stop()
    map_exec.stop()

    drops = {
        **{f"seg:{t}": n for t, n in seg_exec.drops.items() if n},
        **{f"map:{t}": n for t, n in map_exec.drops.items() if n},
    }
    mapped = state["mapped"]
    result = {
        "metric": "online_device_resident_hz",
        "camera_hz": hz,
        "rate": 1.0,
        "fused": fused,
        "image_scale": image_scale,
        "barrier_every": barrier_every,
        "messages": n_msgs,
        "segmented": state["seg_done"],
        "mapped": mapped,
        "drops": drops,
        "dropped_total": int(sum(drops.values())),
        "sustained_hz": round(mapped / total_s, 2),
        "publish_wall_s": round(publish_s, 2),
        "total_wall_s": round(total_s, 2),
        "warmup_s": round(warmup_s, 1),
        **dispatch,
        "drain_readback_ms": round(drain_readback_ms, 1),
        "grid_sum": float(jnp.sum(state["grid"])),
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
