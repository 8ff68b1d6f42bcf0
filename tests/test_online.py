"""Online runtime tests: concurrent node executors, rate-driven bag
playback with drop accounting, and streaming bag decode.

The reference runs its two nodes as separate processes at the camera's
12 Hz and silently drops frames under load (needs the bag at 0.1x for
zero drops, ref README.md:190-196; empty-queue early returns, ref
mapping.py:281-284).  These tests pin the rebuilt equivalents:
NodeExecutor keep-latest mailboxes, play_bag_timed wall-clock pacing,
stream_bag_frames one-pass sync == bag_to_frames two-pass sync.
"""
import threading
import time

import numpy as np
import pytest

from test_rosbag import _make_bag
from vision_semantic_segmentation_tpu.runtime.async_bus import (
    NodeExecutor,
    play_bag_timed,
    run_online,
)
from vision_semantic_segmentation_tpu.runtime.bus import Message, TopicBus


class TestNodeExecutor:
    def test_callbacks_run_off_publisher_thread(self):
        bus = TopicBus()
        ex = NodeExecutor("t")
        seen = []
        ex.subscribe(bus, "/a", lambda m: seen.append(threading.get_ident()))
        bus.publish("/a", 1)
        assert ex.join(timeout=5.0)
        ex.stop()
        assert seen and seen[0] != threading.get_ident()

    def test_keep_latest_drops_oldest_and_counts(self):
        bus = TopicBus()
        ex = NodeExecutor("slow")
        gate = threading.Event()
        got = []

        def slow_cb(m):
            gate.wait(timeout=5.0)
            got.append(m.data)

        ex.subscribe(bus, "/img", slow_cb, queue_size=1)
        bus.publish("/img", 0)          # starts processing (blocked on gate)
        time.sleep(0.1)                 # let the worker pick it up
        for i in range(1, 6):
            bus.publish("/img", i)      # mailbox depth 1: 1..4 dropped
        gate.set()
        assert ex.join(timeout=5.0)
        ex.stop()
        assert got[0] == 0 and got[-1] == 5
        assert ex.drops["/img"] == 4
        assert ex.processed["/img"] == len(got) == 2

    def test_deep_queue_preserves_history(self):
        bus = TopicBus()
        ex = NodeExecutor("hist")
        got = []
        ex.subscribe(bus, "/pose", lambda m: got.append(m.data), queue_size=64)
        for i in range(50):
            bus.publish("/pose", i)
        assert ex.join(timeout=5.0)
        ex.stop()
        assert got == list(range(50))
        assert ex.drops["/pose"] == 0

    def test_two_executors_overlap(self):
        """Stage 1 and stage 2 really run concurrently: while stage 2
        processes frame i, stage 1 accepts frame i+1."""
        bus = TopicBus()
        s1, s2 = NodeExecutor("s1"), NodeExecutor("s2")
        active = {"s1": 0, "s2": 0}
        overlap = []
        lock = threading.Lock()

        def make_cb(name, publish_to=None):
            def cb(m):
                with lock:
                    active[name] += 1
                    overlap.append(active["s1"] and active["s2"])
                time.sleep(0.05)
                if publish_to:
                    bus.publish(publish_to, m.data)
                with lock:
                    active[name] -= 1
            return cb

        s1.subscribe(bus, "/in", make_cb("s1", "/mid"), queue_size=8)
        s2.subscribe(bus, "/mid", make_cb("s2"), queue_size=8)
        for i in range(4):
            bus.publish("/in", i)
            time.sleep(0.03)
        assert s1.join(timeout=5.0) and s2.join(timeout=5.0)
        s1.stop(); s2.stop()
        assert any(overlap), "stages never ran concurrently"


class TestTimedPlayback:
    def test_paces_to_bag_timeline(self, rng, tmp_path):
        path = tmp_path / "t.bag"
        # 3 frames at 1 s spacing -> 2 s of bag time; 20x rate -> ~0.1 s
        _make_bag(path, rng, n_frames=3)
        bus = TopicBus()
        t0 = time.monotonic()
        report = play_bag_timed(str(path), bus, rate=20.0)
        wall = time.monotonic() - t0
        assert report.published == 10  # 3x(img+pose+pcd) + tf
        assert report.bag_duration_s == pytest.approx(2.0)
        assert 0.08 <= wall < 1.0
        assert report.max_lag_s < 0.05

    def test_slow_subscriber_lags_inline_but_not_behind_executor(self, rng, tmp_path):
        path = tmp_path / "t.bag"
        _make_bag(path, rng, n_frames=3)

        # inline subscriber blocks the playback thread -> lag accumulates
        bus = TopicBus()
        bus.subscribe("/camera1/image_raw", lambda m: time.sleep(0.15))
        r_inline = play_bag_timed(str(path), bus, rate=50.0)
        assert r_inline.max_lag_s > 0.1

        # same consumer behind an executor -> timeline holds, drops appear
        bus2 = TopicBus()
        ex = NodeExecutor("slow")
        ex.subscribe(bus2, "/camera1/image_raw", lambda m: time.sleep(0.15),
                     queue_size=1)
        r_exec = play_bag_timed(str(path), bus2, rate=50.0)
        ex.join(timeout=5.0)
        ex.stop()
        assert r_exec.max_lag_s < 0.1
        assert ex.drops["/camera1/image_raw"] + ex.processed["/camera1/image_raw"] == 3


class TestRunOnline:
    def _cfg_and_predictor(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.inference.predictor import (
            SemanticSegmentation,
        )
        from vision_semantic_segmentation_tpu.models.build import build_model

        cfg = small_cfg(tmp_path)
        cfg.VISION_SEM_SEG.UNDISTORT = False  # bag frames are tiny synthetics
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        model, *_ = build_model(net_cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 12, 3)))
        predictor = SemanticSegmentation(
            net_cfg, variables=variables, compute_dtype="float32"
        )
        return cfg, predictor

    def test_online_fuses_frames_and_reports(self, rng, tmp_path):
        cfg, predictor = self._cfg_and_predictor(tmp_path)
        path = tmp_path / "drive.bag"
        _make_bag(path, rng, n_frames=4)
        report = run_online(cfg, str(path), rate=50.0, predictor=predictor,
                            finalize=False)
        assert report.published == 13
        # every seg output reached the mapping node (drops allowed on the
        # camera topic under load, but processed+dropped must cover all)
        seg_in = report.processed.get("seg:/camera1/image_raw", 0) + sum(
            n for t, n in report.drops.items() if t == "seg:/camera1/image_raw"
        )
        assert seg_in == 4
        map_in = report.processed.get("map:/camera1/semantic", 0) + sum(
            n for t, n in report.drops.items() if t == "map:/camera1/semantic"
        )
        assert map_in == report.processed.get("seg:/camera1/image_raw", 0)
        assert report.processed.get("map:/current_pose", 0) == 4

    def test_overload_drops_are_counted_not_fatal(self, rng, tmp_path):
        cfg, predictor = self._cfg_and_predictor(tmp_path)
        # wrap the predictor in an artificial 120 ms/frame cost; at 100x
        # rate the 1 s frame spacing becomes 10 ms -> most frames drop
        slow = predictor

        class SlowPredictor:
            def __init__(self, inner):
                self._inner = inner
                self.variables = inner.variables

            def segmentation(self, image, upsample_pred=False):
                time.sleep(0.12)
                return self._inner.segmentation(image, upsample_pred=upsample_pred)

        path = tmp_path / "fast.bag"
        _make_bag(path, rng, n_frames=6)
        report = run_online(cfg, str(path), rate=100.0,
                            predictor=SlowPredictor(slow), finalize=False)
        done = report.processed.get("seg:/camera1/image_raw", 0)
        dropped = report.drops.get("seg:/camera1/image_raw", 0)
        assert done + dropped == 6
        assert dropped >= 1, "overloaded seg stage should have dropped frames"
        assert report.max_lag_s < 0.1, "playback timeline must not stall"


class TestStreamTimedPlayback:
    def test_matches_bag_timed_content(self, rng, tmp_path):
        """play_stream_timed (worker-thread decode) publishes the same
        synced pcd/pose/image per frame as the inline player delivers to
        the nodes — only the decode placement differs."""
        from vision_semantic_segmentation_tpu.runtime.async_bus import (
            play_stream_timed,
        )

        path = tmp_path / "st.bag"
        _make_bag(path, rng, n_frames=4)

        def record(bus):
            got = {"img": [], "pose": [], "pcd": []}
            bus.subscribe(
                "/camera1/image_raw",
                lambda m: got["img"].append((m.stamp, m.frame_id, np.asarray(m.data))),
            )
            bus.subscribe("/current_pose", lambda m: got["pose"].append(m.data))
            bus.subscribe("/reduced_map", lambda m: got["pcd"].append(np.asarray(m.data)))
            return got

        bus_a, bus_b = TopicBus(), TopicBus()
        got_a, got_b = record(bus_a), record(bus_b)
        r_inline = play_bag_timed(str(path), bus_a, rate=100.0)
        r_stream = play_stream_timed(str(path), bus_b, rate=100.0)

        assert r_stream.published == 12  # 4 x (pcd + pose + img); no /tf
        assert r_stream.bag_duration_s == pytest.approx(3.0)
        assert len(got_b["img"]) == len(got_a["img"]) == 4
        for (sa, fa, ia), (sb, fb, ib) in zip(got_a["img"], got_b["img"]):
            assert sa == sb and fa == fb
            np.testing.assert_array_equal(ia, ib)
        for pa, pb in zip(got_a["pose"], got_b["pose"]):
            np.testing.assert_array_equal(pa[0], pb[0])
            np.testing.assert_array_equal(pa[1], pb[1])
        for ca, cb in zip(got_a["pcd"], got_b["pcd"]):
            np.testing.assert_array_equal(ca, cb)

    def test_run_online_decode_ahead(self, rng, tmp_path):
        """run_online(decode_ahead=True): same topology, same accounting,
        decode on the worker — every frame reaches the nodes."""
        cfg, predictor = TestRunOnline()._cfg_and_predictor(tmp_path)
        path = tmp_path / "da.bag"
        _make_bag(path, rng, n_frames=4)
        report = run_online(
            cfg, str(path), rate=50.0, predictor=predictor,
            finalize=False, decode_ahead=True,
        )
        # 4 x (pcd + pose + img) + the bag's /tf message (decode-ahead
        # surfaces /tf since the dual-camera/TF coverage fix)
        assert report.published == 13
        assert report.processed.get("map:/tf", 0) == 1
        seg_in = report.processed.get("seg:/camera1/image_raw", 0) + \
            report.drops.get("seg:/camera1/image_raw", 0)
        assert seg_in == 4
        assert report.processed.get("map:/current_pose", 0) == 4
        assert report.max_lag_s < 0.5


class TestStreamBagFrames:
    def test_matches_two_pass_sync(self, rng, tmp_path):
        from vision_semantic_segmentation_tpu.runtime.bag_adapter import (
            bag_to_frames,
            stream_bag_frames,
        )

        path = tmp_path / "s.bag"
        _make_bag(path, rng, n_frames=5)
        want = bag_to_frames(str(path))
        got = list(stream_bag_frames(str(path)))
        assert len(got) == len(want) == 5
        for a, b in zip(got, want):
            assert a.stamp == b.stamp and a.camera == b.camera
            np.testing.assert_array_equal(a.semantic_image, b.semantic_image)
            np.testing.assert_array_equal(a.pcd, b.pcd)
            np.testing.assert_array_equal(a.position, b.position)
            np.testing.assert_array_equal(a.quaternion, b.quaternion)

    def test_decode_happens_on_worker_thread(self, rng, tmp_path):
        """The first frame is available while later records are still
        undecoded (bounded-queue streaming, not a full materialize)."""
        from vision_semantic_segmentation_tpu.runtime.bag_adapter import (
            stream_bag_frames,
        )

        path = tmp_path / "s.bag"
        _make_bag(path, rng, n_frames=40)
        it = stream_bag_frames(str(path), max_buffered=2)
        first = next(it)
        assert first.stamp == pytest.approx(10.0)
        rest = list(it)
        assert len(rest) == 39

    def test_abandoned_consumer_reaps_decoder_thread(self, rng, tmp_path):
        """Closing the generator early must unblock + reap the decoder.

        Regression: the worker blocked forever in ``out.put`` on the full
        bounded queue when the consumer broke out mid-replay, leaking a
        thread plus ``max_buffered`` decoded frames per abandoned stream.
        """
        import threading
        import time as _time

        from vision_semantic_segmentation_tpu.runtime.bag_adapter import (
            stream_bag_frames,
        )

        path = tmp_path / "s.bag"
        _make_bag(path, rng, n_frames=40)
        it = stream_bag_frames(str(path), max_buffered=2)
        next(it)
        # let the worker fill the bounded queue and block in put()
        deadline = _time.time() + 5.0
        while (
            not any(t.name == "bag-decoder" for t in threading.enumerate())
            and _time.time() < deadline
        ):
            _time.sleep(0.01)
        it.close()  # GeneratorExit inside the consumer loop
        deadline = _time.time() + 5.0
        while _time.time() < deadline and any(
            t.name == "bag-decoder" for t in threading.enumerate()
        ):
            _time.sleep(0.05)
        assert not any(
            t.name == "bag-decoder" for t in threading.enumerate()
        ), "decoder thread still alive after the consumer closed"

    def _make_dualcam_bag(self, path, rng, n_frames=3):
        """camera1 + camera6 images per stamp, plus one /tf record."""
        from test_rosbag import _pc2
        from vision_semantic_segmentation_tpu.runtime.rosbag import (
            Header,
            ImageMsg,
            PoseStampedMsg,
            TFMessageMsg,
            TransformStampedMsg,
            write_bag,
        )

        msgs = [(
            "/tf",
            TFMessageMsg([
                TransformStampedMsg(
                    Header(0, 10.0, "/base_link"), "/camera6",
                    np.array([0.5, -0.2, 1.4]),
                    np.array([0.0, 0.0, 0.0, 1.0]),
                )
            ]),
            10.0,
        )]
        pts = rng.random((4, 40)).astype(np.float32)
        for i in range(n_frames):
            stamp = 10.0 + i
            msgs.append(("/reduced_map", _pc2(stamp, "/world", pts), stamp))
            msgs.append((
                "/current_pose",
                PoseStampedMsg(
                    Header(i, stamp, "/world"),
                    np.array([1.0 * i, 2.0, 0.0]),
                    np.array([0.0, 0.0, 0.0, 1.0]),
                ),
                stamp,
            ))
            for cam in ("camera1", "camera6"):
                img = (rng.random((8, 12, 3)) * 255).astype(np.uint8)
                msgs.append((
                    f"/{cam}/image_raw",
                    ImageMsg(Header(i, stamp, cam), 8, 12, "rgb8", img),
                    stamp,
                ))
        write_bag(str(path), msgs)

    def test_dual_camera_and_tf_stream(self, rng, tmp_path):
        """image_topics= streams BOTH cameras through one pass (each
        FrameRecord tagged with its camera) and with_tf surfaces the /tf
        record — the decode-ahead feed must not silently drop camera6 or
        dynamic extrinsics (dual-camera coverage, ref mapping.py:528-541)."""
        from vision_semantic_segmentation_tpu.runtime.bag_adapter import (
            TFRecord,
            stream_bag_frames,
        )

        path = tmp_path / "dual.bag"
        self._make_dualcam_bag(path, rng, n_frames=3)
        got = list(stream_bag_frames(
            str(path),
            image_topics=["/camera1/image_raw", "/camera6/image_raw"],
            with_tf=True,
        ))
        tfs = [g for g in got if isinstance(g, TFRecord)]
        frames = [g for g in got if not isinstance(g, TFRecord)]
        assert len(tfs) == 1
        assert tfs[0].msg.transforms[0].child_frame_id == "/camera6"
        assert [f.camera for f in frames].count("camera1") == 3
        assert [f.camera for f in frames].count("camera6") == 3
        # single-topic default is unchanged (camera1 only, no TF)
        solo = list(stream_bag_frames(str(path)))
        assert len(solo) == 3 and all(f.camera == "camera1" for f in solo)

    def test_play_stream_timed_dual_camera_topics_and_tf_tree(
        self, rng, tmp_path
    ):
        """The timed streamed player publishes each camera on its own
        topic, applies /tf to the tree, republishes it on the bus, and
        publishes each distinct cloud once (not once per paired frame)."""
        from vision_semantic_segmentation_tpu.runtime.async_bus import (
            play_stream_timed,
        )
        from vision_semantic_segmentation_tpu.utils.ros_compat import (
            TransformTree,
        )

        path = tmp_path / "dual.bag"
        self._make_dualcam_bag(path, rng, n_frames=3)
        bus = TopicBus()
        got = {"cam1": [], "cam6": [], "tf": [], "pcd": []}
        bus.subscribe("/camera1/image_raw", lambda m: got["cam1"].append(m.frame_id))
        bus.subscribe("/camera6/image_raw", lambda m: got["cam6"].append(m.frame_id))
        bus.subscribe("/tf", lambda m: got["tf"].append(m.data))
        bus.subscribe("/reduced_map", lambda m: got["pcd"].append(m.data))
        tree = TransformTree()
        play_stream_timed(
            str(path), bus, rate=100.0,
            image_topics=["/camera1/image_raw", "/camera6/image_raw"],
            tf_tree=tree,
        )
        assert got["cam1"] == ["camera1"] * 3
        assert got["cam6"] == ["camera6"] * 3
        assert len(got["tf"]) == 1
        assert tree.lookup("base_link", "camera6") is not None
        # 3 identical cloud objects in the bag -> streamed pairing reuses
        # one decoded cloud per stamp; each DISTINCT array publishes once
        assert 1 <= len(got["pcd"]) <= 3


class TestOnlineCLI:
    def test_pipeline_rate_flag(self, rng, tmp_path):
        """`pipeline --rate R`: the online mode end-to-end through the CLI
        (bag timeline playback, concurrent nodes, drop report printed)."""
        import jax
        import jax.numpy as jnp

        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.models import build_model
        from vision_semantic_segmentation_tpu.models.convert import save_npz

        cfg = small_cfg(tmp_path)
        cfg.VISION_SEM_SEG.UNDISTORT = False
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        net_cfg.MODEL.COMPUTE_DTYPE = "float32"
        model, *_ = build_model(net_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 12, 3), jnp.float32)
        )
        weight = str(tmp_path / "w.npz")
        save_npz(variables, weight)
        net_cfg.MODEL.WEIGHT = weight

        bag = tmp_path / "cli.bag"
        _make_bag(bag, rng, n_frames=3)
        cfg_path = str(tmp_path / "online.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())

        report = main([
            "pipeline", "--cfg", cfg_path, "--bag", str(bag), "--rate", "30",
        ])
        assert report.published == 10
        assert report.processed.get("map:/current_pose", 0) == 3


class TestExecutorResilience:
    def test_callback_exception_does_not_kill_worker(self):
        """A bad message is counted in .errors and the pipeline continues
        (ROS logs callback exceptions and carries on)."""
        bus = TopicBus()
        ex = NodeExecutor("flaky")
        got = []

        def cb(m):
            if m.data == "boom":
                raise RuntimeError("bad message")
            got.append(m.data)

        ex.subscribe(bus, "/t", cb, queue_size=8)
        bus.publish("/t", 1)
        bus.publish("/t", "boom")
        bus.publish("/t", 2)
        assert ex.join(timeout=5.0)
        ex.stop()
        assert got == [1, 2]
        assert ex.errors["/t"] == 1
        assert ex.processed["/t"] == 2


class TestRunOnlineFused:
    """The fused online topology: ONE FusedOnlineNode, one device dispatch
    per frame (segmentation+projection+update in a single XLA program).
    Measured on the v5e (scripts/probe_online_device.py): sustains a full
    12 Hz camera with zero drops at 1.0x playback."""

    def _cfg_and_pipeline(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.models.build import build_model
        from vision_semantic_segmentation_tpu.runtime.pipeline import (
            FusedFramePipeline,
        )

        cfg = small_cfg(tmp_path)
        cfg.VISION_SEM_SEG.UNDISTORT = False  # bag frames are tiny synthetics
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        model, *_ = build_model(net_cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 12, 3)))
        pipeline = FusedFramePipeline(
            cfg, variables, distortion="none", compute_dtype=jnp.float32
        )
        return cfg, pipeline

    def test_fused_topology_fuses_all_frames(self, rng, tmp_path):
        cfg, pipeline = self._cfg_and_pipeline(tmp_path)
        path = tmp_path / "drive.bag"
        _make_bag(path, rng, n_frames=4)
        report = run_online(
            cfg, str(path), rate=20.0, fused=True, pipeline=pipeline,
            finalize=False,
        )
        done = report.processed.get("fused:/camera1/image_raw", 0)
        dropped = report.drops.get("fused:/camera1/image_raw", 0)
        assert done + dropped == 4
        assert done >= 1
        # single-node topology: no seg-stage topics in the report
        assert not any(k.startswith("seg:") for k in report.processed)
        assert report.processed.get("fused:/current_pose", 0) == 4

    def test_fused_node_matches_direct_pipeline_steps(self, rng, tmp_path):
        """Inline (executor-less) FusedOnlineNode over bus messages ==
        chaining FusedFramePipeline.step directly: the online wrapper adds
        sync/bookkeeping, never math."""
        import numpy as np

        from vision_semantic_segmentation_tpu.mapping.engine import pad_points
        from vision_semantic_segmentation_tpu.runtime.node import (
            FusedOnlineNode,
        )

        cfg, pipeline = self._cfg_and_pipeline(tmp_path)
        bus = TopicBus()
        node = FusedOnlineNode(cfg, bus, pipeline=pipeline)
        assert node.pcd_topic == "/reduced_map"

        frames = []
        pts = (rng.random((4, 30)).astype(np.float32)
               * np.array([[40], [40], [2], [20]], np.float32)
               + np.array([[100], [140], [-1], [0]], np.float32))
        for i in range(3):
            stamp = 5.0 + i
            img = (rng.random((8, 12, 3)) * 255).astype(np.uint8)
            pos = np.array([120.0 + i, 160.0, 0.0])
            quat = np.array([0.0, 0.0, 0.0, 1.0])
            frames.append((stamp, img, pos, quat))
            bus.publish("/reduced_map", pts, stamp=stamp, frame_id="world")
            bus.publish("/current_pose", (pos, quat), stamp=stamp)
            bus.publish("/camera1/image_raw", img, stamp=stamp,
                        frame_id="camera1")
        assert node.fused_frames == 3 and node.dropped_frames == 0

        grid = pipeline.init_grid()
        pcd_pad, valid = pad_points(pts, node.engine.point_bucket)
        for stamp, img, pos, quat in frames:
            grid, _ = pipeline.step(
                grid, img, pcd_pad, valid, pos, quat,
                camera="camera1", pcd_frame_id="world",
            )
        np.testing.assert_array_equal(np.asarray(node.grid), np.asarray(grid))

    def test_fused_node_rejects_planar_depth(self, tmp_path):
        from vision_semantic_segmentation_tpu.runtime.node import (
            FusedOnlineNode,
        )

        cfg, pipeline = self._cfg_and_pipeline(tmp_path)
        cfg.MAPPING.DEPTH_METHOD = "planar"
        with pytest.raises(ValueError, match="planar"):
            FusedOnlineNode(cfg, TopicBus(), pipeline=pipeline)

    def test_pipeline_rate_fused_cli(self, rng, tmp_path):
        """`pipeline --rate R --fused`: the fused online mode through the
        CLI (the offline `--fused` windowed path keeps its meaning when
        --rate is absent)."""
        import jax
        import jax.numpy as jnp

        from test_runtime import small_cfg
        from vision_semantic_segmentation_tpu.__main__ import main
        from vision_semantic_segmentation_tpu.models import build_model
        from vision_semantic_segmentation_tpu.models.convert import save_npz

        cfg = small_cfg(tmp_path)
        cfg.VISION_SEM_SEG.UNDISTORT = False
        net_cfg = cfg.VISION_SEM_SEG.SEM_SEG_NETWORK
        net_cfg.MODEL.TYPE = "Dummy"
        net_cfg.MODEL.COMPUTE_DTYPE = "float32"
        model, *_ = build_model(net_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 12, 3), jnp.float32)
        )
        weight = str(tmp_path / "w.npz")
        save_npz(variables, weight)
        net_cfg.MODEL.WEIGHT = weight

        bag = tmp_path / "cli.bag"
        _make_bag(bag, rng, n_frames=3)
        cfg_path = str(tmp_path / "online.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())

        report = main([
            "pipeline", "--cfg", cfg_path, "--bag", str(bag),
            "--rate", "30", "--fused",
        ])
        assert report.published == 10
        assert report.processed.get("fused:/current_pose", 0) == 3
        done = report.processed.get("fused:/camera1/image_raw", 0)
        dropped = report.drops.get("fused:/camera1/image_raw", 0)
        assert done + dropped == 3

        # --decode-ahead: worker-thread decode feed, same topology and
        # accounting (3 topics x 3 synced frames + the /tf republish)
        report = main([
            "pipeline", "--cfg", cfg_path, "--bag", str(bag),
            "--rate", "30", "--fused", "--decode-ahead",
        ])
        assert report.published == 10
        assert report.processed.get("fused:/current_pose", 0) == 3
        done = report.processed.get("fused:/camera1/image_raw", 0)
        dropped = report.drops.get("fused:/camera1/image_raw", 0)
        assert done + dropped == 3
