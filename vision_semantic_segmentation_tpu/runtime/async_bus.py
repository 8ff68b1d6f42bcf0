"""Concurrent node execution over the topic bus — the online runtime.

The reference runs its two nodes as separate OS processes wired by ROS
topics (`/root/reference/scripts/launch/camera1_mapping.launch:6-9`):
each node consumes messages on its own callback thread, and when a node
falls behind the camera rate, frames queue up and are dropped rather
than stalling the producer (the reference needs the bag slowed to 0.1x
to drop zero frames, ref README.md:194; empty-queue callbacks return
early, ref mapping.py:281-284).

This module reproduces that process-level pipeline inside one process:

  * :class:`NodeExecutor` — one worker thread per node.  It subscribes to
    bus topics with an *enqueue* callback, so ``bus.publish`` never runs
    node work inline; the node's real callbacks execute serially on the
    executor thread, preserving each node's single-threaded invariants.
  * Per-topic bounded mailboxes with keep-latest drop semantics: when a
    mailbox overflows, the OLDEST message is dropped and counted — the
    honest equivalent of a saturated ROS subscriber queue.
  * True stage overlap: the segmentation node's device forward and the
    mapping node's fusion run on different threads; JAX releases the GIL
    during device execution, so camera frame i+1 segments while frame i
    fuses.

Use :func:`run_online` (or ``pipeline --rate`` from the CLI) to drive a
bag through both nodes at a wall-clock rate and get a drop/latency
report.
"""
from __future__ import annotations

import dataclasses
import threading
import time
from collections import defaultdict, deque
from typing import Callable, Dict, Optional

from .bus import Message, TopicBus

__all__ = ["NodeExecutor", "PlaybackReport", "play_bag_timed", "run_online"]


class NodeExecutor:
    """Runs one node's callbacks serially on a dedicated worker thread.

    Messages arrive from bus-publisher threads into per-topic bounded
    mailboxes; the worker drains them in arrival order.  A full mailbox
    drops its oldest entry (counted in :attr:`drops`) — matching the
    behavior of a saturated ROS subscriber queue rather than blocking
    the producer.
    """

    def __init__(self, name: str = "node"):
        self.name = name
        self._lock = threading.Condition()
        self._queues: Dict[str, deque] = {}
        self._callbacks: Dict[str, Callable[[Message], None]] = {}
        self._order: deque = deque()  # topics with pending messages, FIFO
        self.drops: Dict[str, int] = defaultdict(int)
        self.processed: Dict[str, int] = defaultdict(int)
        self.errors: Dict[str, int] = defaultdict(int)
        self._stop = False
        self._idle = threading.Condition()
        self._busy = 0
        self._thread = threading.Thread(
            target=self._run, name=f"executor-{name}", daemon=True
        )
        self._started = False

    # -- wiring ---------------------------------------------------------------
    def subscribe(
        self,
        bus: TopicBus,
        topic: str,
        callback: Callable[[Message], None],
        queue_size: int = 1,
    ) -> None:
        """Route ``topic`` through this executor into ``callback``.

        ``queue_size=1`` gives keep-latest semantics (right for camera
        frames); history-style topics (pose, point cloud, tf) should use
        a depth that covers the node's own sync-queue window.
        """
        assert topic not in self._callbacks, f"{topic} already routed"
        self._queues[topic] = deque(maxlen=max(1, int(queue_size)))
        self._callbacks[topic] = callback
        bus.subscribe(topic, lambda msg, _t=topic: self._enqueue(_t, msg))

    def _enqueue(self, topic: str, msg: Message) -> None:
        with self._lock:
            q = self._queues[topic]
            if len(q) == q.maxlen:
                q.popleft()
                self.drops[topic] += 1
            q.append(msg)
            self._order.append(topic)
            self._lock.notify()
        if not self._started:
            self.start()

    # -- lifecycle ------------------------------------------------------------
    def start(self) -> None:
        # under _lock: two publisher threads may race the first enqueue
        with self._lock:
            if self._started:
                return
            self._started = True
        self._thread.start()

    def _run(self) -> None:
        while True:
            with self._lock:
                while not self._order and not self._stop:
                    self._lock.wait(timeout=0.1)
                if self._stop and not self._order:
                    return
                msg = None
                while self._order and msg is None:
                    topic = self._order.popleft()
                    q = self._queues[topic]
                    # a dropped message leaves a stale order entry behind;
                    # skip any topic whose mailbox has already been drained
                    if q:
                        msg = q.popleft()
                if msg is None:
                    continue
                self._busy += 1
            try:
                self._callbacks[topic](msg)
                self.processed[topic] += 1
            except Exception:  # noqa: BLE001 — a bad message must not kill
                # the worker (ROS logs callback exceptions and carries on);
                # counted in .errors and logged, the pipeline keeps running
                import logging
                import traceback

                self.errors[topic] += 1
                logging.getLogger(__name__).error(
                    "executor %s: callback for %s raised\n%s",
                    self.name, topic, traceback.format_exc(),
                )
            finally:
                with self._lock:
                    self._busy -= 1
                with self._idle:
                    self._idle.notify_all()

    def pending(self) -> int:
        with self._lock:
            return sum(len(q) for q in self._queues.values()) + self._busy

    def join(self, timeout: Optional[float] = None) -> bool:
        """Block until every queued message has been processed."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._idle:
            while self.pending():
                remaining = None if deadline is None else deadline - time.monotonic()
                if remaining is not None and remaining <= 0:
                    return False
                self._idle.wait(timeout=0.05 if remaining is None else min(remaining, 0.05))
        return True

    def stop(self) -> None:
        with self._lock:
            self._stop = True
            self._lock.notify_all()
        if self._started:
            self._thread.join(timeout=5.0)


@dataclasses.dataclass
class PlaybackReport:
    """What happened during a rate-driven playback."""

    published: int = 0
    bag_duration_s: float = 0.0
    wall_duration_s: float = 0.0
    rate: float = 1.0
    max_lag_s: float = 0.0  # how far publishing fell behind the timeline
    drops: Dict[str, int] = dataclasses.field(default_factory=dict)
    processed: Dict[str, int] = dataclasses.field(default_factory=dict)

    @property
    def dropped_total(self) -> int:
        return sum(self.drops.values())


def play_bag_timed(
    bag_path: str,
    bus: TopicBus,
    rate: float = 1.0,
    tf_tree=None,
    topic_map: Optional[Dict[str, str]] = None,
) -> PlaybackReport:
    """Publish a bag onto the bus on its own timeline (``rosbag play -r``).

    Each record is published at ``wall_start + (stamp - stamp0) / rate``.
    Publishing itself must stay cheap for the timeline to hold — pair
    with :class:`NodeExecutor` subscribers so heavy work happens off the
    playback thread; overload then shows up as mailbox drops, exactly
    like the reference's online pipeline under a too-fast bag
    (ref README.md:190-196).
    """
    from .bag_adapter import play_bag_records

    assert rate > 0, "rate must be positive"
    report = PlaybackReport(rate=rate)
    wall0 = None
    stamp0 = None
    horizon = None  # running max stamp: the playback timeline position

    def pace(stamp: float) -> None:
        nonlocal wall0, stamp0, horizon
        now = time.monotonic()
        if wall0 is None:
            wall0, stamp0, horizon = now, stamp, stamp
        if stamp <= horizon:
            # out-of-order record (bags interleave streams): publish at the
            # current timeline position, no sleep, no lag charged
            return
        horizon = stamp
        due = wall0 + (stamp - stamp0) / rate
        if due > now:
            time.sleep(due - now)
        else:
            report.max_lag_s = max(report.max_lag_s, now - due)

    report.published = play_bag_records(
        bag_path, bus, tf_tree=tf_tree, topic_map=topic_map, pace=pace
    )
    report.bag_duration_s = (horizon - stamp0) if stamp0 is not None else 0.0
    report.wall_duration_s = (time.monotonic() - wall0) if wall0 is not None else 0.0
    return report


def play_stream_timed(
    bag_path: str,
    bus: TopicBus,
    rate: float = 1.0,
    image_topic: str = "/camera1/image_raw",
    pcd_topic: str = "/reduced_map",
    pose_topic: str = "/current_pose",
    lookahead_s: float = 0.5,
    max_buffered: int = 16,
    image_topics=None,
    tf_tree=None,
) -> PlaybackReport:
    """Timed playback with DECODE AHEAD: the streamed twin of
    :func:`play_bag_timed`.

    :func:`play_bag_timed` deserializes every record (JPEG decode,
    PointCloud2 unpack) on the pacing thread itself — on a one-core host
    a slow decode eats the timeline budget and surfaces as ``max_lag_s``.
    This player instead consumes :func:`~.bag_adapter.stream_bag_frames`:
    bag read + decode + nearest-stamp sync run on a worker thread into a
    bounded queue, and the pacing thread only publishes pre-decoded
    arrays (pcd, pose, image per synced frame) at the bag timeline —
    decode of frame i+1..i+``max_buffered`` overlaps the downstream
    node's device compute on frame i.  If decode cannot sustain the
    timeline the queue runs dry and the lateness still shows in
    ``max_lag_s`` — the accounting is the same, only the overlap differs.

    ``image_topics`` streams several cameras (dual-camera bags, each
    frame published on its own ``/<camera>/image_raw``); ``tf_tree``
    applies /tf records (also republished on the bus), feeding the
    dynamic camera-extrinsics path exactly like :func:`play_bag_timed`.

    Trade-off vs :func:`play_bag_timed`: frames are published POST-sync
    (an image that never acquires a cloud+pose within ``lookahead_s`` is
    not published at all), and unmapped topics are not surfaced.
    """
    from .bag_adapter import TFRecord, stream_bag_frames

    assert rate > 0, "rate must be positive"
    report = PlaybackReport(rate=rate)
    wall0 = None
    stamp0 = None
    horizon = None  # running max stamp (same guard as play_bag_timed:
    # streams interleave, so a backward header stamp publishes at the
    # current timeline position with no sleep and no lag charged)
    last_pcd = None
    for f in stream_bag_frames(
        bag_path, image_topic=image_topic, pcd_topic=pcd_topic,
        pose_topic=pose_topic, lookahead_s=lookahead_s,
        max_buffered=max_buffered, image_topics=image_topics,
        with_tf=tf_tree is not None,
    ):
        if isinstance(f, TFRecord):
            for tr in f.msg.transforms:
                tf_tree.set_pose(
                    tr.translation, tr.rotation,
                    parent=tr.header.frame_id.lstrip("/"),
                    child=tr.child_frame_id.lstrip("/"),
                    stamp=tr.header.stamp,
                )
            bus.publish("/tf", f.msg, stamp=f.stamp)
            report.published += 1
            continue
        now = time.monotonic()
        if wall0 is None:
            wall0, stamp0, horizon = now, f.stamp, f.stamp
        if f.stamp > horizon:
            horizon = f.stamp
            due = wall0 + (f.stamp - stamp0) / rate
            if due > now:
                time.sleep(due - now)
            else:
                report.max_lag_s = max(report.max_lag_s, now - due)
        if f.pcd is not last_pcd:
            # clouds arrive ~1 Hz vs a 12 Hz camera; publish each once
            # (matching play_bag_timed's native-rate cloud stream), not
            # once per paired frame
            bus.publish(pcd_topic, f.pcd, stamp=f.stamp, frame_id=f.pcd_frame_id)
            last_pcd = f.pcd
            report.published += 1
        bus.publish(pose_topic, (f.position, f.quaternion), stamp=f.stamp)
        bus.publish(
            f"/{f.camera}/image_raw", f.semantic_image, stamp=f.stamp,
            frame_id=f.camera,
        )
        report.published += 2
    report.bag_duration_s = (horizon - stamp0) if stamp0 is not None else 0.0
    report.wall_duration_s = (
        (time.monotonic() - wall0) if wall0 is not None else 0.0
    )
    return report


def run_online(
    cfg,
    bag_path: str,
    rate: float = 1.0,
    predictor=None,
    engine=None,
    finalize: bool = True,
    fused: bool = False,
    pipeline=None,
    decode_ahead: bool = False,
) -> PlaybackReport:
    """Drive a bag through the online node topology at a wall-clock rate.

    The online equivalent of the reference's camera1_mapping.launch: the
    segmentation node and the mapping node each run on their own executor
    thread; camera frames use keep-latest mailboxes (depth 1), pose/cloud
    topics use history-deep mailboxes feeding the node's own sync queues.
    Returns a :class:`PlaybackReport` with per-topic drop counts.

    ``fused=True`` replaces the two-node topology with ONE
    :class:`~.node.FusedOnlineNode` (single device dispatch per frame —
    segmentation+projection+update in one XLA program).  Measured on the
    v5e: the fused node sustains a full 12 Hz camera with zero drops at
    1.0x where the two-node path tops out at ~10.9 Hz
    (scripts/probe_online_device.py; ref README.md:194 needs 0.1x).

    ``predictor`` / ``engine`` / ``pipeline`` inject prebuilt
    SemanticSegmentation / SemanticMappingEngine / FusedFramePipeline
    instances (tests use light doubles; ``pipeline`` only applies to the
    fused topology, ``predictor`` only to the two-node one).

    ``decode_ahead=True`` swaps :func:`play_bag_timed` for
    :func:`play_stream_timed`: bag decode (JPEG, PointCloud2) runs on a
    worker thread overlapping the nodes' device compute instead of on
    the pacing thread — the production feed discipline for compressed
    bags on a small host (scripts/probe_online_stream.py measures both).
    """
    from ..mapping.engine import SemanticMappingEngine
    from ..utils.ros_compat import TransformTree
    from .node import FusedOnlineNode, MappingNode, SegmentationNode

    bus = TopicBus()
    tf_tree = TransformTree()
    if fused:
        map_exec = NodeExecutor("fused")
        mapping_node = FusedOnlineNode(
            cfg, bus, pipeline=pipeline,
            variables=getattr(predictor, "variables", None),
            engine=engine, tf_tree=tf_tree, executor=map_exec,
        )
        execs = [("fused", map_exec)]
    else:
        seg_exec = NodeExecutor("segmentation")
        map_exec = NodeExecutor("mapping")
        SegmentationNode(cfg, bus, predictor=predictor, executor=seg_exec)
        mapping_node = MappingNode(
            cfg, bus, engine=engine or SemanticMappingEngine(cfg),
            tf_tree=tf_tree, executor=map_exec,
        )
        # seg publishes /<camera>/semantic on ITS executor thread -> the
        # bus delivers into mapping's mailbox: a real two-stage pipeline
        # (the device forward of frame i+1 overlaps the fusion of frame i)
        execs = [("seg", seg_exec), ("map", map_exec)]

    if decode_ahead:
        # stream BOTH configured cameras and /tf so the decode-ahead feed
        # matches play_bag_timed's coverage (dual-camera + dynamic
        # extrinsics), not just the camera1 fast path
        from .bag_adapter import _camera_of_topic

        report = play_stream_timed(
            bag_path, bus, rate=rate,
            image_topics=[
                f"/{_camera_of_topic(t)}/image_raw"
                for t in mapping_node.IMAGE_TOPICS
            ],
            tf_tree=tf_tree,
        )
    else:
        report = play_bag_timed(bag_path, bus, rate=rate)
    for _, ex in execs:
        ex.join()     # mapping drains frames published upstream while joining
    for _, ex in execs:
        ex.stop()

    report.drops = {
        f"{prefix}:{t}": n
        for prefix, ex in execs for t, n in ex.drops.items() if n
    }
    report.processed = {
        f"{prefix}:{t}": n
        for prefix, ex in execs for t, n in ex.processed.items()
    }
    # finalize unless the TEST_END_TIME cutoff already did (ref mapping.py:323)
    if finalize and mapping_node.grid is not None and mapping_node.finalized_map is None:
        mapping_node.finalize()
    return report
