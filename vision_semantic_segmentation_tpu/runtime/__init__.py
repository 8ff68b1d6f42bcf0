from .bus import Message, TopicBus, nearest_stamp_index
from .io import (
    FrameRecord,
    iter_sequence_files,
    load_frames,
    load_reference_dump,
    save_frames,
)
from .node import FusedOnlineNode, MappingNode, SegmentationNode
from .replay import MappingReplay
from .video import generate_video
from .pipeline import FusedFramePipeline, network_to_channel_table
from . import native_io

__all__ = [
    "Message",
    "TopicBus",
    "nearest_stamp_index",
    "FrameRecord",
    "iter_sequence_files",
    "load_frames",
    "load_reference_dump",
    "save_frames",
    "FusedOnlineNode",
    "MappingNode",
    "SegmentationNode",
    "MappingReplay",
    "generate_video",
    "FusedFramePipeline",
    "network_to_channel_table",
    "native_io",
]
