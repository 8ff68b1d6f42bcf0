from .file_io import get_dir_list, get_file_list, makedirs, move, remove
from .logger import MyLogger, setup_logger
from .benchmark import StageTimer, device_timer, profile, timer, trace
from .seed import set_random_seed

__all__ = [
    "get_dir_list",
    "get_file_list",
    "makedirs",
    "move",
    "remove",
    "MyLogger",
    "setup_logger",
    "StageTimer",
    "device_timer",
    "profile",
    "timer",
    "trace",
    "set_random_seed",
]
