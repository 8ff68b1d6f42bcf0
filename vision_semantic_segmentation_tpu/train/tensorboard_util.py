"""TensorBoard scalar logging for meter dicts.

Rebuild of `/root/reference/src/network/core/utils/tensorboard_util.py:7-22`:
push every meter's global average into a SummaryWriter under a prefix.
"""
from __future__ import annotations

from .meters import MeterLogger


def add_scalars(writer, meter_logger: MeterLogger, prefix: str, global_step: int) -> None:
    for name, meter in meter_logger.meters.items():
        value = meter.global_avg
        if value == value:  # skip NaN
            writer.add_scalar(f"{prefix}/{name}", value, global_step)
