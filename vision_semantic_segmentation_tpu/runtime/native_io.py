"""Native PointCloud2 ingestion (ctypes binding to native/pointcloud.cpp).

Replaces the reference's per-point Python decode loop
(ref mapping.py:178-181) with a single-pass C++ decoder that emits the
dense (num_fields, N) layout — optionally already padded to the static
point bucket the jitted mapping step consumes.  Falls back to a
vectorized numpy decoder when the shared library is absent (the first
import attempts an automatic ``make``).
"""
from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
from typing import Sequence, Tuple

import numpy as np

_NATIVE_DIR = osp.abspath(osp.join(osp.dirname(__file__), "../../native"))
_LIB_PATH = osp.join(_NATIVE_DIR, "libpointcloud.so")

# sensor_msgs/PointField datatype codes -> numpy dtypes
_FIELD_DTYPES = {
    1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
    5: np.int32, 6: np.uint32, 7: np.float32, 8: np.float64,
}

_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        # cache the failure: retrying `make` per decode call would put a
        # subprocess spawn on the hot path of toolchain-less machines
        return None
    if not osp.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError):
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib_failed = True
        return None

    lib.decode_pointcloud2.restype = ctypes.c_int64
    lib.decode_pointcloud2.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.decode_and_bucket.restype = ctypes.c_int64
    lib.decode_and_bucket.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_library() is not None


def _numpy_decode(
    data: bytes, num_points: int, point_step: int,
    offsets: Sequence[int], datatypes: Sequence[int], skip_nans: bool,
) -> np.ndarray:
    """Vectorized fallback: one strided view per field."""
    raw = np.frombuffer(data, dtype=np.uint8, count=num_points * point_step)
    raw = raw.reshape(num_points, point_step)
    cols = []
    for off, dt_code in zip(offsets, datatypes):
        dt = np.dtype(_FIELD_DTYPES[dt_code])
        field = raw[:, off : off + dt.itemsize].copy().view(dt.newbyteorder("<"))[:, 0]
        cols.append(field.astype(np.float32))
    out = np.stack(cols)
    if skip_nans:
        out = out[:, np.isfinite(out).all(axis=0)]
    return out


def decode_pointcloud2(
    data: bytes,
    num_points: int,
    point_step: int,
    offsets: Sequence[int],
    datatypes: Sequence[int],
    skip_nans: bool = True,
) -> np.ndarray:
    """Decode a PointCloud2 payload into (num_fields, N) float32.

    Args mirror the message schema: byte ``offsets`` and PointField
    ``datatypes`` per requested field (e.g. x, y, z, intensity).
    """
    num_fields = len(offsets)
    if num_fields > 16:
        raise ValueError(f"at most 16 fields supported, got {num_fields}")
    lib = _load_library()
    if lib is None:
        return _numpy_decode(data, num_points, point_step, offsets, datatypes, skip_nans)

    out = np.empty((num_fields, num_points), dtype=np.float32)
    off = np.asarray(offsets, dtype=np.int64)
    dts = np.asarray(datatypes, dtype=np.int32)
    written = lib.decode_pointcloud2(
        data, num_points, point_step,
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_fields,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if skip_nans else 0,
    )
    # compact the NaN-skipped layout: field f occupies out[f, :written]
    if written != num_points:
        return np.stack([out[f, :written] for f in range(num_fields)])
    return out


def decode_and_bucket(
    data: bytes,
    num_points: int,
    point_step: int,
    offsets: Sequence[int],
    datatypes: Sequence[int],
    bucket: int,
    skip_nans: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode + pad/truncate to the jit-static point bucket in one pass.

    Returns ((num_fields, bucket) float32, (bucket,) bool validity) — the
    exact inputs of the fused mapping step.
    """
    num_fields = len(offsets)
    if num_fields > 16:
        raise ValueError(f"at most 16 fields supported, got {num_fields}")
    lib = _load_library()
    if lib is None:
        from ..mapping.engine import pad_points

        dense = _numpy_decode(data, num_points, point_step, offsets, datatypes, skip_nans)
        return pad_points(dense, bucket)

    out = np.empty((num_fields, bucket), dtype=np.float32)
    valid = np.empty((bucket,), dtype=np.uint8)
    off = np.asarray(offsets, dtype=np.int64)
    dts = np.asarray(datatypes, dtype=np.int32)
    lib.decode_and_bucket(
        data, num_points, point_step,
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_fields, bucket,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        1 if skip_nans else 0,
    )
    return out, valid.astype(bool)
