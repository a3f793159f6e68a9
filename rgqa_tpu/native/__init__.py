"""Native (C++) components, loaded via ctypes.

``tsv_decoder``: streaming base64/TSV decoder for bottom-up-attention
feature files — the startup hot path the reference spends minutes on in
Python (``src/utils.py:16-54``).  Built on demand with g++ (no pybind11 in
this image); ``decode_obj_tsv`` falls back to the numpy implementation in
``rgqa_tpu.data.tsv`` when a compiler isn't available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "build", "decode_obj_tsv_native"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tsv_decoder.cpp")
_LIB = os.path.join(_DIR, "libtsv_decoder.so")
_lock = threading.Lock()
_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library (g++ -O3); returns its path."""
    with _lock:
        if force or not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-std=c++17", _SRC, "-o", _LIB,
                ],
                check=True,
                capture_output=True,
            )
    return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build())
    lib.rgqa_tsv_count_rows.argtypes = [ctypes.c_char_p]
    lib.rgqa_tsv_count_rows.restype = ctypes.c_longlong
    lib.rgqa_tsv_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p, ctypes.c_longlong,
    ]
    lib.rgqa_tsv_decode.restype = ctypes.c_longlong
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def decode_obj_tsv_native(
    path: str,
    *,
    topk: int | None = None,
    num_boxes: int = 36,
    feat_dim: int = 2048,
) -> dict:
    """Decode a whole TSV into packed arrays in one native pass.

    Returns the PackedFeatures array dict:
    features/boxes/objects_id/objects_conf/attrs_id/attrs_conf/sizes +
    ``img_ids`` (list[str]).
    """
    lib = _load()
    total = lib.rgqa_tsv_count_rows(path.encode())
    if total < 0:
        raise FileNotFoundError(path)
    n = int(total if not topk else min(topk, total))

    features = np.zeros((n, num_boxes, feat_dim), np.float32)
    boxes = np.zeros((n, num_boxes, 4), np.float32)
    objects_id = np.zeros((n, num_boxes), np.int64)
    objects_conf = np.zeros((n, num_boxes), np.float32)
    attrs_id = np.zeros((n, num_boxes), np.int64)
    attrs_conf = np.zeros((n, num_boxes), np.float32)
    sizes = np.zeros((n, 2), np.int32)
    ids_cap = n * 64 + 16
    ids_buf = ctypes.create_string_buffer(ids_cap)

    def ptr(arr, ctype):
        return arr.ctypes.data_as(ctypes.POINTER(ctype))

    rows = lib.rgqa_tsv_decode(
        path.encode(), n, num_boxes, feat_dim,
        ptr(features, ctypes.c_float), ptr(boxes, ctypes.c_float),
        ptr(objects_id, ctypes.c_int64), ptr(objects_conf, ctypes.c_float),
        ptr(attrs_id, ctypes.c_int64), ptr(attrs_conf, ctypes.c_float),
        ptr(sizes, ctypes.c_int32),
        ids_buf, ids_cap,
    )
    if rows < 0:
        raise ValueError(f"native TSV decode failed with code {rows} on {path}")
    rows = int(rows)
    img_ids = ids_buf.value.decode().split("\n")[:rows]
    sl = slice(0, rows)
    return {
        "features": features[sl],
        "boxes": boxes[sl],
        "objects_id": objects_id[sl],
        "objects_conf": objects_conf[sl],
        "attrs_id": attrs_id[sl],
        "attrs_conf": attrs_conf[sl],
        "sizes": sizes[sl],
        "img_ids": img_ids,
    }
