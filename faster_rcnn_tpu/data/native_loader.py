"""ctypes binding for the native C++ image loader.

Compiles ``native/image_loader.cpp`` on first use (g++ -O3, linked against
libjpeg) and exposes :func:`load_canvas_native` — decode + bicubic resize +
flip + BGR/mean preprocess + canvas pad in one C call.  ctypes releases the
GIL for the call's duration, so the TrainLoader's worker threads decode in
true parallel while the TPU computes.

Falls back gracefully: ``available()`` is False when g++/libjpeg are missing
or the image is not a JPEG, and callers use the PIL path
(data/voc.py ImageRecord.load_pixels).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "image_loader.cpp")
_SO = os.path.join(_HERE, "..", "native", "_image_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        _SRC, "-o", _SO, "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native_loader: build failed ({e}); using PIL fallback")
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.frcnn_load_image.restype = ctypes.c_int
        lib.frcnn_load_image.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.frcnn_load_image_u8.restype = ctypes.c_int
        lib.frcnn_load_image_u8.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_canvas_native(
    path: str,
    canvas_h: int,
    canvas_w: int,
    target_h: int,
    target_w: int,
    flip: bool = False,
) -> Optional[np.ndarray]:
    """Full native pipeline -> (canvas_h, canvas_w, 3) float32 preprocessed
    canvas, or None if unavailable / not decodable (caller falls back)."""
    lib = _load()
    if lib is None or not path.lower().endswith((".jpg", ".jpeg")):
        return None
    out = np.empty((canvas_h, canvas_w, 3), np.float32)
    rc = lib.frcnn_load_image(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        canvas_h, canvas_w, target_h, target_w, int(flip),
    )
    if rc != 0:
        return None
    return out


def load_canvas_native_u8(
    path: str,
    canvas_h: int,
    canvas_w: int,
    target_h: int,
    target_w: int,
    flip: bool = False,
) -> Optional[np.ndarray]:
    """Native decode+resize+flip+pad -> (canvas_h, canvas_w, 3) RAW RGB uint8
    canvas (no preprocessing — that runs on device; see
    train/pipeline.ingest_images).  None if unavailable (caller falls back)."""
    lib = _load()
    if lib is None or not path.lower().endswith((".jpg", ".jpeg")):
        return None
    out = np.empty((canvas_h, canvas_w, 3), np.uint8)
    rc = lib.frcnn_load_image_u8(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas_h, canvas_w, target_h, target_w, int(flip),
    )
    if rc != 0:
        return None
    return out
