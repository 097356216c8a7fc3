"""ctypes binding for the native (C++) decode pipeline, with lazy build and
graceful fallback to PIL (imagenet_models_tpu/native/imtpu_loader.cpp).

The GIL is released for the duration of each foreign call, and
`decode_batch` runs an internal std::thread pool, so one Python thread can
saturate all host cores on decode."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_logger = logging.getLogger("imagenet_models_tpu")
_lock = threading.Lock()
_lib = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


def _build_and_load():
    so = os.path.join(_NATIVE_DIR, "libimtpu_loader.so")
    src = os.path.join(_NATIVE_DIR, "imtpu_loader.cpp")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        _logger.info("building native loader (%s)...", src)
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so)
    lib.imtpu_decode_batch.restype = ctypes.c_int
    lib.imtpu_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    return lib


def get_native_lib():
    global _lib, _tried
    with _lock:
        if _lib is None and not _tried:
            _tried = True
            try:
                _lib = _build_and_load()
                _logger.info("native decode pipeline loaded")
            except Exception as e:  # noqa: BLE001
                _logger.warning("native loader unavailable (%s); using PIL", e)
        return _lib


INTERP_CODES = {"bilinear": 0, "bicubic": 1, "random": 2}


def decode_batch(paths, seeds, size: int, mode: str, interpolation: str = "bicubic",
                 hflip: float = 0.5, vflip: float = 0.0,
                 scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0),
                 crop_pct: float = 0.875, num_threads: int = 0) -> np.ndarray:
    """Decode a batch of JPEGs to (N, size, size, 3) uint8. mode: train|eval.

    Train mode honors every pixel-affecting recipe knob: interpolation
    (bilinear/bicubic/'random' per-image), hflip/vflip probabilities and the
    RandomResizedCrop --scale/--ratio ranges (timm create_loader semantics)."""
    lib = get_native_lib()
    assert lib is not None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_seeds = (ctypes.c_uint64 * n)(*[int(s) & (2 ** 64 - 1) for s in seeds])
    nt = num_threads or os.cpu_count() or 1
    fails = lib.imtpu_decode_batch(
        c_paths, c_seeds, n, size, 0 if mode == "train" else 1,
        INTERP_CODES[interpolation], ctypes.c_float(hflip), ctypes.c_float(vflip),
        ctypes.c_float(scale[0]), ctypes.c_float(scale[1]),
        ctypes.c_float(ratio[0]), ctypes.c_float(ratio[1]),
        ctypes.c_float(crop_pct), nt,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if fails:
        _logger.warning("%d/%d images failed native decode (grey-filled)", fails, n)
    return out
