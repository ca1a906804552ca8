"""Native (C++) data-path core, loaded via ctypes.

Builds lazily with g++ on first use; every entry point has a numpy
fallback so the framework works without a toolchain. See
src/cvor_core.cpp for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "src", "cvor_core.cpp")
_LIB_PATH = osp.join(_HERE, "libcvor_core.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first call; None if
    unavailable (callers must fall back to numpy)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not osp.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            if lib.cvor_abi_version() != 1:
                return None
            _lib = lib
        except OSError:
            return None
        return _lib


def available() -> bool:
    return get_lib() is not None


def _threads() -> int:
    return min(os.cpu_count() or 1, 8)


def decode_flow_u16(src: np.ndarray) -> np.ndarray:
    """uint16 -> float32 flow decode, native if possible."""
    lib = get_lib()
    flat = np.ascontiguousarray(src)
    if lib is None:
        return (flat.astype(np.float32) - 32768.0) / 128.0
    out = np.empty(flat.shape, np.float32)
    lib.cvor_decode_flow_u16(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(flat.size),
        ctypes.c_int(_threads()),
    )
    return out


def normalize_u8(src: np.ndarray) -> np.ndarray:
    """uint8 -> float32 2*(x/255)-1, native if possible."""
    lib = get_lib()
    flat = np.ascontiguousarray(src)
    if lib is None:
        return 2.0 * (flat.astype(np.float32) / 255.0) - 1.0
    out = np.empty(flat.shape, np.float32)
    lib.cvor_normalize_u8(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(flat.size),
        ctypes.c_int(_threads()),
    )
    return out


def gather_crop(
    column: np.memmap | np.ndarray,
    indices: np.ndarray,
    y0: np.ndarray,
    x0: np.ndarray,
    crop_hw: tuple[int, int],
    decode_flow: bool = False,
) -> np.ndarray:
    """Batched cropped gather from a CVOR column (N, H, W, C).

    Returns (B, ch, cw, C); float32 (decoded) when decode_flow else the
    column dtype. Native multi-threaded memcpy path when available."""
    n, h, w, c = column.shape
    ch, cw = crop_hw
    b = len(indices)
    indices = np.ascontiguousarray(indices, np.int64)
    y0 = np.ascontiguousarray(y0, np.int32)
    x0 = np.ascontiguousarray(x0, np.int32)

    lib = get_lib()
    if lib is None:
        out = np.stack(
            [
                column[i, yy : yy + ch, xx : xx + cw]
                for i, yy, xx in zip(indices, y0, x0)
            ]
        )
        if decode_flow:
            out = (out.astype(np.float32) - 32768.0) / 128.0
        return out

    base = np.ascontiguousarray(column) if not isinstance(column, np.memmap) else column
    src_ptr = ctypes.c_void_p(
        base.ctypes.data if not isinstance(base, np.memmap)
        else np.asarray(base).ctypes.data
    )
    if decode_flow:
        assert column.dtype == np.uint16
        out = np.empty((b, ch, cw, c), np.float32)
        lib.cvor_gather_crop_decode_flow(
            ctypes.cast(src_ptr, ctypes.POINTER(ctypes.c_uint16)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            y0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            x0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(b), ctypes.c_int64(h), ctypes.c_int64(w),
            ctypes.c_int64(c), ctypes.c_int64(ch), ctypes.c_int64(cw),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(_threads()),
        )
        return out
    out = np.empty((b, ch, cw, c), column.dtype)
    lib.cvor_gather_crop(
        src_ptr,
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        y0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        x0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(b), ctypes.c_int64(h), ctypes.c_int64(w),
        ctypes.c_int64(c), ctypes.c_int64(ch), ctypes.c_int64(cw),
        ctypes.c_int64(column.dtype.itemsize),
        ctypes.c_void_p(out.ctypes.data),
        ctypes.c_int(_threads()),
    )
    return out
