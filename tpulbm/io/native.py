"""ctypes bindings to the native C++ IO runtime (libtpulbm_io).

The reference's output path is native C stdio (write_values,
d2q9-bgk.c:1034-1143); formatting a million "%.12E" lines from Python is
10-20x slower, so the framework ships a small C++ library for the formatted
writers and the obstacle parser. Built on demand with g++ (no pip deps); all
callers fall back to pure Python/numpy if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                    "native", "io_native.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(_SRC), "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libtpulbm_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    try:
        src_mtime = os.path.getmtime(_SRC)
    except OSError:
        return False
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= src_mtime:
        return True
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return False
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("TPULBM_NO_NATIVE"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
        lib.tpulbm_write_final_state.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p, f32p, i32p,
        ]
        lib.tpulbm_write_final_state.restype = ctypes.c_int
        lib.tpulbm_write_av_vels.argtypes = [ctypes.c_char_p, ctypes.c_int, f32p]
        lib.tpulbm_write_av_vels.restype = ctypes.c_int
        lib.tpulbm_read_obstacles.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, i32p,
        ]
        lib.tpulbm_read_obstacles.restype = ctypes.c_longlong
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def write_final_state(path, u_x, u_y, u, pressure, obstacles_i32) -> None:
    lib = _load()
    ny, nx = obstacles_i32.shape
    rc = lib.tpulbm_write_final_state(
        path.encode(), nx, ny,
        np.ascontiguousarray(u_x, dtype=np.float32),
        np.ascontiguousarray(u_y, dtype=np.float32),
        np.ascontiguousarray(u, dtype=np.float32),
        np.ascontiguousarray(pressure, dtype=np.float32),
        np.ascontiguousarray(obstacles_i32, dtype=np.int32),
    )
    if rc != 0:
        raise IOError(f"native final_state write failed: {path}")


def write_av_vels(path, av_vels) -> None:
    lib = _load()
    av = np.ascontiguousarray(av_vels, dtype=np.float32)
    rc = lib.tpulbm_write_av_vels(path.encode(), av.size, av)
    if rc != 0:
        raise IOError(f"native av_vels write failed: {path}")


def read_obstacles(path, nx, ny):
    """Returns (mask bool (ny,nx), num_free) or None if unavailable/failed."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((ny, nx), dtype=np.int32)
    n_free = lib.tpulbm_read_obstacles(path.encode(), nx, ny, out)
    if n_free < 0:
        return None
    return out.astype(bool), int(n_free)
