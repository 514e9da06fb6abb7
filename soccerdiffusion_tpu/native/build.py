"""Compile-and-cache loader for the native components (ctypes, no pybind11)."""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

from soccerdiffusion_tpu import logger

_SRC_DIR = Path(__file__).parent
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_FAILED = False


def _compile(src: Path, out: Path) -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(out), "-pthread",
    ]
    logger.info(f"compiling native library: {' '.join(cmd)}")
    subprocess.run(cmd, check=True, capture_output=True)


def load_framepack() -> ctypes.CDLL | None:
    """Load (building if needed) libframepack; None if no toolchain."""
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        src = _SRC_DIR / "framepack.cpp"
        lib_path = _SRC_DIR / "libframepack.so"
        try:
            if not lib_path.exists() or lib_path.stat().st_mtime < src.stat().st_mtime:
                _compile(src, lib_path)
            lib = ctypes.CDLL(str(lib_path))
        except (OSError, subprocess.CalledProcessError) as exc:
            logger.warning(f"native framepack unavailable ({exc}); using numpy fallback")
            _FAILED = True
            return None

        i64, f32p, i32p, i64p = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        )
        lib.fp_assemble_batch.argtypes = [
            f32p, f32p, f32p, i32p,  # cmds, states, rots, gs
            i64, i64,  # num_joints, rot_dim
            i64p, i64p,  # rec_starts, local_idx
            i64, i64, i64, i64, i64,  # batch, future, hist, state, imu
            f32p,  # rot_pad
            f32p, f32p, f32p, f32p, i32p,  # outputs
            ctypes.c_int32,  # num_threads
        ]
        lib.fp_assemble_batch.restype = None
        lib.fp_forward_fill_gamestate.argtypes = [
            f32p, i32p, i64, ctypes.c_double, i64, ctypes.c_int32, i32p,
        ]
        lib.fp_forward_fill_gamestate.restype = None
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_framepack() is not None
