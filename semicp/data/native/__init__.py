"""ctypes bindings for the native C++ data loader (loader.cpp).

Builds the shared library on first import if g++ is available and the
.so is missing/stale; falls back cleanly to the numpy implementations
in semicp.data.kitti when native code can't be used (native_available()
tells callers which path is live).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libsemicp_loader.so"
_SRC = _DIR / "loader.cpp"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.semicp_bin_count.restype = ctypes.c_long
    lib.semicp_bin_count.argtypes = [ctypes.c_char_p]
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.semicp_load_bin_planar.restype = ctypes.c_long
    lib.semicp_load_bin_planar.argtypes = [ctypes.c_char_p, fp, fp, fp, fp, ctypes.c_long]
    lib.semicp_load_labels.restype = ctypes.c_long
    lib.semicp_load_labels.argtypes = [ctypes.c_char_p, ip, ip, ctypes.c_long]
    lib.semicp_voxel_downsample.restype = ctypes.c_long
    lib.semicp_voxel_downsample.argtypes = [fp, fp, fp, ip, ctypes.c_long,
                                            ctypes.c_float, fp, fp, fp, ip]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def load_bin_planar(path) -> tuple[np.ndarray, np.ndarray]:
    """Native .bin parse -> (xyz (3,N) float32 planar, intensity (N,))."""
    lib = _load()
    n = lib.semicp_bin_count(str(path).encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    xs = np.empty(n, np.float32)
    ys = np.empty(n, np.float32)
    zs = np.empty(n, np.float32)
    it = np.empty(n, np.float32)
    got = lib.semicp_load_bin_planar(str(path).encode(), xs, ys, zs, it, n)
    if got != n:
        raise IOError(f"short read on {path}: {got}/{n}")
    return np.stack([xs, ys, zs]), it


def load_labels_remapped(path, lut: np.ndarray, n_expect: int) -> np.ndarray:
    lib = _load()
    out = np.empty(n_expect, np.int32)
    got = lib.semicp_load_labels(str(path).encode(),
                                 np.ascontiguousarray(lut, np.int32), out, n_expect)
    if got < 0:
        raise IOError(f"cannot read {path}")
    return out[:got]


def voxel_downsample_planar(xyz3n: np.ndarray, labels: np.ndarray, voxel: float):
    """Native voxel downsample on planar (3,N) input; returns planar output."""
    lib = _load()
    n = xyz3n.shape[1]
    xs, ys, zs = (np.ascontiguousarray(xyz3n[i], np.float32) for i in range(3))
    lab = np.ascontiguousarray(labels, np.int32)
    oxs = np.empty(n, np.float32)
    oys = np.empty(n, np.float32)
    ozs = np.empty(n, np.float32)
    olab = np.empty(n, np.int32)
    m = lib.semicp_voxel_downsample(xs, ys, zs, lab, n, voxel, oxs, oys, ozs, olab)
    if m < 0:
        raise ValueError("voxel must be > 0")
    return np.stack([oxs[:m], oys[:m], ozs[:m]]), olab[:m]
