"""Native host runtime: build-on-first-use C++ library + ctypes bindings.

The reference builds its one native component (the Sim3DR rasterizer
extension) at pip-install time via setuptools/Cython (reference
setup.py:45-60).  Here the native library is a single C++ translation unit
(``csrc/hdt_native.cpp``) compiled lazily with g++ into a per-machine cache
(``~/.cache/hdt_native``), keyed by the source hash — no pybind11 (absent in
this environment); the ABI is plain C called through ctypes, which releases
the GIL for the duration of every call (the writers/rasterizer are
OpenMP-parallel inside).

Everything degrades gracefully: ``available()`` is False when g++ or the
build is unavailable, and every consumer (MeshSaver, StreamingDetector,
PNCCProcessor) keeps its pure-Python/JAX path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc", "hdt_native.cpp")
_CXXFLAGS = ["-O3", "-march=native", "-std=c++17", "-shared", "-fPIC", "-fopenmp"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha1(f.read() + " ".join(_CXXFLAGS).encode()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "hdt_native"
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"libhdt_native_{digest}.so")


def _build() -> Optional[ctypes.CDLL]:
    global _build_error
    so_path = _cache_path()
    if not os.path.isfile(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", *_CXXFLAGS, _SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            os.replace(tmp, so_path)
        except (OSError, subprocess.SubprocessError) as e:
            stderr = getattr(e, "stderr", b"") or b""
            _build_error = f"{e}: {stderr.decode(errors='replace')[:500]}"
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:  # pragma: no cover - corrupt cache
        _build_error = str(e)
        return None

    lib.hdt_rasterize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.hdt_rasterize.restype = None
    lib.hdt_write_objs.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
    ]
    lib.hdt_write_objs.restype = None
    lib.hdt_letterbox.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.hdt_letterbox.restype = ctypes.c_double
    lib.hdt_letterbox_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.hdt_letterbox_batch.restype = None
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_error is not None:
        return _lib
    if os.environ.get("HDT_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is None and _build_error is None:
            _lib = _build()
    return _lib


def available() -> bool:
    """True when the native library built (or loaded from cache)."""
    return _get() is not None


def build_error() -> Optional[str]:
    return _build_error


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rasterize_zbuffer_native(
    vertices: np.ndarray,
    triangles: np.ndarray,
    colors: np.ndarray,
    height: int,
    width: int,
    reverse: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-native twin of ``ops.rasterize.rasterize_zbuffer``.

    Same contract: returns (color [H, W, 3] float32 in [0, 1], hit mask
    [H, W] bool).  Agreement with the XLA backend is tested pixel-for-pixel
    (tests/test_native.py).
    """
    lib = _get()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    c = np.ascontiguousarray(colors, np.float32)
    color = np.zeros((height, width, 3), np.float32)
    hit = np.zeros((height, width), np.uint8)
    zbuf = np.full((height, width), -1e8, np.float32)
    lib.hdt_rasterize(
        _fptr(v), v.shape[0],
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), t.shape[0],
        _fptr(c), height, width,
        _fptr(color), hit.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _fptr(zbuf),
    )
    if reverse:
        color = color[::-1]
        hit = hit[::-1]
    return color, hit.astype(bool)


def write_objs_native(
    vertices: np.ndarray, faces_block: bytes, paths: List[str]
) -> None:
    """Write ``vertices[i]`` + the constant face block to ``paths[i]``.

    vertices: [N, V, 3]; rendered as "v %.8f %.8f %.8f\\n" from float64 —
    byte-identical to MeshSaver's Python formatting (tested).
    """
    lib = _get()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    v = np.ascontiguousarray(vertices, np.float64)
    if v.ndim != 3 or v.shape[-1] != 3 or v.shape[0] != len(paths):
        raise ValueError(f"expected [N={len(paths)}, V, 3] vertices, got {v.shape}")
    c_paths = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths]
    )
    status = np.zeros((len(paths),), np.int32)
    lib.hdt_write_objs(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        v.shape[0], v.shape[1],
        faces_block, len(faces_block),
        c_paths, status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    bad = np.nonzero(status)[0]
    if bad.size:
        raise OSError(f"failed to write {[paths[i] for i in bad[:5]]}")


def letterbox_native(image: np.ndarray, size: int) -> Tuple[np.ndarray, float]:
    """Aspect-preserving bilinear letterbox into a 127-padded square.

    Same layout as StreamingDetector._letterbox_host (centered paste); the
    resize is float bilinear with pixel-center alignment — within ±1 count
    of cv2.INTER_LINEAR's fixed-point path (tested).
    """
    lib = _get()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    img = np.ascontiguousarray(image, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HWC uint8 image, got {img.shape}")
    out = np.empty((size, size, 3), np.uint8)
    scale = lib.hdt_letterbox(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size,
    )
    return out, float(scale)


def letterbox_batch_native(images: np.ndarray, size: int) -> np.ndarray:
    """Batch letterbox of same-shape uint8 images [N, H, W, 3] -> [N, s, s, 3]."""
    lib = _get()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    imgs = np.ascontiguousarray(images, np.uint8)
    if imgs.ndim != 4 or imgs.shape[3] != 3:
        raise ValueError(f"expected [N, H, W, 3] uint8 batch, got {imgs.shape}")
    out = np.empty((imgs.shape[0], size, size, 3), np.uint8)
    lib.hdt_letterbox_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        imgs.shape[0], imgs.shape[1], imgs.shape[2],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size,
    )
    return out
