"""ctypes loader for the native host ops, with compile-on-first-use.

The shared library is built from src/radet_native.cpp with g++ -O3 the first
time it is needed and cached next to the source.  ``load()`` returns None if
no compiler is available — callers fall back to the pure-numpy
implementations in ops/distance_transform.py / ops/vote_nms.py.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "src", "radet_native.cpp")
_LIB = osp.join(_HERE, "libradet_native.so")
_LOCK = threading.Lock()
_CACHED = None
_TRIED = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        _SRC,
        "-o",
        _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def load():
    """Load (building if necessary) the native library; None on failure."""
    global _CACHED, _TRIED
    with _LOCK:
        if _CACHED is not None or _TRIED:
            return _CACHED
        _TRIED = True
        if not osp.exists(_LIB) or osp.getmtime(_LIB) < osp.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        c_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        c_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        c_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        c_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

        lib.mbd_transform.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int,
            c_i64p, c_i64p, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, c_f64p,
        ]
        lib.mbd_transform.restype = None
        lib.gdt_transform.argtypes = [
            c_f32p, ctypes.c_int, ctypes.c_int,
            c_i64p, c_i64p, ctypes.c_int, c_f32p,
        ]
        lib.gdt_transform.restype = None
        lib.vote_nms.argtypes = [
            c_f32p, c_f32p, c_f32p, c_i64p, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_float, ctypes.c_int,
            c_f32p, c_i64p, c_f32p,
        ]
        lib.vote_nms.restype = ctypes.c_int
        lib.nms_cluster.argtypes = [
            c_f32p, c_f32p, ctypes.c_int, ctypes.c_float, c_i64p, c_i64p,
        ]
        lib.nms_cluster.restype = None
        _CACHED = lib
        return lib


# ---------------------------------------------------------------------------
# numpy-facing wrappers
# ---------------------------------------------------------------------------


def mbd(image: np.ndarray, seeds_x: np.ndarray, seeds_y: np.ndarray,
        alpha: float = 0.1, niter: int = 4, base_size: int = 300) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    image = np.ascontiguousarray(image, np.uint8)
    h, w = image.shape[:2]
    out = np.empty((h, w), np.float64)
    lib.mbd_transform(
        image, h, w,
        np.ascontiguousarray(seeds_x, np.int64),
        np.ascontiguousarray(seeds_y, np.int64),
        len(seeds_x), float(alpha), int(niter), int(base_size), out,
    )
    return out


def gdt(cost: np.ndarray, seeds_x: np.ndarray, seeds_y: np.ndarray) -> np.ndarray:
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    cost = np.ascontiguousarray(cost, np.float32)
    h, w = cost.shape
    out = np.empty((h, w), np.float32)
    lib.gdt_transform(
        cost, h, w,
        np.ascontiguousarray(seeds_x, np.int64),
        np.ascontiguousarray(seeds_y, np.int64),
        len(seeds_x), out,
    )
    return out


def vote_nms_native(boxes, cluster_scores, vote_scores, labels,
                    iou_threshold=0.65, iou_enable=False, sigma=0.025,
                    global_mode=False):
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    n = len(boxes)
    boxes = np.ascontiguousarray(boxes, np.float32)
    out_boxes = np.empty((n, 4), np.float32)
    out_labels = np.empty((n,), np.int64)
    out_scores = np.empty((n,), np.float32)
    m = lib.vote_nms(
        boxes,
        np.ascontiguousarray(cluster_scores, np.float32),
        np.ascontiguousarray(vote_scores, np.float32),
        np.ascontiguousarray(labels, np.int64),
        n, float(iou_threshold), int(iou_enable), float(sigma), int(global_mode),
        out_boxes, out_labels, out_scores,
    )
    return out_boxes[:m], out_labels[:m], out_scores[:m]


def cluster_nms(boxes, scores, iou_threshold=0.5):
    """Greedy NMS clustering: (instance_ids (N,), cluster_sizes (N,))."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    n = len(boxes)
    ids = np.empty((n,), np.int64)
    sizes = np.empty((n,), np.int64)
    lib.nms_cluster(
        np.ascontiguousarray(boxes, np.float32),
        np.ascontiguousarray(scores, np.float32),
        n, float(iou_threshold), ids, sizes,
    )
    return ids, sizes
