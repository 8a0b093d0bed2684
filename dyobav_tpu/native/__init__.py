"""Native (C++) runtime components, loaded via ctypes.

`load_map_compiler()` returns the ctypes-wrapped map-compiler library or
None when the shared object hasn't been built (`native/build.sh`); all
callers fall back to the numpy implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False
_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmapcompiler.so")


def build(force: bool = False) -> bool:
    """Compile the shared library in place (g++)."""
    if os.path.exists(_SO) and not force:
        return True
    try:
        subprocess.run(["sh", os.path.join(_DIR, "build.sh")], check=True,
                       capture_output=True)
        return os.path.exists(_SO)
    except Exception:
        return False


def load_map_compiler(auto_build: bool = True):
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and auto_build:
        build()
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f8p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.mc_process_map.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, u8p]
    lib.mc_process_map.restype = None
    lib.mc_extract_obstacles.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int, f8p,
                                         ctypes.c_int]
    lib.mc_extract_obstacles.restype = ctypes.c_int
    lib.mc_inflate_polygon.argtypes = [f8p, ctypes.c_int, ctypes.c_double, f8p]
    lib.mc_inflate_polygon.restype = ctypes.c_int
    lib.mc_halfspaces.argtypes = [f8p, ctypes.c_int, f8p, f8p, f8p]
    lib.mc_halfspaces.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def process_map(raw: np.ndarray, inversed: bool) -> Optional[np.ndarray]:
    lib = load_map_compiler()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty_like(raw)
    lib.mc_process_map(raw, raw.shape[0], raw.shape[1], int(inversed), out)
    return out


def extract_obstacles(image: np.ndarray, threshold: int = 120,
                      min_pixels: int = 2, max_rects: int = 256):
    lib = load_map_compiler()
    if lib is None:
        return None
    img = np.ascontiguousarray(image, np.uint8)
    rects = np.zeros((max_rects, 8), np.float64)
    n = lib.mc_extract_obstacles(img, img.shape[0], img.shape[1], threshold,
                                 min_pixels, rects, max_rects)
    return [rects[i].reshape(4, 2).copy() for i in range(n)]


def inflate_polygon(poly: np.ndarray, margin: float) -> Optional[np.ndarray]:
    lib = load_map_compiler()
    if lib is None:
        return None
    poly = np.ascontiguousarray(poly, np.float64)
    out = np.zeros((poly.shape[0] + 4, 2), np.float64)
    n = lib.mc_inflate_polygon(poly.reshape(-1), poly.shape[0], margin,
                               out.reshape(-1))
    if n == 0:
        return None     # degenerate: caller uses the python fallback
    return out[:n]


def halfspaces(poly: np.ndarray):
    lib = load_map_compiler()
    if lib is None:
        return None
    poly = np.ascontiguousarray(poly, np.float64)
    n_max = poly.shape[0] + 4
    b = np.zeros(n_max)
    a0 = np.zeros(n_max)
    a1 = np.zeros(n_max)
    n = lib.mc_halfspaces(poly.reshape(-1), poly.shape[0], b, a0, a1)
    if n == 0:
        return None
    return b[:n].tolist(), a0[:n].tolist(), a1[:n].tolist()
