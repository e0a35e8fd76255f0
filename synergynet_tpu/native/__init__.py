"""ctypes bindings for the native CPU runtime (native/synergy_native.cc).

The shared library is built on demand with g++ (cached next to the source);
set ``SYNERGY_NATIVE_LIB`` to use a prebuilt .so, or call
:func:`build_native` explicitly. All entry points also have pure-JAX
equivalents — the native layer is the host fallback/oracle, mirroring the
role of the reference's Cython/C++ modules (Sim3DR, cpu_nms).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_SRC_DIR, "synergy_native.cc")
_LIB_PATH = os.path.join(_SRC_DIR, "libsynergy_native.so")

_lib: Optional[ctypes.CDLL] = None

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def build_native(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    if (not force and os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    tmp = _LIB_PATH + f".tmp{os.getpid()}.so"
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(base[:2] + ["-march=native"] + base[2:],
                       check=True, capture_output=True)
    except subprocess.CalledProcessError:
        # Portable fallback for toolchains without -march=native.
        subprocess.run(base, check=True, capture_output=True)
    os.replace(tmp, _LIB_PATH)
    return _LIB_PATH


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    path = os.environ.get("SYNERGY_NATIVE_LIB") or build_native()
    lib = ctypes.CDLL(path)
    lib.syn_rasterize.argtypes = [
        _f32p, _i32p, _f32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, _u8p, _f32p, ctypes.c_float,
        ctypes.c_int32]
    lib.syn_rasterize.restype = None
    lib.syn_vertex_normals.argtypes = [
        _f32p, _i32p, ctypes.c_int32, ctypes.c_int32, _f32p]
    lib.syn_vertex_normals.restype = None
    lib.syn_nms_mask.argtypes = [_f32p, ctypes.c_int32, ctypes.c_float, _u8p]
    lib.syn_nms_mask.restype = None
    lib.syn_render_texture.argtypes = [
        _f32p, _i32p, _f32p, _f32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _u8p, _f32p,
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32]
    lib.syn_render_texture.restype = None
    _lib = lib
    return lib


def rasterize_cpu(vertices: np.ndarray, triangles: np.ndarray,
                  colors: np.ndarray, bg: np.ndarray, alpha: float = 1.0,
                  reverse: bool = False):
    """Native scalar rasterizer. Returns (image uint8, depth float32)."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    c = np.ascontiguousarray(colors, np.float32)
    img = np.ascontiguousarray(bg, np.uint8).copy()
    h, w = img.shape[:2]
    depth = np.full((h, w), -1e8, np.float32)
    lib.syn_rasterize(v, t, c, np.int32(v.shape[0]), np.int32(t.shape[0]),
                      np.int32(h), np.int32(w), img, depth,
                      np.float32(alpha), np.int32(bool(reverse)))
    return img, depth


def render_texture_cpu(vertices: np.ndarray, triangles: np.ndarray,
                       tex_coords: np.ndarray, texture: np.ndarray,
                       bg: np.ndarray, alpha: float = 1.0,
                       reverse: bool = False, bilinear: bool = True):
    """Native UV texture-mapped render (same sampling semantics as
    render/texture.py: v measured from the bottom, optional bilinear).
    texture: (TH, TW, 3) uint8 or float in [0, 1]. Returns (image uint8,
    depth float32)."""
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    uv = np.ascontiguousarray(tex_coords, np.float32)
    tex = np.asarray(texture)
    if tex.dtype == np.uint8:
        tex = tex.astype(np.float32) / 255.0
    tex = np.ascontiguousarray(tex, np.float32)
    img = np.ascontiguousarray(bg, np.uint8).copy()
    h, w = img.shape[:2]
    th, tw = tex.shape[:2]
    depth = np.full((h, w), -1e8, np.float32)
    lib.syn_render_texture(v, t, uv, tex, np.int32(t.shape[0]),
                           np.int32(h), np.int32(w), np.int32(th),
                           np.int32(tw), img, depth, np.float32(alpha),
                           np.int32(bool(reverse)), np.int32(bool(bilinear)))
    return img, depth


def vertex_normals_cpu(vertices: np.ndarray, triangles: np.ndarray
                       ) -> np.ndarray:
    lib = _load()
    v = np.ascontiguousarray(vertices, np.float32)
    t = np.ascontiguousarray(triangles, np.int32)
    out = np.zeros_like(v)
    lib.syn_vertex_normals(v, t, np.int32(v.shape[0]), np.int32(t.shape[0]),
                           out)
    return out


def nms_cpu(dets: np.ndarray, thresh: float = 0.3) -> list:
    """Reference-API NMS: (N, 5) [x1 y1 x2 y2 score] -> kept indices in
    descending-score order."""
    lib = _load()
    dets = np.asarray(dets, np.float32)
    order = np.argsort(-dets[:, 4], kind="stable")
    boxes = np.ascontiguousarray(dets[order, :4], np.float32)
    keep = np.zeros(len(order), np.uint8)
    lib.syn_nms_mask(boxes, np.int32(len(order)), np.float32(thresh), keep)
    return [int(i) for i in order[keep.astype(bool)]]
