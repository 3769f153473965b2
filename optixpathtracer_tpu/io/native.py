"""ctypes bindings + on-demand build of the native C++ runtime components.

The reference's scene-ingest hot path is native (tinyobjloader, stb —
Model.cpp); here native/src/objparser.cpp fills that role, compiled once on
first use with the system toolchain and loaded via ctypes. Pure-Python
fallbacks exist for every native component (io/obj.py), so nothing breaks
without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "src", "objparser.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libobjparser.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_counts.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
        for fn in ("obj_copy_positions", "obj_copy_normals", "obj_copy_texcoords"):
            getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.obj_copy_tris.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
        lib.obj_group_name.restype = ctypes.c_char_p
        lib.obj_group_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.obj_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def parse_obj_native(path: str):
    """Parse an OBJ with the C++ tokenizer.

    Returns (positions (V,3) f32, normals (N,3), texcoords (T,2),
    tris (F,10) i32 [v*3, vt*3, vn*3, group], group_names list[(shape, mtl)])
    or None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    h = lib.obj_parse(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        counts = (ctypes.c_int64 * 5)()
        lib.obj_counts(h, counts)
        nv, nn, nt, nf, ng = (int(c) for c in counts)
        pos = np.empty((nv, 3), np.float32)
        nrm = np.empty((nn, 3), np.float32)
        uv = np.empty((nt, 2), np.float32)
        tris = np.empty((nf, 10), np.int32)
        if nv:
            lib.obj_copy_positions(h, pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nn:
            lib.obj_copy_normals(h, nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nt:
            lib.obj_copy_texcoords(h, uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if nf:
            lib.obj_copy_tris(h, tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        names = []
        for i in range(ng):
            raw = lib.obj_group_name(h, i).decode(errors="replace")
            shape, _, mtl = raw.partition("\x1f")
            names.append((shape, mtl))
        return pos, nrm, uv, tris, names
    finally:
        lib.obj_free(h)
