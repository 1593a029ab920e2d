"""Native (C++) runtime components, loaded via ctypes.

The reference keeps its performance-critical host-side pieces native
(akari_cpp_ext: cmake+C++20, SURVEY.md §2.2); ours live in native/ and are
compiled on first use with g++ (no build-system dependency). Python
fallbacks exist for every native function so the package works without a
toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_BUILD_DIR = _NATIVE_DIR / "build"

_lib = None
_lib_tried = False


def _compile(sources: list[Path], out: Path) -> bool:
    out.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        *[str(s) for s in sources], "-o", str(out),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    sources = sorted(_NATIVE_DIR.glob("*.cpp"))
    if not sources:
        return None
    tag = hashlib.sha1(
        b"".join(s.read_bytes() for s in sources)
    ).hexdigest()[:12]
    so = _BUILD_DIR / f"akari_native_{tag}.so"
    if not so.exists() and not _compile(sources, so):
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.akr_build_bvh.restype = ctypes.c_int64
    lib.akr_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float)] * 3 + [ctypes.c_int64] + [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float))] * 2 + [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32))] * 4
    lib.akr_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def build_bvh_native(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """C++ binned-SAH build; returns dict of numpy arrays or None."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(v0)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    o_bmin, o_bmax = fp(), fp()
    o_start, o_count, o_skip, o_order = ip(), ip(), ip(), ip()
    arr = lambda a: np.ascontiguousarray(a, np.float32).ctypes.data_as(fp)
    v0c = np.ascontiguousarray(v0, np.float32)
    e1c = np.ascontiguousarray(e1, np.float32)
    e2c = np.ascontiguousarray(e2, np.float32)
    m = lib.akr_build_bvh(
        v0c.ctypes.data_as(fp), e1c.ctypes.data_as(fp), e2c.ctypes.data_as(fp),
        n,
        ctypes.byref(o_bmin), ctypes.byref(o_bmax),
        ctypes.byref(o_start), ctypes.byref(o_count),
        ctypes.byref(o_skip), ctypes.byref(o_order),
    )
    out = {
        "bmin": np.ctypeslib.as_array(o_bmin, (m, 3)).copy(),
        "bmax": np.ctypeslib.as_array(o_bmax, (m, 3)).copy(),
        "start": np.ctypeslib.as_array(o_start, (m,)).copy(),
        "count": np.ctypeslib.as_array(o_count, (m,)).copy(),
        "skip": np.ctypeslib.as_array(o_skip, (m,)).copy(),
        "order": np.ctypeslib.as_array(o_order, (n,)).copy(),
    }
    for p in (o_bmin, o_bmax, o_start, o_count, o_skip, o_order):
        lib.akr_free(p)
    return out
