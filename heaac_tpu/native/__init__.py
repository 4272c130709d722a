"""Native host front-end loader (builds the C++ engine on first use)."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libaachost.so")
_lib = None


def _build() -> None:
    src = os.path.join(_HERE, "aac_host.cc")
    inc = os.path.join(_HERE, "tables.inc")
    if not os.path.exists(inc):
        raise RuntimeError(
            "tables.inc missing; run tools/gen_native_tables.py")
    subprocess.run(
        ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", "-o", _SO, src],
        check=True, cwd=_HERE)


def lib():
    """Load (building if necessary) the native host library."""
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_HERE, "aac_host.cc")
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(src)):
        _build()
    L = ctypes.CDLL(_SO)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    L.ht_init.restype = ctypes.c_int
    L.ht_parse_sce.restype = ctypes.c_int
    L.ht_parse_sce.argtypes = [ctypes.c_char_p, ctypes.c_int64, i64p,
                               ctypes.c_int, f32p, i32p, u32p, ctypes.c_int]
    L.ht_parse_cpe.restype = ctypes.c_int
    L.ht_parse_cpe.argtypes = [ctypes.c_char_p, ctypes.c_int64, i64p,
                               ctypes.c_int, f32p, f32p, i32p, i32p, u32p,
                               ctypes.c_int]
    L.ht_parse_stream.restype = ctypes.c_int
    L.ht_parse_stream.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.c_int, i32p, ctypes.c_int,
                                  f32p, i32p, ctypes.c_int]
    L.ht_init()
    _lib = L
    return L


def available() -> bool:
    try:
        lib()
        return True
    except Exception:
        return False


def parse_sce(data: bytes, pos_bits: int, sampling_index: int,
              rng_state: int, apply_tns: bool = True):
    """Native SCE parse -> (coeffs[1024] f32, meta dict, new_pos, new_rng)
    or None if the element needs the Python fallback."""
    L = lib()
    coeffs = np.zeros(1024, np.float32)
    meta = np.zeros(16, np.int32)
    pos = ctypes.c_int64(pos_bits)
    rng = ctypes.c_uint32(rng_state & 0xFFFFFFFF)
    r = L.ht_parse_sce(data, len(data) * 8, ctypes.byref(pos), sampling_index,
                       coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                       ctypes.byref(rng), int(apply_tns))
    if r == -2:
        return None
    if r:
        from ..bitstream.reader import BitstreamError
        raise BitstreamError(f"native SCE parse failed ({r})")
    return coeffs, meta, pos.value, rng.value


def parse_cpe(data: bytes, pos_bits: int, sampling_index: int,
              rng_state: int, apply_tns: bool = True):
    L = lib()
    c0 = np.zeros(1024, np.float32)
    c1 = np.zeros(1024, np.float32)
    m0 = np.zeros(16, np.int32)
    m1 = np.zeros(16, np.int32)
    pos = ctypes.c_int64(pos_bits)
    rng = ctypes.c_uint32(rng_state & 0xFFFFFFFF)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    r = L.ht_parse_cpe(data, len(data) * 8, ctypes.byref(pos), sampling_index,
                       fp(c0), fp(c1), ip(m0), ip(m1), ctypes.byref(rng),
                       int(apply_tns))
    if r == -2:
        return None
    if r:
        from ..bitstream.reader import BitstreamError
        raise BitstreamError(f"native CPE parse failed ({r})")
    return (c0, c1), (m0, m1), pos.value, rng.value


def parse_stream(data: bytes, sampling_index: int, layout,
                 max_frames: int):
    """Whole-stream native parse (plain LC layouts).

    layout: [(etype, tag), ...] channel layout (lane order); returns
    (coeffs [T, n_lanes, 1024] f32, meta [T, n_lanes, 8] i32) or None when
    the stream needs the Python fallback (PCE/CCE/Main/SSR)."""
    import ctypes as C
    L = lib()
    lane_base = np.full(128, -1, np.int32)
    n_lanes = 0
    for etype, tag in layout:
        lane_base[(etype << 4) | tag] = n_lanes
        n_lanes += 2 if etype == 1 else 1
    coeffs = np.zeros((max_frames, n_lanes, 1024), np.float32)
    meta = np.zeros((max_frames, n_lanes, 8), np.int32)
    r = L.ht_parse_stream(
        data, len(data), sampling_index,
        lane_base.ctypes.data_as(C.POINTER(C.c_int32)), n_lanes,
        coeffs.ctypes.data_as(C.POINTER(C.c_float)),
        meta.ctypes.data_as(C.POINTER(C.c_int32)), max_frames)
    if r < 0:
        return None
    return coeffs[:r], meta[:r]
