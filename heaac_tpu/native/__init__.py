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
        # -ffp-contract=off: bit-exactness contract — fma contraction
        # changes sbr_chirp/dequant roundings vs the Python reference
        ["g++", "-O3", "-march=native", "-ffp-contract=off",
         "-fno-math-errno", "-fPIC", "-shared", "-std=c++17", "-o", _SO,
         src],
        check=True, cwd=_HERE)


def lib():
    """Load (building if necessary) the native host library."""
    global _lib
    if _lib is not None:
        return _lib
    # rebuild when any input is newer than the .so: aac_host.cc #includes
    # he_host.inc and tables.inc, so all three count (advisor fix)
    deps = [os.path.join(_HERE, f)
            for f in ("aac_host.cc", "he_host.inc", "tables.inc")]
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < max(os.path.getmtime(d)
                                           for d in deps)):
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
    L.hh_parse_he_stream.restype = ctypes.c_int
    L.hh_parse_he_stream.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, i32p, f32p, i32p, f32p, ctypes.c_int, i32p]
    i8p = ctypes.POINTER(ctypes.c_int8)
    L.hh_parse_he_stream_compact.restype = ctypes.c_int
    L.hh_parse_he_stream_compact.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, i32p, i32p, i8p, f32p, i32p, i8p,
        ctypes.c_int, i32p]
    L.hh_parse_he_stream_compact_strided.restype = ctypes.c_int
    L.hh_parse_he_stream_compact_strided.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, i32p, i32p, i8p, f32p, i32p, i8p,
        ctypes.c_int, ctypes.c_int64, ctypes.c_int64, i32p]
    u32p = ctypes.POINTER(ctypes.c_uint32)
    L.hh_parse_he_stream_packed.restype = ctypes.c_int
    L.hh_parse_he_stream_packed.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, f32p, f32p, ctypes.c_int, ctypes.c_int64,
        ctypes.c_int64, u32p, u32p, i32p]
    u8p = ctypes.POINTER(ctypes.c_uint8)
    L.hh_parse_he_stream_qwire.restype = ctypes.c_int
    L.hh_parse_he_stream_qwire.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        i32p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64, i32p, i32p,
        f32p, ctypes.c_int]
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


# ---- HE whole-stream engine (he_host.inc) ---------------------------------
# packed plan layouts; must match PlanF/PlanI/PsPlanF in he_host.inc
PLAN_F_FIELDS = [
    ("start", ()), ("gain_num", (5, 48)), ("den_q", (5, 48)),
    ("e_orig", (5, 48)), ("q_m0", (5, 48)), ("s_m0", (5, 48)),
    ("noisegate", (5, 48)), ("lim_onehot", (28, 48)), ("limgain", ()),
    ("env_onehot", (5, 38)), ("recip", (5,)), ("bw_of_m", (48,)),
    ("hf_mask", (48,)), ("gen_slot_mask", (40,)), ("fill_map", (42, 5)),
    ("smooth_on", (38,)), ("sine_re", (38,)), ("sine_im0", (38,)),
    ("grp_mean", (2, 48, 48)), ("freqres_sel", (5,)),
    ("use_y_old", (64,)), ("use_y_new", (64,)), ("xlow_old", (64,)),
    ("xlow_new", (64,)), ("scatter_m", (48, 64)),
]
PLAN_I_FIELDS = [
    ("src_of_m", (48,)), ("row_src", (42,)), ("direct_row", (38,)),
    ("noise_start", (38,)), ("i_temp", ()),
]
PS_F_FIELDS = [
    ("ps_on", ()), ("H", (2, 6, 34, 4)), ("Ws", (6, 32)), ("We", (6, 32)),
    ("ipd_on", ()), ("top_mask", (91,)),
]


def _field_size(shape):
    n = 1
    for s in shape:
        n *= s
    return n


PLAN_F_N = sum(_field_size(s) for _, s in PLAN_F_FIELDS)
PLAN_I_N = sum(_field_size(s) for _, s in PLAN_I_FIELDS)
PS_F_N = sum(_field_size(s) for _, s in PS_F_FIELDS)


def _unpack(buf, fields):
    """buf [T, L, N] -> {name: [T, L, *shape] view}."""
    out = {}
    off = 0
    for name, shape in fields:
        n = _field_size(shape)
        out[name] = buf[:, :, off:off + n].reshape(
            buf.shape[0], buf.shape[1], *shape)
        off += n
    return out


def parse_he_stream_compact(data: bytes, sampling_index: int,
                            core_rate: int, chan_config: int,
                            max_frames: int):
    """Native HE whole-stream parse emitting the compact wire plans
    (codec/compact_plan.py SC_*/PC_* layout, ~3 KB/frame-lane instead of
    the ~59 KB dense tensors).  Returns (core dict, sbr compact dict,
    ps compact dict, info dict) with [T, L, ...] leaves, or None when the
    stream needs the Python fallback."""
    import ctypes as C

    from ..codec import compact_plan as cp
    L = lib()
    nl = _LANES_FOR_CONFIG.get(chan_config)
    if nl is None:
        return None   # config 0: lane count unknown pre-parse
    coeffs = np.zeros((max_frames, nl, 1024), np.float32)
    meta = np.zeros((max_frames, nl, 8), np.int32)
    sci = np.zeros((max_frames, nl, cp.SC_I_N), np.int32)
    scb = np.zeros((max_frames, nl, cp.SC_B_N), np.int8)
    scf = np.zeros((max_frames, nl, cp.SC_F_N), np.float32)
    pci = np.zeros((max_frames, nl, cp.PC_I_N), np.int32)
    pcb = np.zeros((max_frames, nl, cp.PC_B_N), np.int8)
    info = np.zeros(4, np.int32)
    f32p = C.POINTER(C.c_float)
    i32p = C.POINTER(C.c_int32)
    i8p = C.POINTER(C.c_int8)
    r = L.hh_parse_he_stream_compact(
        data, len(data), sampling_index, core_rate, chan_config,
        coeffs.ctypes.data_as(f32p), meta.ctypes.data_as(i32p),
        sci.ctypes.data_as(i32p), scb.ctypes.data_as(i8p),
        scf.ctypes.data_as(f32p), pci.ctypes.data_as(i32p),
        pcb.ctypes.data_as(i8p), max_frames, info.ctypes.data_as(i32p))
    if r < 0:
        return None
    core = dict(coeffs=coeffs[:r], ws=meta[:r, :, 0], wsp=meta[:r, :, 1],
                kbd=meta[:r, :, 2], kbdp=meta[:r, :, 3])
    sbr = dict(sc_i=sci[:r], sc_b=scb[:r], sc_f=scf[:r])
    ps = dict(pc_i=pci[:r], pc_b=pcb[:r])
    return core, sbr, ps, dict(lanes=int(info[0]), sbr=int(info[1]),
                               is34=int(info[2]), err_frames=int(info[3]))


def parse_he_stream_compact_into(data: bytes, sampling_index: int,
                                 core_rate: int, chan_config: int,
                                 bufs: dict, lane0: int,
                                 max_frames: int):
    """Strided native HE parse: writes a stream's lanes straight into the
    preallocated [T, L_total, ...] batch tensors in ``bufs`` at lane
    offset ``lane0`` (zero-copy batch assembly).  ``bufs`` keys: coeffs,
    meta, sc_i, sc_b, sc_f, pc_i, pc_b.  Returns (n_frames, info dict) or
    None when the stream needs the Python fallback."""
    import ctypes as C
    L = lib()
    info = np.zeros(4, np.int32)
    f32p = C.POINTER(C.c_float)
    i32p = C.POINTER(C.c_int32)
    i8p = C.POINTER(C.c_int8)
    stride = bufs["coeffs"].shape[1]
    r = L.hh_parse_he_stream_compact_strided(
        data, len(data), sampling_index, core_rate, chan_config,
        bufs["coeffs"].ctypes.data_as(f32p),
        bufs["meta"].ctypes.data_as(i32p),
        bufs["sc_i"].ctypes.data_as(i32p),
        bufs["sc_b"].ctypes.data_as(i8p),
        bufs["sc_f"].ctypes.data_as(f32p),
        bufs["pc_i"].ctypes.data_as(i32p),
        bufs["pc_b"].ctypes.data_as(i8p),
        max_frames, stride, lane0, info.ctypes.data_as(i32p))
    if r < 0:
        return None
    return r, dict(lanes=int(info[0]), sbr=int(info[1]),
                   is34=int(info[2]), err_frames=int(info[3]))


def parse_he_stream_packed_into(data: bytes, sampling_index: int,
                                core_rate: int, chan_config: int,
                                coeffs: np.ndarray, rec: np.ndarray,
                                lane0: int, max_frames: int,
                                coeffs_mask: np.ndarray | None = None,
                                rec_mask: np.ndarray | None = None):
    """Strided native HE parse into the packed f32 wire record
    (codec/compact_plan.py REC layout): coeffs [T, L, 1024] f32 and
    rec [T, L, REC_W] f32 preallocated batch tensors.  With masks given,
    the parser XOR-whitens the emitted words cache-hot (see
    compact_plan.whiten_masks).  Returns (n_frames, info dict) or None
    for Python-fallback streams."""
    import ctypes as C
    L = lib()
    info = np.zeros(4, np.int32)
    f32p = C.POINTER(C.c_float)
    i32p = C.POINTER(C.c_int32)
    u32p = C.POINTER(C.c_uint32)
    mp = lambda m: (m.ctypes.data_as(u32p) if m is not None
                    else C.cast(None, u32p))
    r = L.hh_parse_he_stream_packed(
        data, len(data), sampling_index, core_rate, chan_config,
        coeffs.ctypes.data_as(f32p), rec.ctypes.data_as(f32p),
        max_frames, coeffs.shape[1], lane0, mp(coeffs_mask), mp(rec_mask),
        info.ctypes.data_as(i32p))
    if r < 0:
        return None
    return r, dict(lanes=int(info[0]), sbr=int(info[1]),
                   is34=int(info[2]), err_frames=int(info[3]))


EDGE_MAX = 24   # AFTER_IMDCT coupling edges per stream (he_host.inc)


def parse_he_stream_qwire_into(data: bytes, sampling_index: int,
                               core_rate: int, chan_config: int,
                               heap: np.ndarray, heap_cur: int,
                               recs: np.ndarray, lane0: int,
                               max_frames: int):
    """Native HE parse emitting the quantized wire format (codec/qwire.py):
    coefficient tokens + integer side/header blocks appended to ``heap``
    (u8, 1-D) starting at byte ``heap_cur``; 8-word records written into
    ``recs`` [T, L, 8] i32 at lane offset ``lane0``.  Returns
    (n_frames, new_heap_cur, info) or None for Python-fallback streams
    (also on native heap overflow).  info["couple"] carries a stream's
    AFTER_IMDCT CCE edge structure + per-frame gains (or None)."""
    import ctypes as C
    L = lib()
    info = np.zeros(8, np.int32)
    cedges = np.zeros(EDGE_MAX * 3, np.int32)
    cgains = np.zeros((max_frames, EDGE_MAX), np.float32)
    cur = C.c_int64(heap_cur)
    r = L.hh_parse_he_stream_qwire(
        data, len(data), sampling_index, core_rate, chan_config,
        heap.ctypes.data_as(C.POINTER(C.c_uint8)), heap.nbytes,
        C.byref(cur), recs.ctypes.data_as(C.POINTER(C.c_int32)),
        max_frames, recs.shape[1], lane0,
        info.ctypes.data_as(C.POINTER(C.c_int32)),
        cedges.ctypes.data_as(C.POINTER(C.c_int32)),
        cgains.ctypes.data_as(C.POINTER(C.c_float)), EDGE_MAX)
    if r < 0:
        return None
    ne = int(info[4])
    couple = None
    if ne:
        struct = [tuple(int(x) for x in cedges[k * 3:k * 3 + 3])
                  for k in range(ne)]
        couple = (struct, cgains[:r, :ne].copy())
    return r, int(cur.value), dict(lanes=int(info[0]), sbr=int(info[1]),
                                   is34=int(info[2]),
                                   err_frames=int(info[3]), couple=couple)



# output lanes per channel config (config 7 has 8 channels; config 0's
# layout arrives in-band and is not known before the parse)
_LANES_FOR_CONFIG = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 8}


def probe_he_stream(data: bytes, sampling_index: int, core_rate: int,
                    chan_config: int):
    """Cheap stream probe: run the native whole-stream front-end on the
    first two frames only (length-walked spectra, no device plans kept) —
    the bucketing analogue of the reference's header-only parse
    (aac_ac3_parser.c:77-97).  Returns dict(lanes, sbr, is34) or None
    when the stream needs the Python prober."""
    import ctypes as C
    L = lib()
    heap = np.zeros(1 << 16, np.uint8)
    recs = np.zeros((2, 8, 4), np.int32)
    info = np.zeros(8, np.int32)
    cur = C.c_int64(0)
    r = L.hh_parse_he_stream_qwire(
        data, min(len(data), 1 << 14), sampling_index, core_rate,
        chan_config, heap.ctypes.data_as(C.POINTER(C.c_uint8)), heap.nbytes,
        C.byref(cur), recs.ctypes.data_as(C.POINTER(C.c_int32)),
        2, 8, 0, info.ctypes.data_as(C.POINTER(C.c_int32)), None, None, 0)
    if r < 0:
        return None
    return dict(lanes=int(info[0]), sbr=int(info[1]), is34=int(info[2]))


def parse_he_stream(data: bytes, sampling_index: int, core_rate: int,
                    chan_config: int, max_frames: int):
    """Whole-stream native HE-AAC host front-end: core coeffs + SBR/PS
    plans in one C++ call (he_host.inc hh_parse_he_stream).  Returns
    (core dict, sbr plan dict, ps plan dict, info dict) with [T, L, ...]
    leaves, or None when the stream needs the Python fallback."""
    import ctypes as C
    L = lib()
    nl = _LANES_FOR_CONFIG.get(chan_config)
    if nl is None:
        return None   # config 0: lane count unknown pre-parse
    coeffs = np.zeros((max_frames, nl, 1024), np.float32)
    meta = np.zeros((max_frames, nl, 8), np.int32)
    planf = np.zeros((max_frames, nl, PLAN_F_N), np.float32)
    plani = np.zeros((max_frames, nl, PLAN_I_N), np.int32)
    psf = np.zeros((max_frames, nl, PS_F_N), np.float32)
    info = np.zeros(4, np.int32)
    f32p = C.POINTER(C.c_float)
    i32p = C.POINTER(C.c_int32)
    r = L.hh_parse_he_stream(
        data, len(data), sampling_index, core_rate, chan_config,
        coeffs.ctypes.data_as(f32p), meta.ctypes.data_as(i32p),
        planf.ctypes.data_as(f32p), plani.ctypes.data_as(i32p),
        psf.ctypes.data_as(f32p), max_frames, info.ctypes.data_as(i32p))
    if r < 0:
        return None
    core = dict(coeffs=coeffs[:r], ws=meta[:r, :, 0], wsp=meta[:r, :, 1],
                kbd=meta[:r, :, 2], kbdp=meta[:r, :, 3])
    sbr = _unpack(planf[:r], PLAN_F_FIELDS)
    sbr.update(_unpack(plani[:r], PLAN_I_FIELDS))
    ps = _unpack(psf[:r], PS_F_FIELDS)
    return core, sbr, ps, dict(lanes=int(info[0]), sbr=int(info[1]),
                               is34=int(info[2]), err_frames=int(info[3]))
