"""Compact on-the-wire frame plans + on-device expansion.

Round-1 shipped dense per-frame tensors (codec/frame_plan.py): ~58.7 KB per
frame-lane, ~350x the underlying bitstream, dominated by derived one-hot /
index matrices (grp_mean [2,48,48], scatter_m [48,64], lim_onehot [28,48],
fill/env maps).  This module replaces the wire format with the compact
integer descriptors those tensors are derived from — the same per-frame
state the reference keeps in sbr.h:80-107 (band tables, envelope borders,
kx/m, patch map, noise/sine phase) — and rebuilds the dense tensors INSIDE
the jitted graph with iota/compare/gather ops (free on the VPU, fused by
XLA).  ~3 KB per frame-lane on the wire, bit-identical outputs.

Wire layout per frame-lane (mirrored by native/he_host.inc):
  sc_i  int32[SC_I_N]   scalars: kx/m, envelope borders, phases, flags
  sc_b  int8 [SC_B_N]   per-band maps: patch source, noise/limiter/grp band
  sc_f  f32  [SC_F_N]   dequantized envelopes e_orig/q_mapped + bw/recip
  pc_i  int32[PC_I_N]   PS scalars: num_env, borders, modes
  pc_b  int8 [PC_B_N]   PS mapped iid/icc/ipd/opd indices

The PS mixing matrices are no longer shipped: the device gathers them from
the HA/HB LUTs and carries the reference's persistent H / ipd_hist /
opd_hist state (aacps.c:794-935) as device arrays threaded through the
frame scan.
"""
from __future__ import annotations

import numpy as np

from ..bitstream.sbr_syntax import ENVELOPE_ADJUSTMENT_OFFSET, sbr_dequant
from ..ops.sbr_np import LIMGAIN, chirp, mapping
from ..tables import ps_tables as P

E, M, L = 5, 48, 28

# ---- sc_i slots -----------------------------------------------------------
I_START, I_KX0, I_KX1, I_M0, I_M1, I_NE = 0, 1, 2, 3, 4, 5
I_TENV = 6                  # 6..11: 2*t_env[0..5] (absolute slot borders x2)
I_TOLD2 = 12                # 2*t_env_num_env_old
I_EA0, I_EA1 = 13, 14
I_HSL, I_RESET = 15, 16
I_NOISE0, I_SINE0 = 17, 18
I_ITEMP, I_FRBITS = 19, 20
SC_I_N = 24

# ---- sc_b slots (int8) ----------------------------------------------------
B_SRC = 0                   # [48] patch source band (0..31)
B_NOISB = 48                # [48] noise band of m (0..4)
B_PB_LO = 96                # [48] low-res grp band of m (-1: none)
B_PB_HI = 144               # [48] high-res grp band of m
B_LIMB = 192                # [48] limiter band of m (-1: none)
B_SMASK = 240               # [5*48] bit0: s_mapped>0, bit1: s_indexmapped
SC_B_N = 480

# ---- sc_f slots -----------------------------------------------------------
F_EORIG = 0                 # [5*48]
F_QMAP = 240                # [5*48]
F_BW = 480                  # [5] bw_array
F_RECIP = 485               # [5] 0.5/env_len
F_IWLO = 490                # [48] 1/band_width low-res (grp_mean values)
F_IWHI = 538                # [48] high-res
F_LIMG = 586                # limiter gain
SC_F_N = 587

# ---- pc_i slots -----------------------------------------------------------
PI_ON, PI_IPD, PI_QUANT, PI_NENV, PI_ICCMODE, PI_NIPD, PI_TOP = range(7)
PI_BORD = 7                 # 7..12: border_position[0..5] (b[0] == -1)
PC_I_N = 16

# ---- pc_b slots (int8) ----------------------------------------------------
PB_IID = 0                  # [5,34]
PB_ICC = 170                # [5,34]
PB_IPD = 340                # [5,17]
PB_OPD = 425                # [5,17]
PC_B_N = 510

# ---- packed wire record ---------------------------------------------------
# The axon host->device tunnel only has a fast path for float32 transfers
# (~1.3 GB/s vs ~25-50 MB/s for int8/int32, measured 2026-08-16; raw f32
# bit patterns round-trip exactly).  The whole per-frame-lane plan is
# therefore shipped as ONE f32-viewed buffer and bitcast-sliced back on
# device.  Layout in f32 words:
#   [WF_SCF  : +SC_F_N)  sc_f (f32, as-is)
#   [WI_SCI  : +SC_I_N)  sc_i (i32 bit patterns)
#   [WI_PCI  : +PC_I_N)  pc_i
#   [WI_META : +8)       core meta (ws, wsp, kbd, kbdp, tns, err, 0, 0)
#   [WB_BYTES: +248)     sc_b [480] ++ pc_b [510] ++ 2 pad bytes (int8)
WF_SCF = 0
WI_SCI = WF_SCF + SC_F_N           # 587
WI_PCI = WI_SCI + SC_I_N           # 611
WI_META = WI_PCI + PC_I_N          # 627
WB_BYTES = WI_META + 8             # 635
REC_W = WB_BYTES + (SC_B_N + PC_B_N + 3) // 4   # 883 f32 words
REC_BYTES = REC_W * 4                           # 3532


def pack_records(core_meta, sc: dict, pc: dict) -> np.ndarray:
    """Host-side packing of [T, L, ...] compact leaves into the f32 wire
    record [T, L, REC_W] (the Python analogue of the native packed sink;
    used by fallback streams and tests)."""
    T, L = sc["sc_i"].shape[:2]
    rec = np.zeros((T, L, REC_BYTES), np.uint8)
    f32v = rec.view(np.float32).reshape(T, L, REC_W)
    i32v = rec.view(np.int32).reshape(T, L, REC_W)
    f32v[:, :, WF_SCF:WF_SCF + SC_F_N] = sc["sc_f"]
    i32v[:, :, WI_SCI:WI_SCI + SC_I_N] = sc["sc_i"]
    i32v[:, :, WI_PCI:WI_PCI + PC_I_N] = pc["pc_i"]
    i32v[:, :, WI_META:WI_META + 8] = core_meta
    b0 = WB_BYTES * 4
    rec[:, :, b0:b0 + SC_B_N] = sc["sc_b"].view(np.uint8)
    rec[:, :, b0 + SC_B_N:b0 + SC_B_N + PC_B_N] = pc["pc_b"].view(np.uint8)
    return f32v


WHITEN_SEED = 0xC0FFEE


def whiten_masks(T: int, L: int):
    """Per-position pseudorandom XOR masks for the coeffs/record payloads.

    The axon host->device tunnel compresses compressible payloads on a
    ~35 MB/s CPU-bound path while shipping incompressible data raw at
    ~1.4 GB/s (measured 2026-08-16; an all-zero f32 buffer transfers 40x
    slower than random data).  XORing every word with a fixed random mask
    on host (done cache-hot by the native parser) and un-XORing on device
    is bijective and bit-exact, and forces the fast raw path for every
    payload.  Masks are deterministic in (seed, shape)."""
    rng = np.random.default_rng(WHITEN_SEED)
    return (rng.integers(0, 2**32, size=(T, L, 1024), dtype=np.uint32),
            rng.integers(0, 2**32, size=(T, L, REC_W), dtype=np.uint32))


def unwhiten_jax(coeffs_w, rec_w, mask_c, mask_r):
    """Device-side un-XOR: whitened f32 payloads + u32 masks -> raw f32."""
    import jax
    import jax.numpy as jnp

    bc = jax.lax.bitcast_convert_type
    coeffs = bc(bc(coeffs_w, jnp.uint32) ^ mask_c, jnp.float32)
    rec = bc(bc(rec_w, jnp.uint32) ^ mask_r, jnp.float32)
    return coeffs, rec


def unpack_records_jax(rec):
    """Device-side record unpacking: rec [B, REC_W] f32 ->
    (core meta dict, sc dict, pc dict) matching the unpacked wire arrays.
    Pure bitcasts + static slices; fuses into the expansion graph."""
    import jax
    import jax.numpy as jnp

    B = rec.shape[0]
    i32 = jax.lax.bitcast_convert_type(rec, jnp.int32)
    sc_f = rec[:, WF_SCF:WF_SCF + SC_F_N]
    sc_i = i32[:, WI_SCI:WI_SCI + SC_I_N]
    pc_i = i32[:, WI_PCI:WI_PCI + PC_I_N]
    meta = i32[:, WI_META:WI_META + 8]
    bytes_u8 = jax.lax.bitcast_convert_type(
        rec[:, WB_BYTES:REC_W], jnp.uint8).reshape(B, -1)
    sc_b = jax.lax.bitcast_convert_type(bytes_u8[:, :SC_B_N], jnp.int8)
    pc_b = jax.lax.bitcast_convert_type(
        bytes_u8[:, SC_B_N:SC_B_N + PC_B_N], jnp.int8)
    core_meta = dict(ws=meta[:, 0], wsp=meta[:, 1], kbd=meta[:, 2],
                     kbdp=meta[:, 3])
    # barrier: without it XLA fuses the bitcast slicing into downstream
    # arithmetic, perturbing contraction/vectorization choices by ±1 ULP
    # vs the unpacked-input graph; with it the unpacked tensors behave
    # like real parameters and the decode is bit-identical to the
    # compact-dict path
    core_meta, sc, pc = jax.lax.optimization_barrier(
        (core_meta, dict(sc_i=sc_i, sc_b=sc_b, sc_f=sc_f),
         dict(pc_i=pc_i, pc_b=pc_b)))
    return core_meta, sc, pc


def zeros_compact():
    """Silence-lane compact plan (parses to frame_plan._zeros_plan())."""
    sc_i = np.zeros(SC_I_N, np.int32)
    sc_i[I_EA0] = sc_i[I_EA1] = -1
    sc_b = np.zeros(SC_B_N, np.int8)
    sc_b[B_PB_LO:B_PB_LO + 96] = -1      # both grp maps: no band
    sc_b[B_LIMB:B_LIMB + 48] = -1
    sc_f = np.zeros(SC_F_N, np.float32)
    return dict(sc_i=sc_i, sc_b=sc_b, sc_f=sc_f)


def zeros_ps_compact():
    return dict(pc_i=np.zeros(PC_I_N, np.int32),
                pc_b=np.zeros(PC_B_N, np.int8))


# ---------------------------------------------------------------------------
# Host-side builders (mirror frame_plan.build_sbr_plan / build_ps_plan,
# advancing the identical host state: chirp, s_indexmapped, noise/sine phase)
# ---------------------------------------------------------------------------
def build_sbr_compact(sbr, ch: int, id_aac: int, dequant_done: bool) -> dict:
    """Compact analogue of frame_plan.build_sbr_plan (same host-state
    advance; the device expansion of this record reproduces that dense plan
    bit-for-bit — tests/test_compact_plan.py)."""
    d = sbr.data[ch]
    out = zeros_compact()
    sc_i, sc_b, sc_f = out["sc_i"], out["sc_b"], out["sc_f"]

    kx0, kx1 = sbr.kx
    m0, m1 = sbr.m
    sc_i[I_KX0], sc_i[I_KX1], sc_i[I_M0], sc_i[I_M1] = kx0, kx1, m0, m1
    sc_i[I_ITEMP] = max(2 * d.t_env_num_env_old - 32, 0)

    if not sbr.start:
        return out
    sc_i[I_START] = 1

    if not dequant_done:
        sbr_dequant(sbr, id_aac)

    e_orig, q_mapped, s_mapped = mapping(sbr, d, d.e_a)
    ne = d.bs_num_env
    sc_i[I_NE] = ne
    sc_f[F_EORIG:F_EORIG + 240] = e_orig[:E, :M].reshape(-1)
    qm = np.zeros((E, M), np.float32)
    qm[:ne] = q_mapped[:ne, :M]
    sc_f[F_QMAP:F_QMAP + 240] = qm.reshape(-1)
    smask = np.zeros((E, M), np.int8)
    smask[:ne] = (s_mapped[:ne, :M] > 0).astype(np.int8)
    smask[:ne] |= (d.s_indexmapped[1:ne + 1, :M] > 0).astype(np.int8) << 1
    sc_b[B_SMASK:B_SMASK + 240] = smask.reshape(-1)
    sc_i[I_EA0], sc_i[I_EA1] = int(d.e_a[0]), int(d.e_a[1])
    sc_f[F_LIMG] = LIMGAIN[sbr.bs_limiter_gains]

    for li in range(sbr.n_lim):
        lo = max(int(sbr.f_tablelim[li]) - kx1, 0)
        hi = max(int(sbr.f_tablelim[li + 1]) - kx1, 0)
        sc_b[B_LIMB + lo:B_LIMB + min(hi, M)] = li

    for e in range(ne):
        t0, t1 = int(d.t_env[e]), int(d.t_env[e + 1])
        sc_i[I_TENV + e] = 2 * t0
        if t1 > t0:
            sc_f[F_RECIP + e] = np.float32(0.5 / (t1 - t0))
        if d.bs_freq_res[e + 1]:
            sc_i[I_FRBITS] |= 1 << e
    # borders e..5 hold the final border so range tests see empty envelopes
    for e in range(ne, 6):
        sc_i[I_TENV + e] = 2 * int(d.t_env[ne])

    # grp-mean band maps: identity when interpol_freq=1
    if sbr.bs_interpol_freq:
        sc_b[B_PB_LO:B_PB_LO + 48] = np.arange(48, dtype=np.int8)
        sc_b[B_PB_HI:B_PB_HI + 48] = np.arange(48, dtype=np.int8)
        sc_f[F_IWLO:F_IWLO + 96] = 1.0
    else:
        for base, iw_base, (tab, nb) in (
                (B_PB_LO, F_IWLO, (sbr.f_tablelow, sbr.n[0])),
                (B_PB_HI, F_IWHI, (sbr.f_tablehigh, sbr.n[1]))):
            for pband in range(nb):
                lo = int(tab[pband]) - kx1
                hi_b = int(tab[pband + 1]) - kx1
                lo_c, hi_c = max(lo, 0), min(hi_b, M)
                wdt = hi_b - lo
                if wdt > 0 and hi_c > lo_c:
                    sc_b[base + lo_c:base + hi_c] = pband
                    sc_f[iw_base + lo_c:iw_base + hi_c] = \
                        np.float32(1.0 / wdt)

    # HF patch map + chirp state advance (aacsbr.c:1316-1409)
    chirp(sbr, d)
    sc_f[F_BW:F_BW + 5] = d.bw_array[:5]
    g = 0
    kk = kx1
    mi = 0
    for j in range(sbr.num_patches):
        for x in range(int(sbr.patch_num_subbands[j])):
            pband = int(sbr.patch_start_subband[j]) + x
            while g <= sbr.n_q and kk >= sbr.f_tablenoise[g]:
                g += 1
            g -= 1
            if mi < M:
                sc_b[B_SRC + mi] = pband
                sc_b[B_NOISB + mi] = max(g, 0)
            kk += 1
            mi += 1

    sc_i[I_HSL] = 4 * (not sbr.bs_smoothing_mode)
    sc_i[I_RESET] = int(bool(sbr.reset))
    sc_i[I_TOLD2] = 2 * int(d.t_env_num_env_old)
    sc_i[I_NOISE0] = int(d.f_indexnoise)
    sc_i[I_SINE0] = int(d.f_indexsine)
    # advance the noise/sine phase exactly like the dense builder
    nslots = 2 * (int(d.t_env[ne]) - int(d.t_env[0]))
    d.f_indexnoise = (d.f_indexnoise + nslots * m1) & 0x1FF
    d.f_indexsine = (d.f_indexsine + nslots) & 3
    return out


def build_ps_compact(ps, top: int, is34: int = 0) -> dict:
    """Compact analogue of frame_plan.build_ps_plan.

    Ships only the mapped parameter indices; the H-matrix assembly
    (aacps.c:865-935, LUT lookups + IPD/OPD phase smoothing) moves into
    the device graph, with the persistent H / ipd_hist / opd_hist state
    carried as device arrays.  The host no longer advances PS H state."""
    from ..ops import ps_np

    out = zeros_ps_compact()
    pc_i, pc_b = out["pc_i"], out["pc_b"]
    if ps is None or not ps.start:
        return out
    if int(ps.is34bands) != is34:
        raise NotImplementedError(
            "PS band mode differs from the stream's compiled mode")
    # is34bands_old != is34bands can only be the FIRST active PS frame here
    # (later flips raise in the planning decoder): the carried device H /
    # ipd/opd state is still all-zero, and the reference's transition fixup
    # (aacps.c:832-860 map_val + ipdopd_reset) maps zeros to zeros — no-op.
    pc_i[PI_ON] = 1
    pc_i[PI_IPD] = int(ps.enable_ipdopd)
    pc_i[PI_QUANT] = int(ps.iid_quant)
    pc_i[PI_NENV] = int(ps.num_env)
    pc_i[PI_ICCMODE] = int(ps.icc_mode)
    pc_i[PI_NIPD] = int(ps.nr_ipdopd_par)
    pc_i[PI_TOP] = int(top)
    for e in range(min(ps.num_env + 1, 6)):
        pc_i[PI_BORD + e] = int(ps.border_position[e])

    npar = P.NR_PAR_BANDS[is34]
    iid = ps_np._remap(ps.iid_par, ps.nr_iid_par, ps.num_env, 1, is34)
    icc = ps_np._remap(ps.icc_par, ps.nr_icc_par, ps.num_env, 1, is34)
    for e in range(ps.num_env):
        pc_b[PB_IID + 34 * e:PB_IID + 34 * e + npar] = iid[e][:npar]
        pc_b[PB_ICC + 34 * e:PB_ICC + 34 * e + npar] = icc[e][:npar]
    if ps.enable_ipdopd:
        ipd = ps_np._remap(ps.ipd_par, ps.nr_ipdopd_par, ps.num_env, 0, is34)
        opd = ps_np._remap(ps.opd_par, ps.nr_ipdopd_par, ps.num_env, 0, is34)
        nip = min(int(ps.nr_ipdopd_par), 17)
        for e in range(ps.num_env):
            pc_b[PB_IPD + 17 * e:PB_IPD + 17 * e + nip] = ipd[e][:nip]
            pc_b[PB_OPD + 17 * e:PB_OPD + 17 * e + nip] = opd[e][:nip]
    return out


# ---------------------------------------------------------------------------
# Device-side expansion (jax) — rebuilds the dense frame_plan tensors
# ---------------------------------------------------------------------------
def init_ps_hist(B: int):
    """Device-resident analogue of the reference's persistent PS state:
    H11..H22 planes [2 (re/im), 6 rows, 34 bands, 4 coeffs] + the IPD/OPD
    phase-smoothing histories (aacps.h:63-70)."""
    import jax.numpy as jnp
    return dict(H=jnp.zeros((B, 2, 6, 34, 4), jnp.float32),
                ipd_hist=jnp.zeros((B, 17), jnp.int32),
                opd_hist=jnp.zeros((B, 17), jnp.int32))


def expand_sbr(sc: dict) -> dict:
    """sc_i [B,SC_I_N] i32, sc_b [B,SC_B_N] i8, sc_f [B,SC_F_N] f32 ->
    the dense plan dict consumed by ops/sbr_jax (bit-identical to
    frame_plan.build_sbr_plan output)."""
    import jax.numpy as jnp

    sc_i, sc_b, sc_f = sc["sc_i"], sc["sc_b"], sc["sc_f"]
    B = sc_i.shape[0]
    f32 = jnp.float32
    col = lambda j: sc_i[:, j]

    start = col(I_START).astype(f32)
    kx0, kx1 = col(I_KX0)[:, None], col(I_KX1)[:, None]
    m0, m1 = col(I_M0)[:, None], col(I_M1)[:, None]
    ne = col(I_NE)[:, None]
    t2 = sc_i[:, I_TENV:I_TENV + 6]              # [B,6] 2*t_env
    h_sl = col(I_HSL)[:, None]
    reset = col(I_RESET)[:, None]
    told2 = col(I_TOLD2)[:, None]
    ea0, ea1 = col(I_EA0)[:, None], col(I_EA1)[:, None]
    frbits = col(I_FRBITS)[:, None]

    k64 = jnp.arange(64)[None, :]
    m48 = jnp.arange(M)[None, :]
    e5 = jnp.arange(E)[None, :]
    s38 = jnp.arange(38)[None, :]
    r42 = jnp.arange(42)[None, :]

    xlow_old = (k64 < kx0).astype(f32)
    xlow_new = (k64 < kx1).astype(f32)
    use_y_old = ((k64 >= kx0) & (k64 < kx0 + m0)).astype(f32)
    use_y_new = ((k64 >= kx1) & (k64 < kx1 + m1)).astype(f32)

    sb = lambda base, n: sc_b[:, base:base + n].astype(jnp.int32)
    src_of_m = sb(B_SRC, 48)
    noisb = sb(B_NOISB, 48)
    bw_arr = sc_f[:, F_BW:F_BW + 5]
    bw_of_m = jnp.take_along_axis(bw_arr, noisb.clip(0, 4), axis=1)
    hf_mask = (m48 < m1).astype(f32)
    bw_of_m = bw_of_m * hf_mask

    # gen_slot_mask over the 40 X_high slots (offset +2)
    s40 = jnp.arange(40)[None, :]
    ilo = t2[:, 0:1] + ENVELOPE_ADJUSTMENT_OFFSET
    ihi = t2[:, 5:6] + ENVELOPE_ADJUSTMENT_OFFSET
    gen_slot_mask = ((s40 >= ilo) & (s40 < ihi)).astype(f32)

    # envelope slot structure
    lo_e = t2[:, :5][:, :, None]                 # [B,5,1]
    hi_e = t2[:, 1:6][:, :, None]
    e_act = (e5 < ne)[:, :, None]                # [B,5,1]
    env_onehot = ((s38[:, None, :] >= lo_e) & (s38[:, None, :] < hi_e)
                  & e_act).astype(f32)           # [B,5,38]
    recip = sc_f[:, F_RECIP:F_RECIP + 5]
    freqres_sel = (((frbits >> e5) & 1) & (e5 < ne)).astype(f32)

    # grp-mean matrices from band-of-m maps (+ 1/width values)
    def grp(base, iw_base):
        pb = sb(base, 48)                        # [B,48]
        iw = sc_f[:, iw_base:iw_base + 48]       # [B,48]
        same = (pb[:, :, None] == pb[:, None, :]) & (pb >= 0)[:, :, None]
        return same.astype(f32) * iw[:, None, :]
    grp_mean = jnp.stack([grp(B_PB_LO, F_IWLO), grp(B_PB_HI, F_IWHI)], 1)

    limb = sb(B_LIMB, 48)
    l28 = jnp.arange(L)[None, :, None]
    lim_onehot = ((limb[:, None, :] == l28) & (limb >= 0)[:, None, :]
                  ).astype(f32)                  # [B,28,48]

    # dequantized envelope grids -> gain-calc inputs (frame_plan.py:130-140)
    e_orig = sc_f[:, F_EORIG:F_EORIG + 240].reshape(B, E, M)
    q_map = sc_f[:, F_QMAP:F_QMAP + 240].reshape(B, E, M)
    smask = sc_b[:, B_SMASK:B_SMASK + 240].reshape(B, E, M).astype(jnp.int32)
    s_pos = (smask & 1).astype(f32)
    s_idx = ((smask >> 1) & 1).astype(f32)
    mm = (m48 < m1).astype(f32)[:, None, :]      # [B,1,48]
    erow = (e5 < ne).astype(f32)[:, :, None]     # [B,5,1]
    temp = e_orig / (1.0 + q_map)
    q_m0 = jnp.sqrt(temp * q_map) * mm
    s_m0 = jnp.sqrt(temp * s_idx) * mm
    in_ea_e = ((e5 == ea0) | (e5 == ea1)).astype(f32)[:, :, None]
    delta = 1.0 - in_ea_e
    gain_num = e_orig * jnp.where(s_pos > 0, q_map, 1.0)
    den_q = 1.0 + q_map * jnp.where(s_pos > 0, 1.0, delta)
    den_q = jnp.where(erow > 0, den_q, 1.0)
    noisegate = erow * delta * (s_m0 == 0)

    # scatter m -> QMF band kx1+m
    scatter_m = ((k64[:, None, :] - kx1[:, :, None] == m48[:, :, None])
                 & (m48 < m1)[:, :, None]).astype(f32)   # [B,48,64]

    # g_temp/q_temp bookkeeping (frame_plan.py:196-209)
    t0_2 = t2[:, 0:1]
    env_of_r = (r42[:, None, :] - h_sl[:, :, None] >= lo_e) \
        & (r42[:, None, :] - h_sl[:, :, None] < hi_e) & e_act  # [B,5,42]
    reset_row = ((reset > 0) & (r42 >= t0_2)
                 & (r42 < t0_2 + h_sl))[:, None, :] \
        & (e5 == 0)[:, :, None]                  # [B,5,42]
    fill_map = jnp.swapaxes((env_of_r | reset_row).astype(f32), 1, 2)
    shuf = (reset == 0) & (h_sl > 0) & (r42 >= t0_2) & (r42 < t0_2 + 4)
    src = told2 + (r42 - t0_2)
    row_src = jnp.where(shuf & (src >= 0) & (src < 42), src, r42)

    # per-slot assembly maps (frame_plan.py:211-227)
    in_rng = (s38 >= t0_2) & (s38 < t2[:, 5:6])
    direct_row = jnp.where(in_rng, s38 + h_sl, s38)
    is_ea_slot = jnp.einsum("bes,be->bs", env_onehot,
                            in_ea_e[:, :, 0])
    smooth_on = jnp.where(in_rng, (h_sl > 0).astype(f32) * (1.0 - is_ea_slot),
                          0.0)
    noise_start = jnp.where(
        in_rng, (col(I_NOISE0)[:, None] + (s38 - t0_2) * m1) & 0x1FF, 0)
    phase = (col(I_SINE0)[:, None] + (s38 - t0_2)) & 3
    phi_re = jnp.asarray(np.array([1, 0, -1, 0], np.float32))
    phi_im = jnp.asarray(np.array([0, 1, 0, -1], np.float32))
    sign0 = (1 - 2 * (kx1 & 1)).astype(f32)
    sine_re = jnp.where(in_rng, jnp.take(phi_re, phase), 0.0)
    sine_im0 = jnp.where(in_rng, jnp.take(phi_im, phase) * sign0, 0.0)

    return dict(
        start=start, gain_num=gain_num, den_q=den_q, e_orig=e_orig * erow,
        q_m0=q_m0, s_m0=s_m0, noisegate=noisegate, lim_onehot=lim_onehot,
        limgain=sc_f[:, F_LIMG], env_onehot=env_onehot, recip=recip,
        src_of_m=src_of_m, bw_of_m=bw_of_m, hf_mask=hf_mask,
        gen_slot_mask=gen_slot_mask, row_src=row_src, fill_map=fill_map,
        smooth_on=smooth_on, direct_row=direct_row, noise_start=noise_start,
        sine_re=sine_re, sine_im0=sine_im0, grp_mean=grp_mean,
        freqres_sel=freqres_sel, i_temp=col(I_ITEMP),
        use_y_old=use_y_old, use_y_new=use_y_new, xlow_old=xlow_old,
        xlow_new=xlow_new, scatter_m=scatter_m)


def expand_ps(pc: dict, hist: dict, is34: int = 0):
    """pc_i [B,PC_I_N] i32, pc_b [B,PC_B_N] i8 + carried hist ->
    (dense ps plan dict for ops/ps_jax, new hist).

    Reproduces the reference H-matrix remapping/mixing prologue
    (aacps.c:816-935): row 0 <- previous frame's last-envelope row, rows
    e+1 <- HA/HB LUT with IPD/OPD phase smoothing; the imaginary plane for
    bands >= nr_ipdopd_par keeps its stale persistent values exactly like
    the reference arrays do."""
    import jax.numpy as jnp

    pc_i, pc_b = pc["pc_i"], pc["pc_b"]
    B = pc_i.shape[0]
    f32 = jnp.float32
    col = lambda j: pc_i[:, j]

    ps_on = col(PI_ON)
    on_f = ps_on.astype(f32)
    ipd_on_i = col(PI_IPD) * ps_on
    quant = col(PI_QUANT)
    num_env = col(PI_NENV)
    icc_mode = col(PI_ICCMODE)
    nipd = col(PI_NIPD)
    top = col(PI_TOP)
    bord = pc_i[:, PI_BORD:PI_BORD + 6]          # [B,6]

    HA, HB = P.mixing_luts()
    lut = jnp.asarray(np.concatenate([HA.reshape(-1, 4),
                                      HB.reshape(-1, 4)], 0))  # [736,4]
    pd_re_t, pd_im_t = P.pd_smooth()
    pd_re_t, pd_im_t = jnp.asarray(pd_re_t), jnp.asarray(pd_im_t)

    iid = pc_b[:, PB_IID:PB_IID + 170].reshape(B, 5, 34).astype(jnp.int32)
    icc = pc_b[:, PB_ICC:PB_ICC + 170].reshape(B, 5, 34).astype(jnp.int32)
    ipd = pc_b[:, PB_IPD:PB_IPD + 85].reshape(B, 5, 17).astype(jnp.int32)
    opd = pc_b[:, PB_OPD:PB_OPD + 85].reshape(B, 5, 17).astype(jnp.int32)

    base = jnp.where(icc_mode < 3, 0, 368)[:, None]           # [B,1]
    b17 = jnp.arange(17)[None, :]
    b34 = jnp.arange(34)[None, :]

    H = hist["H"]                                # [B,2,6,34,4]
    # frame prologue: row0 <- previous last-envelope row was done at the
    # END of the previous expansion (num_env_old == that frame's num_env)
    ipd_h, opd_h = hist["ipd_hist"], hist["opd_hist"]         # [B,17]

    rows_re = [H[:, 0, 0]]
    rows_im = [H[:, 1, 0]]
    npar_mask = (b34 < P.NR_PAR_BANDS[is34])[:, :, None]      # [1,34,1]
    for e in range(5):
        act = (e < num_env) & (ps_on > 0)                     # [B]
        flat = (base + (iid[:, e] + 7 + 23 * quant[:, None]) * 8
                + icc[:, e]).clip(0, 735)                     # [B,34]
        h4 = jnp.take(lut, flat, axis=0)                      # [B,34,4]
        # IPD/OPD phase smoothing for bands < nr_ipdopd_par
        ipd_act = act & (ipd_on_i > 0)
        bsel = b17 < nipd[:, None]                            # [B,17]
        upd = ipd_act[:, None] & bsel
        opd_idx = (opd_h * 8 + opd[:, e]).clip(0, 511)
        ipd_idx = (ipd_h * 8 + ipd[:, e]).clip(0, 511)
        opd_h = jnp.where(upd, opd_idx & 0x3F, opd_h)
        ipd_h = jnp.where(upd, ipd_idx & 0x3F, ipd_h)
        opd_re = jnp.take(pd_re_t, opd_idx)
        opd_im = jnp.take(pd_im_t, opd_idx)
        ipd_re = jnp.take(pd_re_t, ipd_idx)
        ipd_im = jnp.take(pd_im_t, ipd_idx)
        adj_re = opd_re * ipd_re + opd_im * ipd_im
        adj_im = opd_im * ipd_re - opd_re * ipd_im
        pad = lambda a: jnp.pad(a, ((0, 0), (0, 17)))         # 17 -> 34
        mul_re = jnp.stack([pad(opd_re), pad(adj_re),
                            pad(opd_re), pad(adj_re)], -1)    # [B,34,4]
        mul_im = jnp.stack([pad(opd_im), pad(adj_im),
                            pad(opd_im), pad(adj_im)], -1)
        bsel34 = jnp.pad(bsel, ((0, 0), (0, 17)))[:, :, None]
        do_ipd = ipd_act[:, None, None] & bsel34
        prev_re = H[:, 0, e + 1]
        prev_im = H[:, 1, e + 1]
        new_re = jnp.where(do_ipd, h4 * mul_re, h4)
        new_im = jnp.where(do_ipd, h4 * mul_im, prev_im)
        wr = act[:, None, None] & npar_mask
        rows_re.append(jnp.where(wr, new_re, prev_re))
        rows_im.append(jnp.where(wr, new_im, prev_im))

    H_re = jnp.stack(rows_re, 1)                 # [B,6,34,4]
    H_im = jnp.stack(rows_im, 1)
    # end-of-frame: row0 for the NEXT frame is this frame's row[num_env]
    idx = num_env.clip(0, 5)[:, None, None, None]
    last_re = jnp.take_along_axis(H_re, jnp.broadcast_to(
        idx, (B, 1, 34, 4)), axis=1)
    last_im = jnp.take_along_axis(H_im, jnp.broadcast_to(
        idx, (B, 1, 34, 4)), axis=1)
    H_next = jnp.stack([
        jnp.concatenate([last_re, H_re[:, 1:]], 1),
        jnp.concatenate([last_im, H_im[:, 1:]], 1)], 1)
    keep = (ps_on > 0)[:, None, None, None, None]
    new_hist = dict(
        H=jnp.where(keep, H_next, H),
        ipd_hist=jnp.where((ps_on > 0)[:, None], ipd_h, hist["ipd_hist"]),
        opd_hist=jnp.where((ps_on > 0)[:, None], opd_h, hist["opd_hist"]))

    # interpolation weights (frame_plan.py:336-347)
    n32 = jnp.arange(32)[None, None, :]          # [1,1,32]
    start_e = bord[:, :5][:, :, None]            # [B,5,1]
    stop_e = bord[:, 1:6][:, :, None]
    e_act = (jnp.arange(5)[None, :, None] < num_env[:, None, None]) \
        & (ps_on > 0)[:, None, None]
    valid = e_act & (stop_e > start_e) & (n32 > start_e) & (n32 <= stop_e)
    # single correctly-rounded division: bit-identical to the host builder
    # on every backend (a multiply by a reciprocal is not — see
    # frame_plan.build_ps_plan)
    den = jnp.where(stop_e > start_e, stop_e - start_e, 1).astype(f32)
    t = (n32 - start_e).astype(f32) / den
    Ws = jnp.concatenate([jnp.where(valid, 1.0 - t, 0.0),
                          jnp.zeros((B, 1, 32), f32)], 1)     # [B,6,32]
    We = jnp.concatenate([jnp.zeros((B, 1, 32), f32),
                          jnp.where(valid, t, 0.0)], 1)

    nrb = P.NR_BANDS[is34]
    k91 = jnp.arange(91)[None, :]
    topx = (top + nrb - 64).clip(0, 91)[:, None]
    top_mask = jnp.where(ps_on[:, None] > 0, (k91 < topx).astype(f32),
                         jnp.ones((B, 91), f32))

    plan = dict(ps_on=on_f,
                H=jnp.stack([H_re, H_im], 1),
                Ws=Ws, We=We, ipd_on=ipd_on_i.astype(f32),
                top_mask=top_mask)
    return plan, new_hist
