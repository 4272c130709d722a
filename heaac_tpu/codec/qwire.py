"""Quantized wire format v2: near-bitstream-entropy plans, expanded on device.

Motivation (measured 2026-08-16): the axon host->device tunnel sustains only
~40-90 MB/s regardless of payload content or shape (a ~500 MB fresh-process
burst rides at ~1.4 GB/s, after which every transfer is throttled).  The
round-1 compact format (codec/compact_plan.py) ships 7.6 KB per frame-lane
(4 KB dequantized f32 coeffs + 3.5 KB record) = 178 KB per audio-second:
a hard ~225-500x realtime ceiling.  This format ships ~0.3-0.5 KB per
frame-lane (~2x the raw AAC bitstream) by sending *quantized integers* and
performing dequantization and plan expansion inside the jitted graph:

  - Spectral coefficients travel as a byte-token stream (zero runs, packed
    small values, escapes) plus the scalefactor *indices*; the device
    rebuilds `(+-cbrt_tab[n]) * (+-pow2sf_tab[si])` with the extracted
    reference LUTs -- bit-exact to the host's floats (aacdec.c:988-1216
    does the same single multiply per value).  Positions that are not a
    plain cbrt*sf product (TNS-filtered windows, M/S, intensity, PNS,
    pulses) travel as raw f32 words.
  - SBR side-info travels as the raw integer codes (envelope/noise factors,
    invf modes, grid); the device performs sbr_dequant (aacsbr.c:1089) via
    exp2 LUTs indexed by the codes, the envelope->band mapping
    (aacsbr.c:1451) via gathers over the frequency-table band maps, and the
    chirp recursion (aacsbr.c:1316) on carried state.
  - Frequency tables and patch maps (static between SBR header resets,
    sbr.h:80-107) travel once per reset in a header block carried on device
    between frames.
  - PS parameters travel as the RAW entropy-coded ps_data bits (wire v5):
    the host parses only the fixed-width prefix (aacps.c:150-233) and the
    device runs the parameter Huffman decode (ops/ps_huff.py), the
    delta/limit logic, and the band-resolution remap, with the PSContext
    persistence carried as device state.

Token decode is fully parallel (no scan): every token is one byte whose
*advance* is a function of the byte alone, so output positions are an
exclusive cumsum, multi-byte payloads live in a separate extension stream
indexed by a second cumsum, and each of the 1024 output bins finds its
producing token by vectorized binary search over the cumsum.

Wire layout per frame-lane (all in one u8 heap, f32-viewed for transfer):
  [tokens ntok][ext n_ext][side side_len][header hdr_len (reset frames)]
with an 8-word i32 record (tok_off, ntok, n_ext, side_len, hdr_len, ...).

Token set (1 byte each):
  0x00        END / padding
  0x01-0x40   ZRUN(n=tok): advance n zeros
  0x41-0x71   PAIR: c=tok-0x41, (v0,v1) = (c//7-3, c%7-3)
  0x72-0x91   SINGLE: mag = 4 + (c & 15), sign = c>>4 (c=tok-0x72)
  0x92        ESC1: ext i8 value
  0x93        ESC2: ext i16 (LE) value
  0x94        SETSF: ext u16 (LE): bits0-8 pow2sf index, bit15 positive
  0x95-0x98   RAWRUN(n=tok-0x94): 4n ext bytes = n raw f32 (LE) values
  0x99-0xE9   QUAD: c=tok-0x99, v_k = (c // 3**k) % 3 - 1
  0xEA-0xFF   SETSF_DELTA: sf word += tok - 0xF5 (same sign, d in [-11,10])
"""
from __future__ import annotations

import numpy as np

from ..tables import ps_tables as P
from ..tables.aac_tables import cbrt_tab, pow2sf_tab

# ---- token constants --------------------------------------------------------
T_END = 0x00
T_ZRUN0 = 0x01          # ZRUN n = tok (1..64)
ZRUN_MAX = 64
T_PAIR0 = 0x41          # 49 codes
T_SGL0 = 0x72           # 32 codes, mag 4..19
T_ESC1 = 0x92
T_ESC2 = 0x93
T_SETSF = 0x94
T_RAW0 = 0x94           # RAWRUN n = tok - T_RAW0 (1..4)
RAW_MAX = 4
T_QUAD0 = 0x99          # 81 codes
T_QUAD_END = 0xE9
T_SFD_BASE = 0xF5       # SETSF_DELTA: d = tok - T_SFD_BASE in [-11, 10]

REC_W = 4               # i32 record words per frame-lane
R_TOKOFF = 0            # w0: heap byte offset of the lane payload
R_W1 = 1                # w1: ntok (u16) | n_ext (u16)<<16
R_W2 = 2                # w2: side_len (u16) | hdr_len (u8)<<16 | mode<<24
R_W3 = 3                # w3: reserved (specbits mode, see
                        # spec_huff.pack_spec_block:
                        # nbits(13) | nsec<<13 | sfidx0<<18 | flags<<27)


def spec_static_args(recs) -> dict:
    """The per-batch static sizes of the device spectral-Huffman decode
    (the jit specialization axes), read from a [.., REC_W] record array:
    NB (bit-axis width, 0 = no spec lanes), MS (any device-M/S pairs),
    NS (band-axis width), SEC (section-axis width).  Single reader of
    the w3 field layout — keep in sync with spec_huff.pack_spec_block."""
    import numpy as np
    w2 = np.asarray(recs[..., R_W2])
    w3 = np.asarray(recs[..., R_W3])
    spec = ((w2 >> 24) & 15) == 1
    if not spec.any():
        return dict(NB=0, MS=0, NS=52, SEC=8)
    w3s = w3[spec]
    nb = int((w3s & 0x1FFF).max())
    return dict(
        NB=max(256, -(-nb // 256) * 256),
        MS=int((((w3s >> 28) & 3) != 0).any()),
        NS=128 if ((w3s >> 30) & 1).any() else 52,
        SEC=max(8, -(-int(((w3s >> 13) & 31).max()) // 8) * 8))


def rows_pair_static(heap, recs) -> int:
    """1 iff any frame-lane ships coupled-CPE raw SBR rows (side flags
    bit 7 rows-mode AND bit 2 coupled), i.e. the scan graph needs the
    pair=True row-decode blocks (ops/sbr_huff).  `heap` is the packed
    byte heap (bytes/bytearray/u8 array), `recs` [.., REC_W] i32."""
    import numpy as np
    recs = np.asarray(recs)
    h = np.frombuffer(bytes(heap), np.uint8) if isinstance(
        heap, (bytes, bytearray)) else np.asarray(heap, np.uint8)
    if h.size == 0:
        return 0
    w1 = recs[..., R_W1]
    soff = (recs[..., R_TOKOFF] + (w1 & 0xFFFF) + ((w1 >> 16) & 0xFFFF))
    flags = h[np.clip(soff + 1, 0, h.size - 1)]
    return int(bool(((flags & 0x84) == 0x84).any()))

# ---- side block v2 (packed head) -------------------------------------------
# b0: ws(2) | kbd<<2 | err<<3 | hsl_on<<4 | ampres<<5 | bw_present<<6
#     | kxm0_diff<<7
# b1: start | reset<<1 | coupled<<2 | pan<<3 | addharm<<4 | ps_on<<5
# b2: ne(3) | nnoise(2)<<3 | sine0(2)<<5
# b3: frbits(5) | (e_a[0]+1)<<5
# b4: tqsel(5) | (e_a[1]+1)<<5
# b5..b10: t_env[0..5] in slots
# b11,b12: f_indexnoise u16 LE
# The round-2 head also shipped kx0/kx1/m0/m1/told2 and 20 bytes of chirp
# bw every frame; v2 derives kx1/m1 from the carried header block,
# told2 from a device carry (t_env[ne] of the previous start frame -- the
# update is idempotent on dataless frames because t_env persists), kx0/m0
# from kx1/m1 except on the rare frames where they differ (explicit bytes
# behind the kxm0_diff flag), and ships the chirp bw only when it changed
# (bw_present flag; the recursion stays on host, aacsbr.c:1316 -- XLA
# contracts the mul+add chain into fma and breaks bit-exactness).
SIDE_HEAD = 13
# optional blocks follow the head in this order:
#   [kx0 u8, m0 u8]      if kxm0_diff
#   [bw[5] f32 LE]       if bw_present
#   env codes ++ noise codes ++ addharm(6) ++ PS block   (as before)
# device gather window (wire cost is the actual block size; the worst case
# is an SCE raw-rows block at 640 B (ops/sbr_huff.RW) plus head/bw/
# addharm and a 4-envelope 34-band PS block incl. IPD/OPD at ~293 B)
SIDE_MAX = 1024

# PS sub-block v4 / wire v5 (byte offsets within the PS section): the
# entropy-coded half of ps_data (iid/icc rows + the extension container
# with ipd/opd) ships as RAW BITSTREAM BITS and decodes on device
# (ops/ps_huff.py); the host parses only the fixed-width prefix
# (header flags, frame class, borders — aacps.c:150-233 before the
# first READ_PAR_DATA) and bulk-copies the rest of the FIL payload.
# b0: penv(3, post-fixup) | header<<3 | quant<<4 | iccmode(3)<<5
# b1: iid_kind(2) | icc_kind(2)<<2 | enable_ext<<4 | bitoff(3)<<5
#     kind: 0/1/2 = 10/20/34-band native resolution, 3 = disabled
# b2: nipd (nr_ipdopd_par)
# b3: top
# b4..b9: border_position[0..5] (i8)
# b10: ne_pre(3, pre-fixup) | fresh<<3 | (rbits>>8)(4)<<4
# b11: rbits & 255
# then, iff fresh: ceil(rbits/8) raw region bytes starting at the byte
# that holds the first iid dt bit (bit `bitoff` of byte 0); rbits
# counts from that byte boundary to the end of the ps_data payload.
# Frames where PS is active but no ps_data arrived (fresh=0) replay the
# device-carried decoded rows (the reference's PSContext persistence).
PS_B0 = 0
PS_KND = 1
PS_NIPD = 2
PS_TOP = 3
PS_BORD = 4
PS_NE = 10
PS_RB = 11
PS_HEAD = 12
# iid/icc decode at NATIVE band resolution (nr_*_par); the device remaps
# to the 20/34-band mixing resolution via ps_np.REMAP_TABLES_FULL
# (aacps.c remap20/remap34), ipd/opd via REMAP_TABLES_PART.
PS_KIND_OF = {0: 3, 10: 0, 20: 1, 34: 2}
PS_WIDTH = [10, 20, 34, 0]


def ps_np_tables():
    """[to34][src_kind][34][9] device remap tables (see ops/ps_np)."""
    from ..ops import ps_np
    return ps_np.REMAP_TABLES_FULL


def ps_np_tables_part():
    """Same, for ipd/opd (src_kind 0/1/2 = 5/11/17 native bands)."""
    from ..ops import ps_np
    return ps_np.REMAP_TABLES_PART

# ---- header block -----------------------------------------------------------
H_N0, H_N1, H_NQ, H_NLIM, H_NPATCH, H_KX1, H_M1, H_FLAGS, H_LIMG = range(9)
H_TAB = 9          # f_tablelow(n0+1) ++ f_tablehigh(n1+1) ++
#                    f_tablenoise(nq+1) ++ f_tablelim(nlim+1) ++
#                    patch_start(np) ++ patch_num(np)
HDR_MAX = 144
# band-count maxima per 14496-3 via the max_qmf_subbands=48 regime
# (aacsbr.c:369: sr <= 32 kHz): freq_scale=0/alter_scale=0 can reach 48
# one-subband high-res bands
NB_HI = 48         # max high-res bands (f_tablehigh entries - 1)
NB_LO = 25
NB_Q = 5
NB_LIM = 28
NPATCH = 6

E, M = 5, 48


# =============================================================================
# Host-side emitters (numpy reference; mirrored by native/he_host.inc)
# =============================================================================
def emit_coeff_tokens(coef: np.ndarray, q: np.ndarray | None = None,
                      sfw: np.ndarray | None = None,
                      raw: np.ndarray | None = None):
    """Tokenize one 1024-coefficient lane -> (tokens u8, ext u8).

    q[1024] i32: quantized values (sign included); sfw[1024] u16: per-bin
    scalefactor word (bits0-8 pow2sf index, bit15 positive sign) valid where
    q != 0; raw[1024] bool: ship coef bits verbatim.  With q/sfw None the
    whole lane is shipped raw (Python-planner fallback lanes)."""
    toks = bytearray()
    ext = bytearray()
    if q is None:
        raw = np.ones(1024, bool)
        q = np.zeros(1024, np.int32)
        sfw = np.zeros(1024, np.uint16)
    raw = raw.astype(bool) if raw is not None else np.zeros(1024, bool)
    zero = (q == 0) & ~raw & (coef == 0)
    # positions that disagree with their q representation must go raw:
    # a q==0 bin with a nonzero coefficient has no token representation,
    # so auto-promote it into the raw set (the native emitter maintains
    # this invariant itself; this guards tooling/test callers)
    raw = raw | ((q == 0) & (np.asarray(coef) != 0))
    cur_sf = -1
    p = 0
    while p < 1024:
        if zero[p]:
            n = 1
            while p + n < 1024 and zero[p + n]:
                n += 1
            while n > 0:
                step = min(n, ZRUN_MAX)
                toks.append(T_ZRUN0 - 1 + step)
                n -= step
                p += step
            continue
        if raw[p]:
            n = 1
            while n < RAW_MAX and p + n < 1024 and raw[p + n]:
                n += 1
            toks.append(T_RAW0 + n)
            ext.extend(np.asarray(coef[p:p + n], np.float32).tobytes())
            p += n
            continue
        # plain value position: ensure sf in effect (1-byte delta when
        # the sign matches and the index step is small — the common case)
        if int(sfw[p]) != cur_sf:
            new_sf = int(sfw[p])
            d = new_sf - cur_sf if cur_sf >= 0 else 1 << 20
            if -11 <= d <= 10 and (new_sf & 0x8000) == (cur_sf & 0x8000):
                toks.append(T_SFD_BASE + d)
            else:
                toks.append(T_SETSF)
                ext.extend(int(new_sf).to_bytes(2, "little"))
            cur_sf = new_sf
        same = lambda i: (not zero[i]) and (not raw[i]) \
            and int(sfw[i]) == cur_sf
        v = int(q[p])
        # QUAD: 4 positions of |v|<=1 under one sf (zeros allowed inside)
        if (abs(v) <= 1 and p + 3 < 1024
                and all((zero[p + i] or same(p + i))
                        and abs(int(q[p + i])) <= 1 for i in range(4))):
            c = sum((int(q[p + i]) + 1) * 3 ** i for i in range(4))
            toks.append(T_QUAD0 + c)
            p += 4
            continue
        # PAIR: 2 positions of |v|<=3
        if (abs(v) <= 3 and p + 1 < 1024
                and (zero[p + 1] or (same(p + 1)
                                     and abs(int(q[p + 1])) <= 3))):
            v1 = int(q[p + 1])
            toks.append(T_PAIR0 + (v + 3) * 7 + (v1 + 3))
            p += 2
            continue
        av = abs(v)
        if 4 <= av <= 19:
            toks.append(T_SGL0 + ((v < 0) << 4) + (av - 4))
        elif av <= 127:
            toks.append(T_ESC1)
            ext.append(v & 0xFF)
        else:
            toks.append(T_ESC2)
            ext.extend(int(v & 0xFFFF).to_bytes(2, "little"))
        p += 1
    return bytes(toks), bytes(ext)


def build_side(sbr, ch: int, id_aac: int, err: int = 0,
               core_meta: dict | None = None, is34: int = 0) -> bytes:
    """SBR/PS side block for one lane (quantized codes, no host dequant).

    Mirrors compact_plan.build_sbr_compact's host-state advance (noise/sine
    phase) but ships the raw integer codes; mapping/dequant/chirp move into
    expand_frame.  ``sbr`` may be None (core-only / silence lane)."""
    from ..tables.aac_tables import TYPE_CPE

    b = bytearray(SIDE_HEAD)
    if core_meta is not None:
        b[0] = (int(core_meta.get("ws", 0)) & 3) \
            | ((int(core_meta.get("kbd", 0)) & 1) << 2) | ((err & 1) << 3)
    if sbr is None:
        return bytes(b)
    d = sbr.data[ch]
    coupled = int(id_aac == TYPE_CPE and sbr.bs_coupling)
    opt = bytearray()
    if int(sbr.kx[0]) != int(sbr.kx[1]) or int(sbr.m[0]) != int(sbr.m[1]):
        b[0] |= 1 << 7
        opt.append(int(sbr.kx[0]) & 0xFF)
        opt.append(int(sbr.m[0]) & 0xFF)
    if not sbr.start:
        return bytes(b + opt)
    ne = int(d.bs_num_env)
    b[0] |= ((1 * (not sbr.bs_smoothing_mode)) << 4) \
        | ((int(d.bs_amp_res) & 1) << 5)
    b[1] = (1 | (int(bool(sbr.reset)) << 1) | (coupled << 2)
            | ((coupled and ch == 1) << 3)
            | (int(bool(d.bs_add_harmonic_flag)) << 4))
    b[2] = ne | (int(d.bs_num_noise) << 3) | (int(d.f_indexsine) << 5)
    frbits = tqsel = 0
    for e in range(ne):
        if d.bs_freq_res[e + 1]:
            frbits |= 1 << e
        if d.bs_num_noise > 1 and d.t_env[e] >= d.t_q[1]:
            tqsel |= 1 << e
        b[5 + e] = int(d.t_env[e])
    for e in range(ne, 6):
        b[5 + e] = int(d.t_env[ne])
    b[3] = frbits | ((int(d.e_a[0]) + 1) << 5)
    b[4] = tqsel | ((int(d.e_a[1]) + 1) << 5)
    b[11:13] = int(d.f_indexnoise).to_bytes(2, "little")
    from ..ops.sbr_np import chirp
    chirp(sbr, d)
    bw_now = np.asarray(d.bw_array[:5], np.float32).copy()
    prev = getattr(d, "wire_bw_prev", None)
    if prev is None or prev.tobytes() != bw_now.tobytes():
        b[0] |= 1 << 6
        opt.extend(bw_now.tobytes())
        d.wire_bw_prev = bw_now

    b = b + opt
    rows_fresh = int(getattr(sbr, "wire_rows_fresh", 0))
    rows_el = (id_aac != TYPE_CPE and ch == 0) or id_aac == TYPE_CPE
    if rows_el and rows_fresh:
        sbr.wire_rows_mode = 1       # latched: see he_host.inc Sbr
    if rows_el and int(getattr(sbr, "wire_rows_mode", 0)) \
            and not int(getattr(sbr, "wire_rows_datab", 0)):
        # wire v5 raw-rows block: u16 LE rbits(13)|phase(3), then the
        # byte-aligned dtdf..noise region (device decode, ops/sbr_huff).
        # b[1] bit 6 is the flip-graph is34 flag; raw-rows rides bit 7.
        # Dataless frames ship rbits=0: the device replays its carried
        # decoded rows (delta regions are not idempotent).  Coupled CPE
        # frames ship the SAME region on both lanes (the device decodes
        # both channels' chained rows per lane, pair=True graphs).
        b[1] |= 1 << 7
        if rows_fresh:
            rb = int(sbr.wire_rows_rbits)
            ph = int(sbr.wire_rows_bitoff)
            b.extend((rb | (ph << 13)).to_bytes(2, "little"))
            b.extend(sbr.wire_rows_region[:(rb + 7) // 8])
            if id_aac != TYPE_CPE or ch == 1:
                sbr.wire_rows_fresh = 0
        else:
            b.extend(b"\x00\x00")
    else:
        # env codes: main channel (ch0) first, pan channel second when
        # coupled (sbr_dequant consumes E1/E2 jointly for both outputs)
        chs = [0, 1] if coupled else [ch]
        for c in chs:
            dd = sbr.data[c]
            for e in range(1, ne + 1):
                n = int(sbr.n[d.bs_freq_res[e]])
                b.extend(int(dd.env_facs[e][k]) & 0xFF for k in range(n))
        for c in chs:
            dd = sbr.data[c]
            for e in range(1, int(d.bs_num_noise) + 1):
                b.extend(int(dd.noise_facs[e][k]) & 0xFF
                         for k in range(int(sbr.n_q)))
    if d.bs_add_harmonic_flag:
        bits = 0
        for i in range(int(sbr.n[1])):
            bits |= int(bool(d.bs_add_harmonic[i])) << i
        b.extend(bits.to_bytes(6, "little"))
    ps = getattr(sbr, "ps", None)
    if ps is not None and ps.start and ch == 0 and id_aac != TYPE_CPE:
        b[1] |= 1 << 5
        # bit 6: THIS frame's PS band mode.  The static per-mode scan
        # graphs ignore it; the flip-capable graph (decode_batch's
        # band-mode-flip route) reads it per lane per frame.
        if is34:
            b[1] |= 1 << 6
        fresh = int(getattr(ps, "wire_fresh", 0))
        pb = bytearray(PS_HEAD)
        pb[PS_B0] = (int(ps.num_env)
                     | (int(getattr(ps, "wire_header", 0) if fresh else 0)
                        << 3)
                     | (int(ps.iid_quant) << 4)
                     | ((int(ps.icc_mode) & 7) << 5))
        iid_knd = PS_KIND_OF[int(ps.nr_iid_par)] if ps.enable_iid else 3
        icc_knd = PS_KIND_OF[int(ps.nr_icc_par)] if ps.enable_icc else 3
        bitoff = int(getattr(ps, "wire_bitoff", 0)) if fresh else 0
        pb[PS_KND] = (iid_knd | (icc_knd << 2)
                      | (int(ps.enable_ext) << 4) | (bitoff << 5))
        pb[PS_NIPD] = int(ps.nr_ipdopd_par)
        pb[PS_TOP] = int(sbr.kx[1] + sbr.m[1])
        for e2 in range(min(int(ps.num_env) + 1, 6)):
            pb[PS_BORD + e2] = int(ps.border_position[e2]) & 0xFF
        rbits = int(getattr(ps, "wire_rbits", 0)) if fresh else 0
        pb[PS_NE] = ((int(getattr(ps, "wire_ne_pre", 0)) & 7) if fresh
                     else 0) | (fresh << 3) | (((rbits >> 8) & 15) << 4)
        pb[PS_RB] = rbits & 0xFF
        b.extend(pb)
        if fresh:
            b.extend(ps.wire_region[:(rbits + 7) // 8])
            ps.wire_fresh = 0
    # advance the host noise/sine phase exactly like the other builders
    nslots = 2 * (int(d.t_env[ne]) - int(d.t_env[0]))
    d.f_indexnoise = (d.f_indexnoise + nslots * int(sbr.m[1])) & 0x1FF
    d.f_indexsine = (d.f_indexsine + nslots) & 3
    assert len(b) <= SIDE_MAX, len(b)
    return bytes(b)


def pack_nibbles(vals) -> bytes:
    """Low nibble first; each value must fit 4 bits (caller biases)."""
    out = bytearray((len(vals) + 1) // 2)
    for i, v in enumerate(vals):
        assert 0 <= v <= 15, v
        out[i >> 1] |= v << (4 * (i & 1))
    return bytes(out)


def build_header(sbr) -> bytes:
    """Header block: frequency tables + patch map (ships on reset frames;
    carried on device between resets).  aacsbr.c:304-575 outputs."""
    b = bytearray(H_TAB)
    n0, n1 = int(sbr.n[0]), int(sbr.n[1])
    nq, nlim = int(sbr.n_q), int(sbr.n_lim)
    npat = int(sbr.num_patches)
    b[H_N0], b[H_N1], b[H_NQ], b[H_NLIM] = n0, n1, nq, nlim
    b[H_NPATCH] = npat
    b[H_KX1], b[H_M1] = int(sbr.kx[1]), int(sbr.m[1])
    b[H_FLAGS] = int(bool(sbr.bs_interpol_freq))
    b[H_LIMG] = int(sbr.bs_limiter_gains)
    for tab, n in ((sbr.f_tablelow, n0 + 1), (sbr.f_tablehigh, n1 + 1),
                   (sbr.f_tablenoise, nq + 1), (sbr.f_tablelim, nlim + 1)):
        b.extend(int(tab[i]) & 0xFF for i in range(n))
    b.extend(int(sbr.patch_start_subband[j]) & 0xFF for j in range(npat))
    b.extend(int(sbr.patch_num_subbands[j]) & 0xFF for j in range(npat))
    assert len(b) <= HDR_MAX, len(b)
    return bytes(b)


def assemble_lane(tokens: bytes, ext: bytes, side: bytes,
                  header: bytes = b"") -> tuple[bytes, np.ndarray]:
    """One frame-lane's heap payload + its 4-word record (tok_off 0)."""
    rec = np.zeros(REC_W, np.int32)
    rec[R_W1] = len(tokens) | (len(ext) << 16)
    rec[R_W2] = len(side) | (len(header) << 16)
    return tokens + ext + side + header, rec


def assemble_spec_lane(block: bytes, w3: int, side: bytes,
                       header: bytes = b"") -> tuple[bytes, np.ndarray]:
    """Spec-mode frame-lane: raw spectral bits + section map instead of
    tokens (ops/spec_huff.py decodes on device).  mode=1 in w2."""
    rec = np.zeros(REC_W, np.int32)
    rec[R_W1] = len(block)
    rec[R_W2] = len(side) | (len(header) << 16) | (1 << 24)
    rec[R_W3] = w3
    return block + side + header, rec


def sfidx_from_sf(sf: float) -> int | None:
    """Recover the pow2sf index from a normal-band scalefactor value
    (sf == -pow2sf_tab[idx]; the table is strictly monotonic)."""
    pow2 = pow2sf_tab()
    idx = int(np.searchsorted(pow2, np.float32(-sf)))
    if 0 <= idx < len(pow2) and pow2[idx] == np.float32(-sf):
        return idx
    return None


def extract_bits(data: bytes, start: int, end: int) -> bytes:
    """MSB-aligned copy of bits [start, end) of ``data``."""
    nbits = end - start
    if nbits <= 0:
        return b""
    b0, b1 = start >> 3, (end + 7) >> 3
    x = int.from_bytes(data[b0:b1], "big")
    seg_bits = (b1 - b0) * 8
    x >>= seg_bits - (start & 7) - nbits      # keep the wanted bits
    x &= (1 << nbits) - 1
    pad = (-nbits) % 8
    return (x << pad).to_bytes((nbits + 7) // 8, "big")


def silence_lane() -> tuple[bytes, np.ndarray]:
    """Payload + record for a silence/padding lane."""
    toks = bytes([T_ZRUN0 - 1 + ZRUN_MAX]) * (1024 // ZRUN_MAX)
    return assemble_lane(toks, b"", bytes(SIDE_HEAD))


# =============================================================================
# Device-side LUTs (host-computed once; exp2 semantics identical to
# bitstream/sbr_syntax.sbr_dequant by construction)
# =============================================================================
def _luts():
    # clamp the exponent domain: legal streams never reach e where
    # exp2(e + 7) overflows f32 (~e > 120), but the LUT is built over the
    # full 128-code index range — without the clamp the tail entries emit
    # RuntimeWarning: overflow and go inf (harmless but alarming in logs)
    exp2 = lambda x: np.exp2(np.float32(min(x, 126.0)), dtype=np.float32)
    Ei = np.arange(128)
    lut = dict(
        cbrt=cbrt_tab(),
        pow2sf=pow2sf_tab(),
        # uncoupled env: exp2(alpha*E + 6), alpha = 1.0 / 0.5
        env=np.stack([np.array([exp2(0.5 * e + 6.0) for e in Ei]),
                      np.array([exp2(1.0 * e + 6.0) for e in Ei])]),
        # coupled: temp1 = exp2(E1*alpha + 7)
        env_c1=np.stack([np.array([exp2(0.5 * e + 7.0) for e in Ei]),
                         np.array([exp2(1.0 * e + 7.0) for e in Ei])]),
        # coupled: temp2 = exp2((pan_offset - E2) * alpha)
        env_c2=np.stack([np.array([exp2((24.0 - e) * 0.5) for e in Ei]),
                         np.array([exp2((12.0 - e) * 1.0) for e in Ei])]),
        # uncoupled noise: exp2(6 - Q)
        noise=np.array([exp2(6.0 - q) for q in range(64)]),
        # coupled noise: temp1 = exp2(6 - Q1 + 1), temp2 = exp2(12 - Q2)
        noise_c1=np.array([exp2(7.0 - q) for q in range(64)]),
        noise_c2=np.array([exp2(12.0 - q) for q in range(64)]),
        bw_tab=np.array([0.0, 0.75, 0.9, 0.98], np.float32),
        limgain=np.array([0.70795, 1.0, 1.41254, 1e10], np.float32),
    )
    return {k: np.ascontiguousarray(v, np.float32) for k, v in lut.items()}


_LUTS = None


def luts():
    global _LUTS
    if _LUTS is None:
        _LUTS = _luts()
    return _LUTS


# =============================================================================
# Device-side decode (jax)
# =============================================================================
def decode_coeffs_jax(heap, tok_off, ntok, S: int):
    """heap [N] i32 (u8 values), tok_off/ntok [B] -> coeffs [B, 1024] f32.

    Fully parallel: classify tokens, cumsum advances/ext sizes, binary-search
    each of the 1024 bins for its producing token, decode elementwise."""
    import jax
    import jax.numpy as jnp

    L = luts()
    cbrt = jnp.asarray(L["cbrt"])
    pow2 = jnp.asarray(L["pow2sf"])
    N = heap.shape[0]
    i = jnp.arange(S)[None, :]
    live = i < ntok[:, None]
    toks = jnp.where(live, heap[(tok_off[:, None] + i).clip(0, N - 1)], 0)
    is_zrun = (toks >= T_ZRUN0) & (toks <= T_ZRUN0 - 1 + ZRUN_MAX)
    is_pair = (toks >= T_PAIR0) & (toks < T_PAIR0 + 49)
    is_sgl = (toks >= T_SGL0) & (toks < T_SGL0 + 32)
    is_esc1 = toks == T_ESC1
    is_esc2 = toks == T_ESC2
    is_sf = toks == T_SETSF
    is_sfd = live & (toks >= 0xEA)
    is_raw = (toks > T_RAW0) & (toks <= T_RAW0 + RAW_MAX)
    is_quad = (toks >= T_QUAD0) & (toks <= T_QUAD_END)
    adv = (jnp.where(is_zrun, toks, 0) + 2 * is_pair + is_sgl + is_esc1
           + is_esc2 + jnp.where(is_raw, toks - T_RAW0, 0) + 4 * is_quad)
    cum = jnp.cumsum(adv, axis=1)
    start = cum - adv
    ext_sz = (is_esc1 + 2 * is_esc2 + 2 * is_sf
              + jnp.where(is_raw, 4 * (toks - T_RAW0), 0))
    ext0 = tok_off[:, None] + ntok[:, None]
    ext_pos = jnp.cumsum(ext_sz, axis=1) - ext_sz + ext0
    # scalefactor in effect at each token: the last absolute SETSF's word
    # plus the SETSF_DELTA sum since it (both prefix-computable)
    sf_at = jnp.where(is_sf, i, -1)
    last_sf = jax.lax.cummax(sf_at, axis=1)
    sf_ext = jnp.take_along_axis(ext_pos, last_sf.clip(0), axis=1)
    sfw_abs = (heap[sf_ext.clip(0, N - 1)]
               | (heap[(sf_ext + 1).clip(0, N - 1)] << 8))
    dlt = jnp.where(is_sfd, toks - T_SFD_BASE, 0)
    dcum = jnp.cumsum(dlt, axis=1)
    dbase = jnp.take_along_axis(dcum, last_sf.clip(0), axis=1)         * (last_sf >= 0)
    sfw = sfw_abs + dcum - dbase
    sf = jnp.where((sfw >> 15) & 1, 1.0, -1.0) * pow2[sfw & 511]
    sf = sf * (last_sf >= 0)
    # inverse map: which token covers output position p
    p = jnp.arange(1024)[None, :]
    B = toks.shape[0]
    lo = jnp.zeros((B, 1024), jnp.int32)
    hi = jnp.full((B, 1024), S, jnp.int32)
    for _ in range(S.bit_length()):
        mid = (lo + hi) >> 1
        cm = jnp.take_along_axis(cum, mid.clip(0, S - 1), axis=1)
        go = cm <= p
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    t_of = lo.clip(0, S - 1)
    covered = p < cum[:, -1:]
    g = lambda a: jnp.take_along_axis(a, t_of, axis=1)
    tok_p, start_p, sf_p, ext_p = g(toks), g(start), g(sf), g(ext_pos)
    k = p - start_p
    pairp = (tok_p >= T_PAIR0) & (tok_p < T_PAIR0 + 49)
    sglp = (tok_p >= T_SGL0) & (tok_p < T_SGL0 + 32)
    escp1 = tok_p == T_ESC1
    escp2 = tok_p == T_ESC2
    rawp = (tok_p > T_RAW0) & (tok_p <= T_RAW0 + RAW_MAX)
    quadp = (tok_p >= T_QUAD0) & (tok_p <= T_QUAD_END)
    c = tok_p - T_PAIR0
    vpair = jnp.where(k == 0, c // 7 - 3, c % 7 - 3)
    cq = tok_p - T_QUAD0
    # constant divisors only: TPU has no hardware integer division, and a
    # divide by a data-dependent value lowers to a catastrophically slow
    # expansion (measured: 3.1 s vs 5 ms for this whole decode)
    vquad = jnp.where(k == 0, cq % 3,
                      jnp.where(k == 1, (cq // 3) % 3,
                                jnp.where(k == 2, (cq // 9) % 3,
                                          (cq // 27) % 3))) - 1
    cs = tok_p - T_SGL0
    vsgl = jnp.where((cs >> 4) & 1, -(4 + (cs & 15)), 4 + (cs & 15))
    e0 = heap[ext_p.clip(0, N - 1)]
    e1 = heap[(ext_p + 1).clip(0, N - 1)]
    vesc = jnp.where(escp1, ((e0 ^ 128) - 128),
                     (((e0 | (e1 << 8)) ^ 32768) - 32768))
    v = (jnp.where(pairp, vpair, 0) + jnp.where(quadp, vquad, 0)
         + jnp.where(sglp, vsgl, 0) + jnp.where(escp1 | escp2, vesc, 0))
    mag = cbrt[jnp.abs(v).clip(0, 8191)]
    val = jnp.where(v < 0, -mag, mag) * sf_p
    rp = (ext_p + 4 * k).clip(0, N - 4)
    w32 = (heap[rp] | (heap[rp + 1] << 8) | (heap[rp + 2] << 16)
           | (heap[rp + 3] << 24)).astype(jnp.int32)
    rawv = jax.lax.bitcast_convert_type(w32, jnp.float32)
    out = jnp.where(rawp, rawv, jnp.where(v == 0, 0.0, val))
    return jnp.where(covered, out, 0.0)


def init_qcarry(B: int):
    """Cross-frame device state for the side expansion: carried header
    bytes, s_indexmapped, chirp bw, t_env[ne] of the previous start frame
    (the reference's t_env_num_env_old), window chain."""
    import jax.numpy as jnp
    # kx starts at 32 (the spec-typo pure-upsampling init, aacsbr.c:130):
    # lanes that never receive an SBR header — LFE, plain-LC lanes in a
    # multi-element stream — must pass X_low through all 32 core bands
    from ..ops import ps_huff
    hdr0 = jnp.zeros((B, HDR_MAX), jnp.int32).at[:, H_KX1].set(32)
    return dict(
        hdr=hdr0,
        s_idx=jnp.zeros((B, M), jnp.int32),
        bw=jnp.zeros((B, 5), jnp.float32),
        tend=jnp.zeros((B,), jnp.int32),
        ws_prev=jnp.zeros((B,), jnp.int32),
        kbd_prev=jnp.zeros((B,), jnp.int32),
        # wire-v5 PS entropy decode: cross-frame Huffman state + the last
        # decoded pc_b rows (replayed on frames without fresh ps_data)
        ps=ps_huff.init_ps_carry(B),
        ps_pcb=jnp.zeros((B, 510), jnp.int8),
        # wire-v5 SBR raw-rows decode: env/noise delta-chain seeds plus
        # the last decoded rows (replayed on dataless frames)
        sbrrows=_sbr_rows_carry(B),
        sbr_ec=jnp.zeros((B, 5, M), jnp.int32),
        sbr_qc=jnp.zeros((B, 2, NB_Q), jnp.int32),
        # coupled-CPE pan channel replay rows (rows_pair graphs)
        sbr_pc=jnp.zeros((B, 5, M), jnp.int32),
        sbr_qpc=jnp.zeros((B, 2, NB_Q), jnp.int32),
    )


def _sbr_rows_carry(B: int):
    from ..ops import sbr_huff
    return sbr_huff.init_rows_carry(B)


def expand_frame_jax(heap, rec, carry, is34: int = 0, rows_pair: int = 0):
    """rec [B, REC_W] i32 + heap + carry -> (core_meta, sbr dense plan,
    ps plan, new carry).  The device analogue of
    compact_plan.build_sbr_compact + expand_sbr and build_ps_compact +
    expand_ps, driven by integer codes (sbr_dequant/sbr_mapping/sbr_chirp:
    aacsbr.c:1089/1451/1316)."""
    import jax
    import jax.numpy as jnp

    from . import compact_plan as CP

    Lt = luts()
    f32 = jnp.float32
    B = rec.shape[0]
    N = heap.shape[0]
    tok_off = rec[:, R_TOKOFF]
    w1 = rec[:, R_W1]
    w2 = rec[:, R_W2]
    side_off = tok_off + (w1 & 0xFFFF) + ((w1 >> 16) & 0xFFFF)
    hdr_off = side_off + (w2 & 0xFFFF)
    has_hdr = ((w2 >> 16) & 0xFF) > 0

    gw = lambda off, n: heap[(off[:, None]
                              + jnp.arange(n)[None, :]).clip(0, N - 1)]
    side = gw(side_off, SIDE_MAX)                       # [B,SIDE_MAX]
    hdr_new = gw(hdr_off, HDR_MAX)
    hdr = jnp.where(has_hdr[:, None], hdr_new, carry["hdr"])

    sb = lambda j: side[:, j]
    hb = lambda j: hdr[:, j]
    core0 = sb(0)
    ws = core0 & 3
    kbd = (core0 >> 2) & 1
    err = (core0 >> 3) & 1
    hsl = 4 * ((core0 >> 4) & 1)
    ampres = (core0 >> 5) & 1
    bw_present = (core0 >> 6) & 1
    kxm0_diff = (core0 >> 7) & 1
    core_meta = dict(ws=ws, wsp=carry["ws_prev"], kbd=kbd,
                     kbdp=carry["kbd_prev"])
    flags = sb(1)
    start = flags & 1
    reset = (flags >> 1) & 1
    coupled = (flags >> 2) & 1
    pan = (flags >> 3) & 1
    addharm = (flags >> 4) & 1
    ps_on = (flags >> 5) & 1
    ne = sb(2) & 7
    nnoise = (sb(2) >> 3) & 3
    sine0 = (sb(2) >> 5) & 3
    frbits = sb(3) & 31
    ea0 = ((sb(3) >> 5) & 7) - 1
    tqsel = sb(4) & 31
    ea1 = ((sb(4) >> 5) & 7) - 1
    tenv = side[:, 5:11]                                # [B,6] slots
    noise0 = sb(11) | (sb(12) << 8)
    kx1, m1 = hb(H_KX1), hb(H_M1)
    # kx0/m0 equal kx1/m1 except on the frames that ship them explicitly
    # (the reset frame itself, aacsbr.c:958-959 assigns old <- new before
    # the header read); told2 comes from the device carry
    opt0 = jnp.full((B,), SIDE_HEAD, jnp.int32)
    g1 = lambda off: jnp.take_along_axis(
        side, off[:, None].clip(0, SIDE_MAX - 1), axis=1)[:, 0]
    kx0 = jnp.where(kxm0_diff > 0, g1(opt0), kx1)
    m0 = jnp.where(kxm0_diff > 0, g1(opt0 + 1), m1)
    told2 = 2 * carry["tend"]
    bw_off = opt0 + 2 * kxm0_diff
    bwb = jnp.stack([g1(bw_off + i) for i in range(20)], axis=1)\
        .reshape(B, 5, 4)
    bw_ship = jax.lax.bitcast_convert_type(
        (bwb[..., 0] | (bwb[..., 1] << 8) | (bwb[..., 2] << 16)
         | (bwb[..., 3] << 24)).astype(jnp.int32), jnp.float32)
    bw_now = jnp.where(bw_present[:, None] > 0, bw_ship, carry["bw"])
    side_head_end = bw_off + 20 * bw_present
    n0, n1 = hb(H_N0), hb(H_N1)
    nq, nlim = hb(H_NQ), hb(H_NLIM)
    npat = hb(H_NPATCH)
    interpol = hb(H_FLAGS) & 1
    limg = jnp.asarray(Lt["limgain"])[hb(H_LIMG).clip(0, 3)]
    t_lo = H_TAB
    flow = hdr[:, H_TAB:H_TAB + NB_LO + 1]              # [B,14]
    t_hi = t_lo + n0[:, None] + 1
    idx_of = lambda base, n: (base + jnp.arange(n)[None, :])\
        .clip(0, HDR_MAX - 1)
    fhigh = jnp.take_along_axis(hdr, idx_of(t_hi, NB_HI + 1), axis=1)
    t_q = t_hi + n1[:, None] + 1
    fnoise = jnp.take_along_axis(hdr, idx_of(t_q, NB_Q + 1), axis=1)
    t_lim = t_q + nq[:, None] + 1
    flim = jnp.take_along_axis(hdr, idx_of(t_lim, NB_LIM + 1), axis=1)
    t_ps = t_lim + nlim[:, None] + 1
    pstart = jnp.take_along_axis(hdr, idx_of(t_ps, NPATCH), axis=1)
    pnum = jnp.take_along_axis(hdr, idx_of(t_ps + npat[:, None], NPATCH),
                               axis=1)
    pnum = pnum * (jnp.arange(NPATCH)[None, :] < npat[:, None])

    m48 = jnp.arange(M)[None, :]
    kk = kx1[:, None] + m48                             # QMF band of m
    # band-of-m maps from the tables (validity: band index < count)
    def band_of(tab, cnt, nb):
        valid = (jnp.arange(nb + 1)[None, None, :] <= cnt[:, None, None])
        ge = (kk[:, :, None] >= tab[:, None, :nb + 1]) & valid
        idx = ge.sum(-1) - 1
        return jnp.where((idx >= 0) & (idx < cnt[:, None]), idx, -1)
    map_lo = band_of(flow, n0, NB_LO)
    map_hi = band_of(fhigh, n1, NB_HI)
    map_q = band_of(fnoise, nq, NB_Q)
    map_lim = band_of(flim, nlim, NB_LIM)
    # patch source band + noise band of m (aacsbr.c:1360-1409 walk)
    pcum = jnp.cumsum(pnum, axis=1)
    pj = (m48[:, :, None] >= pcum[:, None, :]).sum(-1)  # patch of m
    pj_c = pj.clip(0, NPATCH - 1)
    pbase = jnp.take_along_axis(pcum - pnum, pj_c, axis=1)
    src_raw = (jnp.take_along_axis(pstart, pj_c, axis=1)
               + m48 - pbase).clip(0, 63)
    mm = (m48 < m1[:, None])
    active = mm & (start > 0)[:, None]
    src_of_m = jnp.where(active, src_raw, 0)
    noisb = jnp.where(active, map_q.clip(0, NB_Q - 1), 0)

    # ---- sbr_dequant via LUTs (codes -> f32 values) ------------------------
    soff = side_head_end[:, None]
    e5 = jnp.arange(E)[None, :]
    res_e = (frbits[:, None] >> e5) & 1                 # [B,5]
    nb_e = jnp.where(res_e > 0, n1[:, None], n0[:, None]) \
        * (e5 < ne[:, None])
    env_off = soff + jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(nb_e, axis=1)[:, :4]], 1)
    env_total = nb_e.sum(1, keepdims=True)
    j22 = jnp.arange(NB_HI)[None, None, :]
    ecodes = jnp.take_along_axis(
        side, (env_off[:, :, None] + j22).clip(0, SIDE_MAX - 1)
        .reshape(B, -1), axis=1).reshape(B, E, NB_HI)
    pan_off = env_off + env_total * coupled[:, None]
    pcodes = jnp.take_along_axis(
        side, (pan_off[:, :, None] + j22).clip(0, SIDE_MAX - 1)
        .reshape(B, -1), axis=1).reshape(B, E, NB_HI)
    after_env = soff[:, 0] + env_total[:, 0] * (1 + coupled)
    nrow = jnp.arange(2)[None, :]
    nsz = nq[:, None] * (nrow < nnoise[:, None])
    noff = after_env[:, None] + jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), nsz[:, :1]], 1)
    j5 = jnp.arange(NB_Q)[None, None, :]
    qcodes = jnp.take_along_axis(
        side, (noff[:, :, None] + j5).clip(0, SIDE_MAX - 1)
        .reshape(B, -1), axis=1).reshape(B, 2, NB_Q)
    ntotal = nsz.sum(1)
    qpan_off = noff + (ntotal * coupled)[:, None]
    qpcodes = jnp.take_along_axis(
        side, (qpan_off[:, :, None] + j5).clip(0, SIDE_MAX - 1)
        .reshape(B, -1), axis=1).reshape(B, 2, NB_Q)
    after_noise = after_env + ntotal * (1 + coupled)

    # ---- wire-v5 raw-rows block (ops/sbr_huff) -----------------------------
    # flag bit 7: the env/noise code bytes are replaced by a u16 LE
    # rbits(13)|phase(3) field + the raw dtdf..noise region; rbits==0
    # replays the carried decoded rows (dataless frames).  `rows_pair`
    # (static) adds the coupled-CPE channel blocks to the graph: both
    # lanes of a coupled pair ship the same region and each decodes both
    # channels' chained rows (read_sbr_cpe, aacsbr.c:940-980).
    from ..ops import sbr_huff
    rows_on = ((flags >> 7) & 1) * start
    byte_act = (start > 0) & (rows_on == 0)
    rr_off = soff[:, 0]
    lp16 = g1(rr_off) | (g1(rr_off + 1) << 8)
    rr_rbits = (lp16 & 0x1FFF) * rows_on
    rr_phase = ((lp16 >> 13) & 7) * rows_on
    rr_bytes = (rr_rbits + 7) >> 3
    rows_live = (rows_on > 0) & (rr_rbits > 0)
    region = jnp.take_along_axis(
        side, ((rr_off + 2)[:, None]
               + jnp.arange(sbr_huff.RW)[None, :]).clip(0, SIDE_MAX - 1),
        axis=1)
    ec_r, pc_r, qc_r, qpc_r, _rows_ok, sbrrows_new = \
        sbr_huff.decode_sbr_rows_jax(
            region, rr_phase, rr_rbits, ne=ne, nnoise=nnoise,
            frbits=frbits, n0=n0, n1=n1, nq=nq,
            coupled=coupled if rows_pair else jnp.zeros_like(ne),
            ampres=ampres, active=rows_live, carry=carry["sbrrows"],
            pair=bool(rows_pair))
    # the host walk validated the region, so _rows_ok only trips on
    # wire corruption; the dequant clip bounds the fallout either way.
    # Byte-mode frames refresh the replay carries too (a CPE element can
    # demote per frame: uncoupled / oversize-region frames).
    ec_w = ec_r & 0xFF
    qc_w = qc_r & 0xFF
    er_last = jnp.where(rows_live[:, None, None], ec_w,
                        jnp.where(byte_act[:, None, None], ecodes,
                                  carry["sbr_ec"]))
    qr_last = jnp.where(rows_live[:, None, None], qc_w,
                        jnp.where(byte_act[:, None, None], qcodes,
                                  carry["sbr_qc"]))
    ecodes = jnp.where((rows_on > 0)[:, None, None], er_last, ecodes)
    qcodes = jnp.where((rows_on > 0)[:, None, None], qr_last, qcodes)
    if rows_pair:
        bcp = byte_act & (coupled > 0)
        pr_last = jnp.where(rows_live[:, None, None], pc_r & 0xFF,
                            jnp.where(bcp[:, None, None], pcodes,
                                      carry["sbr_pc"]))
        qpr_last = jnp.where(rows_live[:, None, None], qpc_r & 0xFF,
                             jnp.where(bcp[:, None, None], qpcodes,
                                       carry["sbr_qpc"]))
        pcodes = jnp.where((rows_on > 0)[:, None, None], pr_last, pcodes)
        qpcodes = jnp.where((rows_on > 0)[:, None, None], qpr_last,
                            qpcodes)
    else:
        pr_last = carry["sbr_pc"]
        qpr_last = carry["sbr_qpc"]
    after_noise = jnp.where(rows_on > 0, rr_off + 2 + rr_bytes,
                            after_noise)
    ah_off = after_noise
    ahb = lambda j: jnp.take_along_axis(
        side, (ah_off + j)[:, None].clip(0, SIDE_MAX - 1), axis=1)
    # 48 add-harmonic bits as two 24-bit planes (i32-safe shifts)
    ah_lo = (ahb(0) | (ahb(1) << 8) | (ahb(2) << 16)) * addharm[:, None]
    ah_hi = (ahb(3) | (ahb(4) << 8) | (ahb(5) << 16)) * addharm[:, None]
    ps_off = after_noise + 6 * addharm

    env_lut = jnp.asarray(Lt["env"])
    c1_lut = jnp.asarray(Lt["env_c1"])
    c2_lut = jnp.asarray(Lt["env_c2"])
    ar = ampres[:, None, None]
    ecl = ecodes.clip(0, 127)
    pcl = pcodes.clip(0, 127)
    # uncoupled / coupled channel values (sbr_dequant, aacsbr.c:1089-1128)
    v_unc = jnp.where(ar > 0, env_lut[1][ecl], env_lut[0][ecl])
    t1 = jnp.where(ar > 0, c1_lut[1][ecl], c1_lut[0][ecl])
    t2 = jnp.where(ar > 0, c2_lut[1][pcl], c2_lut[0][pcl])
    fac = t1 / (1.0 + t2)
    v_cpl = jnp.where(pan[:, None, None] > 0, fac * t2, fac)
    env_vals = jnp.where(coupled[:, None, None] > 0, v_cpl, v_unc)
    qcl = qcodes.clip(0, 63)
    qpl = qpcodes.clip(0, 63)
    nz_lut = jnp.asarray(Lt["noise"])
    n1_lut = jnp.asarray(Lt["noise_c1"])
    n2_lut = jnp.asarray(Lt["noise_c2"])
    q_unc = nz_lut[qcl]
    qt1 = n1_lut[qcl]
    qt2 = n2_lut[qpl]
    qfac = qt1 / (1.0 + qt2)
    q_cpl = jnp.where(pan[:, None, None] > 0, qfac * qt2, qfac)
    noise_vals = jnp.where(coupled[:, None, None] > 0, q_cpl, q_unc)

    # ---- sbr_mapping (aacsbr.c:1451-1496) ----------------------------------
    map_e = jnp.where(res_e[:, :, None] > 0, map_hi[:, None, :],
                      map_lo[:, None, :])               # [B,5,48]
    erow = (e5 < ne[:, None])[:, :, None] & (start > 0)[:, None, None]
    # where-mask, not multiply: garbage codes in inactive rows dequant to
    # inf and inf * 0 = nan
    e_orig = jnp.where(
        erow & mm[:, None, :],
        jnp.take_along_axis(env_vals, map_e.clip(0, NB_HI - 1), axis=2), 0.0)
    qsel = ((tqsel[:, None] >> e5) & 1)                 # [B,5]
    # per-envelope noise row: gather row qsel[e] then band map
    q_rows = jnp.take_along_axis(
        noise_vals, jnp.broadcast_to(qsel[:, :, None], (B, E, NB_Q))
        .clip(0, 1), axis=1)                            # [B,5,5]
    q_map = jnp.where(
        erow & mm[:, None, :],
        jnp.take_along_axis(q_rows, jnp.broadcast_to(
            map_q.clip(0, NB_Q - 1)[:, None, :], (B, E, M)), axis=2), 0.0)
    # s_indexmapped / s_mapped (uses the carried row 0 for every envelope)
    m_mid = (((fhigh[:, :NB_HI] + fhigh[:, 1:NB_HI + 1]) >> 1)
             - kx1[:, None])                            # [B,NB_HI]
    i_hi = jnp.arange(NB_HI)[None, :]
    ah_bits = jnp.where(i_hi < 24, (ah_lo >> i_hi) & 1,
                        (ah_hi >> (i_hi - 24).clip(0)) & 1)
    ah_bits = ah_bits * (i_hi < n1[:, None])
    ah_at_m = ((m48[:, :, None] == m_mid[:, None, :]) * ah_bits[:, None, :])\
        .sum(-1)                                        # [B,48]
    gate = ((e5 >= ea1[:, None])[:, :, None]
            | (carry["s_idx"] > 0)[:, None, :])         # [B,5,48]
    s_idxm = ah_at_m[:, None, :] * gate * erow          # [B,5,48] rows e+1
    same_e = (map_e[:, :, :, None] == map_e[:, :, None, :]) \
        & (map_e >= 0)[:, :, :, None]
    s_mapped = (jnp.einsum("bemn,ben->bem", same_e.astype(f32),
                           s_idxm.astype(f32)) > 0).astype(jnp.int32) \
        * erow * mm[:, None, :]
    s_idx_last = jnp.take_along_axis(
        s_idxm, jnp.broadcast_to((ne - 1).clip(0)[:, None, None],
                                 (B, 1, M)), axis=1)[:, 0]
    s_idx_next = jnp.where((start > 0)[:, None], s_idx_last, carry["s_idx"])

    # ---- assemble the dense plan (mirrors compact_plan.expand_sbr) ---------
    k64 = jnp.arange(64)[None, :]
    s38 = jnp.arange(38)[None, :]
    s40 = jnp.arange(40)[None, :]
    r42 = jnp.arange(42)[None, :]
    t2 = 2 * tenv      # [B,6] slot*2; entries ne..5 already hold the final
    #                    border (emitter convention, matches the builder)
    startf = (start & 1).astype(f32)
    xlow_old = (k64 < kx0[:, None]).astype(f32)
    xlow_new = (k64 < kx1[:, None]).astype(f32)
    use_y_old = ((k64 >= kx0[:, None])
                 & (k64 < (kx0 + m0)[:, None])).astype(f32)
    use_y_new = ((k64 >= kx1[:, None])
                 & (k64 < (kx1 + m1)[:, None])).astype(f32)
    # start-gated: the v1 head shipped zero bw bytes on non-start frames;
    # the carried bw would otherwise leak stale values into the plan
    bw_of_m = jnp.take_along_axis(bw_now, noisb, axis=1)
    hf_mask = mm.astype(f32)
    bw_of_m = bw_of_m * hf_mask * startf[:, None]
    EAO = 2  # ENVELOPE_ADJUSTMENT_OFFSET
    ilo = t2[:, 0:1] + EAO
    ihi = t2[:, 5:6] + EAO
    gen_slot_mask = ((s40 >= ilo) & (s40 < ihi)).astype(f32) * startf[:, None]
    lo_e = t2[:, :5][:, :, None]
    hi_e = t2[:, 1:6][:, :, None]
    e_act = (e5 < ne[:, None])[:, :, None] & (start > 0)[:, None, None]
    env_onehot = ((s38[:, None, :] >= lo_e) & (s38[:, None, :] < hi_e)
                  & e_act).astype(f32)
    dt_env = (tenv[:, 1:6] - tenv[:, :5]).astype(f32)
    recip = jnp.where((dt_env > 0) & (e5 < ne[:, None])
                      & (start > 0)[:, None],
                      f32(0.5) / jnp.where(dt_env > 0, dt_env, 1.0), 0.0)
    freqres_sel = (res_e & (e5 < ne[:, None]) & (start > 0)[:, None])\
        .astype(f32)

    # grp-mean maps: identity under interpol_freq, else band maps + 1/width
    def grp_maps(tab, cnt, bmap, nb):
        wdt = (tab[:, 1:nb + 1] - tab[:, :nb]).astype(f32)
        iw_band = jnp.where(
            (jnp.arange(nb)[None, :] < cnt[:, None]) & (wdt > 0),
            f32(1.0) / jnp.where(wdt > 0, wdt, 1.0), 0.0)
        iw = jnp.take_along_axis(iw_band, bmap.clip(0, nb - 1), axis=1) \
            * (bmap >= 0)
        return iw
    ident = interpol[:, None] > 0
    pb_lo = jnp.where(ident, m48, jnp.where((start > 0)[:, None], map_lo,
                                            -1))
    pb_hi = jnp.where(ident, m48, jnp.where((start > 0)[:, None], map_hi,
                                            -1))
    iw_lo = jnp.where(ident, 1.0, grp_maps(flow, n0, map_lo, NB_LO))
    iw_hi = jnp.where(ident, 1.0, grp_maps(fhigh, n1, map_hi, NB_HI))
    iw_lo = iw_lo * (start > 0)[:, None]
    iw_hi = iw_hi * (start > 0)[:, None]
    # builder writes identity maps only for start frames; zeros_compact
    # (silence / not-start) carries pb = -1 rows
    pb_lo = jnp.where((start > 0)[:, None], pb_lo, -1)
    pb_hi = jnp.where((start > 0)[:, None], pb_hi, -1)
    same_lo = (pb_lo[:, :, None] == pb_lo[:, None, :]) \
        & (pb_lo >= 0)[:, :, None]
    same_hi = (pb_hi[:, :, None] == pb_hi[:, None, :]) \
        & (pb_hi >= 0)[:, :, None]
    grp_mean = jnp.stack([same_lo.astype(f32) * iw_lo[:, None, :],
                          same_hi.astype(f32) * iw_hi[:, None, :]], 1)
    limb = jnp.where((start > 0)[:, None], map_lim, -1)
    l28 = jnp.arange(NB_LIM)[None, :, None]
    lim_onehot = ((limb[:, None, :] == l28)
                  & (limb >= 0)[:, None, :]).astype(f32)

    smask_pos = s_mapped.astype(f32)
    s_idx_f = s_idxm.astype(f32)
    in_ea_e = ((e5 == ea0[:, None]) | (e5 == ea1[:, None]))\
        .astype(f32)[:, :, None]
    delta = 1.0 - in_ea_e
    temp = e_orig / (1.0 + q_map)
    q_m0 = jnp.sqrt(temp * q_map) * mm[:, None, :]
    s_m0 = jnp.sqrt(temp * s_idx_f) * mm[:, None, :]
    erow_f = erow.astype(f32)
    gain_num = e_orig * jnp.where(smask_pos > 0, q_map, 1.0)
    den_q = 1.0 + q_map * jnp.where(smask_pos > 0, 1.0, delta)
    den_q = jnp.where(erow_f > 0, den_q, 1.0)
    noisegate = erow_f * delta * (s_m0 == 0)
    scatter_m = ((k64[:, None, :] - kx1[:, None, None] == m48[:, :, None])
                 & mm[:, :, None]).astype(f32)

    t0_2 = t2[:, 0:1]
    hslc = hsl[:, None]
    env_of_r = (r42[:, None, :] - hslc[:, :, None] >= lo_e) \
        & (r42[:, None, :] - hslc[:, :, None] < hi_e) & e_act
    reset_row = ((reset[:, None] > 0) & (r42 >= t0_2)
                 & (r42 < t0_2 + hslc))[:, None, :] \
        & (e5 == 0)[:, :, None]
    fill_map = jnp.swapaxes((env_of_r | reset_row).astype(f32), 1, 2)
    shuf = (reset[:, None] == 0) & (hslc > 0) & (r42 >= t0_2) \
        & (r42 < t0_2 + 4) & (start > 0)[:, None]
    src = told2[:, None] + (r42 - t0_2)
    row_src = jnp.where(shuf & (src >= 0) & (src < 42), src, r42)
    in_rng = (s38 >= t0_2) & (s38 < t2[:, 5:6]) & (start > 0)[:, None]
    direct_row = jnp.where(in_rng, s38 + hslc, s38)
    is_ea_slot = jnp.einsum("bes,be->bs", env_onehot, in_ea_e[:, :, 0])
    smooth_on = jnp.where(in_rng, (hslc > 0).astype(f32) * (1.0 - is_ea_slot),
                          0.0)
    noise_start = jnp.where(
        in_rng, (noise0[:, None] + (s38 - t0_2) * m1[:, None]) & 0x1FF, 0)
    phase = (sine0[:, None] + (s38 - t0_2)) & 3
    phi_re = jnp.asarray(np.array([1, 0, -1, 0], np.float32))
    phi_im = jnp.asarray(np.array([0, 1, 0, -1], np.float32))
    sign0 = (1 - 2 * (kx1[:, None] & 1)).astype(f32)
    sine_re = jnp.where(in_rng, jnp.take(phi_re, phase), 0.0)
    sine_im0 = jnp.where(in_rng, jnp.take(phi_im, phase) * sign0, 0.0)
    itemp = (told2 - 32).clip(0)

    plan = dict(
        start=startf, gain_num=gain_num, den_q=den_q,
        e_orig=e_orig * erow_f, q_m0=q_m0, s_m0=s_m0, noisegate=noisegate,
        lim_onehot=lim_onehot, limgain=limg * (start > 0),
        env_onehot=env_onehot, recip=recip, src_of_m=src_of_m,
        bw_of_m=bw_of_m, hf_mask=hf_mask, gen_slot_mask=gen_slot_mask,
        row_src=row_src, fill_map=fill_map, smooth_on=smooth_on,
        direct_row=direct_row, noise_start=noise_start, sine_re=sine_re,
        sine_im0=sine_im0, grp_mean=grp_mean, freqres_sel=freqres_sel,
        i_temp=itemp, use_y_old=use_y_old, use_y_new=use_y_new,
        xlow_old=xlow_old, xlow_new=xlow_new, scatter_m=scatter_m)

    # ---- PS block -> pc_i / pc_b equivalents (wire v5) ---------------------
    # The head ships the fixed-width fields every PS frame; the entropy
    # half arrives as raw bits (fresh frames) and decodes on device via
    # ops/ps_huff; dataless frames replay the carried pc_b rows.
    from ..ops import ps_huff

    pg = lambda off, n: jnp.take_along_axis(
        side, (off[:, None] + jnp.arange(n)[None, :]).clip(0, SIDE_MAX - 1),
        axis=1)
    psb = pg(ps_off, PS_HEAD)
    pb0 = psb[:, PS_B0]
    penv = (pb0 & 7) * ps_on
    ps_hdr = ((pb0 >> 3) & 1) * ps_on
    pquant = ((pb0 >> 4) & 1) * ps_on
    pknd = psb[:, PS_KND] * ps_on
    enable_ext = (pknd >> 4) & 1
    bitoff = (pknd >> 5) & 7
    nipd = (psb[:, PS_NIPD] * ps_on).clip(0, 17)
    nb10 = psb[:, PS_NE] * ps_on
    ne_pre = nb10 & 7
    fresh = (nb10 >> 3) & 1
    rbits = (psb[:, PS_RB] * ps_on) | (((nb10 >> 4) & 15) << 8)
    live = ps_on * fresh
    if is34 == -1:
        # flip-capable graph: the band mode is per lane per frame, read
        # from side bit 6 (build_side); the remap target follows it
        m34 = ((flags >> 6) & 1) * ps_on
    else:
        m34 = None
    widths = jnp.asarray(PS_WIDTH, jnp.int32)
    nr_iid = jnp.take(widths, pknd & 3)                 # 0 when kind==3
    nr_icc = jnp.take(widths, (pknd >> 2) & 3)
    region = pg(ps_off + PS_HEAD, ps_huff.RW)
    iid_n, icc_n, ipd_n, opd_n, pd_on, ok_now, psc2 = \
        ps_huff.decode_ps_region_jax(
            region, start_off=bitoff * live, rbits=rbits * live,
            enable_iid=(nr_iid > 0).astype(jnp.int32) * live,
            iq=pquant * live, nr_iid=nr_iid * live,
            enable_icc=(nr_icc > 0).astype(jnp.int32) * live,
            nr_icc=nr_icc * live, enable_ext=enable_ext * live,
            ne_pre=ne_pre * live, penv=penv * live, nipd=nipd * live,
            header=ps_hdr * live, carry=carry["ps"])
    ok_eff = jnp.where(fresh > 0, ok_now, carry["ps"]["ps_ok"]) \
        .clip(0, 1) * ps_on
    ipdopd_on = jnp.where(fresh > 0, pd_on,
                          carry["ps"]["pd_enable"]).clip(0, 1) * ps_on
    pc_i = jnp.zeros((B, CP.PC_I_N), jnp.int32)
    pc_i = pc_i.at[:, CP.PI_ON].set(ok_eff)
    pc_i = pc_i.at[:, CP.PI_IPD].set(ipdopd_on)
    pc_i = pc_i.at[:, CP.PI_QUANT].set(pquant)
    pc_i = pc_i.at[:, CP.PI_NENV].set(penv)
    pc_i = pc_i.at[:, CP.PI_ICCMODE].set(((pb0 >> 5) & 7) * ps_on)
    pc_i = pc_i.at[:, CP.PI_NIPD].set(psb[:, PS_NIPD] * ps_on)
    pc_i = pc_i.at[:, CP.PI_TOP].set(psb[:, PS_TOP] * ps_on)
    bords = ((psb[:, PS_BORD:PS_BORD + 6] ^ 128) - 128) \
        * ps_on[:, None]                                # i8 semantics
    pc_i = pc_i.at[:, CP.PI_BORD:CP.PI_BORD + 6].set(bords)

    # mixing-resolution remap (aacps.c remap20/remap34) on device
    if m34 is None:
        tabs = jnp.asarray(ps_np_tables()[is34])         # [3][34][9]
        tabs_p = jnp.asarray(ps_np_tables_part()[is34])
        tab_of = lambda tt, kind: jnp.take(tt, kind.clip(0, 2), axis=0)
    else:
        both = jnp.asarray(ps_np_tables()).reshape(6, 34, 9)
        both_p = jnp.asarray(ps_np_tables_part()).reshape(6, 34, 9)
        tabs, tabs_p = both, both_p
        tab_of = lambda tt, kind: jnp.take(
            tt, (m34 * 3 + kind.clip(0, 2)).clip(0, 5), axis=0)

    def remap_dev(vals, kind, tt):
        """vals [B,5,34] at native resolution -> mixing resolution via
        out[i] = tdiv(sum_j w_j*vals[s_j], den) (C truncation; den==0
        rows are 0, which also zeroes past the target width)."""
        tab = tab_of(tt, kind)                           # [B,34,9]
        s = jnp.broadcast_to(tab[:, :, 0:4].reshape(B, 1, 136),
                             (B, 5, 136))
        g = jnp.take_along_axis(vals, s, axis=2).reshape(B, 5, 34, 4)
        num = (g * tab[:, None, :, 4:8]).sum(-1)
        den = tab[:, None, :, 8]
        q = jnp.sign(num) * (jnp.abs(num) // jnp.maximum(den, 1))
        return jnp.where(den > 0, q, 0)

    iid = remap_dev(iid_n, pknd & 3, tabs)
    icc = remap_dev(icc_n, (pknd >> 2) & 3, tabs)
    # ipd/opd: native 5/11/17 bands -> part kind 0/1/2; the host builder
    # writes only the first nr_ipdopd_par values per row (compact_plan
    # build_ps_compact), so mask past nipd
    pkind = (nipd >= 11).astype(jnp.int32) + (nipd >= 17)
    j17 = jnp.arange(17)[None, None, :]
    pad = jnp.zeros((B, 5, 17), jnp.int32)

    def part_remap(rows):
        full = jnp.concatenate([rows, pad], axis=2)      # [B,5,34]
        out = remap_dev(full, pkind, tabs_p)[:, :, :17]
        return jnp.where(j17 < nipd[:, None, None], out, 0)
    ipd = part_remap(ipd_n)
    opd = part_remap(opd_n)
    pc_b_new = jnp.concatenate([
        iid.reshape(B, 170), icc.reshape(B, 170),
        ipd.reshape(B, 85), opd.reshape(B, 85)], axis=1).astype(jnp.int8)
    pc_b = jnp.where((live > 0)[:, None], pc_b_new, carry["ps_pcb"])
    pc_b = jnp.where((ps_on > 0)[:, None], pc_b, 0)
    pc = dict(pc_i=pc_i, pc_b=pc_b)
    if m34 is not None:
        pc["m34"] = m34

    upd = live > 0
    ps_carry_new = {
        k: jnp.where(upd.reshape((B,) + (1,) * (v.ndim - 1)), v,
                     carry["ps"][k])
        for k, v in psc2.items()}
    # byte-mode lanes keep the raw-rows chain seeds consistent so a
    # (hypothetical) mid-stream mode switch still chains correctly; the
    # wrapped byte values equal the unwrapped chain for legal streams
    laste = (ne - 1).clip(0, 4)
    lastq = (nnoise - 1).clip(0, 1)

    def _rowat(rows, idx, w):
        return jnp.take_along_axis(
            rows, idx[:, None, None] * jnp.ones((1, 1, w), jnp.int32),
            axis=1)[:, 0]
    el = sbrrows_new["env_last"]
    nl = sbrrows_new["noise_last"]
    fl = sbrrows_new["fr_last"]
    fr_new = (frbits >> laste) & 1
    sbrrows_carry = dict(
        env_last=jnp.stack(
            [jnp.where(byte_act[:, None], _rowat(ecodes, laste, M),
                       el[:, 0]),
             jnp.where((byte_act & (coupled > 0))[:, None],
                       _rowat(pcodes, laste, M), el[:, 1])], axis=1),
        noise_last=jnp.stack(
            [jnp.where(byte_act[:, None], _rowat(qcodes, lastq, NB_Q),
                       nl[:, 0]),
             jnp.where((byte_act & (coupled > 0))[:, None],
                       _rowat(qpcodes, lastq, NB_Q), nl[:, 1])], axis=1),
        fr_last=jnp.stack(
            [jnp.where(byte_act, fr_new, fl[:, 0]),
             jnp.where(byte_act & (coupled > 0), fr_new, fl[:, 1])],
            axis=1))
    new_carry = dict(
        hdr=hdr, s_idx=s_idx_next, bw=bw_now,
        tend=jnp.where(start > 0, jnp.take_along_axis(
            tenv, ne.clip(0, 5)[:, None], axis=1)[:, 0], carry["tend"]),
        ws_prev=jnp.where(err > 0, 0, ws),
        kbd_prev=jnp.where(err > 0, 0, kbd),
        ps=ps_carry_new,
        ps_pcb=jnp.where(upd[:, None], pc_b_new, carry["ps_pcb"]),
        sbrrows=sbrrows_carry,
        sbr_ec=er_last,
        sbr_qc=qr_last,
        sbr_pc=pr_last,
        sbr_qpc=qpr_last)
    return core_meta, plan, pc, new_carry
