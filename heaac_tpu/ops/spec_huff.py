"""Parallel AAC spectral-Huffman decode on device.

The reference decodes spectra with a serial bit-cursor VLC loop
(aacdec.c:988-1216, `GET_VLC` + sign/escape reads) — the one loop SURVEY
§3.5 flags as unvectorizable.  That is true for a *cursor*; it is not true
for the *stream*: on a TPU the decode becomes data-parallel by speculating
at every bit offset and resolving the true code chain afterwards:

  1. classify every bit offset i of the spectral section: look up the
     16-bit window at i in a per-codebook flat table -> (code length,
     values, #sign bits, escape flag); compute the full advance (code +
     signs + cb11 escape sequences) elementwise;
  2. resolve the chain with binary lifting: J_0[i] = i + adv[i],
     J_{k+1} = J_k o J_k; the start offset of the j-th code is then the
     jump-composition of the bits of j — log2(NC) gathers, no scan;
  3. map output bins to codes with the same cumsum + binary-search
     machinery as the token decoder and dequantize in place.

The wire ships the *raw bitstream bits* of the scalefactor AND spectral
regions (plus a 3-byte-per-section map) — the bitstream's own entropy,
~1.9x smaller than the byte-token encoding — and the scalefactor
delta chain decodes on device with the same speculate+lift scheme
(19-bit flat sf table).  The host parser only *length-walks* the
regions instead of decoding them.

Bit conventions match get_bits.h: MSB-first within bytes.  Escape
sequences (codebook 11, |v|==16): N leading 1s, a 0, then N+4 mantissa
bits; value = 2^(N+4) + mantissa (aacdec.c:1177-1207).  Sign bits follow
the codeword, one per nonzero value, 1 = negative (aacdec.c:1085-1174).
"""
from __future__ import annotations

import functools

import numpy as np

from ..tables import aac_tables as T

SEC_MAX = 31          # wire bound: sections per lane (5-bit w3 field;
                      # the device sizes its section axis per batch)
NS_MAX = 52           # swb count bound (num_swb_1024 <= 51)
NC_MAX = 512          # codes per lane (pairs cover 1024 bins)

# LUT entry (u32), indexed by [cb-1, 16-bit window]:
#   bits 0-4   code length in bits (31 = invalid window)
#   bits 5-7   number of nonzero values (== sign-bit count, unsigned cbs)
#   bits 8-23  values: dim-4 cbs 4x4 bits (v+4); dim-2 cbs 2x8 bits (v+64)
#   bit  24    escape flag (cb11, some |v| == 16)
_LUT = None


def _build_luts() -> np.ndarray:
    luts = np.zeros((11, 1 << 16), np.uint32)
    for cb in range(1, 12):
        dim, lav, signed = T.CODEBOOK_INFO[cb]
        codes, bits = T.spectral_codes(cb)
        tup = T.codebook_tuples(cb)
        ent = np.full(1 << 16, 31, np.uint32)  # invalid sentinel
        for ci in range(len(codes)):
            ln = int(bits[ci])
            vals = tup[ci]
            nnz = int(np.count_nonzero(vals))
            packed = 0
            if dim == 4:
                for d in range(4):
                    packed |= (int(vals[d]) + 4) << (8 + 4 * d)
            else:
                for d in range(2):
                    packed |= (int(vals[d]) + 64) << (8 + 8 * d)
            esc = int(cb == 11 and np.any(np.abs(vals) == 16))
            e = ln | (nnz << 5) | packed | (esc << 24)
            base = int(codes[ci]) << (16 - ln)
            ent[base:base + (1 << (16 - ln))] = e
        luts[cb - 1] = ent
    return luts


def luts() -> np.ndarray:
    global _LUT
    if _LUT is None:
        _LUT = _build_luts()
    return _LUT


CB_DIM = np.array([0, 4, 4, 4, 4, 2, 2, 2, 2, 2, 2, 2], np.int32)
CB_UNSIGNED = np.array([0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 1], np.int32)

SFB = 768             # sf-region classify width in bits (codes are 1-19
                      # bits x <=120 bands; emitters gate the region size)
_SF_LUT = None


def sf_lut() -> np.ndarray:
    """[2^19] u32 scalefactor-huffman table: len (bits 0-4, 31 = invalid)
    | value index 0..120 << 5 (delta = idx - 60; aactab.c sf codebook)."""
    global _SF_LUT
    if _SF_LUT is None:
        codes, bits = T.scalefactor_codes()
        ent = np.full(1 << 19, 31, np.uint32)
        for ci in range(len(codes)):
            ln = int(bits[ci])
            base = int(codes[ci]) << (19 - ln)
            ent[base:base + (1 << (19 - ln))] = ln | (ci << 5)
        _SF_LUT = ent.view(np.int32)
    return _SF_LUT


@functools.cache
def sfb_of_bin(sampling_index: int) -> np.ndarray:
    """[1024] sfb index of each spectral bin (long windows), and the swb
    offsets padded to NS_MAX+1 — static per rate (aactab swb tables)."""
    off = T.swb_offset_1024(sampling_index)
    ns = T.num_swb_1024(sampling_index)
    sfb = np.searchsorted(off[:ns + 1], np.arange(1024), side="right") - 1
    sfb = np.clip(sfb, 0, ns - 1).astype(np.int32)
    beyond = np.arange(1024) >= off[ns]
    return sfb, beyond.astype(np.int32), int(ns)


@functools.cache
def sfb_of_bin_short(sampling_index: int):
    """Short-window (128-bin) analogue of sfb_of_bin, plus per-sfb
    offsets/widths — static per rate (ff_swb_offset_128)."""
    off = np.asarray(T.swb_offset_128(sampling_index), np.int32)
    ns = T.num_swb_128(sampling_index)
    sfb = np.searchsorted(off[:ns + 1], np.arange(128), side="right") - 1
    sfb = np.clip(sfb, 0, ns - 1).astype(np.int32)
    beyond = np.arange(128) >= off[ns]
    bw = (off[1:ns + 1] - off[:ns]).astype(np.int32)
    bw = np.concatenate([bw, np.zeros(16 - ns, np.int32)])
    offp = np.concatenate([off[:ns], np.zeros(16 - ns, np.int32)])
    return sfb, beyond.astype(np.int32), int(ns), offp, bw


# =============================================================================
# Host-side reference encoder (numpy) — the oracle for the device decoder
# and the Python-planner emitter for wire v4 spec-mode lanes.
# =============================================================================
class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, val: int, n: int):
        for k in range(n - 1, -1, -1):
            self.bits.append((val >> k) & 1)

    def tobytes(self) -> bytes:
        n = len(self.bits)
        out = bytearray((n + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (7 - (i & 7))
        return bytes(out)


@functools.cache
def _enc_tables(cb: int):
    codes, bits = T.spectral_codes(cb)
    tup = T.codebook_tuples(cb)
    dim, lav, signed = T.CODEBOOK_INFO[cb]
    mod = 2 * lav + 1 if signed else lav + 1
    off = lav if signed else 0
    idx_of = {}
    for ci in range(len(codes)):
        key = tuple(int(v) for v in tup[ci])
        idx_of[key] = ci
    return codes, bits, idx_of, dim, lav, signed


def encode_section(bw: BitWriter, cb: int, q: np.ndarray) -> None:
    """Append the spectral bits encoding integer values ``q`` (len % dim
    == 0) with codebook cb, reference bit order (code, signs, escapes)."""
    codes, bits, idx_of, dim, lav, signed = _enc_tables(cb)
    for k in range(0, len(q), dim):
        vals = [int(v) for v in q[k:k + dim]]
        if signed:
            key = tuple(vals)
            esc = []
        else:
            key = tuple(min(abs(v), 16) if cb == 11 else abs(v)
                        for v in vals)
            esc = [abs(v) for v in vals if cb == 11 and abs(v) >= 16]
        ci = idx_of[key]
        bw.put(int(codes[ci]), int(bits[ci]))
        if not signed:
            for v in vals:
                if v:
                    bw.put(1 if v < 0 else 0, 1)
        for av in esc:
            n = av.bit_length() - 1
            assert 4 <= n <= 12 and av < 8192
            bw.put((1 << (n - 4)) - 1, n - 4)   # N = n-4 ones
            bw.put(0, 1)
            bw.put(av - (1 << n), n)


# w3 flag bits (above the nbits/nsec/sfidx0 fields):
W3_MS_MASK = 1 << 27   # block carries an M/S band mask after the section map
W3_MS_LEFT = 1 << 28   # lane is the LEFT channel of a device-M/S CPE pair
W3_MS_RIGHT = 1 << 29  # lane is the RIGHT channel (mask rides the left lane)
W3_SHORT = 1 << 30     # EIGHT_SHORT lane: grouping byte leads the block


def pack_spec_block(sections, sfidx0: int, raw_bits: bytes, nbits: int,
                    ms_mask=None, grouping=None, phase: int = 0):
    """sections: list of (cb, nsfb, bitlen); sfidx0: the FIRST coded
    band's absolute pow2sf index (rides the record word — the raw sf
    region's first code is a delta vs global_gain, which sfidx0 already
    embodies).  ``raw_bits`` is ONE byte-aligned slice of the source
    bitstream spanning the lane's sf-huffman region through its spectral
    region — the two are contiguous up to the 3 always-zero pulse/tns/
    gain gate bits this capture path requires.  The sf chain starts at
    bit ``phase`` (0-7) of raw_bits[0] and the spectrum 3 bits after the
    sf chain ends (the device lifts the sf chain to find the boundary);
    a phase byte leads the raw region on the wire.  ``nbits`` counts the
    SPECTRAL bits only.  ``ms_mask``, if given, is the per-sfb M/S mask
    (length == total sfb count) packed MSB-first after the section map —
    the device butterflies the pair (aacdec.c:1390-1411) since raw-bits
    lanes ship PRE-M/S spectra.  ``grouping``, if given, marks an
    EIGHT_SHORT lane: the 7-bit scale_factor_grouping field leads the
    block and sections run (group, sfb)-major.  Returns (block bytes,
    w3) where w3 = nbits | nsec<<13 | sfidx0<<18 [| flags]."""
    b = bytearray()
    if grouping is not None:
        b.append(grouping & 0x7F)
    total_sfb = 0
    for cb, nsfb, blen in sections:
        assert 0 <= cb <= 11 and nsfb < 64 and blen < (1 << 14)
        u24 = cb | (nsfb << 4) | (blen << 10)
        b += u24.to_bytes(3, "little")
        total_sfb += nsfb
    ms_flag = 0
    if ms_mask is not None:
        assert len(ms_mask) == total_sfb
        mb = bytearray((total_sfb + 7) // 8)
        for f, v in enumerate(ms_mask):
            if v:
                mb[f >> 3] |= 1 << (7 - (f & 7))
        b += mb
        ms_flag = W3_MS_MASK
    assert 0 <= phase < 8
    b.append(phase)
    b += raw_bits
    assert nbits < (1 << 13) and len(sections) <= SEC_MAX
    assert 0 <= sfidx0 < 512
    w3 = nbits | (len(sections) << 13) | (int(sfidx0) << 18) | ms_flag
    if grouping is not None:
        w3 |= W3_SHORT
    return bytes(b), w3


def concat_bit_ranges(data: bytes, ranges) -> bytes:
    """Extract [a, b) bit ranges (MSB-first positions into ``data``) and
    concatenate them MSB-first into bytes (zero-padded tail)."""
    acc, n = 0, 0
    for a, b in ranges:
        nb = b - a
        if nb <= 0:
            continue
        want = ((b + 7) >> 3) - (a >> 3)
        seg = data[a >> 3:(b + 7) >> 3]
        if len(seg) < want:           # range tail past the buffer: zeros
            seg = seg + b"\0" * (want - len(seg))
        chunk = int.from_bytes(seg, "big")
        chunk >>= want * 8 - (a & 7) - nb
        chunk &= (1 << nb) - 1
        acc = (acc << nb) | chunk
        n += nb
    nbytes = (n + 7) // 8
    return (acc << (nbytes * 8 - n)).to_bytes(nbytes, "big")


# =============================================================================
# Device decoder (jax)
# =============================================================================
def decode_spec_jax(heap, off, w3, sampling_index: int, NBITS: int,
                    with_ms: bool = False, NS: int = NS_MAX,
                    SEC: int = SEC_MAX):
    """heap [N] i32 (byte values), off [B] spec-block byte offsets,
    w3 [B] packed (nbits | nsec<<13 | sfidx0<<18 | flags) ->
    coeffs [B, 1024] f32 — or (coeffs, ms_mask [B, 1024] i32) when
    ``with_ms`` (the per-bin M/S band mask of W3_MS_MASK lanes, for the
    caller's pair butterfly).

    W3_SHORT lanes (bit 30) are EIGHT_SHORT frames: the block leads with
    a grouping byte (the 7-bit scale_factor_grouping field, MSB-first)
    and sections/scalefactors run in (group, sfb) read order; the output
    mapping de-interleaves them to the [8, 128] window layout the IMDCT
    consumes (the reference writes group-interleaved buffers the same
    way, aacdec.c:988-1216).  Callers with short lanes pass NS >= the max
    ngroups*max_sfb (<= 120).

    Lanes with w3 == 0 decode to all-zero (token-mode lanes)."""
    import jax.numpy as jnp

    from ..codec.qwire import luts as qluts

    N = heap.shape[0]
    B = off.shape[0]
    sfbL, beyondL, ns = sfb_of_bin(sampling_index)
    sfbS, beyondS, nsS, offS, bwS = sfb_of_bin_short(sampling_index)
    offL = np.asarray(T.swb_offset_1024(sampling_index), np.int32)
    # static per-column (bin) tables for the long/short output mappings
    pcol = np.arange(1024)
    col_w = (pcol >> 7).astype(np.int32)              # window of bin
    kcol = (pcol & 127)
    col_sfb_s = sfbS[kcol]
    col_sfb_l = sfbL
    col_beyond_s = beyondS[kcol]
    col_beyond_l = beyondL
    col_inoff_s = (kcol - offS[col_sfb_s]).astype(np.int32)
    col_inoff_l = (pcol - offL[col_sfb_l]).astype(np.int32)
    col_bw_s = bwS[col_sfb_s]
    bwL = np.zeros(NS, np.int32)
    bwL[:ns] = offL[1:ns + 1] - offL[:ns]
    lut = jnp.asarray(luts().reshape(-1).view(np.int32))
    cbrt = jnp.asarray(qluts()["cbrt"])
    pow2 = jnp.asarray(qluts()["pow2sf"])
    cb_dim = jnp.asarray(CB_DIM)
    cb_uns = jnp.asarray(CB_UNSIGNED)

    nbits = w3 & 0x1FFF
    nsec = (w3 >> 13) & 31
    sfidx0 = (w3 >> 18) & 511
    short = (w3 >> 30) & 1
    shortB = short[:, None] > 0

    g = lambda o: heap[o.clip(0, N - 1)]
    smap = off + short              # grouping byte precedes the sections

    # ---- section table ------------------------------------------------------
    s24 = jnp.arange(SEC)[None, :]
    so = smap[:, None] + 3 * s24
    u24 = g(so) | (g(so + 1) << 8) | (g(so + 2) << 16)
    valid_s = s24 < nsec[:, None]
    cb_s = (u24 & 15) * valid_s
    nsfb_s = ((u24 >> 4) & 63) * valid_s
    blen_s = ((u24 >> 10) & 0x3FFF) * valid_s
    coded_s = (cb_s >= 1) & (cb_s <= 11)
    sfb_end = jnp.cumsum(nsfb_s, axis=1)          # [B,SEC]
    bit_end = jnp.cumsum(blen_s, axis=1)
    total_sfb = sfb_end[:, -1]
    nsf = (coded_s * nsfb_s).sum(1)
    # optional M/S band mask between the section map and the sf deltas
    has_mask = (w3 >> 27) & 1
    mask_bytes = has_mask * ((total_sfb + 7) >> 3)

    # ---- short-window grouping ----------------------------------------------
    gb = g(off) * short                           # [B] grouping byte
    w8 = jnp.arange(8)[None, :]
    same_w = jnp.where(w8 >= 1, (gb[:, None] >> (7 - w8.clip(1, 7))) & 1, 0)
    gid_w = jnp.cumsum(1 - same_w, axis=1) - 1    # [B,8] group of window
    ranks = [jnp.zeros((B,), jnp.int32)]
    for w in range(1, 8):                         # rank within group
        ranks.append(jnp.where(same_w[:, w] > 0, ranks[-1] + 1, 0))
    rank_w = jnp.stack(ranks, axis=1)
    ngroups = jnp.where(short > 0, gid_w[:, -1] + 1, 1)
    glen_g = (gid_w[:, :, None] == jnp.arange(8)[None, None, :]).sum(1)
    msfb = jnp.where(short > 0,
                     total_sfb // jnp.maximum(ngroups, 1), total_sfb)

    # ---- per-band (read order: group-major for shorts) ----------------------
    f52 = jnp.arange(NS)[None, :]
    sec_of_f = (f52[:, :, None] >= sfb_end[:, None, :]).sum(-1)  # [B,NS]
    cb_f = jnp.take_along_axis(cb_s, sec_of_f.clip(0, SEC - 1), axis=1)
    in_f = f52 < total_sfb[:, None]
    coded_f = (cb_f >= 1) & (cb_f <= 11) & in_f
    rank_f = jnp.cumsum(coded_f.astype(jnp.int32), axis=1) - coded_f
    msfb1 = jnp.maximum(msfb, 1)[:, None]
    sfb_of_f = jnp.where(shortB, f52 % msfb1, f52)
    grp_of_f = jnp.where(shortB, f52 // msfb1, 0)
    bw_f = jnp.where(shortB,
                     jnp.asarray(bwS)[sfb_of_f.clip(0, 15)],
                     jnp.asarray(bwL)[f52.clip(0, NS - 1)])
    glen_f = jnp.take_along_axis(glen_g, grp_of_f.clip(0, 7), axis=1)
    sizes_f = coded_f * jnp.where(shortB, glen_f, 1) * bw_f
    cumsz_f = jnp.cumsum(sizes_f, axis=1)
    starts_f = cumsz_f - sizes_f                  # coded-bin start per band
    # raw-bits region: a phase byte, then ONE byte-aligned slice of the
    # source bitstream spanning the sf-huffman region through the
    # spectral region (the emitters memcpy it verbatim).  The sf chain
    # starts at bit ``phase`` of the first raw byte; the spectrum starts
    # 3 bits after the sf chain ends (the always-zero pulse/tns/gain
    # gate bits, shipped in place).
    phase_base = smap + 3 * nsec + mask_bytes
    phase = g(phase_base) & 7
    bits_base = phase_base + 1

    def bits_at0(q, m):
        """m bits at sf-relative bit position q (3-byte window:
        (q & 7) + m <= 24 pre-phase, so m <= 17)."""
        sh = (-1,) + (1,) * (q.ndim - 1)
        qq = q + phase.reshape(sh)
        ab = bits_base.reshape(sh) + (qq >> 3)
        w = (g(ab) << 16) | (g(ab + 1) << 8) | g(ab + 2)
        return (w >> (24 - (qq & 7) - m)) & ((1 << m) - 1)

    # ---- scalefactor huffman decode (region prefix) --------------------------
    # same speculate+lift scheme as the spectral decode: classify every
    # bit offset with the 19-bit sf table, lift the advance chain, read
    # code r's value at offs_s[r] (decode_scalefactors' vlc chain)
    sflut_t = jnp.asarray(sf_lut())
    qsf = jnp.arange(SFB)[None, :]
    w19 = bits_at0(qsf, 14) * 32 + bits_at0(qsf + 14, 5)
    ent_s = sflut_t[w19]
    len_s = ent_s & 31
    Js = jnp.minimum(qsf + jnp.where(len_s < 31, len_s, SFB), SFB)
    Tks = jnp.concatenate([Js, jnp.full((B, 1), SFB, Js.dtype)], axis=1)
    offs_s = jnp.zeros((B, 1), jnp.int32)
    for k in range(7):                            # 2^7 = 128 > 120 bands
        step = jnp.take_along_axis(Tks, offs_s.clip(0, SFB), axis=1)
        offs_s = jnp.concatenate([offs_s, step], axis=1)
        if k < 6:
            Tks = jnp.take_along_axis(Tks, Tks.clip(0, SFB), axis=1)
    sfe = jnp.take_along_axis(offs_s, nsf[:, None].clip(0, 127), axis=1)
    # per-band delta: rank 0's bitstream delta is vs global_gain, which
    # the record's absolute sfidx0 already embodies — exclude its value
    # (its BITS are still consumed by the chain above)
    dsel = jnp.take_along_axis(offs_s, rank_f.clip(0, 127), axis=1)
    dval = (jnp.take_along_axis(ent_s, dsel.clip(0, SFB - 1), axis=1)
            >> 5) - 60
    delta_f = jnp.where(coded_f & (rank_f >= 1), dval, 0)
    sfidx_f = sfidx0[:, None] + jnp.cumsum(delta_f, axis=1)
    sf_f = -pow2[sfidx_f.clip(0, 427) & 511]      # normal bands: negative

    # ---- per-bit-offset classification (spectral region at offset sfe) ------
    i = jnp.arange(NBITS)[None, :]
    live = i < nbits[:, None]

    def bits_at(q, m):
        """Spectral-region read: position q is relative to the end of
        the sf prefix (sfe, a per-lane dynamic offset) plus the 3
        always-zero pulse/tns/gain gate bits shipped between the
        regions."""
        return bits_at0(q + 3 + sfe.reshape((-1,) + (1,) * (q.ndim - 1)), m)

    def ones_at(q):
        """Leading-1s count (escape prefix N <= 8) at bit position q."""
        w9 = bits_at(q, 9)
        n = jnp.zeros_like(w9)
        for k in range(1, 10):
            n = n + (w9 >> (9 - k) == (1 << k) - 1)
        return n

    idx16 = bits_at(i, 16)
    sec_of_i = (i[:, :, None] >= bit_end[:, None, :]).sum(-1)
    cb_i = jnp.take_along_axis(cb_s, sec_of_i.clip(0, SEC - 1), axis=1)
    cb_ok = (cb_i >= 1) & (cb_i <= 11)
    ent = lut[((cb_i.clip(1, 11) - 1) << 16) + idx16]
    clen = ent & 31
    nnz = (ent >> 5) & 7
    esc = (ent >> 24) & 1
    uns = cb_uns[cb_i.clip(0, 11)]
    adv = clen + nnz * uns
    # cb11 escape extension: values are in the entry; parse lengths
    v0e = ((ent >> 8) & 255) - 64
    v1e = ((ent >> 16) & 255) - 64
    e0 = esc & (jnp.abs(v0e) == 16)
    e1 = esc & (jnp.abs(v1e) == 16)
    q_esc = i + clen + nnz
    n0 = jnp.where(e0 > 0, ones_at(q_esc), 0)
    l0 = (2 * n0 + 5) * e0
    n1 = jnp.where(e1 > 0, ones_at(q_esc + l0), 0)
    adv = adv + l0 + (2 * n1 + 5) * e1
    adv = jnp.where(live & cb_ok & (clen < 31), adv, NBITS)

    # ---- chain: binary lifting ---------------------------------------------
    sent = NBITS
    J = jnp.minimum(i + adv, sent)                # [B,NBITS]
    Tk = jnp.concatenate([J, jnp.full((B, 1), sent, J.dtype)], axis=1)
    nlev = max(1, NC_MAX.bit_length() - 1)        # 2^9 = NC_MAX
    # progressive doubling: code j's bit offset is J^j(0); fill offs[j]
    # for j in [2^k, 2^(k+1)) as J^(2^k)(offs[j - 2^k]) using the current
    # power table Tk, then square Tk in place.  Only TWO [B, NBITS+1]
    # tables are ever live (vs nlev=9 with keep-all-levels lifting) — the
    # peak-memory fix for one dense lane inflating a whole group's NBITS
    # (round-3 review finding).
    offs = jnp.zeros((B, 1), jnp.int32)           # offs[0] = 0
    for k in range(nlev):
        step = jnp.take_along_axis(Tk, offs.clip(0, sent), axis=1)
        offs = jnp.concatenate([offs, step], axis=1)
        if k < nlev - 1:
            Tk = jnp.take_along_axis(Tk, Tk.clip(0, sent), axis=1)
    code_ok = offs < nbits[:, None]

    # ---- per-code payload ---------------------------------------------------
    gat = lambda a: jnp.take_along_axis(a, offs.clip(0, NBITS - 1), axis=1)
    ent_j = gat(ent) * code_ok
    cb_j = gat(cb_i) * code_ok
    clen_j = ent_j & 31
    nnz_j = (ent_j >> 5) & 7
    dim_j = cb_dim[cb_j.clip(0, 11)] * code_ok
    cum_j = jnp.cumsum(dim_j, axis=1)             # coded bins covered
    start_j = cum_j - dim_j

    # ---- output bins --------------------------------------------------------
    # band index f and coded-bin index ci of each output bin p: long
    # windows read in bin order; shorts read (group, sfb, window-in-
    # group, bin) so bin p of window w sits at
    # starts_f[gid(w)*max_sfb + sfb(k)] + rank(w)*bw + (k - off(sfb))
    sfb_q = jnp.where(shortB, jnp.asarray(col_sfb_s)[None, :],
                      jnp.asarray(col_sfb_l)[None, :])
    f_q = jnp.where(shortB,
                    gid_w[:, col_w] * msfb1 + sfb_q, sfb_q)
    fqc = f_q.clip(0, NS - 1)
    inband = jnp.where(
        shortB,
        jnp.asarray(col_inoff_s)[None, :]
        + rank_w[:, col_w] * jnp.asarray(col_bw_s)[None, :],
        jnp.asarray(col_inoff_l)[None, :])
    beyond_q = jnp.where(shortB, jnp.asarray(col_beyond_s)[None, :],
                         jnp.asarray(col_beyond_l)[None, :])
    cb_p = jnp.take_along_axis(cb_f, fqc, axis=1)
    coded_p = (cb_p >= 1) & (cb_p <= 11) & (beyond_q == 0) \
        & (sfb_q < msfb[:, None]) & (f_q < total_sfb[:, None])
    ci = jnp.take_along_axis(starts_f, fqc, axis=1) + inband
    # binary search: code j with start_j <= ci < cum_j
    lo = jnp.zeros((B, 1024), jnp.int32)
    hi = jnp.full((B, 1024), NC_MAX, jnp.int32)
    for _ in range(NC_MAX.bit_length()):
        mid = (lo + hi) >> 1
        cm = jnp.take_along_axis(cum_j, mid.clip(0, NC_MAX - 1), axis=1)
        go = cm <= ci
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    jj = lo.clip(0, NC_MAX - 1)
    gj = lambda a: jnp.take_along_axis(a, jj, axis=1)
    ent_p = gj(ent_j)
    cb_pp = gj(cb_j)
    off_p = gj(offs)
    clen_p = ent_p & 31
    nnz_p = (ent_p >> 5) & 7
    d = ci - gj(start_j)                          # value index in tuple
    is4 = cb_pp <= 4
    vget = lambda k: jnp.where(
        is4, ((ent_p >> (8 + 4 * k.clip(0, 3))) & 15) - 4,
        ((ent_p >> (8 + 8 * k.clip(0, 1))) & 255) - 64)
    v = vget(d)
    # sign bits (unsigned cbs): rank = nonzeros before d in the tuple
    nz_before = jnp.zeros_like(d)
    for k in range(3):
        nz_before = nz_before + ((k < d) & (vget(jnp.full_like(d, k)) != 0))
    uns_p = cb_uns[cb_pp.clip(0, 11)]
    has_sign = (uns_p > 0) & (v != 0)
    sgn_bit = jnp.where(
        has_sign, bits_at(off_p + clen_p + nz_before, 1), 0)
    # cb11 escapes for this value
    esc_p = ((ent_p >> 24) & 1) > 0
    v0p = ((ent_p >> 8) & 255) - 64
    e0p = esc_p & (jnp.abs(v0p) == 16)
    my_esc = esc_p & (jnp.abs(v) == 16)
    qe_base = off_p + clen_p + nnz_p
    n0p = jnp.where(e0p, ones_at(qe_base), 0)
    l0p = (2 * n0p + 5) * e0p
    qe = jnp.where((d > 0) & e0p, qe_base + l0p, qe_base)
    ne_ = jnp.where(my_esc, ones_at(qe), 0)
    mant = bits_at(qe + ne_ + 1, 13) >> (13 - (ne_ + 4)).clip(0, 13)
    av = jnp.where(my_esc, (1 << (ne_ + 4)) + mant, jnp.abs(v))
    mag = cbrt[av.clip(0, 8191)]
    sf_p = jnp.take_along_axis(sf_f, fqc, axis=1)
    sign = jnp.where((v < 0) | (sgn_bit > 0), -1.0, 1.0)
    out = sign * mag * sf_p
    zero = (v == 0) | ~coded_p | (ci >= cum_j[:, -1:]) | ~gj(code_ok)
    out = jnp.where(zero, 0.0, out)
    if not with_ms:
        return out
    # per-bin M/S mask of W3_MS_MASK lanes: bit f of the mask region
    # (right after the section map) -> every bin of sfb f.  The butterfly
    # itself is the caller's pair pass (bins beyond off[max_sfb] and
    # sfb >= total_sfb stay untouched, aacdec.c:1390 loops i < max_sfb).
    mb_base = smap + 3 * nsec
    mbyte = g(mb_base[:, None] + (f52 >> 3))
    mask_f = ((mbyte >> (7 - (f52 & 7))) & 1) * has_mask[:, None] * in_f
    mask_p = jnp.take_along_axis(mask_f, fqc, axis=1) * (beyond_q == 0)
    return out, mask_p
