"""SBR envelope/noise Huffman decode on device (wire v5).

The reference reads the per-channel envelope and noise-floor rows with a
serial per-symbol VLC loop (aacsbr.c:787-890, read_sbr_envelope /
read_sbr_noise).  On the host that loop is the biggest slice of the SBR
side parse (~9% of the whole-stream parse); on a TPU it vectorizes with
the same speculate+lift scheme as the spectral decode (ops/spec_huff.py)
and the PS parameter decode (ops/ps_huff.py):

  1. classify every bit offset of a row's window against the row's
     codebook (one flat-LUT gather -> code length + symbol index);
  2. resolve code starts with binary lifting (J_{k+1} = J_k o J_k);
  3. apply the delta coding elementwise: time rows add deltas to the
     previous row (with the freq-res remap of aacsbr.c:835-848), freq
     rows prepend a fixed-width start value and cumsum.

The host ships the element's side-info RAW BITS in one byte-aligned
slice spanning the dtdf flags through the last noise row (the region the
reference reads at aacsbr.c:769-890), and only length-walks the rows to
find the sine/extension data that follows; it never computes the values.

Region layout (mirrors he_host.inc read_sbr_sce/read_sbr_cpe):
  SCE:          df_env(ne) df_noise(nn) invf(2*nq)
                env0 rows, noise0 rows
  CPE coupled:  df_env0(ne) df_noise0(nn) df_env1(ne) df_noise1(nn)
                invf(2*nq)  env0 rows, noise0 rows, env1 rows, noise1
                rows
An uncoupled CPE interleaves the channels' rows with per-channel grids
(env0, env1, noise0, noise1 with possibly different row counts); those
lanes demote to the wire-v4 byte mode instead.

Cross-frame carry (the env_facs[0]/noise_facs[0] persistence of
aacsbr.c:853/889 plus copy_grid's bs_freq_res[0]):
  - env_last [B,2,48]: last envelope row per source channel, unwrapped
    (the host keeps the float chain un-wrapped too);
  - noise_last [B,2,5];
  - fr_last [B,2]: the last row's frequency resolution (seeds the first
    time-delta row's band remap).
The carry is updated by the CALLER from the post-merge rows so byte-mode
(demoted) frames keep the chain consistent.

Divergence from the reference (corrupt streams only): an invalid code or
region overrun clears `ok` for the lane; the caller silences the frame
(the host's length walk rejects the same streams before emission, so a
live decode never takes this path).
"""
from __future__ import annotations

import functools

import numpy as np

from ..tables import aac_tables as T

# table order matches bitstream/sbr_syntax.py / he_host.inc sbr_vlc
_NAMES = ["t_huffman_env_1_5dB", "f_huffman_env_1_5dB",
          "t_huffman_env_bal_1_5dB", "f_huffman_env_bal_1_5dB",
          "t_huffman_env_3_0dB", "f_huffman_env_3_0dB",
          "t_huffman_env_bal_3_0dB", "f_huffman_env_bal_3_0dB",
          "t_huffman_noise_3_0dB", "t_huffman_noise_bal_3_0dB"]
(T_ENV15, F_ENV15, T_BAL15, F_BAL15, T_ENV30, F_ENV30,
 T_BAL30, F_BAL30, T_NOISE30, T_NOISEBAL30) = range(10)
LAV = np.array([60, 60, 24, 24, 31, 31, 12, 12, 31, 12], np.int32)

RW = 640           # region byte budget (>= the 617 B legal worst case:
                   # dtdf 7 + invf 10 + 5 env rows x 947 + 2 noise x 85
                   # bits + phase, so single-channel lanes never demote)
W_ENV = 960        # env row window bits (48 codes x 20-bit worst case)
W_NOI = 112        # noise row window bits (5 codes x 20 + slack)
NLIFT = 6          # ceil(log2(49)) binary-lifting stages
E = 5              # max envelopes (read_grid rejects more)
NQ = 5             # max noise bands
NB = 48            # max env bands (qwire.NB_HI)

_LUTS = None


@functools.lru_cache(maxsize=1)
def _maxlens():
    r = T.raw()
    return [int(r[f"sbr_{n}_bits"].max()) for n in _NAMES]


def luts():
    """(flat u16 [sum 2^maxlen], base i32 [10], maxlen i32 [10]).
    Entry: code length (bits 0-4, 31 = invalid) | symbol index << 5."""
    global _LUTS
    if _LUTS is None:
        r = T.raw()
        maxlens = _maxlens()
        bases = np.zeros(10, np.int32)
        total = sum(1 << L for L in maxlens)
        flat = np.full(total, 31, np.uint16)
        cur = 0
        for t, n in enumerate(_NAMES):
            codes = r[f"sbr_{n}_codes"]
            bits = r[f"sbr_{n}_bits"]
            L = maxlens[t]
            bases[t] = cur
            for ci in range(len(codes)):
                ln = int(bits[ci])
                if ln == 0:
                    continue
                lo = int(codes[ci]) << (L - ln)
                flat[cur + lo:cur + lo + (1 << (L - ln))] = ln | (ci << 5)
            cur += 1 << L
        _LUTS = (flat, bases, np.asarray(maxlens, np.int32))
    return _LUTS


def _decode_row_jax(region, pos, tid, count, active, W, nsyms):
    """Decode one Huffman row per lane: `count` codes of table `tid`
    starting at bit `pos` of `region` [B, RW] u8.

    Returns (syms [B, nsyms] i32, pos' [B], row_ok [B])."""
    import jax.numpy as jnp

    flat, bases, maxlens = luts()
    flat_j = jnp.asarray(flat.astype(np.int32))
    B = region.shape[0]
    offs = pos[:, None] + jnp.arange(W)[None, :]           # [B, W] bits
    byt = offs >> 3
    sh = offs & 7

    def gb(k):
        return jnp.take_along_axis(
            region.astype(jnp.int32), jnp.clip(byt + k, 0, RW - 1), axis=1)

    w32 = (gb(0) << 24) | (gb(1) << 16) | (gb(2) << 8) | gb(3)
    w20 = (w32 >> (12 - sh)) & 0xFFFFF
    ml = jnp.take(jnp.asarray(maxlens), tid)[:, None]      # [B, 1]
    idx = jnp.take(jnp.asarray(bases), tid)[:, None] + (w20 >> (20 - ml))
    ent = jnp.take(flat_j, idx)                            # [B, W]
    ln = ent & 31
    sym = ent >> 5
    bad = ln == 31
    adv = jnp.where(bad, W, ln)                            # poison -> W
    # binary lifting of the jump table
    J = jnp.minimum(jnp.arange(W)[None, :] + adv, W)       # J_0, [B, W]
    Js = [J]
    for _ in range(NLIFT - 1):
        prev = Js[-1]
        nxt = jnp.take_along_axis(prev, jnp.minimum(prev, W - 1), axis=1)
        Js.append(jnp.where(prev >= W, W, jnp.minimum(nxt, W)))
    # symbol start offsets P_j for j = 0..nsyms (inclusive end)
    j_idx = jnp.arange(nsyms + 1)[None, :]                 # [1, S+1]
    P = jnp.zeros((B, nsyms + 1), jnp.int32)
    for k in range(NLIFT):
        jbit = (j_idx >> k) & 1
        Pk = jnp.take_along_axis(Js[k], jnp.minimum(P, W - 1), axis=1)
        Pk = jnp.where(P >= W, W, Pk)
        P = jnp.where(jbit > 0, Pk, P)
    live = j_idx[:, :nsyms] < count[:, None]               # [B, S]
    Ps = jnp.minimum(P[:, :nsyms], W - 1)
    syms = jnp.where(live, jnp.take_along_axis(sym, Ps, axis=1), 0)
    row_bad = jnp.any(
        live & ((P[:, :nsyms] >= W)
                | jnp.take_along_axis(bad, Ps, axis=1)), axis=1)
    used = jnp.take_along_axis(P, count[:, None].astype(jnp.int32),
                               axis=1)[:, 0]
    row_bad |= used >= W
    pos2 = jnp.where(active, pos + used, pos)
    ok = jnp.where(active, ~row_bad, True)
    return syms, pos2, ok


def _read_bits_jax(region, pos, n):
    """n (<= 12, static) bits at per-lane bit offset pos (MSB-first)."""
    import jax.numpy as jnp
    byt = pos >> 3
    sh = pos & 7

    def gb(k):
        return jnp.take_along_axis(
            region.astype(jnp.int32),
            jnp.clip(byt[:, None] + k, 0, RW - 1), axis=1)[:, 0]

    w24 = (gb(0) << 16) | (gb(1) << 8) | gb(2)
    return (w24 >> (24 - sh - n)) & ((1 << n) - 1)


def init_rows_carry(B: int):
    """Fresh per-lane env/noise chain carry (env_facs[0] == 0 state)."""
    import jax.numpy as jnp
    return dict(
        env_last=jnp.zeros((B, 2, NB), jnp.int32),
        noise_last=jnp.zeros((B, 2, NQ), jnp.int32),
        fr_last=jnp.zeros((B, 2), jnp.int32))


def _env_block(region, pos, ok, ne, frbits, n0, n1, odd, df_env, bal,
               ampres, active, prev_last, fr_first):
    """One channel's envelope rows (read_sbr_envelope, aacsbr.c:787-854).

    `bal` [B] selects the balance tables (coupled pan channel, delta 2);
    `df_env` [B, E] the dtdf flags; `prev_last` [B, NB] the carried last
    row; `fr_first` [B] its frequency resolution.

    Returns (rows [B,E,NB] unwrapped i32, pos', ok')."""
    import jax.numpy as jnp

    B = region.shape[0]
    delta = (1 + bal)[:, None]
    tid_t = jnp.where(bal > 0, jnp.where(ampres > 0, T_BAL30, T_BAL15),
                      jnp.where(ampres > 0, T_ENV30, T_ENV15))
    tid_f = tid_t + 1
    # freq-start field width by (bal, ampres), read_envelope:572-581
    nb5 = jnp.where(ampres > 0, 5, 6)
    nb7 = jnp.where(ampres > 0, 6, 7)
    lav_t = jnp.take(jnp.asarray(LAV), tid_t)[:, None]
    lav_f = lav_t  # f tables share the t tables' LAV (sbr_lav pairs)
    j48 = jnp.arange(NB)[None, :]
    rows = jnp.zeros((B, E, NB), jnp.int32)
    prev = prev_last
    fr_prev = fr_first
    for e in range(E):
        act = active & (e < ne)
        fr = (frbits >> e) & 1
        nbands = jnp.where(fr > 0, n1, n0)
        df = df_env[:, e]
        is_dt = act & (df > 0)
        is_df = act & (df == 0)
        # one merged classify+lift per row: time-delta lanes read
        # `nbands` codes of the t table at pos; freq-start lanes read a
        # fixed-width start then nbands-1 codes of the f table
        st5 = _read_bits_jax(region, pos, 5)
        st6 = _read_bits_jax(region, pos, 6)
        st7 = _read_bits_jax(region, pos, 7)
        nbits_first = jnp.where(bal > 0, nb5, nb7)
        start = jnp.where(nbits_first == 5, st5,
                          jnp.where(nbits_first == 6, st6, st7))
        pos0 = pos + jnp.where(is_df, nbits_first, 0)
        tid = jnp.where(df > 0, tid_t, tid_f)
        count = jnp.where(is_dt, nbands,
                          jnp.where(is_df, jnp.maximum(nbands - 1, 0), 0))
        syms, pos2, ok_r = _decode_row_jax(
            region, pos0, tid, count, is_dt | is_df, W_ENV, NB)
        # ---- time-delta row: prev row remapped by (fr, fr_prev) -------
        kk = jnp.where(
            (fr == fr_prev)[:, None], j48,
            jnp.where(fr[:, None] > 0, (j48 + odd[:, None]) >> 1,
                      jnp.where(j48 > 0, 2 * j48 - odd[:, None], 0)))
        pbase = jnp.take_along_axis(prev, kk.clip(0, NB - 1), axis=1)
        row_dt = pbase + delta * (syms - lav_t)
        # ---- freq-start row: fixed-width start + cumsum ---------------
        deltas = jnp.concatenate(
            [(delta[:, 0] * start)[:, None],
             delta * (syms[:, :NB - 1] - lav_f)], axis=1)
        live = j48 < nbands[:, None]
        row_df = jnp.cumsum(jnp.where(live, deltas, 0), axis=1)
        # ---- select / mask -------------------------------------------
        row = jnp.where(is_dt[:, None], row_dt, row_df)
        row = jnp.where(live & act[:, None], row, 0)
        pos = jnp.where(act, pos2, pos)
        ok &= ok_r
        prev = jnp.where(act[:, None], row, prev)
        fr_prev = jnp.where(act, fr, fr_prev)
        rows = rows.at[:, e].set(row)
    return rows, pos, ok


def _noise_block(region, pos, ok, nnoise, nq, df_noise, bal, active,
                 prev_last):
    """One channel's noise-floor rows (read_sbr_noise, aacsbr.c:856-890).
    Returns (rows [B,2,NQ] unwrapped i32, pos', ok')."""
    import jax.numpy as jnp

    B = region.shape[0]
    delta = (1 + bal)[:, None]
    tid_t = jnp.where(bal > 0, T_NOISEBAL30, T_NOISE30)
    tid_f = jnp.where(bal > 0, F_BAL30, F_ENV30)
    lav_t = jnp.take(jnp.asarray(LAV), tid_t)[:, None]
    lav_f = jnp.take(jnp.asarray(LAV), tid_f)[:, None]
    j5 = jnp.arange(NQ)[None, :]
    rows = jnp.zeros((B, 2, NQ), jnp.int32)
    prev = prev_last
    for i in range(2):
        act = active & (i < nnoise)
        df = df_noise[:, i]
        is_dt = act & (df > 0)
        is_df = act & (df == 0)
        # merged classify+lift (see _env_block)
        start = _read_bits_jax(region, pos, 5)
        pos0 = pos + jnp.where(is_df, 5, 0)
        tid = jnp.where(df > 0, tid_t, tid_f)
        count = jnp.where(is_dt, nq,
                          jnp.where(is_df, jnp.maximum(nq - 1, 0), 0))
        syms, pos2, ok_r = _decode_row_jax(
            region, pos0, tid, count, is_dt | is_df, W_NOI, NQ)
        row_dt = prev + delta * (syms - lav_t)
        deltas = jnp.concatenate(
            [(delta[:, 0] * start)[:, None],
             delta * (syms[:, :NQ - 1] - lav_f)], axis=1)
        live = j5 < nq[:, None]
        row_df = jnp.cumsum(jnp.where(live, deltas, 0), axis=1)
        row = jnp.where(is_dt[:, None], row_dt, row_df)
        row = jnp.where(live & act[:, None], row, 0)
        pos = jnp.where(act, pos2, pos)
        ok &= ok_r
        prev = jnp.where(act[:, None], row, prev)
        rows = rows.at[:, i].set(row)
    return rows, pos, ok


def decode_sbr_rows_jax(region, phase, rbits, ne, nnoise, frbits, n0, n1,
                        nq, coupled, ampres, active, carry,
                        pair: bool = True):
    """Batched decode of one element's dtdf+env+noise raw region.

    All control inputs are [B] i32; `region` [B, RW] u8 starts at the
    byte holding the first dtdf bit, which sits at bit `phase` (0-7);
    `rbits` is the region's total bit length (phase included) for the
    overrun check.  `coupled` marks CPE-coupled lanes (two channels'
    rows chained); `active` marks lanes whose frame carries SBR data in
    raw-rows mode.

    Static ``pair=False`` drops the second channel's blocks from the
    graph entirely (single-channel integrations).

    Returns (ecodes [B,E,NB], pcodes [B,E,NB], qcodes [B,2,NQ],
    qpcodes [B,2,NQ], ok [B], new_carry).  Values are the unwrapped
    integer factor chains (aacsbr.c env_facs/noise_facs pre-dequant);
    the caller wraps to bytes (& 0xFF) for wire-v4 parity."""
    import jax.numpy as jnp

    B = region.shape[0]
    pos = phase.astype(jnp.int32)
    ok = jnp.ones(B, bool)
    odd = n1 & 1

    def flag_bits(pos, count, cmax, act):
        out = []
        for i in range(cmax):
            a = act & (i < count)
            out.append(jnp.where(a, _read_bits_jax(region, pos, 1), 0))
            pos = jnp.where(a, pos + 1, pos)
        return jnp.stack(out, axis=1), pos

    # dtdf flags: ch0 then (coupled) ch1, read_sbr_cpe:889-893
    df_env0, pos = flag_bits(pos, ne, E, active)
    df_noi0, pos = flag_bits(pos, nnoise, 2, active)
    if pair:
        df_env1, pos = flag_bits(pos, ne, E, active & (coupled > 0))
        df_noi1, pos = flag_bits(pos, nnoise, 2, active & (coupled > 0))
    # invf: one channel's 2-bit modes (coupled copies ch0's)
    pos = jnp.where(active, pos + 2 * nq, pos)

    z = jnp.zeros(B, jnp.int32)
    ecodes, pos, ok = _env_block(
        region, pos, ok, ne, frbits, n0, n1, odd, df_env0, z, ampres,
        active, carry["env_last"][:, 0], carry["fr_last"][:, 0])
    qcodes, pos, ok = _noise_block(
        region, pos, ok, nnoise, nq, df_noi0, z, active,
        carry["noise_last"][:, 0])
    cact = active & (coupled > 0)
    if pair:
        pcodes, pos, ok = _env_block(
            region, pos, ok, ne, frbits, n0, n1, odd, df_env1, coupled,
            ampres, cact, carry["env_last"][:, 1], carry["fr_last"][:, 1])
        qpcodes, pos, ok = _noise_block(
            region, pos, ok, nnoise, nq, df_noi1, coupled, cact,
            carry["noise_last"][:, 1])
    else:
        pcodes = jnp.zeros((B, E, NB), jnp.int32)
        qpcodes = jnp.zeros((B, 2, NQ), jnp.int32)
    ok &= jnp.where(active, pos <= rbits, True)

    # ---- carry update (env_facs[0]/noise_facs[0] persistence) ---------
    laste = jnp.clip(ne - 1, 0, E - 1)
    lastq = jnp.clip(nnoise - 1, 0, 1)

    def last_row(rows, idx, width):
        return jnp.take_along_axis(
            rows, idx[:, None, None] * jnp.ones((1, 1, width), jnp.int32),
            axis=1)[:, 0]

    fr_new = (frbits >> laste) & 1

    def upd(old, new, act):
        return jnp.where(act[:, None], new, old)

    new_carry = dict(
        env_last=jnp.stack(
            [upd(carry["env_last"][:, 0], last_row(ecodes, laste, NB),
                 active),
             upd(carry["env_last"][:, 1], last_row(pcodes, laste, NB),
                 cact)], axis=1),
        noise_last=jnp.stack(
            [upd(carry["noise_last"][:, 0], last_row(qcodes, lastq, NQ),
                 active),
             upd(carry["noise_last"][:, 1], last_row(qpcodes, lastq, NQ),
                 cact)], axis=1),
        fr_last=jnp.stack(
            [jnp.where(active, fr_new, carry["fr_last"][:, 0]),
             jnp.where(cact, fr_new, carry["fr_last"][:, 1])], axis=1))
    return ecodes, pcodes, qcodes, qpcodes, ok, new_carry
