"""Parametric-Stereo parameter Huffman decode on device (wire v5).

The reference reads iid/icc/ipd/opd rows with a serial per-symbol VLC
loop (aacps.c:84-118 READ_PAR_DATA inside ff_ps_read_data:150-279).  On
the host that loop is ~30% of the whole-stream parse cost for PS
streams; on a TPU it vectorizes with the same speculate+lift scheme as
the spectral decode (ops/spec_huff.py):

  1. classify every bit offset of a row's window against the row's
     codebook (one flat-LUT gather -> code length + symbol);
  2. resolve code starts with binary lifting (J_{k+1} = J_k o J_k), so
     the j-th symbol's offset is the jump-composition of j's bits;
  3. apply the delta coding (time deltas against the previous envelope
     row or the carried last row of the previous frame, frequency
     deltas as a cumsum) and the iid/icc validity limits elementwise.

The host ships the PS region's RAW BITS (everything after the
fixed-width header/border fields, i.e. from the first iid dt bit to the
end of the FIL) plus the fixed-width header fields it already parses;
it no longer touches the parameter Huffman data at all.

Cross-frame state carried on device (PSContext persistence semantics):
  - iid_last/icc_last: the post-fixup last row (par[num_env-1] seeds the
    next frame's e=0 time deltas, aacps.c:92);
  - ipd_full/opd_full + pd_enable + penv_prev: enable_ipdopd and the
    ipd/opd rows persist verbatim when a frame carries no extension
    block (aacps.c only rewrites them inside ps_read_extension and only
    zeroes them when enable_ipdopd ends up 0);
  - ps_ok: value-error latch (see divergence note).

Divergences from the reference, by design (corrupt streams only):
  - a value-range violation (|iid| > lim, icc > 7) or a row overrunning
    its window marks the lane invalid for THIS frame (PS processing is
    skipped, exactly like ps->start = 0), and the carried `ps_ok` flag
    keeps PS off until the next header frame (the host cannot clear
    ps->start retroactively);
  - at most 4 extension blocks are scanned for the ipd/opd block; the
    reference tolerates arbitrarily many 2-bit padding ids.
"""
from __future__ import annotations

import functools

import numpy as np

from ..tables import aac_tables as T

# table order matches bitstream/ps_syntax.py HUFF_* enum
_NAMES = ["huff_iid_df1", "huff_iid_dt1", "huff_iid_df0", "huff_iid_dt0",
          "huff_icc_df", "huff_icc_dt", "huff_ipd_df", "huff_ipd_dt",
          "huff_opd_df", "huff_opd_dt"]
(IID_DF1, IID_DT1, IID_DF0, IID_DT0, ICC_DF, ICC_DT, IPD_DF, IPD_DT,
 OPD_DF, OPD_DT) = range(10)

W_ROW = 704        # iid/icc row window bits (34 codes x 20-bit worst case)
W_PD = 96          # ipd/opd row window bits (17 codes x 5-bit worst case)
RW = 288           # region bytes (FIL payload <= 269 B)
NLIFT = 6          # ceil(log2(35)) binary-lifting stages

_LUTS = None


@functools.lru_cache(maxsize=1)
def _tables():
    r = T.raw()
    lens = [int(r[f"ps_{n}_bits"].max()) for n in _NAMES]
    offs = [int(x) for x in r["ps_huff_offset"]]
    return lens, offs


def luts():
    """(flat_lut u16 [sum 2^maxlen], base i32 [10], maxlen i32 [10],
    offset i32 [10]).  Entry: code length (bits 0-4, 31 = invalid) |
    symbol index << 5."""
    global _LUTS
    if _LUTS is None:
        r = T.raw()
        maxlens, offsets = _tables()
        bases = np.zeros(10, np.int32)
        total = sum(1 << L for L in maxlens)
        flat = np.full(total, 31, np.uint16)
        cur = 0
        for t, n in enumerate(_NAMES):
            codes = r[f"ps_{n}_codes"]
            bits = r[f"ps_{n}_bits"]
            L = maxlens[t]
            bases[t] = cur
            for ci in range(len(codes)):
                ln = int(bits[ci])
                if ln == 0:
                    continue
                lo = int(codes[ci]) << (L - ln)
                flat[cur + lo:cur + lo + (1 << (L - ln))] = ln | (ci << 5)
            cur += 1 << L
        _LUTS = (flat, bases, np.asarray(maxlens, np.int32),
                 np.asarray(offsets, np.int32))
    return _LUTS


def _decode_row_jax(region, pos, tid, count, active, W, nsyms):
    """Decode one Huffman row per lane: `count` codes of table `tid`
    starting at bit `pos` of `region` [B, RW] u8.

    Returns (syms [B, nsyms] i32, pos' [B], row_ok [B])."""
    import jax.numpy as jnp

    flat, bases, maxlens, _ = luts()
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


def init_ps_carry(B: int):
    """Fresh per-lane PS entropy-decode carry (PSContext init state)."""
    import jax.numpy as jnp
    return dict(
        iid_last=jnp.zeros((B, 34), jnp.int32),
        icc_last=jnp.zeros((B, 34), jnp.int32),
        ipd_full=jnp.zeros((B, 5, 17), jnp.int32),
        opd_full=jnp.zeros((B, 5, 17), jnp.int32),
        pd_enable=jnp.zeros(B, jnp.int32),
        penv_prev=jnp.zeros(B, jnp.int32),
        ps_ok=jnp.ones(B, jnp.int32))


def decode_ps_region_jax(region, start_off, rbits, enable_iid, iq, nr_iid,
                         enable_icc, nr_icc, enable_ext, ne_pre, penv, nipd,
                         header, carry):
    """Batched PS-region decode (the value half of ff_ps_read_data).

    All control inputs are [B] i32; region is [B, RW] u8 raw bits with
    row data starting at bit `start_off`; `rbits` bounds the region
    (bits available).  `penv` is the post-fixup envelope count the host
    already derives from borders alone; `ne_pre` the pre-fixup count.

    Returns (iid [B,5,34], icc [B,5,34], ipd [B,5,17], opd [B,5,17],
    pd_on [B], ps_on_ok [B], new_carry) with post-fixup rows at native
    resolution, masks/limits applied, rows >= penv zeroed."""
    import jax.numpy as jnp

    _, _, _, offsets = luts()
    off_j = jnp.asarray(offsets)
    B = region.shape[0]
    pos = start_off.astype(jnp.int32)
    ok = jnp.ones(B, bool)

    def one_bit(pos, act):
        v = jnp.where(act, _read_bits_jax(region, pos, 1), 0)
        return v, jnp.where(act, pos + 1, pos)

    # ---- iid rows ---------------------------------------------------------
    iid_rows = jnp.zeros((B, 5, 34), jnp.int32)
    lim = 7 + 8 * iq
    prev_row = carry["iid_last"]
    iid_tabsel = jnp.asarray(
        np.array([IID_DF0, IID_DF1, IID_DT0, IID_DT1], np.int32))
    for e in range(4):
        act = (enable_iid > 0) & (e < ne_pre)
        dt, pos = one_bit(pos, act)
        tid = jnp.take(iid_tabsel, 2 * dt + iq)
        syms, pos, rok = _decode_row_jax(region, pos, tid,
                                         jnp.where(act, nr_iid, 0),
                                         act, W_ROW, 34)
        deltas = syms - jnp.take(off_j, tid)[:, None]
        row = jnp.where(dt[:, None] > 0, prev_row + deltas,
                        jnp.cumsum(deltas, axis=1))
        jmask = jnp.arange(34)[None, :] < nr_iid[:, None]
        row = jnp.where(jmask & act[:, None], row, 0)
        ok &= rok & jnp.where(
            act, ~jnp.any(jmask & (jnp.abs(row) > lim[:, None]), axis=1),
            True)
        prev_row = jnp.where(act[:, None], row, prev_row)
        iid_rows = iid_rows.at[:, e].set(row)

    # ---- icc rows ---------------------------------------------------------
    icc_rows = jnp.zeros((B, 5, 34), jnp.int32)
    prev_row_c = carry["icc_last"]
    for e in range(4):
        act = (enable_icc > 0) & (e < ne_pre)
        dt, pos = one_bit(pos, act)
        tid = jnp.where(dt > 0, ICC_DT, ICC_DF)
        syms, pos, rok = _decode_row_jax(region, pos, tid,
                                         jnp.where(act, nr_icc, 0),
                                         act, W_ROW, 34)
        deltas = syms - jnp.take(off_j, tid)[:, None]
        row = jnp.where(dt[:, None] > 0, prev_row_c + deltas,
                        jnp.cumsum(deltas, axis=1))
        jmask = jnp.arange(34)[None, :] < nr_icc[:, None]
        row = jnp.where(jmask & act[:, None], row, 0)
        ok &= rok & jnp.where(
            act, ~jnp.any(jmask & ((row < 0) | (row > 7)), axis=1), True)
        prev_row_c = jnp.where(act[:, None], row, prev_row_c)
        icc_rows = icc_rows.at[:, e].set(row)

    # ---- extension container (ipd/opd) ------------------------------------
    eact = enable_ext > 0
    cnt4 = jnp.where(eact, _read_bits_jax(region, pos, 4), 0)
    pos = jnp.where(eact, pos + 4, pos)
    esc = eact & (cnt4 == 15)
    cnt8 = jnp.where(esc, _read_bits_jax(region, pos, 8), 0)
    pos = jnp.where(esc, pos + 8, pos)
    cntbits = (cnt4 + cnt8) * 8
    ext_end = pos + cntbits
    # scan up to 4 two-bit ids for the first id==0 block
    found = jnp.zeros(B, bool)
    remaining = cntbits
    for _ in range(4):
        can = eact & ~found & (remaining > 7)
        id2 = jnp.where(can, _read_bits_jax(region, pos, 2), 3)
        pos = jnp.where(can, pos + 2, pos)
        remaining = jnp.where(can, remaining - 2, remaining)
        found |= can & (id2 == 0)
    ipdopd_bit, pos = one_bit(pos, found)
    # enable_ipdopd persists across frames without an id==0 block
    pd_enable = jnp.where(found, ipdopd_bit, carry["pd_enable"])
    # dt seed: the previous frame's post-fixup last row
    seed_idx = jnp.clip(carry["penv_prev"] - 1, 0, 4)

    def seed_of(full):
        return jnp.take_along_axis(
            full, seed_idx[:, None, None] * jnp.ones((1, 1, 17), jnp.int32),
            axis=1)[:, 0]

    prev_pd = [seed_of(carry["ipd_full"]), seed_of(carry["opd_full"])]
    new_pd = [jnp.zeros((B, 5, 17), jnp.int32),
              jnp.zeros((B, 5, 17), jnp.int32)]
    parse_pd = found & (ipdopd_bit > 0)
    for e in range(4):
        for which in range(2):  # interleaved per env: ipd row, opd row
            act = parse_pd & (e < ne_pre)
            dt, pos = one_bit(pos, act)
            tid = jnp.where(dt > 0,
                            IPD_DT if which == 0 else OPD_DT,
                            IPD_DF if which == 0 else OPD_DF)
            syms, pos, rok = _decode_row_jax(region, pos, tid,
                                             jnp.where(act, nipd, 0),
                                             act, W_PD, 17)
            deltas = syms - jnp.take(off_j, tid)[:, None]
            row = jnp.where(dt[:, None] > 0, prev_pd[which] + deltas,
                            jnp.cumsum(deltas, axis=1)) & 7
            jmask = jnp.arange(17)[None, :] < nipd[:, None]
            row = jnp.where(jmask & act[:, None], row, 0)
            ok &= rok
            prev_pd[which] = jnp.where(act[:, None], row, prev_pd[which])
            new_pd[which] = new_pd[which].at[:, e].set(row)
    pos = jnp.where(found, pos + 1, pos)  # reserved_ps
    # extension container overrun (aacps.c: cnt < 0 -> error)
    ok &= jnp.where(found, pos <= ext_end, True)
    pos = jnp.where(eact, jnp.maximum(pos, ext_end), pos)
    ok &= pos <= rbits

    # frames without a fresh id==0 block keep the carried rows verbatim
    ipd_rows = jnp.where(parse_pd[:, None, None], new_pd[0],
                         carry["ipd_full"])
    opd_rows = jnp.where(parse_pd[:, None, None], new_pd[1],
                         carry["opd_full"])

    # ---- fake-envelope fixup (aacps.c:234-252) ----------------------------
    do_fix = penv > ne_pre
    # source != num_env gate: ne_pre==0 needs penv_prev >= 2, else always
    can_copy = do_fix & jnp.where(ne_pre > 0, True, carry["penv_prev"] != 1)
    # ... except that when ne_pre==0 and penv_prev==1 the reference skips
    # the copy because par[0] ALREADY holds that row (arrays persist); the
    # carried seed gives the same value, so copying is equivalent:
    can_copy = do_fix

    def fix(rows, seed, width, enabled):
        src_idx = jnp.clip(ne_pre - 1, 0, 4)
        src = jnp.take_along_axis(
            rows, src_idx[:, None, None] * jnp.ones((1, 1, width),
                                                    jnp.int32), axis=1)[:, 0]
        src = jnp.where((ne_pre > 0)[:, None], src, seed)
        src = jnp.where(enabled[:, None], src, 0)
        onehot = jnp.arange(5)[None, :, None] == \
            jnp.clip(ne_pre, 0, 4)[:, None, None]
        return jnp.where(onehot & can_copy[:, None, None],
                         src[:, None, :], rows)

    iid_rows = fix(iid_rows, carry["iid_last"], 34, enable_iid > 0)
    icc_rows = fix(icc_rows, carry["icc_last"], 34, enable_icc > 0)
    ipd_rows = fix(ipd_rows, seed_of(carry["ipd_full"]), 17, pd_enable > 0)
    opd_rows = fix(opd_rows, seed_of(carry["opd_full"]), 17, pd_enable > 0)

    # zero unused / disabled rows (wire-v4 parity: gather_ps masked them)
    e5 = jnp.arange(5)[None, :, None]
    env_mask = e5 < penv[:, None, None]
    iid_rows = jnp.where(env_mask & (enable_iid > 0)[:, None, None],
                         iid_rows, 0)
    icc_rows = jnp.where(env_mask & (enable_icc > 0)[:, None, None],
                         icc_rows, 0)
    pd_mask = env_mask & (pd_enable > 0)[:, None, None]
    ipd_rows = jnp.where(pd_mask, ipd_rows, 0)
    opd_rows = jnp.where(pd_mask, opd_rows, 0)

    # ---- carry update ------------------------------------------------------
    last = jnp.clip(penv - 1, 0, 4)

    def last_row(rows, width):
        return jnp.take_along_axis(
            rows, last[:, None, None] * jnp.ones((1, 1, width), jnp.int32),
            axis=1)[:, 0]

    ps_ok = jnp.where(header > 0, jnp.ones(B, jnp.int32), carry["ps_ok"])
    ps_ok = jnp.where(ok, ps_ok, 0)
    new_carry = dict(
        iid_last=last_row(iid_rows, 34),
        icc_last=last_row(icc_rows, 34),
        ipd_full=jnp.where((pd_enable > 0)[:, None, None], ipd_rows, 0),
        opd_full=jnp.where((pd_enable > 0)[:, None, None], opd_rows, 0),
        pd_enable=pd_enable.astype(jnp.int32),
        penv_prev=penv.astype(jnp.int32),
        ps_ok=ps_ok)
    return (iid_rows, icc_rows, ipd_rows, opd_rows,
            (pd_enable > 0).astype(jnp.int32), ps_ok, new_carry)
