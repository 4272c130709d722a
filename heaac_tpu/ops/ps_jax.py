"""Batched Parametric Stereo as a fused XLA graph (20- and 34-band).

Device half of HE-AAC v2 (reference DSP: aacps.c:283-992) over [B] lanes.
The mixing matrices (pure bitstream data + persistent host state) arrive
pre-computed per envelope from codec/frame_plan.py; interpolation across
time slots becomes a small einsum.  The only sequential pieces — transient
smoothing and the 3-link allpass chain — run as a single 32-step lax.scan
carrying tiny per-lane state; everything else is static slicing, one-hot
matmuls and elementwise complex arithmetic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import ps_tables as P

HIGHEST = jax.lax.Precision.HIGHEST

_PALLAS = None  # resolved lazily; see _use_pallas


def _use_pallas() -> bool:
    """Opt-in (HEAAC_PS_PALLAS=1) pallas kernel for the sequential
    recurrences.  Measured on v5e at B=2048 in the full scan pipeline the
    kernel is ~2x SLOWER end-to-end than the lax.scan pair (its
    lanes-minor layout forces [B,...] transposes and breaks XLA's overlap
    of the recurrences with neighboring stages), despite being ~3x faster
    in isolation -- so the default stays with XLA."""
    global _PALLAS
    if _PALLAS is None:
        import os
        if os.environ.get("HEAAC_PS_PALLAS"):
            from . import ps_pallas
            _PALLAS = ps_pallas.available()
        else:
            _PALLAS = False
    return bool(_PALLAS)
@functools.cache
def _consts(is34: int = 0):
    f = P.hybrid_filters()
    k_to_i = P.k_to_i(is34)                       # [71 or 91]
    nr_bands = P.NR_BANDS[is34]
    # one-hot [91, 34] for power aggregation (rows >= nr_bands zero)
    agg = np.zeros((91, 34), np.float32)
    for k in range(nr_bands):
        agg[k, k_to_i[k]] = 1.0
    # gather map k -> parameter band (clipped)
    k2i = np.zeros(91, np.int32)
    k2i[:nr_bands] = k_to_i[:nr_bands]
    q_fract, phi_fract = P.fractional_delays()
    napb = P.NR_ALLPASS_BANDS[is34]               # 30 or 50
    gds = np.clip(1.0 - 0.05 * (np.arange(napb) - P.DECAY_CUTOFF[is34]),
                  0.0, 1.0).astype(np.float32)
    ag = (P.AP_A[None, :] * gds[:, None]).astype(np.float32)   # [napb,3]
    qf = q_fract[is34][:napb].astype(np.float32)               # [napb,3,2]
    pf = phi_fract[is34][:napb].astype(np.float32)             # [napb,2]
    # ipd imaginary start-sign flip bands (aacps.c:919)
    flip = np.zeros(91, np.float32)
    if is34:
        flip[9:14] = 1.0
    else:
        flip[:2] = 1.0
    return dict(f20=f["f20_0_8"], g1=f["g1_Q2"],
                f34_0=f["f34_0_12"], f34_1=f["f34_1_8"], f34_2=f["f34_2_4"],
                agg=agg, k2i=k2i, ag=ag, qf=qf, pf=pf, napb=napb,
                nr_bands=nr_bands, flip=flip,
                short_delay=P.SHORT_DELAY_BAND[is34])


def _hybrid_cx(w, filt):
    """Generic N-subband complex hybrid filter (aacps.c:338-357).
    w: [B,32,13,2] window; filt: [N,7,2] -> (re, im) each [B,N,32]."""
    in0 = w[:, :, 0:6]
    in1 = w[:, :, 12:6:-1]
    f_re, f_im = filt[:, :6, 0], filt[:, :6, 1]
    ctr = filt[:, 6, 0]
    s_re = (jnp.einsum("nj,blj->bnl", f_re, in0[..., 0] + in1[..., 0],
                       precision=HIGHEST)
            - jnp.einsum("nj,blj->bnl", f_im, in0[..., 1] - in1[..., 1],
                         precision=HIGHEST)
            + ctr[None, :, None] * w[:, None, :, 6, 0])
    s_im = (jnp.einsum("nj,blj->bnl", f_re, in0[..., 1] + in1[..., 1],
                       precision=HIGHEST)
            + jnp.einsum("nj,blj->bnl", f_im, in0[..., 0] - in1[..., 0],
                         precision=HIGHEST)
            + ctr[None, :, None] * w[:, None, :, 6, 1])
    return s_re, s_im


def hybrid_analysis(L, in_buf, is34: int = 0):
    """L [B,2,38,64], in_buf [B,5,6,2] -> (lbuf [B,91,32,2], new in_buf).

    aacps.c:359-395."""
    c = _consts(is34)
    lin = jnp.stack([jnp.swapaxes(L[:, 0, :, :5], 1, 2),
                     jnp.swapaxes(L[:, 1, :, :5], 1, 2)], axis=-1)  # [B,5,38,2]
    full = jnp.concatenate([in_buf, lin], axis=2)                  # [B,5,44,2]
    idx = np.arange(32)[:, None] + np.arange(13)[None, :]           # [32,13]
    w = full[:, :, idx]                                             # [B,5,32,13,2]

    if is34:
        # bands 0..4 -> 12+8+4+4+4 complex sub-bands (aacps.c:368-379)
        parts_re, parts_im = [], []
        for bi, fname in ((0, "f34_0"), (1, "f34_1"), (2, "f34_2"),
                          (3, "f34_2"), (4, "f34_2")):
            r, im = _hybrid_cx(w[:, bi], c[fname])
            parts_re.append(r)
            parts_im.append(im)
        direct_re = jnp.swapaxes(L[:, 0, :32, 5:64], 1, 2)          # [B,59,32]
        direct_im = jnp.swapaxes(L[:, 1, :32, 5:64], 1, 2)
        lbuf_re = jnp.concatenate(parts_re + [direct_re], 1)        # [B,91,32]
        lbuf_im = jnp.concatenate(parts_im + [direct_im], 1)
        return (jnp.stack([lbuf_re, lbuf_im], -1), full[:, :, 32:38])

    # band 0 -> 6 complex sub-bands via f20_0_8 (hybrid6_cx, aacps.c:303)
    w0 = w[:, 0]                                                    # [B,32,13,2]
    s_re, s_im = _hybrid_cx(w0, c["f20"])
    # shuffle (aacps.c:323-335): out0..5 from sub-bands 6,7,0,1,2+5,3+4
    b0_re = jnp.stack([s_re[:, 6], s_re[:, 7], s_re[:, 0], s_re[:, 1],
                       s_re[:, 2] + s_re[:, 5], s_re[:, 3] + s_re[:, 4]], 1)
    b0_im = jnp.stack([s_im[:, 6], s_im[:, 7], s_im[:, 0], s_im[:, 1],
                       s_im[:, 2] + s_im[:, 5], s_im[:, 3] + s_im[:, 4]], 1)

    # bands 1, 2 -> 2 real-filtered sub-bands each (hybrid2_re, aacps.c:283)
    g = c["g1"]                                                     # [7]
    def h2(wb):
        re_in = g[6] * wb[:, :, 6, 0]
        im_in = g[6] * wb[:, :, 6, 1]
        re_op = sum(g[j + 1] * (wb[:, :, j + 1, 0] + wb[:, :, 11 - j, 0])
                    for j in (0, 2, 4))
        im_op = sum(g[j + 1] * (wb[:, :, j + 1, 1] + wb[:, :, 11 - j, 1])
                    for j in (0, 2, 4))
        return re_in, im_in, re_op, im_op

    r1, i1, r1o, i1o = h2(w[:, 1])
    r2, i2, r2o, i2o = h2(w[:, 2])
    # band1 reverse=1: out[6+1]=in-phase+op, out[6]=in-phase-op
    band12_re = jnp.stack([r1 - r1o, r1 + r1o, r2 + r2o, r2 - r2o], 1)
    band12_im = jnp.stack([i1 - i1o, i1 + i1o, i2 + i2o, i2 - i2o], 1)

    direct_re = jnp.swapaxes(L[:, 0, :32, 3:64], 1, 2)              # [B,61,32]
    direct_im = jnp.swapaxes(L[:, 1, :32, 3:64], 1, 2)
    pad = jnp.zeros((L.shape[0], 20, 32), jnp.float32)
    lbuf_re = jnp.concatenate([b0_re, band12_re, direct_re, pad], 1)  # [B,91,32]
    lbuf_im = jnp.concatenate([b0_im, band12_im, direct_im, pad], 1)
    return (jnp.stack([lbuf_re, lbuf_im], -1), full[:, :, 32:38])


def decorrelate_and_mix(lbuf, state, plan, is34: int = 0):
    """Transient detection, allpass decorrelation, stereo mix.

    lbuf [B,91,32,2]; state dict with delay [B,91,14,2], ap [B,50,3,5,2],
    trans [B,34,3]; plan with H [B,2,6,34,4], Ws/We [B,6,32], ipd_on [B],
    top_mask [B,91].  Returns (lmix, rmix [B,91,32,2], new_state)."""
    c = _consts(is34)
    napb = c["napb"]
    B = lbuf.shape[0]
    tm = plan["top_mask"][:, :, None, None]
    delay_hist = state["delay"] * tm
    ap = state["ap"][:, :napb] * plan["top_mask"][:, :napb, None, None,
                                                  None]

    power = jnp.einsum("bkn,ki->bin",
                       lbuf[..., 0] ** 2 + lbuf[..., 1] ** 2, c["agg"],
                       precision=HIGHEST)                        # [B,34,32]

    delay_full = jnp.concatenate([delay_hist, lbuf], axis=2)     # [B,91,46,2]
    new_delay = delay_full[:, :, 32:]

    # allpass bands: phi-rotated 2-slot-delayed input (aacps.c:714-717)
    din = delay_full[:, :napb, 12:44]                            # [B,napb,32,2]
    pf = c["pf"]
    in_re = din[..., 0] * pf[None, :, 0:1] - din[..., 1] * pf[None, :, 1:2]
    in_im = din[..., 0] * pf[None, :, 1:2] + din[..., 1] * pf[None, :, 0:1]

    # the transient detector + 3-link allpass chain are the only sequential
    # recurrences in the decode graph; on TPU they run as one fused pallas
    # kernel (ops/ps_pallas.py) in the common 20-band mode, with a lax.scan
    # fallback elsewhere (CPU CI; the 50-row 34-band block overflows the
    # kernel's VMEM budget)
    if napb <= 30 and _use_pallas():
        from . import ps_pallas
        tgain, ap_out, ntrans, ap_new = ps_pallas.decorrelate_seq(
            power, in_re, in_im, state["trans"], ap, c["ag"], c["qf"])
        tstate = (ntrans[..., 0], ntrans[..., 1], ntrans[..., 2])
    else:
        tgain, ap_out, tstate, ap_new = _decorrelate_scans(
            power, in_re, in_im, state, ap, c)
    tgain_k = jnp.moveaxis(jnp.take(tgain, c["k2i"], axis=2), 1, 2)  # [B,91,32]

    sd = c["short_delay"]
    out_ap = ap_out * tgain_k[:, :napb, :, None]
    # short (delay 14) and long (delay 1) bands (aacps.c:736-753).
    # Built as concat-of-slices from the two source arrays rather than
    # slices of delay_full: the slice-of-concat + broadcast-multiply fusion
    # miscompiles on the axon TPU backend (verified vs numpy).
    d14 = jnp.concatenate([delay_hist[:, napb:sd], lbuf[:, napb:sd, 0:18]],
                          axis=2)
    d1 = jnp.concatenate([delay_hist[:, sd:, 13:14], lbuf[:, sd:, 0:31]],
                         axis=2)
    out_rest = jnp.concatenate([d14, d1], axis=1) * tgain_k[:, napb:, :, None]
    rbuf = jnp.concatenate([out_ap, out_rest], axis=1)           # [B,91,32,2]

    # ---- stereo mixing (aacps.c:863-969) ----
    # h(n) = Ws-weighted start H + We-weighted end H (linear interpolation);
    # the reference flips the sign of the *start* imaginary part for k<=1
    # (aacps.c:919-923), so the imaginary plane needs both variants.
    Ws, We = plan["Ws"], plan["We"]                              # [B,6,32]
    h_re = jnp.einsum("ben,bedj->bndj", Ws + We, plan["H"][:, 0],
                      precision=HIGHEST)                         # [B,32,34,4]
    h_im_pos = jnp.einsum("ben,bedj->bndj", Ws + We, plan["H"][:, 1],
                          precision=HIGHEST)
    h_im_neg = jnp.einsum("ben,bedj->bndj", We - Ws, plan["H"][:, 1],
                          precision=HIGHEST)
    hk_re = jnp.take(h_re, c["k2i"], axis=2)                     # [B,32,91,4]
    hk_imp = jnp.take(h_im_pos, c["k2i"], axis=2)
    hk_imn = jnp.take(h_im_neg, c["k2i"], axis=2)
    flip = c["flip"]
    hk_im = hk_imp * (1.0 - flip)[None, None, :, None] \
        + hk_imn * flip[None, None, :, None]
    h_re = jnp.moveaxis(hk_re, 1, 2)                             # [B,91,32,4]
    h_im = jnp.moveaxis(hk_im, 1, 2) * plan["ipd_on"][:, None, None, None]
    l_re, l_im = lbuf[..., 0], lbuf[..., 1]
    r_re, r_im = rbuf[..., 0], rbuf[..., 1]
    h11r, h12r, h21r, h22r = (h_re[..., 0], h_re[..., 1], h_re[..., 2],
                              h_re[..., 3])
    h11i, h12i, h21i, h22i = (h_im[..., 0], h_im[..., 1], h_im[..., 2],
                              h_im[..., 3])
    lm_re = h11r * l_re + h21r * r_re - h11i * l_im - h21i * r_im
    lm_im = h11r * l_im + h21r * r_im + h11i * l_re + h21i * r_re
    rm_re = h12r * l_re + h22r * r_re - h12i * l_im - h22i * r_im
    rm_im = h12r * l_im + h22r * r_im + h12i * l_re + h22i * r_re

    lmix = jnp.stack([lm_re, lm_im], -1)
    rmix = jnp.stack([rm_re, rm_im], -1)
    if napb < 50:  # keep the state container at the 34-band size
        ap_new = jnp.concatenate(
            [ap_new, state["ap"][:, napb:]], axis=1)
    new_state = dict(delay=new_delay, ap=ap_new,
                     trans=jnp.stack(tstate, -1))
    return lmix, rmix, new_state


def _decorrelate_scans(power, in_re, in_im, state, ap, c):
    """lax.scan fallback for the sequential recurrences (used when the
    pallas kernel is unavailable, e.g. CPU CI); numerics identical to
    ops/ps_pallas.decorrelate_seq."""
    def trans_step(carry, pn):
        pk, psm, pdd = carry
        pk = jnp.maximum(P.PEAK_DECAY_FACTOR * pk, pn)
        psm = psm + P.A_SMOOTH * (pn - psm)
        pdd = pdd + P.A_SMOOTH * (pk - pn - pdd)
        denom = P.TRANSIENT_IMPACT * pdd
        tg = jnp.where(denom > psm, psm / jnp.where(denom != 0, denom, 1.0),
                       1.0)
        return (pk, psm, pdd), tg

    tstate = (state["trans"][..., 0], state["trans"][..., 1],
              state["trans"][..., 2])
    tstate, tgain = jax.lax.scan(trans_step, tstate,
                                 jnp.moveaxis(power, 2, 0))
    tgain = jnp.moveaxis(tgain, 0, 1)                            # [B,32,34]
    ag = c["ag"]
    qf = c["qf"]

    def ap_step(buf, x):
        # buf [B,napb,3,5,2]; x [B,napb,2]
        cur_re, cur_im = x[..., 0], x[..., 1]
        outs_re, outs_im = cur_re, cur_im
        new_cols = []
        for m in range(3):
            ld = buf[:, :, m, 5 - int(P.LINK_DELAY[m])]          # [B,napb,2]
            a_re = ag[None, :, m] * outs_re
            a_im = ag[None, :, m] * outs_im
            nre = (ld[..., 0] * qf[None, :, m, 0]
                   - ld[..., 1] * qf[None, :, m, 1] - a_re)
            nim = (ld[..., 0] * qf[None, :, m, 1]
                   + ld[..., 1] * qf[None, :, m, 0] - a_im)
            store = jnp.stack([outs_re + ag[None, :, m] * nre,
                               outs_im + ag[None, :, m] * nim], -1)
            new_cols.append(store)
            outs_re, outs_im = nre, nim
        newbuf = jnp.concatenate(
            [buf[:, :, :, 1:], jnp.stack(new_cols, 2)[:, :, :, None]], axis=3)
        return newbuf, jnp.stack([outs_re, outs_im], -1)

    x_seq = jnp.moveaxis(jnp.stack([in_re, in_im], -1), 2, 0)    # [32,B,n,2]
    ap_new, ap_out = jax.lax.scan(ap_step, ap, x_seq)
    ap_out = jnp.moveaxis(ap_out, 0, 2)                          # [B,napb,32,2]
    return tgain, ap_out, tstate, ap_new


def map_val_20_to_34(v):
    """Band-resolution conversion of a carried per-band tensor at a
    20->34 PS band-mode flip (aacps.c map_val_20_to_34, applied to the
    H-matrix row-0 carry).  Bands along axis -2: v [..., 34, k]."""
    from .ps_np import _IDX_20_TO_34
    half = np.float32(0.5)
    idx = np.array([max(s, 0) for s in _IDX_20_TO_34], np.int32)
    out = jnp.take(v, idx, axis=-2)
    out = out.at[..., 1, :].set((v[..., 0, :] + v[..., 1, :]) * half)
    out = out.at[..., 4, :].set((v[..., 2, :] + v[..., 3, :]) * half)
    return out


def map_val_34_to_20(v):
    """34->20 flip conversion of a carried per-band tensor
    (aacps.c map_val_34_to_20); bands 20..33 keep their stale values
    exactly like the reference's in-place arrays.  v [..., 34, k]."""
    p = lambda i: v[..., i, :]
    third = np.float32(0.33333333)
    half = np.float32(0.5)
    quarter = np.float32(0.25)
    rows = [
        (2 * p(0) + p(1)) * third,
        (p(1) + 2 * p(2)) * third,
        (2 * p(3) + p(4)) * third,
        (p(4) + 2 * p(5)) * third,
        (p(6) + p(7)) * half,
        (p(8) + p(9)) * half,
        p(10), p(11),
        (p(12) + p(13)) * half,
        (p(14) + p(15)) * half,
        p(16), p(17), p(18), p(19),
        (p(20) + p(21)) * half,
        (p(22) + p(23)) * half,
        (p(24) + p(25)) * half,
        (p(26) + p(27)) * half,
        (p(28) + p(29) + p(30) + p(31)) * quarter,
        (p(32) + p(33)) * half,
    ]
    return jnp.concatenate([jnp.stack(rows, axis=-2), v[..., 20:, :]],
                           axis=-2)


def hybrid_synthesis(buf, is34: int = 0):
    """[B,91,32,2] -> [B,2,38,64] (aacps.c:397-445)."""
    B = buf.shape[0]
    if is34:
        groups = [buf[:, 0:12].sum(1), buf[:, 12:20].sum(1),
                  buf[:, 20:24].sum(1), buf[:, 24:28].sum(1),
                  buf[:, 28:32].sum(1)]
        first = jnp.stack(groups, axis=1)                        # [B,5,32,2]
        full = jnp.concatenate([first, buf[:, 32:91]], axis=1)   # [B,64,32,2]
        X = jnp.swapaxes(full, 1, 2)
        X = jnp.pad(X, ((0, 0), (0, 6), (0, 0), (0, 0)))
        return jnp.stack([X[..., 0], X[..., 1]], axis=1)
    band0 = buf[:, 0:6].sum(1)                                   # [B,32,2]
    band1 = buf[:, 6:8].sum(1)
    band2 = buf[:, 8:10].sum(1)
    rest = buf[:, 10:71]                                         # [B,61,32,2]
    first3 = jnp.stack([band0, band1, band2], axis=1)            # [B,3,32,2]
    full = jnp.concatenate([first3, rest], axis=1)               # [B,64,32,2]
    X = jnp.swapaxes(full, 1, 2)                                 # [B,32,64,2]
    X = jnp.pad(X, ((0, 0), (0, 6), (0, 0), (0, 0)))             # [B,38,64,2]
    return jnp.stack([X[..., 0], X[..., 1]], axis=1)
