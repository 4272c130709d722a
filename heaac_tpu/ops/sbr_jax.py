"""Batched SBR reconstruction as a fused XLA graph.

Device half of HE-AAC v1 (reference DSP: aacsbr.c:1136-1771), operating on
``[B, ...]`` lanes with static shapes.  All per-frame dynamic structure
(band tables, patches, envelope grids, noise/sine phases) arrives as dense
mask/index tensors from codec/frame_plan.py; there is no data-dependent
control flow — everything is masked arithmetic, gathers with host-computed
indices, and one-hot matmuls that ride the MXU.

Dataflow per frame (each item one fused stage):
  W    = qmf_analysis(core_pcm)                      [B,32,32,2]
  X_low = lf_gen(W_prev, W)                           [B,32,40,2]
  alpha = covariance solve over X_low                 [B,32,2,2]
  X_hi  = 2-tap filtered patch copy (m-domain)        [B,48,40,2]
  e_curr = envelope energy estimate                   [B,5,48]
  gain/q_m/s_m = limiter + boost                      [B,5,48]
  Y     = gain-smoothed X_hi + noise/sine injection   [B,38,48,2]
  X     = stitch(X_low, Y_prev, Y)                    [B,2,38,64]
  pcm   = qmf_synthesis(X)                            [B,2048]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..bitstream import sbr_syntax as S
from ..tables import aac_tables as T

HIGHEST = jax.lax.Precision.HIGHEST
EPS = np.float32(np.finfo(np.float32).eps)

H_SMOOTH = np.array([0.33333333333333, 0.30150283239582, 0.21816949906249,
                     0.11516383427084, 0.03183050093751], np.float32)


def lf_gen(W_prev, W_cur, xlow_new, xlow_old):
    """[B,32,32,2] x2 -> X_low [B,32,40,2] (aacsbr.c:1337-1357)."""
    hist = jnp.swapaxes(W_prev[:, 24:32], 1, 2)   # [B,32bands,8,2]
    cur = jnp.swapaxes(W_cur, 1, 2)               # [B,32bands,32,2]
    xl = jnp.concatenate([hist * xlow_old[:, :32, None, None],
                          cur * xlow_new[:, :32, None, None]], axis=2)
    return xl                                     # [B,32,40,2]


def hf_inverse_filter(X_low):
    """Batched covariance solve (aacsbr.c:1232-1313).
    X_low [B,32,40,2] -> alpha0, alpha1 [B,32,2]."""
    xr = X_low[..., 0]
    xi = X_low[..., 1]

    def corr(lag):
        a = xr[..., 0:38]
        b = xi[..., 0:38]
        c = xr[..., lag:38 + lag]
        d = xi[..., lag:38 + lag]
        re = (a * c + b * d).sum(-1)
        im = (a * d - b * c).sum(-1)
        return re, im

    # phi terms (lag sums over i in [0,38) and [1,39))
    r01_re, r01_im = corr(1)
    r02_re, r02_im = corr(2)
    sq = xr * xr + xi * xi
    p21_0 = sq[..., 0:38].sum(-1)                       # phi[2][1][0]
    p10_0 = sq[..., 1:39].sum(-1)                       # phi[1][0][0]
    # phi[0][0] adds the i=38 lag-1 term
    p00_re = r01_re - (xr[..., 0] * xr[..., 1] + xi[..., 0] * xi[..., 1]) \
        + (xr[..., 38] * xr[..., 39] + xi[..., 38] * xi[..., 39])
    p00_im = r01_im - (xr[..., 0] * xi[..., 1] - xi[..., 0] * xr[..., 1]) \
        + (xr[..., 38] * xi[..., 39] - xi[..., 38] * xr[..., 39])
    p11_re, p11_im = r01_re, r01_im                     # phi[1][1]
    p01_re, p01_im = r02_re, r02_im                     # phi[0][1]

    dk = p21_0 * p10_0 - (p11_re ** 2 + p11_im ** 2) / np.float32(1.000001)
    t1_re = p00_re * p11_re - p00_im * p11_im - p01_re * p10_0
    t1_im = p00_re * p11_im + p00_im * p11_re - p01_im * p10_0
    safe_dk = jnp.where(dk != 0, dk, 1.0)
    a1_re = jnp.where(dk != 0, t1_re / safe_dk, 0.0)
    a1_im = jnp.where(dk != 0, t1_im / safe_dk, 0.0)
    t0_re = p00_re + a1_re * p11_re + a1_im * p11_im
    t0_im = p00_im + a1_im * p11_re - a1_re * p11_im
    safe_p = jnp.where(p10_0 != 0, p10_0, 1.0)
    a0_re = jnp.where(p10_0 != 0, -t0_re / safe_p, 0.0)
    a0_im = jnp.where(p10_0 != 0, -t0_im / safe_p, 0.0)
    bad = ((a1_re ** 2 + a1_im ** 2 >= 16.0)
           | (a0_re ** 2 + a0_im ** 2 >= 16.0))
    zero = jnp.float32(0.0)
    a0_re = jnp.where(bad, zero, a0_re)
    a0_im = jnp.where(bad, zero, a0_im)
    a1_re = jnp.where(bad, zero, a1_re)
    a1_im = jnp.where(bad, zero, a1_im)
    return (jnp.stack([a0_re, a0_im], -1), jnp.stack([a1_re, a1_im], -1))


def _corr_edge_terms():
    """corr(1) above sums i in [0,38); the reference phi[1][1] uses i in
    [0,38) too (sum over 1..37 plus i=0 term).  Verified in tests."""


def hf_gen(X_low, alpha0, alpha1, src_of_m, bw_of_m, hf_mask, gen_slot_mask):
    """Patch copy + 2-tap filter, m-domain (aacsbr.c:1360-1409).
    -> X_high [B,48,40,2]."""
    # gather per-m source band
    xl = jnp.take_along_axis(X_low, src_of_m[:, :, None, None]
                             .astype(jnp.int32).clip(0, 31)
                             .repeat(40, 2).repeat(2, 3), axis=1)  # [B,48,40,2]
    a0 = jnp.take_along_axis(alpha0, src_of_m.astype(jnp.int32)
                             .clip(0, 31)[:, :, None].repeat(2, 2), axis=1)
    a1 = jnp.take_along_axis(alpha1, src_of_m.astype(jnp.int32)
                             .clip(0, 31)[:, :, None].repeat(2, 2), axis=1)
    bw = bw_of_m[:, :, None]
    bw2 = bw * bw
    c1_re = a1[..., 0:1] * bw2   # [B,48,1]
    c1_im = a1[..., 1:2] * bw2
    c0_re = a0[..., 0:1] * bw
    c0_im = a0[..., 1:2] * bw
    xr, xi = xl[..., 0], xl[..., 1]
    xr2 = jnp.pad(xr[..., :-2], ((0, 0), (0, 0), (2, 0)))
    xi2 = jnp.pad(xi[..., :-2], ((0, 0), (0, 0), (2, 0)))
    xr1 = jnp.pad(xr[..., :-1], ((0, 0), (0, 0), (1, 0)))
    xi1 = jnp.pad(xi[..., :-1], ((0, 0), (0, 0), (1, 0)))
    hr = xr2 * c1_re - xi2 * c1_im + xr1 * c0_re - xi1 * c0_im + xr
    hi = xi2 * c1_re + xr2 * c1_im + xi1 * c0_re + xr1 * c0_im + xi
    mask = hf_mask[:, :, None] * gen_slot_mask[:, None, :]
    return jnp.stack([hr * mask, hi * mask], axis=-1)


def env_estimate(X_high, env_onehot, recip, grp_mean, freqres_sel):
    """Envelope energy estimate (aacsbr.c:1499-1546).
    X_high [B,48,40,2] -> e_curr [B,5,48].  With interpol_freq=0 the
    per-line energies are replaced by scalefactor-band group means via the
    host-built grp_mean matrices (identity when interpol_freq=1)."""
    energy = X_high[..., 0] ** 2 + X_high[..., 1] ** 2   # [B,48,40]
    # envelope e covers X_high slots (2t_e+2 .. 2t_{e+1}+2) == env_onehot
    # shifted by the adjustment offset
    eslots = jnp.pad(env_onehot, ((0, 0), (0, 0), (2, 0)))[..., :40]  # [B,5,40]
    acc = jnp.einsum("bms,bes->bem", energy, eslots, precision=HIGHEST)
    e1 = acc * recip[:, :, None]
    g_lo = jnp.einsum("bem,bmk->bek", e1, grp_mean[:, 0], precision=HIGHEST)
    g_hi = jnp.einsum("bem,bmk->bek", e1, grp_mean[:, 1], precision=HIGHEST)
    sel = freqres_sel[:, :, None]
    return sel * g_hi + (1.0 - sel) * g_lo


def gain_calc(e_curr, plan):
    """Limiter + boost (aacsbr.c:1552-1605) -> gain, q_m, s_m [B,5,48]."""
    gain = jnp.sqrt(plan["gain_num"] /
                    ((1.0 + e_curr) * plan["den_q"]))
    q_m = plan["q_m0"]
    s_m = plan["s_m0"]
    lim = plan["lim_onehot"]                       # [B,L,48]
    sum_eo = jnp.einsum("blm,bem->bel", lim, plan["e_orig"], precision=HIGHEST)
    sum_ec = jnp.einsum("blm,bem->bel", lim, e_curr, precision=HIGHEST)
    gmax_band = plan["limgain"][:, None, None] * jnp.sqrt(
        (EPS + sum_eo) / (EPS + sum_ec))
    gmax_band = jnp.minimum(gmax_band, 100000.0)
    # broadcast band limit back to m positions
    gmax = jnp.einsum("bel,blm->bem", gmax_band, lim, precision=HIGHEST)
    inlim = jnp.einsum("bl,blm->bm", jnp.ones(lim.shape[:2], jnp.float32),
                       lim, precision=HIGHEST)[:, None, :]  # 1 where limited
    q_m_max = q_m * gmax / jnp.where(gain > 0, gain, 1.0)
    q_m = jnp.where(inlim > 0, jnp.minimum(q_m, q_m_max), q_m)
    gain = jnp.where(inlim > 0, jnp.minimum(gain, gmax), gain)
    sum_boost_den = jnp.einsum(
        "blm,bem->bel", lim,
        e_curr * gain * gain + s_m * s_m + plan["noisegate"] * q_m * q_m,
        precision=HIGHEST)
    boost_band = jnp.sqrt((EPS + sum_eo) / (EPS + sum_boost_den))
    boost_band = jnp.minimum(boost_band, np.float32(1.584893192))
    boost = jnp.einsum("bel,blm->bem", boost_band, lim, precision=HIGHEST)
    boost = jnp.where(inlim > 0, boost, 1.0)
    return gain * boost, q_m * boost, s_m * boost


def hf_assemble(X_high, gain, q_m, s_m, g_temp, q_temp, plan):
    """Gain application + noise/sine injection (aacsbr.c:1608-1714).
    Returns (Y_m [B,38,48,2], new g_temp, new q_temp)."""
    # g_temp row shuffle + envelope fill
    rs = plan["row_src"].astype(jnp.int32)[:, :, None]
    g_old = jnp.take_along_axis(g_temp, rs.repeat(48, 2), axis=1)
    q_old = jnp.take_along_axis(q_temp, rs.repeat(48, 2), axis=1)
    fill_g = jnp.einsum("bre,bem->brm", plan["fill_map"], gain,
                        precision=HIGHEST)
    fill_q = jnp.einsum("bre,bem->brm", plan["fill_map"], q_m,
                        precision=HIGHEST)
    wrote = plan["fill_map"].sum(-1, keepdims=True) > 0     # [B,42,1]
    g_new = jnp.where(wrote, fill_g, g_old)
    q_new = jnp.where(wrote, fill_q, q_old)

    # per-slot gains: direct vs 5-tap smoothed
    dr = plan["direct_row"].astype(jnp.int32)[:, :, None]
    g_direct = jnp.take_along_axis(g_new, dr.repeat(48, 2), axis=1)  # [B,38,48]
    q_direct_smooth_base = jnp.take_along_axis(q_new, dr.repeat(48, 2), axis=1)
    # smoothed: rows i..i+4 with weights h_smooth[4-j'] (j'=0..4)
    wrev = H_SMOOTH[::-1].copy()
    g_sm = sum(wrev[j] * g_new[:, j:j + 38] for j in range(5))
    q_sm = sum(wrev[j] * q_new[:, j:j + 38] for j in range(5))
    son = plan["smooth_on"][:, :, None]
    g_filt = jnp.where(son > 0, g_sm, g_direct)
    q_filt = jnp.where(son > 0, q_sm, q_direct_smooth_base)

    # per-slot sine/noise levels
    eo = plan["env_onehot"]                                  # [B,5,38]
    s_slot = jnp.einsum("bes,bem->bsm", eo, s_m, precision=HIGHEST)
    ngate = jnp.einsum("bes,bem->bsm", eo, plan["noisegate"],
                       precision=HIGHEST)
    env_on = eo.sum(1)[:, :, None]                           # [B,38,1]

    xh = jnp.swapaxes(X_high[:, :, 2:40], 1, 2)              # [B,38,48,2]
    y_re = xh[..., 0] * g_filt
    y_im = xh[..., 1] * g_filt

    # noise: idx = (start + m + 1) & 511
    noise = S.noise_table()                                  # [512,2]
    m_i = np.arange(48, dtype=np.int32)
    idx = (plan["noise_start"].astype(jnp.int32)[:, :, None]
           + m_i[None, None, :] + 1) & 0x1FF                 # [B,38,48]
    n_re = jnp.take(noise[:, 0], idx)
    n_im = jnp.take(noise[:, 1], idx)
    y_re = y_re + ngate * q_filt * n_re
    y_im = y_im + ngate * q_filt * n_im

    alt = np.ones(48, np.float32)
    alt[1::2] = -1.0
    y_re = y_re + s_slot * plan["sine_re"][:, :, None]
    y_im = y_im + s_slot * plan["sine_im0"][:, :, None] * alt

    y_re = y_re * env_on
    y_im = y_im * env_on
    return jnp.stack([y_re, y_im], -1), env_on, g_new, q_new


def x_gen(X_low, Y_m, Y_prev, env_slot_on, plan):
    """Stitch low band + HF into X [B,2,38,64] (aacsbr.c:1412-1446).

    Y_m [B,38,48,2] is in m-domain; scatter_m maps it to QMF bands.  Slots
    outside the envelope range keep the previous frame's Y (the reference's
    Y buffer persists; only envelope slots are rewritten)."""
    sc = plan["scatter_m"]                                   # [B,48,64]
    y_scat = jnp.einsum("bsmc,bmk->bskc", Y_m, sc,
                        precision=HIGHEST)                   # [B,38,64,2]
    y_cur = jnp.where(env_slot_on[..., None] > 0, y_scat, Y_prev)
    xl = jnp.swapaxes(X_low[:, :, 2:40], 1, 2)               # [B,38,32,2]
    xl = jnp.pad(xl, ((0, 0), (0, 0), (0, 32), (0, 0)))      # [B,38,64,2]
    i = np.arange(38)
    is_old = (i[None, :] < plan["i_temp"][:, None])[:, :, None, None]
    y_prev_ext = jnp.pad(Y_prev[:, 32:38], ((0, 0), (0, 32), (0, 0), (0, 0)))
    y_eff = jnp.where(is_old, y_prev_ext, y_cur)
    slot_lt32 = (i < 32)[None, :, None, None]
    use_y = jnp.where(is_old, plan["use_y_old"][:, None, :, None],
                      plan["use_y_new"][:, None, :, None] * slot_lt32)
    xlm = jnp.where(is_old, plan["xlow_old"][:, None, :, None],
                    plan["xlow_new"][:, None, :, None])
    X = xl * xlm + y_eff * use_y
    return jnp.stack([X[..., 0], X[..., 1]], axis=1), y_cur  # [B,2,38,64]
