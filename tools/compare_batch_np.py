#!/usr/bin/env python
"""Stage-by-stage comparison: batched device graph vs numpy SBR/PS path.

Usage: python tools/compare_batch_np.py stream.aac [nframes]
"""
import sys

import numpy as np

from heaac_tpu import decode_adts
from heaac_tpu.codec.batch import parse_stream_plans
from heaac_tpu.codec.core import _consts as core_consts
from heaac_tpu.codec.core import core_frame
from heaac_tpu.codec.heaac_graph import init_state
from heaac_tpu.ops import ps_jax, sbr_jax, sbr_np
from heaac_tpu.ops.qmf_jax import qmf_analysis, qmf_synthesis


def relerr(a, b, name=""):
    a = np.asarray(a)
    b = np.asarray(b)
    denom = max(np.abs(b).max(), 1e-3)
    return np.abs(a - b).max() / denom


def main():
    path = sys.argv[1]
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    he = open(path, "rb").read()
    sbr_np.DEBUG_SINK = []
    pcm_np, _ = decode_adts(he)
    dbg = sbr_np.DEBUG_SINK
    core, sbrp, psp, rate, _nl, _is34, _ds = parse_stream_plans(he)
    st = init_state(1)
    m2048, m256, bank = core_consts()
    for t in range(min(nf, len(dbg))):
        c = {k: np.asarray(v[t][0])[None] for k, v in core.items()}
        s = {k: np.asarray(v[t][0])[None] for k, v in sbrp.items()}
        p = {k: np.asarray(v[t][0])[None] for k, v in psp.items()}
        d = dbg[t]
        msgs = []

        time_out, saved = core_frame(c["coeffs"], st.saved, c["ws"],
                                     c["wsp"], c["kbd"], c["kbdp"],
                                     m2048, m256, bank)
        W, x_hist = qmf_analysis(time_out, st.x_hist)
        e = relerr(W[0], d["W1"])
        if e > 1e-4:
            msgs.append(f"W {e:.2e}")
        X_low = sbr_jax.lf_gen(st.W_prev, W, s["xlow_new"], s["xlow_old"])
        e = relerr(np.asarray(X_low)[0], d["X_low"])
        if e > 1e-4:
            msgs.append(f"X_low {e:.2e}")
        alpha0, alpha1 = sbr_jax.hf_inverse_filter(X_low)
        if "alpha0" in d:
            e = relerr(np.asarray(alpha0)[0], d["alpha0"][:32])
            e1 = relerr(np.asarray(alpha1)[0], d["alpha1"][:32])
            if max(e, e1) > 1e-3:
                msgs.append(f"alpha {e:.2e}/{e1:.2e}")
        X_high = sbr_jax.hf_gen(X_low, alpha0, alpha1, s["src_of_m"],
                                s["bw_of_m"], s["hf_mask"],
                                s["gen_slot_mask"])
        if "X_high" in d:
            # numpy X_high is QMF-band domain [64,40,2]; device is m-domain
            kx1 = d["kx"][1]
            m1 = d["m"][1]
            ref_m = d["X_high"][kx1:kx1 + m1]
            got = np.asarray(X_high)[0][:m1]
            mask = np.asarray(s["gen_slot_mask"])[0] > 0
            e = relerr(got[:, mask], ref_m[:, mask])
            if e > 1e-4:
                msgs.append(f"X_high {e:.2e}")
        e_curr = sbr_jax.env_estimate(X_high, s["env_onehot"], s["recip"],
                                      s["grp_mean"], s["freqres_sel"])
        if "e_curr" in d:
            ne = int(np.asarray(s["env_onehot"])[0].sum(1).astype(bool).sum())
        gain, q_m, s_m = sbr_jax.gain_calc(e_curr, s)
        if "gain" in d:
            m1 = d["m"][1]
            nenv = (np.asarray(s["env_onehot"])[0].sum(1) > 0).sum()
            e = relerr(np.asarray(gain)[0][:nenv, :m1], d["gain"][:nenv, :m1])
            eq = relerr(np.asarray(q_m)[0][:nenv, :m1], d["q_m"][:nenv, :m1])
            es = relerr(np.asarray(s_m)[0][:nenv, :m1], d["s_m"][:nenv, :m1])
            if max(e, eq, es) > 1e-3:
                msgs.append(f"gain/q/s {e:.2e}/{eq:.2e}/{es:.2e}")
        Y_m, env_on, g_temp, q_temp = sbr_jax.hf_assemble(
            X_high, gain, q_m, s_m, st.g_temp, st.q_temp, s)
        X, y_cur = sbr_jax.x_gen(X_low, Y_m, st.Y_prev, env_on, s)
        if "Y1" in d:
            e = relerr(np.asarray(y_cur)[0], d["Y1"])
            if e > 1e-4:
                msgs.append(f"Y {e:.2e}")
        if "X" in d:
            e = relerr(np.asarray(X)[0], d["X"])
            if e > 1e-4:
                msgs.append(f"X {e:.2e}")

        lbuf, ps_in_buf = ps_jax.hybrid_analysis(X, st.ps_in_buf)
        ps_state = dict(delay=st.ps_delay, ap=st.ps_ap, trans=st.ps_trans)
        lmix, rmix, ps_new = ps_jax.decorrelate_and_mix(lbuf, ps_state, p)
        Lp = ps_jax.hybrid_synthesis(lmix)
        Rp = ps_jax.hybrid_synthesis(rmix)
        on = np.asarray(p["ps_on"])[0]
        Lx = Lp if on > 0 else X
        Rx = Rp if on > 0 else X
        pcm0, v0 = qmf_synthesis(Lx, st.v0)
        pcm1, v1 = qmf_synthesis(Rx, st.v1)
        ref_pcm = pcm_np[t * 2048:(t + 1) * 2048]
        got0 = np.clip(np.rint(np.asarray(pcm0)[0]), -32768, 32767)
        got1 = np.clip(np.rint(np.asarray(pcm1)[0]), -32768, 32767)
        dmax = max(np.abs(got0 - ref_pcm[:, 0]).max(),
                   np.abs(got1 - ref_pcm[:, 1]).max())
        if dmax > 2:
            msgs.append(f"PCM maxLSB {dmax:.0f}")

        print(f"frame {t}: " + ("; ".join(msgs) if msgs else "ok"))
        from heaac_tpu.codec.heaac_graph import HeaacState
        keep = lambda new, old: new if on > 0 else old
        st = HeaacState(saved=saved, x_hist=x_hist, W_prev=W, Y_prev=y_cur,
                        g_temp=g_temp, q_temp=q_temp, v0=v0, v1=v1,
                        ps_in_buf=keep(ps_in_buf, st.ps_in_buf),
                        ps_delay=keep(ps_new["delay"], st.ps_delay),
                        ps_ap=keep(ps_new["ap"], st.ps_ap),
                        ps_trans=keep(ps_new["trans"], st.ps_trans))


if __name__ == "__main__":
    main()
