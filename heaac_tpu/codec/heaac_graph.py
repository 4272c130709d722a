"""The fused per-frame HE-AAC v2 device graph (flagship pipeline).

One jit compiles the complete mono->stereo HE-AACv2 frame for B stream
lanes: core IMDCT/overlap-add -> QMF analysis -> SBR HF reconstruction ->
parametric stereo -> QMF synthesis -> float PCM.  All frame-dependent
structure arrives as dense tensors (codec/frame_plan.py); decode state is a
pytree of [B, ...] arrays threaded through the step (donated on TPU).

Start-flag gating falls out of the plan contents: a lane with SBR off has
zero masks everywhere, reducing the graph to pure upsampling, exactly like
the reference's sbr->start=0 path (aacsbr.c:1723-1745).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ps_jax, sbr_jax
from ..ops.qmf_jax import qmf_analysis, qmf_synthesis, qmf_synthesis_ds
from .core import _consts as core_consts
from .core import core_frame


class HeaacState(NamedTuple):
    saved: jax.Array        # [B,512]   core overlap
    x_hist: jax.Array       # [B,288]   QMF analysis history
    W_prev: jax.Array       # [B,32,32,2]
    Y_prev: jax.Array       # [B,38,64,2]
    g_temp: jax.Array       # [B,42,48]
    q_temp: jax.Array       # [B,42,48]
    v0: jax.Array           # [B,9,128] synthesis FIFO L
    v1: jax.Array           # [B,9,128] synthesis FIFO R
    ps_in_buf: jax.Array    # [B,5,6,2]
    ps_delay: jax.Array     # [B,91,14,2]
    ps_ap: jax.Array        # [B,50,3,5,2] (20-band uses rows :30)
    ps_trans: jax.Array     # [B,34,3]


def init_state(B: int) -> HeaacState:
    z = lambda *s: jnp.zeros((B,) + s, jnp.float32)
    return HeaacState(
        saved=z(512), x_hist=z(288), W_prev=z(32, 32, 2),
        Y_prev=z(38, 64, 2), g_temp=z(42, 48), q_temp=z(42, 48),
        v0=z(9, 128), v1=z(9, 128), ps_in_buf=z(5, 6, 2),
        ps_delay=z(91, 14, 2), ps_ap=z(50, 3, 5, 2), ps_trans=z(34, 3),
    )


def _ps_stage(X, state: HeaacState, ps_plan, is34: int):
    """The parametric-stereo block for one static band mode:
    X [B,2,38,64] -> (Lp, Rp, new in_buf, new decorrelation state)."""
    lbuf, ps_in_buf = ps_jax.hybrid_analysis(X, state.ps_in_buf, is34)
    ps_state = dict(delay=state.ps_delay, ap=state.ps_ap,
                    trans=state.ps_trans)
    lmix, rmix, ps_state_new = ps_jax.decorrelate_and_mix(
        lbuf, ps_state, ps_plan, is34)
    Lp = ps_jax.hybrid_synthesis(lmix, is34)
    Rp = ps_jax.hybrid_synthesis(rmix, is34)
    return Lp, Rp, ps_in_buf, ps_state_new


def heaac_frame(core, plan, ps_plan, state: HeaacState, is34: int = 0,
                downsampled: int = 0):
    """One frame for B mono HE-AACv2 lanes -> (pcm [B,2,2048], state);
    pcm is [B,2,1024] in downsampled mode.

    is34 selects the PS hybrid band mode and downsampled the 32-band
    synthesis (aacsbr.c:1719); both are static: one jit specialization
    per mode combination.  is34 == 2 means dual-mode: the PS stage runs
    both band modes and selects per lane by ps_plan["m34"] (the
    band-mode-flip decode path)."""
    m2048, m256, bank = core_consts()
    # named scopes surface as spans in jax.profiler/xprof timelines
    # (utils/trace.py; the reference's START_TIMER analogue)
    with jax.named_scope("core_imdct_ola"):
        time_out, saved = core_frame(core["coeffs"], state.saved, core["ws"],
                                     core["wsp"], core["kbd"], core["kbdp"],
                                     m2048, m256, bank)

    with jax.named_scope("qmf_analysis"):
        W, x_hist = qmf_analysis(time_out, state.x_hist)
    with jax.named_scope("sbr_hf"):
        X_low = sbr_jax.lf_gen(state.W_prev, W, plan["xlow_new"],
                               plan["xlow_old"])
        alpha0, alpha1 = sbr_jax.hf_inverse_filter(X_low)
        X_high = sbr_jax.hf_gen(X_low, alpha0, alpha1, plan["src_of_m"],
                                plan["bw_of_m"], plan["hf_mask"],
                                plan["gen_slot_mask"])
        e_curr = sbr_jax.env_estimate(X_high, plan["env_onehot"],
                                      plan["recip"], plan["grp_mean"],
                                      plan["freqres_sel"])
        gain, q_m, s_m = sbr_jax.gain_calc(e_curr, plan)
        Y_m, env_on, g_temp, q_temp = sbr_jax.hf_assemble(
            X_high, gain, q_m, s_m, state.g_temp, state.q_temp, plan)
        X, y_cur = sbr_jax.x_gen(X_low, Y_m, state.Y_prev, env_on, plan)

    with jax.named_scope("parametric_stereo"):
        if is34 == 2:
            # dual-mode (flip-capable) graph: run the PS stage in both
            # band modes and select per lane by ps_plan["m34"] — the
            # structural band layouts are compile-time, so a per-frame
            # mode needs both variants live (the flip bucket only)
            m34 = ps_plan["m34"]
            r0 = _ps_stage(X, state, ps_plan, 0)
            r1 = _ps_stage(X, state, ps_plan, 1)
            sel = lambda a1, a0: jnp.where(
                (m34 > 0).reshape((-1,) + (1,) * (a1.ndim - 1)), a1, a0)
            Lp, Rp, ps_in_buf, ps_state_new = jax.tree_util.tree_map(
                sel, r1, r0)
        else:
            Lp, Rp, ps_in_buf, ps_state_new = _ps_stage(
                X, state, ps_plan, is34)
    on = ps_plan["ps_on"][:, None, None, None]
    Lx = jnp.where(on > 0, Lp, X)
    Rx = jnp.where(on > 0, Rp, X)
    # PS state freezes when inactive (reference never calls ff_ps_apply)
    keep = lambda new, old: jnp.where(
        ps_plan["ps_on"].reshape((-1,) + (1,) * (new.ndim - 1)) > 0, new, old)
    ps_in_buf = keep(ps_in_buf, state.ps_in_buf)
    ps_delay = keep(ps_state_new["delay"], state.ps_delay)
    ps_ap = keep(ps_state_new["ap"], state.ps_ap)
    ps_trans = keep(ps_state_new["trans"], state.ps_trans)

    with jax.named_scope("qmf_synthesis"):
        synth = qmf_synthesis_ds if downsampled else qmf_synthesis
        pcm0, v0 = synth(Lx, state.v0)
        pcm1, v1 = synth(Rx, state.v1)
        pcm = jnp.stack([pcm0, pcm1], axis=1)

    new_state = HeaacState(
        saved=saved, x_hist=x_hist, W_prev=W, Y_prev=y_cur, g_temp=g_temp,
        q_temp=q_temp, v0=v0, v1=v1, ps_in_buf=ps_in_buf, ps_delay=ps_delay,
        ps_ap=ps_ap, ps_trans=ps_trans)
    return pcm, new_state


@functools.cache
def jitted_heaac_frame():
    # is34/downsampled are static: each mode compiles its own variant
    return jax.jit(heaac_frame, donate_argnums=(3,), static_argnums=(4, 5))


# ---------------------------------------------------------------------------
# Compact-plan variant: expand the ~3 KB/frame-lane wire records into the
# dense plan tensors on device (codec/compact_plan.py), with the reference's
# persistent PS H / phase-smoothing state carried as device arrays.
# ---------------------------------------------------------------------------
def init_compact_state(B: int):
    from . import compact_plan
    return (init_state(B), compact_plan.init_ps_hist(B))


def heaac_frame_compact(core, sc, pc, carry, is34: int = 0,
                        downsampled: int = 0):
    """One frame for B lanes from compact wire plans -> (pcm, new carry).

    carry = (HeaacState, ps_hist dict); see init_compact_state."""
    from . import compact_plan
    state, ph = carry
    with jax.named_scope("expand_plans"):
        plan = compact_plan.expand_sbr(sc)
        ps_plan, ph_new = compact_plan.expand_ps(pc, ph, is34)
    pcm, new_state = heaac_frame(core, plan, ps_plan, state, is34,
                                 downsampled)
    return pcm, (new_state, ph_new)


@functools.cache
def jitted_heaac_frame_compact():
    return jax.jit(heaac_frame_compact, donate_argnums=(3,),
                   static_argnums=(4, 5))


# ---------------------------------------------------------------------------
# Quantized-wire variant (codec/qwire.py): ~0.3-0.5 KB/frame-lane on the
# wire; token decode, dequant LUTs, sbr_dequant/mapping/chirp all on device.
# ---------------------------------------------------------------------------
def init_qwire_carry(B: int):
    from . import compact_plan, qwire
    return (init_state(B), compact_plan.init_ps_hist(B),
            qwire.init_qcarry(B))


def heaac_frame_qwire(coeffs, rec, heap, carry, is34: int = 0,
                      downsampled: int = 0, rows_pair: int = 0):
    """One frame for B lanes from the quantized wire format: rec [B,8] i32
    records + shared heap (byte values as i32); coeffs already token-decoded
    [B,1024].  carry = (HeaacState, ps_hist, qwire carry)."""
    from . import compact_plan, qwire
    state, ph, qc = carry
    with jax.named_scope("expand_qwire"):
        core_meta, plan, pc, qc2 = qwire.expand_frame_jax(
            heap, rec, qc, is34, rows_pair)
        ps_plan, ph2 = compact_plan.expand_ps(pc, ph, is34)
    core = dict(coeffs=coeffs, **core_meta)
    pcm, state2 = heaac_frame(core, plan, ps_plan, state, is34, downsampled)
    return pcm, (state2, ph2, qc2)


def _qwire_decode_all_coeffs(heap_w, rec_w, S: int, rate_idx: int, NB: int,
                             MS: int = 0, NS: int = 52, SEC: int = 31):
    """Shared scan prologue: byte-heap view + parallel token decode of
    every frame-lane's spectrum -> (heap, rec_seq [T,L,REC_W],
    coeffs [T,L,1024]).

    With MS != 0, spec-mode CPE pairs flagged W3_MS_LEFT/RIGHT get the
    M/S butterfly applied across adjacent lanes (aacdec.c:1390-1411):
    raw-bits lanes ship PRE-M/S spectra, and the pair's lanes sit at flat
    rows r (left) and r+T (right) under the lane-major flattening."""
    from . import qwire
    heap = jax.lax.bitcast_convert_type(heap_w, jnp.uint8)\
        .reshape(-1).astype(jnp.int32)
    rec_seq = jax.lax.bitcast_convert_type(rec_w, jnp.int32)
    T, L = rec_seq.shape[:2]
    # lane-major flattening: under a dp-sharded lane axis the merge
    # stays shard-local (a T-major merge would interleave shards and
    # force an all-to-all)
    flat = rec_seq.transpose(1, 0, 2).reshape(L * T, qwire.REC_W)
    with jax.named_scope("token_decode"):
        coeffs = qwire.decode_coeffs_jax(
            heap, flat[:, qwire.R_TOKOFF],
            flat[:, qwire.R_W1] & 0xFFFF, S)
        if NB > 0:
            from ..ops import spec_huff
            mode1 = ((flat[:, qwire.R_W2] >> 24) & 15) == 1
            w3 = flat[:, qwire.R_W3] * mode1
            dec = spec_huff.decode_spec_jax(
                heap, flat[:, qwire.R_TOKOFF], w3, rate_idx, NB,
                with_ms=bool(MS), NS=NS, SEC=SEC)
            spec = dec[0] if MS else dec
            coeffs = jnp.where(mode1[:, None], spec, coeffs)
            if MS:
                msk = dec[1]
                left = ((w3 >> 28) & 1)[:, None]
                right = ((w3 >> 29) & 1)[:, None]
                z = jnp.zeros((T, 1024), coeffs.dtype)
                zi = jnp.zeros((T, 1024), msk.dtype)
                # concat-of-slices, not slice-of-concat (known XLA/axon
                # fusion miscompile — see CLAUDE.md / ops/ps_jax.py)
                dn = jnp.concatenate([coeffs[T:], z], 0)    # row + T
                up = jnp.concatenate([z, coeffs[:-T]], 0)   # row - T
                m_l = msk * left
                m_r = jnp.concatenate([zi, msk[:-T]], 0) * right
                coeffs = jnp.where(
                    m_l > 0, coeffs + dn,
                    jnp.where(m_r > 0, up - coeffs, coeffs))
        coeffs = coeffs.reshape(L, T, 1024).transpose(1, 0, 2)
    return heap, rec_seq, coeffs


@functools.cache
def qwire_scan_decoder(is34: int, downsampled: int, S: int,
                       rate_idx: int = -1, NB: int = 0, MS: int = 0,
                       NS: int = 52, SEC: int = 31, rows_pair: int = 0):
    """jit of: token-decode all frames' coeffs in one parallel pass, then
    scan the fused frame graph over T frames.  heap_w is the f32-viewed
    packed byte heap; rec_seq [T, L, REC_W] i32 bit patterns as f32.

    With NB > 0, mode-1 (raw-bits) lanes additionally run the parallel
    spectral-Huffman decode (ops/spec_huff.py) over NB-bit windows with
    the swb tables of ``rate_idx``; token and spec results merge per
    lane."""

    def run(heap_w, rec_w, carry):
        heap, rec_seq, coeffs = _qwire_decode_all_coeffs(
            heap_w, rec_w, S, rate_idx, NB, MS, NS, SEC)

        def body(c, xs):
            rec_t, coef_t = xs
            pcm, c2 = heaac_frame_qwire(coef_t, rec_t, heap, c, is34,
                                        downsampled, rows_pair)
            pcm16 = jnp.clip(jnp.rint(pcm), -32768, 32767).astype(jnp.int16)
            return c2, pcm16

        carry, pcm = jax.lax.scan(body, carry, (rec_seq, coeffs))
        return carry, pcm

    return jax.jit(run, donate_argnums=(2,))


@functools.cache
def qwire_scan_decoder_couple(is34: int, downsampled: int, S: int,
                              rate_idx: int = -1, NB: int = 0, MS: int = 0,
                              NS: int = 52, SEC: int = 31,
                              rows_pair: int = 0):
    """qwire_scan_decoder with AFTER_IMDCT channel coupling: the scan
    keeps float output, then the coupling mix adds gain * src-lane time
    signal into each target (lane, stereo-sub) pair at the OUTPUT rate —
    the reference applies apply_independent_coupling after ff_sbr_apply
    on both the CCE (pure-upsampled) and target channels
    (aacdec.c:1849-1862, 1919-1929) — and only then rounds to int16.

    etgt/etch/esrc are [K] i32 edge arrays over the batch's lanes
    ([K] target lane, target sub-channel 0|1, source CCE lane); gains is
    [T, K] f32 (per-frame cc gains, 0 when the CCE is absent)."""

    def run(heap_w, rec_w, carry, etgt, etch, esrc, gains):
        heap, rec_seq, coeffs = _qwire_decode_all_coeffs(
            heap_w, rec_w, S, rate_idx, NB, MS, NS, SEC)

        def body(c, xs):
            rec_t, coef_t = xs
            pcm, c2 = heaac_frame_qwire(coef_t, rec_t, heap, c, is34,
                                        downsampled, rows_pair)
            return c2, pcm

        carry, pcm = jax.lax.scan(body, carry, (rec_seq, coeffs))
        add = gains[:, :, None] * pcm[:, esrc, 0]       # [T, K, N]
        pcm = pcm.at[:, etgt, etch].add(add)
        return carry, jnp.clip(jnp.rint(pcm), -32768, 32767)\
            .astype(jnp.int16)

    return jax.jit(run, donate_argnums=(2,))


def _convert_ps_flip(state: HeaacState, ph: dict, to34, to20):
    """Per-lane PS band-mode transition fixup, the reference's
    aacps.c:829-860 (H row-0 map_val + ipd/opd history reset) plus the
    decorrelation-state zeroing its is34bands != is34bands_old check
    performs (aacps.c:660-671).  to34/to20 are [B] bool masks; the
    hybrid-analysis in_buf persists across flips exactly like the
    reference's ps->in_buf."""
    row0 = ph["H"][:, :, 0]                                 # [B,2,34,4]
    bc = lambda m, a: m.reshape((-1,) + (1,) * (a.ndim - 1))
    row0 = jnp.where(bc(to34, row0), ps_jax.map_val_20_to_34(row0),
                     jnp.where(bc(to20, row0),
                               ps_jax.map_val_34_to_20(row0), row0))
    flip = to34 | to20
    ph2 = dict(
        H=ph["H"].at[:, :, 0].set(row0),
        ipd_hist=jnp.where(flip[:, None], 0, ph["ipd_hist"]),
        opd_hist=jnp.where(flip[:, None], 0, ph["opd_hist"]))
    zf = lambda a: jnp.where(bc(flip, a), 0.0, a)
    state2 = state._replace(ps_delay=zf(state.ps_delay),
                            ps_ap=zf(state.ps_ap),
                            ps_trans=zf(state.ps_trans))
    return state2, ph2


def _flip_scan(heap_w, rec_w, carry, downsampled, S, rate_idx, NB, NS,
               SEC, to_int16: bool, rows_pair: int = 0):
    """Shared flip-capable scan: the PS band mode is per lane per FRAME
    (side bit 6, qwire.build_side), so one compiled graph decodes streams
    whose 20<->34 mode flips mid-stream — the PS stage runs both band
    modes and selects per lane (heaac_frame is34==2), and the carried PS
    state is converted at each lane's flip boundary exactly as the
    reference does on its is34bands != is34bands_old frames
    (aacps.c:829-860).  carry holds a trailing m34_prev [B] element.
    ``to_int16`` rounds inside the scan (memory-friendly default); the
    couple variant keeps float output for its post-scan mix."""
    from . import compact_plan as CP
    from . import qwire

    heap, rec_seq, coeffs = _qwire_decode_all_coeffs(
        heap_w, rec_w, S, rate_idx, NB, 0, NS, SEC)

    def body(c, xs):
        state, ph, qc, m34_prev = c
        rec_t, coef_t = xs
        with jax.named_scope("expand_qwire"):
            core_meta, plan, pc, qc2 = qwire.expand_frame_jax(
                heap, rec_t, qc, -1, rows_pair)
            m34 = pc.pop("m34")
            active = pc["pc_i"][:, CP.PI_ON] > 0
            to34 = active & (m34 > 0) & (m34_prev == 0)
            to20 = active & (m34 == 0) & (m34_prev > 0)
            state2, ph2 = _convert_ps_flip(state, ph, to34, to20)
            ps0, ph0 = CP.expand_ps(pc, ph2, 0)
            ps1, ph1 = CP.expand_ps(pc, ph2, 1)
            sel = lambda a1, a0: jnp.where(
                (m34 > 0).reshape((-1,) + (1,) * (a1.ndim - 1)), a1, a0)
            ps_plan = jax.tree_util.tree_map(sel, ps1, ps0)
            ph3 = jax.tree_util.tree_map(sel, ph1, ph0)
            ps_plan["m34"] = m34
        core = dict(coeffs=coef_t, **core_meta)
        pcm, state3 = heaac_frame(core, plan, ps_plan, state2, 2,
                                  downsampled)
        if to_int16:
            pcm = jnp.clip(jnp.rint(pcm), -32768, 32767).astype(jnp.int16)
        m34_next = jnp.where(active, m34, m34_prev)
        return (state3, ph3, qc2, m34_next), pcm

    return jax.lax.scan(body, carry, (rec_seq, coeffs))


@functools.cache
def qwire_scan_decoder_flip(downsampled: int, S: int, rate_idx: int = -1,
                            NB: int = 0, NS: int = 52, SEC: int = 31,
                            rows_pair: int = 0):
    """Flip-capable variant of qwire_scan_decoder (see _flip_scan)."""

    def run(heap_w, rec_w, carry):
        return _flip_scan(heap_w, rec_w, carry, downsampled, S, rate_idx,
                          NB, NS, SEC, to_int16=True, rows_pair=rows_pair)

    return jax.jit(run, donate_argnums=(2,))


@functools.cache
def qwire_scan_decoder_flip_couple(downsampled: int, S: int,
                                   rate_idx: int = -1, NB: int = 0,
                                   NS: int = 52, SEC: int = 31,
                                   rows_pair: int = 0):
    """Flip-capable scan + AFTER_IMDCT channel coupling: combines
    qwire_scan_decoder_flip's per-frame PS band-mode handling with
    qwire_scan_decoder_couple's output-rate post-scan mix
    (aacdec.c:1919-1929), so a stream that both flips its PS band mode
    mid-stream AND carries a point-3 CCE still decodes on device."""

    def run(heap_w, rec_w, carry, etgt, etch, esrc, gains):
        carry, pcm = _flip_scan(heap_w, rec_w, carry, downsampled, S,
                                rate_idx, NB, NS, SEC, to_int16=False,
                                rows_pair=rows_pair)
        add = gains[:, :, None] * pcm[:, esrc, 0]       # [T, K, N]
        pcm = pcm.at[:, etgt, etch].add(add)
        return carry, jnp.clip(jnp.rint(pcm), -32768, 32767)\
            .astype(jnp.int16)

    return jax.jit(run, donate_argnums=(2,))


def init_qwire_flip_carry(B: int):
    """init_qwire_carry + the m34_prev [B] band-mode memory (starts 0,
    like the reference's zero-initialised ps->is34bands_old)."""
    return init_qwire_carry(B) + (jnp.zeros((B,), jnp.int32),)
