"""Quantized wire format (codec/qwire.py): token roundtrip + side expansion."""
import numpy as np
import pytest

from heaac_tpu.codec import qwire
from heaac_tpu.tables.aac_tables import cbrt_tab, pow2sf_tab


def _he_stream(ref_harness, seed=3, ps_seed=2, invf=(0, 1, 2, 3),
               is_cpe=False, coupling=False, **kw):
    from test_golden_sbr import make_core

    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)
    core = make_core(ref_harness, "sbr_core_m24" if not is_cpe
                     else "sbr_core_s24", 24000, 2 if is_cpe else 1,
                     64000 if is_cpe else 32000, 12)
    w = SbrStreamWriter(core_rate=24000, is_cpe=is_cpe, env_hi_shift=-12,
                        seed=seed, invf_modes=invf,
                        ps_writer=None if is_cpe
                        else PsStreamWriter(seed=ps_seed), **kw)
    return splice_sbr_into_lc(core, w)


@pytest.mark.golden
@pytest.mark.parametrize("cfg", ["ps", "cpe"])
def test_qwire_plan_equivalence(ref_harness, cfg):
    """The device-side expansion of the qwire side blocks must reproduce the
    round-1 compact expansion (build_sbr_compact + expand_sbr) bit-for-bit,
    frame by frame, with the carried state threaded."""
    import jax

    from heaac_tpu.codec import compact_plan
    from heaac_tpu.codec.batch import parse_stream_plans, parse_stream_qwire

    he = _he_stream(ref_harness, is_cpe=(cfg == "cpe"),
                    coupling=(cfg == "cpe"))
    core, sbr, ps, rate, nl, is34, ds = parse_stream_plans(he, compact=True)
    frames_q, rate2, nl2, is34_2, ds2 = parse_stream_qwire(he)
    assert (rate, nl, is34, ds) == (rate2, nl2, is34_2, ds2)
    T = len(core["coeffs"])
    assert len(frames_q) == T

    expand_old = jax.jit(compact_plan.expand_sbr)
    # coupled-CPE streams ship raw SBR rows for both channels -> the
    # expansion graph needs the pair=True row-decode blocks
    rp = int(cfg == "cpe")
    expand_new = jax.jit(lambda h, r, c: qwire.expand_frame_jax(
        h, r, c, is34, rp))
    carry = qwire.init_qcarry(nl)
    for t in range(T):
        heap = bytearray()
        recs = []
        for payload, rec in frames_q[t]:
            r = rec.copy()
            r[qwire.R_TOKOFF] = len(heap)
            heap += payload
            recs.append(r)
        heap += b"\0" * (4 - len(heap) % 4 if len(heap) % 4 else 0)
        harr = np.frombuffer(bytes(heap), np.uint8).astype(np.int32)
        meta, plan_new, pc_new, carry = expand_new(
            harr, np.stack(recs), carry)
        sc_t = {k: v[t] for k, v in sbr.items()}
        plan_old = expand_old(sc_t)
        for k in plan_old:
            a = np.asarray(plan_old[k], np.float32)
            b = np.asarray(plan_new[k], np.float32)
            np.testing.assert_array_equal(
                a.view(np.int32), b.astype(np.float32).view(np.int32)
                if b.dtype != np.float32 else b.view(np.int32),
                err_msg=f"frame {t} plan[{k}]")
        np.testing.assert_array_equal(
            np.asarray(pc_new["pc_i"]), ps["pc_i"][t], f"frame {t} pc_i")
        np.testing.assert_array_equal(
            np.asarray(pc_new["pc_b"]), ps["pc_b"][t], f"frame {t} pc_b")
        for k in ("ws", "kbd", "wsp", "kbdp"):
            np.testing.assert_array_equal(
                np.asarray(meta[k]), core[k][t], f"frame {t} {k}")


@pytest.mark.golden
def test_qwire_stream_decode_matches_compact(ref_harness):
    """End-to-end: QStreamBatchDecoder output vs the compact-path batch
    decoder on a PS + inverse-filtering stream (<=1 LSB: same math, two
    separately compiled graphs)."""
    from heaac_tpu.codec.batch import QStreamBatchDecoder, StreamBatchDecoder

    he = _he_stream(ref_harness)
    old = np.asarray(StreamBatchDecoder([he], batch=1).decode())
    new = np.asarray(QStreamBatchDecoder([he]).decode())
    assert old.shape == new.shape
    d = np.abs(old.astype(int) - new.astype(int))
    assert d.max() <= 1, f"qwire-vs-compact max LSB {d.max()}"


def _ref_coeffs(q, sfw, raw, coef):
    """What the tokens must reconstruct: the host decoder's float lane."""
    cbrt = cbrt_tab()
    pow2 = pow2sf_tab()
    out = np.zeros(1024, np.float32)
    for p in range(1024):
        if raw[p]:
            out[p] = coef[p]
        elif q[p]:
            s = np.float32(pow2[sfw[p] & 511])
            if not (sfw[p] >> 15) & 1:
                s = -s
            mag = np.float32(cbrt[abs(int(q[p]))])
            out[p] = np.float32((-mag if q[p] < 0 else mag) * s)
    return out


def _decode(heaps, recs, S=640):
    import jax
    import jax.numpy as jnp
    heap = jnp.asarray(np.frombuffer(heaps, np.uint8).astype(np.int32))
    rec = jnp.asarray(np.stack(recs))
    fn = jax.jit(lambda h, r: qwire.decode_coeffs_jax(
        h, r[:, qwire.R_TOKOFF], r[:, qwire.R_W1] & 0xFFFF, S))
    return np.asarray(fn(heap, rec))


def _lane(q, sfw, raw, coef):
    toks, ext = qwire.emit_coeff_tokens(coef, q, sfw, raw)
    payload, rec = qwire.assemble_lane(toks, ext, b"")
    return payload, rec


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_token_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    B = 8
    heaps = b""
    recs, refs = [], []
    for _ in range(B):
        q = np.zeros(1024, np.int64)
        nz = rng.choice(1024, rng.integers(20, 300), replace=False)
        q[nz] = rng.choice([-1, 1], len(nz)) * (
            rng.integers(1, 8192, len(nz)) ** (rng.random(len(nz)) * 1.2)
        ).astype(np.int64).clip(1, 8191)
        sfw = np.zeros(1024, np.uint16)
        # band-ish sf structure: change every ~32 positions
        si = rng.integers(0, 428, 32)
        sgn = rng.integers(0, 2, 32)
        for b_ in range(32):
            sfw[b_ * 32:(b_ + 1) * 32] = si[b_] | (sgn[b_] << 15)
        raw = np.zeros(1024, bool)
        rawpos = rng.choice(1024, 17, replace=False)
        raw[rawpos] = True
        coef = np.zeros(1024, np.float32)
        coef[rawpos] = rng.standard_normal(17).astype(np.float32) * 1e3
        q[rawpos] = 0
        payload, rec = _lane(q.astype(np.int32), sfw, raw, coef)
        rec[qwire.R_TOKOFF] = len(heaps)
        heaps += payload
        recs.append(rec)
        refs.append(_ref_coeffs(q, sfw, raw, coef))
    got = _decode(heaps, recs)
    ref = np.stack(refs)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got.view(np.int32), ref.view(np.int32))


def test_token_edge_cases():
    # all zero lane, long zero runs, max escape, raw-only lane
    cbrt = cbrt_tab()
    pow2 = pow2sf_tab()
    heaps = b""
    recs, refs = [], []
    # silence
    payload, rec = qwire.silence_lane()
    rec[qwire.R_TOKOFF] = 0
    heaps += payload
    recs.append(rec)
    refs.append(np.zeros(1024, np.float32))
    # single max escape at position 1023, negative sf
    q = np.zeros(1024, np.int32)
    q[1023] = -8191
    sfw = np.full(1024, 427, np.uint16)
    raw = np.zeros(1024, bool)
    coef = np.zeros(1024, np.float32)
    payload, rec = _lane(q, sfw, raw, coef)
    rec[qwire.R_TOKOFF] = len(heaps)
    heaps += payload
    recs.append(rec)
    refs.append(_ref_coeffs(q, sfw, raw, coef))
    # raw-only lane (Python-planner fallback path)
    rng = np.random.default_rng(7)
    coef = rng.standard_normal(1024).astype(np.float32)
    toks, ext = qwire.emit_coeff_tokens(coef)   # q=None -> all raw
    payload, rec = qwire.assemble_lane(toks, ext, b"")
    rec[qwire.R_TOKOFF] = len(heaps)
    heaps += payload
    recs.append(rec)
    refs.append(coef)
    got = _decode(heaps, recs)
    ref = np.stack(refs)
    np.testing.assert_array_equal(got.view(np.int32), ref.view(np.int32))


@pytest.mark.golden
def test_qwire_freq_scale0_many_bands(ref_harness):
    """freq_scale=0/alter_scale=0 at a <=32 kHz core can reach 48
    one-subband high-res bands (aacsbr.c:369 max_qmf_subbands=48) — the
    qwire side blocks and device expansion must cover the full range
    (NB_HI=48, 6-byte add-harmonic mask)."""
    from test_golden_sbr import make_core

    from heaac_tpu.codec.batch import QStreamBatchDecoder, StreamBatchDecoder
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=31, invf_modes=(0,), freq_scale=0,
                        alter_scale=0, start_freq=1, stop_freq=8)
    assert w.sbr.n[1] > 24, f"n1 {w.sbr.n[1]}: config too narrow for test"
    he = splice_sbr_into_lc(core, w)
    old = np.asarray(StreamBatchDecoder([he], batch=1).decode())
    new = np.asarray(QStreamBatchDecoder([he]).decode())
    d = np.abs(old.astype(int) - new.astype(int))
    assert d.max() <= 1, f"qwire-vs-compact max LSB {d.max()}"
    # and through the native emitter (QwirePipelinedDecoder fast path)
    from heaac_tpu.codec.batch import QwirePipelinedDecoder
    nat = np.asarray(QwirePipelinedDecoder([he]).decode()[0])
    d = np.abs(old.astype(int) - nat.astype(int))
    assert d.max() <= 1, f"native-qwire max LSB {d.max()}"


@pytest.mark.golden
def test_qwire_heap_growth(ref_harness):
    """Raw-heavy payloads (or a deliberately tiny staging cap) must grow
    the heap and retry, not crash mid-batch."""
    from heaac_tpu.codec.batch import QwirePipelinedDecoder

    he = _he_stream(ref_harness, seed=4)
    ref = np.asarray(QwirePipelinedDecoder([he, he]).decode()[0])
    dec = QwirePipelinedDecoder([he, he])
    dec._cap = 4096                 # force several growth rounds
    dec._bufsets = [None, None]
    dec._upload_w = None
    got = np.asarray(dec.decode()[0])
    np.testing.assert_array_equal(got, ref)


@pytest.mark.golden
def test_qwire_native_cpe(ref_harness):
    """HE-AACv1 stereo (CPE) through the native qwire pipeline, including
    the per-channel direct token emission (ms_present==0 frames)."""
    from heaac_tpu.codec.batch import QwirePipelinedDecoder, StreamBatchDecoder

    he = _he_stream(ref_harness, seed=7, is_cpe=True, invf=(0,))
    old = np.asarray(StreamBatchDecoder([he], batch=1).decode())
    nat = np.asarray(QwirePipelinedDecoder([he]).decode()[0])
    assert old.shape == nat.shape
    d = np.abs(old.astype(int) - nat.astype(int))
    assert d.max() <= 1, f"native-cpe-qwire max LSB {d.max()}"

    he2 = _he_stream(ref_harness, seed=9, is_cpe=True, coupling=True,
                     invf=(0,))
    old2 = np.asarray(StreamBatchDecoder([he2], batch=1).decode())
    nat2 = np.asarray(QwirePipelinedDecoder([he2]).decode()[0])
    d2 = np.abs(old2.astype(int) - nat2.astype(int))
    assert d2.max() <= 1, f"native-cpe-coupled max LSB {d2.max()}"


@pytest.mark.golden
def test_qwire_length_bucketing(ref_harness):
    """Mixed-length batches: groups are length-bucketed so a short group's
    scan stops at its own longest stream (VERDICT r2 #9), and per-stream
    outputs still land at the right indices through the sort permutation."""
    from test_golden_sbr import make_core

    from heaac_tpu.codec.batch import QwirePipelinedDecoder
    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    core_long = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 40)
    core_short = b"".join(
        __import__("heaac_tpu.bitstream.adts", fromlist=["x"])
        .split_adts_stream(core_long)[:4])

    def he(core, seed):
        w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                            seed=seed, invf_modes=(0,),
                            ps_writer=PsStreamWriter(seed=seed + 1))
        return splice_sbr_into_lc(core, w)

    long_s, short_s = he(core_long, 41), he(core_short, 43)
    streams = [long_s, short_s]     # long first: the sort must reorder
    dec = QwirePipelinedDecoder(streams, group_streams=1)
    assert dec.group_T[0] < dec.group_T[1], dec.group_T
    outs = [np.asarray(o) for o in dec.decode()]
    assert dec.frame_counts == [40, 4]
    refs = [np.asarray(QwirePipelinedDecoder([s]).decode()[0])
            for s in streams]
    for i, s in enumerate(streams):
        g, slot = dec.group_of[i], dec.slot_of[i]
        T_i = dec.frame_counts[i]
        got = outs[g][:T_i, slot:slot + 1]
        np.testing.assert_array_equal(got, refs[i][:T_i])


@pytest.mark.golden
def test_qwire_dataless_sbr_frames_replay(ref_harness):
    """Frames without an SBR FIL replay the previous envelopes (aacsbr.c
    start persistence).  The wire-v5 raw-rows block is NOT idempotent
    (delta regions), so dataless frames ship rbits=0 and the device
    replays its carried decoded rows — this pins that path against the
    single-stream reference decoder."""
    from test_golden_sbr import make_core

    import heaac_tpu
    from heaac_tpu.codec.batch import QStreamBatchDecoder
    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=11, invf_modes=(0,),
                        ps_writer=PsStreamWriter(seed=12))
    he = splice_sbr_into_lc(core, w, skip_frames={3, 4, 9})
    pcm_ref, _ = heaac_tpu.decode_adts(he)
    got = np.asarray(QStreamBatchDecoder([he]).decode())[0]
    n = min(len(pcm_ref), got.shape[0])
    d = np.abs(got[:n].astype(int) - np.asarray(pcm_ref)[:n].astype(int))
    assert d.max() <= 1, f"dataless replay max LSB {d.max()}"
