"""Native HE host engine (he_host.inc) vs the Python planner.

The C++ whole-stream front-end must reproduce every plan tensor BIT-EXACTLY
(same dequant/mapping/chirp float ordering), so the device graph output is
identical whichever host path ran.
"""
import numpy as np
import pytest

from heaac_tpu import native
from heaac_tpu.bitstream.adts import parse_adts_header, split_adts_stream
from heaac_tpu.bitstream.reader import BitReader

from test_golden_sbr import make_core


def _assert_exact(he):
    from heaac_tpu.codec import batch

    hdr = parse_adts_header(BitReader(he[:7]))
    T = len(split_adts_stream(he))
    # force the Python planner for the reference side
    dec = batch.PlanningDecoder(adts_probe=he[:7])
    for f in split_adts_stream(he):
        dec.decode_frame(f)
    core_p = {k: np.stack([np.stack([np.asarray(lane[k]) for lane in fc])
                           for fc in dec.frames_core])
              for k in dec.frames_core[0][0]}
    from heaac_tpu.codec import frame_plan
    sbr_p = {k: np.stack([np.stack([np.asarray(getattr(lane, k))
                                    for lane in fs]) for fs in dec.frames_sbr])
             for k in frame_plan.SbrChannelPlan.__dataclass_fields__}
    ps_p = {k: np.stack([np.stack([np.asarray(lane[k]) for lane in fp])
                         for fp in dec.frames_ps])
            for k in dec.frames_ps[0][0]}

    r = native.parse_he_stream(he, hdr.sampling_index, hdr.sample_rate,
                               hdr.chan_config, T)
    assert r is not None, "native HE engine fell back unexpectedly"
    core_n, sbr_n, ps_n, info = r
    for d_p, d_n, what in ((core_p, core_n, "core"), (sbr_p, sbr_n, "sbr"),
                           (ps_p, ps_n, "ps")):
        for k in d_p:
            a = np.asarray(d_p[k], np.float64)
            b = np.asarray(d_n[k], np.float64)
            assert a.shape == b.shape, (what, k, a.shape, b.shape)
            assert np.array_equal(a, b), (
                f"{what}.{k} differs at "
                f"{np.argwhere(a != b)[:3].tolist()}")


@pytest.mark.golden
@pytest.mark.parametrize("cfg", [
    dict(seed=3, invf_modes=(0, 1, 2, 3)),                 # all grid classes
    dict(seed=5, amp_res=0, invf_modes=(0,)),              # 1.5 dB envelopes
    dict(seed=13, interpol_freq=0, invf_modes=(0,)),       # band-grouped est
    dict(seed=15, smoothing_mode=0, invf_modes=(0,)),      # gain smoothing
])
def test_native_he_sbr_exact(cfg, ref_harness):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, **cfg))
    _assert_exact(he)


@pytest.mark.golden
@pytest.mark.parametrize("pskw", [
    dict(seed=2),                                          # 20-band baseline
    dict(seed=4, iid_mode=2, icc_mode=2),                  # 34-band
    dict(seed=6, iid_mode=1, icc_mode=4, enable_ipdopd=True),
    dict(seed=14, iid_mode=0, icc_mode=0),                 # 10-band native
])
def test_native_he_ps_exact(pskw, ref_harness):
    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=3,
        invf_modes=(0,), ps_writer=PsStreamWriter(**pskw)))
    _assert_exact(he)


@pytest.mark.golden
def test_native_he_cpe_coupled_exact(ref_harness):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc

    core = make_core(ref_harness, "sbr_core_s24", 24000, 2, 64000, 12)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=True, env_hi_shift=-12, seed=11,
        coupling=True, invf_modes=(0, 1)))
    _assert_exact(he)


def _assert_compact_exact(he):
    """Native compact emission == Python compact planner, bit for bit."""
    from heaac_tpu.codec import batch

    hdr = parse_adts_header(BitReader(he[:7]))
    T = len(split_adts_stream(he))
    r = native.parse_he_stream_compact(he, hdr.sampling_index,
                                       hdr.sample_rate, hdr.chan_config, T)
    assert r is not None, "native compact engine fell back unexpectedly"
    core_n, sbr_n, ps_n, info = r
    saved = native.parse_he_stream_compact
    try:
        native.parse_he_stream_compact = lambda *a, **k: None
        core_p, sbr_p, ps_p, _, _, _, _ = batch.parse_stream_plans(
            he, compact=True)
    finally:
        native.parse_he_stream_compact = saved
    for d_p, d_n, what in ((core_p, core_n, "core"), (sbr_p, sbr_n, "sbr"),
                           (ps_p, ps_n, "ps")):
        for k in d_p:
            a = np.asarray(d_p[k])
            b = np.asarray(d_n[k])
            assert a.shape == b.shape, (what, k, a.shape, b.shape)
            assert np.array_equal(a, b), (
                f"{what}.{k} differs at {np.argwhere(a != b)[:3].tolist()}")


@pytest.mark.golden
@pytest.mark.parametrize("cfg", [
    dict(seed=3, invf_modes=(0, 1, 2, 3)),
    dict(seed=13, interpol_freq=0, invf_modes=(0,)),
    dict(seed=15, smoothing_mode=0, invf_modes=(0,)),
])
def test_native_he_compact_exact(cfg, ref_harness):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, **cfg))
    _assert_compact_exact(he)


@pytest.mark.golden
@pytest.mark.parametrize("pskw", [
    dict(seed=2),
    dict(seed=4, iid_mode=2, icc_mode=2),
    dict(seed=6, iid_mode=1, icc_mode=4, enable_ipdopd=True),
    dict(seed=14, iid_mode=0, icc_mode=0),                 # 10-band native
])
def test_native_he_compact_ps_exact(pskw, ref_harness):
    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=3,
        invf_modes=(0,), ps_writer=PsStreamWriter(**pskw)))
    _assert_compact_exact(he)


@pytest.mark.golden
def test_native_he_compact_cpe_exact(ref_harness):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc

    core = make_core(ref_harness, "sbr_core_s24", 24000, 2, 64000, 12)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=True, env_hi_shift=-12, seed=11,
        coupling=True, invf_modes=(0, 1)))
    _assert_compact_exact(he)


def test_native_he_parses_main_and_rejects_ssr():
    """AAC-Main parses natively (per-lane predictor state in C++,
    tests/test_main_native.py has the goldens); SSR (ADTS profile 2,
    object 3) still returns None -> Python path, like the reference
    errors on it (aacdec.c:1373)."""
    from heaac_tpu.codec.encoder import AacEncoder

    sr = 44100
    t = np.arange(sr // 2) / sr
    pcm = np.clip(0.4 * np.sin(2 * np.pi * 440 * t) * 16000,
                  -32768, 32767).astype(np.int16)[:, None]
    adts = AacEncoder(sr, 1, object_type=1).encode(pcm)
    hdr = parse_adts_header(BitReader(adts[:7]))
    n_frames = len(split_adts_stream(adts))
    r = native.parse_he_stream(adts, hdr.sampling_index, hdr.sample_rate,
                               hdr.chan_config, n_frames)
    assert r is not None, "Main no longer parses natively"

    # rewrite the ADTS profile field to SSR (2): must fall back
    ssr = bytearray(adts)
    off = 0
    while off + 7 <= len(ssr):
        flen = ((ssr[off + 3] & 3) << 11) | (ssr[off + 4] << 3) \
            | (ssr[off + 5] >> 5)
        ssr[off + 2] = (ssr[off + 2] & 0x3F) | (2 << 6)
        off += max(flen, 7)
    r = native.parse_he_stream(bytes(ssr), hdr.sampling_index,
                               hdr.sample_rate, hdr.chan_config, n_frames)
    assert r is None
