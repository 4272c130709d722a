"""Dependent channel coupling (points 0/1) through the NATIVE front-end.

The reference decodes every coupling point in one element loop
(aacdec.c:1503-1596) and applies dependent coupling in the spectral
domain around TNS (spectral_to_sample ordering).  The native whole-
stream parser used to bail to the Python planner on any non-point-3 CCE
(~100x/frame cliff); it now parses the per-band gain lists, defers TNS
past the BEFORE_TNS add (hh_parse_cce + hh_apply_dep + the lane_chan
deferral in hh_parse_he_impl), and the touched lanes fall back from
raw-bits/direct tokens to the captured-value token path.
"""
import logging

import numpy as np
import pytest

from heaac_tpu import decode_adts
from heaac_tpu.codec.batch import decode_batch
from heaac_tpu.codec.encoder import AacEncoder
from heaac_tpu.io.heaac_testgen import splice_cce_into_lc


def _lc_core(seed=7, tns=None):
    sr = 24000
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * 1.2)) / sr
    x = 0.3 * np.sin(2 * np.pi * 600 * t) \
        + 0.02 * rng.standard_normal(len(t))
    return AacEncoder(sr, 1, bitrate=32000, window_switching=False,
                      tns_inject=tns).encode(
        np.clip(x * 3000, -32768, 32767).astype(np.int16))


def _he_cce(point, seed=7, tns=None):
    from heaac_tpu.bitstream.aac_syntax import T as TT
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_multi
    cce = splice_cce_into_lc(_lc_core(seed=seed, tns=tns),
                             coupling_point=point)
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=3, invf_modes=(0,))
    return splice_sbr_multi(cce, {(TT.TYPE_SCE, 0): w})


@pytest.mark.parametrize("point", ["before", "between"])
def test_dependent_cce_native(point, caplog):
    """HE + dependent CCE decodes through the native qwire path with
    ZERO Python-planner fallbacks, matching the single-stream decoder
    (itself golden vs the reference C build)."""
    he = _he_cce(point)
    pcm_np, _ = decode_adts(he)
    with caplog.at_level(logging.INFO, logger="heaac_tpu"):
        out = decode_batch([he, he])[0]
    falls = [r for r in caplog.records
             if "single-stream decoder" in r.getMessage()
             or "Python planner" in r.getMessage()]
    assert not falls, f"dependent CCE {point} left the native path: {falls}"
    n = min(len(out), len(pcm_np))
    assert n > 24000
    d = np.abs(out[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"point {point}: max LSB {d.max()}"


def test_dependent_cce_native_with_tns(caplog):
    """BEFORE_TNS coupling + a TNS filter on the target: the native path
    must add the CCE spectrum BEFORE running the deferred TNS filter
    (aacdec.c spectral_to_sample order), exactly like the Python
    decoder."""
    he = _he_cce("before", tns=dict(coefs=[2, 5, 3], coef_res=0))
    pcm_np, _ = decode_adts(he)
    with caplog.at_level(logging.INFO, logger="heaac_tpu"):
        out = decode_batch([he])[0]
    falls = [r for r in caplog.records
             if "single-stream decoder" in r.getMessage()
             or "Python planner" in r.getMessage()]
    assert not falls, f"TNS + dependent CCE left the native path: {falls}"
    n = min(len(out), len(pcm_np))
    d = np.abs(out[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"max LSB {d.max()}"


@pytest.mark.golden
def test_dependent_cce_native_golden(ref_harness, tmp_path):
    """Native dependent-CCE decode vs the reference C decoder."""
    import subprocess
    for point in ("before", "between"):
        he = _he_cce(point, seed=9)
        p = tmp_path / f"dep_{point}.aac"
        p.write_bytes(he)
        g = tmp_path / f"dep_{point}.gold"
        subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                       capture_output=True)
        gold = np.fromfile(g, np.int16).reshape(-1, 2)
        out = decode_batch([he])[0]
        n = min(len(out), len(gold))
        d = np.abs(out[:n].astype(int) - gold[:n].astype(int))
        assert d.max() <= 2, f"point {point}: max LSB {d.max()}"
