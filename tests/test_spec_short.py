"""Wire-v4 spec-mode for EIGHT_SHORT frames + intensity-stereo streams.

Short frames ship a grouping byte and (group, sfb)-ordered sections
(W3_SHORT); the device de-interleaves the coded order back to the
[8, 128] window layout (the reference's group-interleaved spectral
write, aacdec.c:988-1216).  Intensity streams exercise the CPE capture
decision matrix's "ch1 reads ch0's values" path (aacdec.c:1420-1451):
ch1 falls to tokens (band-type gate) while ch0 stays raw-bits, with the
native parser re-decoding ch0's spectrum for the host intensity fill.

Intensity streams come from OUR encoder (intensity=True; the reference
encoder writes neither intensity nor M/S) and are golden-tested against
the reference C decoder in test_cpe_ms_golden-style fashion here.
"""
import numpy as np
import pytest

from heaac_tpu import decode_adts
from heaac_tpu.codec import qwire
from heaac_tpu.codec.batch import (QStreamBatchDecoder,
                                   QwirePipelinedDecoder,
                                   parse_stream_qwire)
from heaac_tpu.codec.encoder import AacEncoder


def _transient_pcm(seconds=1.5, sr=24000, seed=11):
    """Dense click train (~1 attack per frame) so most frames come out
    EIGHT_SHORT — the window decision needs a quiet-to-loud edge."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = 0.05 * np.sin(2 * np.pi * 700 * t) \
        + 0.005 * rng.standard_normal(len(t))
    for p in range(512, len(x) - 96, 2048):
        x[p:p + 96] += np.hanning(96) * 3.0
    return np.clip(x * 3000, -32768, 32767).astype(np.int16)


def _intensity_pcm(seconds=1.5, sr=24000, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    lo1 = 0.3 * np.sin(2 * np.pi * 400 * t)
    lo2 = 0.3 * np.sin(2 * np.pi * 520 * t)
    hi = 0.2 * np.sin(2 * np.pi * 5200 * t) \
        + 0.05 * np.sin(2 * np.pi * 7800 * t)
    pcm = np.stack([lo1 + hi, lo2 + 0.6 * hi], 1) * 4000
    return np.clip(pcm, -32768, 32767).astype(np.int16)


def _he_mono(core):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_into_lc
    return splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=7,
        invf_modes=(0,)))


def _he_cpe(core):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_into_lc
    return splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=True, env_hi_shift=-12, seed=7,
        invf_modes=(0,)))


def test_short_window_spec_lanes():
    """EIGHT_SHORT frames ship raw bits (W3_SHORT) and decode on device."""
    core = AacEncoder(24000, 1, bitrate=48000,
                      window_switching=True).encode(_transient_pcm())
    he = _he_mono(core)
    frames_q, _, _, _, _ = parse_stream_qwire(he)
    modes = np.array([(int(r[qwire.R_W2]) >> 24) & 15
                      for f in frames_q for _, r in f])
    w3s = np.array([int(r[qwire.R_W3]) for f in frames_q for _, r in f])
    nshort = int((((w3s >> 30) & 1) * (modes == 1)).sum())
    assert nshort > 0, "no short-window spec lanes emitted"
    dec = QStreamBatchDecoder([he])
    assert dec.NS == 128
    pcm_np, _ = decode_adts(he)
    new = np.asarray(dec.decode())
    a = new[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(a), len(pcm_np))
    d = np.abs(a[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"max LSB {d.max()}"


def test_short_window_spec_native():
    """The native emitter's grouped capture matches the Python planner."""
    core = AacEncoder(24000, 1, bitrate=48000,
                      window_switching=True).encode(_transient_pcm(seed=13))
    he = _he_mono(core)
    pcm_np, _ = decode_adts(he)
    dec = QwirePipelinedDecoder([he] * 4, group_streams=4)
    pcm = np.asarray(dec.decode()[0])
    a = np.stack([pcm[:, 0, 0].reshape(-1), pcm[:, 0, 1].reshape(-1)], -1)
    n = min(len(a), len(pcm_np))
    d = np.abs(a[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"max LSB {d.max()}"
    assert dec.NS == 128


def _close(a, b, who):
    """<=2 LSB except a rare-sample allowance: strongly tonal intensity
    content drives the SBR gain limiter across its thresholds at a
    handful of samples (the same near-threshold class the invf goldens
    RMS-gate, tests/test_golden_sbr.py:142)."""
    n = min(len(a), len(b))
    d = np.abs(a[:n].astype(int) - b[:n].astype(int))
    frac = float((d > 2).mean())
    assert d.max() <= 32 and frac < 5e-3, \
        f"{who}: max {d.max()} LSB, {frac:.4%} samples > 2 LSB"


def test_intensity_batched_paths():
    """Intensity CPE: ch0 raw-bits + ch1 tokens through both emitters."""
    for ms in (False, True):
        core = AacEncoder(24000, 2, bitrate=48000, ms=ms, intensity=True,
                          window_switching=False).encode(_intensity_pcm())
        he = _he_cpe(core)
        pcm_np, _ = decode_adts(he)
        new = np.asarray(QStreamBatchDecoder([he]).decode())
        st = np.stack([new[:, 0, 0].reshape(-1),
                       new[:, 1, 0].reshape(-1)], -1)
        _close(st, pcm_np, f"planner ms={ms}")
        dec = QwirePipelinedDecoder([he] * 4, group_streams=4)
        pcm = np.asarray(dec.decode()[0])
        st = np.stack([pcm[:, 0, 0].reshape(-1),
                       pcm[:, 1, 0].reshape(-1)], -1)
        _close(st, pcm_np, f"native ms={ms}")


@pytest.mark.golden
def test_intensity_golden(ref_harness, tmp_path):
    """Encoder intensity syntax vs the reference C decoder, and the full
    HE-AACv1 intensity stream through the batched device path."""
    import subprocess
    for ms in (False, True):
        core = AacEncoder(24000, 2, bitrate=48000, ms=ms, intensity=True,
                          window_switching=False).encode(_intensity_pcm())
        p = tmp_path / f"is{ms}.aac"
        p.write_bytes(core)
        g = tmp_path / f"is{ms}.gold"
        subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                       capture_output=True)
        gold = np.fromfile(g, np.int16).reshape(-1, 2)
        ours, _ = decode_adts(core)
        n = min(len(gold), len(ours))
        d = np.abs(ours[:n].astype(int) - gold[:n].astype(int))
        assert d.max() <= 2, f"ms={ms}: {d.max()}"


@pytest.mark.golden
def test_short_window_spec_golden(ref_harness, tmp_path):
    """Window-switched (trellis-sectioned) stream vs the reference C
    decoder, then the batched device path vs the same gold."""
    import subprocess
    core = AacEncoder(24000, 1, bitrate=48000,
                      window_switching=True).encode(_transient_pcm())
    p = tmp_path / "sw.aac"
    p.write_bytes(core)
    g = tmp_path / "sw.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16)
    ours, _ = decode_adts(core)
    ours = ours.reshape(-1)
    n = min(len(gold), len(ours))
    assert np.abs(ours[:n].astype(int) - gold[:n].astype(int)).max() <= 2
