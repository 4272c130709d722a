"""Wire-v4 spec-mode (raw-bits) lanes for CPE channels, incl. device M/S.

The reference decodes CPE channels in the same element loop as SCE
(aacdec.c:1460-1500) and applies the M/S butterfly on the host right
after the VLC loop (aacdec.c:1390-1411).  Our raw-bits wire mode ships
PRE-M/S spectra, so CPE pairs whose M/S mask is live must either both go
spec-mode (the device butterflies the pair across adjacent lanes,
W3_MS_LEFT/RIGHT + mask bytes in the left lane's block) or both fall to
tokens (host butterfly).  Covers the Python planner, the device decode,
and the native C++ emitter (aac_host.cc ht_parse_cpe decision matrix).

M/S streams come from OUR encoder (ms=True writes common_window + a
per-band mid/side mask; the reference encoder's analogue is
aacenc.c:507-519) and are golden-tested against the reference C decoder.
"""
import numpy as np
import pytest

from heaac_tpu import decode_adts
from heaac_tpu.codec import qwire
from heaac_tpu.codec.batch import (QStreamBatchDecoder,
                                   QwirePipelinedDecoder,
                                   StreamBatchDecoder, parse_stream_qwire)
from heaac_tpu.codec.encoder import AacEncoder


def _stereo_pcm(seconds=1.5, sr=24000, seed=3, sep=0.03):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    mid = 0.4 * np.sin(2 * np.pi * 700 * t) \
        + 0.05 * rng.standard_normal(len(t))
    side = sep * np.sin(2 * np.pi * 1900 * t)
    pcm = np.stack([mid + side, mid - side], 1) * 3000
    return np.clip(pcm, -32768, 32767).astype(np.int16)


def _he_cpe(ms: bool, seed=3):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_into_lc
    core = AacEncoder(24000, 2, bitrate=64000, ms=ms,
                      window_switching=False).encode(_stereo_pcm(seed=seed))
    return splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=True, env_hi_shift=-12, seed=7,
        invf_modes=(0,)))


def _wire_stats(he):
    frames_q, _, nl, _, _ = parse_stream_qwire(he)
    modes = np.array([(int(rec[qwire.R_W2]) >> 24) & 15
                      for f in frames_q for _, rec in f])
    w3s = np.array([int(rec[qwire.R_W3]) for f in frames_q for _, rec in f])
    spec = modes == 1
    ms_lanes = int((((w3s >> 28) & 3) != 0)[spec].sum())
    return float(spec.mean()), ms_lanes


def _stereo(pcm):   # [T, 2lanes, 2, 2048] -> [n, 2]
    return np.stack([pcm[:, 0, 0].reshape(-1),
                     pcm[:, 1, 0].reshape(-1)], -1)


def test_cpe_spec_lanes_no_ms():
    """Independent CPE channels ship raw bits; planner == compact path."""
    he = _he_cpe(ms=False)
    frac, ms_lanes = _wire_stats(he)
    assert frac > 0.25, f"no CPE spec lanes emitted ({frac})"
    assert ms_lanes == 0
    pcm_np, _ = decode_adts(he)
    new = _stereo(np.asarray(QStreamBatchDecoder([he]).decode()))
    n = min(len(new), len(pcm_np))
    d = np.abs(new[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"max LSB {d.max()}"


def test_cpe_spec_device_ms():
    """M/S pairs ship raw PRE-M/S bits + mask; butterfly on device."""
    he = _he_cpe(ms=True)
    frac, ms_lanes = _wire_stats(he)
    assert ms_lanes > 0, "no device-M/S spec pairs emitted"
    dec = QStreamBatchDecoder([he])
    assert dec.MS == 1
    pcm_np, _ = decode_adts(he)
    new = _stereo(np.asarray(dec.decode()))
    n = min(len(new), len(pcm_np))
    d = np.abs(new[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"max LSB {d.max()}"


def test_cpe_spec_native_pipelined():
    """The native emitter's CPE captures match the Python planner."""
    for ms in (False, True):
        he = _he_cpe(ms=ms)
        pcm_np, _ = decode_adts(he)
        dec = QwirePipelinedDecoder([he] * 4, group_streams=4)
        outs = dec.decode()
        pcm = np.asarray(outs[0])
        for lane0 in (0, 2):           # every stream copy decodes alike
            st = np.stack([pcm[:, lane0, 0].reshape(-1),
                           pcm[:, lane0 + 1, 0].reshape(-1)], -1)
            n = min(len(st), len(pcm_np))
            d = np.abs(st[:n].astype(int) - pcm_np[:n].astype(int))
            assert d.max() <= 2, f"ms={ms} lane {lane0}: {d.max()}"
        assert dec.MS == (1 if ms else 0)


@pytest.mark.golden
def test_cpe_ms_golden(ref_harness, tmp_path):
    """Encoder M/S syntax + device butterfly vs the reference C decoder."""
    import subprocess
    core = AacEncoder(24000, 2, bitrate=64000, ms=True,
                      window_switching=False).encode(_stereo_pcm())
    p = tmp_path / "ms.aac"
    p.write_bytes(core)
    g = tmp_path / "ms.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    ours, _ = decode_adts(core)
    n = min(len(gold), len(ours))
    assert np.abs(ours[:n].astype(int) - gold[:n].astype(int)).max() <= 2

    he = _he_cpe(ms=True)
    p2 = tmp_path / "ms_he.aac"
    p2.write_bytes(he)
    g2 = tmp_path / "ms_he.gold"
    subprocess.run([ref_harness["decode"], str(p2), str(g2)], check=True,
                   capture_output=True)
    gold = np.fromfile(g2, np.int16).reshape(-1, 2)
    new = _stereo(np.asarray(QStreamBatchDecoder([he]).decode()))
    n = min(len(new), len(gold))
    assert np.abs(new[:n].astype(int) - gold[:n].astype(int)).max() <= 2


def test_cpe_ms_short_windows():
    """Device M/S on EIGHT_SHORT spec pairs: the mask is per (group,
    sfb) band and the butterfly maps through the same band index as the
    de-interleave (ops/spec_huff.py f_q), so window-switched M/S frames
    stay raw-bits on both emitters."""
    from heaac_tpu.codec.batch import parse_stream_qwire
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_into_lc
    sr = 24000
    rng = np.random.default_rng(4)
    t = np.arange(int(sr * 1.5)) / sr
    mid = 0.05 * np.sin(2 * np.pi * 700 * t) \
        + 0.005 * rng.standard_normal(len(t))
    side = 0.01 * np.sin(2 * np.pi * 1900 * t)
    L, R = mid + side, mid - side
    for p in range(512, len(L) - 96, 2048):
        L[p:p + 96] += np.hanning(96) * 2.0
        R[p:p + 96] += np.hanning(96) * 2.0
    pcm16 = np.clip(np.stack([L, R], 1) * 3000,
                    -32768, 32767).astype(np.int16)
    core = AacEncoder(sr, 2, bitrate=64000, ms=True,
                      window_switching=True).encode(pcm16)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=True, env_hi_shift=-12, seed=7,
        invf_modes=(0,)))
    frames_q, _, _, _, _ = parse_stream_qwire(he)
    modes = np.array([(int(r[qwire.R_W2]) >> 24) & 15
                      for f in frames_q for _, r in f])
    w3s = np.array([int(r[qwire.R_W3]) for f in frames_q for _, r in f])
    sh_ms = int(((((w3s >> 30) & 1) & ((w3s >> 28) & 1))
                 * (modes == 1)).sum())
    assert sh_ms > 0, "no short-window device-M/S spec lanes emitted"
    pcm_np, _ = decode_adts(he)
    new = _stereo(np.asarray(QStreamBatchDecoder([he]).decode()))
    n = min(len(new), len(pcm_np))
    d = np.abs(new[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"planner: {d.max()}"
    dec = QwirePipelinedDecoder([he] * 4, group_streams=4)
    pcm = np.asarray(dec.decode()[0])
    st = np.stack([pcm[:, 0, 0].reshape(-1),
                   pcm[:, 1, 0].reshape(-1)], -1)
    n = min(len(st), len(pcm_np))
    d = np.abs(st[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"native: {d.max()}"


def test_cpe_ms_sharded():
    """Device M/S butterfly under the dp-sharded qwire decoder (the pair
    shift crosses shard boundaries via XLA's inserted collective)."""
    import jax
    from heaac_tpu.parallel.sharding import ShardedQwireDecoder, make_mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    he = _he_cpe(ms=True)
    pcm_np, _ = decode_adts(he)
    mesh = make_mesh(4)
    dec = ShardedQwireDecoder([he] * 4, mesh=mesh, group_streams=4)
    pcm = np.asarray(dec.decode()[0])
    st = np.stack([pcm[:, 0, 0].reshape(-1), pcm[:, 1, 0].reshape(-1)], -1)
    n = min(len(st), len(pcm_np))
    d = np.abs(st[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"sharded M/S max LSB {d.max()}"
