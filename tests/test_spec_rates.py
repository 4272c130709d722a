"""Spec-mode (raw-bits) decode across core sample rates.

decode_spec_jax's bin->band mapping is built from the per-rate swb
tables (ff_swb_offset_1024/_128); the 24 kHz-only spec tests would miss
a transposed or off-by-one table at another rate.  Sweeps the SBR core
rates the generator supports (all sbr_make_f_master regimes) with
long+short content through the qwire device path.
"""
import numpy as np
import pytest

from heaac_tpu import decode_adts
from heaac_tpu.codec import qwire
from heaac_tpu.codec.batch import QStreamBatchDecoder, parse_stream_qwire
from heaac_tpu.codec.encoder import AacEncoder


@pytest.mark.parametrize("sr,br", [(16000, 24000), (22050, 32000),
                                   (32000, 48000)])
def test_spec_mode_rate_sweep(sr, br):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_into_lc
    rng = np.random.default_rng(3)
    t = np.arange(int(sr * 1.2)) / sr
    x = 0.05 * np.sin(2 * np.pi * 700 * t) \
        + 0.02 * np.sin(2 * np.pi * 0.11 * sr * t) \
        + 0.005 * rng.standard_normal(len(t))
    for p in range(512, len(x) - 96, 4096):    # some EIGHT_SHORT frames
        x[p:p + 96] += np.hanning(96) * 2.0
    pcm16 = np.clip(x * 3000, -32768, 32767).astype(np.int16)
    core = AacEncoder(sr, 1, bitrate=br,
                      window_switching=True).encode(pcm16)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=sr, is_cpe=False, env_hi_shift=-12, seed=5,
        invf_modes=(0,)))
    frames_q, _, _, _, _ = parse_stream_qwire(he)
    modes = np.array([(int(r[qwire.R_W2]) >> 24) & 15
                      for f in frames_q for _, r in f])
    assert (modes == 1).mean() > 0.3, \
        f"{sr} Hz: too few spec lanes ({(modes == 1).mean():.2f})"
    pcm_np, _ = decode_adts(he)
    new = np.asarray(QStreamBatchDecoder([he]).decode())
    a = new[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(a), len(pcm_np))
    d = np.abs(a[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"{sr} Hz: max LSB {d.max()}"
