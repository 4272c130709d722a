"""Golden end-to-end tests: our decoder vs the reference C decoder.

FATE-style: streams are generated with the reference encoder, decoded by
both pipelines, and compared sample-exact within the accuracy contract
(max deviation < 1e-4 of full scale ~= 3.3 int16 LSB; we hold a tighter
2-LSB bound in practice).
"""
import numpy as np
import pytest

from heaac_tpu import decode_adts

CONFIGS = [
    ("lc_mono_44k", 44100, 1, 64000),
    ("lc_stereo_48k", 48000, 2, 128000),
    ("lc_stereo_44k_low", 44100, 2, 48000),   # low rate: more TNS/M-S
    ("lc_mono_24k", 24000, 1, 32000),
    ("lc_mono_8k", 8000, 1, 16000),
    ("lc_stereo_96k", 96000, 2, 192000),
    ("lc_5dot1_48k", 48000, 6, 256000),   # config 6: CPE+SCE+LFE+CPE
]


@pytest.mark.golden
@pytest.mark.parametrize("name,sr,ch,br", CONFIGS)
def test_lc_golden(name, sr, ch, br, stream_factory):
    aac, gold = stream_factory(name, sr, ch, br)
    pcm, rate = decode_adts(aac.read_bytes())
    assert rate == sr
    assert pcm.shape[1] == ch
    want = np.fromfile(gold, np.int16).reshape(-1, ch)
    n = min(len(pcm), len(want))
    assert n > sr  # decoded at least a second
    diff = np.abs(pcm[:n].astype(np.int32) - want[:n].astype(np.int32))
    assert diff.max() <= 2, f"max int16 deviation {diff.max()}"
