"""Per-lane error isolation on the native qwire fast path (SURVEY.md §5).

The reference decoder recovers per stream (aacdec.c:112,739 overread guards
+ ADTS resync); in a batched decode a corrupt stream must turn its own
frames into silence without desynchronizing its lane or poisoning others.
"""
import numpy as np
import pytest

from heaac_tpu.codec.batch import QwirePipelinedDecoder


def _streams(ref_harness, n=4):
    from test_golden_sbr import make_core

    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)
    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    out = []
    for i in range(n):
        w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                            seed=40 + i, invf_modes=(0, 1),
                            ps_writer=PsStreamWriter(seed=50 + i))
        out.append(splice_sbr_into_lc(core, w))
    return out


@pytest.mark.golden
def test_native_batch_lane_isolation(ref_harness):
    from heaac_tpu.bitstream.adts import split_adts_stream

    streams = _streams(ref_harness)
    clean = np.asarray(QwirePipelinedDecoder(streams,
                                             group_streams=4).decode()[0])

    # corrupt stream 1 mid-stream: flip bytes inside frame 5's payload
    frames = split_adts_stream(streams[1])
    bad = bytearray(frames[5])
    for i in range(10, min(30, len(bad))):
        bad[i] ^= 0xA5
    corrupted = b"".join(frames[:5] + [bytes(bad)] + frames[6:])
    streams_c = [streams[0], corrupted, streams[2], streams[3]]
    dirty = np.asarray(QwirePipelinedDecoder(streams_c,
                                             group_streams=4).decode()[0])

    assert clean.shape == dirty.shape          # [T, 4, 2, 2048]
    # lanes 0, 2, 3 must be bit-identical to the clean run
    for lane in (0, 2, 3):
        np.testing.assert_array_equal(dirty[:, lane], clean[:, lane],
                                      f"lane {lane} poisoned")
    # the corrupted lane must differ somewhere but keep frame alignment:
    # frames before the corruption are still identical
    assert not np.array_equal(dirty[:, 1], clean[:, 1])
    np.testing.assert_array_equal(dirty[:4, 1], clean[:4, 1],
                                  "pre-corruption frames changed")
