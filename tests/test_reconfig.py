"""Mid-stream lane-count reconfiguration through the BATCHED qwire path
(VERDICT r4 #4): a PCE that changes the element layout mid-stream (here
a CCE appearing at frame N/2 with a num_cc=1 PCE) must decode in-scan
via union-layout realignment (codec/batch._align_union_layout), not
demote to the single-stream Python decoder.

The reference reconfigures inline via output_configure
(aacdec.c:224-302, aac.h:104-110 OCStatus); its PCM output keeps the
declared output channels, with the CCE mixing in from its coupling
point -- ours must match it within the usual 2-LSB golden gate.
"""
import numpy as np
import pytest

from heaac_tpu import decode_adts
from heaac_tpu.codec.batch import decode_batch, parse_stream_qwire
from heaac_tpu.codec.encoder import AacEncoder
from heaac_tpu.io.heaac_testgen import splice_cce_into_lc


def _lc(seed=3, frames=24):
    rng = np.random.default_rng(seed)
    sr = 24000
    t = np.arange(1024 * frames) / sr
    x = 0.25 * np.sin(2 * np.pi * 500 * t) \
        + 0.02 * rng.standard_normal(len(t))
    return AacEncoder(sr, 1, bitrate=48000, window_switching=False)\
        .encode(np.clip(x * 3000, -32768, 32767).astype(np.int16))


def _oracle(ref_harness, adts: bytes) -> np.ndarray:
    import subprocess
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".aac") as fi, \
            tempfile.NamedTemporaryFile(suffix=".pcm") as fo:
        fi.write(adts)
        fi.flush()
        subprocess.run([str(ref_harness / "ref_decode"), fi.name, fo.name],
                       check=True, capture_output=True)
        return np.fromfile(fo.name, np.int16)


@pytest.mark.golden
@pytest.mark.parametrize("point", ["before", "after"])
def test_lane_count_flip_batched(ref_harness, point):
    """CCE appears at frame 12 of 24: the qwire parse realigns onto the
    union layout (no NotImplementedError), the batched decode matches
    the reference decoder <= 2 LSB, and a clean partner lane in the same
    batch stays bit-stable."""
    flip = splice_cce_into_lc(_lc(), coupling_point=point, start_frame=12)

    # the parse itself must produce a constant-width lane grid
    frames_q, _rate, nl, _is34, _ds = parse_stream_qwire(flip)
    assert all(len(fr) == nl for fr in frames_q)
    assert nl == 2                       # SCE lane + (union) CCE lane

    gold = _oracle(ref_harness, flip)
    partner = _lc(seed=9)
    partner_solo = decode_batch([partner])[0]
    outs = decode_batch([flip, partner])
    got = np.asarray(outs[0]).reshape(-1)
    n = min(len(got), len(gold))
    assert n >= 1024 * 20
    d = np.abs(got[:n].astype(int) - gold[:n].astype(int))
    assert d.max() <= 2, f"{point}: lane-flip batched vs oracle {d.max()}"
    p = np.asarray(outs[1])
    ps = np.asarray(partner_solo)
    m = min(len(p), len(ps))
    dp = np.abs(p[:m].astype(int) - ps[:m].astype(int))
    assert dp.max() <= 2


@pytest.mark.golden
def test_lane_count_flip_single_matches_batch(ref_harness):
    """The single-stream decoder and the batched union-layout decode
    agree on the same lane-flip stream."""
    flip = splice_cce_into_lc(_lc(seed=5), coupling_point="before",
                              start_frame=12)
    solo, _rate = decode_adts(flip)
    got = np.asarray(decode_batch([flip])[0]).reshape(-1)
    solo = np.asarray(solo).reshape(-1)
    n = min(len(got), len(solo))
    d = np.abs(got[:n].astype(int) - solo[:n].astype(int))
    assert n and d.max() <= 2
