"""Mid-stream LC<->Main profile flips through the native front-end.

The reference re-reads the ADTS header every frame (aacdec.c:1989) and
m4ac.object_type gates prediction inside decode_ics (aacdec.c:1381),
so a stream whose profile flips mid-stream is legal: prediction simply
freezes across LC frames and resumes on the next Main frame.  Round 3
made the native parsers latch the frame-0 profile and bail (-2) on a
flip — the last planner-fallback cliff for object types the framework
decodes.  Both whole-stream parsers now read the profile per frame.
"""
import logging

import numpy as np
import pytest

from heaac_tpu.bitstream.adts import parse_adts_header, split_adts_stream
from heaac_tpu.bitstream.reader import BitReader
from heaac_tpu.codec.encoder import AacEncoder

from test_main_native import _dense_decode, _oracle, _tone


def _flip_stream(sr, ch, runs=((1, 6), (2, 6), (1, 6))):
    """Interleave frame runs from a Main and an LC encode of the same
    PCM: (object_type, nframes) runs.  Each ADTS frame is self-framed
    and syntax-independent, so the splice is a legal stream; decoder
    state (windows, predictor) carries across the boundary identically
    in our decoder and the reference."""
    pcm = _tone(sr, ch)
    enc = {1: split_adts_stream(AacEncoder(sr, ch, object_type=1)
                                .encode(pcm)),
           2: split_adts_stream(AacEncoder(sr, ch).encode(pcm))}
    out, pos = [], 0
    for aot, n in runs:
        out += enc[aot][pos:pos + n]
        pos += n
    assert pos <= len(enc[1]) and pos <= len(enc[2])
    return b"".join(out)


@pytest.mark.golden
@pytest.mark.parametrize("ch", [1, 2])
def test_profile_flip_dense_native(ch, ref_harness, tmp_path):
    """A Main->LC->Main stream parses through ht_parse_stream with no
    fallback, matches the Python planner bit-for-bit, and the reference
    C decoder within 2 LSB."""
    from heaac_tpu import native
    from heaac_tpu.tables import aac_tables as T

    sr = 44100
    adts = _flip_stream(sr, ch)
    frames = split_adts_stream(adts)
    aots = [parse_adts_header(BitReader(f[:7])).object_type for f in frames]
    assert set(aots) == {1, 2} and aots[0] == 1

    hdr = parse_adts_header(BitReader(adts[:7]))
    layout = T.CHANNEL_LAYOUT_MAP[hdr.chan_config]
    r = native.parse_stream(adts, hdr.sampling_index, layout, len(frames))
    assert r is not None, "ht_parse_stream fell back on a profile flip"

    nat, _ = _dense_decode([adts], native_on=True)
    ref, _ = _dense_decode([adts], native_on=False)
    assert np.array_equal(nat, ref), "native flip parse != Python planner"

    gold = _oracle(ref_harness, adts, ch, tmp_path)
    pcm = nat[:, :ch].transpose(0, 2, 1).reshape(-1, ch)
    n = min(len(pcm), len(gold))
    assert n > 10000
    diff = np.abs(pcm[:n].astype(int) - gold[:n].astype(int))
    assert diff.max() <= 2, f"vs oracle max LSB {diff.max()}"


@pytest.mark.golden
def test_profile_flip_qwire_native(ref_harness, caplog, tmp_path):
    """Flip core + spliced SBR through hh_parse_he_impl: Main frames
    demote their lanes to captured-value tokens, LC frames keep the
    raw-bits/direct shortcuts — per frame, in one stream — with zero
    planner fallbacks and planner-bit-exact output."""
    from heaac_tpu import native
    from heaac_tpu.codec.batch import (QStreamBatchDecoder,
                                       QwirePipelinedDecoder)
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_into_lc
    from conftest import gen_pcm

    sr = 22050
    gen_pcm(tmp_path / "in.pcm", sr, 1, seconds=1.5, seed=43)
    rich = (np.fromfile(tmp_path / "in.pcm", np.int16).reshape(-1, 1)
            // 3).astype(np.int16)
    enc = {1: split_adts_stream(AacEncoder(sr, 1, object_type=1)
                                .encode(rich)),
           2: split_adts_stream(AacEncoder(sr, 1).encode(rich))}
    out, pos = [], 0
    for aot, n in ((2, 5), (1, 5), (2, 5), (1, 5)):
        out += enc[aot][pos:pos + n]
        pos += n
    core = b"".join(out)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=sr, is_cpe=False, env_hi_shift=-12, seed=43,
        invf_modes=(0,)))

    assert native.available()
    orig = native.available
    native.available = lambda: False
    try:
        ref = np.asarray(QStreamBatchDecoder([he]).decode())
    finally:
        native.available = orig
    with caplog.at_level(logging.INFO, logger="heaac_tpu"):
        nat = np.asarray(QwirePipelinedDecoder([he]).decode()[0])
    fallbacks = [r for r in caplog.records
                 if "fell back to the Python planner" in r.getMessage()]
    assert not fallbacks, "native qwire path fell back on a profile flip"
    n = min(nat.shape[0], ref.shape[0])
    assert np.array_equal(nat[:n], ref[:n]), \
        "native flip qwire parse != Python planner"

    gold = _oracle(ref_harness, he, 2, tmp_path)
    pcm = nat[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(pcm), len(gold))
    assert n > 10000
    diff = np.abs(pcm[:n].astype(int) - gold[:n].astype(int))
    assert diff.max() <= 2, f"vs oracle max LSB {diff.max()}"
