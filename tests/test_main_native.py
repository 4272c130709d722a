"""AAC-Main through the native front-end (the last object-type cliff).

The C++ engine keeps per-lane predictor state (672x6 emulated-f16
recurrence, aac_host.cc apply_main_prediction = aacdec.c:1247-1322) and
demotes Main lanes from raw-bits/direct tokens to captured-value tokens
(prediction rewrites spectra after the VLC loop, like a dependent CCE).
Covers both whole-stream parsers: ht_parse_stream (dense LC batch) and
hh_parse_he_impl (qwire, via a Main core with spliced SBR)."""
import logging

import numpy as np
import pytest

from heaac_tpu.bitstream.adts import parse_adts_header, split_adts_stream
from heaac_tpu.bitstream.reader import BitReader
from heaac_tpu.codec.encoder import AacEncoder


def _tone(sr, ch, seconds=2.0):
    t = np.arange(int(sr * seconds)) / sr
    chans = [0.4 * np.sin(2 * np.pi * (330 + 170 * c) * t)
             + 0.25 * np.sin(2 * np.pi * (1200 + 90 * c) * t)
             + 0.1 * np.sin(2 * np.pi * (3100 + 55 * c) * t)
             for c in range(ch)]
    return np.clip(np.stack(chans, -1) * 12000, -32768, 32767).astype(
        np.int16)


def _oracle(ref_harness, adts, nch, tmp_path):
    import subprocess
    p = tmp_path / "m.aac"
    p.write_bytes(adts)
    g = tmp_path / "m.gold"
    subprocess.run([str(ref_harness["decode"]), str(p), str(g)],
                   check=True, capture_output=True)
    return np.fromfile(g, np.int16).reshape(-1, nch)


def _dense_decode(streams, native_on):
    from heaac_tpu import native
    from heaac_tpu.codec.batch import LcStreamBatchDecoder
    orig = native.available
    if not native_on:
        native.available = lambda: False
    try:
        bd = LcStreamBatchDecoder(streams)
        return np.asarray(bd.decode()), bd
    finally:
        native.available = orig


@pytest.mark.golden
@pytest.mark.parametrize("ch", [1, 2])
def test_main_dense_native(ch, ref_harness, tmp_path):
    """Main mono (SCE) / stereo (CPE, common_window=0, per-channel
    prediction) through ht_parse_stream: the native parse must be taken
    (no -2), match the Python planner bit-for-bit through the same
    graph, and the reference C decoder within 2 LSB."""
    from heaac_tpu import native
    from heaac_tpu.tables import aac_tables as T

    sr = 44100
    adts = AacEncoder(sr, ch, object_type=1).encode(_tone(sr, ch))
    hdr = parse_adts_header(BitReader(adts[:7]))
    assert hdr.object_type == 1

    # the native whole-stream parser accepts the stream (no fallback)
    frames = split_adts_stream(adts)
    layout = T.CHANNEL_LAYOUT_MAP[hdr.chan_config]
    r = native.parse_stream(adts, hdr.sampling_index, layout, len(frames))
    assert r is not None, "ht_parse_stream fell back on a Main stream"

    nat, bd = _dense_decode([adts], native_on=True)
    ref, _ = _dense_decode([adts], native_on=False)
    # same compiled graph, same float coeffs -> bit-identical PCM
    assert np.array_equal(nat, ref), "native Main parse != Python planner"

    gold = _oracle(ref_harness, adts, ch, tmp_path)
    pcm = nat[:, :ch].transpose(0, 2, 1).reshape(-1, ch)
    n = min(len(pcm), len(gold))
    diff = np.abs(pcm[:n].astype(int) - gold[:n].astype(int))
    assert diff.max() <= 2, f"vs oracle max LSB {diff.max()}"


@pytest.mark.golden
def test_main_decode_batch_front_door(ref_harness, caplog, tmp_path):
    """decode_batch with Main streams mixed into the pool: the native
    probe accepts profile 0, Main and LC share a dense bucket (the key
    is SBR-kind based; parse is per-stream), and nothing falls back to
    the single-stream decoder."""
    from heaac_tpu.codec.batch import decode_batch

    sr = 44100
    main_m = AacEncoder(sr, 1, object_type=1).encode(_tone(sr, 1))
    lc_m = AacEncoder(sr, 1).encode(_tone(sr, 1))
    main_s = AacEncoder(sr, 2, object_type=1).encode(_tone(sr, 2))

    with caplog.at_level(logging.INFO, logger="heaac_tpu"):
        outs = decode_batch([main_m, lc_m, main_s])
    bad = [r for r in caplog.records
           if "fell back" in r.getMessage() or "bisect" in r.getMessage()]
    assert not bad, [r.getMessage() for r in bad]

    for adts, out, ch in ((main_m, outs[0], 1), (lc_m, outs[1], 1),
                          (main_s, outs[2], 2)):
        gold = _oracle(ref_harness, adts, ch, tmp_path)
        n = min(len(out), len(gold))
        diff = np.abs(out[:n].astype(int) - gold[:n].astype(int))
        assert diff.max() <= 2, f"vs oracle max LSB {diff.max()}"


@pytest.mark.golden
def test_main_he_qwire_native(ref_harness, caplog, tmp_path):
    """Main core + spliced SBR through the qwire path (hh_parse_he_impl):
    value-token capture with prediction-touched bins marked raw must
    match the Python-planner qwire decode bit-for-bit, with zero
    planner-fallback log lines, and the reference C decoder on PCM."""
    from heaac_tpu import native
    from heaac_tpu.codec.batch import (QStreamBatchDecoder,
                                       QwirePipelinedDecoder)
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_into_lc

    sr = 22050
    # spectrally-rich quiet content like the other SBR goldens: pure
    # tones leave SBR bands with ~zero energy where the gain calculation
    # is 0/0-chaotic (see test_multichannel_native._make_51_core)
    from conftest import gen_pcm
    gen_pcm(tmp_path / "in.pcm", sr, 1, seconds=1.5, seed=41)
    rich = np.fromfile(tmp_path / "in.pcm", np.int16).reshape(-1, 1)
    core = AacEncoder(sr, 1, object_type=1).encode(
        (rich // 3).astype(np.int16))
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=sr, is_cpe=False, env_hi_shift=-12, seed=41,
        invf_modes=(0,)))
    hdr = parse_adts_header(BitReader(he[:7]))
    assert hdr.object_type == 1

    assert native.available()
    orig = native.available
    native.available = lambda: False     # reference side: python planner
    try:
        ref = np.asarray(QStreamBatchDecoder([he]).decode())
    finally:
        native.available = orig
    with caplog.at_level(logging.INFO, logger="heaac_tpu"):
        dec = QwirePipelinedDecoder([he])
        nat = np.asarray(dec.decode()[0])
    fallbacks = [r for r in caplog.records
                 if "fell back to the Python planner" in r.getMessage()]
    assert not fallbacks, "native qwire path fell back on a Main stream"
    n = min(nat.shape[0], ref.shape[0])
    assert np.array_equal(nat[:n], ref[:n]), \
        "native Main qwire parse != Python planner"

    # the reference upgrades mono+implicit-SBR to PS -> stereo output
    gold = _oracle(ref_harness, he, 2, tmp_path)
    pcm = nat[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(pcm), len(gold))
    assert n > 0
    diff = np.abs(pcm[:n].astype(int) - gold[:n].astype(int))
    assert diff.max() <= 2, f"vs oracle max LSB {diff.max()}"
