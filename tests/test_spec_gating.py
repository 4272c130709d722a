"""Regression tests for wire-v4 spec-mode (raw-bits) lane gating.

The round-3 review found three gating bugs in the Python planner's
spec-mode path (the native emitter gates correctly at decision time,
native/aac_host.cc:1272):

1. TNS lanes shipped raw pre-TNS spectral bits: TNS is applied host-side
   and the ``present`` flag cleared before ``_try_spec_block`` ran, so
   its ``cd.tns.present`` check never fired.  Capture is now gated inside
   ``decode_ics`` (bitstream/aac_syntax.py) where the flags are live.
2. EIGHT_SHORT frames whose windows share one group passed the
   ``num_window_groups != 1`` check despite the interleaved bin layout
   (``aacdec.c`` spectral order differs from output order for short
   windows regardless of grouping).
3. A decode group whose only spec-mode lanes carry nbits==0 (silence
   spectra) sized the device Huffman buffer NB=0, so those lanes'
   section-map bytes were token-decoded as garbage (codec/batch.py NB
   gate now keys on mode-1 *presence*, not nbits>0).

These streams are generated with OUR encoder (the reference encoder never
writes TNS, aacenc.c:453) and compared against the round-1 compact batch
path, which decodes via the host dense-plan route and is itself golden
vs the reference C decoder.
"""
import numpy as np
import pytest

from heaac_tpu.codec import qwire
from heaac_tpu.codec.encoder import AacEncoder


def _core(seed=7, tns=None, window_switching=False, level=1200.0,
          seconds=1.5, silence=False):
    sr = 24000
    if silence:
        pcm = np.zeros(int(sr * seconds), np.int16)
    else:
        rng = np.random.default_rng(seed)
        t = np.arange(int(sr * seconds)) / sr
        x = (0.25 * np.sin(2 * np.pi * 700 * t)
             + 0.1 * np.sin(2 * np.pi * 2900 * t)
             + 0.01 * rng.standard_normal(len(t)))
        if window_switching:
            for p in range(sr // 4, len(x), sr // 3):
                x[p:p + 64] += np.hanning(64)[:max(0, min(64, len(x) - p))]
        pcm = np.clip(x * level, -32768, 32767).astype(np.int16)
    enc = AacEncoder(sr, 1, bitrate=32000,
                     window_switching=window_switching, tns_inject=tns)
    return enc.encode(pcm)


def _splice(core, seed=5):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_into_lc
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, seed=seed,
                        env_hi_shift=-12, invf_modes=(0,))
    return splice_sbr_into_lc(core, w)


def _modes(frames_q):
    return [(int(rec[qwire.R_W2]) >> 24) & 15
            for f in frames_q for _, rec in f]


def _nbits(frames_q):
    return [int(rec[qwire.R_W3]) & 0x1FFF
            for f in frames_q for _, rec in f
            if ((int(rec[qwire.R_W2]) >> 24) & 15) == 1]


def _compare_vs_compact(he, lsb=2):
    """QStreamBatchDecoder (qwire graph) vs StreamBatchDecoder (compact
    dense-plan graph): same math, two separately compiled XLA programs,
    <=2 LSB through the gain limiter's near-threshold switches."""
    from heaac_tpu.codec.batch import QStreamBatchDecoder, \
        StreamBatchDecoder
    old = np.asarray(StreamBatchDecoder([he], batch=1).decode())
    new = np.asarray(QStreamBatchDecoder([he]).decode())
    assert old.shape == new.shape
    d = np.abs(old.astype(int) - new.astype(int))
    assert d.max() <= lsb, f"qwire-vs-compact max LSB {d.max()}"


def test_tns_lane_never_spec_mode():
    """A TNS-bearing long-window lane must NOT ship raw spectral bits
    (the device spec decoder has no TNS filter); a TNS-free control
    stream from the same encoder must still use spec mode (the gate is
    not trivially disabling the path)."""
    from heaac_tpu.codec.batch import parse_stream_qwire
    he_tns = _splice(_core(tns=dict(coefs=[2, 1, 5], coef_res=0,
                                    direction=0)))
    frames_q, _, _, _, _ = parse_stream_qwire(he_tns)
    assert 1 not in _modes(frames_q), \
        "TNS frame took the raw-bits spec path"

    he_ctl = _splice(_core(tns=None))
    frames_ctl, _, _, _, _ = parse_stream_qwire(he_ctl)
    assert 1 in _modes(frames_ctl), \
        "control stream never used spec mode: gate is over-broad"

    _compare_vs_compact(he_tns)


def test_eight_short_spec_mode_flagged():
    """EIGHT_SHORT frames interleave window groups in the spectral
    domain; a raw-bits lane must therefore carry the W3_SHORT flag (the
    device de-interleaves, ops/spec_huff.py) — and the batch still
    matches the compact path."""
    from heaac_tpu.bitstream import aac_syntax as T
    from heaac_tpu.codec.batch import parse_stream_qwire
    from heaac_tpu.codec.encoder import decide_window_sequences

    core = _core(window_switching=True, level=9000.0)
    he = _splice(core)
    # the transient generator must actually trigger short windows
    sr = 24000
    rng = np.random.default_rng(7)
    t = np.arange(int(sr * 1.5)) / sr
    x = (0.25 * np.sin(2 * np.pi * 700 * t)
         + 0.1 * np.sin(2 * np.pi * 2900 * t)
         + 0.01 * rng.standard_normal(len(t)))
    for p in range(sr // 4, len(x), sr // 3):
        x[p:p + 64] += np.hanning(64)[:max(0, min(64, len(x) - p))]
    pcm = np.clip(x * 9000.0, -32768, 32767).astype(np.float32)
    ws_seq, _ = decide_window_sequences(pcm, (len(pcm) + 1023) // 1024)
    assert (ws_seq == T.T.EIGHT_SHORT).any(), \
        "test signal produced no EIGHT_SHORT frames"

    frames_q, _, _, _, _ = parse_stream_qwire(he)
    # every EIGHT_SHORT lane must be token-mode; spec lanes (mode 1) may
    # only come from the LONG frames in between
    from heaac_tpu.codec.batch import split_adts_stream
    from heaac_tpu.codec.decoder import Decoder
    dec = Decoder(adts_probe=he[:7])
    for f, lanes in zip(split_adts_stream(he), frames_q):
        dec.decode_frame(f)
        (el,) = dec.elements.values()
        ws = int(el.cur[0].ics.window_sequence)
        if ws == int(T.T.EIGHT_SHORT):
            for _, rec in lanes:
                if ((int(rec[qwire.R_W2]) >> 24) & 15) == 1:
                    assert (int(rec[qwire.R_W3]) >> 30) & 1, \
                        "EIGHT_SHORT raw-bits lane missing W3_SHORT"

    _compare_vs_compact(he)


def test_silence_spec_lanes_route_through_spec_decoder():
    """All-zero spectra produce spec-mode lanes with nbits==0; the group
    must still size the device Huffman buffer (NB>0) so their section
    maps are not token-decoded as garbage."""
    from heaac_tpu.codec.batch import QStreamBatchDecoder, \
        parse_stream_qwire
    he = _splice(_core(silence=True))
    frames_q, _, _, _, _ = parse_stream_qwire(he)
    nb = _nbits(frames_q)
    assert nb, "silence stream emitted no spec-mode lanes"
    assert max(nb) == 0, "silence stream has nonzero spectral bits"

    bd = QStreamBatchDecoder([he])
    assert bd.NB > 0, "NB gate dropped the spec decoder for nbits==0"
    _compare_vs_compact(he)
