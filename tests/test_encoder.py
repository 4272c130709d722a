"""AAC-LC encoder conformance: our streams must decode on the reference
decoder, match our decoder, and reconstruct the input to reasonable SNR."""
import subprocess

import numpy as np
import pytest

from heaac_tpu import decode_adts
from heaac_tpu.codec.encoder import AacEncoder

from conftest import STREAMS


def _tone(sr, ch, seconds=1.5):
    t = np.arange(int(sr * seconds)) / sr
    chans = [0.5 * np.sin(2 * np.pi * (440 + 210 * c) * t)
             + 0.2 * np.sin(2 * np.pi * (1500 + 80 * c) * t)
             for c in range(ch)]
    return np.clip(np.stack(chans, -1) * 16000, -32768, 32767).astype(np.int16)


@pytest.mark.golden
@pytest.mark.parametrize("sr,ch", [(44100, 1), (48000, 2), (24000, 1)])
def test_encode_roundtrip(sr, ch, ref_harness, tmp_path):
    pcm = _tone(sr, ch)
    adts = AacEncoder(sr, ch).encode(pcm)
    p = tmp_path / "e.aac"
    p.write_bytes(adts)
    g = tmp_path / "e.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, ch)
    ours, rate = decode_adts(adts)
    assert rate == sr and ours.shape[1] == ch
    n = min(len(ours), len(gold))
    assert np.abs(ours[:n].astype(int) - gold[:n].astype(int)).max() <= 2
    # quality: reference-decoded output vs original (1024-sample delay)
    m = min(len(pcm), len(gold) - 1024)
    d = gold[1024:1024 + m].astype(np.float64) - pcm[:m]
    snr = 10 * np.log10((pcm[:m].astype(np.float64) ** 2).mean()
                        / max((d ** 2).mean(), 1e-9))
    assert snr > 25, f"SNR {snr:.1f} dB"


def _transient(sr, ch, seconds=2.0):
    t = np.arange(int(sr * seconds)) / sr
    chans = [0.5 * np.sin(2 * np.pi * (440 + 110 * c) * t)
             for c in range(ch)]
    x = np.stack(chans, -1)
    for p in range(sr // 3, len(x), sr // 2):
        x[p:p + 96] += np.hanning(96)[:, None] * 0.8
    return np.clip(x * 16000, -32768, 32767).astype(np.int16)


@pytest.mark.golden
def test_encode_window_switching(ref_harness, tmp_path):
    """Transient content must produce EIGHT_SHORT frames (with legal
    LONG_START/LONG_STOP transitions) that both decoders agree on."""
    from heaac_tpu.bitstream.adts import split_adts_stream
    from heaac_tpu.codec.decoder import Decoder

    sr = 48000
    pcm = _transient(sr, 1)
    adts = AacEncoder(sr, 1).encode(pcm)
    # window sequence legality + actual short frames present
    dec = Decoder(adts_probe=adts[:7], use_native=False)
    seqs = []
    for f in split_adts_stream(adts):
        dec.decode_frame(f)
        seqs.append(list(dec.elements.values())[0].cur[0].ics.window_sequence)
    assert 2 in seqs, "no EIGHT_SHORT frames on transient content"
    legal = {(0, 0), (0, 1), (1, 2), (2, 2), (2, 3), (3, 0), (3, 1), (3, 3)}
    for a, b in zip(seqs, seqs[1:]):
        assert (a, b) in legal, f"illegal window transition {a}->{b}"
    p = tmp_path / "w.aac"
    p.write_bytes(adts)
    g = tmp_path / "w.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16)
    ours, rate = decode_adts(adts)
    n = min(len(ours), len(gold))
    assert np.abs(ours[:n, 0].astype(int) - gold[:n].astype(int)).max() <= 2


@pytest.mark.golden
@pytest.mark.parametrize("bitrate", [48000, 96000])
def test_encode_rate_control(bitrate, ref_harness, tmp_path):
    """Psy model + bit reservoir: the stream must land near the target
    bitrate, decode on the reference, and hold reasonable quality."""
    sr = 44100
    pcm = _tone(sr, 1, seconds=2.0)
    adts = AacEncoder(sr, 1, bitrate=bitrate).encode(pcm)
    kbps = len(adts) * 8 / (len(pcm) / sr)
    assert 0.6 * bitrate <= kbps <= 1.35 * bitrate, f"rate {kbps/1000:.0f}k"
    p = tmp_path / "r.aac"
    p.write_bytes(adts)
    g = tmp_path / "r.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16)
    ours, rate = decode_adts(adts)
    n = min(len(ours), len(gold))
    assert np.abs(ours[:n, 0].astype(int) - gold[:n].astype(int)).max() <= 2
    # quality: median 2048-sample segment SNR (robust to the onset frame)
    m = min(len(pcm), len(gold) - 1024)
    e = gold[1024:1024 + m].astype(np.float64) - pcm[:m, 0]
    segs = []
    for k in range(0, m - 2048, 2048):
        psig = (pcm[k:k + 2048, 0].astype(np.float64) ** 2).mean()
        pn = (e[k:k + 2048] ** 2).mean()
        segs.append(10 * np.log10(max(psig, 1e-9) / max(pn, 1e-9)))
    assert np.median(segs) > 30, f"median seg SNR {np.median(segs):.1f} dB"


@pytest.mark.golden
def test_encode_aac_main_prediction(ref_harness, tmp_path):
    """AAC-Main: encoder mirrors the decoder's frequency-domain predictor
    (emulated-f16 state machine) and codes residuals; exercises the
    decoder's prediction path against the reference."""
    sr = 44100
    pcm = _tone(sr, 1, seconds=2.0)
    adts = AacEncoder(sr, 1, object_type=1).encode(pcm)
    p = tmp_path / "m.aac"
    p.write_bytes(adts)
    g = tmp_path / "m.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16)
    ours, rate = decode_adts(adts)
    n = min(len(ours), len(gold))
    assert np.abs(ours[:n, 0].astype(int) - gold[:n].astype(int)).max() <= 2
    m = min(len(pcm), len(gold) - 1024)
    d = gold[1024:1024 + m].astype(np.float64) - pcm[:m, 0]
    snr = 10 * np.log10((pcm[:m, 0].astype(np.float64) ** 2).mean()
                        / max((d ** 2).mean(), 1e-9))
    assert snr > 30, f"SNR {snr:.1f} dB"


@pytest.mark.golden
def test_encode_aac_main_stereo(ref_harness, tmp_path):
    """AAC-Main stereo: the encoder emits a CPE with common_window=0 and
    per-channel prediction; the reference predicts each channel inside
    decode_ics (aacdec.c:1381-1382) — our decoder must match (it used to
    skip prediction on the !common_window CPE path entirely)."""
    sr = 44100
    pcm = _tone(sr, 2, seconds=2.0)
    adts = AacEncoder(sr, 2, object_type=1).encode(pcm)
    p = tmp_path / "ms.aac"
    p.write_bytes(adts)
    g = tmp_path / "ms.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    ours, rate = decode_adts(adts)
    n = min(len(ours), len(gold))
    assert np.abs(ours[:n].astype(int) - gold[:n].astype(int)).max() <= 2
    m = min(len(pcm), len(gold) - 1024)
    d = gold[1024:1024 + m].astype(np.float64) - pcm[:m]
    snr = 10 * np.log10((pcm[:m].astype(np.float64) ** 2).mean()
                        / max((d ** 2).mean(), 1e-9))
    assert snr > 30, f"SNR {snr:.1f} dB"


@pytest.mark.golden
def test_encode_twoloop_gain(ref_harness, tmp_path):
    """Scalefactor twoloop refinement (aaccoder.c:381 analogue) must buy a
    measurable SNR gain at a constrained rate (VERDICT round-1 item 9)."""
    sr = 44100
    pcm = _tone(sr, 1, seconds=1.5)

    def run(enc):
        adts = enc.encode(pcm)
        p = tmp_path / "tl.aac"
        p.write_bytes(adts)
        g = tmp_path / "tl.gold"
        subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                       capture_output=True)
        gold = np.fromfile(g, np.int16)
        m = min(len(pcm), len(gold) - 1024)
        e = gold[1024:1024 + m].astype(np.float64) - pcm[:m, 0]
        segs = []
        for k in range(0, m - 2048, 2048):
            psig = (pcm[k:k + 2048, 0].astype(np.float64) ** 2).mean()
            pn = (e[k:k + 2048] ** 2).mean()
            segs.append(10 * np.log10(max(psig, 1e-9) / max(pn, 1e-9)))
        return float(np.median(segs)), len(adts) * 8 / (len(pcm) / sr)

    snr_on, rate_on = run(AacEncoder(sr, 1, bitrate=64000))
    base = AacEncoder(sr, 1, bitrate=64000)
    base._refine_twoloop = lambda an, co, budget: co   # disable
    snr_off, rate_off = run(base)
    assert rate_on <= 1.1 * max(rate_off, 64000), (rate_on, rate_off)
    assert snr_on >= snr_off + 0.5, \
        f"twoloop gain {snr_on - snr_off:.2f} dB (on {snr_on:.1f}, " \
        f"off {snr_off:.1f})"


@pytest.mark.golden
def test_encode_anmr_trellis_gain(ref_harness, tmp_path):
    """ANMR trellis search (aaccoder.c:476 search_for_quantizers_anmr +
    aaccoder.c:258 encode_window_bands_info analogues): the joint
    scalefactor-Viterbi + codebook-run-trellis coder must beat the twoloop
    coder's quality at the same rate budget (VERDICT round-2 item 10), and
    its streams must stay reference-conformant."""
    sr = 44100
    t = np.arange(int(sr * 1.2)) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.18 * np.sin(2 * np.pi * 1870 * t)
         + 0.07 * np.sin(2 * np.pi * 5275 * t))
    for p in range(sr // 3, len(x), sr // 2):      # transients -> short wins
        x[p:p + 96] += np.hanning(96) * 0.6
    pcm = np.clip(x * 14000, -32768, 32767).astype(np.int16)[:, None]

    def run(enc):
        adts = enc.encode(pcm)
        p = tmp_path / "an.aac"
        p.write_bytes(adts)
        g = tmp_path / "an.gold"
        subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                       capture_output=True)
        gold = np.fromfile(g, np.int16)
        ours, _ = decode_adts(adts)
        n = min(len(ours), len(gold))
        assert np.abs(ours[:n, 0].astype(int)
                      - gold[:n].astype(int)).max() <= 2
        m = min(len(pcm), len(gold) - 1024)
        e = gold[1024:1024 + m].astype(np.float64) - pcm[:m, 0]
        segs = []
        for k in range(0, m - 2048, 2048):
            psig = (pcm[k:k + 2048, 0].astype(np.float64) ** 2).mean()
            pn = (e[k:k + 2048] ** 2).mean()
            segs.append(10 * np.log10(max(psig, 1e-9) / max(pn, 1e-9)))
        return float(np.median(segs)), len(adts) * 8 / (len(pcm) / sr)

    snr_tr, rate_tr = run(AacEncoder(sr, 1, bitrate=64000, coder="anmr"))
    snr_tl, rate_tl = run(AacEncoder(sr, 1, bitrate=64000))
    assert rate_tr <= 1.05 * max(rate_tl, 64000), (rate_tr, rate_tl)
    if rate_tl > 1.02 * rate_tr:
        # the twoloop coder overshoots its target harder than the
        # trellis (its refinement spends the whole 1.02x budget); a
        # same-rate comparison needs its achieved rate pulled down to
        # the trellis's (one proportional correction step)
        snr_tl, rate_tl = run(AacEncoder(
            sr, 1, bitrate=int(64000 * rate_tr / rate_tl)))
    assert rate_tl <= 1.03 * rate_tr, (rate_tr, rate_tl)
    assert snr_tr >= snr_tl + 0.3, \
        f"anmr gain {snr_tr - snr_tl:.2f} dB (anmr {snr_tr:.1f} " \
        f"@ {rate_tr/1000:.1f}k, twoloop {snr_tl:.1f} @ {rate_tl/1000:.1f}k)"
