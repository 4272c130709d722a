"""Mid-stream PS band-mode (20<->34) flips decoded batched on device.

The reference re-reads the PS header every frame and converts its carried
state on the transition (aacps.c:829-860 map_val_20_to_34/34_to_20 +
ipd/opd reset; decorrelation state zeroed by the is34bands !=
is34bands_old check).  The static per-mode scan graphs cannot represent
that, so round-2 demoted such streams to the ~100x-slower numpy
single-stream path.  The flip-capable scan (heaac_graph.
qwire_scan_decoder_flip) reads the per-frame mode from side bit 6, runs
the PS stage in both band modes selecting per lane, and applies the
reference's state conversion at each lane's flip boundary — one compiled
graph for any flip schedule.
"""
import numpy as np
import pytest

from heaac_tpu.bitstream.adts import split_adts_stream

from conftest import STREAMS
from test_golden_sbr import make_core


def _flip_stream(ref_harness, seed, iid0, icc0, switch_at):
    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)
    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    psw = PsStreamWriter(seed=seed, iid_mode=iid0, icc_mode=icc0,
                         switch_at=switch_at)
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=seed + 7, invf_modes=(0,), grid_classes=(0,),
                        fix_num_env=1, ps_writer=psw)
    return splice_sbr_into_lc(core, w)


@pytest.mark.golden
@pytest.mark.parametrize("name,iid0,icc0,switch_at,want_trail", [
    # 20 -> 34 (34-band ICC engages is34, aacps.c:156-158)
    ("flip_20to34", 1, 1, {6: (1, 2)}, (0, 1)),
    # 34 -> 20 -> 34: both map_val directions + a second conversion on
    # already-converted state
    ("flip_double", 1, 2, {5: (1, 1), 11: (1, 2)}, (1, 0, 1)),
])
def test_flip_stream_device_golden(name, iid0, icc0, switch_at, want_trail,
                                   ref_harness):
    """Flip streams through the flip-capable device scan match both the
    numpy behavioral reference and the reference C decoder <=2 LSB."""
    import subprocess

    from heaac_tpu import decode_adts
    from heaac_tpu.codec.batch import (decode_qwire_flip_stream,
                                       parse_stream_qwire)

    he = _flip_stream(ref_harness, 5, iid0, icc0, switch_at)
    trail: list = []
    parse_stream_qwire(he, is34_out=trail)
    # collapse runs to verify the flip schedule actually materialised
    runs = [trail[0]] + [b for a, b in zip(trail, trail[1:]) if a != b]
    assert tuple(runs) == want_trail, f"mode trail {trail}"

    pcm_dev = decode_qwire_flip_stream(he)
    pcm_np, rate = decode_adts(he)
    assert rate == 48000
    n = min(len(pcm_dev), len(pcm_np))
    d = np.abs(pcm_dev[:n].astype(int) - pcm_np[:n].astype(int)).max()
    assert d <= 2, f"device flip scan vs numpy: max LSB {d}"

    path = STREAMS / f"{name}.heaac"
    path.write_bytes(he)
    gold_path = STREAMS / f"{name}.heaac.gold"
    subprocess.run([ref_harness["decode"], str(path), str(gold_path)],
                   check=True, capture_output=True)
    gold = np.fromfile(gold_path, np.int16).reshape(-1, 2)
    n = min(len(pcm_dev), len(gold))
    d = np.abs(pcm_dev[:n].astype(int) - gold[:n].astype(int)).max()
    assert d <= 2, f"device flip scan vs reference: max LSB {d}"


@pytest.mark.golden
def test_decode_batch_routes_flip_streams(ref_harness, caplog):
    """decode_batch sends a demoted flip stream through the flip scan
    (device), not the numpy single-stream decoder, and the rest of its
    bucket still decodes batched."""
    import logging

    from heaac_tpu import decode_adts
    from heaac_tpu.codec.batch import decode_batch
    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    he_flip = _flip_stream(ref_harness, 3, 1, 1, {6: (1, 2)})
    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    psw = PsStreamWriter(seed=2, iid_mode=1, icc_mode=1)
    he_plain = splice_sbr_into_lc(
        core, SbrStreamWriter(core_rate=24000, is_cpe=False,
                              env_hi_shift=-12, seed=9, invf_modes=(0,),
                              ps_writer=psw))
    with caplog.at_level(logging.INFO, logger="heaac_tpu"):
        results = decode_batch([he_plain, he_flip, he_plain])
    assert any("band-mode-flip scan" in r.message for r in caplog.records)
    assert not any("single-stream decoder" in r.message
                   for r in caplog.records)
    for data, out in zip([he_plain, he_flip, he_plain], results):
        ref, _ = decode_adts(data)
        n = min(len(ref), len(out))
        d = np.abs(out[:n].astype(int) - ref[:n].astype(int)).max()
        assert d <= 2, f"max LSB {d}"


def test_non_flip_streams_still_reject():
    """Without the flip opt-in, the planner keeps rejecting mid-stream
    band-mode changes (static-graph paths must not mis-decode them)."""
    from heaac_tpu.codec.batch import parse_stream_qwire
    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    # core availability without the oracle: synthesize with our encoder
    from heaac_tpu.codec.encoder import AacEncoder
    rng = np.random.default_rng(0)
    t = np.arange(int(24000 * 0.8)) / 24000
    pcm = np.clip(900 * np.sin(2 * np.pi * 600 * t)
                  + 30 * rng.standard_normal(len(t)),
                  -32768, 32767).astype(np.int16)
    core = AacEncoder(24000, 1, bitrate=32000,
                      window_switching=False).encode(pcm)
    psw = PsStreamWriter(seed=1, iid_mode=1, icc_mode=1,
                         switch_at={4: (1, 2)})
    he = splice_sbr_into_lc(
        core, SbrStreamWriter(core_rate=24000, is_cpe=False,
                              env_hi_shift=-12, seed=2, invf_modes=(0,),
                              grid_classes=(0,), fix_num_env=1,
                              ps_writer=psw))
    with pytest.raises(NotImplementedError, match="band mode"):
        parse_stream_qwire(he)


@pytest.mark.golden
def test_flip_with_after_imdct_cce(ref_harness):
    """A stream that both flips its PS band mode mid-stream AND carries
    an AFTER_IMDCT (point-3) CCE decodes on device through the combined
    flip+couple scan (qwire_scan_decoder_flip_couple) — previously this
    combination demoted to the numpy single-stream path.  The coupling
    mixes at the output rate after the flip-capable scan, exactly where
    the reference applies apply_independent_coupling after ff_sbr_apply
    (aacdec.c:1919-1929)."""
    import subprocess

    from heaac_tpu import decode_adts
    from heaac_tpu.bitstream.aac_syntax import T as TT
    from heaac_tpu.codec.batch import (decode_qwire_flip_stream,
                                       parse_stream_qwire)
    from heaac_tpu.io.heaac_testgen import (SbrStreamWriter, PsStreamWriter,
                                            splice_cce_into_lc,
                                            splice_sbr_multi)

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    cce = splice_cce_into_lc(core, coupling_point="after")
    psw = PsStreamWriter(seed=5, iid_mode=1, icc_mode=1,
                         switch_at={6: (1, 2)})
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=11, invf_modes=(0,), grid_classes=(0,),
                        fix_num_env=1, ps_writer=psw)
    he = splice_sbr_multi(cce, {(TT.TYPE_SCE, 0): w})

    # the flip schedule AND the coupling must both materialise
    trail: list = []
    info: dict = {}
    parse_stream_qwire(he, is34_out=trail, info_out=info)
    runs = [trail[0]] + [b for a, b in zip(trail, trail[1:]) if a != b]
    assert tuple(runs) == (0, 1), f"mode trail {trail}"
    assert info["couple"] is not None, "point-3 CCE edges missing"

    pcm_dev = decode_qwire_flip_stream(he)
    pcm_np, rate = decode_adts(he)
    assert rate == 48000
    assert pcm_dev.shape[1] == pcm_np.shape[1]
    n = min(len(pcm_dev), len(pcm_np))
    d = np.abs(pcm_dev[:n].astype(int) - pcm_np[:n].astype(int)).max()
    assert d <= 2, f"flip+couple scan vs numpy: max LSB {d}"

    path = STREAMS / "flip_cce.heaac"
    path.write_bytes(he)
    gold_path = STREAMS / "flip_cce.heaac.gold"
    subprocess.run([ref_harness["decode"], str(path), str(gold_path)],
                   check=True, capture_output=True)
    gold = np.fromfile(gold_path, np.int16).reshape(-1, pcm_dev.shape[1])
    n = min(len(pcm_dev), len(gold))
    assert n > 20000
    d = np.abs(pcm_dev[:n].astype(int) - gold[:n].astype(int)).max()
    assert d <= 2, f"flip+couple scan vs reference: max LSB {d}"
