"""Native whole-stream front-end beyond chan_config 1/2 (VERDICT r2 #2):
5.1 HE-AAC and config-0 (in-band PCE) streams must decode through the
native qwire path with no Python-planner fallback, matching the
Python-planner reference decode exactly."""
import logging

import numpy as np
import pytest


def _make_51_core(ref_harness, rate=24000, br=192000, seconds=1.5):
    """6-channel LC core via the reference encoder (config 6).

    Spectrally-rich quiet content (conftest.gen_pcm / 3), like the other
    SBR goldens: pure tones leave SBR bands with ~zero energy where the
    gain calculation becomes 0/0-chaotic, and loud cores hit the
    reference's wrapping int16 conversion (dsputil.c:3972)."""
    import pathlib
    import subprocess
    import tempfile

    from conftest import gen_pcm
    d = pathlib.Path(tempfile.mkdtemp())
    gen_pcm(d / "in.pcm", rate, 6, seconds=seconds, seed=17)
    pcm = np.fromfile(d / "in.pcm", np.int16)
    (pcm // 3).astype(np.int16).tofile(d / "in.pcm")
    out = d / "core.aac"
    subprocess.run([str(ref_harness["encode"]), str(d / "in.pcm"),
                    str(rate), "6", str(br), str(out)],
                   check=True, capture_output=True)
    return out.read_bytes()


def _decode_both(he, caplog):
    """native qwire decode + pure-python-planner decode through the SAME
    compiled graph -> (nat, ref).  Identical wire inputs must give
    bit-identical PCM; separately-compiled graphs (the dense scan) are
    only float-close, so the python side also uses the qwire graph."""
    from heaac_tpu import native
    from heaac_tpu.codec.batch import (QStreamBatchDecoder,
                                       QwirePipelinedDecoder)

    assert native.available()
    orig = native.available
    native.available = lambda: False   # reference side: python planner
    try:
        ref = np.asarray(QStreamBatchDecoder([he]).decode())
    finally:
        native.available = orig
    with caplog.at_level(logging.INFO, logger="heaac_tpu"):
        dec = QwirePipelinedDecoder([he])
        nat = np.asarray(dec.decode()[0])
    fallbacks = [r for r in caplog.records
                 if "fell back to the Python planner" in r.getMessage()]
    assert not fallbacks, "native qwire path fell back"
    return nat, ref


def _oracle_check(he, nat, ref_harness, nch, bound=2):
    """Reference C decoder comparison (lane order == output order)."""
    import pathlib
    import subprocess
    import tempfile
    d = pathlib.Path(tempfile.mkdtemp())
    (d / "a.aac").write_bytes(he)
    subprocess.run([str(ref_harness["decode"]), str(d / "a.aac"),
                    str(d / "o.pcm")], check=True, capture_output=True)
    gold = np.fromfile(d / "o.pcm", np.int16).reshape(-1, nch)
    pcm = nat[:, :, 0].transpose(0, 2, 1).reshape(-1, nch)
    n = min(len(pcm), len(gold))
    assert n > 0
    diff = np.abs(pcm[:n].astype(int) - gold[:n].astype(int))
    assert diff.max() <= bound, f"vs oracle max LSB {diff.max()}"


@pytest.mark.golden
def test_native_51_he(ref_harness, caplog):
    """5.1 HE (SBR on every SCE/CPE, bare LFE) through the native path."""
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_multi
    from heaac_tpu.tables import aac_tables as T

    core = _make_51_core(ref_harness)
    writers = {
        (T.TYPE_CPE, 0): SbrStreamWriter(core_rate=24000, is_cpe=True,
                                         env_hi_shift=-12, seed=11,
                                         invf_modes=(0,)),
        (T.TYPE_SCE, 0): SbrStreamWriter(core_rate=24000, is_cpe=False,
                                         env_hi_shift=-12, seed=12,
                                         invf_modes=(0,)),
        (T.TYPE_CPE, 1): SbrStreamWriter(core_rate=24000, is_cpe=True,
                                         env_hi_shift=-12, seed=13,
                                         invf_modes=(0,)),
    }
    he = splice_sbr_multi(core, writers)
    nat, ref = _decode_both(he, caplog)
    assert nat.shape == ref.shape and nat.shape[2] == 2
    d = np.abs(nat.astype(int) - ref.astype(int))
    assert d.max() <= 1, f"5.1 native-vs-python max LSB {d.max()}"
    _oracle_check(he, nat, ref_harness, 6)


@pytest.mark.golden
def test_native_config0_pce_he(ref_harness, caplog):
    """config-0 (in-band PCE) mono HE-AACv2 through the native path."""
    from test_golden_sbr import make_core

    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc,
                                            to_pce_config0)

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    core0 = to_pce_config0(core)
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=21, invf_modes=(0,),
                        ps_writer=PsStreamWriter(seed=22))
    he = splice_sbr_into_lc(core0, w)
    nat, ref = _decode_both(he, caplog)
    d = np.abs(nat.astype(int) - ref.astype(int))
    assert d.max() <= 1, f"config-0 native-vs-python max LSB {d.max()}"


@pytest.mark.golden
def test_native_51_lc_vs_reference(ref_harness, caplog):
    """Plain 5.1 LC through the native qwire path vs the reference C
    decoder (channel order per the reference layout)."""
    import subprocess
    import pathlib
    import tempfile

    core = _make_51_core(ref_harness, rate=48000)
    from heaac_tpu import decode_adts
    pcm, rate = decode_adts(core)
    d = pathlib.Path(tempfile.mkdtemp())
    (d / "in.aac").write_bytes(core)
    subprocess.run([str(ref_harness["decode"]), str(d / "in.aac"),
                    str(d / "out.pcm")], check=True, capture_output=True)
    gold = np.fromfile(d / "out.pcm", np.int16).reshape(-1, 6)
    n = min(len(pcm), len(gold))
    assert n > rate // 2
    diff = np.abs(pcm[:n].astype(int) - gold[:n].astype(int))
    assert diff.max() <= 2, f"5.1 LC vs reference max LSB {diff.max()}"
