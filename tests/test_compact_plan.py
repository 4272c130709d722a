"""Compact wire-plan equivalence: the ~3 KB/frame-lane compact records
(codec/compact_plan.py), expanded on device, must reproduce the dense
frame_plan tensors and the decoded PCM bit-for-bit."""
import numpy as np
import pytest

from heaac_tpu.bitstream.adts import split_adts_stream
from heaac_tpu.codec import batch as batch_mod
from heaac_tpu.codec import compact_plan, frame_plan

from conftest import STREAMS, gen_pcm


def _make_he(ref_harness, name: str, is_cpe=False, **kw):
    import subprocess

    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc

    sr, ch, br = 24000, 2 if is_cpe else 1, 64000 if is_cpe else 32000
    aac = STREAMS / f"cmpct_core_{ch}.aac"
    if not aac.exists():
        raw = STREAMS / f"cmpct_core_{ch}.pcm"
        gen_pcm(raw, sr, ch, seconds=1.5, seed=23)
        pcm = np.fromfile(raw, np.int16)
        (pcm // 3).astype(np.int16).tofile(raw)
        subprocess.run([ref_harness["encode"], str(raw), str(sr), str(ch),
                        str(br), str(aac)], check=True)
    core = b"".join(split_adts_stream(aac.read_bytes())[:12])
    w = SbrStreamWriter(core_rate=sr, is_cpe=is_cpe, env_hi_shift=-12, **kw)
    return splice_sbr_into_lc(core, w)


CONFIGS = [
    ("mono_ps", dict(seed=2, invf_modes=(0,))),
    ("mono_ps_ipdopd", dict(seed=6, invf_modes=(0, 1, 2, 3))),
    ("mono_allgrids", dict(seed=3, invf_modes=(0, 2))),
    ("cpe_coupled", dict(seed=9, coupling=True, invf_modes=(0, 1))),
]


def _cfg(name, kw, ref_harness):
    from heaac_tpu.io.heaac_testgen import PsStreamWriter

    kw = dict(kw)
    if name == "mono_ps":
        kw["ps_writer"] = PsStreamWriter(seed=2, iid_mode=1, icc_mode=1)
    elif name == "mono_ps_ipdopd":
        kw["ps_writer"] = PsStreamWriter(seed=6, iid_mode=1, icc_mode=4,
                                         enable_ipdopd=True)
    is_cpe = name.startswith("cpe")
    return _make_he(ref_harness, name, is_cpe=is_cpe, **kw)


@pytest.mark.golden
@pytest.mark.parametrize("name,kw", CONFIGS)
def test_sbr_expansion_matches_dense(name, kw, ref_harness):
    """Field-level: jitted expand_sbr(compact) == dense build_sbr_plan."""
    import jax

    he = _cfg(name, kw, ref_harness)
    dense = batch_mod.parse_stream_plans(he, compact=False)
    comp = batch_mod.parse_stream_plans(he, compact=True)
    T, nl = dense[0]["coeffs"].shape[:2]
    assert comp[0]["coeffs"].shape[:2] == (T, nl)
    np.testing.assert_array_equal(dense[0]["coeffs"], comp[0]["coeffs"])

    expand = jax.jit(compact_plan.expand_sbr)
    for t in range(T):
        sc = {k: comp[1][k][t] for k in ("sc_i", "sc_b", "sc_f")}
        got = jax.device_get(expand(sc))
        for fname in frame_plan.SbrChannelPlan.__dataclass_fields__:
            want = dense[1][fname][t]
            np.testing.assert_array_equal(
                np.asarray(got[fname]), want,
                err_msg=f"{name}: frame {t} field {fname}")


@pytest.mark.golden
@pytest.mark.parametrize("name,kw", CONFIGS)
def test_compact_pcm_bit_identical(name, kw, ref_harness):
    """End-to-end: batch decode via compact wire plans == dense plans."""
    he = _cfg(name, kw, ref_harness)
    pcm_d = np.asarray(
        batch_mod.StreamBatchDecoder([he], compact=False).decode())
    pcm_c = np.asarray(
        batch_mod.StreamBatchDecoder([he], compact=True).decode())
    np.testing.assert_array_equal(pcm_c, pcm_d)


@pytest.mark.golden
def test_pipelined_matches_batch(ref_harness):
    """PipelinedStreamBatchDecoder (packed-record native parse + grouped
    async dispatch) matches StreamBatchDecoder within 1 LSB.

    The packed graph unpacks its inputs from the f32 wire record inside
    the jit; XLA's layout/vectorization choices for that graph differ from
    the compact-dict graph by ±1 ULP on a few samples (both are anchored
    to the reference oracle by the golden suite), so the gate here is
    <=1 LSB, with the native-vs-python record equality tested bit-exactly
    in test_native_he.py."""
    streams = []
    for i, (name, kw) in enumerate(CONFIGS[:2]):
        for seed_shift in (0, 100, 200):
            kw2 = dict(kw)
            kw2["seed"] = kw2.get("seed", 1) + seed_shift
            streams.append(_cfg(name, kw2, ref_harness))
    ref = np.asarray(
        batch_mod.StreamBatchDecoder(streams, compact=True).decode())
    pd = batch_mod.PipelinedStreamBatchDecoder(streams, group_streams=2)
    outs = [np.asarray(o) for o in pd.decode()]
    got = np.concatenate(outs, axis=1)[:, :ref.shape[1]]
    d = np.abs(got.astype(np.int64) - ref.astype(np.int64))
    assert d.max() <= 1, f"max LSB {d.max()} ({np.count_nonzero(d)} samples)"
    assert pd.frame_counts == [ref.shape[0]] * len(streams)


@pytest.mark.golden
def test_pipelined_golden(ref_harness):
    """Pipelined end-to-end decode vs the reference oracle directly."""
    import subprocess

    name, kw = CONFIGS[0]
    he = _cfg(name, kw, ref_harness)
    p = STREAMS / "pipelined_golden.heaac"
    p.write_bytes(he)
    g = STREAMS / "pipelined_golden.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    pd = batch_mod.PipelinedStreamBatchDecoder([he], group_streams=1)
    pcm = np.asarray(pd.decode()[0])          # [T, 1, 2, 2048]
    out = pcm[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(out), len(gold))
    d = np.abs(out[:n].astype(int) - gold[:n].astype(int)).max()
    assert d <= 2, f"max LSB {d}"


@pytest.mark.golden
def test_compact_wire_size(name="mono_ps_ipdopd"):
    """The headline claim: compact wire format is ~20x smaller per
    frame-lane than the dense tensors (VERDICT round-1 item 3)."""
    comp_bytes = (compact_plan.SC_I_N * 4 + compact_plan.SC_B_N
                  + compact_plan.SC_F_N * 4 + compact_plan.PC_I_N * 4
                  + compact_plan.PC_B_N)
    zp = frame_plan._zeros_plan()
    dense_bytes = sum(
        np.asarray(getattr(zp, f)).nbytes
        for f in frame_plan.SbrChannelPlan.__dataclass_fields__)
    dense_bytes += sum(np.asarray(v).nbytes
                       for v in frame_plan.build_ps_plan(None, 64).values())
    assert comp_bytes <= 3600, comp_bytes
    assert dense_bytes / comp_bytes > 15, (dense_bytes, comp_bytes)
