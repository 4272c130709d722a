"""Batched device pipeline vs the single-stream (numpy DSP) decoder.

The fused jitted graph must reproduce the reference-validated numpy path on
generated HE-AACv2 streams.  Runs on CPU in CI (conftest forces cpu).
"""
import numpy as np
import pytest

from heaac_tpu import decode_adts
from heaac_tpu.codec.batch import StreamBatchDecoder

from conftest import STREAMS
from test_golden_sbr import make_core


def _make_stream(ref_harness, seed=3, ps_seed=2, invf=(0,)):
    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=seed, invf_modes=invf,
                        ps_writer=PsStreamWriter(seed=ps_seed))
    return splice_sbr_into_lc(core, w)


@pytest.mark.golden
def test_batch_matches_numpy_path(ref_harness):
    he = _make_stream(ref_harness)
    pcm_np, rate = decode_adts(he)
    bd = StreamBatchDecoder([he, _make_stream(ref_harness, seed=9,
                                              ps_seed=6)], batch=4)
    pcm = np.asarray(bd.decode())           # [T,B,2,2048]
    a = pcm[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(a), len(pcm_np))
    d = np.abs(a[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"batch-vs-numpy max LSB {d.max()}"
    # lane 2 repeats lane 0's stream
    assert np.array_equal(pcm[:, 0], pcm[:, 2])


@pytest.mark.golden
def test_batch_matches_reference(ref_harness, tmp_path):
    import subprocess

    he = _make_stream(ref_harness, seed=21, ps_seed=11, invf=(0,))
    p = tmp_path / "b.aac"
    p.write_bytes(he)
    g = tmp_path / "b.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    bd = StreamBatchDecoder([he], batch=1)
    pcm = np.asarray(bd.decode())[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(pcm), len(gold))
    d = np.abs(pcm[:n].astype(int) - gold[:n].astype(int))
    assert d.max() <= 2, f"batch-vs-reference max LSB {d.max()}"


@pytest.mark.golden
def test_batch_cpe_stereo_sbr(ref_harness):
    """HE-AACv1 stereo (CPE+SBR): 2 lanes per stream through the batched
    graph, PS pass-through."""
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc

    core = make_core(ref_harness, "sbr_core_s24", 24000, 2, 64000, 10)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=True, env_hi_shift=-12, seed=7,
        invf_modes=(0,)))
    pcm_np, rate = decode_adts(he)
    bd = StreamBatchDecoder([he], batch=1)
    assert bd.lanes_per_stream == 2
    pcm = np.asarray(bd.decode())
    st = np.stack([pcm[:, 0, 0].reshape(-1), pcm[:, 1, 0].reshape(-1)], -1)
    n = min(len(st), len(pcm_np))
    d = np.abs(st[:n].astype(int) - pcm_np[:n].astype(int))
    assert d.max() <= 2, f"max LSB {d.max()}"


@pytest.mark.golden
def test_batch_interpol_freq0(ref_harness, tmp_path):
    """interpol_freq=0 envelope estimation (band-grouped) on both paths."""
    import subprocess

    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=13,
        invf_modes=(0,), interpol_freq=0))
    p = tmp_path / "if0.aac"
    p.write_bytes(he)
    g = tmp_path / "if0.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    pcm_np, _ = decode_adts(he)
    n = min(len(pcm_np), len(gold))
    assert np.abs(pcm_np[:n].astype(int) - gold[:n].astype(int)).max() <= 2
    bd = StreamBatchDecoder([he])
    pcm = np.asarray(bd.decode())[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(pcm), len(gold))
    assert np.abs(pcm[:n].astype(int) - gold[:n].astype(int)).max() <= 2


@pytest.mark.golden
def test_batch_ps_34band(ref_harness, tmp_path):
    """34-band PS: the batched graph compiles its own band-mode variant
    (ps_jax is34 specialization) and must match the reference."""
    import subprocess

    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=3,
        invf_modes=(0,),
        ps_writer=PsStreamWriter(seed=4, iid_mode=2, icc_mode=2)))
    p = tmp_path / "p34.aac"
    p.write_bytes(he)
    g = tmp_path / "p34.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    bd = StreamBatchDecoder([he], batch=2)
    assert bd.is34 == 1
    pcm = np.asarray(bd.decode())[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(pcm), len(gold))
    d = np.abs(pcm[:n].astype(int) - gold[:n].astype(int))
    assert d.max() <= 2, f"batch-vs-reference max LSB {d.max()}"


@pytest.mark.golden
def test_batch_downsampled_sbr(ref_harness, tmp_path):
    """Downsampled SBR (explicit ext rate == core rate) in the batched
    graph: 32-band synthesis variant, pcm [T,B,2,1024]."""
    import subprocess

    from heaac_tpu.io.bitwriter import BitWriter
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=3,
        invf_modes=(0,)))
    bw = BitWriter()
    bw.put(5, 5); bw.put(4, 6); bw.put(4, 1); bw.put(4, 6)  # noqa: E702
    bw.put(5, 2); bw.put(3, 0); bw.align()  # noqa: E702
    asc = bw.bytes()
    p = tmp_path / "d.aac"
    p.write_bytes(he)
    g = tmp_path / "d.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g), asc.hex()],
                   check=True, capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    bd = StreamBatchDecoder([he], batch=2, asc=asc)
    assert bd.ds == 1 and bd.sample_rate == 24000
    pcm = np.asarray(bd.decode())
    assert pcm.shape[-1] == 1024
    out = pcm[:, 0].transpose(0, 2, 1).reshape(-1, 2)
    n = min(len(out), len(gold))
    d = np.abs(out[:n].astype(int) - gold[:n].astype(int)).max()
    assert d <= 2, f"downsampled batch-vs-reference max LSB {d}"


@pytest.mark.golden
@pytest.mark.parametrize("point", ["before", "between", "after"])
def test_batch_cce_coupling(point, ref_harness, stream_factory, tmp_path,
                            caplog):
    """CCE through decode_batch stays BATCHED for every coupling point:
    dependent coupling (point 0/1) applies on the host before planning;
    AFTER_IMDCT (point 3) runs as a device post-scan mix over the extra
    CCE lanes (aacdec.c:1849-1862).  Both must match the reference."""
    import logging
    import subprocess

    from heaac_tpu.codec.batch import decode_batch
    from heaac_tpu.io.heaac_testgen import splice_cce_into_lc

    aac, _ = stream_factory("lc_mono_24k", 24000, 1, 32000)
    cce = splice_cce_into_lc(aac.read_bytes(), coupling_point=point)
    p = tmp_path / "c.aac"
    p.write_bytes(cce)
    g = tmp_path / "c.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16)
    with caplog.at_level(logging.WARNING, logger="heaac_tpu"):
        out = decode_batch([cce])[0]
    falls = [r for r in caplog.records
             if "single-stream decoder" in r.getMessage()]
    assert not falls, f"CCE {point} demoted to single-stream: {falls}"
    n = min(len(out), len(gold))
    assert n > 24000
    d = np.abs(out[:n, 0].astype(int) - gold[:n].astype(int)).max()
    assert d <= 2, f"CCE {point} batch-vs-reference max LSB {d}"


@pytest.mark.golden
@pytest.mark.parametrize("point", ["before", "after"])
def test_batch_cce_coupling_sbr(point, ref_harness, tmp_path, caplog):
    """HE (SBR) + CCE through decode_batch stays BATCHED for every
    coupling point.  The reference applies AFTER_IMDCT coupling at the
    2x output rate after ff_sbr_apply on both the pure-upsampled CCE
    channel and the targets (aacdec.c:1919-1929); the qwire path
    expresses this as extra CCE lanes through the full scan plus a
    post-scan device mix (qwire_scan_decoder_couple)."""
    import logging
    import subprocess

    from heaac_tpu.bitstream.aac_syntax import T as TT
    from heaac_tpu.codec.batch import decode_batch
    from heaac_tpu.io.heaac_testgen import (SbrStreamWriter,
                                            splice_cce_into_lc,
                                            splice_sbr_multi)

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    cce = splice_cce_into_lc(core, coupling_point=point)
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=3, invf_modes=(0,))
    he = splice_sbr_multi(cce, {(TT.TYPE_SCE, 0): w})
    p = tmp_path / "hc.aac"
    p.write_bytes(he)
    g = tmp_path / "hc.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    with caplog.at_level(logging.INFO, logger="heaac_tpu"):
        outs = decode_batch([he, he])
    falls = [r for r in caplog.records
             if "single-stream decoder" in r.getMessage()]
    assert not falls, f"HE CCE {point} demoted to single-stream: {falls}"
    if point == "after":
        # independent (point 3) CCE parses through the NATIVE front-end
        # (hh_parse_cce); only dependent coupling may use the Python
        # planner (spectral modification relative to TNS)
        planner = [r for r in caplog.records
                   if "Python planner" in r.getMessage()]
        assert not planner, f"point-3 CCE left the native path: {planner}"
    for out in outs:
        assert out.shape[1] == 2
        n = min(len(out), len(gold))
        assert n > 20000
        d = np.abs(out[:n].astype(int) - gold[:n].astype(int)).max()
        assert d <= 2, f"HE CCE {point} batch-vs-reference max LSB {d}"


@pytest.mark.golden
def test_heterogeneous_decode_batch(ref_harness):
    """decode_batch buckets mixed-profile streams and matches the
    single-stream decoder on every lane."""
    from heaac_tpu.codec.batch import decode_batch
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, PsStreamWriter, \
        splice_sbr_into_lc
    from test_golden_lc import CONFIGS  # noqa: F401

    lc_core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    he = splice_sbr_into_lc(lc_core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=3,
        invf_modes=(0,), ps_writer=PsStreamWriter(seed=2)))
    streams = [lc_core, he, lc_core]
    res = decode_batch(streams)
    for s, out in zip(streams, res):
        ref, _ = decode_adts(s)
        n = min(len(out), len(ref))
        assert out.shape[1] == ref.shape[1]
        assert np.abs(out[:n].astype(int) - ref[:n].astype(int)).max() <= 2


@pytest.mark.golden
def test_sharded_stream_batch(ref_harness):
    """ShardedStreamBatchDecoder over the 8-virtual-device CPU mesh must
    produce exactly the single-device batched output (SURVEY.md §2.5)."""
    import jax

    from heaac_tpu.parallel.sharding import ShardedStreamBatchDecoder

    assert len(jax.devices()) == 8
    he = _make_stream(ref_harness)
    plain = StreamBatchDecoder([he], batch=8)
    want = np.asarray(plain.decode())
    sharded = ShardedStreamBatchDecoder([he], batch=8)
    got = np.asarray(sharded.decode())
    assert got.shape == want.shape
    # partition-dependent matmul schedules may differ by a last-ulp
    # rounding; the int16 output tolerates 1 LSB
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 1, f"sharded-vs-single max LSB {d.max()}"


@pytest.mark.golden
def test_mixed_length_batch(ref_harness):
    """A batch mixing stream lengths must decode every stream in full:
    shorter streams are padded with silence plans and trimmed back to
    their true frame counts (advisor fix: no min-T truncation)."""
    from heaac_tpu.bitstream.adts import split_adts_stream
    from heaac_tpu.codec.batch import decode_batch

    he_long = _make_stream(ref_harness)
    short = b"".join(split_adts_stream(he_long)[:10])
    res = decode_batch([short, he_long])
    ref_long, _ = decode_adts(he_long)
    ref_short, _ = decode_adts(short)
    # the long stream must NOT be truncated to the short one's length
    assert len(res[1]) == len(ref_long)
    assert len(res[0]) == len(ref_short)
    for out, ref in zip(res, (ref_short, ref_long)):
        d = np.abs(out.astype(int) - ref.astype(int))
        assert d.max() <= 2, f"mixed-length batch max LSB {d.max()}"


@pytest.mark.golden
def test_sharded_qwire_decoder(ref_harness):
    """The quantized-wire pipeline sharded over the 8-virtual-device dp
    mesh (replicated heap, lane-sharded records/carry, zero collectives)
    must match the unsharded qwire decode."""
    from heaac_tpu.codec.batch import QwirePipelinedDecoder
    from heaac_tpu.parallel.sharding import ShardedQwireDecoder, make_mesh

    streams = [_make_stream(ref_harness, seed=s, ps_seed=s + 1)
               for s in (61, 62)] * 4                     # 8 lanes
    ref = [np.asarray(o) for o in
           QwirePipelinedDecoder(streams, group_streams=8).decode()]
    sh = ShardedQwireDecoder(streams, mesh=make_mesh(8), group_streams=8)
    got = [np.asarray(o) for o in sh.decode()]
    assert len(ref) == len(got) == 1
    d = np.abs(ref[0].astype(int) - got[0].astype(int))
    assert d.max() <= 1, f"sharded-vs-unsharded max LSB {d.max()}"


@pytest.mark.golden
def test_sharded_qwire_cce(ref_harness, tmp_path):
    """AFTER_IMDCT CCE over the dp mesh: the couple-variant scan's
    post-scan mix gathers the CCE source lane cross-shard; output must
    match the reference like the unsharded path."""
    import subprocess

    from heaac_tpu.bitstream.aac_syntax import T as TT
    from heaac_tpu.io.heaac_testgen import (SbrStreamWriter,
                                            splice_cce_into_lc,
                                            splice_sbr_multi)
    from heaac_tpu.parallel.sharding import ShardedQwireDecoder, make_mesh

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    cce = splice_cce_into_lc(core, coupling_point="after")
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=3, invf_modes=(0,))
    he = splice_sbr_multi(cce, {(TT.TYPE_SCE, 0): w})
    p = tmp_path / "sc.aac"
    p.write_bytes(he)
    g = tmp_path / "sc.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g)], check=True,
                   capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    streams = [he] * 4                       # 2 lanes each -> 8 lanes
    sh = ShardedQwireDecoder(streams, mesh=make_mesh(8), group_streams=4)
    pcm = np.asarray(sh.decode()[0])         # [T, 8, 2, 2048]
    for b in range(4):
        out = pcm[:, b * 2].transpose(0, 2, 1).reshape(-1, 2)
        n = min(len(out), len(gold))
        assert n > 20000
        d = np.abs(out[:n].astype(int) - gold[:n].astype(int)).max()
        assert d <= 2, f"sharded CCE stream {b} max LSB {d}"


def test_decode_batch_bisect_isolates_offender(ref_harness, monkeypatch):
    """One stream the batched path cannot handle must demote only itself;
    the rest of its bucket stays on the batched path (VERDICT r2 #6)."""
    import heaac_tpu.codec.batch as B

    streams = [_make_stream(ref_harness, seed=30 + k, ps_seed=40 + k)
               for k in range(4)]
    bad_idx = 2
    orig = B._decode_bucket
    calls = []

    def flaky(kind, group, idxs, streams_, results):
        calls.append(tuple(idxs))
        if bad_idx in idxs:
            raise RuntimeError("synthetic planner failure")
        return orig(kind, group, idxs, streams_, results)

    monkeypatch.setattr(B, "_decode_bucket", flaky)
    res = B.decode_batch(streams)
    ref = [np.asarray(B.decode_batch([s])[0]) for s in streams]
    # every stream decoded; the offender went single-stream, others batched
    for i in range(4):
        assert res[i] is not None and len(res[i]) > 0
    batched = {i for c in calls for i in c if bad_idx not in c}
    assert batched == {0, 1, 3}, f"healthy streams not batched: {calls}"
