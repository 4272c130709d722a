"""MP4/M4A container layer vs the reference mov.c/movenc.c oracle.

ref_mov (tools/ref_harness/ref_mov.c) drives the reference's own
container code: `mux` runs aac_adtstoasc_bsf + movenc.c over an ADTS
stream, `demux` runs mov.c (ff_mov_read_esds, mov.c:494 + the sample
table walk) and dumps extradata + packets.  Our demuxer must accept
reference-produced files byte-for-byte, and the reference must accept
ours.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from heaac_tpu.io.mp4 import (Mp4Error, demux_m4a, m4a_to_adts, mux_m4a,
                              probe_m4a)


@pytest.fixture(scope="module")
def lc_adts(request):
    factory = request.getfixturevalue("stream_factory")
    aac, _ = factory("mp4_lc_44k", 44100, 2, 96000)
    return aac.read_bytes()


def _ref_mux(ref_harness, adts_path, m4a_path):
    subprocess.run([ref_harness["mov"], "mux", str(adts_path),
                    str(m4a_path)], check=True, capture_output=True)


def _ref_demux(ref_harness, m4a_path, tmp):
    asc_p, fr_p = tmp / "ref.asc", tmp / "ref.frames"
    subprocess.run([ref_harness["mov"], "demux", str(m4a_path),
                    str(asc_p), str(fr_p)], check=True, capture_output=True)
    raw = fr_p.read_bytes()
    frames, o = [], 0
    while o < len(raw):
        n = int.from_bytes(raw[o:o + 4], "little")
        frames.append(raw[o + 4:o + 4 + n])
        o += 4 + n
    return asc_p.read_bytes(), frames


@pytest.mark.golden
def test_demux_reference_file(ref_harness, lc_adts, tmp_path):
    """Our demuxer on a file written by the reference muxer extracts the
    identical ASC + access units the reference demuxer does."""
    inp = tmp_path / "in.aac"
    inp.write_bytes(lc_adts)
    m4a = tmp_path / "ref.m4a"
    _ref_mux(ref_harness, inp, m4a)
    data = m4a.read_bytes()
    assert probe_m4a(data)

    t = demux_m4a(data)
    ref_asc, ref_frames = _ref_demux(ref_harness, m4a, tmp_path)
    assert t.asc == ref_asc
    assert t.frames == ref_frames
    assert t.sample_rate == 44100


@pytest.mark.golden
def test_reference_demuxes_our_mux(ref_harness, lc_adts, tmp_path):
    """mov.c accepts files our muxer writes, for single- and multi-chunk
    layouts, and extracts identical ASC + frames."""
    from heaac_tpu.io.adts import adts_to_asc

    asc, frames = adts_to_asc(lc_adts)
    for fpc in (0, 7):       # one chunk; 7-frame chunks w/ short tail
        m4a = tmp_path / f"ours_{fpc}.m4a"
        m4a.write_bytes(mux_m4a(frames, asc, 44100, 2,
                                frames_per_chunk=fpc))
        ref_asc, ref_frames = _ref_demux(ref_harness, m4a, tmp_path)
        assert ref_asc == asc
        assert ref_frames == frames
        t = demux_m4a(m4a.read_bytes())      # and our own multi-chunk walk
        assert (t.asc, t.frames) == (asc, frames)


@pytest.mark.golden
def test_decode_m4a_matches_adts(ref_harness, lc_adts, tmp_path):
    """decode() on the .m4a yields the same PCM as the ADTS front door
    (the m4a rides the ADTS fast path via m4a_to_adts)."""
    from heaac_tpu import decode, decode_adts

    inp = tmp_path / "in.aac"
    inp.write_bytes(lc_adts)
    m4a = tmp_path / "a.m4a"
    _ref_mux(ref_harness, inp, m4a)

    pcm_ref, rate_ref = decode_adts(lc_adts)
    pcm_m4a, rate = decode(m4a.read_bytes())
    assert rate == rate_ref == 44100
    assert np.array_equal(pcm_m4a, pcm_ref)

    # the re-wrap path really is ADTS-representable for this stream
    assert probe_m4a(m4a.read_bytes())
    adts2 = m4a_to_adts(m4a.read_bytes())
    pcm2, _ = decode_adts(adts2)
    assert np.array_equal(pcm2, pcm_ref)


@pytest.mark.golden
def test_decode_m4a_explicit_he_asc(ref_harness, tmp_path):
    """An .m4a whose ASC uses explicit hierarchical SBR signaling (not
    ADTS-representable, mpeg4audio.c:79 explicit path) decodes through
    the ASC-configured Decoder and matches the reference decoder fed the
    same ASC."""
    from heaac_tpu import decode_m4a
    from heaac_tpu.bitstream.adts import split_adts_stream
    from heaac_tpu.io.bitwriter import BitWriter
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc
    from test_golden_sbr import make_core

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 15)
    he = splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=3,
        invf_modes=(0,)))
    bw = BitWriter()
    bw.put(5, 5)    # AOT SBR wrapper
    bw.put(4, 6)    # core 24000
    bw.put(4, 1)    # mono
    bw.put(4, 3)    # ext rate 48000
    bw.put(5, 2)    # AOT LC
    bw.put(3, 0)    # GASpecificConfig flags
    bw.align()
    asc = bw.bytes()

    frames = [f[7:] for f in split_adts_stream(he)]
    m4a = mux_m4a(frames, asc, 48000, 1, frame_samples=2048)
    with pytest.raises(Mp4Error):
        m4a_to_adts(m4a)             # explicit signaling can't re-wrap
    pcm, rate = decode_m4a(m4a)
    assert rate == 48000 and pcm.shape[1] == 2

    # the CLI handles this shape too (probe via the ASC direct path)
    m4a_p = tmp_path / "he.m4a"
    m4a_p.write_bytes(m4a)
    env = dict(os.environ, HEAAC_PLATFORM="cpu")
    r = subprocess.run([sys.executable, "-m", "heaac_tpu.cli", "-i",
                        str(m4a_p), "--probe"], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout)
    assert (info["format"], info["sbr"], info["output_sample_rate"]) == \
        ("m4a", True, 48000)

    p = tmp_path / "he.aac"
    p.write_bytes(he)
    g = tmp_path / "he.gold"
    subprocess.run([ref_harness["decode"], str(p), str(g), asc.hex()],
                   check=True, capture_output=True)
    gold = np.fromfile(g, np.int16).reshape(-1, 2)
    n = min(len(pcm), len(gold))
    assert n > 10000
    d = np.abs(pcm[:n].astype(int) - gold[:n].astype(int)).max()
    assert d <= 2, f"m4a explicit-HE decode vs reference: max LSB {d}"


@pytest.mark.golden
def test_cli_m4a(ref_harness, lc_adts, tmp_path):
    """tpuaac decodes .m4a input and probes it (format field flips)."""
    inp = tmp_path / "in.aac"
    inp.write_bytes(lc_adts)
    m4a = tmp_path / "in.m4a"
    _ref_mux(ref_harness, inp, m4a)
    out = tmp_path / "out.wav"
    env = dict(os.environ, HEAAC_PLATFORM="cpu")
    r = subprocess.run([sys.executable, "-m", "heaac_tpu.cli", "-i",
                        str(m4a), str(out)], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert out.exists() and out.stat().st_size > 100000

    r = subprocess.run([sys.executable, "-m", "heaac_tpu.cli", "-i",
                        str(m4a), "--probe"], capture_output=True,
                       text=True, env=env)
    assert r.returncode == 0, r.stderr
    info = json.loads(r.stdout)
    assert info["format"] == "m4a"
    assert info["core_sample_rate"] == 44100
    assert info["channel_config"] == 2


def test_demux_rejects_garbage():
    assert not probe_m4a(b"\xff\xf1\x00\x00\x00\x00\x00\x00")
    with pytest.raises(Mp4Error):
        demux_m4a(b"\x00\x00\x00\x08ftyp" + b"\x00" * 64)
    with pytest.raises(Mp4Error):       # truncated box
        demux_m4a(b"\x00\x00\xff\xffmoov")


def test_demux_fuzz_robustness():
    """Structured fuzz over the demuxer: truncations, byte flips, and
    targeted hostile sample-table counts must all either parse or raise
    Mp4Error -- never struct.error/IndexError, never an allocation bomb
    (mov.c bounds every table read by atom.size the same way)."""
    import random

    from heaac_tpu.io.adts import make_asc

    asc = make_asc(2, 4, 2)
    frames = [bytes([i & 0xFF] * (20 + 7 * (i % 13))) for i in range(40)]
    good = mux_m4a(frames, asc, 44100, 2, frames_per_chunk=7)
    demux_m4a(good)                       # sanity: the base file parses

    def check(blob):
        try:
            t = demux_m4a(blob)
            # chunks may overlap after mutation (sum can exceed the file),
            # but every individual sample read must have been in bounds
            assert all(len(f) <= len(blob) for f in t.frames)
        except Mp4Error:
            pass

    # every truncation length
    for n in range(0, len(good), 17):
        check(good[:n])
    # deterministic random byte flips (3 per mutant)
    rng = random.Random(0xAAC)
    for _ in range(300):
        b = bytearray(good)
        for _ in range(3):
            b[rng.randrange(len(good))] = rng.randrange(256)
        check(bytes(b))

    # targeted: hostile counts in stsz/stsc/stco must not allocate
    # count*entry memory or read past their boxes
    import struct as st

    def patch_u32(blob, fourcc, field_off, val):
        i = blob.find(fourcc)
        assert i > 0, fourcc
        b = bytearray(blob)
        st.pack_into(">I", b, i + 4 + field_off, val)
        return bytes(b)

    for fourcc, off in ((b"stsz", 8), (b"stsc", 4), (b"stco", 4)):
        hostile = patch_u32(good, fourcc, off, 0x7FFFFFFF)
        with pytest.raises(Mp4Error):
            demux_m4a(hostile)
    # hostile fixed-size stsz: fixed*count far beyond the file
    b = bytearray(good)
    i = b.find(b"stsz")
    st.pack_into(">II", b, i + 8, 0x10000, 0x10000)   # fixed, count
    with pytest.raises(Mp4Error):
        demux_m4a(bytes(b))
