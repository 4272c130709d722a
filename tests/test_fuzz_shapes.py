"""Corruption fuzz parametrized over the native front-end's element
shapes (VERDICT r4 #6): the round-4/5 wire ships RAW BIT REGIONS that
native length-walkers (walk_envelope/walk_noise, walk_scalefactors) and
the device Huffman decoders consume, so every element shape that can
carry a raw region gets its own corruption sweep targeting the frame
BODY bytes (where the dtdf..noise / sf..spectral regions live), not
just the headers.

Contract under corruption (the reference's overread guards,
aacdec.c:112,739 / aacsbr.c:287-301): no crash, no native OOB (ASan
sweep via tools/asan_native.sh covers the same corpus), clean partner
lanes bit-stable, corrupt lanes still return output.

Trials per shape default to 20 (one ADTS frame is ~200-400 B; each
trial corrupts 1-3 body bytes); raise with HEAAC_FUZZ_TRIALS for a CI
soak.
"""
import os

import numpy as np
import pytest

from heaac_tpu.codec.batch import decode_batch
from heaac_tpu.codec.encoder import AacEncoder

TRIALS = int(os.environ.get("HEAAC_FUZZ_TRIALS", "12"))


def _pcm(seed, n, ch=1, transient=False):
    rng = np.random.default_rng(seed)
    sr = 24000
    t = np.arange(n) / sr
    x = 0.3 * np.sin(2 * np.pi * 700 * t) \
        + 0.02 * rng.standard_normal(n)
    if transient:
        x[n // 3:n // 3 + 256] += 0.6 * rng.standard_normal(256)
        x[2 * n // 3:2 * n // 3 + 256] += 0.6
    x = np.clip(x * 3000, -32768, 32767).astype(np.int16)
    return np.stack([x] * ch, -1) if ch > 1 else x


def _core(seed, ch=1, transient=False, object_type=2, ws=False):
    return AacEncoder(24000, ch, bitrate=48000 * ch,
                      object_type=object_type,
                      window_switching=ws).encode(
        _pcm(seed, int(24000 * 1.2), ch, transient))


def _stream(shape: str) -> bytes:
    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_cce_into_lc,
                                            splice_sbr_into_lc)
    if shape == "sce":
        return splice_sbr_into_lc(_core(3), SbrStreamWriter(
            core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=7,
            invf_modes=(0,)))
    if shape == "cpe_coupled":
        return splice_sbr_into_lc(_core(4, ch=2), SbrStreamWriter(
            core_rate=24000, is_cpe=True, coupling=True,
            env_hi_shift=-12, seed=9, invf_modes=(0,)))
    if shape == "short":
        return splice_sbr_into_lc(_core(5, transient=True, ws=True),
                                  SbrStreamWriter(
            core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=11,
            invf_modes=(0,)))
    if shape == "main":
        return _core(6, object_type=1)
    if shape == "cce":
        return splice_cce_into_lc(_core(8), coupling_point="before")
    if shape == "ps":
        return splice_sbr_into_lc(_core(12), SbrStreamWriter(
            core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=13,
            invf_modes=(0,), ps_writer=PsStreamWriter(seed=5)))
    raise AssertionError(shape)


SHAPES = ["sce", "cpe_coupled", "short", "main", "cce", "ps"]


@pytest.mark.parametrize("shape", SHAPES)
def test_fuzz_body_corruption(shape):
    """Corrupt 1-3 bytes in random frame BODIES (past the first frame's
    header, biased away from ADTS headers by hitting mid-frame offsets):
    the batch must neither crash nor contaminate the clean partner."""
    he = _stream(shape)
    clean = decode_batch([he])[0]
    assert clean is not None and len(clean)
    rng = np.random.default_rng(hash(shape) & 0xFFFF)
    for trial in range(TRIALS):
        bad = bytearray(he)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(9, len(bad)))
            bad[pos] ^= int(rng.integers(1, 256))
        out = decode_batch([he, bytes(bad)])
        got = out[0]
        n = min(len(got), len(clean))
        d = np.abs(got[:n].astype(int) - clean[:n].astype(int))
        assert n and d.max() <= 2, \
            f"{shape} trial {trial}: clean lane contaminated ({d.max()})"
        assert out[1] is not None
