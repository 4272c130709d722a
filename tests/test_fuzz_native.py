"""Corruption fuzz over the native whole-stream parser + qwire pipeline.

The reference decoder's robustness contract is per-frame: every parse
function range-checks and errors out, a bad frame never poisons the
stream (SURVEY.md §5 failure detection).  The native front-end mirrors
that with per-frame silence isolation + ADTS resync; this fuzz drives
randomly corrupted HE streams through the full batched path and asserts
no crash, aligned output shapes, and that clean streams in the same
batch stay bit-identical to their uncorrupted decode.
"""
import numpy as np
import pytest

from heaac_tpu import decode_adts
from heaac_tpu.codec.batch import decode_batch
from heaac_tpu.codec.encoder import AacEncoder


def _he(seed=3):
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, \
        splice_sbr_into_lc
    sr = 24000
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * 1.2)) / sr
    x = 0.3 * np.sin(2 * np.pi * 700 * t) \
        + 0.02 * rng.standard_normal(len(t))
    core = AacEncoder(sr, 1, bitrate=48000,
                      window_switching=False).encode(
        np.clip(x * 3000, -32768, 32767).astype(np.int16))
    return splice_sbr_into_lc(core, SbrStreamWriter(
        core_rate=24000, is_cpe=False, env_hi_shift=-12, seed=7,
        invf_modes=(0,)))


def test_fuzz_byte_corruption_native():
    """30 random single/multi-byte corruptions through decode_batch: no
    crash, and the CLEAN streams sharing the batch stay within the usual
    2-LSB gate of their solo decode (per-lane error isolation, SURVEY.md
    §5; a corrupt partner changes the group's static scan sizes, so the
    graph recompiles and fusion order may shift the odd last ulp)."""
    he = _he()
    clean = decode_batch([he])[0]
    rng = np.random.default_rng(99)
    for trial in range(30):
        bad = bytearray(he)
        for _ in range(int(rng.integers(1, 4))):
            # skip the first header so the batch profile stays decodable
            pos = int(rng.integers(7, len(bad)))
            bad[pos] ^= int(rng.integers(1, 256))
        out = decode_batch([he, bytes(bad), he])
        for k in (0, 2):
            got = out[k]
            n = min(len(got), len(clean))
            d = np.abs(got[:n].astype(int) - clean[:n].astype(int))
            assert n and d.max() <= 2, \
                f"trial {trial}: clean stream {k} contaminated ({d.max()})"
        assert out[1] is not None        # corrupt stream still returns


def test_fuzz_truncation_and_garbage():
    """Truncations and garbage prefixes through decode_batch resync or
    reject cleanly (aac_ac3_parser.c sync-scan behavior)."""
    he = _he(seed=5)
    full, _ = decode_adts(he)
    # truncate mid-frame: whole frames decode, the tail is dropped
    out = decode_batch([he[:len(he) * 2 // 3]])[0]
    assert 0 < len(out) <= len(full)
    # garbage prefix: the splitter resyncs on the first real syncword
    out2 = decode_batch([b"\x12\x34\x56\x78" * 8 + he])[0]
    n = min(len(out2), len(full))
    assert n > 0
    d = np.abs(out2[:n].astype(int) - full[:n].astype(int))
    assert d.max() <= 2
