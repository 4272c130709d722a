"""Parallel spectral-Huffman device decode (ops/spec_huff.py) vs a direct
host computation, over randomized sections exercising every codebook,
sign-bit packing, cb11 escapes, and the raw sf-huffman prefix chain
(full +-60 delta range)."""
import numpy as np
import pytest

from heaac_tpu.ops import spec_huff as SH
from heaac_tpu.tables import aac_tables as T
from heaac_tpu.tables.aac_tables import cbrt_tab, pow2sf_tab


def make_lane(rng, sampling_index):
    """Random legal (sections, sf walk, values) -> (spec block bytes, w3,
    expected [1024] f32)."""
    off = T.swb_offset_1024(sampling_index)
    ns = T.num_swb_1024(sampling_index)
    max_sfb = int(rng.integers(ns // 2, ns + 1))
    # random section partition of [0, max_sfb)
    cuts = sorted(set([0, max_sfb]) | set(
        int(x) for x in rng.integers(1, max_sfb, rng.integers(0, 8))))
    secs = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        cb = int(rng.choice([0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]))
        secs.append((cb, a, b))
    if len(secs) > SH.SEC_MAX:
        secs = secs[:SH.SEC_MAX]
        secs[-1] = (secs[-1][0], secs[-1][1], max_sfb)

    bw_all = []
    expected = np.zeros(1024, np.float32)
    cbrt = cbrt_tab()
    pow2 = pow2sf_tab()
    sfc, sfb = T.scalefactor_codes()
    sf_bw = SH.BitWriter()
    sfidx0 = 0
    sections = []
    cur_sf = None
    for cb, a, b in secs:
        nsfb = b - a
        if cb == 0:
            sections.append((0, nsfb, 0))
            continue
        dim, lav, signed = T.CODEBOOK_INFO[cb]
        lo = int(off[a])
        hi = int(off[b])
        nvals = hi - lo
        if cb == 11:
            q = rng.integers(-40, 41, nvals)
            big = rng.random(nvals) < 0.1
            q[big] = rng.choice([-1, 1], big.sum()) \
                * rng.integers(16, 8192, big.sum())
        elif signed:
            q = rng.integers(-lav, lav + 1, nvals)
        else:
            q = rng.choice([-1, 1], nvals) * rng.integers(0, lav + 1, nvals)
        # per-sfb scalefactors (random walk, full vlc +-60 range)
        for f in range(a, b):
            step = 0 if cur_sf is None else int(rng.integers(-60, 61))
            nsf = 200 if cur_sf is None else \
                int(np.clip(cur_sf + step, 150, 427))
            if cur_sf is None:
                sfidx0 = nsf
                d = 0      # first code is vs global_gain: value ignored
            else:
                d = nsf - cur_sf
            sf_bw.put(int(sfc[d + 60]), int(sfb[d + 60]))
            w0, w1 = int(off[f]), int(off[f + 1])
            sfv = -np.float32(pow2[nsf])
            for p in range(w0, w1):
                v = int(q[p - lo])
                if v:
                    mag = np.float32(cbrt[abs(v)])
                    expected[p] = np.float32(
                        (-mag if v < 0 else mag) * sfv)
            cur_sf = nsf
        bw = SH.BitWriter()
        SH.encode_section(bw, cb, q)
        bw_all.append((len(bw.bits), bw.tobytes(), cb, nsfb))
        sections.append((cb, nsfb, len(bw.bits)))

    # raw bits: ``phase`` lead-in bits, the sf region, the 3 pulse/tns/
    # gain gate bits, then the section bit strings (the wire ships the
    # byte-aligned source slice verbatim; lead-in and gate bits are
    # random to prove the device skips without reading them)
    # derived (not rng-drawn: lane content must not depend on them)
    phase = (sfidx0 + len(sf_bw.bits)) % 8
    allbits = SH.BitWriter()
    for k in range(phase):
        allbits.put((sfidx0 >> k) & 1, 1)
    allbits.bits.extend(sf_bw.bits)
    allbits.put(sfidx0 & 7, 3)                      # gate bits (skipped)
    for nb, by, cb, _ in bw_all:
        for i in range(nb):
            allbits.put((by[i >> 3] >> (7 - (i & 7))) & 1, 1)
    nbits = len(allbits.bits) - len(sf_bw.bits) - phase - 3
    block, w3 = SH.pack_spec_block(sections, sfidx0, allbits.tobytes(),
                                   nbits, phase=phase)
    return block, w3, expected


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("si", [3, 6, 8])   # 48 / 24 / 16 kHz swb tables
def test_spec_huff_random(seed, si):
    import jax

    rng = np.random.default_rng(100 * seed + si)
    B = 6
    heap = bytearray()
    offs, w3s, refs = [], [], []
    for _ in range(B):
        block, w3, exp = make_lane(rng, si)
        offs.append(len(heap))
        heap += block
        w3s.append(w3)
        refs.append(exp)
    harr = np.frombuffer(bytes(heap) + b"\0" * 8, np.uint8).astype(np.int32)
    NBITS = 1 << int(np.ceil(np.log2(max(
        (w3 & 0x1FFF) for w3 in w3s) + 1)))
    fn = jax.jit(lambda h, o, w: SH.decode_spec_jax(h, o, w, si, NBITS))
    got = np.asarray(fn(harr, np.asarray(offs, np.int32),
                        np.asarray(w3s, np.int32)))
    ref = np.stack(refs)
    np.testing.assert_array_equal(
        got.view(np.int32), ref.view(np.int32))


def test_spec_huff_token_lane_is_zero():
    """w3 == 0 (token-mode lane) must decode to silence."""
    import jax
    harr = np.arange(64, dtype=np.int32) % 256
    got = np.asarray(jax.jit(
        lambda h: SH.decode_spec_jax(h, np.zeros(2, np.int32),
                                     np.zeros(2, np.int32), 6, 256))(harr))
    assert not got.any()
