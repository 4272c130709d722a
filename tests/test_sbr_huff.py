"""Device SBR envelope/noise Huffman decode (ops/sbr_huff) vs the Python
bitstream reference (bitstream/sbr_syntax.read_sbr_envelope/noise).

Streams of sbr_data payloads come from the test-vector writer; every
frame is decoded twice — serially by sbr_syntax (the validated oracle of
aacsbr.c:787-890) and batched by decode_sbr_rows_jax fed only the head
fields a host parser extracts from the grid plus the raw dtdf..noise
region bits — and the integer factor chains must match exactly,
including the cross-frame env_facs[0]/noise_facs[0] delta seeds.
"""
import numpy as np
import pytest

from heaac_tpu.bitstream import sbr_syntax as S
from heaac_tpu.bitstream.reader import BitReader
from heaac_tpu.io.heaac_testgen import SbrStreamWriter
from heaac_tpu.ops import sbr_huff


class _Dec:
    class m4ac:
        ps = False


def parse_frame(payload: bytes, nbits: int, sbr, is_cpe: bool,
                crc: bool):
    """Parse one sbr_data payload with the syntax oracle, capturing the
    dtdf..noise region span the v5 host emitter will ship."""
    br = BitReader(payload)
    if crc:
        br.skip(10)
    if br.get1():
        S.read_sbr_header(sbr, br)
    if sbr.reset:
        S.sbr_make_f_master(sbr, sbr.spectrum_params)
        S.sbr_make_f_derived(sbr)
    if not sbr.start:
        return None
    if not is_cpe:
        if br.get1():
            br.skip(4)
        S.read_sbr_grid(sbr, br, sbr.data[0])
        region_start = br.pos
        S.read_sbr_dtdf(sbr, br, sbr.data[0])
        S.read_sbr_invf(sbr, br, sbr.data[0])
        S.read_sbr_envelope(sbr, br, sbr.data[0], 0)
        S.read_sbr_noise(sbr, br, sbr.data[0], 0)
        region_end = br.pos
        coupled = 0
    else:
        if br.get1():
            br.skip(8)
        sbr.bs_coupling = br.get1()
        assert sbr.bs_coupling, "uncoupled CPE demotes (not raw mode)"
        S.read_sbr_grid(sbr, br, sbr.data[0])
        S.copy_sbr_grid(sbr.data[1], sbr.data[0])
        region_start = br.pos
        S.read_sbr_dtdf(sbr, br, sbr.data[0])
        S.read_sbr_dtdf(sbr, br, sbr.data[1])
        S.read_sbr_invf(sbr, br, sbr.data[0])
        S.read_sbr_envelope(sbr, br, sbr.data[0], 0)
        S.read_sbr_noise(sbr, br, sbr.data[0], 0)
        S.read_sbr_envelope(sbr, br, sbr.data[1], 1)
        S.read_sbr_noise(sbr, br, sbr.data[1], 1)
        region_end = br.pos
        coupled = 1
    d = sbr.data[0]
    ne = int(d.bs_num_env)
    frbits = 0
    for e in range(ne):
        if int(d.bs_freq_res[e + 1]):
            frbits |= 1 << e
    return dict(
        region_start=region_start, region_end=region_end,
        ne=ne, nnoise=int(d.bs_num_noise), frbits=frbits,
        n0=int(sbr.n[0]), n1=int(sbr.n[1]), nq=int(sbr.n_q),
        coupled=coupled, ampres=int(d.bs_amp_res))


def run_stream(writer_kwargs, frames=24, seed=0, crc=False):
    import jax.numpy as jnp

    is_cpe = writer_kwargs.get("is_cpe", False)
    w = SbrStreamWriter(core_rate=24000, seed=seed, crc=crc,
                        **writer_kwargs)
    sbr = S.SBRContext()
    sbr.sample_rate = 48000
    carry = sbr_huff.init_rows_carry(1)
    checked = 0
    for f in range(frames):
        bw = w.sbr_payload()
        nbits = bw.nbits
        pad = -nbits & 7
        payload = (bw._val << pad).to_bytes((nbits + pad) // 8, "big")
        h = parse_frame(payload, nbits, sbr, is_cpe, crc)
        if h is None:
            continue
        # region: byte-aligned slice holding dtdf..noise
        phase = h["region_start"] & 7
        rbits = h["region_end"] - h["region_start"] + phase
        reg = np.zeros((1, sbr_huff.RW), np.uint8)
        raw = np.frombuffer(payload, np.uint8)[h["region_start"] >> 3:]
        reg[0, :min(len(raw), sbr_huff.RW)] = raw[:sbr_huff.RW]
        args = {k: jnp.asarray([h[k]], jnp.int32)
                for k in ("ne", "nnoise", "frbits", "n0", "n1", "nq",
                          "coupled", "ampres")}
        # single-channel streams run the pair=False graph the qwire
        # integration uses; CPE streams need the full pair graph
        ec, pc, qc, qp, ok, carry = sbr_huff.decode_sbr_rows_jax(
            jnp.asarray(reg), jnp.asarray([phase], jnp.int32),
            jnp.asarray([rbits], jnp.int32), active=jnp.asarray([1]) > 0,
            carry=carry, pair=is_cpe, **args)
        assert int(ok[0]) == 1, f"frame {f}: device flagged invalid"
        # expected rows from the oracle's pre-dequant chains
        for rows, ch in ((ec, 0), (pc, 1)):
            if ch == 1 and not h["coupled"]:
                continue
            d = sbr.data[ch]
            exp = np.zeros((sbr_huff.E, sbr_huff.NB), np.int64)
            for e in range(h["ne"]):
                n = h["n1"] if (h["frbits"] >> e) & 1 else h["n0"]
                exp[e, :n] = d.env_facs[e + 1][:n]
            np.testing.assert_array_equal(
                np.asarray(rows[0]), exp, err_msg=f"frame {f} env ch{ch}")
        for rows, ch in ((qc, 0), (qp, 1)):
            if ch == 1 and not h["coupled"]:
                continue
            d = sbr.data[ch]
            exp = np.zeros((2, sbr_huff.NQ), np.int64)
            for i in range(h["nnoise"]):
                exp[i, :h["nq"]] = d.noise_facs[i + 1][:h["nq"]]
            np.testing.assert_array_equal(
                np.asarray(rows[0]), exp, err_msg=f"frame {f} noise ch{ch}")
        checked += 1
    assert checked >= frames // 2, "writer produced too few data frames"


CASES = [
    dict(is_cpe=False, amp_res=1),
    dict(is_cpe=False, amp_res=0),
    dict(is_cpe=False, amp_res=1, allow_df=False),
    dict(is_cpe=False, amp_res=1, fix_num_env=4, grid_classes=(0,)),
    dict(is_cpe=False, amp_res=1, grid_classes=(3,)),       # VARVAR
    dict(is_cpe=False, amp_res=0, header_every=5),
    dict(is_cpe=True, coupling=True, amp_res=1),
    dict(is_cpe=True, coupling=True, amp_res=0),
    dict(is_cpe=True, coupling=True, amp_res=1, grid_classes=(1, 2)),
    dict(is_cpe=False, amp_res=1, noise_bands=3),
    dict(is_cpe=False, amp_res=1, freq_scale=0),            # many bands
    dict(is_cpe=False, amp_res=1, start_freq=1, stop_freq=8,
         alter_scale=0, freq_scale=3),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_sbr_huff_vs_oracle(case):
    run_stream(CASES[case], frames=24, seed=200 + case)


def test_sbr_huff_many_seeds():
    for seed in range(6):
        run_stream(dict(is_cpe=seed % 2 == 1, coupling=True,
                        amp_res=seed % 2), frames=12, seed=3000 + seed)
