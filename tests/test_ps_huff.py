"""Device PS-parameter Huffman decode (ops/ps_huff) vs the Python
bitstream reference (bitstream/ps_syntax.read_ps_data).

Streams of ps_data payloads come from the test-vector writer; every
frame is decoded twice — serially by ps_syntax (the validated oracle of
aacps.c:150-279) and batched by decode_ps_region_jax fed only the
fixed-width header fields a host parser extracts plus the raw region
bits — and the post-fixup parameter rows must match exactly.
"""
import numpy as np
import pytest

from heaac_tpu.bitstream import ps_syntax as PSyn
from heaac_tpu.bitstream.reader import BitReader
from heaac_tpu.io.heaac_testgen import PsStreamWriter
from heaac_tpu.ops import ps_huff


class HostState:
    """The persistent fixed-field state a host parser tracks (modes from
    the last header; no parameter values)."""

    def __init__(self):
        self.enable_iid = 0
        self.iq = 0
        self.nr_iid = 0
        self.enable_icc = 0
        self.nr_icc = 0
        self.enable_ext = 0
        self.nipd = 0


def host_head(payload: bytes, nbits: int, st: HostState):
    """Parse the fixed-width prefix of one ps_data payload exactly as the
    v5 host emitter will (he_host.inc ps_read_data header half), and
    return the head fields + raw region."""
    br = BitReader(payload)
    header = br.get1()
    if header:
        st.enable_iid = br.get1()
        if st.enable_iid:
            iid_mode = br.get(3)
            assert iid_mode <= 5
            st.nr_iid = PSyn.NR_IIDICC_PAR_TAB[iid_mode]
            st.iq = int(iid_mode > 2)
            st.nipd = PSyn.NR_IIDOPD_PAR_TAB[iid_mode]
        st.enable_icc = br.get1()
        if st.enable_icc:
            icc_mode = br.get(3)
            assert icc_mode <= 5
            st.nr_icc = PSyn.NR_IIDICC_PAR_TAB[icc_mode]
        st.enable_ext = br.get1()
    fc = br.get1()
    ne_pre = PSyn.NUM_ENV_TAB[fc][br.get(2)]
    borders = [-1]
    if fc:
        for _ in range(ne_pre):
            borders.append(br.get(5))
    else:
        for e in range(1, ne_pre + 1):
            borders.append(((e * 32) >> PSyn._LOG2[ne_pre]) - 1)
    penv = ne_pre
    if not ne_pre or borders[ne_pre] < 31:
        penv += 1
    region_bit = br.pos
    start_off = region_bit & 7
    region = payload[region_bit >> 3:]
    rbits = nbits - region_bit + start_off
    return dict(header=header, ne_pre=ne_pre, penv=penv,
                enable_iid=st.enable_iid, iq=st.iq, nr_iid=st.nr_iid,
                enable_icc=st.enable_icc, nr_icc=st.nr_icc,
                enable_ext=st.enable_ext, nipd=st.nipd,
                start_off=start_off, rbits=rbits, region=region)


def run_stream(writer_kwargs, frames=24, seed=0):
    import jax.numpy as jnp

    w = PsStreamWriter(seed=seed, **writer_kwargs)
    oracle = PSyn.PSContext()
    st = HostState()
    carry = ps_huff.init_ps_carry(1)
    for f in range(frames):
        bw = w.ps_payload()
        nbits = bw.nbits
        pad = -nbits & 7
        payload = (bw._val << pad).to_bytes((nbits + pad) // 8, "big")
        # oracle (bits_left = the payload's true bit count)
        br = BitReader(payload)
        PSyn.read_ps_data(oracle, br, nbits)
        assert oracle.start == 1, "writer produced an invalid payload"
        # device
        h = host_head(payload, nbits, st)
        reg = np.zeros((1, ps_huff.RW), np.uint8)
        raw = np.frombuffer(h["region"], np.uint8)[:ps_huff.RW]
        reg[0, :len(raw)] = raw
        args = {k: jnp.asarray([h[k]], jnp.int32)
                for k in ("start_off", "rbits", "enable_iid", "iq",
                          "nr_iid", "enable_icc", "nr_icc", "enable_ext",
                          "ne_pre", "penv", "nipd", "header")}
        iid, icc, ipd, opd, pd_on, ok, carry = ps_huff.decode_ps_region_jax(
            jnp.asarray(reg), **args, carry=carry)
        assert int(ok[0]) == 1, f"frame {f}: device flagged invalid"
        assert h["penv"] == oracle.num_env, f"frame {f}: penv mismatch"
        # expected rows, masked the way the device returns them
        exp_iid = np.zeros((5, 34), np.int64)
        exp_icc = np.zeros((5, 34), np.int64)
        exp_ipd = np.zeros((5, 17), np.int64)
        exp_opd = np.zeros((5, 17), np.int64)
        for e in range(oracle.num_env):
            if st.enable_iid:
                exp_iid[e, :st.nr_iid] = oracle.iid_par[e][:st.nr_iid]
            if st.enable_icc:
                exp_icc[e, :st.nr_icc] = oracle.icc_par[e][:st.nr_icc]
            if oracle.enable_ipdopd:
                exp_ipd[e, :st.nipd] = oracle.ipd_par[e][:st.nipd]
                exp_opd[e, :st.nipd] = oracle.opd_par[e][:st.nipd]
        np.testing.assert_array_equal(np.asarray(iid[0]), exp_iid,
                                      err_msg=f"frame {f} iid")
        np.testing.assert_array_equal(np.asarray(icc[0]), exp_icc,
                                      err_msg=f"frame {f} icc")
        np.testing.assert_array_equal(np.asarray(ipd[0]), exp_ipd,
                                      err_msg=f"frame {f} ipd")
        np.testing.assert_array_equal(np.asarray(opd[0]), exp_opd,
                                      err_msg=f"frame {f} opd")
        assert int(pd_on[0]) == int(oracle.enable_ipdopd), f"frame {f}"


CASES = [
    dict(iid_mode=1, icc_mode=1),
    dict(iid_mode=0, icc_mode=0),
    dict(iid_mode=2, icc_mode=2),
    dict(iid_mode=4, icc_mode=1),                 # fine iid quant
    dict(iid_mode=5, icc_mode=5),                 # fine + 34 bands
    dict(iid_mode=1, icc_mode=1, enable_ipdopd=True),
    dict(iid_mode=2, icc_mode=0, enable_ipdopd=True),
    dict(iid_mode=3, icc_mode=2, enable_ipdopd=True),
    dict(iid_mode=1, icc_mode=1, enable_iid=False),
    dict(iid_mode=1, icc_mode=1, enable_icc=False),
    dict(iid_mode=1, icc_mode=1, allow_dt=False),
    dict(iid_mode=1, icc_mode=1, frame_classes=(1,)),
    dict(iid_mode=1, icc_mode=1, header_every=3),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_ps_huff_vs_oracle(case):
    run_stream(CASES[case], frames=24, seed=100 + case)


def test_ps_huff_many_seeds():
    for seed in range(8):
        run_stream(dict(iid_mode=seed % 6, icc_mode=(seed + 1) % 6,
                        enable_ipdopd=seed % 2 == 1), frames=12,
                   seed=1000 + seed)
