"""Pallas TPU kernel for the sequential half of PS decorrelation.

The transient detector and the 3-link allpass chain (aacps.c:681-735) are
the only truly sequential recurrences in the decode graph: 32 time steps
carrying tiny per-lane state.  As ``lax.scan`` they serialize 32 small
XLA kernels; here both run inside ONE pallas kernel with the slot loop in
registers/VMEM, vectorized over a lane tile (lanes in the minor dimension,
so every per-slot update is a [bands, TB] VPU op).

Numerics are bit-identical to the ops/ps_jax.py scan pair (validated in
tests/test_ps_pallas.py).  Measured on TPU v5e: ~3x faster than the scans
in isolation, but ~2x slower end-to-end inside the fused frame pipeline --
the lanes-minor layout it needs forces [B,...] transposes and prevents XLA
from overlapping the recurrences with neighboring stages.  It is therefore
OPT-IN (HEAAC_PS_PALLAS=1); the finding is kept as the measured answer to
"should the sequential hot loop be a hand-written kernel here" (no).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import ps_tables as P

TB = 128  # lane tile (vector minor dimension)


def _kernel(power_ref, dre_ref, dim_ref, trans_ref, buf_ref,
            ag_ref, qf_ref,
            tgain_ref, ore_ref, oim_ref, ntrans_ref, nbuf_ref,
            *, napb: int):
    peak = trans_ref[0]
    psm = trans_ref[1]
    pdd = trans_ref[2]
    buf = buf_ref[...]                     # [napb,3,5,TB] complex interleave?
    # buf layout: [napb, 3, 5, 2, TB]
    a = ag_ref[...]                        # [napb, 3, 1]
    qf = qf_ref[...]                       # [napb, 3, 2, 1]

    def slot(i, carry):
        peak, psm, pdd, buf = carry
        pn = power_ref[i]                  # [34, TB]
        peak = jnp.maximum(np.float32(P.PEAK_DECAY_FACTOR) * peak, pn)
        psm = psm + np.float32(P.A_SMOOTH) * (pn - psm)
        pdd = pdd + np.float32(P.A_SMOOTH) * (peak - pn - pdd)
        denom = np.float32(P.TRANSIENT_IMPACT) * pdd
        tg = jnp.where(denom > psm,
                       psm / jnp.where(denom != 0, denom, np.float32(1.0)),
                       np.float32(1.0))
        tgain_ref[i] = tg

        cur_re = dre_ref[i]                # [napb, TB]
        cur_im = dim_ref[i]
        out_re, out_im = cur_re, cur_im
        new_cols = []
        for m in range(3):
            ld_re = buf[:, m, 5 - int(P.LINK_DELAY[m]), 0]
            ld_im = buf[:, m, 5 - int(P.LINK_DELAY[m]), 1]
            am = a[:, m]
            a_re = am * out_re
            a_im = am * out_im
            nre = ld_re * qf[:, m, 0] - ld_im * qf[:, m, 1] - a_re
            nim = ld_re * qf[:, m, 1] + ld_im * qf[:, m, 0] - a_im
            new_cols.append(jnp.stack([out_re + am * nre,
                                       out_im + am * nim], axis=-2))
            out_re, out_im = nre, nim
        # shift the 5-deep ring: buf[:, m, j] <- buf[:, m, j+1], last = new
        shifted = jnp.concatenate(
            [buf[:, :, 1:], jnp.stack(new_cols, 1)[:, :, None]], axis=2)
        ore_ref[i] = out_re
        oim_ref[i] = out_im
        return peak, psm, pdd, shifted

    peak, psm, pdd, buf = jax.lax.fori_loop(
        0, 32, slot, (peak, psm, pdd, buf))
    ntrans_ref[0] = peak
    ntrans_ref[1] = psm
    ntrans_ref[2] = pdd
    nbuf_ref[...] = buf


@functools.cache
def _built(napb: int, interpret: bool = False):
    from jax.experimental import pallas as pl

    kern = functools.partial(_kernel, napb=napb)

    def call(power, dre, dim, trans, buf, ag, qf):
        nb = power.shape[-1] // TB
        grid = (nb,)
        lane = lambda i: i  # noqa: E731
        out_shape = (
            jax.ShapeDtypeStruct(power.shape, jnp.float32),       # tgain
            jax.ShapeDtypeStruct(dre.shape, jnp.float32),         # out re
            jax.ShapeDtypeStruct(dim.shape, jnp.float32),         # out im
            jax.ShapeDtypeStruct(trans.shape, jnp.float32),       # new trans
            jax.ShapeDtypeStruct(buf.shape, jnp.float32),         # new buf
        )
        bs = pl.BlockSpec
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                bs((32, 34, TB), lambda i: (0, 0, i)),
                bs((32, napb, TB), lambda i: (0, 0, i)),
                bs((32, napb, TB), lambda i: (0, 0, i)),
                bs((3, 34, TB), lambda i: (0, 0, i)),
                bs((napb, 3, 5, 2, TB), lambda i: (0, 0, 0, 0, i)),
                bs((napb, 3, 1), lambda i: (0, 0, 0)),
                bs((napb, 3, 2, 1), lambda i: (0, 0, 0, 0)),
            ],
            out_specs=(
                bs((32, 34, TB), lambda i: (0, 0, i)),
                bs((32, napb, TB), lambda i: (0, 0, i)),
                bs((32, napb, TB), lambda i: (0, 0, i)),
                bs((3, 34, TB), lambda i: (0, 0, i)),
                bs((napb, 3, 5, 2, TB), lambda i: (0, 0, 0, 0, i)),
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(power, dre, dim, trans, buf, ag, qf)

    return call


def decorrelate_seq(power, in_re, in_im, trans, ap, ag, qf,
                    interpret: bool = False):
    """Fused transient + allpass recurrences.

    power [B,34,32]; in_re/in_im [B,napb,32] (phi-rotated allpass input);
    trans [B,34,3]; ap [B,napb,3,5,2]; ag [napb,3]; qf [napb,3,2].
    Returns (tgain [B,32,34], ap_out [B,napb,32,2], new_trans, new_ap) —
    the exact contract of the two lax.scans in ps_jax.decorrelate_and_mix.
    """
    B = power.shape[0]
    napb = in_re.shape[1]
    pad = (-B) % TB
    if pad:
        padf = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        power, in_re, in_im, trans, ap = map(
            padf, (power, in_re, in_im, trans, ap))
    Bp = B + pad
    # lanes minor: [B, ...] -> [..., B]
    power_t = jnp.transpose(power, (2, 1, 0))        # [32,34,Bp]
    dre = jnp.transpose(in_re, (2, 1, 0))            # [32,napb,Bp]
    dim = jnp.transpose(in_im, (2, 1, 0))
    trans_t = jnp.transpose(trans, (2, 1, 0))        # [3,34,Bp]
    buf_t = jnp.transpose(ap, (1, 2, 3, 4, 0))       # [napb,3,5,2,Bp]
    agc = jnp.asarray(ag, jnp.float32)[:, :, None]
    qfc = jnp.asarray(qf, jnp.float32)[..., None]
    tg, ore, oim, ntr, nbuf = _built(napb, interpret)(
        power_t, dre, dim, trans_t, buf_t, agc, qfc)
    tgain = jnp.transpose(tg, (2, 0, 1))[:B]         # [B,32,34]
    ap_out = jnp.stack([jnp.transpose(ore, (2, 1, 0)),
                        jnp.transpose(oim, (2, 1, 0))], -1)[:B]
    new_trans = jnp.transpose(ntr, (2, 1, 0))[:B]
    new_ap = jnp.transpose(nbuf, (4, 0, 1, 2, 3))[:B]
    return tgain, ap_out, new_trans, new_ap


def available() -> bool:
    """Probe whether pallas compiles on the current backend."""
    try:
        B = TB
        z = jnp.zeros
        decorrelate_seq(z((B, 34, 32)), z((B, 30, 32)), z((B, 30, 32)),
                        z((B, 34, 3)), z((B, 30, 3, 5, 2)),
                        np.zeros((30, 3), np.float32),
                        np.zeros((30, 3, 2), np.float32))[0].block_until_ready()
        return True
    except Exception:
        return False
