"""Pallas PS decorrelation kernel vs the lax.scan reference.

Runs in interpret mode on CPU so CI covers the kernel's numerics; on TPU
the compiled kernel was validated bit-exact against the scans."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_decorrelate_matches_scans():
    from heaac_tpu.ops import ps_jax, ps_pallas

    B, napb = 8, 30
    rng = np.random.default_rng(0)
    c = ps_jax._consts(0)
    power = jnp.asarray(np.abs(rng.standard_normal((B, 34, 32))), jnp.float32)
    in_re = jnp.asarray(rng.standard_normal((B, napb, 32)), jnp.float32)
    in_im = jnp.asarray(rng.standard_normal((B, napb, 32)), jnp.float32)
    trans = jnp.asarray(np.abs(rng.standard_normal((B, 34, 3))), jnp.float32)
    ap = jnp.asarray(rng.standard_normal((B, napb, 3, 5, 2)) * 0.1,
                     jnp.float32)
    state = dict(trans=trans)
    tg_s, out_s, tstate_s, ap_s = ps_jax._decorrelate_scans(
        power, in_re, in_im, state, ap, c)
    tg_p, out_p, ntr_p, ap_p = ps_pallas.decorrelate_seq(
        power, in_re, in_im, trans, ap, c["ag"], c["qf"], interpret=True)
    assert np.allclose(np.asarray(tg_p), np.asarray(tg_s), atol=1e-6)
    assert np.allclose(np.asarray(out_p), np.asarray(out_s), atol=1e-6)
    assert np.allclose(np.asarray(ap_p), np.asarray(ap_s), atol=1e-6)
    ts = jnp.stack(tstate_s, -1)
    assert np.allclose(np.asarray(ntr_p), np.asarray(ts), atol=1e-6)
