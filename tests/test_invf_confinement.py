"""Pin the inverse-filtering divergence to the covariance solve.

The SBR inverse filter (aacsbr.c:1261) solves a 2x2 complex system whose
determinant can approach zero; float32 divergence there is numerically
chaotic, which is why the invf!=0 golden tests are RMS-gated.  This test
makes that justification checkable (VERDICT r2 #8): stage-by-stage
against ref_sbr_dump, everything UP TO the solve must agree to 1e-6
relative, so the divergence is confined to alpha0/alpha1 and what is
computed from them."""
import pathlib
import subprocess
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))


def relerr(a, b):
    denom = max(np.abs(b).max(), 1e-3)
    return float(np.abs(np.asarray(a) - np.asarray(b)).max() / denom)


@pytest.mark.golden
def test_invf_divergence_confined_to_solve(ref_harness):
    from compare_sbr_dump import read_dump
    from test_golden_sbr import make_core

    from heaac_tpu import decode_adts
    from heaac_tpu import native
    from heaac_tpu.io.heaac_testgen import SbrStreamWriter, splice_sbr_into_lc
    from heaac_tpu.ops import sbr_np

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 12)
    w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                        seed=33, invf_modes=(0, 1, 2, 3))
    he = splice_sbr_into_lc(core, w)
    d = pathlib.Path(tempfile.mkdtemp())
    (d / "a.aac").write_bytes(he)
    subprocess.run([ref_harness["sbr_dump"], str(d / "a.aac"),
                    str(d / "dump.bin")], check=True, capture_output=True)
    ref = read_dump(str(d / "dump.bin"))
    assert len(ref) >= 10

    sbr_np.DEBUG_SINK = []
    orig = native.available
    native.available = lambda: False   # the numpy reference path
    try:
        decode_adts(he)
    finally:
        native.available = orig
        ours = sbr_np.DEBUG_SINK
        sbr_np.DEBUG_SINK = None
    assert len(ours) >= len(ref) - 1

    post_bound = 0.0
    for fi, (r, o) in enumerate(zip(ref, ours)):
        # bitstream-derived integers: exact
        assert list(r["ints"][:2]) == o["kx"], f"frame {fi} kx"
        assert list(r["ints"][2:4]) == o["m"], f"frame {fi} m"
        assert o["t_env_arr"] == r["t_env"].tolist(), f"frame {fi} t_env"
        # pre-solve stages: chirp bw, analysis QMF, X_low — tight
        assert relerr(o["bw_array"], r["bw_array"]) <= 1e-6, \
            f"frame {fi} bw_array"
        assert relerr(o["W1"], r["W1"]) <= 1e-6, f"frame {fi} W (QMF)"
        assert relerr(o["X_low"], r["X_low"]) <= 1e-6, f"frame {fi} X_low"
        # envelope/noise dequant (pre-solve side chain): tight
        num_env = int(r["grid_ints"][0])
        assert relerr(o["env_facs"][:num_env + 1],
                      r["env_facs"][:num_env + 1]) <= 1e-6, \
            f"frame {fi} env_facs"
        # post-solve: alpha and everything derived from it is chaotic;
        # record the observed bound instead of pretending it is tight
        if "alpha0" in o:
            mine = np.asarray(o["X"]).copy()
            # the reference synthesis negates odd imag columns in place
            # before this state is dumped (aacsbr.c:1205-1207)
            mine[1][:32, 1::2] = -mine[1][:32, 1::2]
            post_bound = max(post_bound, relerr(mine, r["X"]))
    # documented post-solve bound: the divergence stays finite and small
    # relative to signal scale even where the solve is ill-conditioned
    assert post_bound < 0.2, f"post-solve relerr {post_bound} blew up"
