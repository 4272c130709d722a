"""IMDCT kernel unit tests: numpy reference alg, matrix form, C oracle."""
import subprocess

import numpy as np
import pytest

from heaac_tpu.ops.imdct import imdct_half_matrix, imdct_half_ref

CASES = [(11, 1.0), (8, 1.0), (8, -2.0), (8, 1.0 / 64)]


@pytest.mark.parametrize("nbits,scale", CASES)
def test_matrix_matches_algorithm(nbits, scale):
    n2 = 1 << (nbits - 1)
    rng = np.random.default_rng(nbits)
    x = rng.standard_normal((4, n2)).astype(np.float32)
    m = imdct_half_matrix(n2, scale)
    got = (x @ m).astype(np.float32)
    want = imdct_half_ref(x, scale).astype(np.float32)
    ref_mag = np.abs(want).max()
    assert np.abs(got - want).max() / ref_mag < 1e-5


@pytest.mark.golden
@pytest.mark.parametrize("nbits,scale", CASES)
def test_matches_reference_c(nbits, scale, ref_harness):
    n2 = 1 << (nbits - 1)
    rng = np.random.default_rng(nbits + 100)
    x = rng.standard_normal(n2).astype(np.float32)
    out_c = subprocess.run(
        [ref_harness["imdct"], str(nbits), repr(scale)],
        input=x.tobytes(), capture_output=True, check=True).stdout
    out_c = np.frombuffer(out_c, np.float32)
    out_py = imdct_half_ref(x, scale).astype(np.float32)
    assert np.abs(out_c - out_py).max() / np.abs(out_c).max() < 1e-6


def test_imdct_inverts_mdct_energy():
    """IMDCT of a pure cosine coefficient line yields the expected shape."""
    n2 = 1024
    c = np.zeros(n2)
    c[10] = 1.0
    out = imdct_half_ref(c)
    # middle half of a cosine: bounded by 1, nonzero
    assert np.abs(out).max() <= 1.0 + 1e-9
    assert np.abs(out).max() > 0.5
