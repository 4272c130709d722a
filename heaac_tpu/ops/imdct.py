"""IMDCT as MXU-friendly batched matmuls.

The reference computes ``imdct_half`` (libavcodec/mdct.c:124-159) as
pre-rotation -> split-radix FFT -> post-rotation, hand-vectorized per
architecture.  On TPU the right formulation is different: the transform is a
fixed linear map R^(N/2) -> R^(N/2), so we precompute its matrix once (in
float64, by running the reference algorithm on unit vectors) and evaluate it
as one ``[B, N/2] x [N/2, N/2]`` matmul on the MXU.  For AAC the two sizes are
N=2048 (long windows) and N=256 (8x short windows, batched as ``[B*8, 128]``).

FLOPs: a 1024x1024 matmul per long frame = 2.1 MFLOP -- at a 5000x-realtime
batch rate this is <1% of a v5e's MXU, and it removes every gather/butterfly
pattern that would otherwise fight the vector unit.

Numerics: matrices are float32 (rounded from float64 exact), matmuls run with
``precision=HIGHEST`` so XLA uses full-f32 passes; end-to-end PCM error vs the
reference stays well under the 1e-4 contract.
"""
from __future__ import annotations

import functools

import numpy as np


# ---------------------------------------------------------------------------
# numpy reference algorithm (float64): direct port of mdct.c:61-159 semantics
# ---------------------------------------------------------------------------
def _split_radix_permutation(i: int, n: int, inverse: bool) -> int:
    """fft.c:56-63."""
    if n <= 2:
        return i & 1
    m = n >> 1
    if not (i & m):
        return _split_radix_permutation(i, m, inverse) * 2
    m >>= 1
    if inverse == (not (i & m)):
        return _split_radix_permutation(i, m, inverse) * 4 + 1
    return _split_radix_permutation(i, m, inverse) * 4 - 1


def _revtab(nbits: int, inverse: bool = True) -> np.ndarray:
    n = 1 << nbits
    rt = np.zeros(n, np.int64)
    for i in range(n):
        rt[-_split_radix_permutation(i, n, inverse) & (n - 1)] = i
    return rt


def imdct_half_ref(c: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Reference ``ff_imdct_half`` in float64 numpy (mdct.c:124-159),
    validated bitwise-close against the C build (tools/ref_harness).

    c: [..., N/2] MDCT coefficients -> [..., N/2] (the middle half of the
    inverse transform).  ``scale`` as in ff_mdct_init (negative scale flips
    the twiddle theta by N/4, used by the SBR analysis QMF).
    """
    c = np.asarray(c, np.float64)
    n2 = c.shape[-1]
    n = 2 * n2
    n4 = n // 4
    n8 = n // 8
    theta = 1.0 / 8.0 + (n4 if scale < 0 else 0)
    s = np.sqrt(abs(scale))
    alpha = 2 * np.pi * (np.arange(n4) + theta) / n
    tcos = -np.cos(alpha) * s
    tsin = -np.sin(alpha) * s

    in1 = c[..., 0::2][..., :n4]
    in2 = c[..., ::-1][..., 0::2][..., :n4]
    # CMUL(z[j].re, z[j].im, in2, in1, tcos, tsin); the revtab scatter feeds
    # ff_fft_calc(inverse=1), which computes the *unnormalized inverse DFT*
    # of the naturally-ordered sequence (verified against the C build).
    z = (in2 * tcos - in1 * tsin) + 1j * (in2 * tsin + in1 * tcos)
    z = np.fft.ifft(z, axis=-1) * n4

    out = np.zeros(c.shape, np.float64)
    k = np.arange(n8)
    zr1 = z[..., n8 - 1 - k]
    zr2 = z[..., n8 + k]
    # post rotation + reorder (mdct.c:150-158)
    out[..., 2 * (n8 - 1 - k)] = zr1.imag * tsin[n8 - 1 - k] - zr1.real * tcos[n8 - 1 - k]
    out[..., 2 * (n8 + k) + 1] = zr1.imag * tcos[n8 - 1 - k] + zr1.real * tsin[n8 - 1 - k]
    out[..., 2 * (n8 + k)] = zr2.imag * tsin[n8 + k] - zr2.real * tcos[n8 + k]
    out[..., 2 * (n8 - 1 - k) + 1] = zr2.imag * tcos[n8 + k] + zr2.real * tsin[n8 + k]
    return out


@functools.cache
def imdct_half_matrix(n2: int, scale: float = 1.0,
                      dtype=np.float32) -> np.ndarray:
    """[n2, n2] matrix M with imdct_half(c) == c @ M (row-vector convention),
    built by running the float64 reference algorithm on the identity."""
    return imdct_half_ref(np.eye(n2), scale).astype(dtype)


# ---------------------------------------------------------------------------
# Four-step FFT form of the long IMDCT (the hot transform)
# ---------------------------------------------------------------------------
@functools.cache
def imdct_fft_consts(n2: int = 1024, f1: int = 32,
                     scale: float = 1.0) -> tuple:
    """Constants for ``imdct_half_fft``: pre/post twiddles and the two
    DFT-factor matrices of the four-step decomposition n4 = f1 * f2.

    The direct matrix form costs n2^2 MACs/lane; this costs
    n4*(f1+f2+O(1)) -- ~20x fewer FLOPs for n2=1024 -- while staying pure
    batched matmuls + elementwise twiddles (no butterfly gathers)."""
    n = 2 * n2
    n4 = n // 4
    f2 = n4 // f1
    theta = 1.0 / 8.0 + (n4 if scale < 0 else 0)
    sc = np.sqrt(abs(scale))
    alpha = 2 * np.pi * (np.arange(n4) + theta) / n
    tcos = (-np.cos(alpha) * sc).astype(np.float32)
    tsin = (-np.sin(alpha) * sc).astype(np.float32)
    j1 = np.arange(f1)
    k1 = np.arange(f1)
    w1 = np.exp(2j * np.pi * np.outer(j1, k1) / f1)        # [f1,f1]
    j2 = np.arange(f2)
    k2 = np.arange(f2)
    w2 = np.exp(2j * np.pi * np.outer(j2, k2) / f2)        # [f2,f2]
    tw = np.exp(2j * np.pi * np.outer(j2, k1) / n4)        # [f2,f1]
    return (tcos, tsin,
            w1.real.astype(np.float32), w1.imag.astype(np.float32),
            w2.real.astype(np.float32), w2.imag.astype(np.float32),
            tw.real.astype(np.float32), tw.imag.astype(np.float32),
            f1, f2)


def imdct_half_fft(x, consts):
    """Batched ``imdct_half`` via pre-rotation -> four-step IDFT (two small
    complex matmuls + twiddle) -> post-rotation.  x: [B, n2] -> [B, n2].

    Same transform as ``x @ imdct_half_matrix(n2)`` (mdct.c:124-159), at
    O(n4*(f1+f2)) instead of O(n2^2)."""
    import jax
    import jax.numpy as jnp

    HI = jax.lax.Precision.HIGHEST
    tcos, tsin, w1r, w1i, w2r, w2i, twr, twi, f1, f2 = consts
    B = x.shape[0]
    n2 = x.shape[-1]
    n4 = n2 // 2
    in1 = x[:, 0::2]
    in2 = x[:, 1::2][:, ::-1]
    zre = in2 * tcos - in1 * tsin
    zim = in2 * tsin + in1 * tcos
    # IDFT_{n4}(z) * n4 via factors (j = j1*f2 + j2, k = k2*f1 + k1)
    zr = zre.reshape(B, f1, f2)
    zi = zim.reshape(B, f1, f2)
    ar = (jnp.einsum("bij,ik->bjk", zr, w1r, precision=HI)
          - jnp.einsum("bij,ik->bjk", zi, w1i, precision=HI))
    ai = (jnp.einsum("bij,ik->bjk", zr, w1i, precision=HI)
          + jnp.einsum("bij,ik->bjk", zi, w1r, precision=HI))
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    Zr = (jnp.einsum("bjk,jm->bmk", br, w2r, precision=HI)
          - jnp.einsum("bjk,jm->bmk", bi, w2i, precision=HI))
    Zi = (jnp.einsum("bjk,jm->bmk", br, w2i, precision=HI)
          + jnp.einsum("bjk,jm->bmk", bi, w2r, precision=HI))
    # the factored sum is already the unnormalized IDFT (= ifft * n4)
    Zr = Zr.reshape(B, n4)
    Zi = Zi.reshape(B, n4)
    # post rotation (mdct.c:150-158 vectorized): out_even[m] = u[m],
    # out_odd[m] = v[n4-1-m]
    u = Zi * tsin - Zr * tcos
    v = Zi * tcos + Zr * tsin
    return jnp.stack([u, v[:, ::-1]], axis=-1).reshape(B, n2)
