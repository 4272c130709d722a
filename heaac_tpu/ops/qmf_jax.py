"""Batched QMF analysis/synthesis filterbanks as TPU matmul graphs.

The reference implements these as per-slot loops with a 1280-float ring
FIFO (aacsbr.c:1136-1230).  Here both banks are reformulated as static
sliding-window gathers + constant-matrix matmuls over ``[B, 32, ...]``:

* analysis: frame the 1312-sample input into 32 windows of 320, multiply by
  the reversed prototype, fold 5x64, and apply the 64-point "analysis IMDCT"
  (scale -2) as a [64,64] matmul; a final constant shuffle yields W.
* synthesis: two 64-point IMDCTs as matmuls produce a 128-sample v-block per
  slot; the reference's FIFO indexing is equivalent to reading 10 static
  window taps from the current + previous 9 v-blocks, so the carried state
  is just ``v_hist [B, 9, 128]`` and every tap is a static slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..bitstream import sbr_syntax as S
from .imdct import imdct_half_matrix

HIGHEST = jax.lax.Precision.HIGHEST


@functools.cache
def _analysis_consts():
    win = S.qmf_window_ds()  # [320]
    m_ana = imdct_half_matrix(64, -2.0)  # [64,64]
    # fold matrix: z[k] = sum_{j<5} zw[k + 64j]; then shuffle to IMDCT input:
    # q[0]=z0, q[2k-1]=z[k], q[2k]=-z[64-k] (k=1..31), q[63]=z[32]
    # build the combined [320 -> 64] matrix including the window and reverse
    fold = np.zeros((320, 64), np.float32)
    for k in range(64):
        for j in range(5):
            fold[k + 64 * j, k] = 1.0
    shuf = np.zeros((64, 64), np.float32)
    shuf[0, 0] = 1.0
    for k in range(1, 32):
        shuf[k, 2 * k - 1] = 1.0
        shuf[64 - k, 2 * k] = -1.0
    shuf[32, 63] = 1.0
    # x window w/ reverse: z_pre[j] = win[j] * xw[319-j]
    # combined: q = (win * xw_rev) @ fold @ shuf @ m_ana
    pre = fold @ shuf @ m_ana  # [320, 64]
    return win.copy(), pre


def qmf_analysis(in_samples, x_hist):
    """in_samples [B,1024], x_hist [B,288] -> (W [B,32,32,2], new_hist)."""
    win, pre = _analysis_consts()
    x = jnp.concatenate([x_hist, in_samples], axis=-1)  # [B,1312]
    idx = np.arange(32)[:, None] * 32 + np.arange(320)[None, :]
    xw = x[:, idx]                        # [B,32,320] windows
    z = xw[..., ::-1] * win               # z[j] = win[j] * xw[319-j]
    out = jnp.einsum("bsj,jk->bsk", z, pre, precision=HIGHEST)  # [B,32,64]
    k = np.arange(32)
    w_re = -out[..., 63 - k]
    w_im = out[..., k]
    return jnp.stack([w_re, w_im], axis=-1), x[:, 1024:]


@functools.cache
def _synthesis_consts():
    m_syn = imdct_half_matrix(64, 1.0 / 64)  # [64,64]
    win = S.qmf_window_us()
    # v-block from one X slot (aacsbr.c:1204-1213):
    #   b0 = imdct(X_re); b1 = imdct(X_im with odd entries negated)
    #   v[n] = -b0[63-n] + b1[n]; v[127-n] = b0[63-n] + b1[n]   (n<64)
    # Fold everything into two [64,128] matrices: v = X_re@A + X_im@B.
    alt = np.ones(64, np.float32)
    alt[1::2] = -1.0
    a0 = np.zeros((64, 128), np.float32)   # b0 -> v placement
    a1 = np.zeros((64, 128), np.float32)   # b1 -> v placement
    for n in range(64):
        a0[63 - n, n] = -1.0
        a0[63 - n, 127 - n] = 1.0
        a1[n, n] += 1.0
        a1[n, 127 - n] += 1.0
    A = (m_syn @ a0).astype(np.float32)
    B2 = ((alt[:, None] * m_syn) @ a1).astype(np.float32)
    # window taps: (block_delta, intra_offset) per tap j; derived from the
    # reference FIFO offsets [0,192,256,...,1216] with 128-sample blocks
    taps = [(0, 0), (1, 64), (2, 0), (3, 64), (4, 0), (5, 64), (6, 0),
            (7, 64), (8, 0), (9, 64)]
    return A, B2, win.reshape(10, 64), taps


def qmf_synthesis(X, v_hist):
    """X [B,2,38,64] (re/im planes; slots 0..31 used), v_hist [B,9,128]
    -> (out [B,2048], new_v_hist [B,9,128])."""
    A, B2, win, taps = _synthesis_consts()
    xr = X[:, 0, :32]   # [B,32,64]
    xi = X[:, 1, :32]
    v = (jnp.einsum("bsk,kn->bsn", xr, A, precision=HIGHEST)
         + jnp.einsum("bsk,kn->bsn", xi, B2, precision=HIGHEST))  # [B,32,128]
    v_all = jnp.concatenate([v_hist, v], axis=1)  # [B,41,128]
    out = 0.0
    for j, (bd, ro) in enumerate(taps):
        blocks = v_all[:, 9 - bd: 9 - bd + 32, ro: ro + 64]  # [B,32,64]
        out = out + blocks * win[j]
    return out.reshape(out.shape[0], 2048), v_all[:, 32:]


@functools.cache
def _synthesis_consts_ds():
    """Downsampled (32-band) synthesis constants (aacsbr.c:1192-1203):
    q = [-X_re[:32], X_im[31::-1]]; buf = imdct64(q, 1/64);
    v[n] = buf[63-2n], v[63-n] = -buf[62-2n]; 64-sample v-blocks, 32-sample
    window taps from the _ds prototype."""
    m_syn = imdct_half_matrix(64, 1.0 / 64)
    win = S.qmf_window_ds()
    E = np.zeros((64, 64), np.float32)      # X_re -> q
    F = np.zeros((64, 64), np.float32)      # X_im -> q
    for k in range(32):
        E[k, k] = -1.0
        F[31 - k, 32 + k] = 1.0
    P = np.zeros((64, 64), np.float32)      # buf -> v
    for n in range(32):
        P[63 - 2 * n, n] = 1.0
        P[62 - 2 * n, 63 - n] = -1.0
    A = (E @ m_syn @ P).astype(np.float32)
    B2 = (F @ m_syn @ P).astype(np.float32)
    taps = [(0, 0), (1, 32), (2, 0), (3, 32), (4, 0), (5, 32), (6, 0),
            (7, 32), (8, 0), (9, 32)]
    return A, B2, win.reshape(10, 32), taps


def qmf_synthesis_ds(X, v_hist):
    """Downsampled synthesis: X [B,2,38,64], v_hist [B,9,128] (only the
    first 64 columns carry state in this mode) -> (out [B,1024], new_hist).

    Mirrors sbr_qmf_synthesis with div=1 (aacsbr.c:1175-1230)."""
    A, B2, win, taps = _synthesis_consts_ds()
    xr = X[:, 0, :32]
    xi = X[:, 1, :32]
    v = (jnp.einsum("bsk,kn->bsn", xr, A, precision=HIGHEST)
         + jnp.einsum("bsk,kn->bsn", xi, B2, precision=HIGHEST))  # [B,32,64]
    v_all = jnp.concatenate([v_hist[:, :, :64], v], axis=1)       # [B,41,64]
    out = 0.0
    for j, (bd, ro) in enumerate(taps):
        blocks = v_all[:, 9 - bd: 9 - bd + 32, ro: ro + 32]       # [B,32,32]
        out = out + blocks * win[j]
    new_hist = jnp.concatenate(
        [v_all[:, 32:], jnp.zeros_like(v_all[:, 32:])], axis=2)   # [B,9,128]
    return out.reshape(out.shape[0], 1024), new_hist
