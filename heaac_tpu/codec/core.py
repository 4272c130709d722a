"""Core AAC device graph: batched IMDCT + windowing/overlap-add.

One jit-compiled graph per batch size decodes B independent channel lanes:
``[B,1024]`` spectra -> ``[B,1024]`` time samples + carried overlap state.
The IMDCT is evaluated as constant-matrix matmuls on the MXU (see
ops/imdct.py); the 4-case overlap-add state machine of the reference
(aacdec.c:1741-1806) is computed branch-free with per-lane masks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.imdct import imdct_half_matrix
from ..ops.windowing import imdct_ola, window_bank

HIGHEST = jax.lax.Precision.HIGHEST


def core_frame(coeffs, saved, win_seq, win_seq_prev, use_kbd, use_kbd_prev,
               m2048, m256, bank):
    """Pure function: one frame for B channel lanes.

    coeffs [B,1024] f32, saved [B,512] f32, metadata [B] i32.
    Returns (time [B,1024] f32, new_saved [B,512] f32).
    """
    long_half = jnp.dot(coeffs, m2048, precision=HIGHEST)
    short_half = jnp.dot(coeffs.reshape(-1, 8, 128), m256, precision=HIGHEST)
    return imdct_ola(long_half, short_half, saved, win_seq, win_seq_prev,
                     use_kbd, use_kbd_prev, bank)


@functools.cache
def _consts():
    return (
        imdct_half_matrix(1024, 1.0),
        imdct_half_matrix(128, 1.0),
        window_bank(),
    )


@functools.cache
def jitted_core_frame():
    m2048, m256, bank = _consts()

    @jax.jit
    def step(coeffs, saved, win_seq, win_seq_prev, use_kbd, use_kbd_prev):
        return core_frame(coeffs, saved, win_seq, win_seq_prev, use_kbd,
                          use_kbd_prev, m2048, m256, bank)

    return step


def core_frame_np(coeffs, saved, win_seq, win_seq_prev, use_kbd,
                  use_kbd_prev):
    """Convenience host entry (accepts/returns numpy)."""
    step = jitted_core_frame()
    out, new_saved = step(
        jnp.asarray(coeffs, jnp.float32), jnp.asarray(saved, jnp.float32),
        jnp.asarray(win_seq, jnp.int32), jnp.asarray(win_seq_prev, jnp.int32),
        jnp.asarray(use_kbd, jnp.int32), jnp.asarray(use_kbd_prev, jnp.int32))
    return np.asarray(out), np.asarray(new_saved)
