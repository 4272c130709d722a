"""SPMD sharding of the decode graph over a device mesh.

Streams are independent, so the natural parallel axis is the stream/lane
batch: shard ``[B, ...]`` arrays over a 1-D ``dp`` mesh with jax.sharding.
No collectives appear in the decode graph itself — ICI is only used for
input distribution; this is the TPU-native replacement for the reference's
single-core frame loop (SURVEY.md §2.5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codec.core import _consts, core_frame


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("dp",))


def sharded_core_step(mesh: Mesh):
    """jit of the core frame step with every batch-dim input sharded on dp."""
    m2048, m256, bank = _consts()
    batch = NamedSharding(mesh, P("dp"))

    @jax.jit
    def step(coeffs, saved, win_seq, win_seq_prev, use_kbd, use_kbd_prev):
        coeffs = jax.lax.with_sharding_constraint(coeffs, batch)
        saved = jax.lax.with_sharding_constraint(saved, batch)
        return core_frame(coeffs, saved, win_seq, win_seq_prev, use_kbd,
                          use_kbd_prev, m2048, m256, bank)

    return step
