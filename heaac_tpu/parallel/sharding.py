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

from ..codec.batch import StreamBatchDecoder
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


class ShardedStreamBatchDecoder(StreamBatchDecoder):
    """Whole-stream batched decode with the stream/lane axis sharded over a
    1-D ``dp`` mesh (SURVEY.md \u00a72.5): each chip decodes its shard of the
    lane batch; plans and state are placed with NamedSharding in a single
    host\u2192device transfer (parse \u2192 sharded device_put, no unsharded staging
    copy) so the scan runs SPMD with zero collectives in the decode graph.

    Same contract as codec.batch.StreamBatchDecoder, plus ``mesh``.
    Requires lanes % mesh size == 0 (pad the stream list to fit).
    """

    def __init__(self, streams, batch: int | None = None,
                 mesh: Mesh | None = None, asc: bytes | None = None,
                 max_frames: int | None = None):
        self.mesh = mesh or make_mesh()
        n = self.mesh.devices.size
        super().__init__(
            streams, batch=batch, asc=asc, max_frames=max_frames,
            _sharding=NamedSharding(self.mesh, P(None, "dp")))
        lanes = self.B * self.lanes_per_stream
        if lanes % n:
            raise ValueError(f"{lanes} lanes not divisible by {n} devices")
        self._state_shard = NamedSharding(self.mesh, P("dp"))

    def decode(self):
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._state_shard),
            self._init_state())
        _, pcm = self.run_fn(self.core, self.sbr, self.ps, state)
        return pcm
