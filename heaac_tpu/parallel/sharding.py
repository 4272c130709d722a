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


class ShardedStreamBatchDecoder:
    """Whole-stream batched decode with the stream/lane axis sharded over a
    1-D ``dp`` mesh (SURVEY.md \u00a72.5): each chip decodes its shard of the
    lane batch; plans and state are placed with NamedSharding so the scan
    runs SPMD with zero collectives in the decode graph.

    Same contract as codec.batch.StreamBatchDecoder, plus ``mesh``.
    Requires lanes % mesh size == 0 (pad the stream list to fit).
    """

    def __init__(self, streams, batch: int | None = None,
                 mesh: Mesh | None = None, asc: bytes | None = None):
        from ..codec.batch import StreamBatchDecoder

        self.mesh = mesh or make_mesh()
        inner = StreamBatchDecoder(streams, batch=batch, asc=asc)
        self.B, self.T = inner.B, inner.T
        self.sample_rate = inner.sample_rate
        self.lanes_per_stream = inner.lanes_per_stream
        self.ds, self.is34 = inner.ds, inner.is34
        lanes = self.B * self.lanes_per_stream
        n = self.mesh.devices.size
        if lanes % n:
            raise ValueError(f"{lanes} lanes not divisible by {n} devices")
        shard = NamedSharding(self.mesh, P(None, "dp"))  # [T, B, ...] on B
        put = lambda d: {k: jax.device_put(np.asarray(v), shard)
                         for k, v in d.items()}
        self.core = put(inner.core)
        self.sbr = put(inner.sbr)
        self.ps = put(inner.ps)
        self.run_fn = inner.run_fn
        self._state_shard = NamedSharding(self.mesh, P("dp"))

    def decode(self):
        from ..codec.heaac_graph import init_state

        state = init_state(self.B * self.lanes_per_stream)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._state_shard), state)
        _, pcm = self.run_fn(self.core, self.sbr, self.ps, state)
        return pcm

    def audio_seconds(self) -> float:
        return self.B * self.T * (1024 << (not self.ds)) / self.sample_rate
