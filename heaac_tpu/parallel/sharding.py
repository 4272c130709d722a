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


class ShardedQwireDecoder:
    """The quantized-wire pipeline (codec/qwire.py) sharded over a 1-D
    ``dp`` mesh: the byte heap is replicated (it is ~0.5 KB/frame-lane —
    cheap to broadcast over ICI), the records and every carry leaf shard on
    the lane axis, and the token decode + frame scan run SPMD with zero
    collectives (each chip gathers its lanes' records/tokens from its own
    heap replica).  Groups decode sequentially like QwirePipelinedDecoder;
    lanes per group must divide the mesh size."""

    def __init__(self, streams, mesh: Mesh | None = None,
                 group_streams: int = 256,
                 max_frames: int | None = None):
        from ..codec.batch import QwirePipelinedDecoder

        self.mesh = mesh or make_mesh()
        self.inner = QwirePipelinedDecoder(streams,
                                           group_streams=group_streams,
                                           max_frames=max_frames)
        n = self.mesh.devices.size
        if self.inner.L % n:
            raise ValueError(
                f"{self.inner.L} lanes per group not divisible by {n} "
                "devices")
        self._sh_rep = NamedSharding(self.mesh, P())
        self._sh_rec = NamedSharding(self.mesh, P(None, "dp"))
        self._sh_lane = NamedSharding(self.mesh, P("dp"))

    def decode(self):
        from ..codec.heaac_graph import (init_qwire_carry,
                                         qwire_scan_decoder,
                                         qwire_scan_decoder_couple)

        dec = self.inner
        run = None
        outs = []
        n = len(dec.streams)
        dec.frame_counts = []
        for gidx, g0 in enumerate(range(0, n, dec.G)):
            idxs = dec.order[g0:g0 + dec.G]
            group = [dec.streams[i] for i in idxs]
            if len(group) < dec.G:
                group = group + [group[0]] * (dec.G - len(group))
            Tg = dec.group_T[gidx]
            if gidx >= 2:
                jax.block_until_ready(outs[gidx - 2])
            for _ in range(6):
                r = dec._parse_group(group, gidx % 2, Tg)
                if r is not None:
                    break
                # heap overflow: drain in-flight decodes, grow, retry
                # (mirrors QwirePipelinedDecoder.decode's retry loop)
                jax.block_until_ready(outs)
                dec._grow()
            else:
                raise MemoryError("qwire heap kept overflowing")
            heap, cur, recs = r
            if dec._upload_w is None:
                dec._upload_w = min((cur + 3) // 4 + 65536, dec._cap // 4)
            while (cur + 3) // 4 > dec._upload_w:  # grow (rare): a later
                # group's heap cursor can exceed group 0's sizing estimate
                dec._upload_w = min(dec._upload_w * 2, dec._cap // 4)
            heap_w = jax.device_put(
                heap[:dec._upload_w * 4].view(np.float32), self._sh_rep)
            rec_w = jax.device_put(recs[:Tg].view(np.float32), self._sh_rec)
            carry = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._sh_lane),
                init_qwire_carry(dec.L))
            if dec._cur_couple is not None:
                # AFTER_IMDCT CCE: the post-scan mix gathers the CCE
                # source lane, which may live on another shard — the
                # edge arrays are tiny and replicated; XLA inserts the
                # collective for the cross-shard gather
                run = qwire_scan_decoder_couple(dec.is34, dec.ds, dec.S,
                                                dec.rate_idx, dec.NB,
                                                dec.MS, dec.NS, dec.SEC,
                                                dec.RP)
                etgt, etch, esrc, gains = dec._cur_couple
                _, pcm = run(heap_w, rec_w, carry,
                             jax.device_put(etgt, self._sh_rep),
                             jax.device_put(etch, self._sh_rep),
                             jax.device_put(esrc, self._sh_rep),
                             jax.device_put(gains, self._sh_rep))
            else:
                run = qwire_scan_decoder(dec.is34, dec.ds, dec.S,
                                         dec.rate_idx, dec.NB, dec.MS,
                                         dec.NS, dec.SEC, dec.RP)
                _, pcm = run(heap_w, rec_w, carry)
            outs.append(pcm)
        jax.block_until_ready(outs[-1])
        by_orig = [0] * n
        for k, i in enumerate(dec.order):
            by_orig[i] = dec.frame_counts[k]
        dec.frame_counts = by_orig
        return outs

    def audio_seconds(self) -> float:
        return self.inner.audio_seconds()
