"""Multi-host decode: per-host input distribution + global metric reduction.

The production layout for a TPU pod (SURVEY.md §2.5): streams are
independent, so each HOST parses its own stream shard and feeds only its
local chips — no cross-host traffic in the decode path at all.  DCN/ICI
carry exactly one collective: the final all-reduce of per-host
DecodeMetrics (frames, errors, audio seconds), mirroring the reference
CLI's end-of-run statistics print (ffmpeg.c print_report) aggregated
across workers.

Run as a module, one process per host:

    python -m heaac_tpu.parallel.multihost --coordinator HOST:PORT \
        --num-processes N --process-id K --streams-dir DIR

Each process initializes jax.distributed, decodes the shard of streams
assigned to it (round-robin by index), and performs the global psum on
the full device mesh.  Works on real multi-host pods and on a single
machine with N CPU processes (the CI dryrun: tests/test_multihost.py).
"""
from __future__ import annotations

import argparse
import json
import sys


def decode_shard_and_reduce(streams_local, n_local_frames_hint=None):
    """Decode this host's streams locally, then all-reduce metrics over
    every process's devices.  Returns the GLOBAL metrics dict (identical
    on every host)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..codec.batch import QwirePipelinedDecoder

    # --- local decode: host-local parse, host-local devices -------------
    errors = 0
    frames = 0
    audio_s = 0.0
    if streams_local:
        dec = QwirePipelinedDecoder(streams_local,
                                    group_streams=len(streams_local))
        outs = dec.decode()
        jax.block_until_ready(outs[-1])
        frames = int(sum(dec.frame_counts))
        errors = int(dec.error_count)
        audio_s = float(dec.audio_seconds())

    # --- global metric reduction (the only cross-host collective) -------
    devs = jax.devices()                       # global device list
    mesh = Mesh(np.array(devs), axis_names=("hosts",))
    # contribute this host's metrics on ONE of its local devices
    contrib = np.zeros((len(jax.local_devices()), 3), np.float32)
    contrib[0] = (frames, errors, audio_s)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("hosts")), contrib)

    @jax.jit
    def reduce(x):
        return x.sum(axis=0)

    tot = np.asarray(reduce(arr))
    return dict(frames=int(tot[0]), errors=int(tot[1]),
                audio_seconds=float(tot[2]),
                process_frames=frames)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--streams-dir", required=True)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force N virtual CPU devices (CI dryrun)")
    args = ap.parse_args(argv)

    import os
    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}")
    import jax
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    from pathlib import Path
    paths = sorted(Path(args.streams_dir).glob("*.aac"))
    shard = [p.read_bytes() for i, p in enumerate(paths)
             if i % args.num_processes == args.process_id]
    out = decode_shard_and_reduce(shard)
    out["process_id"] = args.process_id
    out["num_devices"] = len(jax.devices())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
