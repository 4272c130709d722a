#!/usr/bin/env python
"""Benchmark: aggregate realtime factor for HE-AACv2 decode per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reported number is the HONEST end-to-end figure — the analogue of the
reference's bytes-in -> PCM-out loop (ffmpeg.c:1505 output_packet ->
avcodec_decode_audio3, libavcodec/utils.c:638): host bitstream parse of
every individual stream + plan upload + the whole-stream device decode,
pipelined (host parses stream group g+1 while the device decodes group g).
Every batch lane is parsed separately from its own byte buffer; the stream
set holds >= min(B, 512) genuinely distinct bitstreams (8 distinct LC
cores x distinct SBR/PS parameter streams).

North-star baseline: 5000x aggregate realtime HE-AACv2 48 kHz per chip
(BASELINE.json).  vs_baseline = value / 5000.
"""
import json
import os
import sys
import time

import numpy as np

# the fused graph takes minutes to compile cold on the axon backend;
# persist compilations across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.makedirs("/tmp/jaxcache", exist_ok=True)

FRAMES = 50


def make_distinct_streams(n: int) -> list:
    """n genuinely distinct HE-AACv2 streams (any n): 8 bundled distinct
    LC cores crossed with per-stream SBR/PS parameter streams (distinct
    seeds, spliced per stream).  Cached in /tmp after first generation
    (~50 ms/stream)."""
    from pathlib import Path

    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    repo_data = Path(__file__).parent / "benchdata"
    cores = [(repo_data / f"lc_core_24k_{i}.aac").read_bytes()
             for i in range(8)]
    out = []
    cache_dir = Path("/tmp/heaac_bench_distinct")
    cache_dir.mkdir(exist_ok=True)
    for i in range(n):
        c = cache_dir / f"s{i}.aac"
        if c.exists():
            out.append(c.read_bytes())
            continue
        for tries in range(8):
            # a rare parameter draw can overflow the single-FIL payload
            # bound (269 bytes); re-draw deterministically
            try:
                w = SbrStreamWriter(
                    core_rate=24000, is_cpe=False, env_hi_shift=-12,
                    seed=1000 + 7 * i + 1000003 * tries,
                    invf_modes=(0, 1, 2, 3),
                    ps_writer=PsStreamWriter(seed=2000 + 5 * i))
                he = splice_sbr_into_lc(cores[i % 8], w)
                break
            except AssertionError:
                continue
        else:
            raise RuntimeError(f"stream {i}: could not fit FIL payload")
        c.write_bytes(he)
        out.append(he)
    return out


def _require_device(timeout_s: int = 300) -> None:
    """Bound device discovery: jax.devices() hangs forever (no timeout,
    no exception) when the axon tunnel is down — emit an honest failure
    line instead of stalling the whole bench run."""
    import threading

    out: list = []

    def probe():
        import jax
        try:
            out.append(jax.devices())
        except Exception as e:  # noqa: BLE001 - report any backend error
            out.append(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if not out or isinstance(out[0], Exception):
        detail = (repr(out[0]) if out
                  else f"jax.devices() hung > {timeout_s}s (tunnel down)")
        print(json.dumps(dict(metric="aggregate_realtime_x", value=0.0,
                              unit="x_realtime", vs_baseline=0.0,
                              error=f"device backend unavailable: {detail}")))
        sys.stdout.flush()
        os._exit(1)  # the probe thread is wedged in-runtime; hard-exit


def main():
    _require_device()
    from heaac_tpu.codec.batch import QwirePipelinedDecoder

    # default B=512: every lane is a genuinely distinct bitstream.  Pass a
    # batch size argument for the larger configs (2048/4096); with
    # HEAAC_BENCH_ALL_DISTINCT=1 the pool grows to B distinct streams
    # (first generation ~50 ms/stream, then /tmp-cached) instead of
    # tiling the 512-stream pool.
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # group sizing (measured 2026-08-21, idle box): per-scan fixed cost is
    # ~6 ms regardless of lane count up to 512, so B<=512 wants ONE group
    # (9,920x vs 9,171x at G=256, 7,811x at G=128); larger batches keep
    # 512-lane groups so host parse overlaps the (throttled) upload
    group = int(os.environ.get("HEAAC_BENCH_GROUP", "0")) or min(B, 512)

    pool = B if os.environ.get("HEAAC_BENCH_ALL_DISTINCT") else min(B, 512)
    distinct = make_distinct_streams(pool)
    # every lane is its own byte buffer, parsed individually
    streams = [distinct[i % len(distinct)] for i in range(B)]

    dec = QwirePipelinedDecoder(streams, group_streams=min(group, B))
    # warm-up: compiles the scan for this (G, T) shape + touches buffers
    dec.decode()
    audio_s = dec.audio_seconds()

    # component diagnostics (VERDICT: report both numbers): host parse
    # alone, and the device scan alone on resident wire data
    import jax

    from heaac_tpu.codec.heaac_graph import (init_qwire_carry,
                                             qwire_scan_decoder)
    ngroups = (B + dec.G - 1) // dec.G
    t0 = time.perf_counter()
    dec.frame_counts = []
    wire_bytes = 0
    for gidx in range(ngroups):
        g = dec.streams[gidx * dec.G:(gidx + 1) * dec.G]
        if len(g) < dec.G:
            g = g + dec.streams[:dec.G - len(g)]
        r = dec._parse_group(g, gidx % 2)
        if r is not None:
            wire_bytes += r[1]
    parse_s = time.perf_counter() - t0
    nframes = sum(dec.frame_counts[:B]) or 1
    parse_us = parse_s / nframes * 1e6
    parse_x = audio_s / parse_s
    # wire size: heap payload (minus the shared silence template) plus the
    # 16 B record per frame-lane, per frame-lane
    from heaac_tpu.codec import qwire as _qw
    sil = len(dec._sil_payload)
    wire_bpfl = (wire_bytes - ngroups * sil) / (nframes * dec.nl) \
        + 4 * _qw.REC_W
    print(f"# parse-only: {parse_x:.0f}x ({parse_s:.3f}s, "
          f"{parse_us:.1f} us/frame/stream); wire {wire_bpfl:.0f} "
          "B/frame-lane", file=sys.stderr)
    heap, recs = dec._buffers(0)
    run = qwire_scan_decoder(dec.is34, dec.ds, dec.S, dec.rate_idx,
                             dec.NB, dec.MS, dec.NS, dec.SEC)
    hw = jax.device_put(heap[:dec._upload_w * 4].view(np.float32))
    rw = jax.device_put(recs.view(np.float32))
    jax.block_until_ready((hw, rw))
    t0 = time.perf_counter()
    outs = [run(hw, rw, init_qwire_carry(dec.L))[1] for _ in range(ngroups)]
    jax.block_until_ready(outs)
    dev_s = time.perf_counter() - t0
    dev_x = audio_s / dev_s
    print(f"# device-only: {dev_x:.0f}x ({dev_s:.4f}s)", file=sys.stderr)
    # MFU estimate: XLA-reported FLOPs of the compiled scan / f32 peak
    # (TPU v5e ~49 TFLOP/s f32; the IMDCT/QMF matmuls run HIGHEST
    # precision).  Best-effort: cost_analysis is not available on every
    # backend.
    mfu = None
    try:
        ca = run.lower(hw, rw, init_qwire_carry(dec.L)).compile()
        flops = float(ca.cost_analysis()["flops"])
        mfu = flops * ngroups / dev_s / 4.9e13
        print(f"# device flops/scan: {flops:.3e}; MFU(f32 peak): "
              f"{mfu:.3f}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# MFU estimate unavailable: {e!r}", file=sys.stderr)

    # sustained end-to-end: every rep re-parses every lane from its own
    # bytes, re-uploads the wire, and decodes on device, back to back.
    # The HEADLINE is the long-run aggregate (total audio / total wall
    # across all reps) — the steady-state number, not a best-of-burst;
    # per-rep figures and best/median print as diagnostics so rep decay
    # (transport-throttle exhaustion) is visible in the log.
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        dec.decode()
        wall = time.perf_counter() - t0
        walls.append(wall)
        print(f"# end-to-end rep: {audio_s / wall:.0f}x ({wall:.3f}s wall, "
              f"{audio_s:.0f}s audio)", file=sys.stderr)
    sustained = audio_s * len(walls) / sum(walls)
    best = audio_s / min(walls)
    med = audio_s / sorted(walls)[len(walls) // 2]
    print(f"# sustained (aggregate over {reps} reps): {sustained:.0f}x; "
          f"best {best:.0f}x; median {med:.0f}x", file=sys.stderr)
    # component fields ride the one JSON line (VERDICT r4 #2: component
    # regressions must fail loudly, not live in stderr prose) —
    # tools/bench_gate.py compares these against the previous round.
    print(json.dumps({
        "metric": "sustained_end_to_end_realtime_factor_heaacv2_48k_per_chip",
        "value": round(sustained, 2),
        "unit": "x_realtime",
        "vs_baseline": round(sustained / 5000.0, 4),
        "best_x": round(best, 2),
        "median_x": round(med, 2),
        "parse_only_x": round(parse_x, 2),
        "parse_us_per_frame": round(parse_us, 3),
        "device_only_x": round(dev_x, 2),
        "wire_bytes_per_frame_lane": round(wire_bpfl, 1),
        "mfu_f32": round(mfu, 4) if mfu is not None else None,
        "batch": B,
        "reps": reps,
        "group": group,
    }))


if __name__ == "__main__":
    main()
