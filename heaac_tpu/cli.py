"""tpuaac command-line decoder: ADTS AAC / HE-AAC in, WAV (or raw PCM) out.

The FATE-style end-to-end harness mirroring the reference `ffmpeg -i in.aac
out.wav` decode loop (ffmpeg.c), minus the unrelated container/filter
machinery.  Usage:

    python -m heaac_tpu.cli -i in.aac out.wav
    python -m heaac_tpu.cli -i in.aac -f s16le out.pcm
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def probe(data: bytes) -> dict:
    """Inspect an ADTS stream without decoding it (the ffprobe.c analogue):
    configuration from the headers plus a cheap scan of the first frames'
    element layout for SBR/PS fill data (aacdec.c:1650 ext payload ids)."""
    from .bitstream.adts import parse_adts_header, split_adts_stream
    from .bitstream.reader import BitReader

    frames = split_adts_stream(data)
    hdr = parse_adts_header(BitReader(frames[0][:7]))
    # SBR/PS presence: look for a FIL extension payload with
    # EXT_SBR_DATA(_CRC) (0xD/0xE) in the first frames; PS implies
    # chan_config 1 + the PS extension inside the SBR payload, detected
    # conservatively via the sbr syntax reader on one frame
    sbr = ps = False
    ext_rate = hdr.sample_rate
    try:
        from .codec.batch import QwirePlanningDecoder
        dec = QwirePlanningDecoder(adts_probe=frames[0][:7])
        dec.decode_frame(frames[0])
        if len(frames) > 1:
            dec.decode_frame(frames[1])
        m = dec.m4ac
        sbr = m.sbr == 1
        ps = m.ps == 1
        if sbr:
            ext_rate = m.ext_sample_rate or 2 * m.sample_rate
    except Exception:
        pass
    dur = len(frames) * (2048 if sbr and ext_rate > hdr.sample_rate
                         else 1024) / max(ext_rate, 1)
    return dict(
        format="adts",
        object_type=hdr.object_type,
        profile={1: "Main", 2: "LC", 3: "SSR", 4: "LTP"}.get(
            hdr.object_type, str(hdr.object_type)),
        core_sample_rate=hdr.sample_rate,
        output_sample_rate=ext_rate,
        channel_config=hdr.chan_config,
        sbr=sbr, ps=ps,
        codec=("HE-AACv2" if ps else "HE-AAC" if sbr else "AAC"),
        frames=len(frames),
        duration_s=round(dur, 3),
        bit_rate=round(8 * len(data) / dur) if dur else 0,
    )


def _run_m4a_direct(args, data: bytes) -> int:
    """Decode/probe an .m4a whose ASC is not ADTS-representable
    (explicit hierarchical SBR signaling or in-band-PCE layouts)."""
    import json as _json

    from . import decode_m4a
    from .bitstream.asc import parse_audio_specific_config
    from .io.mp4 import demux_m4a
    from .io.wav import write_wav

    t = demux_m4a(data)
    c = parse_audio_specific_config(t.asc)
    if args.probe:
        out_rate = c.ext_sample_rate or c.sample_rate
        sbr = c.sbr == 1
        dur = len(t.frames) * (2048 if sbr and out_rate > c.sample_rate
                               else 1024) / max(out_rate, 1)
        print(_json.dumps(dict(
            format="m4a", object_type=c.object_type,
            profile={1: "Main", 2: "LC"}.get(c.object_type,
                                             str(c.object_type)),
            core_sample_rate=c.sample_rate, output_sample_rate=out_rate,
            channel_config=c.chan_config, sbr=sbr, ps=c.ps == 1,
            codec=("HE-AACv2" if c.ps == 1 else "HE-AAC" if sbr
                   else "AAC"),
            frames=len(t.frames), duration_s=round(dur, 3),
            bit_rate=round(8 * sum(len(f) for f in t.frames) / dur)
            if dur else 0), indent=2))
        return 0
    if args.output is None:
        print("error: output path required (or use --probe)",
              file=sys.stderr)
        return 1
    pcm, rate = decode_m4a(data)
    fmt = args.format or ("wav" if args.output.endswith(".wav") else "s16le")
    if fmt == "wav":
        write_wav(args.output, pcm, rate)
    else:
        pcm.astype("<i2").tofile(args.output)
    print(f"decoded {len(pcm)} samples x {pcm.shape[1]} ch @ {rate} Hz",
          file=sys.stderr)
    return 0


def main(argv=None) -> int:
    # HEAAC_PLATFORM=cpu pins the backend (CI runs the CLI as a
    # subprocess, where the axon site hook would otherwise pick the TPU
    # and hang if the tunnel is down; env vars alone don't override it —
    # the config update after import does)
    import os
    plat = os.environ.get("HEAAC_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    ap = argparse.ArgumentParser(prog="tpuaac")
    ap.add_argument("-i", "--input", required=True, help="input ADTS file")
    ap.add_argument("output", nargs="?", default=None,
                    help="output .wav or raw pcm path")
    ap.add_argument("--probe", action="store_true",
                    help="print stream info as JSON without decoding "
                         "(ffprobe analogue)")
    ap.add_argument("-f", "--format", choices=("wav", "s16le"), default=None)
    ap.add_argument("--benchmark", action="store_true",
                    help="print timing metrics to stderr")
    ap.add_argument("--no-native", action="store_true",
                    help="disable the native host front-end")
    ap.add_argument("--profile", metavar="LOGDIR",
                    help="capture a jax.profiler trace of the decode")
    ap.add_argument("--bit-trace", action="store_true",
                    help="log every bitstream read to stderr "
                         "(get_bits_trace analogue; forces the slow path)")
    args = ap.parse_args(argv)

    from .bitstream.adts import probe_adts
    from .codec.decoder import Decoder
    from .io.wav import write_wav
    from .utils.metrics import DecodeMetrics

    data = open(args.input, "rb").read()
    container = None
    from .io.mp4 import Mp4Error, m4a_to_adts, probe_m4a
    if probe_m4a(data):
        # MP4/M4A input (the mov.c path): re-wrap the AAC track as ADTS
        # so the whole pipeline below is format-agnostic; tracks ADTS
        # cannot carry (explicit SBR signaling, the usual shape of
        # encoder-written HE-AAC .m4a files) decode via the
        # ASC-configured path instead
        container = "m4a"
        try:
            data = m4a_to_adts(data)
        except Mp4Error:
            return _run_m4a_direct(args, data)
    if probe_adts(data) is None:
        print("error: input is neither an ADTS stream nor an MP4 file",
              file=sys.stderr)
        return 1
    if args.probe:
        info = probe(data)
        if container:
            info["format"] = container
        print(json.dumps(info, indent=2))
        return 0
    if args.output is None:
        ap.error("output path required (or use --probe)")

    from .bitstream.adts import parse_adts_header, split_adts_stream
    from .bitstream.reader import BitReader

    hdr = parse_adts_header(BitReader(data[:7]))
    nframes = len(split_adts_stream(data))
    met = DecodeMetrics(streams=1).start()
    err_count = 0
    import contextlib

    from .utils.trace import device_trace
    prof = device_trace(args.profile) if args.profile \
        else contextlib.nullcontext()
    with prof:
        if args.bit_trace:
            from .bitstream.reader import TracingBitReader
            dec = Decoder(adts_probe=data[:7],
                          bitreader_cls=TracingBitReader)
            pcm = dec.decode(data)
            err_count = dec.error_count
        else:
            try:
                # fast path: whole-stream batched decode (one dispatch)
                from .codec.batch import decode_batch
                pcm = decode_batch([data])[0]
            except Exception:
                dec = Decoder(adts_probe=data[:7],
                              use_native=False if args.no_native else None)
                pcm = dec.decode(data)
                err_count = dec.error_count
    met.stop()
    # output rate: 2048-sample frames mean SBR doubled the rate
    upsampled = nframes and len(pcm) // nframes >= 2048
    sample_rate = hdr.sample_rate * (2 if upsampled else 1)
    met.frames_decoded = nframes
    met.frames_errored = err_count
    met.audio_seconds = len(pcm) / max(sample_rate, 1)

    fmt = args.format or ("wav" if args.output.endswith(".wav") else "s16le")
    if fmt == "wav":
        write_wav(args.output, pcm, sample_rate)
    else:
        pcm.astype("<i2").tofile(args.output)

    if args.benchmark:
        print(json.dumps(met.as_dict()), file=sys.stderr)
    print(f"decoded {len(pcm)} samples x {pcm.shape[1]} ch @ {sample_rate} Hz"
          f" ({err_count} frame errors)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
