"""tpuaac command-line transcoder: ADTS AAC / HE-AAC / M4A in, WAV (or raw
PCM) out — and WAV in, AAC (ADTS or .m4a) out.

The FATE-style end-to-end harness mirroring the reference `ffmpeg -i in.aac
out.wav` decode loop (ffmpeg.c) and its `ffmpeg -i in.wav out.aac` encode
direction (aacenc.c via the same CLI), minus the unrelated container/filter
machinery.  Usage:

    python -m heaac_tpu.cli -i in.aac out.wav
    python -m heaac_tpu.cli -i in.aac -f s16le out.pcm
    python -m heaac_tpu.cli -i in.wav -b 64k out.aac
    python -m heaac_tpu.cli -i in.wav --coder anmr out.m4a
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


def _run_encode(args, path: str) -> int:
    """WAV in -> AAC out (the ffmpeg encode direction, aacenc.c analogue).

    Output container by extension: .aac/.adts = ADTS byte stream
    (adtsenc.c), .m4a/.mp4 = MP4 audio track (movenc.c audio-only layout).
    """
    from .codec.encoder import AacEncoder
    from .io.wav import read_wav

    if args.output is None:
        print("error: output path required", file=sys.stderr)
        return 1
    pcm, rate = read_wav(path)
    if pcm.shape[1] > 2:
        print(f"error: {pcm.shape[1]}-channel encode not supported "
              "(mono or stereo only)", file=sys.stderr)
        return 1
    bitrate = None
    if args.bitrate:
        s = args.bitrate.lower().rstrip("bps").rstrip(" ")
        bitrate = int(float(s[:-1]) * 1000) if s.endswith("k") else int(s)
    t0 = time.time()
    enc = AacEncoder(rate, pcm.shape[1],
                     object_type=1 if args.aot == "main" else 2,
                     bitrate=bitrate, coder=args.coder,
                     ms=args.ms, intensity=args.intensity)
    adts = enc.encode(pcm)
    wall = time.time() - t0

    out = args.output
    if out.endswith((".m4a", ".mp4")):
        from .io.adts import adts_to_asc
        from .io.mp4 import mux_m4a
        asc, frames = adts_to_asc(adts)
        payload = mux_m4a(frames, asc, rate, pcm.shape[1])
    else:
        payload = adts
    with open(out, "wb") as f:
        f.write(payload)
    dur = len(pcm) / max(rate, 1)
    if args.benchmark:
        print(json.dumps(dict(wall_s=round(wall, 3),
                              realtime_x=round(dur / wall, 2) if wall else 0,
                              bytes=len(payload))), file=sys.stderr)
    print(f"encoded {len(pcm)} samples x {pcm.shape[1]} ch @ {rate} Hz -> "
          f"{len(payload)} bytes "
          f"({round(8 * len(adts) / dur) if dur else 0} b/s)",
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
    ap.add_argument("-i", "--input", required=True,
                    help="input ADTS/.m4a file to decode, or .wav to encode")
    ap.add_argument("output", nargs="?", default=None,
                    help="output path: .wav/raw pcm (decode) or "
                         ".aac/.m4a (encode)")
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
    enc = ap.add_argument_group("encode options (WAV input)")
    enc.add_argument("-b", "--bitrate", default=None,
                     help="target bitrate, e.g. 64k or 128000")
    enc.add_argument("--aot", choices=("lc", "main"), default="lc",
                     help="audio object type (default lc)")
    enc.add_argument("--coder", choices=("twoloop", "anmr"),
                     default="twoloop",
                     help="scalefactor/codebook search strategy")
    enc.add_argument("--ms", action="store_true",
                     help="enable mid/side stereo coding")
    enc.add_argument("--intensity", action="store_true",
                     help="enable intensity stereo coding")
    args = ap.parse_args(argv)

    from .bitstream.adts import probe_adts
    from .codec.decoder import Decoder
    from .io.wav import write_wav
    from .utils.metrics import DecodeMetrics

    data = open(args.input, "rb").read()
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return _run_encode(args, args.input)
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
