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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpuaac")
    ap.add_argument("-i", "--input", required=True, help="input ADTS file")
    ap.add_argument("output", help="output .wav or raw pcm path")
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
    if probe_adts(data) is None:
        print("error: input does not look like an ADTS stream",
              file=sys.stderr)
        return 1

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
