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

    met = DecodeMetrics(streams=1).start()
    dec = Decoder(adts_probe=data[:7],
                  use_native=False if args.no_native else None)
    pcm = dec.decode(data)
    met.stop()
    met.frames_decoded = len(pcm) // 2048 if dec.m4ac.sbr == 1 else len(pcm) // 1024
    met.frames_errored = dec.error_count
    met.audio_seconds = len(pcm) / max(dec.sample_rate, 1)

    fmt = args.format or ("wav" if args.output.endswith(".wav") else "s16le")
    if fmt == "wav":
        write_wav(args.output, pcm, dec.sample_rate)
    else:
        pcm.astype("<i2").tofile(args.output)

    if args.benchmark:
        print(json.dumps(met.as_dict()), file=sys.stderr)
    print(f"decoded {len(pcm)} samples x {pcm.shape[1]} ch @ {dec.sample_rate} Hz"
          f" ({dec.error_count} frame errors)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
