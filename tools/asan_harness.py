"""Parse-heavy drive of the native front-end (run via tools/asan_native.sh
with an ASan build preloaded).  Covers every native parser path the wire
emits — bench-class SCE lanes, CPE with device-M/S + EIGHT_SHORT, CPE
intensity (ch0 re-decode), all three CCE coupling points (dependent adds
+ deferred TNS), and a corruption storm — without touching the device.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import heaac_tpu.native as N  # noqa: E402

if os.environ.get("HEAAC_ASAN_SO"):
    N._SO = os.environ["HEAAC_ASAN_SO"]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from bench import make_distinct_streams  # noqa: E402
from heaac_tpu.bitstream.aac_syntax import T as TT  # noqa: E402
from heaac_tpu.codec.batch import QwirePipelinedDecoder  # noqa: E402
from heaac_tpu.codec.encoder import AacEncoder  # noqa: E402
from heaac_tpu.io.heaac_testgen import (SbrStreamWriter,  # noqa: E402
                                        splice_cce_into_lc,
                                        splice_sbr_into_lc,
                                        splice_sbr_multi)


def parse_all(dec, group, reps=2):
    for _ in range(reps):
        for _try in range(6):
            if dec._parse_group(group, 0, dec.group_T[0]) is not None:
                break
            dec._grow()
        else:
            raise RuntimeError("kept overflowing")


def main():
    streams = make_distinct_streams(16)
    parse_all(QwirePipelinedDecoder(streams, group_streams=16), streams, 3)
    print("bench parse ok", flush=True)

    sr = 24000
    rng = np.random.default_rng(4)
    t = np.arange(int(sr * 1.5)) / sr
    mid = 0.05 * np.sin(2 * np.pi * 700 * t) \
        + 0.005 * rng.standard_normal(len(t))
    side = 0.01 * np.sin(2 * np.pi * 1900 * t)
    L, R = mid + side, mid - side
    for p in range(512, len(L) - 96, 2048):
        L[p:p + 96] += np.hanning(96) * 2.0
        R[p:p + 96] += np.hanning(96) * 2.0
    pcm16 = np.clip(np.stack([L, R], 1) * 3000,
                    -32768, 32767).astype(np.int16)
    lo1 = 0.3 * np.sin(2 * np.pi * 400 * t)
    hi = 0.2 * np.sin(2 * np.pi * 5200 * t)
    ipcm = np.clip(np.stack([lo1 + hi, lo1 * 0.9 + 0.6 * hi], 1) * 4000,
                   -32768, 32767).astype(np.int16)
    sbrw = lambda cpe: SbrStreamWriter(core_rate=sr, is_cpe=cpe,
                                       env_hi_shift=-12, seed=7,
                                       invf_modes=(0,))
    cases = [
        ("ms+short", splice_sbr_into_lc(
            AacEncoder(sr, 2, bitrate=64000, ms=True,
                       window_switching=True).encode(pcm16), sbrw(True))),
        ("ms+intensity", splice_sbr_into_lc(
            AacEncoder(sr, 2, bitrate=48000, ms=True, intensity=True,
                       window_switching=False).encode(ipcm), sbrw(True))),
    ]
    core = AacEncoder(sr, 1, bitrate=32000, window_switching=False).encode(
        np.clip(0.3 * np.sin(2 * np.pi * 600 * t) * 3000,
                -32768, 32767).astype(np.int16))
    for point in ("before", "between", "after"):
        cce = splice_cce_into_lc(core, coupling_point=point)
        w = SbrStreamWriter(core_rate=sr, is_cpe=False, env_hi_shift=-12,
                            seed=3, invf_modes=(0,))
        cases.append((f"cce_{point}",
                      splice_sbr_multi(cce, {(TT.TYPE_SCE, 0): w})))
    # AAC-Main: per-lane predictor state + value-token capture
    # (apply_main_prediction); mono SCE and stereo non-common CPE
    main_m = AacEncoder(sr, 1, bitrate=32000, object_type=1).encode(
        np.clip(0.3 * np.sin(2 * np.pi * 600 * t) * 3000,
                -32768, 32767).astype(np.int16))
    cases.append(("main_sce+sbr", splice_sbr_into_lc(main_m, sbrw(False))))
    cases.append(("main_cpe",
                  AacEncoder(sr, 2, bitrate=64000, object_type=1)
                  .encode(pcm16)))
    # 10-band PS: native-resolution iid/icc rows (PS_KND wire kinds)
    from heaac_tpu.io.heaac_testgen import PsStreamWriter
    ps10 = SbrStreamWriter(core_rate=sr, is_cpe=False, env_hi_shift=-12,
                           seed=5, invf_modes=(0,),
                           ps_writer=PsStreamWriter(seed=9, iid_mode=0,
                                                    icc_mode=0))
    cases.append(("ps_10band", splice_sbr_into_lc(core, ps10)))
    for name, st in cases:
        parse_all(QwirePipelinedDecoder([st] * 4, group_streams=4),
                  [st] * 4)
        print(name, "parse ok", flush=True)

    rngc = np.random.default_rng(7)
    he = cases[0][1]
    for _trial in range(40):
        bad = bytearray(he)
        for _ in range(int(rngc.integers(1, 5))):
            bad[int(rngc.integers(7, len(bad)))] ^= int(
                rngc.integers(1, 256))
        try:
            parse_all(QwirePipelinedDecoder([bytes(bad)] * 4,
                                            group_streams=4),
                      [bytes(bad)] * 4, 1)
        except Exception:
            pass
    print("corruption storm ok", flush=True)
    print("ASAN CLEAN", flush=True)


if __name__ == "__main__":
    main()
