#!/usr/bin/env python
"""Compare our SBR intermediates against a ref_sbr_dump binary, per frame.

Usage: python tools/compare_sbr_dump.py stream.aac dump.bin
"""
import sys

import numpy as np

from heaac_tpu import decode_adts
from heaac_tpu.ops import sbr_np

FIELDS = [
    ("ints", np.int32, (8,)),
    ("bw_array", np.float32, (5,)),
    ("alpha0", np.float32, (64, 2)),
    ("alpha1", np.float32, (64, 2)),
    ("W1", np.float32, (32, 32, 2)),
    ("X_low", np.float32, (32, 40, 2)),
    ("X_high", np.float32, (64, 40, 2)),
    ("e_orig", np.float32, (7, 48)),
    ("q_mapped", np.float32, (7, 48)),
    ("e_curr", np.float32, (7, 48)),
    ("gain", np.float32, (7, 48)),
    ("q_m", np.float32, (7, 48)),
    ("s_m", np.float32, (7, 48)),
    ("Y1", np.float32, (38, 64, 2)),
    ("X", np.float32, (2, 38, 64)),
    ("grid_ints", np.int32, (5,)),
    ("t_env", np.int32, (8,)),
    ("t_q", np.int32, (3,)),
    ("freq_res", np.int32, (7,)),
    ("env_facs", np.float32, (6, 48)),
    ("noise_facs", np.float32, (3, 5)),
    ("v_off", np.int32, (1,)),
    ("v0", np.float32, (2304,)),
]


def read_dump(path):
    raw = open(path, "rb").read()
    frames = []
    off = 0
    rec = sum(int(np.prod(s)) * 4 for _, _, s in FIELDS)
    while off + rec <= len(raw):
        d = {}
        for name, dt, shape in FIELDS:
            n = int(np.prod(shape))
            d[name] = np.frombuffer(raw, dt, n, off).reshape(shape)
            off += n * 4
        frames.append(d)
    return frames


def relerr(a, b):
    denom = max(np.abs(b).max(), 1e-3)
    return np.abs(a - b).max() / denom


def main():
    stream, dump = sys.argv[1], sys.argv[2]
    ref = read_dump(dump)
    sbr_np.DEBUG_SINK = []
    decode_adts(open(stream, "rb").read())
    ours = sbr_np.DEBUG_SINK
    print(f"{len(ref)} ref frames, {len(ours)} ours")
    for fi, (r, o) in enumerate(zip(ref, ours)):
        msgs = []
        kx_ref = r["ints"][:2].tolist()
        m_ref = r["ints"][2:4].tolist()
        if kx_ref != o["kx"] or m_ref != o["m"]:
            msgs.append(f"kx/m ref {kx_ref},{m_ref} ours {o['kx']},{o['m']}")
        if r["ints"][4] != o["f_indexnoise"]:
            msgs.append(f"indexnoise ref {r['ints'][4]} ours {o['f_indexnoise']}")
        if r["ints"][5] != o["f_indexsine"]:
            msgs.append(f"indexsine ref {r['ints'][5]} ours {o['f_indexsine']}")
        gi = r["grid_ints"]
        if "grid" in o and o["grid"] != gi.tolist():
            msgs.append(f"grid ref {gi.tolist()} ours {o['grid']}")
        if "t_env_arr" in o and o["t_env_arr"] != r["t_env"].tolist():
            msgs.append(f"t_env ref {r['t_env'].tolist()} ours {o['t_env_arr']}")
        if "t_q_arr" in o and o["t_q_arr"] != r["t_q"].tolist():
            msgs.append(f"t_q ref {r['t_q'].tolist()} ours {o['t_q_arr']}")
        if "e_a_arr" in o and o["e_a_arr"] != r["ints"][6:8].tolist():
            msgs.append(f"e_a ref {r['ints'][6:8].tolist()} ours {o['e_a_arr']}")
        num_env = int(gi[0])
        kx1, m1 = int(r["ints"][1]), int(r["ints"][3])
        ilo = 2 * int(r["t_env"][0]) + 2
        ihi = 2 * int(r["t_env"][num_env]) + 2
        ENV_FIELDS = {"e_orig", "q_mapped", "e_curr", "gain", "q_m", "s_m"}
        for name, _, _ in FIELDS[1:]:
            if name in ("grid_ints", "t_env", "t_q", "freq_res", "v_off",
                        "v0"):
                continue
            key = name
            if key not in o:
                continue
            mine = o[key]
            refv = r[name]
            if name in ENV_FIELDS:
                mine = mine[:num_env, :m1]
                refv = refv[:num_env, :m1]
            elif name == "X_high":
                mine = mine[kx1:kx1 + m1, ilo:ihi]
                refv = refv[kx1:kx1 + m1, ilo:ihi]
            if name == "X":
                # the reference synthesis negates odd imag columns in place
                # before this state is dumped (aacsbr.c:1205-1207)
                mine = mine.copy()
                mine[1][:32, 1::2] = -mine[1][:32, 1::2]
            e = relerr(mine, refv)
            if e > 1e-4:
                msgs.append(f"{name} relerr {e:.2e}")
        if msgs:
            print(f"frame {fi}: " + "; ".join(msgs))
    print("done")


if __name__ == "__main__":
    main()
