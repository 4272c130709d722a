#!/usr/bin/env python
"""One-time extraction of ISO/MPEG-spec constant tables from the reference tree.

The HE-AAC decode path depends on a set of irreducible specification constants
(Huffman codebooks from ISO/IEC 13818-7 Tables A.2-A.13, scalefactor-band
offset tables from ISO/IEC 14496-3 Table 4.5.x, the SBR QMF prototype filter
and noise table from 14496-3 Table 4.A.87/4.A.88, PS prototype filters and
Huffman tables from 14496-3 8.6.4.x).  These are *data*, not code; this script
parses them out of the reference's table files (cited per-array below) into a
single committed ``heaac_tpu/tables/_data/ref_tables.npz`` so the framework has
no runtime dependency on the reference tree.

Run:  python tools/extract_ref_tables.py [/root/reference] [out.npz]
"""
import re
import sys
import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else "heaac_tpu/tables/_data/ref_tables.npz"
)

NUM_RE = re.compile(r"[-+]?(?:0[xX][0-9a-fA-F]+|\d+\.\d*(?:[eE][-+]?\d+)?|\.\d+(?:[eE][-+]?\d+)?|\d+)[fF]?")


def _read(path):
    with open(path, "r", errors="replace") as f:
        return f.read()


def _strip_comments(text):
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def parse_array(text, name, dtype, shape=None):
    """Parse `... name[..] = { numbers };` from C source into an ndarray."""
    m = re.search(
        r"\b" + re.escape(name) + r"\s*(?:\)|\])*\s*(?:\[[^\]]*\]\s*)*=\s*\{",
        text,
    )
    if not m:
        raise KeyError(f"array {name} not found")
    start = text.index("{", m.start())
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
    body = _strip_comments(text[start : end + 1])
    toks = NUM_RE.findall(body)
    vals = []
    for t in toks:
        if t.lower().lstrip("-+").startswith("0x"):
            vals.append(int(t, 16))
        elif "." in t or "e" in t or "E" in t:
            vals.append(float(t.rstrip("fF")))
        else:
            vals.append(int(t.rstrip("fF")))
    arr = np.asarray(vals, dtype=dtype)
    if shape is not None:
        arr = arr.reshape(shape)
    return arr


def parse_ptr_table(text, name):
    """Parse a table of identifiers, e.g. { swb_offset_1024_96, ... }."""
    m = re.search(r"\b" + re.escape(name) + r"\s*\[[^\]]*\]\s*=\s*\{", text)
    if not m:
        raise KeyError(f"pointer table {name} not found")
    start = text.index("{", m.start())
    end = text.index("}", start)
    body = _strip_comments(text[start + 1 : end])
    return [s.strip() for s in body.split(",") if s.strip()]


def main():
    out = {}

    # ---- libavcodec/aactab.c: AAC-LC/Main codebooks & band tables ----
    tab = _read(f"{REF}/libavcodec/aactab.c")
    out["num_swb_1024"] = parse_array(tab, "ff_aac_num_swb_1024", np.int32)
    out["num_swb_128"] = parse_array(tab, "ff_aac_num_swb_128", np.int32)
    out["pred_sfb_max"] = parse_array(tab, "ff_aac_pred_sfb_max", np.int32)
    out["scalefactor_code"] = parse_array(tab, "ff_aac_scalefactor_code", np.uint32)
    out["scalefactor_bits"] = parse_array(tab, "ff_aac_scalefactor_bits", np.int32)
    for i in range(1, 12):  # spectral codebooks 1..11 (ISO 13818-7 A.2-A.13)
        out[f"spec_codes_{i}"] = parse_array(tab, f"codes{i}", np.uint32)
        out[f"spec_bits_{i}"] = parse_array(tab, f"bits{i}", np.int32)
    # scalefactor-band offsets: resolve pointer tables to concrete arrays
    for kind, nswb in (("1024", None), ("128", None)):
        names = parse_ptr_table(tab, f"ff_swb_offset_{kind}")
        uniq = {}
        for n in names:
            if n not in uniq:
                uniq[n] = parse_array(tab, n, np.int32)
        maxlen = max(len(v) for v in uniq.values())
        stack = np.full((len(names), maxlen), -1, np.int32)
        for r, n in enumerate(names):
            stack[r, : len(uniq[n])] = uniq[n]
        out[f"swb_offset_{kind}"] = stack
    out["tns_max_bands_1024"] = parse_array(tab, "ff_tns_max_bands_1024", np.int32)
    out["tns_max_bands_128"] = parse_array(tab, "ff_tns_max_bands_128", np.int32)

    # ---- libavcodec/aacdectab.h: TNS coef maps + channel maps ----
    dectab = _read(f"{REF}/libavcodec/aacdectab.h")
    for suf, n in (("0_3", 8), ("1_3", 4), ("0_4", 16), ("1_4", 8)):
        out[f"tns_tmp2_map_{suf}"] = parse_array(
            dectab, f"tns_tmp2_map_{suf}", np.float32, (n,)
        )
    out["tags_per_config"] = parse_array(dectab, "tags_per_config", np.int32)
    # (aac_channel_layout_map is tiny and symbolic; defined directly in
    #  heaac_tpu/tables/aac_tables.py from the spec default configs.)

    # ---- libavcodec/aacsbrdata.h: SBR codebooks, QMF prototype, noise ----
    sbrdata = _read(f"{REF}/libavcodec/aacsbrdata.h")
    sbr_huff = [
        ("t_huffman_env_1_5dB", 121),
        ("f_huffman_env_1_5dB", 121),
        ("t_huffman_env_bal_1_5dB", 49),
        ("f_huffman_env_bal_1_5dB", 49),
        ("t_huffman_env_3_0dB", 63),
        ("f_huffman_env_3_0dB", 63),
        ("t_huffman_env_bal_3_0dB", 25),
        ("f_huffman_env_bal_3_0dB", 25),
        ("t_huffman_noise_3_0dB", 63),
        ("t_huffman_noise_bal_3_0dB", 25),
    ]
    for name, n in sbr_huff:
        out[f"sbr_{name}_bits"] = parse_array(sbrdata, f"{name}_bits", np.int32, (n,))
        out[f"sbr_{name}_codes"] = parse_array(sbrdata, f"{name}_codes", np.uint32, (n,))
    out["sbr_offset"] = parse_array(sbrdata, "sbr_offset", np.int32, (6, 16))
    # only the first 321 taps are stored; the rest is unfolded by odd
    # symmetry at init (reference aacsbr.c:117-123)
    out["sbr_qmf_window_us_half"] = parse_array(
        sbrdata, "sbr_qmf_window_us", np.float64, (321,)
    )
    out["sbr_noise_table"] = parse_array(
        sbrdata, "sbr_noise_table", np.float64, (512, 2)
    )

    # ---- libavcodec/aacpsdata.c: PS Huffman tables + band maps ----
    psdata = _read(f"{REF}/libavcodec/aacpsdata.c")
    ps_huff = [
        "huff_iid_df1", "huff_iid_dt1", "huff_iid_df0", "huff_iid_dt0",
        "huff_icc_df", "huff_icc_dt", "huff_ipd_df", "huff_ipd_dt",
        "huff_opd_df", "huff_opd_dt",
    ]
    for name in ps_huff:
        out[f"ps_{name}_bits"] = parse_array(psdata, f"{name}_bits", np.int32)
        out[f"ps_{name}_codes"] = parse_array(psdata, f"{name}_codes", np.uint32)
    out["ps_huff_offset"] = parse_array(psdata, "huff_offset", np.int32)
    out["ps_k_to_i_20"] = parse_array(psdata, "k_to_i_20", np.int32)
    out["ps_k_to_i_34"] = parse_array(psdata, "k_to_i_34", np.int32)
    out["ps_g1_Q2"] = parse_array(psdata, "g1_Q2", np.float64)

    # ---- libavcodec/aacps_tablegen.h: PS hybrid filter prototypes ----
    pstg = _read(f"{REF}/libavcodec/aacps_tablegen.h")
    out["ps_g0_Q8"] = parse_array(pstg, "g0_Q8", np.float64)
    out["ps_g0_Q12"] = parse_array(pstg, "g0_Q12", np.float64)
    out["ps_g1_Q8"] = parse_array(pstg, "g1_Q8", np.float64)
    out["ps_g2_Q4"] = parse_array(pstg, "g2_Q4", np.float64)

    np.savez_compressed(OUT, **out)
    total = sum(v.size for v in out.values())
    print(f"wrote {OUT}: {len(out)} arrays, {total} scalars")
    for k in sorted(out):
        print(f"  {k}: {out[k].shape} {out[k].dtype}")


if __name__ == "__main__":
    main()
