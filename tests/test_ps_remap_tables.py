"""The device remap tables must reproduce the literal PS band maps.

codec/qwire ships iid/icc at native band resolution and remaps on
device via ps_np.REMAP_TABLES_*; every (to34, src_kind, full) combo
must match the validated _map_idx_* functions bin for bin, including
the C-truncation averages (34->20) and the zeroed tails."""
import numpy as np

from heaac_tpu.ops import ps_np


def _apply_table(tab, par):
    """out[i] = tdiv(sum_j w_j * par[s_j], den); den == 0 -> 0."""
    out = np.zeros(34, par.dtype)
    for i in range(34):
        s, w, den = tab[i, 0:4], tab[i, 4:8], int(tab[i, 8])
        if den == 0:
            continue
        num = int((par[s.astype(int)] * w).sum())
        out[i] = int(np.sign(num)) * (abs(num) // den)
    return out


def test_remap_tables_match_literal_maps():
    rng = np.random.default_rng(7)
    cases = [  # (full, src_kind, native_width, to34, literal fn)
        (1, 0, 10, 0, lambda p: ps_np._map_idx_10_to_20(p, 1)),
        (1, 2, 34, 0, lambda p: ps_np._map_idx_34_to_20(p, 1)),
        (1, 0, 10, 1, lambda p: ps_np._map_idx_10_to_34(p, 1)),
        (1, 1, 20, 1, lambda p: ps_np._map_idx_20_to_34(p, 1)),
        (0, 0, 5, 0, lambda p: ps_np._map_idx_10_to_20(p, 0)),
        (0, 2, 17, 0, lambda p: ps_np._map_idx_34_to_20(p, 0)),
        (0, 0, 5, 1, lambda p: ps_np._map_idx_10_to_34(p, 0)),
        (0, 1, 11, 1, lambda p: ps_np._map_idx_20_to_34(p, 0)),
        # identity kinds: _remap's fall-through copies par; the tables
        # zero past the target width, which is equivalent because the
        # syntax arrays are zero past the native width
        (1, 1, 20, 0, None), (1, 2, 34, 1, None),
        (0, 1, 11, 0, None), (0, 2, 17, 1, None),
    ]
    for full, kind, width, to34, fn in cases:
        tabs = (ps_np.REMAP_TABLES_FULL if full
                else ps_np.REMAP_TABLES_PART)
        tab = tabs[to34][kind]
        for trial in range(50):
            par = np.zeros(34, np.int64)
            par[:width] = rng.integers(-30, 31, width)
            want = fn(par) if fn is not None else par.copy()
            got = _apply_table(tab, par)
            np.testing.assert_array_equal(
                got, want,
                err_msg=f"full={full} kind={kind} to34={to34}")


def test_remap_tables_negative_truncation():
    """The 34->20 averages use C truncation toward zero (aacps.c _tdiv):
    (-1 + -2) // 2 would be -2 in Python floor division but must be -1."""
    par = np.zeros(34, np.int64)
    par[6], par[7] = -1, -2                     # out[4] = tdiv(-3, 2) = -1
    tab = ps_np.REMAP_TABLES_FULL[0][2]
    assert _apply_table(tab, par)[4] == -1
    assert ps_np._map_idx_34_to_20(par, 1)[4] == -1
