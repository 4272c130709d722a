"""tools/bench_gate.py: component-field regression gate logic.

The gate is the round-5 answer to VERDICT r4 #2 — a device-time loss like
round 4's must fail loudly at commit time.  These tests exercise the
comparison logic against synthetic JSON files (no TPU, no bench run).
"""
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import bench_gate  # noqa: E402

BASE = {
    "metric": "sustained_end_to_end_realtime_factor_heaacv2_48k_per_chip",
    "value": 9000.0, "parse_only_x": 10000.0, "device_only_x": 90000.0,
    "wire_bytes_per_frame_lane": 400.0, "parse_us_per_frame": 4.2,
}


def _write(tmp_path, name, payload, wrap=False):
    p = tmp_path / name
    p.write_text(json.dumps({"parsed": payload} if wrap else payload))
    return str(p)


@pytest.mark.parametrize("wrap", [False, True])
def test_pass_when_equal(tmp_path, wrap):
    new = _write(tmp_path, "new.json", BASE)
    base = _write(tmp_path, "base.json", BASE, wrap=wrap)
    assert bench_gate.main([new, "--baseline", base]) == 0


def test_fail_on_headline_regression(tmp_path):
    new = _write(tmp_path, "new.json", {**BASE, "value": 7000.0})
    base = _write(tmp_path, "base.json", BASE)
    assert bench_gate.main([new, "--baseline", base]) == 1


def test_fail_on_device_only_regression(tmp_path):
    # the round-4 case: headline within noise, device-only down 29%
    new = _write(tmp_path, "new.json",
                 {**BASE, "value": 8800.0, "device_only_x": 64000.0})
    base = _write(tmp_path, "base.json", BASE)
    assert bench_gate.main([new, "--baseline", base]) == 1


def test_fail_on_wire_growth(tmp_path):
    new = _write(tmp_path, "new.json",
                 {**BASE, "wire_bytes_per_frame_lane": 480.0})
    base = _write(tmp_path, "base.json", BASE)
    assert bench_gate.main([new, "--baseline", base]) == 1


def test_tolerance_window(tmp_path):
    new = _write(tmp_path, "new.json", {**BASE, "value": 8200.0})  # -8.9%
    base = _write(tmp_path, "base.json", BASE)
    assert bench_gate.main([new, "--baseline", base]) == 0


def test_old_headline_only_baseline(tmp_path):
    # rounds 1-4 recorded only the headline: gate just that
    new = _write(tmp_path, "new.json", BASE)
    base = _write(tmp_path, "base.json",
                  {"metric": BASE["metric"], "value": 9100.0}, wrap=True)
    assert bench_gate.main([new, "--baseline", base]) == 0


def test_newest_baseline_selection(tmp_path):
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"parsed": {**BASE, "value": 500.0}}))
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"parsed": BASE}))
    path, payload = bench_gate.load_baseline(str(tmp_path))
    assert path.endswith("BENCH_r10.json")
    assert payload["value"] == 9000.0
