"""Multi-host input distribution + metric reduction (SURVEY §2.5 /
VERDICT r2 #5): two OS processes, each with its own virtual CPU devices,
each parsing and decoding its own stream shard, agreeing on the
all-reduced global DecodeMetrics."""
import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.golden
def test_two_process_decode_and_reduce(ref_harness, tmp_path):
    from test_golden_sbr import make_core

    from heaac_tpu.io.heaac_testgen import (PsStreamWriter, SbrStreamWriter,
                                            splice_sbr_into_lc)

    core = make_core(ref_harness, "sbr_core_m24", 24000, 1, 32000, 6)
    sdir = tmp_path / "streams"
    sdir.mkdir()
    n_streams, n_frames = 4, 6
    for i in range(n_streams):
        w = SbrStreamWriter(core_rate=24000, is_cpe=False, env_hi_shift=-12,
                            seed=60 + i, invf_modes=(0,),
                            ps_writer=PsStreamWriter(seed=70 + i))
        (sdir / f"s{i}.aac").write_bytes(splice_sbr_into_lc(core, w))

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    def run_workers():
        port = _free_port()
        procs = []
        for pid in range(2):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "heaac_tpu.parallel.multihost",
                 "--coordinator", f"127.0.0.1:{port}",
                 "--num-processes", "2", "--process-id", str(pid),
                 "--streams-dir", str(sdir), "--cpu-devices", "2"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True))
        out, errs = [], []
        for p in procs:
            so, se = p.communicate(timeout=540)
            errs.append((p.returncode, se))
            if p.returncode == 0:
                out.append(json.loads(so.strip().splitlines()[-1]))
        return out, errs

    outs, errs = run_workers()
    if len(outs) != 2 and any("DEADLINE_EXCEEDED" in se for _, se in errs):
        # Gloo's 30 s key-exchange deadline loses the race when both
        # workers cold-compile on this 1-core box; one retry (warm
        # compile caches) is deterministic
        outs, errs = run_workers()
    assert len(outs) == 2, f"worker failed:\n{errs[-1][1][-2000:]}"

    # both hosts computed the same global reduction
    assert outs[0]["frames"] == outs[1]["frames"] == n_streams * n_frames
    assert outs[0]["num_devices"] == 4      # 2 hosts x 2 virtual devices
    # and each decoded only its own shard
    assert outs[0]["process_frames"] + outs[1]["process_frames"] \
        == n_streams * n_frames
    assert 0 < outs[0]["process_frames"] < n_streams * n_frames
    np.testing.assert_allclose(
        outs[0]["audio_seconds"], n_streams * n_frames * 2048 / 48000,
        rtol=1e-6)
