"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware; set before any jax import.
"""
import os
import subprocess
from pathlib import Path

# hard assignment: the environment may export JAX_PLATFORMS=axon,
# and setdefault would silently run the suite on the tunnel TPU
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.makedirs("/tmp/jaxcache_tests", exist_ok=True)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon site hook (sitecustomize) calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# which overrides the env var -- force CPU at the config level too so the
# suite runs on the 8-virtual-device host mesh as designed
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Evict live jitted executables between test modules.

    A full-suite single process accumulates ~100 compiled scan variants;
    past that, the XLA CPU compiler segfaults compiling the next graph
    (reproducible at tests/test_spec_short.py in a full run, never in
    isolation).  The persistent compilation cache keeps the re-loads
    cheap; only the in-memory executables are dropped."""
    yield
    jax.clear_caches()
    # the graph builders memoize jitted closures keyed on static sizes;
    # drop them so the cleared executables are not resurrected stale
    from heaac_tpu.codec import heaac_graph
    for name in dir(heaac_graph):
        fn = getattr(heaac_graph, name)
        if callable(fn) and hasattr(fn, "cache_clear"):
            fn.cache_clear()


REPO = Path(__file__).resolve().parent.parent
REFBUILD = Path(os.environ.get("REFBUILD", "/tmp/refbuild"))
HARNESS = REFBUILD / "harness"
STREAMS = Path("/tmp/heaac_test_streams")


def _have_reference() -> bool:
    return all((HARNESS / t).exists()
               for t in ("ref_decode", "ref_mov"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "golden: requires the built reference oracle")


# `-m smoke` subset (VERDICT r4 #5): one golden per decode path, <5 min
# warm-cache, so contributors get an honest fast loop instead of the
# hour-long cold full suite.  Curated per MODULE; membership is by
# coverage role, not speed alone.
SMOKE_MODULES = {
    "test_golden_lc.py",      # LC core vs the reference oracle
    "test_golden_sbr.py",     # SBR (HE-AACv1) goldens
    "test_qwire.py",          # wire format + device scan parity
    "test_spec_huff.py",      # device spectral Huffman path
    "test_sbr_huff.py",       # device SBR row path (wire v5)
    "test_ps_huff.py",        # device PS parameter path
    "test_lane_isolation.py",  # per-lane failure isolation
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        if item.fspath.basename in SMOKE_MODULES:
            item.add_marker(_pytest.mark.smoke)


@pytest.fixture(scope="session")
def ref_harness():
    """Paths to the reference-linked harness binaries (builds them if the
    reference tree is available)."""
    if not _have_reference():
        if Path("/root/reference/configure").exists():
            subprocess.run(["sh", str(REPO / "tools/setup_reference.sh")],
                           check=True)
    if not _have_reference():
        pytest.skip("reference oracle not available")
    return {
        "imdct": str(HARNESS / "ref_imdct"),
        "decode": str(HARNESS / "ref_decode"),
        "encode": str(HARNESS / "ref_encode"),
        "sbr_dump": str(HARNESS / "ref_sbr_dump"),
        "mov": str(HARNESS / "ref_mov"),
    }


def gen_pcm(path: Path, sr: int, channels: int, seconds: float = 2.0,
            seed: int = 0) -> None:
    """Synthesize a spectrally-rich int16 PCM test signal with transients."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    chans = []
    for c in range(channels):
        x = (0.5 * np.sin(2 * np.pi * (150 + 1800 * t + 120 * c) * t)
             + 0.2 * np.sin(2 * np.pi * (2500 + 400 * c) * t)
             + 0.02 * rng.standard_normal(n))
        for p in range(sr // 4, n, sr // 3):
            x[p:p + 64] += np.hanning(64)[: max(0, min(64, n - p))] * 0.7
        chans.append(x)
    pcm = np.stack(chans, axis=-1)
    np.clip(pcm * 18000, -32768, 32767).astype(np.int16).tofile(path)


@pytest.fixture(scope="session")
def stream_factory(ref_harness):
    """Returns make(name, sr, ch, bitrate) -> (adts_path, golden_pcm_path)."""
    STREAMS.mkdir(exist_ok=True)

    def make(name: str, sr: int, ch: int, bitrate: int, seconds: float = 2.0,
             seed: int = 0):
        aac = STREAMS / f"{name}.aac"
        gold = STREAMS / f"{name}.gold.pcm"
        if not aac.exists():
            raw = STREAMS / f"{name}.raw.pcm"
            gen_pcm(raw, sr, ch, seconds, seed)
            subprocess.run([ref_harness["encode"], str(raw), str(sr),
                            str(ch), str(bitrate), str(aac)], check=True)
        if not gold.exists():
            subprocess.run([ref_harness["decode"], str(aac), str(gold)],
                           check=True, capture_output=True)
        return aac, gold

    return make
