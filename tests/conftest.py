"""Test configuration.

Tests run on CPU with 8 virtual devices (per the multi-chip validation
strategy: shardings are exercised on a host-platform mesh; the same suite
runs unchanged on real TPUs). Must set env before jax initializes.
"""

import os

# Force CPU: correctness tests target the f64 parity path, and the ambient
# environment may pre-set JAX_PLATFORMS to a TPU platform. Set
# TPUBQ_TEST_TPU=1 to run the same suite on the real device.
_USE_TPU = bool(os.environ.get("TPUBQ_TEST_TPU"))
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# Persist XLA compilations across test runs (compiles dominate suite time).
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpubq_xla_cache_tests")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass
if not _USE_TPU:
    # The sandbox's site customization pins JAX_PLATFORMS to the TPU tunnel
    # even when the env var is overridden, so pin via config as well.
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """TPU runs select the device-meaningful subset.

    The f64 parity tests target CPU by design (and the tunneled TPU's
    remote compiler crashes on f64 programs — an environment limitation,
    the same programs pass on CPU); multi-device tests need the virtual
    CPU mesh. On TPU we run the compiled Pallas kernels and the float32
    hot paths — the code that actually executes on the chip in production.
    """
    if not _USE_TPU:
        return
    allow_files = {"test_pallas.py", "test_example.py"}
    skip = pytest.mark.skip(
        reason="f64-parity/multi-device test: CPU-targeted (axon TPU f64 "
        "compiler crashes; see .claude/skills/verify/SKILL.md)"
    )
    for item in items:
        name = item.fspath.basename
        if name in allow_files or "f32" in item.name or "float32" in item.name:
            continue
        item.add_marker(skip)
