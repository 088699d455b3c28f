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
# (The full-suite segfault initially blamed on truncated cache entries was
# actually vm.max_map_count exhaustion — see _raise_map_count below; a
# cache-disabled run reproduced it. The `.dirty` marker below stays as
# cheap hygiene: a run killed mid-write CAN leave a truncated entry, and
# wiping on unclean exit costs one cold compile.)
# Per-platform dir: a TPU-subset run and a CPU run may be live at once,
# and the dirty-wipe must never pull entries out from under the other.
_CACHE_DIR = "/tmp/tpubq_xla_cache_tests" + ("_tpu" if _USE_TPU else "")
_DIRTY_MARKER = os.path.join(_CACHE_DIR, ".dirty")
def _proc_start_token(pid):
    """Process start time (field 22 of /proc/pid/stat, clock ticks since
    boot) — identifies a PID across reuse. None if unreadable."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read()
        # field 2 (comm) may contain spaces/parens; split after the last ')'
        return stat[stat.rindex(b")") + 2:].split()[19].decode()
    except (OSError, ValueError, IndexError):
        return None


def _marker_owner_alive():
    """The marker records its creator's PID + start time: a marker whose
    owner is still running is a CONCURRENT session (leave its cache alone),
    not a crashed one. The start-time token guards against PID reuse
    (ADVICE r3): a recycled PID would otherwise make a crashed session look
    live and skip the cache wipe."""
    try:
        with open(_DIRTY_MARKER) as f:
            parts = f.read().split()
        pid = int(parts[0]) if parts else 0
        if pid <= 0:
            # empty/corrupt marker (writer died mid-write): os.kill(0, 0)
            # would signal OUR process group and always "succeed" — treat
            # as a crashed owner so the cache gets wiped.
            return False
        os.kill(pid, 0)
        token = _proc_start_token(pid)
        if len(parts) >= 2 and token is not None and parts[1] != token:
            return False  # PID reused by an unrelated process
        return True
    except (OSError, ValueError):
        return False


try:
    import shutil

    if os.environ.get("TPUBQ_TEST_NO_CACHE"):
        raise RuntimeError("persistent compile cache disabled by env")
    if os.path.exists(_DIRTY_MARKER) and not _marker_owner_alive():
        shutil.rmtree(_CACHE_DIR, ignore_errors=True)
    os.makedirs(_CACHE_DIR, exist_ok=True)
    if not os.path.exists(_DIRTY_MARKER):
        with open(_DIRTY_MARKER, "w") as f:
            f.write(f"{os.getpid()} {_proc_start_token(os.getpid()) or ''}")
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass


def pytest_sessionfinish(session, exitstatus):
    # Clean exit (any exit status — even test failures mean no mid-write
    # kill): the cache entries are intact, keep them for the next run.
    # Only the marker's owner removes it (a concurrent session must not
    # clear another live session's crash sentinel).
    try:
        with open(_DIRTY_MARKER) as f:
            parts = f.read().split()
        if parts and int(parts[0]) == os.getpid():
            os.remove(_DIRTY_MARKER)
    except (OSError, ValueError):
        pass
if not _USE_TPU:
    # The sandbox's site customization pins JAX_PLATFORMS to the TPU tunnel
    # even when the env var is overridden, so pin via config as well.
    jax.config.update("jax_platforms", "cpu")


# SEGFAULT ROOT CAUSE (diagnosed round 3): a full-suite process accumulates
# memory mappings (~1 per compiled-executable code region, plus allocator
# fragmentation) at ~10k+/minute; the kernel default vm.max_map_count=65530
# is crossed late in the run, mmap starts failing, and LLVM/XLA dereferences
# the failure — "Fatal Python error: Segmentation fault" inside
# backend_compile_and_load at whatever test compiles next (deterministic
# position, history-dependent, cache-independent — all three observed
# signatures). Fix: raise the limit when privileged; otherwise bound the
# live-executable count by clearing JAX's in-memory caches between test
# modules (the persistent disk cache makes re-compiles cheap).
def _raise_map_count(target=1_000_000):
    try:
        with open("/proc/sys/vm/max_map_count", "r+") as f:
            if int(f.read()) >= target:
                return True
            f.seek(0)
            f.write(str(target))
        return True
    except (OSError, ValueError):
        return False


_MAP_COUNT_RAISED = _raise_map_count()


@pytest.fixture(autouse=True, scope="module")
def _bound_executable_maps():
    yield
    if not _MAP_COUNT_RAISED:
        jax.clear_caches()


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
