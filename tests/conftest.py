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
