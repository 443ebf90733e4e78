"""Backend selection helpers for this container.

The container boots a tunneled TPU PJRT plugin via sitecustomize and
force-sets ``jax_platforms=axon,cpu`` (overriding JAX_PLATFORMS from the
env), so scripts that want the host CPU must update jax config after
import.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist jit compilations to disk across processes.

    The integrator's first compile is minutes over the tunneled-TPU remote
    compile path; caching makes server/bench cold starts fast after the
    first-ever run of each shape.
    """
    import jax

    path = path or os.environ.get("RT_JAX_CACHE", "/tmp/rt_jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Switch JAX to the host CPU backend (call before any JAX computation).

    With ``n_virtual_devices``, also split the host into N fake devices for
    multi-chip code paths (must run before the backend initializes).
    """
    if n_virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_virtual_devices}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
