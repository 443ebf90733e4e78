"""Multi-chip tile sharding over a ``jax.sharding.Mesh``.

The reference's only compute parallelism is static row-band decomposition
across CPU threads (src/server.rs:165-168: task t owns rows
[t*H/N, (t+1)*H/N)).  The TPU-native equivalent maps that row-band axis
onto the *device mesh*: a 1-D mesh over chips, each chip rendering a
disjoint row band of the frame via ``shard_map``:

- the scene (SoA arrays + BVH) is tiny and **replicated** on every chip;
- pixels are **sharded**: each device derives its own band origin from
  ``lax.axis_index`` — no cross-device communication in the hot loop at
  all, which is the ideal ICI story (zero collectives, perfect scaling);
- RNG keys fold in the device index: device d renders its band with
  ``fold_in(band_key, d)``.  The sharded render is deterministic, and each
  device's output is EXACTLY equal (bit-for-bit) to executing the same
  band function single-device with that folded key
  (tests/test_sharding.py::test_sharded_band_exact_equivalence).  Note
  this is a *different RNG stream* than the plain single-device
  ``Renderer`` schedule would use for those rows (which folds no device
  index), so whole-frame outputs agree statistically, not bitwise.

A ``psum`` over the per-device ray counters is the one collective, used
only for Mrays/s accounting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.scene import SceneArrays
from raytracer_tpu.ops.intersect import ScenePre
from raytracer_tpu.render import renderer as rnd

AXIS = "tiles"


def make_mesh(devices=None) -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


@functools.lru_cache(maxsize=64)
def _sharded_band_fn(
    cfg: RenderConfig, rows_per_dev: int, mesh: Mesh, shape_key, engine: str
):
    """A SEPARATE jit instance per (cfg, rows, mesh, scene-shape, engine)
    signature.

    One shared jit wrapper would be the natural choice, but reusing it
    across scenes whose traced programs prune different argument subsets
    (BVH vs no-BVH) trips an XLA replicated-execution bug on CPU
    ("Execution supplied 40 buffers but compiled program expected 44").
    Distinct jit objects have distinct caches and cannot cross-poison.
    ``shape_key`` exists purely to separate those caches.

    ``engine`` is the RESOLVED engine name (renderer.select_band_engine):
    the caller applies the scene/backend gate, so the CPU fake-device mesh
    always shards "regen" while a TPU pod slice shards the megakernel for
    its subset — each device runs the whole band kernel on its own rows
    (no collectives inside, so the Pallas call shards trivially).
    """
    band_fn = rnd._band_fn(engine)

    def run(scene, pre, y0, num_samples, key):
        def per_device(scene, pre, y0, num_samples, key):
            d = jax.lax.axis_index(AXIS)
            my_y0 = y0 + d.astype(jnp.int32) * rows_per_dev
            my_key = jax.random.fold_in(key, d)
            sums, rays = band_fn(
                scene, pre, cfg, my_y0, rows_per_dev, num_samples, my_key
            )
            return sums, jax.lax.psum(rays, AXIS)

        shard = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),  # everything replicated in
            out_specs=(P(AXIS), P()),  # bands sharded, ray count replicated
            check_vma=False,
        )
        return shard(scene, pre, y0, num_samples, key)

    return jax.jit(run)


def render_bands_sharded(
    scene: SceneArrays,
    pre: ScenePre,
    cfg: RenderConfig,
    y0: Array,  # scalar i32: first render-space row of the whole span
    rows_per_dev: int,
    num_samples: Array,  # scalar i32 samples per subpixel (dynamic)
    key: Array,
    mesh: Mesh,
) -> tuple[Array, Array]:
    """Render ``n_dev * rows_per_dev`` rows across the mesh in one dispatch.

    Device d renders rows [y0 + d*rows_per_dev, y0 + (d+1)*rows_per_dev).
    Returns (sums [n_dev*rows_per_dev, W, 4, 3] sharded over rows, total
    rays i32 replicated).
    """
    shape_key = tuple(
        (x.shape, str(x.dtype)) for x in jax.tree.leaves((scene, pre))
    )
    engine = rnd.select_band_engine(scene, cfg)
    if cfg.engine != engine:  # normalize the static key (see renderer.py)
        import dataclasses

        cfg = dataclasses.replace(cfg, engine=engine)
    fn = _sharded_band_fn(cfg, rows_per_dev, mesh, shape_key, engine)
    return fn(scene, pre, y0, num_samples, key)


class ShardedRenderer(rnd.Renderer):
    """Renderer whose bands are distributed across a device mesh.

    Single-device meshes degrade to the plain ``Renderer`` schedule, so the
    same code path serves the one-chip container and a v5e pod slice.
    """

    def __init__(self, scene, cfg: RenderConfig | None = None, mesh: Mesh | None = None):
        super().__init__(scene, cfg)
        assert (cfg or RenderConfig()).engine in ("regen", "mega"), (
            "ShardedRenderer supports the streaming engines only"
        )
        self.mesh = mesh or make_mesh()
        self.n_dev = self.mesh.devices.size

    def _band_rows(self, k: int, budget: int | None = None) -> int:
        # Split the frame into the fewest equal per-device bands such that
        # one dispatch stays near the lane budget *per device*; the final
        # band may overshoot H (render_image clips the excess rows).
        cfg = self.cfg
        lanes_per_row = cfg.width * 4 * (1 if cfg.engine != "simple" else k)
        target = max(1, (budget or cfg.rays_per_pass) // lanes_per_row)
        n_bands = max(1, -(-cfg.height // (target * self.n_dev)))
        n_bands = min(n_bands, self.MAX_BANDS)  # large-frame dispatch cap
        rows_per_dev = -(-cfg.height // (n_bands * self.n_dev))
        return rows_per_dev * self.n_dev

    def _delivery_rows(self, target: int) -> int:
        # Sharded bands need not divide the frame height (render_image clips
        # the overshoot) but must stay a device-count multiple.
        return self.n_dev * max(1, target // self.n_dev)

    def render_band_sums(
        self, y0: int, rows: int, k: int, n_passes: int, salt: int = 0,
        return_rays: bool = False,
    ):
        assert rows % self.n_dev == 0
        sums, rays = render_bands_sharded(
            self.scene, self.pre, self.cfg,
            jnp.int32(y0), rows // self.n_dev, jnp.int32(k * n_passes),
            self._band_key(y0, salt), self.mesh,
        )
        if return_rays:
            return sums, rays
        self.ray_counts.append(rays)
        return sums
