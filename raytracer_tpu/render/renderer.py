"""Renderer: jit-compiled tile render passes + progressive accumulation.

The reference's render scheduler is a CPU thread pool over static row bands
(src/server.rs:157-199) with a serial per-pixel sample loop
(src/server.rs:320-364).  The TPU design instead batches
(pixel x subpixel x sample) lanes into wavefront passes:

- the image is processed in fixed-size row *tiles* (static shapes -> one
  compilation per (tile, samples-per-pass) pair);
- each pass traces ``tile_pixels * 4 subpixels * k samples`` lanes and
  returns per-subpixel radiance sums;
- sums accumulate across passes — the accumulation buffer IS a resumable
  checkpoint, enabling progressive spp refinement (the reference discards
  cancelled work entirely);
- finalization reproduces the reference's per-subpixel clamp-then-average
  and gamma pipeline exactly (src/server.rs:360-368).
"""

from __future__ import annotations

import functools
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.camera import camera_rays
from raytracer_tpu.models.scene import SceneArrays
from raytracer_tpu.ops.intersect import ScenePre, scene_precompute
from raytracer_tpu.render.integrator import radiance


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def render_pass(
    scene: SceneArrays,
    pre: ScenePre,
    cfg: RenderConfig,
    px: Array,  # [Np] i32 pixel column
    py: Array,  # [Np] i32 pixel row in RENDER space (0 = bottom)
    k: int,  # samples per subpixel in this pass
    key: Array,
) -> Array:
    """One wavefront pass -> radiance sums [Np, 4, 3] (sum over k samples)."""
    n_pix = px.shape[0]
    n = n_pix * 4 * k

    # Lane layout [Np, 4, k]: subpixel s -> (sx, sy) = (s % 2, s // 2); the
    # reference iterates sy outer, sx inner (src/server.rs:335-336) — order
    # is irrelevant to the estimate.
    lane_px = jnp.broadcast_to(px[:, None, None], (n_pix, 4, k)).reshape(n).astype(jnp.float32)
    lane_py = jnp.broadcast_to(py[:, None, None], (n_pix, 4, k)).reshape(n).astype(jnp.float32)
    s = jnp.arange(4, dtype=jnp.int32)
    lane_sx = jnp.broadcast_to((s % 2)[None, :, None], (n_pix, 4, k)).reshape(n).astype(jnp.float32)
    lane_sy = jnp.broadcast_to((s // 2)[None, :, None], (n_pix, 4, k)).reshape(n).astype(jnp.float32)

    jitter = jax.random.uniform(jax.random.fold_in(key, 0), (2, n))
    ro, rd = camera_rays(
        scene, cfg.width, cfg.height, cfg.fov_scale,
        lane_px, lane_py, lane_sx, lane_sy, jitter[0], jitter[1],
    )
    rad = radiance(scene, pre, cfg, ro, rd, jax.random.fold_in(key, 1))
    return rad.reshape(n_pix, 4, k, 3).sum(axis=2)


def finalize(sums: np.ndarray, num_samples: int) -> np.ndarray:
    """Per-subpixel sums [..., 4, 3] -> u8 RGB [..., 3].

    Reference pipeline: mean over samples, clamp to [0,1] per subpixel,
    x0.25 sum over subpixels (src/server.rs:360), then gamma:
    clamp, ^(1/2.2), *255 + 0.5, truncate (src/server.rs:366-368).
    """
    mean = sums / float(max(num_samples, 1))
    pixel = np.clip(mean, 0.0, 1.0).sum(axis=-2) * 0.25
    v = np.clip(pixel, 0.0, 1.0) ** (1.0 / 2.2) * 255.0 + 0.5
    return np.clip(np.floor(v), 0, 255).astype(np.uint8)


class Renderer:
    """Per-scene render pipeline with tile scheduling.

    ``tile_rows`` rows render per device dispatch; sample counts above
    ``k_max`` split into multiple passes (responsive cancellation, like the
    reference's per-60-pixel-window cancel checks, src/server.rs:170-172).
    """

    def __init__(
        self,
        scene: SceneArrays,
        cfg: RenderConfig | None = None,
        tile_rows: int = 16,
    ):
        self.scene = scene
        self.cfg = cfg or RenderConfig()
        self.tile_rows = tile_rows
        self.pre = scene_precompute(scene)
        self._base_key = jax.random.key(self.cfg.seed)

    def _tile_key(self, tile_id: int, pass_id: int) -> Array:
        return jax.random.fold_in(jax.random.fold_in(self._base_key, tile_id), pass_id)

    def _samples_per_pass(self, n_pix: int, num_samples: int) -> int:
        k = max(1, self.cfg.rays_per_pass // max(n_pix * 4, 1))
        return min(k, num_samples)

    def render_tile_sums(
        self,
        y0: int,
        rows: int,
        spp: int,
        cancelled: Callable[[], bool] | None = None,
    ) -> tuple[np.ndarray, int] | None:
        """Render render-space rows [y0, y0+rows) -> (sums [rows,W,4,3], num_samples).

        Returns None if cancelled mid-way.  ``spp`` follows the reference's
        integer split: num_samples = spp // 4 per subpixel
        (src/server.rs:332); spp < 4 renders black.
        """
        cfg = self.cfg
        w = cfg.width
        num_samples = spp // 4
        yy, xx = np.mgrid[y0 : y0 + rows, 0:w]
        px = jnp.asarray(xx.reshape(-1), jnp.int32)
        py = jnp.asarray(yy.reshape(-1), jnp.int32)
        n_pix = rows * w

        sums = np.zeros((n_pix, 4, 3), np.float32)
        done = 0
        pass_id = 0
        while done < num_samples:
            if cancelled is not None and cancelled():
                return None
            k = min(self._samples_per_pass(n_pix, num_samples), num_samples - done)
            out = render_pass(
                self.scene, self.pre, cfg, px, py, k, self._tile_key(y0, pass_id)
            )
            sums += np.asarray(out)
            done += k
            pass_id += 1
        return sums.reshape(rows, w, 4, 3), num_samples

    def render_rows(
        self, y0: int, rows: int, spp: int, cancelled=None
    ) -> np.ndarray | None:
        """u8 RGB for render-space rows [y0, y0+rows) -> [rows, W, 3]."""
        out = self.render_tile_sums(y0, rows, spp, cancelled)
        if out is None:
            return None
        sums, num_samples = out
        return finalize(sums, num_samples)

    def iter_tiles(self) -> Iterator[tuple[int, int]]:
        """(y0, rows) tile schedule covering the image in render space."""
        h = self.cfg.height
        y = 0
        while y < h:
            rows = min(self.tile_rows, h - y)
            yield y, rows
            y += rows

    def render_image(self, spp: int, cancelled=None) -> np.ndarray | None:
        """Full image -> u8 [H, W, 3] with row 0 at the TOP (client space:
        the reference samples row height-y-1 under label y, src/server.rs:181)."""
        cfg = self.cfg
        img = np.zeros((cfg.height, cfg.width, 3), np.uint8)
        for y0, rows in self.iter_tiles():
            out = self.render_rows(y0, rows, spp, cancelled)
            if out is None:
                return None
            # render row y maps to image (label) row H-1-y; a tile of
            # render rows [y0, y0+rows) lands flipped at labels
            # [H-y0-rows, H-y0).
            img[cfg.height - y0 - rows : cfg.height - y0] = out[::-1]
        return img
