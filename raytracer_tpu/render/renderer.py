"""Renderer: jit-compiled render passes + progressive accumulation.

The reference's render scheduler is a CPU thread pool over static row bands
(src/server.rs:157-199) with a serial per-pixel sample loop
(src/server.rs:320-364).  The TPU design instead batches
(pixel x subpixel x sample) lanes into wavefront passes, shaped by two
device realities:

- **Dispatch is expensive** (the device may sit behind a network tunnel;
  even locally each dispatch syncs host<->device).  So one dispatch renders
  a whole row band at its full sample count: a ``fori_loop`` over sample
  chunks accumulates per-subpixel sums entirely on device, and only the
  final band's sums (or the finished u8 pixels) cross back to the host.

- **Compiles are ~40s** and cached per shape.  So sample-chunk sizes are
  powers of two and band heights are divisors of the image height, giving
  a tiny closed set of compiled shapes per (scene, resolution).

The per-subpixel accumulation buffer IS a resumable checkpoint: progressive
refinement re-finalizes the running sums after every chunk (the reference
discards cancelled work entirely).

Finalization reproduces the reference's per-subpixel clamp-then-average and
gamma pipeline exactly (src/server.rs:360-368).
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.camera import camera_rays
from raytracer_tpu.models.scene import SceneArrays
from raytracer_tpu.ops.intersect import ScenePre, scene_precompute
from raytracer_tpu.render.integrator import radiance


def _pass_sums(
    scene: SceneArrays,
    pre: ScenePre,
    cfg: RenderConfig,
    px: Array,  # [Np] f32 pixel column
    py: Array,  # [Np] f32 pixel row in RENDER space (0 = bottom)
    k: int,  # samples per subpixel in this pass
    key: Array,
) -> Array:
    """Trace Np*4*k lanes -> per-subpixel radiance sums [Np, 4, 3]."""
    n_pix = px.shape[0]
    n = n_pix * 4 * k

    # Lane layout [Np, 4, k]: subpixel s -> (sx, sy) = (s % 2, s // 2); the
    # reference iterates sy outer, sx inner (src/server.rs:335-336) — order
    # is irrelevant to the estimate.
    lane_px = jnp.broadcast_to(px[:, None, None], (n_pix, 4, k)).reshape(n)
    lane_py = jnp.broadcast_to(py[:, None, None], (n_pix, 4, k)).reshape(n)
    s = jnp.arange(4, dtype=jnp.float32)
    lane_sx = jnp.broadcast_to((s % 2)[None, :, None], (n_pix, 4, k)).reshape(n)
    lane_sy = jnp.broadcast_to((s // 2)[None, :, None], (n_pix, 4, k)).reshape(n)

    jitter = jax.random.uniform(jax.random.fold_in(key, 0), (2, n))
    ro, rd = camera_rays(
        scene, cfg.width, cfg.height, cfg.fov_scale,
        lane_px, lane_py, lane_sx, lane_sy, jitter[0], jitter[1],
    )
    rad, rays = radiance(scene, pre, cfg, ro, rd, jax.random.fold_in(key, 1))
    return rad.reshape(n_pix, 4, k, 3).sum(axis=2), rays


def _render_band_impl(
    scene: SceneArrays,
    pre: ScenePre,
    cfg: RenderConfig,
    y0: Array,  # scalar i32: first RENDER-space row of the band
    rows: int,
    k: int,
    n_passes: int,
    key: Array,
) -> tuple[Array, Array]:
    """Render a row band at k*n_passes samples/subpixel in ONE dispatch.

    Returns (per-subpixel radiance sums [rows, W, 4, 3], rays-traced i32),
    both device arrays.
    """
    w = cfg.width
    n_pix = rows * w
    ys = y0 + jnp.arange(rows, dtype=jnp.int32)
    py = jnp.broadcast_to(ys[:, None], (rows, w)).reshape(n_pix).astype(jnp.float32)
    px = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.float32)[None, :], (rows, w)
    ).reshape(n_pix)

    def body(p, carry):
        sums, rays = carry
        s, r = _pass_sums(scene, pre, cfg, px, py, k, jax.random.fold_in(key, p))
        return sums + s, rays + r

    sums, rays = jax.lax.fori_loop(
        0, n_passes, body, (jnp.zeros((n_pix, 4, 3), jnp.float32), jnp.int32(0))
    )
    return sums.reshape(rows, w, 4, 3), rays


render_band = functools.partial(
    jax.jit, static_argnames=("cfg", "rows", "k", "n_passes")
)(_render_band_impl)


def _band_fn(engine: str):
    """The raw (unjitted) streaming band function for a resolved engine
    name — shared by the single-device jit wrapper below and the
    shard_map'd multi-chip path (parallel/mesh.py)."""
    if engine == "fused":
        from raytracer_tpu.render.wavefront_fused import render_band_fused as fn
    elif engine == "mega":
        from raytracer_tpu.ops.pallas.megakernel import render_band_mega as fn
    else:
        from raytracer_tpu.render.wavefront import render_band_regen as fn
    return fn


@functools.lru_cache(maxsize=4)
def _streaming_jit(engine: str):
    return functools.partial(jax.jit, static_argnames=("cfg", "rows"))(
        _band_fn(engine)
    )


def select_band_engine(scene, cfg) -> str:
    """Resolve ``cfg.engine`` to the engine actually dispatched for this
    scene on the current backend — the single gating policy for BOTH the
    single-device and the sharded path.  MIS renders always use the plain
    streaming engine (the fused one is NEE-only); the Pallas bounce
    megakernel ("mega") covers its register-resident subset (sphere/plane
    geometry, diffuse/specular, NEE, TPU backend) and falls back to
    "regen" otherwise."""
    engine = cfg.engine
    if engine == "fused" and cfg.use_mis:
        engine = "regen"
    if engine == "mega":
        from raytracer_tpu.ops.pallas.megakernel import supports_megakernel

        if not supports_megakernel(scene, cfg) or jax.default_backend() == "cpu":
            engine = "regen"
    return engine


def render_band_streaming(scene, pre, cfg, y0, rows, num_samples, key):
    """Jit wrapper for the streaming engines: num_samples is DYNAMIC so one
    compile per (cfg, rows) serves every spp.  Engine gating policy:
    ``select_band_engine``.  cfg.engine is normalized to the RESOLVED
    engine before it enters the jit static key, so scenes that fall back
    (e.g. mesh scenes under the "mega" default) share the fallback
    engine's compile cache instead of recompiling per requested-engine
    spelling."""
    import dataclasses

    engine = select_band_engine(scene, cfg)
    if cfg.engine != engine:
        cfg = dataclasses.replace(cfg, engine=engine)
    return _streaming_jit(engine)(scene, pre, cfg, y0, rows, num_samples, key)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def finalize_device(sums: Array, num_samples: int) -> Array:
    """Device-side finalize: sums [...,4,3] -> u8 RGB [...,3] (see finalize)."""
    mean = sums / jnp.float32(max(num_samples, 1))
    pixel = jnp.clip(mean, 0.0, 1.0).sum(axis=-2) * 0.25
    v = jnp.clip(pixel, 0.0, 1.0) ** (1.0 / 2.2) * 255.0 + 0.5
    return jnp.clip(jnp.floor(v), 0, 255).astype(jnp.uint8)


@jax.jit
def finalize_device_dyn(sums: Array, num_samples: Array) -> Array:
    """``finalize_device`` with a DYNAMIC sample count: the progressive
    serving path finalizes after every chunk with a growing divisor, and a
    static argument would recompile per chunk.  Device-side finalize also
    shrinks the device->host pull 16x (u8 RGB vs f32 subpixel sums) — on a
    tunneled TPU that transfer dominated the 1080p progressive pass gap
    (BENCHMARKS.md round 4)."""
    mean = sums / jnp.maximum(num_samples.astype(jnp.float32), 1.0)
    pixel = jnp.clip(mean, 0.0, 1.0).sum(axis=-2) * 0.25
    v = jnp.clip(pixel, 0.0, 1.0) ** (1.0 / 2.2) * 255.0 + 0.5
    return jnp.clip(jnp.floor(v), 0, 255).astype(jnp.uint8)


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


def _pow2_floor(n: int) -> int:
    return 1 << (max(n, 1).bit_length() - 1)


def _divisor_band(height: int, target: int) -> int:
    """Largest divisor of height that is <= target (>=1): keeps band shapes
    in a closed set so jit compiles once per (band, chunk) pair."""
    target = max(1, min(target, height))
    for r in range(target, 0, -1):
        if height % r == 0:
            return r
    return 1


def make_renderer(scene: SceneArrays, cfg: RenderConfig, sharded: bool | None = None):
    """Single policy for choosing the device topology (server AND tools).

    ``sharded=None``: shard row bands over the device mesh whenever more
    than one device is visible and the engine supports it (the TPU analog
    of the reference's available_parallelism() thread pool,
    src/server.rs:165-168), degrading to the plain single-device renderer
    otherwise.  ``True`` forces sharding (ValueError if the engine can't);
    ``False`` forces the single-device renderer.
    """
    if sharded is None:
        import jax

        sharded = len(jax.devices()) > 1 and cfg.engine in ("regen", "mega")
    elif sharded and cfg.engine not in ("regen", "mega"):
        raise ValueError("sharded rendering requires engine='regen' or 'mega'")
    if sharded:
        from raytracer_tpu.parallel.mesh import ShardedRenderer

        return ShardedRenderer(scene, cfg)
    return Renderer(scene, cfg)


class Renderer:
    """Per-scene render pipeline with row-band scheduling."""

    K_MAX = 16  # max samples/subpixel per fori chunk

    def __init__(self, scene: SceneArrays, cfg: RenderConfig | None = None):
        self.scene = scene
        self.cfg = cfg or RenderConfig()
        self.pre = scene_precompute(scene)
        self._base_key = jax.random.key(self.cfg.seed, impl=self.cfg.rng_impl)
        self.ray_counts: list = []

    # --- scheduling -------------------------------------------------------

    def plan(self, spp: int) -> tuple[int, int, int]:
        """(band_rows, k, n_passes) for a given spp: a dispatch renders k
        samples/subpixel; callers accumulate n_passes dispatches.

        num_samples = spp//4 per subpixel (reference integer split,
        src/server.rs:332).  k is a power of two; if k*n_passes overshoots
        num_samples the extra samples are *rendered and counted* (the
        estimate stays unbiased; all power-of-two spp are exact).

        BVH scenes dispatch ONE sample at a time over smaller bands: mesh
        traversal makes each bounce iteration orders of magnitude heavier,
        and multi-minute dispatches trip the TPU worker watchdog.
        """
        num_samples = spp // 4
        if num_samples >= 2**24:
            # The streaming engine's sample counter rides a 24-bit field of
            # the bit-packed lane-state column; see render_band_regen.
            raise ValueError(f"spp {spp} exceeds the 2^24 samples/subpixel cap")
        if num_samples <= 0:
            return self._band_rows(1), 1, 0
        if self.scene.use_bvh:
            return self._band_rows(1, self.cfg.mesh_rays_per_pass), 1, num_samples
        k = min(self.K_MAX, _pow2_floor(num_samples))
        n_passes = -(-num_samples // k)
        return self._band_rows(k), k, n_passes

    # Per-frame dispatch cap: the fixed lane budget that's right for 600x450
    # (9 bands) yields 72 dispatches per progressive pass at 1920x1080, and
    # every dispatch pays a fixed host+tunnel cost (~100ms measured on the
    # tunneled v5e).  Large frames therefore scale the band up to keep the
    # dispatch count bounded instead of the band size fixed.
    MAX_BANDS = 9

    def _band_rows(self, k: int, budget: int | None = None) -> int:
        cfg = self.cfg
        # The streaming engines use one lane per (pixel, subpixel) whatever
        # k is; the lockstep engine uses k lanes per subpixel.
        lanes_per_row = cfg.width * 4 * (1 if cfg.engine != "simple" else k)
        target = max(1, (budget or cfg.rays_per_pass) // lanes_per_row)
        target = max(target, -(-cfg.height // self.MAX_BANDS))
        return _divisor_band(cfg.height, target)

    # Minimum incremental deliveries per frame on the SERVING path: the
    # reference streams every 60-pixel window the moment it's rendered
    # (src/server.rs:168-191), so a client must never stare at a blank
    # canvas until the whole frame lands at once.
    DELIVERY_BANDS = 4

    def plan_delivery(self, spp: int) -> tuple[int, int, int]:
        """(band_rows, k, n_passes) for SERVING non-progressive renders.

        Same as ``plan`` except mesh (BVH) scenes cap the band height so the
        frame streams in >= DELIVERY_BANDS pieces: the batch plan's
        whole-frame band is ~6% faster end-to-end (BENCHMARKS.md round-3
        band sweep) but delivers zero pixels until the very end, which the
        reference's continuously-streaming clients never experience.  Batch
        callers (bench, tools) keep ``plan``'s whole-frame band.
        """
        rows, k, n_passes = self.plan(spp)
        if self.scene.use_bvh and n_passes > 0 and rows > 1:
            target = max(1, -(-self.cfg.height // self.DELIVERY_BANDS))
            if target < rows:
                rows = self._delivery_rows(target)
        return rows, k, n_passes

    def _delivery_rows(self, target: int) -> int:
        return _divisor_band(self.cfg.height, target)

    def plan_progressive(self, spp: int) -> tuple[int, int, int]:
        """(band_rows, k, n_chunks) for progressive refinement: chunks are
        sized so a full render always delivers several refinements."""
        num_samples = spp // 4
        if num_samples <= 0:
            return self._band_rows(1), 1, 0
        k = min(self.K_MAX, _pow2_floor(max(1, num_samples // 4)))
        n_chunks = -(-num_samples // k)
        return self._band_rows(k), k, n_chunks

    def iter_bands(self, spp: int, rows: int | None = None) -> Iterator[tuple[int, int]]:
        if rows is None:
            rows, _, _ = self.plan(spp)
        for y in range(0, self.cfg.height, rows):
            yield y, rows

    def _band_key(self, y0: int, salt: int = 0) -> Array:
        return jax.random.fold_in(jax.random.fold_in(self._base_key, y0), salt)

    # --- rendering --------------------------------------------------------

    def samples_rendered(self, spp: int) -> int:
        _, k, n_passes = self.plan(spp)
        return k * n_passes

    def render_band_sums(
        self, y0: int, rows: int, k: int, n_passes: int, salt: int = 0,
        return_rays: bool = False,
    ) -> Array:
        """Device sums [rows, W, 4, 3] for the band starting at render row y0.

        Rays traced are accumulated (lazily, as device scalars) on
        ``self.ray_counts`` for Mrays/s accounting — unless
        ``return_rays=True``, which instead returns ``(sums, rays)`` and
        leaves ``ray_counts`` untouched.  Concurrent callers sharing one
        renderer (the server's warm-up thread vs a client render) must use
        ``return_rays=True``: positional accounting on the shared list is
        racy, and unbounded ``ray_counts`` growth would pin device scalars
        for the life of a serving process.
        """
        # Every engine except the lockstep "simple" one is a streaming
        # engine with the (num_samples-dynamic) signature — including
        # "mega", whose TPU/support gating lives in render_band_streaming.
        if self.cfg.engine != "simple":
            sums, rays = render_band_streaming(
                self.scene, self.pre, self.cfg,
                jnp.int32(y0), rows, jnp.int32(k * n_passes),
                self._band_key(y0, salt),
            )
        else:
            sums, rays = render_band(
                self.scene, self.pre, self.cfg,
                jnp.int32(y0), rows, k, n_passes,
                self._band_key(y0, salt),
            )
        if return_rays:
            return sums, rays
        self.ray_counts.append(rays)
        return sums

    def rays_traced(self) -> int:
        """Total rays traced by this renderer so far (syncs the device)."""
        return int(sum(int(r) for r in self.ray_counts))

    def render_rows(self, y0: int, spp: int) -> tuple[np.ndarray, int] | None:
        """u8 RGB for one band -> ([rows, W, 3], rows); spp<4 renders black."""
        rows, k, n_passes = self.plan(spp)
        if n_passes == 0:
            return np.zeros((rows, self.cfg.width, 3), np.uint8), rows
        if self.scene.use_bvh:
            # One dispatch per k-sample chunk (device-side accumulation).
            sums = None
            for p in range(n_passes):
                out = self.render_band_sums(y0, rows, k, 1, salt=p)
                sums = out if sums is None else sums + out
        else:
            sums = self.render_band_sums(y0, rows, k, n_passes)
        img = finalize_device(sums, k * n_passes)
        return np.asarray(img), rows

    def render_image(self, spp: int, cancelled=None) -> np.ndarray | None:
        """Full image -> u8 [H, W, 3] with row 0 at the TOP (client space:
        the reference samples row height-y-1 under label y, src/server.rs:181)."""
        cfg = self.cfg
        img = np.zeros((cfg.height, cfg.width, 3), np.uint8)
        for y0, rows in self.iter_bands(spp):
            if cancelled is not None and cancelled():
                return None
            out = self.render_rows(y0, spp)
            if out is None:
                return None
            rgb, _ = out
            # Render rows [y0, y0+rows) land flipped at label rows
            # [H-y0-rows, H-y0).  Bands may overshoot H (sharded renderers
            # round up so every device gets equal rows); clip the excess.
            valid = min(rows, cfg.height - y0)
            img[cfg.height - y0 - valid : cfg.height - y0] = rgb[:valid][::-1]
        return img
