"""Asyncio WebSocket render server.

Functional equivalent of the reference's Tokio server (src/server.rs):

- accepts WebSocket connections, assigns each a 5-letter id (:63-78)
- JSON control messages in: render / stop_rendering (:121-126)
- binary RenderedPixels messages out (wire.py), streamed as tiles finish
- one render at a time per connection, pre-cancelled job semantics
  (:147-154: a fresh job reports running()==False), message dispatch on
  (running, message) pairs (:93-113), render task detached (:98-106)
- cancellation observed between device passes (the reference checks
  between 60-pixel windows, :170-172; a TPU pass is the analogous unit)

Differences (documented):
- an unparseable message closes that connection with an error log (the
  reference panics the connection task via expect(), :92)
- resolution is configurable (reference hard-codes 600x450, :29-30);
  the default matches the reference
- optional extension fields in the render message: "width"/"height"
  (own render size) and "progressive": true to re-stream refined pixels
  after every sample chunk (reference clients never send these; serde in
  the reference would reject unknown fields silently? no — serde ignores
  unknown fields by default, so the extension is wire-compatible)
- requests with out-of-range width/height/spp close the connection
  (MAX_DIM/MAX_SPP below); the reference can't receive them at all
- with >1 visible device, renders are sharded over the device mesh
  (parallel/mesh.py), the TPU analog of the reference's thread pool
"""

from __future__ import annotations

import asyncio
import json
import logging
import random
import string
import threading
from collections import OrderedDict
from dataclasses import dataclass, field, replace

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import DEFAULT_PORT, RenderConfig
from raytracer_tpu.render.renderer import Renderer, finalize_device_dyn
from raytracer_tpu.server import wire

log = logging.getLogger("raytracer_tpu.server")

WIDTH = 600  # reference: src/server.rs:29-30
HEIGHT = 450

# Hostile-request guards.  The reference hard-codes 600x450 (src/server.rs:
# 29-30) so it cannot be resource-exhausted this way; our width/height
# extension must not become one.  Requests outside these bounds close the
# connection (same fate as an unknown scene).
MAX_DIM = 4096
MAX_SPP = 1 << 20
# Each cached renderer pins compiled executables + a device scene copy; keep
# an LRU so a client cycling through resolutions can't grow memory unboundedly.
MAX_RENDERERS = 8


class CancellationToken:
    """AtomicBool-equivalent cancel flag (reference: src/server.rs:226-251)."""

    def __init__(self) -> None:
        self._cancelled = threading.Event()

    def is_cancelled(self) -> bool:
        return self._cancelled.is_set()

    def cancel(self) -> bool:
        """Cancel; returns whether it was ALREADY cancelled (CAS semantics)."""
        already = self._cancelled.is_set()
        self._cancelled.set()
        return already

    def reset(self) -> None:
        self._cancelled.clear()


@dataclass
class RenderJob:
    """Per-connection render job; created pre-cancelled so running()==False."""

    send: "callable"  # async fn(bytes) -> None
    cancel_token: CancellationToken = field(default_factory=CancellationToken)

    def __post_init__(self) -> None:
        self.cancel_token.cancel()
        self.stats = None  # RenderStats of the most recent run()
        # Strong reference to the detached render task: the event loop keeps
        # only a WEAK reference to tasks (asyncio docs), so a long render
        # spawned with create_task() and then dropped could be
        # garbage-collected mid-flight.  handle_connection stores the task
        # here and a done-callback clears it.
        self.task: asyncio.Task | None = None

    def running(self) -> bool:
        return not self.cancel_token.is_cancelled()

    def stop(self) -> None:
        self.cancel_token.cancel()

    PASSES_PER_DISPATCH = 8  # cancellation granularity at high spp

    def mark_running(self) -> None:
        """Flip to running state synchronously, BEFORE the render task is
        scheduled — otherwise a render message arriving between dispatch and
        task startup would see running()==False and start a second render.
        (The reference has this same race between tokio::spawn and
        cancel_token.reset, src/server.rs:98-106,:164.)"""
        self.cancel_token.reset()

    async def run(
        self,
        renderer: Renderer,
        spp: int,
        progressive: bool = False,
        want_stats: bool = False,
        batch: bool = False,
    ) -> bool:
        """Render + stream; returns True if stopped before completion.

        Callers must flip the job to running via ``mark_running()`` before
        scheduling this coroutine (see above).

        Every render records a RenderStats summary (wall clock, rays,
        Mrays/s, bands) in ``self.stats`` — the serving-path observability
        the reference lacks entirely (SURVEY §5: the reference only times
        renders client-side, test-client/app.tsx:71).  ``want_stats=True``
        (render request extension field "stats") additionally sends the
        summary to the client as a JSON text message after the render;
        it is opt-in so stock reference clients never see a text frame.
        """
        from raytracer_tpu.utils.timing import RenderStats

        cancelled = self.cancel_token.is_cancelled
        height = renderer.cfg.height
        loop = asyncio.get_running_loop()
        stats = RenderStats()
        stats.pixels = renderer.cfg.width * height
        # spp delivered: the progressive plan renders k_p*n_chunks samples
        # per subpixel, the batch plan k*n_passes — they can differ for
        # non-power-of-two spp.
        if progressive:
            _, k_p_, n_chunks_ = renderer.plan_progressive(spp)
            stats.samples = k_p_ * n_chunks_ * 4
        else:
            stats.samples = renderer.samples_rendered(spp) * 4
        # This render's ray counters, accumulated locally: the renderer is
        # shared per-(scene,resolution) across connections and the warm-up
        # thread, so positional slices of renderer.ray_counts are racy.
        ray_counts: list = []
        bands = 0

        # Pixels per wire message: 60 at reference width (byte-identical
        # traffic to src/server.rs:145); wider custom frames use the
        # protocol's full u8 capacity (240 divides 1920) — at 1920x1080
        # progressive, 60-px messages meant 34,560 sends per refinement
        # pass and the per-send overhead (~0.1 ms) dominated the pass gap.
        ppm = wire.PIXELS_PER_MSG if renderer.cfg.width <= 600 else 240

        async def stream_rows(y0: int, rows: int, rgb: np.ndarray) -> None:
            # rgb is render-space rows [y0, y0+rows); wire labels are
            # flipped: label = height-1-y_render (src/server.rs:181).
            # Sharded bands round rows up to a device-count multiple; rows
            # past the frame bottom are padding and must not be streamed.
            valid = min(rows, height - y0)
            if batch:
                # Opt-in batched transport (render request "batch": true):
                # the band's standard chunks concatenated into FEW WebSocket
                # messages.  Chunk units stay byte-identical to the stock
                # protocol; only the framing coarsens (including cancellation
                # granularity: stop_rendering is observed between batched
                # sends instead of between per-chunk sends).  At 1920x1080
                # progressive the stock path is 8,640 awaited sends per
                # refinement pass (~0.1 ms each of per-send overhead) —
                # batching collapses that to a handful per band.  Each
                # message is capped below ~1 MiB so clients with
                # python-websockets' default max_size (2^20) survive a
                # MAX_DIM-sized band.
                bytes_per_row = 3 * rgb.shape[1] + 6 * (-(-rgb.shape[1] // ppm))
                rows_per_msg = max(1, (1 << 19) // bytes_per_row)
                for i0 in range(0, valid, rows_per_msg):
                    i1 = min(i0 + rows_per_msg, valid)
                    await self.send(
                        wire.pack_rows_batched(
                            height - 1 - (y0 + i0), rgb[i0:i1], ppm
                        )
                    )
                return
            for i in range(valid):
                y_label = height - 1 - (y0 + i)
                for msg in wire.pack_row(y_label, rgb[i], ppm):
                    await self.send(msg)

        _, k, n_passes = renderer.plan(spp)
        if n_passes == 0:
            # spp < 4: the reference's integer spp/4 yields zero samples and
            # streams black pixels (src/server.rs:332-360).
            black = np.zeros((renderer.cfg.width, 3), np.uint8)
            for y in range(height):
                if cancelled():
                    break
                await stream_rows(y, 1, black[None])
        elif progressive:
            # Re-stream the whole frame after every k-sample chunk; the
            # running per-band sums stay on device between chunks, and
            # finalize runs ON DEVICE so only u8 pixels cross the (possibly
            # tunneled) device->host link — pulling the f32 subpixel sums
            # instead (16x the bytes) dominated the 1080p pass gap.
            #
            # One-band-behind pipeline: JAX dispatch is async, so band k+1's
            # compute is ENQUEUED before band k's finished pixels are pulled
            # — the blocking pull + WS send of each band then overlaps the
            # next band's device compute instead of leaving the chip idle.
            rows_p, k_p, n_chunks = renderer.plan_progressive(spp)
            sums = {y0: None for y0, _ in renderer.iter_bands(spp, rows_p)}
            pending = None  # (y0, rows, device-side u8 rgb) not yet pulled

            # Per-sweep sample schedule.  The compiled band shape takes
            # num_samples as a DYNAMIC scalar, so sweeping the frame at a
            # small k first costs no extra compile: the first full image
            # lands in ~k0/k_p of a full sweep's time (the reference's
            # progressive UX is pixels-now, quality-later), and the stolen
            # samples are repaid in sweep 2 — steady-state pass time is
            # unchanged and the total sample count is exact.
            if n_chunks > 1 and k_p > 4:
                sched = [4, k_p - 4] + [k_p] * (n_chunks - 1)
            else:
                sched = [k_p] * n_chunks

            def dispatch(y0, chunk, kc, done):
                out, nrays = renderer.render_band_sums(
                    y0, rows_p, kc, 1, salt=chunk, return_rays=True
                )
                s = out if sums[y0] is None else sums[y0] + out
                rgb = finalize_device_dyn(s, jnp.int32(done))
                return s, nrays, rgb  # all device arrays — nothing synced

            done = 0
            for chunk, kc in enumerate(sched):
                if cancelled():
                    break
                done += kc
                for y0, rows in renderer.iter_bands(spp, rows_p):
                    if cancelled():
                        break
                    s, nrays, rgb_dev = await loop.run_in_executor(
                        None, dispatch, y0, chunk, kc, done
                    )
                    sums[y0] = s
                    ray_counts.append(nrays)
                    bands += 1
                    if pending is not None:
                        py0, prows, prgb = pending
                        arr = await loop.run_in_executor(None, np.asarray, prgb)
                        await stream_rows(py0, prows, arr)
                    pending = (y0, rows, rgb_dev)
            if pending is not None and not cancelled():
                py0, prows, prgb = pending
                arr = await loop.run_in_executor(None, np.asarray, prgb)
                await stream_rows(py0, prows, arr)
        else:
            # Reference-style delivery: each pixel streamed exactly once,
            # spatially as its band completes all samples.  Mesh scenes use
            # the delivery plan (>= DELIVERY_BANDS pieces instead of one
            # whole-frame band) so first pixels reach the client early —
            # the reference streams continuously (src/server.rs:168-191).
            rows_b, k, n_passes = renderer.plan_delivery(spp)
            g = 1 if renderer.scene.use_bvh else self.PASSES_PER_DISPATCH
            for y0, rows in renderer.iter_bands(spp, rows_b):
                if cancelled():
                    break
                sums = None
                for g0 in range(0, n_passes, g):
                    if cancelled():
                        break
                    out, nrays = await loop.run_in_executor(
                        None,
                        lambda y0=y0, g0=g0: renderer.render_band_sums(
                            y0, rows_b, k, min(g, n_passes - g0), salt=g0,
                            return_rays=True,
                        ),
                    )
                    ray_counts.append(nrays)
                    bands += 1
                    sums = out if sums is None else sums + out
                if sums is not None and not cancelled():
                    rgb = await loop.run_in_executor(
                        None,
                        lambda sums=sums: np.asarray(
                            finalize_device_dyn(sums, jnp.int32(k * n_passes))
                        ),
                    )
                    await stream_rows(y0, rows, rgb)

        # Finalize the per-render stats; syncing the device scalars here is
        # off the streaming path.
        stats.bands = bands
        stats.rays = int(sum(int(r) for r in ray_counts))
        self.stats = stats
        if want_stats and not cancelled():
            await self.send(json.dumps({"type": "render_stats", **stats.summary()}))
        was_stopped = self.cancel_token.cancel()
        return was_stopped


class Server:
    """WebSocket server over a set of loaded scenes."""

    def __init__(
        self,
        scenes: dict,
        cfg: RenderConfig | None = None,
        width: int = WIDTH,
        height: int = HEIGHT,
        sharded: bool | None = None,
    ) -> None:
        self.scenes = scenes
        self.base_cfg = cfg or RenderConfig()
        self.width = width
        self.height = height
        self.connections: set[str] = set()
        self._renderers: OrderedDict[tuple[str, int, int], Renderer] = OrderedDict()
        self._renderers_lock = threading.Lock()  # warm-up thread vs event loop
        # The reference's *entire* compute parallelism lives in its serve
        # path (row bands over available_parallelism() threads,
        # src/server.rs:157-199); the TPU equivalent is row bands over the
        # device mesh.  sharded=None: use every visible device, degrading
        # to the plain single-device renderer at n=1.  The sharded path
        # runs the streaming engine; other engines fall back to 1 device.
        # (Selection policy lives in render.renderer.make_renderer, shared
        # with the CLI tools.)
        if sharded and self.base_cfg.engine not in ("regen", "mega"):
            # Fail fast: both facts are known here; raising per render
            # request would tear down client connections instead.
            raise ValueError("sharded serving requires engine='regen' or 'mega'")
        self.sharded = sharded

    def _make_renderer(self, scene, cfg: RenderConfig) -> Renderer:
        from raytracer_tpu.render.renderer import make_renderer

        return make_renderer(scene, cfg, sharded=self.sharded)

    def renderer_for(self, scene_name: str, width: int, height: int) -> Renderer:
        key = (scene_name, width, height)
        with self._renderers_lock:
            if key not in self._renderers:
                cfg = replace(self.base_cfg, width=width, height=height)
                self._renderers[key] = self._make_renderer(
                    self.scenes[scene_name], cfg
                )
                while len(self._renderers) > MAX_RENDERERS:
                    # Evict LRU; an in-flight render keeps its own reference.
                    self._renderers.popitem(last=False)
            self._renderers.move_to_end(key)
            return self._renderers[key]

    def warmup(self, block: bool = False) -> threading.Thread:
        """Compile the default-resolution render shapes for every scene.

        First-render latency is compile-bound (minutes on the tunneled-TPU
        container, whose remote compiles bypass jax's persistent cache —
        utils/platform.py), so the server front-loads those compiles at
        startup instead of charging them to the first client.  The streaming
        engine takes spp as a DYNAMIC arg, so ONE compile per (scene,
        resolution) covers every spp a client can request, progressive or
        not.  (The reference eagerly builds octrees at startup for the same
        reason, src/main.rs:30-35.)

        Runs in a daemon thread (XLA compilation releases the GIL) so the
        server can accept connections immediately; a render requested
        mid-warm-up simply blocks on the same per-shape compile it would
        have paid anyway.
        """

        def go() -> None:
            import time as _time

            for name in self.scenes:
                t0 = _time.time()
                try:
                    r = self.renderer_for(name, self.width, self.height)
                    # The serving path's band shape (delivery plan: mesh
                    # scenes stream in sub-bands); regen is spp-agnostic so
                    # one compile per (scene, resolution) covers every spp.
                    rows, _, _ = r.plan_delivery(64)
                    # return_rays=True keeps warm-up off the shared
                    # ray_counts list: a client render in flight on the same
                    # cached renderer must not see its accounting mutated.
                    r.render_band_sums(0, rows, 1, 1, return_rays=True)
                    log.info(
                        "warm-up: %s %dx%d compiled in %.1fs",
                        name, self.width, self.height, _time.time() - t0,
                    )
                except Exception:
                    log.exception("warm-up failed for %s", name)

        t = threading.Thread(target=go, name="rt-warmup", daemon=True)
        t.start()
        if block:
            t.join()
        return t

    def _new_connection_id(self) -> str:
        # 5 distinct lowercase letters (reference: src/server.rs:63-78)
        while True:
            cid = "".join(random.sample(string.ascii_lowercase, 5))
            if cid not in self.connections:
                self.connections.add(cid)
                return cid

    async def handle_connection(self, websocket) -> None:
        cid = self._new_connection_id()
        log.info("[%s] Accepted connection.", cid)
        send_lock = asyncio.Lock()

        async def send(msg: bytes) -> None:
            async with send_lock:
                try:
                    await websocket.send(msg)
                except Exception:
                    job.stop()  # send on closed socket cancels (ref :213-216)

        job = RenderJob(send=send)
        try:
            async for raw in websocket:
                if isinstance(raw, (bytes, bytearray)):
                    continue
                log.info("[%s] New message: %r", cid, raw)
                try:
                    msg = json.loads(raw)
                    mtype = msg["type"]
                except (json.JSONDecodeError, KeyError, TypeError):
                    log.error("[%s] failed to parse message", cid)
                    break  # reference panics the connection task (:92)
                if not job.running() and mtype == "render":
                    try:
                        scene = msg["scene"]
                        spp = int(msg["spp"])  # required, like the reference
                        w = int(msg.get("width", self.width))
                        h = int(msg.get("height", self.height))
                    except (KeyError, TypeError, ValueError):
                        log.error("[%s] malformed render request", cid)
                        break  # reference panics on bad messages (:92)
                    if scene not in self.scenes:
                        log.error("[%s] unknown scene %r", cid, scene)
                        break  # reference unwrap-panics (:100)
                    if not (1 <= w <= MAX_DIM and 1 <= h <= MAX_DIM) or not (
                        0 <= spp <= MAX_SPP
                    ):
                        log.error(
                            "[%s] rejected render request w=%s h=%s spp=%s",
                            cid, w, h, spp,
                        )
                        break
                    progressive = bool(msg.get("progressive", False))
                    want_stats = bool(msg.get("stats", False))
                    batch = bool(msg.get("batch", False))
                    renderer = self.renderer_for(scene, w, h)

                    async def run_render() -> None:
                        log.info("[%s] Rendering...", cid)
                        stopped = await job.run(
                            renderer, spp, progressive, want_stats, batch
                        )
                        if not stopped:
                            log.info(
                                "[%s] Done rendering. stats=%s",
                                cid,
                                job.stats.summary() if job.stats else None,
                            )

                    job.mark_running()
                    # Hold a strong reference (the loop's is weak — see
                    # RenderJob.task); cleared when the render finishes.
                    task = asyncio.get_running_loop().create_task(run_render())
                    job.task = task
                    task.add_done_callback(
                        lambda t, job=job: setattr(job, "task", None)
                    )
                elif job.running() and mtype == "stop_rendering":
                    job.stop()
                    log.info("[%s] Render cancelled.", cid)
                # all other (state, message) pairs ignored (ref :112)
        finally:
            job.stop()
            self.connections.discard(cid)
            log.info("[%s] Disconnected.", cid)

    async def serve(self, port: int = DEFAULT_PORT, host: str = "0.0.0.0"):
        import websockets

        # ping_interval=None: first-render jit tracing holds the GIL for
        # tens of seconds, starving the event loop — default keepalive
        # pings would tear down healthy connections mid-compile.
        server = await websockets.serve(
            self.handle_connection, host, port, max_size=1 << 22,
            ping_interval=None,
        )
        log.info("Listening on port %s.", port)
        return server

    async def serve_forever(self, port: int = DEFAULT_PORT, host: str = "0.0.0.0") -> None:
        server = await self.serve(port, host)
        await server.wait_closed()
