"""Headless WebSocket integration tests (SURVEY §4g): a Python client
drives the server end-to-end on a small frame."""

import asyncio
import json
import os

import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.server.app import Server
from raytracer_tpu.server.wire import parse_chunk

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")
W, H = 60, 45


@pytest.fixture(scope="module")
def server_port():
    """Run a server over cornell_box at 60x45 on an ephemeral port."""
    import threading

    scenes = {"cornell_box": load_scene(os.path.join(SCENES, "cornell_box.toml"))}
    cfg = RenderConfig(rays_per_pass=1 << 15)
    srv = Server(scenes, cfg=cfg, width=W, height=H)

    loop = asyncio.new_event_loop()
    port_holder = {}
    started = threading.Event()
    shutdown = None

    async def boot():
        nonlocal shutdown
        shutdown = asyncio.Event()
        ws_server = await srv.serve(port=0, host="127.0.0.1")
        port_holder["port"] = ws_server.sockets[0].getsockname()[1]
        started.set()
        await shutdown.wait()
        ws_server.close()

    t = threading.Thread(target=lambda: loop.run_until_complete(boot()), daemon=True)
    t.start()
    assert started.wait(30)
    yield port_holder["port"]
    loop.call_soon_threadsafe(shutdown.set)
    t.join(10)


async def _collect_render(port, msg, expect_pixels, timeout=120):
    import websockets

    got = np.full((H, W, 3), -1, np.int32)
    n_pixels = 0
    async with websockets.connect(f"ws://127.0.0.1:{port}") as ws:
        await ws.send(json.dumps(msg))
        while n_pixels < expect_pixels:
            raw = await asyncio.wait_for(ws.recv(), timeout)
            assert isinstance(raw, (bytes, bytearray))
            t, x, y, rgb = parse_chunk(raw)
            assert t == 0
            n = rgb.shape[0]
            assert n <= 60 and x + n <= W and 0 <= y < H
            got[y, x : x + n] = rgb
            n_pixels += n
    return got


def test_render_streams_full_frame(server_port):
    img = asyncio.run(
        _collect_render(
            server_port,
            {"type": "render", "scene": "cornell_box", "spp": 8},
            W * H,
        )
    )
    assert (img >= 0).all()  # every pixel delivered exactly once
    # orientation: light/ceiling glow near the top rows (label space)
    assert img[:10].mean() > img[-10:].mean()
    assert img.max() == 255  # the light clamps to white


def test_warmup_compiles_all_scenes(caplog):
    """Startup warm-up: one compile per (scene, default resolution); a
    subsequent render reuses the compiled shape (same renderer instance)."""
    import logging

    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.loader import load_scene
    from raytracer_tpu.server.app import Server

    scene = load_scene(os.path.join(SCENES, "cornell_box.toml"))
    srv = Server(
        {"cornell_box": scene},
        cfg=RenderConfig(rays_per_pass=1 << 13),
        width=W, height=H, sharded=False,
    )
    with caplog.at_level(logging.INFO, logger="raytracer_tpu.server"):
        srv.warmup(block=True)
    assert any("warm-up: cornell_box" in r.getMessage() for r in caplog.records)
    r = srv.renderer_for("cornell_box", W, H)
    assert r.ray_counts == []  # warm-up traffic doesn't pollute accounting
    assert r is srv.renderer_for("cornell_box", W, H)


def test_render_stats_message_and_log(server_port, caplog):
    """Serve-path observability: "stats": true in the render request gets a
    render_stats JSON text message after the pixels, and the server logs a
    stats summary at Done (SURVEY §5 — the reference times renders
    client-side only, test-client/app.tsx:71)."""

    async def go():
        import websockets

        n_pixels = 0
        stats = None
        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            await ws.send(
                json.dumps(
                    {"type": "render", "scene": "cornell_box", "spp": 8,
                     "stats": True}
                )
            )
            while stats is None:
                raw = await asyncio.wait_for(ws.recv(), 120)
                if isinstance(raw, (bytes, bytearray)):
                    n_pixels += parse_chunk(raw)[3].shape[0]
                else:
                    stats = json.loads(raw)
        return n_pixels, stats

    import logging

    with caplog.at_level(logging.INFO, logger="raytracer_tpu.server"):
        n_pixels, stats = asyncio.run(go())
    assert n_pixels == W * H  # the text frame arrives after every pixel
    assert stats["type"] == "render_stats"
    assert stats["pixels"] == W * H
    assert stats["samples"] == 8  # spp delivered (2x2 subpixels x spp//4)
    assert stats["rays"] > W * H * 8  # camera rays alone exceed this
    assert stats["bands"] >= 1
    assert stats["wall_s"] > 0 and stats["mrays_per_s"] > 0
    assert any(
        "Done rendering. stats=" in m and "'rays':" in m
        for m in (r.getMessage() for r in caplog.records)
    )


def test_stop_rendering_cancels(server_port):
    async def go():
        import websockets

        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            await ws.send(json.dumps({"type": "render", "scene": "cornell_box", "spp": 64}))
            # receive a few chunks then stop
            for _ in range(3):
                await asyncio.wait_for(ws.recv(), 120)
            await ws.send(json.dumps({"type": "stop_rendering"}))
            # drain until the stream goes quiet
            drained = 0
            try:
                while True:
                    await asyncio.wait_for(ws.recv(), 3)
                    drained += 1
            except asyncio.TimeoutError:
                pass
            assert drained < H * W / 60  # far fewer than a full frame

    asyncio.run(go())


def test_second_render_on_same_connection(server_port):
    async def go():
        import websockets

        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            for _ in range(2):
                await ws.send(json.dumps({"type": "render", "scene": "cornell_box", "spp": 4}))
                seen = 0
                while seen < W * H:
                    raw = await asyncio.wait_for(ws.recv(), 120)
                    seen += parse_chunk(raw)[3].shape[0]

    asyncio.run(go())


def test_progressive_restreams_pixels(server_port):
    async def go():
        import websockets

        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            # spp=24 is deliberately non-power-of-two: the progressive plan
            # delivers k_p*n_chunks = 1*6 samples/subpixel = 24 spp where
            # the batch plan would overshoot to k*n_passes = 4*2 = 32 —
            # stats.samples must report what the progressive path rendered.
            await ws.send(
                json.dumps(
                    {
                        "type": "render",
                        "scene": "cornell_box",
                        "spp": 24,
                        "progressive": True,
                        "stats": True,
                    }
                )
            )
            total = 0
            stats = None
            try:
                while True:
                    raw = await asyncio.wait_for(ws.recv(), 60)
                    if isinstance(raw, str):
                        stats = json.loads(raw)
                        continue
                    total += parse_chunk(raw)[3].shape[0]
            except asyncio.TimeoutError:
                pass
            # full frame delivered at least twice (re-streamed refinement)
            assert total >= 2 * W * H
            assert stats is not None and stats["samples"] == 24

    asyncio.run(go())


def test_headless_client_fetches_png(server_port, tmp_path):
    """clients/headless.py end-to-end: request, assemble, write a PNG."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "headless",
        os.path.join(os.path.dirname(__file__), "..", "clients", "headless.py"),
    )
    headless = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(headless)

    out = str(tmp_path / "fetched.png")
    rc = headless.main(
        [
            "cornell_box", "--spp", "8", "--out", out,
            "--url", f"ws://127.0.0.1:{server_port}",
            "--width", str(W), "--height", str(H),
            "--stats", "--timeout", "120",
        ]
    )
    assert rc == 0
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (H, W, 3)
    assert img.mean() > 5  # a real render, not black


def test_unknown_scene_closes_connection(server_port):
    async def go():
        import websockets

        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            await ws.send(json.dumps({"type": "render", "scene": "nope", "spp": 4}))
            with pytest.raises(websockets.exceptions.ConnectionClosed):
                while True:
                    await asyncio.wait_for(ws.recv(), 10)

    asyncio.run(go())


def test_render_while_running_is_ignored(server_port):
    async def go():
        import websockets

        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            # two renders sent back to back: the second arrives while the
            # first is still running and must be ignored (reference
            # dispatch table, src/server.rs:93-113)
            await ws.send(json.dumps({"type": "render", "scene": "cornell_box", "spp": 64}))
            await ws.send(json.dumps({"type": "render", "scene": "cornell_box", "spp": 64}))
            seen = 0
            while seen < W * H:
                raw = await asyncio.wait_for(ws.recv(), 300)
                seen += parse_chunk(raw)[3].shape[0]
            # exactly one full frame arrives, not two
            try:
                extra = 0
                while True:
                    await asyncio.wait_for(ws.recv(), 3)
                    extra += 1
            except asyncio.TimeoutError:
                pass
            assert extra == 0

    asyncio.run(go())


def test_server_shards_over_visible_devices():
    """With >1 visible device (the 8-device virtual CPU mesh here) the
    server serves via ShardedRenderer; sharded=False forces the plain path
    (VERDICT r1 #3: the serve path owns the compute parallelism)."""
    from raytracer_tpu.parallel.mesh import ShardedRenderer

    scenes = {"cornell_box": load_scene(os.path.join(SCENES, "cornell_box.toml"))}
    srv = Server(scenes, cfg=RenderConfig(rays_per_pass=1 << 14), width=W, height=H)
    r = srv.renderer_for("cornell_box", W, H)
    assert isinstance(r, ShardedRenderer) and r.n_dev == 8

    plain = Server(scenes, width=W, height=H, sharded=False)
    r2 = plain.renderer_for("cornell_box", W, H)
    assert not isinstance(r2, ShardedRenderer)


def test_sharded_server_streams_full_frame(server_port):
    """End-to-end WS render over the 8-device mesh (the module fixture
    auto-shards: 8 virtual devices are visible)."""
    img = asyncio.run(
        _collect_render(
            server_port,
            {"type": "render", "scene": "cornell_box", "spp": 4},
            W * H,
        )
    )
    assert (img >= 0).all()
    assert img[:10].mean() > img[-10:].mean()


def test_oversize_request_closes_connection(server_port):
    async def go():
        import websockets

        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            await ws.send(
                json.dumps(
                    {"type": "render", "scene": "cornell_box", "spp": 4,
                     "width": 1 << 20, "height": 1 << 20}
                )
            )
            with pytest.raises(websockets.exceptions.ConnectionClosed):
                while True:
                    await asyncio.wait_for(ws.recv(), 10)

    asyncio.run(go())


def test_garbage_spp_closes_connection(server_port):
    async def go():
        import websockets

        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            await ws.send(
                json.dumps({"type": "render", "scene": "cornell_box", "spp": "lots"})
            )
            with pytest.raises(websockets.exceptions.ConnectionClosed):
                while True:
                    await asyncio.wait_for(ws.recv(), 10)

    asyncio.run(go())


def test_renderer_cache_is_bounded():
    from raytracer_tpu.server.app import MAX_RENDERERS

    scenes = {"cornell_box": load_scene(os.path.join(SCENES, "cornell_box.toml"))}
    srv = Server(scenes, width=W, height=H, sharded=False)
    for i in range(MAX_RENDERERS + 4):
        srv.renderer_for("cornell_box", 16 + i, 16)
    assert len(srv._renderers) == MAX_RENDERERS
    # most-recently-used entries survive
    assert ("cornell_box", 16 + MAX_RENDERERS + 3, 16) in srv._renderers


def test_batched_render_streams_full_frame(server_port):
    """Opt-in "batch": true — each message is a band's standard chunks
    concatenated; the full frame still arrives exactly once with correct
    labels (chunk units stay byte-identical to the stock framing)."""
    import websockets
    from raytracer_tpu.server.wire import parse_chunks

    async def go():
        got = np.full((H, W, 3), -1, np.int32)
        n_pixels = 0
        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            await ws.send(json.dumps({
                "type": "render", "scene": "cornell_box", "spp": 8,
                "batch": True,
            }))
            while n_pixels < W * H:
                raw = await asyncio.wait_for(ws.recv(), 300)
                assert isinstance(raw, (bytes, bytearray))
                chunks = list(parse_chunks(raw))
                assert len(chunks) > 1  # actually batched
                for t, x, y, rgb in chunks:
                    assert t == 0
                    n = rgb.shape[0]
                    assert n <= 60 and x + n <= W and 0 <= y < H
                    got[y, x : x + n] = rgb
                    n_pixels += n
        return got

    img = asyncio.run(go())
    assert (img >= 0).all()
    assert img[:10].mean() > img[-10:].mean()


def test_render_survives_gc_midstream(server_port):
    """The detached render task must survive a full garbage collection.

    asyncio event loops keep only WEAK references to tasks; the server holds
    a strong reference on the RenderJob (job.task) so a long render can't be
    collected mid-flight.  Regression test: force gc.collect() repeatedly
    while the frame streams and require completion."""
    import gc

    import websockets
    from raytracer_tpu.server.wire import parse_chunks

    async def go():
        n_pixels = 0
        async with websockets.connect(f"ws://127.0.0.1:{server_port}") as ws:
            await ws.send(json.dumps(
                {"type": "render", "scene": "cornell_box", "spp": 8}
            ))
            while n_pixels < W * H:
                raw = await asyncio.wait_for(ws.recv(), 300)
                if not isinstance(raw, (bytes, bytearray)):
                    continue
                for _t, _x, _y, rgb in parse_chunks(raw):
                    n_pixels += rgb.shape[0]
                gc.collect()  # would reap an unreferenced task
        return n_pixels

    assert asyncio.run(go()) == W * H


def test_batched_messages_capped_below_max_size():
    """Batched sends must stay under ~1 MiB (python-websockets' default
    client max_size) even at MAX_DIM frames — the band is split into
    multiple messages (ADVICE r4: one 4096-wide band could reach ~13 MB)."""
    from raytracer_tpu.server.app import RenderJob

    sent: list[bytes] = []

    async def fake_send(msg: bytes) -> None:
        sent.append(bytes(msg))

    job = RenderJob(send=fake_send)

    # Drive the batch branch of stream_rows directly with a MAX_DIM-wide
    # synthetic band: reconstruct the inner closure's behavior through run()
    # would need a renderer, so exercise the splitting arithmetic the same
    # way the server does.
    width, rows, ppm = 4096, 512, 240
    rgb = np.zeros((rows, width, 3), np.uint8)

    async def stream():
        bytes_per_row = 3 * width + 6 * (-(-width // ppm))
        rows_per_msg = max(1, (1 << 19) // bytes_per_row)
        from raytracer_tpu.server import wire

        for i0 in range(0, rows, rows_per_msg):
            i1 = min(i0 + rows_per_msg, rows)
            await job.send(
                wire.pack_rows_batched(rows - 1 - i0, rgb[i0:i1], ppm)
            )

    asyncio.run(stream())
    from raytracer_tpu.server.wire import parse_chunks

    assert len(sent) > 1
    assert all(len(m) < (1 << 20) for m in sent)
    total_px = sum(
        r.shape[0] for m in sent for _t, _x, _y, r in parse_chunks(m)
    )
    assert total_px == rows * width
