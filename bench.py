"""Benchmark harness: Mrays/s/chip + wall-clock across the BASELINE configs.

Prints ONE JSON line.  The headline metric is the BASELINE.md target
(cornell_box 600x450 @256spp, NEE); the `configs` field tracks the other
benchmark configs (cornell MIS, cubes, flying_unicorn mesh) so the mesh
frontier is recorded every round, not just the best case.

The reference publishes no numbers (BASELINE.md), so the CPU baselines are
measured here.  ``vs_baseline`` (the headline ratio) uses the FAIR
denominator: the native C++ reference-style tracer (native/cpu_tracer.cpp
— same estimator, scalar f64 per-pixel recursion, per-ray BVH, one thread
per core, standing in for the reference's own multithreaded Rust renderer;
no Rust toolchain exists in this container).  ``vs_xla_cpu`` is the
same-software secondary: our wavefront estimator compiled for the host CPU
— it flatters by ~4x and is kept only for round-over-round comparability
(it was the headline through round 3; see BENCHMARKS.md).  Baselines are
cached in BASELINE_CPU.json; delete it (or set RT_BENCH_CPU=1) to
remeasure.  If a baseline cannot be measured its ratio is null — never
fabricated.

Ray counting is reference-equivalent in every engine: one camera ray per
sample, plus per bounce one shadow ray per live non-specular lane (the
reference traces every visibility ray unconditionally, src/scene.rs:218-229
— lanes our tracer culls as provably self-occluded still count) and one
continuation ray per lane passing Russian roulette.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
# Committed snapshot (read-only here) + untracked local overlay: remeasured
# baselines land in the .local file so routine bench runs never dirty a
# tracked file or leak one host's numbers into version control.
CPU_BASELINE_FILE = os.path.join(HERE, "BASELINE_CPU.json")
CPU_BASELINE_LOCAL = os.path.join(HERE, "BASELINE_CPU.local.json")

# (key, scene, spp, use_mis)
CONFIGS = [
    ("cornell_256_nee", "cornell_box", 256, False),  # headline
    ("cornell_256_mis", "cornell_box", 256, True),
    ("cubes_64", "cubes", 64, False),
    ("flying_unicorn_16", "flying_unicorn", 16, False),
    # The third BRDF on hardware (Phong lobes, mesh + sphere paths); has a
    # native fair-CPU denominator since round 5 (cpu_tracer.cpp Phong arm).
    ("crewmate_phong_16", "crewmate_phong", 16, False),
]

CPU_SCRIPT = r"""
import json, os, sys, time
sys.path.insert(0, %(here)r)
import jax
jax.config.update("jax_platforms", "cpu")
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.render.renderer import Renderer

name = %(scene)r
scene = load_scene(os.path.join(%(here)r, "scenes", name + ".toml"))
r = Renderer(scene, RenderConfig())
spp = 4
if name == "flying_unicorn":
    # Full-frame (even full-band) mesh renders take HOURS on one CPU core;
    # a short row band is enough to measure Mrays/s (same estimator, same
    # XLA BVH packet-traversal path the CPU would serve users with).
    rows = 9  # divisor of 450 -> reuses a shape the band scheduler allows
    r.render_band_sums(0, rows, 1, 1)  # warm up / compile
    r.ray_counts.clear()
    t0 = time.time()
    out = r.render_band_sums(0, rows, 1, 1)
    out.block_until_ready()
    dt = time.time() - t0
else:
    r.render_image(spp)
    r.ray_counts.clear()
    t0 = time.time()
    r.render_image(spp)
    dt = time.time() - t0
rays = r.rays_traced()
print(json.dumps({"mrays_per_s": rays / dt / 1e6, "rays": rays, "seconds": dt}))
"""


def _measure_native_cpu(scene_name: str) -> dict | None:
    """Fair native baseline: the C++ reference-style tracer
    (native/cpu_tracer.cpp — same estimator, scalar f64 recursion,
    per-ray skip-link BVH, one thread per core like the reference's
    available_parallelism pool)."""
    try:
        from raytracer_tpu.models.loader import load_scene
        from raytracer_tpu.utils import native

        scene = load_scene(os.path.join(HERE, "scenes", scene_name + ".toml"))
        if scene_name in ("flying_unicorn", "crewmate_phong"):
            y0, rows, spp = 200, 30, 4  # a band through the mesh suffices
        else:
            y0, rows, spp = 0, 450, 4
        t0 = time.time()
        out = native.cpu_render_band(scene, 600, 450, y0, rows, spp, seed=1)
        if out is None:
            return None
        dt = time.time() - t0
        _, rays = out
        return {
            "mrays_per_s": rays / dt / 1e6,
            "rays": rays,
            "seconds": dt,
            "impl": "native-cpp",
        }
    except Exception:
        return None


def _load_cache() -> dict:
    cache: dict = {}
    for path in (CPU_BASELINE_FILE, CPU_BASELINE_LOCAL):  # local wins
        if os.path.exists(path):
            with open(path) as fh:
                loaded = json.load(fh)
            if "mrays_per_s" in loaded:  # legacy single-config schema
                loaded = {"cornell_box": loaded}
            cache.update(loaded)
    return cache


def _store_local(key: str, data: dict) -> None:
    local: dict = {}
    if os.path.exists(CPU_BASELINE_LOCAL):
        with open(CPU_BASELINE_LOCAL) as fh:
            local = json.load(fh)
    local[key] = data
    with open(CPU_BASELINE_LOCAL, "w") as fh:
        json.dump(local, fh, indent=1)


def cpu_baseline(scene: str, impl: str = "xla") -> dict | None:
    """Measured CPU Mrays/s for a scene (cached); None when unmeasurable.

    Two denominators, both reported:
    - impl="xla": the SAME wavefront estimator compiled for the host CPU —
      the same-software comparison, consistent across bench rounds;
    - impl="native": the C++ reference-style tracer
      (native/cpu_tracer.cpp) — the fair cross-implementation 1x, standing
      in for the reference's own multithreaded Rust renderer.
    """
    key = scene if impl == "xla" else f"{scene}:native"
    cache = _load_cache()
    if key in cache and os.environ.get("RT_BENCH_CPU") != "1":
        return cache[key]
    if impl == "native":
        data = _measure_native_cpu(scene)
    else:
        try:
            out = subprocess.run(
                [sys.executable, "-c", CPU_SCRIPT % {"here": HERE, "scene": scene}],
                capture_output=True, text=True, timeout=3600,
            )
            data = json.loads(out.stdout.strip().splitlines()[-1])
            data["impl"] = "xla-cpu"
        except Exception:
            data = None
    if data is None:
        return cache.get(key)
    _store_local(key, data)
    return data


def run_config(scene_name: str, spp: int, use_mis: bool) -> dict:
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.loader import load_scene
    from raytracer_tpu.render.renderer import Renderer

    cfg = RenderConfig(use_mis=use_mis)
    scene = load_scene(os.path.join(HERE, "scenes", scene_name + ".toml"))
    r = Renderer(scene, cfg)
    r.render_image(spp)  # warm up: compile every shape the schedule uses
    r.ray_counts.clear()
    t0 = time.time()
    img = r.render_image(spp)
    wall = time.time() - t0
    assert img is not None and img.shape == (450, 600, 3)
    rays = r.rays_traced()
    return {
        "mrays_per_s": round(rays / wall / 1e6, 2),
        "wall_s": round(wall, 2),
        "rays": rays,
    }


def run_progressive_ws() -> dict | None:
    """BASELINE config #5: progressive 1920x1080 -> 1024 spp over WebSocket.

    Time-boxed: compiles are warmed through the renderer first, then TWO
    full-frame refinement passes are driven over a real WS connection and
    the steady-state seconds-per-pass (pass 2) recorded — the full 1024 spp
    would take hours and adds no information.  Returns None (recorded as
    null) if the run fails; never fabricated.
    """
    import asyncio

    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.loader import load_scene
    from raytracer_tpu.server.app import Server

    W, H = 1920, 1080
    SPP = 1024
    try:
        import websockets

        scene = load_scene(os.path.join(HERE, "scenes", "cornell_box.toml"))
        srv = Server({"cornell_box": scene}, width=W, height=H)
        r = srv.renderer_for("cornell_box", W, H)
        rows_p, k_p, _ = r.plan_progressive(SPP)
        r.render_band_sums(0, rows_p, k_p, 1)  # warm the one compiled shape
        r.ray_counts.clear()

        async def go():
            ws_server = await srv.serve(port=0, host="127.0.0.1")
            port = ws_server.sockets[0].getsockname()[1]
            frame_px = W * H
            t0 = time.time()
            pass_times = []
            first_chunk = None
            px = 0
            async with websockets.connect(
                f"ws://127.0.0.1:{port}", max_size=1 << 22
            ) as ws:
                await ws.send(json.dumps({
                    "type": "render", "scene": "cornell_box", "spp": SPP,
                    "width": W, "height": H, "progressive": True,
                    # Batched transport (one message per band of standard
                    # chunk units): at this scale the stock one-send-per-240px
                    # framing costs ~1s/pass of per-send overhead.
                    "batch": True,
                }))
                # Three sweeps: sweep 1 is the small-k fast-first-image
                # sweep, sweep 2 repays its stolen samples, sweep 3 is the
                # first steady-state refinement pass.
                while len(pass_times) < 3:
                    raw = await asyncio.wait_for(ws.recv(), 600)
                    if not isinstance(raw, (bytes, bytearray)):
                        continue
                    if first_chunk is None:
                        first_chunk = time.time() - t0
                    # Batched messages concatenate standard chunks (a plain
                    # message is a 1-concatenation); the framing logic lives
                    # in ONE parser, wire.parse_chunks, which also validates
                    # that each chunk's pixel payload is complete.
                    from raytracer_tpu.server import wire

                    for _mt, _x, _y, rgb in wire.parse_chunks(raw):
                        px += rgb.shape[0]
                    if px >= frame_px:
                        px -= frame_px
                        pass_times.append(time.time() - t0)
                await ws.send(json.dumps({"type": "stop_rendering"}))
            ws_server.close()
            return first_chunk, pass_times

        first_chunk, pass_times = asyncio.run(go())
        return {
            "width": W, "height": H, "target_spp": SPP,
            "first_chunk_s": round(first_chunk, 3),
            "first_image_s": round(pass_times[0], 2),
            "s_per_refinement_pass": round(pass_times[2] - pass_times[1], 2),
            "spp_per_pass": 4 * k_p,
            "passes_measured": len(pass_times),
        }
    except Exception:
        return None


def run_mesh_serving_ws() -> dict | None:
    """First-pixel latency of a DEFAULT (non-progressive) mesh render over
    a real WebSocket connection — flying_unicorn 600x450 @16spp, exactly
    what a stock reference client sends.

    The reference delivers pixels continuously (src/server.rs:168-191);
    our serving path streams mesh frames in >= DELIVERY_BANDS sub-bands
    (renderer.plan_delivery), so the first chunk must arrive well before
    the full frame (target <= 1.5 s warm).  Returns None on failure —
    never fabricated.
    """
    import asyncio

    from raytracer_tpu.models.loader import load_scene
    from raytracer_tpu.server.app import Server

    W, H, SPP = 600, 450, 16
    try:
        import websockets

        scene = load_scene(os.path.join(HERE, "scenes", "flying_unicorn.toml"))
        srv = Server({"flying_unicorn": scene})
        r = srv.renderer_for("flying_unicorn", W, H)
        rows, k, _ = r.plan_delivery(SPP)
        r.render_band_sums(0, rows, k, 1, return_rays=True)  # warm the shape

        async def go():
            ws_server = await srv.serve(port=0, host="127.0.0.1")
            port = ws_server.sockets[0].getsockname()[1]
            t0 = time.time()
            first = None
            px = 0
            async with websockets.connect(
                f"ws://127.0.0.1:{port}", max_size=1 << 22
            ) as ws:
                await ws.send(json.dumps(
                    {"type": "render", "scene": "flying_unicorn", "spp": SPP}
                ))
                while px < W * H:
                    raw = await asyncio.wait_for(ws.recv(), 600)
                    if not isinstance(raw, (bytes, bytearray)):
                        continue
                    if first is None:
                        first = time.time() - t0
                    from raytracer_tpu.server import wire

                    for _mt, _x, _y, rgb in wire.parse_chunks(raw):
                        px += rgb.shape[0]
            ws_server.close()
            return first, time.time() - t0

        first, total = asyncio.run(go())
        return {
            "width": W, "height": H, "spp": SPP,
            "first_chunk_s": round(first, 3),
            "total_s": round(total, 2),
        }
    except Exception:
        return None


def main() -> None:
    sys.path.insert(0, HERE)
    from raytracer_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    results = {}
    for key, scene, spp, mis in CONFIGS:
        results[key] = run_config(scene, spp, mis)
    results["progressive_1080p"] = run_progressive_ws()
    results["unicorn_16_serving"] = run_mesh_serving_ws()

    headline = results["cornell_256_nee"]
    # Fair cross-implementation denominator — THE headline ratio: the C++
    # reference-style tracer (same estimator, scalar f64 per-ray recursion +
    # BVH, one thread per core — the reference IS multithreaded native CPU
    # code).  The same-software XLA-CPU ratio is a clearly-labeled secondary
    # (it flatters by ~4x; it led the artifact through round 3).
    cpu_nat = cpu_baseline("cornell_box", impl="native")
    cpu_mesh_nat = cpu_baseline("flying_unicorn", impl="native")
    cpu = cpu_baseline("cornell_box")  # same-estimator XLA-CPU (historic)
    vs_nat = (
        round(headline["mrays_per_s"] / cpu_nat["mrays_per_s"], 1)
        if cpu_nat else None
    )
    vs_xla = round(headline["mrays_per_s"] / cpu["mrays_per_s"], 2) if cpu else None
    if cpu_mesh_nat:
        results["flying_unicorn_16"]["vs_native_cpu"] = round(
            results["flying_unicorn_16"]["mrays_per_s"]
            / cpu_mesh_nat["mrays_per_s"], 1
        )
    cpu_phong_nat = cpu_baseline("crewmate_phong", impl="native")
    if cpu_phong_nat and results.get("crewmate_phong_16"):
        results["crewmate_phong_16"]["vs_native_cpu"] = round(
            results["crewmate_phong_16"]["mrays_per_s"]
            / cpu_phong_nat["mrays_per_s"], 1
        )

    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip, cornell_box 600x450@256spp (NEE path)",
                "value": headline["mrays_per_s"],
                "unit": "Mrays/s",
                # vs_baseline = the HONEST ratio: vs the native C++
                # reference-style multithreaded CPU tracer (the fair 1x).
                "vs_baseline": vs_nat,
                "baseline_impl": "native-cpp reference-style tracer",
                # Same-software secondary (our estimator on XLA CPU): ~4x
                # softer denominator; was `vs_baseline` through round 3.
                "vs_xla_cpu_same_software": vs_xla,
                "wall_clock_to_256spp_s": headline["wall_s"],
                "rays_traced": headline["rays"],
                "cpu_native_mrays_per_s": (
                    round(cpu_nat["mrays_per_s"], 3) if cpu_nat else None
                ),
                "cpu_native_mesh_mrays_per_s": (
                    round(cpu_mesh_nat["mrays_per_s"], 4) if cpu_mesh_nat else None
                ),
                "cpu_xla_mrays_per_s": (
                    round(cpu["mrays_per_s"], 3) if cpu else None
                ),
                "configs": results,
            }
        )
    )


if __name__ == "__main__":
    main()
