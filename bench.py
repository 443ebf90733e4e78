"""Benchmark harness: Mrays/s/chip + wall-clock to 256 spp (cornell_box 600x450).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no numbers (BASELINE.md), so the CPU baseline is
measured here: the same wavefront estimator compiled for the multithreaded
host CPU (XLA CPU uses all cores), which stands in for the reference's
``available_parallelism()`` Rust thread pool.  The CPU number is cached in
BASELINE_CPU.json; delete it (or set RT_BENCH_CPU=1) to remeasure.

Ray counting matches how the reference's loop would count: one camera ray
per sample, plus per bounce one shadow ray per live non-specular lane and
one continuation ray per lane passing Russian roulette.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
SPP = 256
CPU_BASELINE_FILE = os.path.join(HERE, "BASELINE_CPU.json")

CPU_SCRIPT = r"""
import json, os, sys, time
sys.path.insert(0, %(here)r)
import jax
jax.config.update("jax_platforms", "cpu")
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.loader import load_scene
from raytracer_tpu.render.renderer import Renderer

scene = load_scene(os.path.join(%(here)r, "scenes", "cornell_box.toml"))
r = Renderer(scene, RenderConfig())
spp = 4
r.render_image(spp)          # warm up / compile
r.ray_counts.clear()
t0 = time.time()
r.render_image(spp)
dt = time.time() - t0
rays = r.rays_traced()
print(json.dumps({"mrays_per_s": rays / dt / 1e6, "rays": rays, "seconds": dt}))
"""


def cpu_baseline() -> dict:
    if os.path.exists(CPU_BASELINE_FILE) and os.environ.get("RT_BENCH_CPU") != "1":
        with open(CPU_BASELINE_FILE) as fh:
            return json.load(fh)
    out = subprocess.run(
        [sys.executable, "-c", CPU_SCRIPT % {"here": HERE}],
        capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    with open(CPU_BASELINE_FILE, "w") as fh:
        json.dump(data, fh)
    return data


def main() -> None:
    sys.path.insert(0, HERE)
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.loader import load_scene
    from raytracer_tpu.render.renderer import Renderer
    from raytracer_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    scene = load_scene(os.path.join(HERE, "scenes", "cornell_box.toml"))
    r = Renderer(scene, RenderConfig())

    # Warm up: compile every shape the 256-spp schedule uses.
    r.render_image(SPP)
    r.ray_counts.clear()

    t0 = time.time()
    img = r.render_image(SPP)
    wall = time.time() - t0
    assert img is not None and img.shape == (450, 600, 3)

    rays = r.rays_traced()
    mrays = rays / wall / 1e6

    try:
        cpu = cpu_baseline()
        vs = mrays / cpu["mrays_per_s"]
    except Exception:
        cpu = None
        vs = mrays / 100.0  # fall back to the 100 Mrays/s driver target

    print(
        json.dumps(
            {
                "metric": "Mrays/s/chip, cornell_box 600x450@256spp (NEE path)",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(vs, 2),
                "wall_clock_to_256spp_s": round(wall, 2),
                "rays_traced": rays,
                "cpu_baseline_mrays_per_s": (
                    round(cpu["mrays_per_s"], 3) if cpu else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
