"""CLI render tool + observability utilities."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from raytracer_tpu.tools.render import main as render_main
from raytracer_tpu.utils.timing import RenderStats, Throughput

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


def test_render_cli_writes_png(tmp_path):
    out = str(tmp_path / "out.png")
    rc = render_main(
        [
            os.path.join(SCENES, "cornell_box.toml"),
            "--spp", "8", "--out", out, "--width", "40", "--height", "30",
        ]
    )
    assert rc == 0
    img = np.asarray(Image.open(out))
    assert img.shape == (30, 40, 3)
    assert img.mean() > 5  # actually rendered something


def test_render_cli_mis_flag(tmp_path):
    out = str(tmp_path / "mis.png")
    rc = render_main(
        [
            os.path.join(SCENES, "cornell_box.toml"),
            "--spp", "8", "--out", out, "--width", "40", "--height", "30",
            "--mis", "--max-depth", "8", "--seed", "3",
        ]
    )
    assert rc == 0 and os.path.exists(out)


def test_render_cli_profile_trace(tmp_path):
    """--profile captures a JAX profiler trace of the render (SURVEY §5)."""
    out = str(tmp_path / "prof.png")
    trace_dir = str(tmp_path / "trace")
    rc = render_main(
        [
            os.path.join(SCENES, "cornell_box.toml"),
            "--spp", "4", "--out", out, "--width", "40", "--height", "30",
            "--profile", trace_dir,
        ]
    )
    assert rc == 0
    # jax.profiler.trace writes plugins/profile/<run>/*.trace.json.gz (+ xplane)
    found = []
    for root, _, files in os.walk(trace_dir):
        found += [f for f in files if ".trace.json" in f or f.endswith(".xplane.pb")]
    assert found, f"no trace artifacts under {trace_dir}"

    # Companion analyzer summarizes the same trace.
    from raytracer_tpu.tools import top_ops

    events = top_ops.load_trace_events(trace_dir)
    assert events
    rows, total_us = top_ops.summarize(events, top=5)
    assert rows and total_us > 0
    assert top_ops.main([trace_dir, "--top", "3"]) == 0


def test_render_stats_phases_and_rates():
    st = RenderStats(pixels=100, samples=4)
    with st.phase("load"):
        time.sleep(0.01)
    with st.phase("render"):
        time.sleep(0.01)
    with st.phase("render"):
        pass  # accumulates
    st.rays = 2_000_000
    s = st.summary()
    assert s["phases"]["load"] >= 0.01
    assert s["phases"]["render"] >= 0.01
    assert s["mrays_per_s"] > 0
    assert s["pixels"] == 100


def test_throughput_ema():
    tp = Throughput(alpha=1.0)  # no smoothing: instantaneous
    tp.tick(0)
    time.sleep(0.01)
    v = tp.tick(100)
    assert v > 0


def test_parity_tool_smoke():
    """The hardware parity tool runs end-to-end (interpret mode on CPU);
    on a real TPU the same entry validates the compiled Mosaic kernel."""
    import os

    from raytracer_tpu.tools.parity import run

    scenes = os.path.join(os.path.dirname(__file__), "..", "scenes")
    assert run(os.path.join(scenes, "flying_unicorn.toml"), n=1 << 11)
