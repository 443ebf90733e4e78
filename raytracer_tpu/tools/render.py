"""Offline render CLI: scene TOML -> PNG.

A *working* replacement for the reference's stale ``render_examples.sh``
(whose ``--image/--spp/--scene`` flags the current reference main.rs no
longer implements — SURVEY §2 'Deploy / build').

    python -m raytracer_tpu.tools.render scenes/cornell_box.toml \
        --spp 64 --out cornell.png [--mis] [--width 600 --height 450]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="raytracer-tpu-render")
    parser.add_argument("scene", help="path to a scene .toml")
    parser.add_argument("--spp", type=int, default=64)
    parser.add_argument("--out", default=None, help="output PNG (default <scene>.png)")
    parser.add_argument("--width", type=int, default=600)
    parser.add_argument("--height", type=int, default=450)
    parser.add_argument("--mis", action="store_true", help="enable multiple importance sampling")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-depth", type=int, default=None)
    parser.add_argument("--cpu", action="store_true", help="render on the host CPU")
    parser.add_argument(
        "--no-shard", action="store_true",
        help="force the single-device renderer even with multiple devices",
    )
    parser.add_argument(
        "--profile", metavar="DIR", default=None,
        help="capture a JAX profiler trace of the render into DIR "
        "(view with tensorboard --logdir DIR)",
    )
    args = parser.parse_args(argv)

    if args.cpu:
        from raytracer_tpu.utils.platform import force_cpu

        force_cpu()
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.models.loader import load_scene
    from raytracer_tpu.utils.platform import enable_compilation_cache
    from raytracer_tpu.utils.timing import RenderStats, device_trace

    enable_compilation_cache()

    kwargs = dict(width=args.width, height=args.height, use_mis=args.mis, seed=args.seed)
    if args.max_depth is not None:
        kwargs["max_depth"] = args.max_depth
    cfg = RenderConfig(**kwargs)

    stats = RenderStats(pixels=args.width * args.height, samples=args.spp)
    with stats.phase("load"):
        scene = load_scene(args.scene)
    from raytracer_tpu.render.renderer import make_renderer

    renderer = make_renderer(scene, cfg, sharded=False if args.no_shard else None)
    with stats.phase("render"), device_trace(args.profile):
        img = renderer.render_image(args.spp)
    stats.rays = renderer.rays_traced()

    out = args.out or (args.scene.rsplit(".", 1)[0] + ".png")
    from PIL import Image

    Image.fromarray(img).save(out)
    print(f"wrote {out}  {stats.summary()}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
