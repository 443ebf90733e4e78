"""CLI entry point: ``python -m raytracer_tpu.server.main <scenes-dir>``.

Mirrors the reference bootstrap (src/main.rs:16-55): eagerly load the three
hardcoded scenes from the given directory, read PORT from the environment
(default 8080), serve forever.  Extra flags expose what the reference
hard-codes.
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import sys

from raytracer_tpu.config import SCENE_NAMES, port_from_env
from raytracer_tpu.models.loader import load_all_scenes
from raytracer_tpu.server.app import HEIGHT, WIDTH, Server


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="raytracer-tpu-server")
    parser.add_argument("scenes_dir", help="directory containing <scene>.toml + assets/")
    parser.add_argument("--port", type=int, default=None, help="overrides PORT env")
    parser.add_argument("--width", type=int, default=WIDTH)
    parser.add_argument("--height", type=int, default=HEIGHT)
    parser.add_argument("--scenes", nargs="*", default=None, help="scene names to load")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    from raytracer_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    names = args.scenes or SCENE_NAMES
    try:
        scenes = load_all_scenes(args.scenes_dir, names=names)
    except Exception as e:  # reference exits(1) on any scene load failure
        print(f"Failed to load scenes from {args.scenes_dir}: {e}", file=sys.stderr)
        return 1

    server = Server(scenes, width=args.width, height=args.height)
    port = args.port if args.port is not None else port_from_env()
    asyncio.run(server.serve_forever(port=port))
    return 0


if __name__ == "__main__":
    sys.exit(main())
