#!/usr/bin/env python3
"""Headless WebSocket render client: request a render, assemble the
streamed pixel chunks, write a PNG.

The reference has no way to get an image out of the server except
eyeballing the browser canvas (test-client/app.tsx paints chunks at
(x, y); SURVEY §4 calls for a headless client as the scriptable
integration harness).  This client speaks the same wire protocol — JSON
control in, binary `RenderedPixels` chunks out (6-byte header
[type u8, n u8, x u16 LE, y u16 LE] + RGB u8*n, src/server.rs:131-190) —
and exits once every pixel of the frame has arrived.

    python clients/headless.py cornell_box --spp 64 --out cornell.png \
        [--url ws://localhost:8080] [--width 600 --height 450] [--stats]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import struct
import sys


def parse_chunk(data: bytes):
    """-> (x, y, rgb bytes) for a RenderedPixels message."""
    if len(data) < 6 or data[0] != 0:
        raise ValueError(f"unexpected binary message: {data[:8].hex()}")
    n = data[1]
    x, y = struct.unpack_from("<HH", data, 2)
    rgb = data[6 : 6 + 3 * n]
    if len(rgb) != 3 * n:
        raise ValueError("truncated pixel payload")
    return x, y, rgb


async def fetch(
    url: str,
    scene: str,
    spp: int,
    width: int,
    height: int,
    want_stats: bool = False,
    timeout: float = 3600.0,
):
    """-> (image [H,W,3] u8, stats dict | None)."""
    import numpy as np
    import websockets

    img = np.zeros((height, width, 3), dtype=np.uint8)
    filled = np.zeros((height, width), dtype=bool)
    stats = None
    async with websockets.connect(url, max_size=None) as ws:
        req = {
            "type": "render",
            "scene": scene,
            "spp": spp,
            "width": width,
            "height": height,
        }
        if want_stats:
            req["stats"] = True
        await ws.send(json.dumps(req))
        while not filled.all() or (want_stats and stats is None):
            raw = await asyncio.wait_for(ws.recv(), timeout)
            if isinstance(raw, str):
                msg = json.loads(raw)
                if msg.get("type") == "render_stats":
                    stats = msg
                continue
            x, y, rgb = parse_chunk(raw)
            n = len(rgb) // 3
            px = np.frombuffer(rgb, dtype=np.uint8).reshape(n, 3)
            img[y, x : x + n] = px
            filled[y, x : x + n] = True
    return img, stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raytracer-headless-client")
    p.add_argument("scene")
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--out", default=None, help="output PNG (default <scene>.png)")
    p.add_argument("--url", default="ws://localhost:8080")
    p.add_argument("--width", type=int, default=600)
    p.add_argument("--height", type=int, default=450)
    p.add_argument("--stats", action="store_true", help="also print server render stats")
    p.add_argument("--timeout", type=float, default=3600.0, help="per-message timeout (s)")
    args = p.parse_args(argv)

    img, stats = asyncio.run(
        fetch(args.url, args.scene, args.spp, args.width, args.height,
              want_stats=args.stats, timeout=args.timeout)
    )
    out = args.out or f"{args.scene}.png"
    from PIL import Image

    Image.fromarray(img).save(out)
    print(f"wrote {out}", file=sys.stderr)
    if stats is not None:
        print(json.dumps(stats), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
