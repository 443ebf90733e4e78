#!/usr/bin/env python3
"""Interactive WebSocket debug client (REPL).

Equivalent of the reference's ws-client/main.js (a Node REPL that sends raw
JSON lines and hex-dumps binary replies — which ships with an
undefined-variable bug in its formatter).  Usage:

    python clients/cli.py [ws://localhost:8080]

Type raw JSON (e.g. {"type":"render","scene":"cornell_box","spp":8}) or the
shortcuts `render <scene> <spp>` / `stop` / `quit`.
"""

from __future__ import annotations

import asyncio
import json
import sys


def hexdump(data: bytes, limit: int = 64) -> str:
    head = data[:limit]
    lines = []
    for off in range(0, len(head), 16):
        chunk = head[off : off + 16]
        lines.append(f"  {off:04x}  " + " ".join(f"{b:02x}" for b in chunk))
    if len(data) > limit:
        lines.append(f"  ... ({len(data)} bytes total)")
    return "\n".join(lines)


async def main() -> None:
    import websockets

    url = sys.argv[1] if len(sys.argv) > 1 else "ws://localhost:8080"
    async with websockets.connect(url) as ws:
        print(f"connected to {url}")
        n_binary = 0

        async def reader():
            nonlocal n_binary
            async for msg in ws:
                if isinstance(msg, (bytes, bytearray)):
                    n_binary += 1
                    if n_binary <= 3 or n_binary % 1000 == 0:
                        kind, n = msg[0], msg[1]
                        x = int.from_bytes(msg[2:4], "little")
                        y = int.from_bytes(msg[4:6], "little")
                        print(f"<binary #{n_binary}: type={kind} n={n} x={x} y={y}")
                        print(hexdump(bytes(msg)))
                else:
                    print(f"<text: {msg}")

        task = asyncio.create_task(reader())
        loop = asyncio.get_running_loop()
        while True:
            line = (await loop.run_in_executor(None, sys.stdin.readline)).strip()
            if not line:
                continue
            if line in ("quit", "exit"):
                break
            if line == "stop":
                line = json.dumps({"type": "stop_rendering"})
            elif line.startswith("render"):
                parts = line.split()
                scene = parts[1] if len(parts) > 1 else "cornell_box"
                spp = int(parts[2]) if len(parts) > 2 else 8
                line = json.dumps({"type": "render", "scene": scene, "spp": spp})
            try:
                json.loads(line)
            except json.JSONDecodeError as e:
                print(f"not valid JSON: {e}")
                continue
            n_binary = 0
            await ws.send(line)
        task.cancel()


if __name__ == "__main__":
    asyncio.run(main())
