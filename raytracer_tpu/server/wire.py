"""Binary wire protocol — byte-compatible with the reference.

Outgoing pixel message layout (built at src/server.rs:173-190; NOTE the
comment at :131-138 understates the header — the real layout, confirmed by
the web client's reads at test-client/app.tsx:54-60, is):

    [0]      message type, u8          (0 = RenderedPixels)
    [1]      number of pixels N, u8    (<= 60 per message)
    [2..4]   x, u16 little-endian      (start column)
    [4..6]   y, u16 little-endian      (row LABEL: 0 = top of image)
    [6..]    N * 3 bytes RGB u8        (gamma-corrected)

Incoming control messages are JSON text (src/server.rs:121-126):
    {"type": "render", "scene": "...", "spp": N}
    {"type": "stop_rendering"}
"""

from __future__ import annotations

import struct

import numpy as np

MSG_RENDERED_PIXELS = 0
PIXELS_PER_MSG = 60  # reference: src/server.rs:145

_HEADER = struct.Struct("<BBHH")


def pack_chunk(x: int, y: int, rgb: np.ndarray) -> bytes:
    """One RenderedPixels message for pixels [x, x+n) of row label y."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    n = rgb.shape[0]
    assert n <= 255 and rgb.shape[1] == 3
    return _HEADER.pack(MSG_RENDERED_PIXELS, n, x, y) + rgb.tobytes()


def pack_row(y: int, rgb_row: np.ndarray, pixels_per_msg: int = PIXELS_PER_MSG) -> list[bytes]:
    """Split one image row (label y) into 60-pixel messages, like the
    reference's windows() iterator (src/server.rs:169,:254-280)."""
    try:
        from raytracer_tpu.utils import native

        packed = native.pack_row(y, rgb_row, pixels_per_msg)
        if packed is not None:
            return packed
    except ImportError:
        pass
    w = rgb_row.shape[0]
    out = []
    for x in range(0, w, pixels_per_msg):
        n = min(pixels_per_msg, w - x)
        out.append(pack_chunk(x, y, rgb_row[x : x + n]))
    return out


def parse_chunk(msg: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode one RenderedPixels message -> (msg_type, x, y, rgb[n,3])."""
    msg_type, n, x, y = _HEADER.unpack_from(msg, 0)
    rgb = np.frombuffer(msg, np.uint8, count=3 * n, offset=_HEADER.size).reshape(n, 3)
    return msg_type, x, y, rgb
