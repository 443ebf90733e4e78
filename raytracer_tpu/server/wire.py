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


def parse_chunks(buf: bytes):
    """Iterate every RenderedPixels chunk in a (possibly batched) buffer.

    The opt-in batched transport (render request field ``"batch": true``)
    concatenates standard 6-byte-header chunks into one WebSocket message;
    each chunk unit stays byte-identical to the stock protocol, so this
    parser also accepts plain single-chunk messages (the concatenation of
    one).  Yields (msg_type, x, y, rgb[n,3]) per chunk.
    """
    off = 0
    end = len(buf)
    while off + _HEADER.size <= end:
        msg_type, n, x, y = _HEADER.unpack_from(buf, off)
        off += _HEADER.size
        rgb = np.frombuffer(buf, np.uint8, count=3 * n, offset=off).reshape(n, 3)
        off += 3 * n
        yield msg_type, x, y, rgb


def pack_rows_batched(
    y_top_label: int, rgb: np.ndarray, pixels_per_msg: int = PIXELS_PER_MSG
) -> bytes:
    """Concatenate the standard chunks of SEVERAL rows into ONE buffer.

    ``rgb`` is [rows, W, 3] in RENDER-space row order; row i carries wire
    label ``y_top_label - i`` (labels flip render rows: label =
    height-1-y_render, so a render-space band maps to descending labels).
    Kept trivial on purpose: every chunk unit is produced by the same
    pack_row() as the stock path, so batched and unbatched transports
    carry byte-identical chunk units.
    """
    parts: list[bytes] = []
    for i in range(rgb.shape[0]):
        parts.extend(pack_row(y_top_label - i, rgb[i], pixels_per_msg))
    return b"".join(parts)
