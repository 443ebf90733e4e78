"""Wire-protocol byte-layout tests against the reference format
(src/server.rs:173-190; client reads test-client/app.tsx:54-60)."""

import numpy as np
import pytest

from raytracer_tpu.server import wire


def test_header_layout():
    rgb = np.asarray([[1, 2, 3], [4, 5, 6]], np.uint8)
    msg = wire.pack_chunk(0x1234, 0x0102, rgb)
    assert len(msg) == 6 + 6
    assert msg[0] == 0  # RenderedPixels
    assert msg[1] == 2  # num pixels
    assert msg[2:4] == bytes([0x34, 0x12])  # x u16 LE
    assert msg[4:6] == bytes([0x02, 0x01])  # y u16 LE
    assert msg[6:] == bytes([1, 2, 3, 4, 5, 6])


def test_row_splits_into_60px_windows():
    rgb = np.zeros((600, 3), np.uint8)
    msgs = wire.pack_row(5, rgb)
    assert len(msgs) == 10
    for i, m in enumerate(msgs):
        t, x, y, px = wire.parse_chunk(m)
        assert t == 0 and y == 5 and x == i * 60 and px.shape == (60, 3)


def test_row_remainder_window():
    # windows() semantics: last window carries the remainder (src/server.rs:268-279)
    rgb = np.zeros((130, 3), np.uint8)
    msgs = wire.pack_row(0, rgb)
    sizes = [wire.parse_chunk(m)[3].shape[0] for m in msgs]
    assert sizes == [60, 60, 10]


def test_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (60, 3), np.uint8)
    t, x, y, out = wire.parse_chunk(wire.pack_chunk(7, 449, rgb))
    np.testing.assert_array_equal(out, rgb)
    assert (x, y) == (7, 449)


def test_native_and_python_packers_agree():
    from raytracer_tpu.utils import native

    rgb = (np.arange(601 * 3) % 255).astype(np.uint8).reshape(601, 3)
    msgs_native = native.pack_row(9, rgb)
    if msgs_native is None:
        pytest.skip("native lib not built")
    msgs_py = [
        wire.pack_chunk(x, 9, rgb[x : x + 60]) for x in range(0, 601, 60)
    ]
    assert msgs_native == msgs_py


def test_batched_rows_roundtrip():
    """Batched transport: one buffer of concatenated STANDARD chunks.

    Each chunk unit must be byte-identical to the stock pack_row output
    (the batch extension coarsens framing only, never the chunk format).
    """
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (3, 130, 3), np.uint8)  # 3 rows, W=130
    buf = wire.pack_rows_batched(41, rgb)
    stock = b"".join(
        m for i in range(3) for m in wire.pack_row(41 - i, rgb[i])
    )
    assert buf == stock
    # parse_chunks recovers every pixel with its row label
    out = {}
    for t, x, y, px in wire.parse_chunks(buf):
        assert t == 0
        out.setdefault(y, np.zeros((130, 3), np.uint8))[x : x + px.shape[0]] = px
    assert set(out) == {41, 40, 39}
    for i, y in enumerate((41, 40, 39)):
        np.testing.assert_array_equal(out[y], rgb[i])


def test_parse_chunks_accepts_single_stock_message():
    rgb = np.arange(60 * 3, dtype=np.uint8).reshape(60, 3)
    msg = wire.pack_chunk(7, 9, rgb)
    chunks = list(wire.parse_chunks(msg))
    assert len(chunks) == 1
    t, x, y, px = chunks[0]
    assert (t, x, y) == (0, 7, 9)
    np.testing.assert_array_equal(px, rgb)
