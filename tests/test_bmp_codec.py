"""The BMP codec behind multimodal_decode is REAL: the writer emits
canonical 8-bit palette BMPs and the parser decodes uncompressed BMPs
generally — including 24-bit BGR and top-down row order, which this
repo's own encoder never produces."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kawa_spark.queries.llm_multimodal import _bmp_decode, _bmp_encode


def test_roundtrip_pixels_exact():
    payload = bytes(range(256)) + b"tail"
    dec = _bmp_decode(_bmp_encode(payload, width=64))
    assert dec["width"] == 64
    assert dec["height"] == (len(payload) + 63) // 64
    assert dec["mode"] == "L"
    flat = dec["pixels"].reshape(-1)
    np.testing.assert_array_equal(
        flat[: len(payload)], np.frombuffer(payload, dtype=np.uint8)
    )
    assert (flat[len(payload) :] == 0).all()  # last-row zero padding


def test_encoder_header_fields_are_canonical():
    buf = _bmp_encode(b"xyz", width=64)
    assert buf[0:2] == b"BM"
    (offset,) = struct.unpack("<I", buf[10:14])
    assert offset == 14 + 40 + 1024  # headers + 256-entry palette
    hdr_size, width, height, planes, bpp, comp = struct.unpack(
        "<IiiHHI", buf[14:34]
    )
    assert (hdr_size, width, height, planes, bpp, comp) == (40, 64, 1, 1, 8, 0)
    assert struct.unpack("<I", buf[2:6])[0] == len(buf)  # declared file size


def test_decoder_handles_24bit_and_stride():
    """Hand-built 3×2 24-bit BMP with width*3=9 → stride 12 (3 pad
    bytes per row), bottom-up. Decoded gray = integer mean of BGR."""
    px = lambda b, g, r: bytes((b, g, r))
    row_bottom = px(10, 20, 30) + px(0, 0, 0) + px(255, 255, 255) + b"\x00" * 3
    row_top = px(90, 90, 90) + px(1, 2, 3) + px(200, 100, 0) + b"\x00" * 3
    pixels = row_bottom + row_top  # stored bottom-up
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    offset = 14 + 40
    buf = (
        b"BM" + struct.pack("<IHHI", offset + len(pixels), 0, 0, offset)
        + info + pixels
    )
    dec = _bmp_decode(buf)
    assert dec["width"] == 3 and dec["height"] == 2 and dec["mode"] == "RGB"
    np.testing.assert_array_equal(
        dec["pixels"],
        np.array([[90, 2, 100], [20, 0, 255]], dtype=np.uint8),
    )


def test_decoder_handles_topdown():
    """Negative height ⇒ rows stored top-down; no flip."""
    pixels = bytes([1, 2, 3, 0]) + bytes([4, 5, 6, 0])  # stride 4, width 3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    offset = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, 3, -2, 1, 8, 0, len(pixels), 0, 0, 256, 0
    )
    buf = (
        b"BM" + struct.pack("<IHHI", offset + len(pixels), 0, 0, offset)
        + info + palette + pixels
    )
    dec = _bmp_decode(buf)
    np.testing.assert_array_equal(
        dec["pixels"], np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    )


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError, match="not a BMP"):
        _bmp_decode(b"PNG?" + b"\x00" * 60)
    good = _bmp_encode(b"abc")
    rle = good[:30] + struct.pack("<I", 1) + good[34:]  # compression=1 (RLE8)
    with pytest.raises(ValueError, match="compression"):
        _bmp_decode(rle)
