"""Pure-numpy image codec: uncompressed 24/32-bit BMP and binary PPM (P6).

The container ships no Pillow/ffmpeg, but the BMP and PPM formats are simple
enough to parse with numpy alone (public file-format specs), which turns the
multimodal pipeline's decode step from a stub into a real, testable codec:
decode → ndarray(H, W, 3) uint8 → nearest-neighbor resize → re-encode BMP.
PIL remains the preferred path when importable (operators/multimodal.py).

All functions are plain bytes↔ndarray transforms — they run inside
Arrow-batched mapInPandas workers, never on the driver.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedImage(ValueError):
    pass


def decode_image(data: bytes) -> np.ndarray:
    """bytes → (H, W, 3) uint8 RGB. Supports BMP (BITMAPINFOHEADER,
    uncompressed 24/32 bpp, bottom-up or top-down) and PPM P6 (maxval 255)."""
    if data[:2] == b"BM":
        return _decode_bmp(data)
    if data[:2] == b"P6":
        return _decode_ppm(data)
    raise UnsupportedImage(
        f"unsupported image magic {data[:2]!r} (builtin codec: BMP, PPM)"
    )


def _decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54:
        raise UnsupportedImage("truncated BMP header")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise UnsupportedImage(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedImage(f"unsupported BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3
    need = pixel_off + row_bytes * height
    if len(data) < need:
        raise UnsupportedImage("truncated BMP pixel data")
    raw = np.frombuffer(data, dtype=np.uint8, count=row_bytes * height, offset=pixel_off)
    rows = raw.reshape(height, row_bytes)[:, : width * nch].reshape(height, width, nch)
    if bottom_up:
        rows = rows[::-1]
    # BMP stores BGR(A) — return RGB
    return np.ascontiguousarray(rows[:, :, 2::-1])


def _decode_ppm(data: bytes) -> np.ndarray:
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise UnsupportedImage(f"PPM maxval {maxval} != 255")
    n = width * height * 3
    if len(data) - pos < n:
        raise UnsupportedImage("truncated PPM raster")
    return (
        np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
        .reshape(height, width, 3)
        .copy()
    )


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BMP bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise UnsupportedImage(f"expected (H, W, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixels = padded.tobytes()
    file_size = 14 + 40 + len(pixels)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize to (height, width) — deterministic, no deps."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[np.ix_(ys, xs)]


def generate_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic synthetic test image (gradient + seed-hashed stripes)."""
    y = np.arange(height, dtype=np.uint32)[:, None]
    x = np.arange(width, dtype=np.uint32)[None, :]
    r = (x * 255 // max(width - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(height - 1, 1)).astype(np.uint8)
    b = ((x * 31 + y * 17 + seed * 101) % 256).astype(np.uint8)
    img = np.stack(
        [np.broadcast_to(r, (height, width)), np.broadcast_to(g, (height, width)), b],
        axis=2,
    ).astype(np.uint8)
    return encode_bmp(img)
