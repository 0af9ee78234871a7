"""Pure-numpy image codecs for UNCOMPRESSED formats.

The container has no image libraries, but netpbm (P5/P6) and
uncompressed 24-bit BMP need none — their rasters are plain byte
grids. These codecs make the multimodal pipeline REAL for those
formats (decode -> resize -> featurize on actual pixels); compressed
formats (JPEG/PNG) remain behind the optional-PIL stub in
multimodal.py.

All functions are plain bytes->ndarray transforms so they vectorize
naturally inside Arrow-batched mapInPandas workers: per-row
independent, no shuffle, no driver involvement.
"""

from __future__ import annotations

import struct

import numpy as np

_WS = b" \t\n\r\x0b\x0c"


def decode_pnm(data: bytes) -> np.ndarray:
    """Decode binary netpbm: P6 (RGB) -> (h, w, 3) uint8, P5 (gray)
    -> (h, w, 1) uint8. Handles comments and arbitrary header
    whitespace per the netpbm spec; maxval must be 255."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM: magic={magic!r}")
    channels = 3 if magic == b"P6" else 1

    vals: list[int] = []
    pos = 2
    while len(vals) < 3:
        if pos >= len(data):
            raise ValueError("truncated PNM header")
        c = data[pos]
        if c in b"#":
            while pos < len(data) and data[pos] not in b"\n":
                pos += 1
        elif c in _WS:
            pos += 1
        elif chr(c).isdigit():
            start = pos
            while pos < len(data) and chr(data[pos]).isdigit():
                pos += 1
            vals.append(int(data[start:pos]))
        else:
            raise ValueError(f"bad PNM header byte {c!r} at {pos}")
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # exactly one whitespace byte separates header and raster
    n = w * h * channels
    raster = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return raster.reshape(h, w, channels)


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) or (h, w, 1) uint8 to binary PPM/PGM."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    magic = b"P6" if ch == 3 else b"P5"
    header = magic + b"\n%d %d\n255\n" % (w, h)
    return header + arr.astype(np.uint8).tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) ->
    (h, w, 3) uint8 RGB. Rows are 4-byte padded and stored bottom-up
    (top-down when height is negative)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pixel_offset
    ).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB to an uncompressed 24-bit BMP."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    raster = padded.tobytes()
    file_header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(raster), 0, 0, 54)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return file_header + info_header + raster


def decode_image_bytes(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch decode by declared format. Returns (h, w, c) uint8."""
    fmt = (fmt or "").lower()
    if fmt in ("ppm", "pgm", "pnm"):
        return decode_pnm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    raise ValueError(f"no pure-python codec for format {fmt!r}")


SUPPORTED_FORMATS = ("ppm", "pgm", "pnm", "bmp")


def nearest_resize(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pixel-center
    mapping (the standard half-pixel convention)."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    return arr[rows][:, cols]


def grid_pool_features(arr: np.ndarray, dim: int = 64) -> np.ndarray:
    """Mean-pool the image onto a fixed grid and L2-normalize — a
    deterministic, content-derived embedding (the slot where a model
    inference UDF goes at scale). Gray images pool as one channel
    replicated; output length is exactly ``dim``."""
    gray = arr.astype(np.float64).mean(axis=2)
    side = int(np.ceil(np.sqrt(dim)))
    pooled = nearest_resize(gray[:, :, None], side, side)[:, :, 0].ravel()[:dim]
    if pooled.size < dim:
        pooled = np.pad(pooled, (0, dim - pooled.size))
    n = np.linalg.norm(pooled)
    return pooled / n if n > 0 else pooled
