"""Pure-stdlib PNG decoding: zlib inflate + numpy scanline unfilter.

Makes the multimodal image stage REAL with zero new dependencies (the
container has no imaging library): 8-bit non-interlaced grayscale /
gray+alpha / RGB / RGBA PNGs decode to a numpy array. Palette, 16-bit and
interlaced images raise ``NotImplementedError`` honestly.

Filter reconstruction (PNG spec §9): None and Up are pure vectorized adds;
Sub is a per-lane cumulative sum (mod-256 distributes over addition);
Average and Paeth carry a left-pixel dependency and fall back to a per-pixel
loop on the (rare) rows that use them — encoders overwhelmingly emit
filters 0-2.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat: list[bytes] = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = _CHANNELS.get(color)
            if channels is None:
                raise NotImplementedError(f"color type {color} (palette?)")
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    data_i32 = rows[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f = int(filters[y])
        cur = data_i32[y]
        prior = out[y - 1].astype(np.int32) if y else np.zeros(
            stride, np.int32
        )
        if f == 0:  # None
            recon = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp]
            lanes = cur.reshape(-1, bpp)
            recon = np.cumsum(lanes, axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            recon = (cur + prior) % 256
        elif f in (3, 4):  # Average / Paeth: left-dependent, per-pixel
            recon = np.empty(stride, np.int32)
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left if pa <= pb and pa <= pc
                        else up if pb <= pc
                        else ul
                    )
                recon[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = recon.astype(np.uint8)
    return out.reshape(height, width, channels)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0, 8-bit) — test/fixture helper, not a
    production writer. Accepts (H, W) gray or (H, W, {1,2,3,4}) uint8."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(scan.tobytes())

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + (
            struct.pack(">I", crc)
        )

    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> (H, W) float32 luminance in [0, 1] (Rec.601)."""
    c = img.shape[2]
    if c <= 2:  # gray / gray+alpha: luminance is the first sample
        return img[:, :, 0].astype(np.float32) / 255.0
    r, g, b = (img[:, :, i].astype(np.float32) for i in range(3))
    return (0.299 * r + 0.587 * g + 0.114 * b) / 255.0


def resize_nearest(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """(H, W) -> (size[1], size[0]) by nearest-neighbor sampling."""
    out_w, out_h = size
    h, w = img.shape
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[np.ix_(ys, xs)]
