"""Minimal pure-stdlib PNG codec (round 7) — one REAL media codec for
the multimodal plumbing (functions/multimodal.py), written from the
public PNG specification (RFC 2083 / W3C PNG): ``zlib`` + ``struct``
are the only dependencies, so it works in this container where
Pillow/ffmpeg do not exist.

Scope (deliberate): 8-bit depth, color types 0 (grayscale) and 2 (RGB),
no interlace, no palette/alpha — enough to round-trip real raster data
through ``decode_features`` / ``resize_stage`` end-to-end. The DECODER
implements all five standard scanline filters (None/Sub/Up/Average/
Paeth), so PNGs produced by other writers decode too; the ENCODER
writes filter 0 scanlines (byte-exact and deterministic — the tests pin
an encode->decode->encode fixed point).

Injectables matching the multimodal stage contracts:
- ``png_decoder(payload) -> (width, height, feature[4])`` for
  ``decode_features(df, decoder=...)``
- ``png_resizer(payload, max_side) -> payload`` (nearest-neighbor
  downscale + re-encode) for ``resize_stage(df, n, resizer=...)``

The stub path in multimodal.py stays the default: absent an injected
codec, ``decode_image`` still raises — this module is opt-in proof that
the plumbing runs a real format, not a replacement for real media libs.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3}  # color type -> samples per pixel


class PngError(ValueError):
    pass


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` in {1: gray,
    3: RGB}) as a PNG byte string. Filter 0 on every scanline —
    deterministic output, byte-exact round trips."""
    if channels not in (1, 3):
        raise PngError(f"channels must be 1 or 3, got {channels}")
    if width <= 0 or height <= 0:
        raise PngError(f"bad dimensions {width}x{height}")
    if len(pixels) != width * height * channels:
        raise PngError(
            f"pixel buffer {len(pixels)} != {width}x{height}x{channels}"
        )
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG byte string -> (width, height, channels, pixels).
    All five standard filters supported; 8-bit gray/RGB only (the spec
    subset this codec owns); CRCs verified."""
    if data[:8] != _SIGNATURE:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise PngError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError(f"truncated chunk {tag!r}")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if crc != zlib.crc32(tag + body) & 0xFFFFFFFF:
            raise PngError(f"bad CRC on chunk {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngError("unsupported compression/filter method")
            if interlace != 0:
                raise PngError("interlaced PNG not supported")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            seen_end = True
            break
    if width is None:
        raise PngError("missing IHDR")
    if not seen_end:
        raise PngError("missing IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngError(
            f"decompressed size {len(raw)} != {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev = bytearray(stride)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise PngError(f"unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, max_side: int
) -> tuple[int, int, bytes]:
    """Nearest-neighbor downscale so max(width, height) <= max_side.
    Upscaling never happens (payloads only shrink — the resize stage's
    contract)."""
    if max_side <= 0:
        raise PngError(f"bad max_side {max_side}")
    scale = max(width, height) / max_side
    if scale <= 1.0:
        return width, height, pixels
    nw = max(1, int(width / scale))
    nh = max(1, int(height / scale))
    out = bytearray(nw * nh * channels)
    for y in range(nh):
        sy = min(height - 1, (y * height) // nh)
        row = sy * width * channels
        for x in range(nw):
            sx = min(width - 1, (x * width) // nw)
            src = row + sx * channels
            dst = (y * nw + x) * channels
            out[dst : dst + channels] = pixels[src : src + channels]
    return nw, nh, bytes(out)


# ---------------------------------------------------------------------------
# injectables for the multimodal stages
# ---------------------------------------------------------------------------

def png_decoder(payload: bytes) -> tuple[int, int, list[float]]:
    """``decode_features`` decoder: PNG -> (width, height, 4-dim
    feature = mean luminance per quadrant in [0, 1])."""
    width, height, channels, px = decode_png(payload)
    hw, hh = max(1, width // 2), max(1, height // 2)
    sums = [0] * 4
    counts = [0] * 4
    for y in range(height):
        qy = 0 if y < hh else 1
        for x in range(width):
            q = qy * 2 + (0 if x < hw else 1)
            base = (y * width + x) * channels
            # luminance: mean of channels (exact for gray)
            sums[q] += sum(px[base : base + channels]) / channels
            counts[q] += 1
    feat = [s / c / 255.0 if c else 0.0 for s, c in zip(sums, counts)]
    return width, height, feat


def png_resizer(payload: bytes, max_side: int) -> bytes:
    """``resize_stage`` resizer: decode -> nearest-neighbor downscale to
    ``max_side`` -> re-encode."""
    width, height, channels, px = decode_png(payload)
    nw, nh, out = resize_nearest(width, height, channels, px, max_side)
    return encode_png(nw, nh, out, channels)
