"""Minimal OpenEXR scanline writer (linear HDR export).

A beyond-reference capability: the reference's save path converts the
f32 accumulation buffer to 8-bit before every export (reference
``src/custom_image.rs:92-101`` clamps to [0,1]*255; the save dialog
offers PNG/JPG/BMP/TIFF only, ``src/main.rs:2313-2331``), so its HDR
radiance is lost at save time. This writer emits the accumulator's
linear float values losslessly in the industry-standard interchange
format for render output.

Implements the OpenEXR 2.0 single-part scanline format with
``NO_COMPRESSION`` (one scanline per block) — self-contained, exact,
and readable by every EXR consumer; no external EXR library exists in
this environment, so the format is written (and unit-tested against an
independent parser) from the specification. HALF (f16) is the
industry-default pixel type; FLOAT (f32) round-trips the accumulator
bit-exactly.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

__all__ = ["write_exr"]

_MAGIC = 20000630  # 0x01312f76
_VERSION = 2  # single-part scanline, no long names

# OpenEXR pixel-type enum
_PT_HALF = 1
_PT_FLOAT = 2


def _attr(name: bytes, type_: bytes, data: bytes) -> bytes:
    return name + b"\0" + type_ + b"\0" + struct.pack("<i", len(data)) + data


def _chlist(names: list[bytes], pixel_type: int) -> bytes:
    # channels must be listed in alphabetical order; each entry is
    # name\0, int32 type, uint8 pLinear + 3 reserved, int32 x/ySampling
    out = b""
    for n in sorted(names):
        out += n + b"\0" + struct.pack("<iBBBBii", pixel_type, 0, 0, 0, 0, 1, 1)
    return out + b"\0"


def write_exr(
    accum: np.ndarray,
    path: str | Path,
    pixel_type: str = "half",
    alpha: bool = True,
) -> Path:
    """Write an ``[H, W, 3|4]`` float array as a scanline OpenEXR file.

    ``pixel_type``: ``"half"`` (f16, the industry default — values above
    65504 saturate to +inf, as everywhere in the EXR ecosystem) or
    ``"float"`` (f32, bit-exact). ``alpha=False`` drops the A channel
    from RGBA input. Values are written as-is: linear radiance, no
    clamping, no display transform.
    """
    data = np.asarray(accum, dtype=np.float32)
    if data.ndim != 3 or data.shape[2] not in (3, 4):
        raise ValueError(f"expected [H, W, 3|4] floats, got {data.shape}")
    if pixel_type not in ("half", "float"):
        raise ValueError("pixel_type must be 'half' or 'float'")
    h, w, c = data.shape
    with_a = alpha and c == 4

    # channel planes keyed by name; the file stores them alphabetically
    planes = {b"R": data[..., 0], b"G": data[..., 1], b"B": data[..., 2]}
    if with_a:
        planes[b"A"] = data[..., 3]
    names = sorted(planes)

    if pixel_type == "half":
        pt, dtype = _PT_HALF, np.dtype("<f2")
    else:
        pt, dtype = _PT_FLOAT, np.dtype("<f4")

    header = b"".join([
        _attr(b"channels", b"chlist", _chlist(names, pt)),
        _attr(b"compression", b"compression", b"\0"),  # NO_COMPRESSION
        _attr(b"dataWindow", b"box2i",
              struct.pack("<4i", 0, 0, w - 1, h - 1)),
        _attr(b"displayWindow", b"box2i",
              struct.pack("<4i", 0, 0, w - 1, h - 1)),
        _attr(b"lineOrder", b"lineOrder", b"\0"),  # increasing Y
        _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0)),
        _attr(b"screenWindowCenter", b"v2f", struct.pack("<2f", 0.0, 0.0)),
        _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0)),
    ]) + b"\0"  # end of header

    # pixel payload: [H, n_channels, W] in alphabetical channel order —
    # with NO_COMPRESSION each scanline is one block. Values beyond the
    # half range saturate to +/-inf, the standard EXR half behavior.
    with np.errstate(over="ignore"):
        stacked = np.stack([planes[n] for n in names], axis=1).astype(dtype)
    row_bytes = stacked.shape[1] * w * dtype.itemsize

    start = 4 + 4 + len(header)
    offset_table_size = 8 * h
    first_block = start + offset_table_size
    block_size = 8 + row_bytes  # int32 y + int32 size + payload
    offsets = struct.pack(
        "<%dQ" % h, *(first_block + y * block_size for y in range(h))
    )

    path = Path(path)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _MAGIC, _VERSION))
        f.write(header)
        f.write(offsets)
        payload = stacked.tobytes()  # row-major: scanline-contiguous
        for y in range(h):
            f.write(struct.pack("<ii", y, row_bytes))
            f.write(payload[y * row_bytes:(y + 1) * row_bytes])
    return path
