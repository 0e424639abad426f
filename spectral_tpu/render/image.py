"""Framebuffer conversion and image export.

Equivalent of the reference's ``CustomImage`` display/save path
(reference ``src/custom_image.rs:92-101`` and the save dialog,
``src/main.rs:2313-2331``): clamp the f32 accumulation buffer to [0, 1],
scale by 255 and truncate to u8 (Rust ``as u8`` truncates toward zero),
then export via PIL (PNG/JPG/BMP/TIFF, the formats the reference's
``image`` crate offers).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def accum_to_u8(accum: np.ndarray) -> np.ndarray:
    """``[H, W, 4]`` float32 -> ``[H, W, 4]`` uint8."""
    data = np.asarray(accum, dtype=np.float32)
    return (np.clip(data, 0.0, 1.0) * 255.0).astype(np.uint8)


def save_image(accum: np.ndarray, path: str | Path) -> Path:
    """Save the accumulation buffer; format chosen by extension."""
    from PIL import Image

    path = Path(path)
    u8 = accum_to_u8(accum)
    img = Image.fromarray(u8, mode="RGBA")
    if path.suffix.lower() in (".jpg", ".jpeg", ".bmp"):
        img = img.convert("RGB")  # no alpha channel in these formats
    img.save(path)
    return path
