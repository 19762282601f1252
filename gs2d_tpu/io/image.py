"""Target-image ingestion and render export.

The reference loads an 8-bit JPEG and converts to float32 RGBA (main.cpp:
254-258, prlib Image2DRGBA8_to_Image2DRGBA32); only RGB participates in the
fit. Here: PIL decode -> float32 RGB in [0, 1] (value / 255).
"""

from __future__ import annotations

import os

import numpy as np

ASSETS_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets")


def load_image(path: str) -> np.ndarray:
    """Decode an image file to float32 RGB (H, W, 3) in [0, 1]."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32)
    return arr / np.float32(255.0)


def load_asset(name: str) -> np.ndarray:
    """Load one of the bundled target images (squirrel_cls_mini.jpg 268x213,
    squirrel_cls.jpg 535x426 -- the reference's bin/ assets)."""
    return load_image(os.path.join(ASSETS_DIR, name))


def save_image(path: str, color: np.ndarray) -> None:
    """Write a float32 [0,1] RGB array as PNG/JPEG."""
    from PIL import Image

    arr = np.clip(np.asarray(color) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def synthetic_target(height: int, width: int, seed: int = 0) -> np.ndarray:
    """A deterministic smooth synthetic target for tests (no file IO)."""
    y = np.linspace(0.0, 1.0, height, dtype=np.float32)[:, None]
    x = np.linspace(0.0, 1.0, width, dtype=np.float32)[None, :]
    r = 0.5 + 0.5 * np.sin(6.0 * x + seed) * np.cos(5.0 * y)
    g = 0.5 + 0.5 * np.cos(4.0 * x) * np.sin(7.0 * y + seed)
    b = x * y
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0).astype(np.float32)
