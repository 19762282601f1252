#!/usr/bin/env python
"""Dump a decoded target image as raw float32 for the C++ baseline timer.

Format: int32 height, int32 width, then h*w*3 float32 RGB in [0,1].
"""

import struct
import sys

sys.path.insert(0, ".")
from gs2d_tpu.io.image import load_asset, load_image  # noqa: E402


def main():
    src, dst = sys.argv[1], sys.argv[2]
    img = load_image(src) if "/" in src else load_asset(src)
    h, w, _ = img.shape
    with open(dst, "wb") as f:
        f.write(struct.pack("<ii", h, w))
        f.write(img.astype("<f4").tobytes())
    print(f"wrote {dst}: {h}x{w}")


if __name__ == "__main__":
    main()
