#!/usr/bin/env python
"""Stitch a fit's mid-run renders into an animated GIF/APNG.

The reference repo ships (well, references -- the blob is missing) a
``demo.apng`` of the fit progressing; this produces the same artifact from
the ``render_XXXXXX.png`` frames a CLI run writes with
``--save-render-every N`` (plus ``render_final.png`` as the last frame).

Usage: python scripts/make_progression.py runs/showcase --out docs/demo.gif
"""

import argparse
import glob
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="fit output dir with render_*.png")
    ap.add_argument("--out", default="", help="output .gif or .png (APNG); "
                    "default <run_dir>/progression.gif")
    ap.add_argument("--ms", type=int, default=250, help="ms per frame")
    args = ap.parse_args()

    from PIL import Image

    frames = sorted(glob.glob(os.path.join(args.run_dir, "render_0*.png")))
    final = os.path.join(args.run_dir, "render_final.png")
    if os.path.exists(final):
        frames.append(final)
    if len(frames) < 2:
        print(f"error: need >= 2 render frames in {args.run_dir} "
              "(fit with --save-render-every N)")
        return 2
    out = args.out or os.path.join(args.run_dir, "progression.gif")
    imgs = [Image.open(f).convert("RGB") for f in frames]
    if out.endswith(".png"):  # APNG
        imgs[0].save(out, save_all=True, append_images=imgs[1:],
                     duration=args.ms, loop=0, default_image=False)
    else:
        imgs[0].save(out, save_all=True, append_images=imgs[1:],
                     duration=args.ms, loop=0)
    print(f"wrote {out} ({len(imgs)} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
