#!/usr/bin/env python
"""Assembled north-star configs[4] hardware row: a MULTI-IMAGE 4K batch
fit with millions of Gaussians per image and densify/prune per image, in
one recipe (train/densify.py::fit_adaptive_batched).

The single-image 4K/4M row uses the split step (two chained device
programs, train/loop.py::SPLIT_STEP_ROWS); the batched fitter runs the
whole batch inside one lax.scan program, so each image's flat capacity
must stay under the split threshold -- at 4K pixel-scale init that is
~2M splats/image (B=2 -> 4M Gaussians in flight on the chip).

Usage: python scripts/batched_densify_at_scale.py \
           [--size 2160x3840 --batch 2 --splats 2097152 \
            --windows 3 --window 5 --init-scale 1,2]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="2160x3840", help="HxW synthetic target")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--splats", type=int, default=2 * 1024 * 1024)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--init-scale", default="1,2")
    args = ap.parse_args()

    import jax

    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.io.image import synthetic_target
    from gs2d_tpu.ops.tiles import tune_tile_height
    from gs2d_tpu.train.densify import fit_adaptive_batched, n_live

    h, w = (int(x) for x in args.size.split("x"))
    lo, hi = (float(x) for x in args.init_scale.split(","))
    cfg = tune_tile_height(SplatConfig(
        width=w, height=h, n_splats=args.splats,
        binning="flat", init_scale_min=lo, init_scale_max=hi))
    refs = [synthetic_target(h, w, seed=i) for i in range(args.batch)]

    iters = args.windows * args.window + args.window
    print(f"config: {w}x{h} x B={args.batch}, {args.splats} splats/image "
          f"({args.batch * args.splats} total), flat binning, "
          f"{args.windows} densify events over {iters} iters", flush=True)
    t0 = time.perf_counter()
    state, hist = fit_adaptive_batched(
        refs, cfg, iterations=iters, densify_every=args.window,
        scan_chunk=args.window, log_every=1,
        log_fn=lambda m: print(m, flush=True))
    total = time.perf_counter() - t0
    live = [int(n_live(jax.tree.map(lambda x: x[i], state.params)))
            for i in range(args.batch)]
    print(f"done: {total:.1f}s ({total / iters:.2f} s/batched-iter incl. "
          f"events), live per image: {live}", flush=True)


if __name__ == "__main__":
    main()
