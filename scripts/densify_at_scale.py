#!/usr/bin/env python
"""Exercise densify/prune at large scale (BASELINE configs[4] mechanics).

Runs `fit_adaptive` -- the production adaptive-density path, with the
densification signal accumulated on device by the train step itself -- at a
4K/4M-class workload for a few densify windows, and reports per-window MSE,
live/dead slot counts, and wall time. Demonstrates that the clone/split/
prune machinery (train/densify.py) operates at the full configs[4] scale,
not just the unit-test shapes.

Usage (the BASELINE configs[4] single-chip shape):
  python scripts/densify_at_scale.py --size 2160x3840 --splats 4194304 \
      --windows 3 --window 5 --init-scale 1,2
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="2160x3840", help="HxW synthetic target")
    ap.add_argument("--splats", type=int, default=4194304)
    ap.add_argument("--windows", type=int, default=3,
                    help="number of densify windows to run")
    ap.add_argument("--window", type=int, default=5,
                    help="iterations per densify window")
    ap.add_argument("--init-scale", default="1,2",
                    help="MIN,MAX init sigma (pixel-scale for dense pops)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.io.image import synthetic_target
    from gs2d_tpu.train.densify import fit_adaptive, n_live

    from gs2d_tpu.ops.tiles import tune_tile_height

    h, w = (int(x) for x in args.size.split("x"))
    lo, hi = (float(x) for x in args.init_scale.split(","))
    cfg = tune_tile_height(SplatConfig(
        width=w, height=h, n_splats=args.splats,
        binning="flat", init_scale_min=lo, init_scale_max=hi))
    ref = synthetic_target(h, w)

    iters = args.windows * args.window + args.window  # final window, no event
    print(f"config: {w}x{h}, {args.splats} splats, flat binning, "
          f"{args.windows} densify events over {iters} iters", flush=True)
    t0 = time.perf_counter()
    state, hist = fit_adaptive(
        ref, cfg, iterations=iters, densify_every=args.window,
        log_every=1, log_fn=lambda m: print(m, flush=True))
    total = time.perf_counter() - t0
    live = int(n_live(state.params))
    print(f"done: {iters} iters in {total:.1f}s "
          f"({total/iters:.2f} s/iter incl. densify/prune events); "
          f"live slots {live}/{args.splats}", flush=True)
    mses = [r["mse"] for r in hist]
    assert mses[-1] < mses[0], "MSE did not decrease"
    print(f"mse {mses[0]:.2f} -> {mses[-1]:.2f}", flush=True)


if __name__ == "__main__":
    main()
