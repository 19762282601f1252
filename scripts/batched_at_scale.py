#!/usr/bin/env python
"""Hardware row: multi-image batch fitting at REAL scale (north-star
configs[4]'s data axis; round-4 VERDICT weak item 5 -- the batched fitter
previously had rows only at the 1k-splat mini scale and no flat layout).

Times the on-device scanned batched fitter (make_fit_scan_batched --
lax.scan over lax.map'd production steps) at B independent copies of the
full-size target, flat binning, and reports per-batched-iter ms plus
aggregate image-iters/s vs the single-image fitter.

Usage: python scripts/batched_at_scale.py [--batch 2 --splats 10240
       --iters 100 --reps 2]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="squirrel_cls.jpg")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--splats", type=int, default=10240)
    ap.add_argument("--binning", default="flat")
    ap.add_argument("--rebin-margin", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.io.image import load_asset
    from gs2d_tpu.ops import render_pallas as rp
    from gs2d_tpu.ops import render_pallas_flat as rpf
    from gs2d_tpu.ops import tiles as tl
    from gs2d_tpu.parallel.sharded import init_batched_state
    from gs2d_tpu.train.loop import (init_train_state, make_fit_scan_batched,
                                     make_fit_scan_fused)

    ref = load_asset(args.image)
    h, w = ref.shape[:2]
    cfg = tl.tune_tile_height(SplatConfig(
        width=w, height=h, n_splats=args.splats, binning=args.binning,
        rebin_margin=args.rebin_margin))
    p0 = init_train_state(cfg).params
    if rpf.use_flat(cfg):
        cfg = rpf.tune_flat_config(p0, cfg)
    else:
        cfg = tl.tune_tile_capacity(p0, cfg)
    print(f"config: {w}x{h}, {args.splats} splats x B={args.batch}, "
          f"layout={rpf.resolve_binning(cfg)}, tile_h={cfg.tile_h}",
          flush=True)
    refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)

    def timed(run, label, n_iters):
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        float(jnp.asarray(out).ravel()[-1])
        print(f"  [{label}] compiled+first in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run()
        jax.block_until_ready(out)
        float(jnp.asarray(out).ravel()[-1])
        return (time.perf_counter() - t0) / (args.reps * n_iters)

    fit1 = make_fit_scan_fused(cfg)
    st1 = [init_train_state(cfg)]

    def run1():
        st1[0], auxes = fit1(st1[0], refc, args.iters)
        return auxes.mse
    dt1 = timed(run1, "single image", args.iters)
    print(f"  single: {dt1 * 1e3:.3f} ms/iter ({1 / dt1:.1f} it/s)",
          flush=True)

    fitb = make_fit_scan_batched(cfg)
    refs_chw = jnp.stack([refc] * args.batch)
    stb = [init_batched_state(cfg, args.batch)]

    def runb():
        stb[0], auxes = fitb(stb[0], refs_chw, args.iters)
        return auxes.mse
    dtb = timed(runb, f"batched B={args.batch}", args.iters)
    agg = args.batch / dtb
    print(f"  batched: {dtb * 1e3:.3f} ms/batched-iter "
          f"({agg:.1f} aggregate image-iters/s, "
          f"{agg * dt1:.2f}x single-image rate)", flush=True)


if __name__ == "__main__":
    main()
