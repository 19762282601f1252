#!/usr/bin/env python
"""Hardware row: the on-device scanned SHARDED fitter vs the single-chip
scan fitter (round-5 VERDICT item 1's done-bar: the (1,1,1)-mesh scanned
sharded fit within ~15% of make_fit_scan_fused at mini and 10k; the
per-step sharded driver paid one full ~30 ms dispatch RTT per iteration
on this runtime, i.e. was unusable as a production fitter).

Timing contract matches bench.py: pipelined scan blocks, one scalar fetch.

Usage: python scripts/sharded_scan_bench.py [--image squirrel_cls.jpg
       --splats 10240 --binning flat] [--iters 200 --reps 3]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="squirrel_cls_mini.jpg")
    ap.add_argument("--splats", type=int, default=1024)
    ap.add_argument("--binning", default="auto")
    ap.add_argument("--rebin-margin", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-single", action="store_true")
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
    from gs2d_tpu.parallel.mesh import make_mesh
    from gs2d_tpu.parallel.sharded import (init_batched_state,
                                           make_fit_scan_sharded,
                                           pad_ref_batch)
    from gs2d_tpu.train.loop import init_train_state, make_fit_scan_fused

    ref = load_asset(args.image)
    h, w = ref.shape[:2]
    cfg = tl.tune_tile_height(SplatConfig(
        width=w, height=h, n_splats=args.splats, binning=args.binning,
        rebin_margin=args.rebin_margin))
    state0 = init_train_state(cfg)
    if rpf.use_flat(cfg):
        cfg = rpf.tune_flat_config(state0.params, cfg)
    else:
        cfg = tl.tune_tile_capacity(state0.params, cfg)
    layout = rpf.resolve_binning(cfg)
    print(f"config: {w}x{h}, {args.splats} splats, layout={layout}, "
          f"tile_h={cfg.tile_h}, margin={cfg.rebin_margin}", flush=True)

    def timed(run, label):
        t0 = time.perf_counter()
        out = run()  # warmup/compile
        _sync(out)   # drain the warmup block before starting the clock
        print(f"  [{label}] compiled+first in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run()
        _sync(out)
        dt = (time.perf_counter() - t0) / (args.reps * args.iters)
        print(f"  {label}: {dt * 1e3:.3f} ms/iter ({1.0 / dt:.1f} it/s)",
              flush=True)
        return dt

    if not args.skip_single:
        refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)
        fit_1 = make_fit_scan_fused(cfg)
        st1 = [init_train_state(cfg)]

        def run1():
            st1[0], auxes = fit_1(st1[0], refc, args.iters)
            return auxes.mse
        dt1 = timed(run1, "single-chip scan fitter")
    else:
        dt1 = None

    mesh = make_mesh(data=1, tile=1, splat=1)
    fit_s, sh = make_fit_scan_sharded(cfg, mesh, renderer="pallas")
    sts = [jax.device_put(init_batched_state(cfg, 1), sh["state"])]
    refs_p = jax.device_put(
        pad_ref_batch(jnp.asarray(ref)[None], cfg), sh["ref"])

    def runs():
        sts[0], auxes = fit_s(sts[0], refs_p, args.iters)
        return auxes.mse
    dts = timed(runs, "scanned sharded fitter (1,1,1)")
    if dt1:
        print(f"  sharded/single ratio: {dts / dt1:.3f} "
              f"(done-bar <= 1.15)", flush=True)


def _sync(x):
    import jax
    jax.block_until_ready(x)
    float(jax.numpy.asarray(x).ravel()[-1])


if __name__ == "__main__":
    main()
