#!/usr/bin/env python
"""Phase-level timing of the fused train step at a given workload.

Times (on the current default backend, forcing completion by scalar fetch):
  binning only | fused kernel only (fixed binning) | adam only | full step |
  scanned block (amortized)

Usage:
  python scripts/profile_step.py [--image squirrel_cls.jpg] [--splats 10240]
      [--k 0 = heuristic] [--iters 30] [--scan 0]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.asarray(x).ravel()[:1]))


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default="squirrel_cls.jpg")
    ap.add_argument("--splats", type=int, default=10240)
    ap.add_argument("--k", type=int, default=0)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--scan", type=int, default=0)
    ap.add_argument("--binning", default="dense",
                    choices=["dense", "flat", "resident", "window"])
    ap.add_argument("--rebin-margin", type=float, default=0.0,
                    help="lazy rebinning slack (px) for the scanned block "
                         "(resident or flat)")
    ap.add_argument("--no-cull", action="store_true",
                    help="disable exact-ellipse tile culling in binning")
    ap.add_argument("--tile-h", type=int, default=0,
                    help="tile height (0 = measured-optimal policy, "
                         "tiles.tune_tile_height; SplatConfig default is 8)")
    ap.add_argument("--flat-chunk", type=int, default=256)
    ap.add_argument("--size", default="",
                    help="HxW synthetic target instead of --image")
    ap.add_argument("--reorder", action="store_true",
                    help="Morton-reorder the population before measuring")
    ap.add_argument("--init-scale", default="",
                    help="MIN,MAX splat init sigma (default reference 6,10; "
                         "dense populations want pixel-scale init)")
    args = ap.parse_args()

    global jax
    import jax
    import jax.numpy as jnp

    import gs2d_tpu
    gs2d_tpu.enable_compilation_cache()
    from gs2d_tpu.config import SplatConfig
    from gs2d_tpu.io.image import load_asset
    from gs2d_tpu.ops import render_pallas as rp
    from gs2d_tpu.ops import tiles as tl
    from gs2d_tpu.train.adam import adam_update
    from gs2d_tpu.train.loop import (init_train_state, make_fit_scan_fused,
                                     make_train_step_fused)

    from gs2d_tpu.ops import render_pallas_flat as rpf
    from gs2d_tpu.ops import tiles_flat as tlf

    if args.size:
        from gs2d_tpu.io.image import synthetic_target

        h, w = (int(x) for x in args.size.split("x"))
        ref = synthetic_target(h, w)
    else:
        ref = load_asset(args.image)
        h, w = ref.shape[:2]
    extra = {}
    if args.init_scale:
        lo, hi = (float(x) for x in args.init_scale.split(","))
        extra = {"init_scale_min": lo, "init_scale_max": hi}
    cfg = SplatConfig(width=w, height=h, n_splats=args.splats,
                      binning=args.binning, flat_chunk=args.flat_chunk,
                      max_splats_per_tile=(args.k if args.k > 0 else None),
                      rebin_margin=args.rebin_margin,
                      exact_cull=not args.no_cull, **extra)
    state0 = init_train_state(cfg)  # init is tile_h-independent
    cfg = (tl.tune_tile_height(cfg, state0.params) if args.tile_h == 0
           else cfg.replace(tile_h=args.tile_h))
    if args.binning == "flat":
        cfg = rpf.tune_flat_config(state0.params, cfg)
        print(f"config: {w}x{h}, {args.splats} splats, flat "
              f"M={cfg.flat_capacity} chunks={cfg.flat_max_chunks} "
              f"kc={cfg.flat_chunk}, tiles={cfg.n_tiles_y}x{cfg.n_tiles_x}",
              flush=True)
    else:
        if args.k < 0:  # auto-tune from measured counts
            cfg = tl.tune_tile_capacity(state0.params, cfg)
        print(f"config: {w}x{h}, {args.splats} splats, "
              f"K={rp._max_per_tile(cfg)}, "
              f"tiles={cfg.n_tiles_y}x{cfg.n_tiles_x}", flush=True)

    state = init_train_state(cfg)  # same init; cfg tuning doesn't change it
    if args.reorder or args.binning == "window":
        from gs2d_tpu.train.reorder import reorder_state

        state = jax.jit(lambda s: reorder_state(s, cfg))(state)
        print("population Morton-reordered", flush=True)
    if args.binning == "window":
        from gs2d_tpu.ops import render_pallas_window as rpw

        cfg = rpw.tune_window(state.params, cfg)
        print(f"window_width={cfg.window_width} "
              f"(n_pad={rpw._n_pad(cfg.n_splats)})", flush=True)
    refc = rp.pad_ref_chw(jnp.asarray(ref), cfg)

    if args.binning == "flat":
        bin_fn = jax.jit(lambda p: tlf.bin_splats_flat(
            p, cfg, cfg.flat_capacity, kc=cfg.flat_chunk,
            max_chunks=cfg.flat_max_chunks))
        binning = bin_fn(state.params)
        print("max tile count:", int(jnp.max(binning.count)),
              "mean:", float(jnp.mean(binning.count.astype(jnp.float32))),
              "dropped:", int(binning.n_dropped), flush=True)
        t_bin = timeit(bin_fn, state.params, iters=args.iters)
        print(f"binning:      {t_bin*1e3:8.2f} ms", flush=True)
        kern_fn = jax.jit(lambda b: rpf.l2_render_and_grads_flat(
            b, refc, cfg.n_splats, cfg, cfg.flat_chunk, cfg.flat_max_chunks,
            params=state.params))
        t_kern = timeit(kern_fn, binning, iters=args.iters)
        print(f"fwd+bwd:      {t_kern*1e3:8.2f} ms", flush=True)
    else:
        k = rp._max_per_tile(cfg)
        ids_only = args.binning in ("resident", "window")
        bin_fn = jax.jit(
            lambda p: tl.bin_splats(p, cfg, k, ids_only=ids_only))
        binning = bin_fn(state.params)
        print("max tile count:", int(jnp.max(binning.count)),
              "mean:", float(jnp.mean(binning.count.astype(jnp.float32))),
              "dropped:", int(binning.n_dropped), flush=True)
        t_bin = timeit(bin_fn, state.params, iters=args.iters)
        print(f"binning:      {t_bin*1e3:8.2f} ms", flush=True)
        if args.binning == "resident":
            from gs2d_tpu.ops import render_pallas_resident as rpr

            kern_fn = jax.jit(lambda p: rpr.l2_step_resident(
                p, refc, cfg, k)[:2])
            t_kern = timeit(kern_fn, state.params, iters=args.iters)
        elif args.binning == "window":
            from gs2d_tpu.ops import render_pallas_window as rpw

            kern_fn = jax.jit(lambda p: rpw.l2_step_window(
                p, refc, cfg, k)[:2])
            t_kern = timeit(kern_fn, state.params, iters=args.iters)
        else:
            kern_fn = jax.jit(
                lambda b: rp.l2_render_and_grads(b, refc, cfg.n_splats, cfg,
                                                 state.params))
            t_kern = timeit(kern_fn, binning, iters=args.iters)
        print(f"fused kernel: {t_kern*1e3:8.2f} ms", flush=True)

    grads = kern_fn(state.params)[1] \
        if args.binning in ("resident", "window") else kern_fn(binning)[1]
    adam_fn = jax.jit(lambda s, g: adam_update(s.params, g, s.opt, cfg))
    t_adam = timeit(adam_fn, state, grads, iters=args.iters)
    print(f"adam:         {t_adam*1e3:8.2f} ms", flush=True)

    step = make_train_step_fused(cfg)
    t_step = timeit(lambda s: step(s, refc)[0], state, iters=args.iters)
    print(f"full step:    {t_step*1e3:8.2f} ms "
          f"(sum of phases {1e3*(t_bin+t_kern+t_adam):.2f})", flush=True)

    if args.scan:
        fit_k = make_fit_scan_fused(cfg)
        st, auxes = fit_k(state, refc, args.scan)
        sync(auxes.mse)
        t0 = time.perf_counter()
        st, auxes = fit_k(state, refc, args.scan)
        sync(auxes.mse)
        dt = (time.perf_counter() - t0) / args.scan
        print(f"scan/iter:    {dt*1e3:8.2f} ms  ({1.0/dt:.1f} iters/s)",
              flush=True)


if __name__ == "__main__":
    main()
